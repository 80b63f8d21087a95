from icicle_spark.plans.ir import (  # noqa: F401
    Agg,
    CustomFold,
    Feature,
    Plan,
    Window,
    icicle_snapshot,
)
from icicle_spark.plans.executor import run_plan  # noqa: F401
from icicle_spark.plans.native import compile_native  # noqa: F401
from icicle_spark.plans.errors import (  # noqa: F401
    ERR_CANNOT_COMPUTE,
    ERR_FOLD1_NO_VALUE,
    ERR_OK,
    ERR_TOMBSTONE,
    error_codes,
)
