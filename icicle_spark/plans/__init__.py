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
