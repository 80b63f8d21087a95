from icicle_spark.functions.scalars import (  # noqa: F401
    days_between,
    safe_div,
    safe_log,
    safe_pow,
    safe_sqrt,
    seconds_between,
)
from icicle_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
