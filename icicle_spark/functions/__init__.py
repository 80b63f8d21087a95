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
from icicle_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    registered_domain,
    url_filter,
    url_host,
)
