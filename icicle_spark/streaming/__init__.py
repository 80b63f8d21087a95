from icicle_spark.streaming.dedup_stream import (  # noqa: F401
    line_dedup_ingest_sink,
    minhash_ingest_sink,
    span_dedup_ingest_sink,
)
from icicle_spark.streaming.store_stream import (  # noqa: F401
    fact_store_ingest_sink,
)
from icicle_spark.streaming.telemetry_stream import (  # noqa: F401
    telemetry_sink,
)
from icicle_spark.streaming.fold_stream import (  # noqa: F401
    stream_exact_dedup,
    stream_fold,
    stream_session_agg,
    stream_windowed_agg,
)
