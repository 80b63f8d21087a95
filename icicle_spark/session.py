"""SparkSession factory tuned for the engine.

Defaults target local[32] testing but every knob is the one you would
set on a 1000-executor cluster: AQE on (runtime re-plan + skew-join
splitting), Arrow transport for pandas UDFs, sane shuffle partition
count, broadcast threshold for small dimension tables.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "icicle_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` controls local parallelism; on a real cluster the master
    is supplied by spark-submit and this becomes a no-op.
    """
    n = cpus or DEFAULT_CPUS
    builder = SparkSession.builder.appName(app_name)
    # Under spark-submit the gateway JVM already carries the master
    # (PythonRunner exports PYSPARK_GATEWAY_PORT); setting one here
    # would override --master. Default to local[n] only when
    # self-launching.
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        builder = builder.master(os.environ.get("SPARK_MASTER", f"local[{n}]"))
    builder = (
        builder
        # AQE: runtime coalescing of shuffle partitions + skew-join
        # splitting — essential at 100 TB where static planning is
        # always wrong for at least one stage.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow is the transport for every pandas UDF in the engine;
        # a large batch size amortises the per-batch overhead of the
        # vectorized fold executors.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or max(2 * n, 32)),
        )
        # Dimension tables (query-time/chord tables, nation/region)
        # should broadcast; 64 MiB covers every dim we ship.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
