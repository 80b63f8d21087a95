from icicle_spark.operators.window_ext import (  # noqa: F401
    backfill,
    lag_lead,
    scan,
    sessionize,
)
from icicle_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from icicle_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    lsh_topk,
)
from icicle_spark.operators.reporting import (  # noqa: F401
    corpus_diff,
    corpus_diff_summary,
    corpus_sketch_report,
    corpus_stats,
    lang_histogram,
    merge_sketch_reports,
    sketch_estimates,
)
