"""Plan-shape regression guard.

Prints `.explain("formatted")` for the flagship fused pass and key
operators, and ASSERTS the structural properties that make them scale
(SURVEY §4, BENCH.md): scan count, exchange count, pushed filters and
pruned read schemas. Run after optimizer-touching changes:

    python tools/explain_audit.py
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count(pat: str, text: str) -> int:
    return len(re.findall(pat, text))


def _exchange_payloads(text: str) -> str:
    """The formatted-plan detail blocks of every Exchange node,
    concatenated — lets a check assert which COLUMNS ride a shuffle."""
    ids = re.findall(r"\((\d+)\) Exchange", text)
    blocks = []
    for i in ids:
        m = re.search(
            rf"\({i}\) Exchange\n(.*?)(?:\n\n|\Z)", text, re.DOTALL
        )
        if m:
            blocks.append(m.group(1))
    return "\n".join(blocks)


def main() -> int:
    from icicle_spark.plans import Agg, Feature, Plan, Window, run_plan
    from icicle_spark.session import get_spark
    from icicle_spark.sources.benchgen import generate

    spark = get_spark(
        cpus=8,
        shuffle_partitions=8,
        # audit the STATIC plan under the fold-pass conf (bench.py
        # runs the fused pass with AQE off; AQE also hides codegen
        # ids behind an unfinalized AdaptiveSparkPlan wrapper)
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # real parquet source: pushdown/pruning only exist on file scans
    facts = spark.read.parquet(generate(n_rows=50_000, n_docs=2_000)).drop("tokens")
    failures = []

    def check(name, text, checks):
        print(f"===== {name}")
        print(text[:2200])
        for desc, ok in checks:
            tag = "OK " if ok else "FAIL"
            print(f"  [{tag}] {desc}")
            if not ok:
                failures.append(f"{name}: {desc}")

    plan = Plan(
        [
            Feature("s", Agg.SUM, "n_tok", skip_nulls=True),
            Feature("c", Agg.COUNT, "n_tok", skip_nulls=True),
            Feature("m", Agg.MEAN, "n_tok", skip_nulls=True),
            Feature("w30", Agg.SUM, "n_tok", window=Window(30), skip_nulls=True),
            Feature("l5", Agg.MEAN, "n_tok", latest=5, skip_nulls=True),
            Feature(
                "web", Agg.COUNT, "n_tok", where="source = 'web'", skip_nulls=True
            ),
        ],
        entity_col="doc_id",
        time_col="event_time",
        seq_col="seq",
    )
    fused = run_plan(facts, plan, snapshot="2024-05-30", strategy="native")
    t = plan_text(fused)
    t_exec = fused._jdf.queryExecution().executedPlan().toString()
    # formatted explain shows each operator in the tree AND as a
    # numbered detail block - count the detail headers only
    scans = count(r"\(\d+\) Scan parquet", t)
    exchanges = count(r"\(\d+\) Exchange", t)
    check(
        "fused native flagship",
        t,
        [
            (f"at most 2 parquet scans (got {scans})", scans <= 2),
            (f"bounded exchanges (got {exchanges} <= 7)", exchanges <= 7),
            ("tokens column pruned from every scan", "tokens" not in t),
            ("whole-stage codegen spans present (*(n) markers)",
             re.search(r"\*\(\d+\)", t_exec) is not None),
        ],
    )

    pushed = facts.where("n_tok > 10").select("doc_id", "n_tok")
    pushed = pushed.groupBy("doc_id").sum("n_tok")
    t2 = plan_text(pushed)
    check(
        "filter + projection pushdown",
        t2,
        [
            ("PushedFilters reaches the scan", "PushedFilters: [" in t2
             and "IsNotNull" in t2),
            ("ReadSchema pruned to 2 columns",
             bool(re.search(r"ReadSchema:.*doc_id.*n_tok", t2))
             and "tokens" not in t2),
        ],
    )

    from icicle_spark.plans import run_plan as _run_plan
    from pyspark.sql import functions as FF

    chords = facts.groupBy("doc_id").agg(FF.max("event_time").alias("query_time"))
    chord_df = _run_plan(
        facts,
        Plan(
            [Feature("s", Agg.SUM, "n_tok", skip_nulls=True),
             Feature("l5", Agg.MEAN, "n_tok", latest=5, skip_nulls=True)],
            entity_col="doc_id", time_col="event_time", seq_col="seq",
        ),
        chords=chords,
        strategy="auto",
    )
    t4 = plan_text(chord_df)
    ex4 = count(r"\(\d+\) Exchange", t4)
    check(
        "vectorized chord executor",
        t4,
        [
            ("single co-partition exchange feeds the as-of pass "
             f"(got {ex4} <= 2 incl. the chord-build agg)", ex4 <= 2),
            ("union of facts+chords present", "Union" in t4),
            ("arrow pass present (mapInPandas)",
             "MapInPandas" in t4 or "PythonMapInArrow" in t4),
        ],
    )

    # Arrow snapshot executor: unreferenced columns must not ride the
    # entity exchange (mapInPandas is opaque to Catalyst — the pruning
    # is the executor's own, vexec.referenced_columns) and the seq
    # tiebreaker must leave the plan after the JVM sort encodes it.
    wide = spark.read.parquet(generate(n_rows=50_000, n_docs=2_000))
    vex = run_plan(
        wide,
        Plan(
            [
                Feature("s", Agg.SUM, "n_tok", skip_nulls=True),
                Feature(
                    "web", Agg.COUNT, "n_tok", where="source == 'web'",
                    skip_nulls=True,
                ),
            ],
            entity_col="doc_id", time_col="event_time", seq_col="seq",
        ),
        snapshot="2024-05-30",
        strategy="vectorized",
    )
    t6 = plan_text(vex)
    mip = re.search(r"\(\d+\) MapInPandas\nInput \[\d+\]: \[([^\]]*)\]", t6)
    mip_input = mip.group(1) if mip else "<no MapInPandas block>"
    check(
        "arrow snapshot executor pruning",
        t6,
        [
            ("unreferenced 'tokens' column pruned before the exchange",
             "tokens" not in t6),
            # late-r4 shuffled-path design: the JVM partition sort is
            # GONE (hash exchange only; the executor orders its
            # partition with one stable numpy lexsort — measured
            # 6.9 s -> 5.6 s at 8M rows), so seq must RIDE the Arrow
            # transfer as the lexsort tiebreaker
            ("no JVM Sort stage (executor lexsort replaces it)",
             "(%d) Sort" % 0 not in t6 and "+- Sort " not in t6
             and "\n(3) Sort" not in t6 and " Sort [" not in t6),
            ("seq ships as the executor-side sort tiebreaker",
             "seq" in mip_input),
        ],
    )

    from icicle_spark.operators.similarity import brute_force_topk

    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, 0.5]) for i in range(100)],
        "vec_id bigint, embedding array<double>",
    )
    q = emb.where("vec_id < 2").selectExpr("vec_id as query_id", "embedding")
    t3 = plan_text(brute_force_topk(emb, q, k=3))
    check(
        "brute-force topk",
        t3,
        [
            ("query side broadcast (no shuffle join)",
             "BroadcastNestedLoopJoin" in t3 or "BroadcastExchange" in t3),
        ],
    )

    from icicle_spark.operators.similarity import lsh_topk

    t5 = plan_text(lsh_topk(emb, q, k=3, n_planes=4, n_tables=4, dim=3))
    lsh_scans = count(r"\(\d+\) Scan ExistingRDD", t5)
    check(
        "lsh topk single-scan buckets",
        t5,
        [
            # corpus + query sides only — all 4 tables' buckets explode
            # from one pass each, never n_tables unioned re-scans
            (f"2 source scans, not n_tables x 2 (got {lsh_scans})",
             lsh_scans <= 2),
            ("no Union of per-table re-scans", "Union" not in t5),
        ],
    )

    from icicle_spark.operators.tokens import corpus_token_freq

    toks = facts.limit(1).sparkSession.read.parquet(
        generate(n_rows=50_000, n_docs=2_000)
    ).select("doc_id", "tokens")
    t6 = plan_text(corpus_token_freq(toks, "tokens"))
    ex6 = count(r"\(\d+\) Exchange", t6)
    check(
        "corpus token freq",
        t6,
        [
            (f"exactly one shuffle (got {ex6})", ex6 == 1),
            ("map-side partial aggregation before the exchange",
             "partial_count" in t6 or "HashAggregate" in t6),
        ],
    )

    # Decontamination: the corpus side must be ONE scan feeding a
    # narrow gram explode into a BROADCAST join — no corpus shuffle
    # before the match; repetition stats must be a single scan with
    # no exchange and no explode at all.
    from icicle_spark.functions.text import repetition_stats
    from icicle_spark.operators.dedup import (
        benchmark_gram_index,
        contaminated_ids,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta doc {i} words run long enough")
         for i in range(200)],
        "doc_id bigint, text string",
    )
    idx = benchmark_gram_index(docs.where("doc_id < 10"), "text", n=5)
    t7 = plan_text(contaminated_ids(docs, idx, "text", "doc_id", n=5))
    ex7 = count(r"\(\d+\) Exchange", t7)
    check(
        "decontamination",
        t7,
        [
            ("gram index broadcast into the corpus join",
             "BroadcastHashJoin" in t7),
            ("no shuffle join on the corpus side",
             "SortMergeJoin" not in t7 and "ShuffledHashJoin" not in t7),
            ("corpus gram explode is a narrow Generate",
             count(r"\(\d+\) Generate", t7) == 2),  # corpus + index
            (f"only index-distinct + hit-count exchanges (got {ex7} <= 3)",
             ex7 <= 3),
        ],
    )

    t8 = plan_text(repetition_stats(docs))
    ex8 = count(r"\(\d+\) Exchange", t8)
    check(
        "repetition stats",
        t8,
        [
            (f"zero exchanges (got {ex8})", ex8 == 0),
            ("no explode (run-length over sorted arrays)",
             "Generate" not in t8),
        ],
    )

    from icicle_spark.functions.text import tfidf_top_terms
    from icicle_spark.operators.dedup import substring_dedup

    t9 = plan_text(substring_dedup(docs, k=3, strategy="broadcast_set"))
    ex9 = count(r"\(\d+\) Exchange", t9)
    check(
        "substring dedup (broadcast_set)",
        t9,
        [
            ("corpus never joins by shuffle",
             "SortMergeJoin" not in t9 and "ShuffledHashJoin" not in t9),
            ("dup set arrives broadcast", "Broadcast" in t9),
            ("only the dup-gram explode Generates (corpus side is "
             "pure HOFs)", count(r"\(\d+\) Generate", t9) == 1),
            (f"only dup-set-build exchanges (got {ex9} <= 3)", ex9 <= 3),
        ],
    )

    t9b = plan_text(substring_dedup(docs, k=3, strategy="positions"))
    check(
        "substring dedup (positions, default)",
        t9b,
        [
            ("gram membership is a broadcast hash join (probe cost "
             "independent of dup-set size)",
             "BroadcastHashJoin" in t9b),
            ("raw text never shuffles exploded (only id+pos pairs "
             "reach the position groupBy)",
             "text" not in _exchange_payloads(t9b)),
        ],
    )

    from icicle_spark.operators.span_dedup import strip_repeated_spans

    t9c = plan_text(strip_repeated_spans(docs, n=3, key="hash"))
    ex9c = count(r"\(\d+\) Exchange", t9c)
    check(
        "span dedup keep-one (hash key)",
        t9c,
        [
            ("duplicated-gram index joins back broadcast",
             "BroadcastHashJoin" in t9c),
            ("raw text never reaches an exchange (62-bit gram ids + "
             "id/pos shuffle instead)",
             "text" not in _exchange_payloads(t9c)),
            (f"gram freq + covered-position + final doc join only "
             f"(got {ex9c} <= 7)", ex9c <= 7),
        ],
    )

    t10 = plan_text(tfidf_top_terms(docs))
    ex10 = count(r"\(\d+\) Exchange", t10)
    check(
        "tfidf top terms",
        t10,
        [
            ("df/N join back broadcast (vocab-bounded)",
             "BroadcastHashJoin" in t10),
            ("no sort-merge join", "SortMergeJoin" not in t10),
            (f"tf groupBy + vocab aggs + topk window only "
             f"(got {ex10} <= 5)", ex10 <= 5),
        ],
    )

    from icicle_spark.operators.tokens import char_token_ids, heavy_hitters

    docs_tok = docs.select(char_token_ids("text").alias("tokens"))
    t11 = plan_text(heavy_hitters(docs_tok, "tokens", support=0.005))
    check(
        "heavy hitters (MG two-pass)",
        t11,
        [
            ("candidate set joins back broadcast (never a vocab-wide "
             "shuffle join)", "BroadcastHashJoin" in t11),
            ("no sort-merge join", "SortMergeJoin" not in t11),
            ("token arrays never reach an exchange (only exploded "
             "candidate hits shuffle)",
             "tokens" not in _exchange_payloads(t11)),
        ],
    )

    # Fingerprint near-dup (phash/afp/vhash share this join): the
    # banded candidate generation must stay an equi-join on
    # (band, key) over DISTINCT hash values — never a cartesian or
    # nested-loop pass — and popcount/bands are JVM expressions.
    from icicle_spark.operators.phash import hamming_pairs

    fps = spark.createDataFrame(
        [(i, ((i * 2654435761) & ((1 << 64) - 1)) - (1 << 63))
         for i in range(500)],
        "doc_id bigint, fp bigint",
    )
    t12 = plan_text(hamming_pairs(fps, hash_col="fp", max_distance=3))
    check(
        "banded hamming fingerprint join",
        t12,
        [
            ("candidates via equi-join, never cartesian/nested-loop",
             "CartesianProduct" not in t12
             and "BroadcastNestedLoopJoin" not in t12),
            ("band keys + popcount are JVM exprs (no Python eval)",
             "BatchEvalPython" not in t12 and "ArrowEvalPython" not in t12),
        ],
    )

    # DSIR scoring: the per-bucket log-ratio table broadcasts into the
    # single corpus scan; raw text never rides an exchange (only
    # (id, bucket) pairs reach the per-doc groupBy).
    from icicle_spark.operators.dsir import dsir_logweights

    t13 = plan_text(
        dsir_logweights(docs, docs.where("doc_id < 20"), buckets=1 << 12)
    )
    check(
        "dsir importance weights",
        t13,
        [
            ("log-ratio table broadcast into the scoring scan",
             "BroadcastHashJoin" in t13),
            ("raw text never reaches an exchange",
             "text" not in _exchange_payloads(t13)),
        ],
    )

    # Quality-classifier serving: exported weight table broadcast,
    # text stays out of every shuffle, sigmoid is a JVM expression.
    from icicle_spark.operators.quality_model import score_exported

    wtab = spark.createDataFrame(
        [(b, 0.01 * b) for b in range(64)], "bucket int, weight double"
    )
    t14 = plan_text(
        score_exported(docs, wtab, intercept=-0.5, buckets=1 << 12)
    )
    check(
        "quality classifier serving",
        t14,
        [
            ("weight table broadcast (no vocab-wide shuffle join)",
             "BroadcastHashJoin" in t14),
            ("text never reaches an exchange",
             "text" not in _exchange_payloads(t14)),
            ("inference is pure JVM (no Python eval in the plan)",
             "BatchEvalPython" not in t14 and "ArrowEvalPython" not in t14),
        ],
    )

    # No-split bin packing (class strategy): the per-class numbering
    # must window per (cls, segment) — never a single-partition global
    # sort — with the offset table arriving broadcast.
    from icicle_spark.operators.packing import bin_pack_documents

    ldocs = spark.createDataFrame(
        [(f"s{i % 5}", i, 1 + (i * 37) % 64) for i in range(400)],
        "source string, doc_id bigint, n_tok bigint",
    )
    binned = bin_pack_documents(ldocs, length_col="n_tok", seq_len=64)
    t15 = plan_text(binned)
    t15_exec = binned._jdf.queryExecution().executedPlan().toString()
    check(
        "bin packing (class strategy)",
        t15,
        [
            ("no single-partition global window",
             "SinglePartition" not in t15_exec),
            ("offset table joins back broadcast",
             "BroadcastHashJoin" in t15),
            ("assignment is pure JVM (no Python eval)",
             "BatchEvalPython" not in t15 and "ArrowEvalPython" not in t15),
        ],
    )

    print("=====")
    if failures:
        print("PLAN AUDIT FAILURES:", *failures, sep="\n  ")
        return 1
    print("plan audit clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
