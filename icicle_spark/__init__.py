"""icicle_spark — a PySpark-native feature-engineering engine.

A from-scratch reimplementation of the query semantics of
icicle-lang/icicle (reference at /root/reference, read-only) on top of
the Spark DataFrame API:

* facts keyed by (entity, time, value...) — append-only event store
  (reference: README.md:96-141)
* point-in-time / as-of evaluation: only facts strictly before the
  query time are visible (reference: Runtime/Stencil.hs:111-124)
* every aggregate is a streaming fold; many features over the same
  input fuse into ONE pass (reference: Core/Program/Fusion.hs:37-81)
* windowed (days-before) folds, latest-N buffers, group folds,
  filters, custom init/step folds (reference: Source/Query/Context.hs)

plus Spark-native extensions the reference lacks: lag/lead, backfill,
gap sessionization, deduplication (exact / MinHash-LSH / SimHash),
similarity search, and text analysis for training-data pipelines.

Architecture (Spark-first, NOT a port):

* ``plans``      — fold-plan IR (init/step/output triples) and two
                   compilers: a *native* one emitting pure DataFrame
                   ops (Catalyst-optimised, whole-stage codegen) and a
                   *fused* one emitting a single vectorized
                   ``applyInPandas`` executor per input.
* ``operators``  — as-of/stencil engine, window extensions, dedup,
                   similarity, sessionization.
* ``functions``  — scalar function layer with Icicle "Possibly"
                   semantics (NaN/Inf/div-by-zero -> null), text
                   analysis primitives.
* ``sources``    — deterministic fixture generators + IO helpers.
* ``streaming``  — Structured Streaming variants of the fold engine.
"""

__version__ = "0.1.0"

from icicle_spark.session import get_spark  # noqa: F401
