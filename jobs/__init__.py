"""Batch job entry points (console scripts): feature runs over fact
stores, dedup pipelines, and corpus curation. Each module exposes a
``main(argv) -> int`` used by the ``icicle-spark-*`` scripts declared
in pyproject.toml."""
