from icicle_spark.sources.fixtures import (  # noqa: F401
    chord_table,
    token_facts,
    token_facts_pdf,
)
from icicle_spark.sources.io import load_table, load_tables  # noqa: F401
