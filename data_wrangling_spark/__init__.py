"""data_wrangling_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (MPhillips55/Data-Wrangling: OSM-XML audit → clean →
normalize → SQL analytics), re-expressed Spark-first:

- declarative DataFrame / SQL plans (Catalyst optimizes; no hand scheduling)
- all cleaning / standardization ops as pure Column expressions (no UDFs on
  the hot path)
- partition-aware ingest and sinks designed for 100 TB scale
- LLM-training-data extensions: dedup (exact/MinHash/SimHash/n-gram),
  similarity search, text analysis, multimodal column plumbing

Layout:
    session.py     SparkSession factory with scale-tuned defaults
    sources/       parquet/csv table loaders, OSM-XML ingest
    functions/     scalar Column-expression libraries (cleaning, text, vectors)
    operators/     composite operators (audit, normalize, dedup, similarity)
    plans/         the query registry: one spec per operator — Spark fn +
                   DuckDB oracle SQL generated from the same entry
    streaming/     Structured Streaming variants
    sinks.py       parquet / CSV / table sinks
"""

__version__ = "0.1.0"

# public API façade — the names a user of the reference pipeline needs to
# switch. Deliberately import-light: pulling these in requires pyspark but
# never creates a SparkSession.
from data_wrangling_spark.session import get_spark  # noqa: E402
from data_wrangling_spark.sources.tables import (  # noqa: E402
    load_table,
    load_tables,
    register_views,
)

__all__ = [
    "__version__",
    "get_spark",
    "load_table",
    "load_tables",
    "register_views",
]
