"""Parquet / CSV table loaders for the engine's relational layer.

Reference parity: OP-SRC-CSV (Step 2 CSVs → SQLite load, NB:12026-12030) and
OP-SNK-SQL's query layer (CREATE TABLE + INSERT, NB:12003). In Spark the
durable layer is partitioned parquet; temp views replace SQLite tables
(SURVEY.md §2.1-§2.2).

At 100 TB the landing zone is a partitioned parquet directory per table;
``spark.read.parquet`` gives partition pruning + predicate pushdown + column
pruning for free. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.types import StructType

#: Tables the driver materializes at each scale factor (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_utc(spark: SparkSession) -> None:
    """Pin the session timezone to UTC and parquet timestamp inference to
    session-zone TimestampType (idempotent). Timestamp semantics must not
    depend on who built the SparkSession: the engine's queries are defined
    over UTC wall-clock values and the DuckDB oracle reads parquet
    timestamps as-is, so a caller session left on a local zone would shift
    every timestamp crossing the Arrow boundary.

    ``inferTimestampNTZ`` must be OFF because the testdata's parquet
    annotates timestamps ``isAdjustedToUTC=false``; left on, Spark 4 scans
    them as TIMESTAMP_NTZ — a different column type than the engine's
    declared model (plain TimestampType under a UTC session, identical
    wall-clock values), which breaks double-casts, window arithmetic and
    schema stability. Disabling it at the scan keeps the type native to
    the parquet reader, so filter pushdown is unaffected (no cast wrapped
    around the scan column)."""
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false":
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table from a scale-factor directory.

    Handles parquet TIMESTAMP(NANOS) columns (which Spark's reader rejects,
    PARQUET_TYPE_ILLEGAL) independent of session config: such columns are
    read as raw int64 via an explicit schema and integer-divided down to
    microseconds — the same truncation DuckDB applies at scan, so oracle
    values agree exactly.
    """
    ensure_utc(spark)
    path = f"{sf_dir}/{name}.parquet"
    key = (id(spark), path)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if _has_nanos_timestamp(path):
        df = _load_parquet_nanos_safe(spark, path)
    else:
        df = spark.read.parquet(path)
    # belt-and-braces vs ensure_utc's inferTimestampNTZ=false: if a future
    # Spark stops honoring that conf, normalize any NTZ column to the
    # session-zone type here (UTC session → identical wall-clock values;
    # normally a no-op so scans keep native-type filter pushdown)
    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    _TABLE_CACHE[key] = df
    return df


#: per-(session, path) DataFrame handles: avoids re-listing files and
#: re-probing footers on every query over the same table (pure metadata
#: reuse — no data is cached/pinned). CAVEAT: the handle's file index is
#: resolved eagerly, so a path whose files are REWRITTEN after first load
#: serves stale file lists — call clear_table_cache() after rewriting a
#: table in place (immutable landing zones, the normal layout, never hit
#: this).
_TABLE_CACHE: dict[tuple[int, str], DataFrame] = {}


def clear_table_cache() -> None:
    """Drop all memoized table handles (after rewriting a table's files
    in place, or to release handles pinned to stopped sessions)."""
    _TABLE_CACHE.clear()


def _has_nanos_timestamp(path: str) -> bool:
    """Driver-side O(1) footer probe for TIMESTAMP(NANOS) columns."""
    try:
        import pyarrow.parquet as pq

        return any(str(f.type).startswith("timestamp[ns") for f in pq.read_schema(path))
    except Exception:
        return False


_PA_TO_SPARK = {
    "int64": T.LongType(),
    "int32": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "large_string": T.StringType(),
    "bool": T.BooleanType(),
    "binary": T.BinaryType(),
    "date32[day]": T.DateType(),
}


def _load_parquet_nanos_safe(spark: SparkSession, path: str) -> DataFrame:
    """Fallback reader for files whose footer Spark cannot convert.

    Builds an explicit Spark schema from the pyarrow footer, mapping
    timestamp[ns] → int64, then converts those columns to TimestampType
    with `div 1000` (exact integer math — float division would lose
    precision above 2^53 ns). Footer inspection is driver-side and O(1);
    the data read stays fully distributed.
    """
    import pyarrow.parquet as pq

    arrow_schema = pq.read_schema(path)
    fields, nanos_cols = [], []
    for f in arrow_schema:
        ts = str(f.type)
        if ts.startswith("timestamp[ns"):
            fields.append(T.StructField(f.name, T.LongType()))
            nanos_cols.append(f.name)
        elif ts.startswith("timestamp"):
            fields.append(T.StructField(f.name, T.TimestampType()))
        elif ts.startswith("list<"):
            inner = ts[5:-1].split(" ")[-1]
            fields.append(
                T.StructField(f.name, T.ArrayType(_PA_TO_SPARK.get(inner, T.StringType())))
            )
        else:
            fields.append(T.StructField(f.name, _PA_TO_SPARK.get(ts, T.StringType())))
    df = spark.read.schema(T.StructType(fields)).parquet(path)
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` can hit it.

    This is the engine's replacement for the reference's SQLite load step
    (NB:12026-12031): instead of copying rows into a database file, views
    bind lazily to the parquet scans and Catalyst prunes/pushes down.
    """
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV source with explicit schema (OP-SRC-CSV, NB:12026-12029).

    An explicit schema avoids a second inference pass over the files —
    mandatory at scale. Without one we fall back to inference (small/ad-hoc
    inputs only).
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", "true").csv(path)
