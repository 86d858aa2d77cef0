"""Sink round-trips (SURVEY.md §2.2): CSV with header (reference parity,
OP-SNK-CSV) and partitioned parquet with partition pruning (OP-SNK-SQL's
durable replacement). Pruning is asserted from the physical plan —
writing partitioned data is pointless if the scan doesn't prune."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_wrangling_spark.sinks import write_csv, write_parquet
from data_wrangling_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_csv_roundtrip_with_header(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "source")
    out = str(tmp_path / "docs_csv")
    write_csv(docs, out)
    back = spark.read.option("header", "true").csv(
        out, schema="doc_id long, lang string, source string"
    )
    want = {tuple(r) for r in docs.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want


def test_partitioned_parquet_prunes(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_by_status")
    write_parquet(orders, out, partition_by=("o_orderstatus",))

    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must be applied at the scan, not post-scan
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]

    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == want
    # only the matching partition directory's files are actually scanned
    # (inputFiles() lists the whole relation pre-pruning — input_file_name
    # reflects what the executed scan touched)
    files = [r[0] for r in back.select(F.input_file_name()).distinct().collect()]
    assert files and all("o_orderstatus=F" in f for f in files)
