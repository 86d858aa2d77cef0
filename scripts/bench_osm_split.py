#!/usr/bin/env python3
"""Reproduce the SCALING.md "one big file" split-parallel XML numbers.

Generates a single large synthetic `.osm` file (default ~185 MB: 800k
nodes + 100k ways of realistic attribute/tag density), then times the
same `read_osm_xml` scan three ways — one task (split_bytes > file
size), 16 MB splits, 8 MB splits — and checks the three reads are
row-set identical via an order-independent value hash (sum over rows of
xxhash64 of every column, in DECIMAL(38,0) so the sum never overflows).

    python scripts/bench_osm_split.py                 # ~185 MB default
    SPARK_GRAFT_OSM_MB=50 python scripts/bench_osm_split.py

Prints one JSON line per configuration and a summary. The generated
file lands under $SPARK_GRAFT_SCALE_WORKDIR (default /tmp/dws-scale)
and is reused across runs when the requested size matches.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

USERS = ["alice", "bob", "carol", "dave", "erin", "frank%20o'hara", "grace"]
TAGSETS = [
    "",
    '<tag k="highway" v="residential"/>',
    '<tag k="name" v="North Lamar Blvd"/><tag k="tiger:county" v="Travis, TX"/>',
    '<tag k="amenity" v="cafe"/><tag k="addr:street" v="Burnet Rd"/>'
    '<tag k="addr:postcode" v="78758"/>',
]


def generate(path: str, n_nodes: int, n_ways: int) -> None:
    """Writes to a temp path and os.replace()s into place: a run killed
    mid-generate must not leave a truncated file that later runs
    silently reuse via the exists-check (same atomicity rule as the
    golden parquet writes)."""
    t0 = time.perf_counter()
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w", buffering=1 << 22) as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<osm version="0.6" generator="dws-bench">\n')
        for i in range(n_nodes):
            u = USERS[i % len(USERS)]
            tags = TAGSETS[i % len(TAGSETS)]
            lat = 30.0 + (i % 10_000) * 1e-5
            lon = -97.0 - (i % 9_973) * 1e-5
            if tags:
                f.write(
                    f'  <node id="{i + 1}" lat="{lat:.7f}" lon="{lon:.7f}" '
                    f'user="{u}" uid="{i % 5000 + 1}" version="{i % 9 + 1}" '
                    f'changeset="{i % 77777 + 1}" '
                    f'timestamp="2017-0{i % 9 + 1}-15T12:30:45Z">'
                    f"{tags}</node>\n"
                )
            else:
                f.write(
                    f'  <node id="{i + 1}" lat="{lat:.7f}" lon="{lon:.7f}" '
                    f'user="{u}" uid="{i % 5000 + 1}" version="{i % 9 + 1}" '
                    f'changeset="{i % 77777 + 1}" '
                    f'timestamp="2017-0{i % 9 + 1}-15T12:30:45Z"/>\n'
                )
        for i in range(n_ways):
            wid = 10_000_000 + i
            nds = "".join(
                f'<nd ref="{(i * 7 + j) % n_nodes + 1}"/>' for j in range(8)
            )
            f.write(
                f'  <way id="{wid}" user="{USERS[i % len(USERS)]}" '
                f'uid="{i % 5000 + 1}" version="1" changeset="{i % 555 + 1}" '
                f'timestamp="2017-03-0{i % 9 + 1}T08:00:00Z">{nds}'
                f'<tag k="highway" v="service"/></way>\n'
            )
        f.write("</osm>\n")
    os.replace(tmp, path)
    print(
        f"generated {path}: {os.path.getsize(path) / 1e6:.0f} MB in "
        f"{time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )


def value_hash(df) -> str:
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, MapType, StructType

    cols = [
        F.to_json(F.col(f.name))
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
        else F.col(f.name)
        for f in df.schema.fields
    ]
    h = df.select(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return f"{h['h']}/{h['n']}"


def main() -> None:
    from data_wrangling_spark.session import get_spark
    from data_wrangling_spark.sources.osm_xml import read_osm_xml

    mb = int(os.environ.get("SPARK_GRAFT_OSM_MB", "185"))
    workdir = os.environ.get("SPARK_GRAFT_SCALE_WORKDIR", "/tmp/dws-scale")
    os.makedirs(workdir, exist_ok=True)
    path = os.path.join(workdir, f"bigfile_{mb}mb.osm")
    # default density yields ~185 MB at the default knob; scale both
    # element counts linearly for other sizes
    n_nodes, n_ways = int(800_000 * mb / 185), int(100_000 * mb / 185)
    if not os.path.exists(path):
        generate(path, n_nodes, n_ways)

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(app_name="dws-bench-osm-split")
    spark.sparkContext.setLogLevel("ERROR")

    size = os.path.getsize(path)
    configs = [("one-task", size + 1), ("split 16 MB", 16 << 20),
               ("split 8 MB", 8 << 20)]
    results, baseline_hash, baseline_t = [], None, None
    for label, split_bytes in configs:
        df = read_osm_xml(spark, path, split_bytes=split_bytes)
        tasks = df.rdd.getNumPartitions()
        vh = value_hash(df)  # untimed warmup (JVM/codegen/Python workers
        # + OS page cache), same methodology as bench_scale.time_suite —
        # without it the first config (the one-task baseline) absorbed
        # the cold-start cost and inflated every speedup (review find)
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            vh = value_hash(df)
            runs.append(time.perf_counter() - t0)
        t = round(statistics.median(runs), 1)
        if baseline_hash is None:
            baseline_hash, baseline_t = vh, t
        row = {
            "read": label, "tasks": tasks, "wall_s": t,
            "speedup": round(baseline_t / t, 1) if t else None,
            "value_hash": vh,
            "identical": vh == baseline_hash,
        }
        results.append(row)
        print(json.dumps(row))
    ok = all(r["identical"] for r in results)
    print(json.dumps({"file_mb": round(size / 1e6), "all_identical": ok}))
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
