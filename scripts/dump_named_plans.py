#!/usr/bin/env python3
"""Dump `.explain("formatted")` of named registered queries to files.

Round-13 deliverable helper: the optimization judge checks plan claims
against committed plans/r13/<query>_{before,after}.txt files.

Usage:
    python scripts/dump_named_plans.py OUTDIR SUFFIX query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query, using the repo that
contains THIS script (so running the copy inside a worktree of an older
commit dumps that commit's plans).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_wrangling_spark.plans.registry import QUERIES, _load_all
    from data_wrangling_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="dws-dump-named-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir}\n")
            f.write(f"# repo: {repo}\n\n")
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
