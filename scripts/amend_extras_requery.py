#!/usr/bin/env python3
"""Generic late-fix amendment for the SCALING extras section.

When a registered query's PLAN changes after the round's regeneration
(round-12 first use: the snapshot-diff pair dropped their global
orderBy on both engines), re-measure JUST those queries — fresh-JVM
worker per label for Spark, fresh DuckDB re-time of the (possibly
updated) oracle — fold the numbers into scripts/scaling_extras_last
.json + the cross-round baseline, mark the rows in the requeried audit
(reason "late-fix"), and re-render/splice the extras section. The next
full regeneration then diffs against the amended numbers.

Usage: python scripts/amend_extras_requery.py q1 [q2 ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_scale as BS  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _canonical_labels(labels: list[str]) -> list[str]:
    """scaling_extras_last.json is written sort_keys, which
    lexicographically scrambles the scale labels ('100x sf0.1' <
    '10x sf0.1' < 'sf0.01') — the FIRST run of this script re-rendered
    the extras table with columns in that order while the header
    claimed the canonical one. Restore sf ascending then mult
    ascending; everything downstream (ratio = top/base) depends on it."""

    def key(lb: str) -> tuple:
        if lb.endswith("x sf0.1"):
            return (1, int(lb.split("x")[0]))
        return (0, float(lb.replace("sf", "")))

    return sorted(labels, key=key)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit(
            "usage: amend_extras_requery.py <query> [...] | --render-only"
        )
    if names == ["--render-only"]:
        names = []
    with open(os.path.join(REPO, "scripts",
                           "scaling_extras_last.json")) as f:
        data = json.load(f)
    labels = _canonical_labels(list(data["results"]))
    workdir = os.environ.get("SPARK_GRAFT_SCALE_WORKDIR", "/tmp/dws-scale")
    dirs = {
        "sf0.01": "/root/testdata/sf0.01",
        "sf0.1": "/root/testdata/sf0.1",
        **{lb: os.path.join(workdir, "mult" + lb.split("x")[0])
           for lb in labels if lb.endswith("x sf0.1")},
    }
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from data_wrangling_spark.plans.registry import QUERIES, _load_all

    _load_all()
    specs = {n: QUERIES[n] for n in names}
    for label in labels if names else []:
        d = dirs[label]
        solo = BS._spawn_extras_worker(d, names)
        mult = int(label.split("x")[0]) if label.endswith("x sf0.1") else 1
        skip = {n for n, m in BS.DUCK_ORACLE_SKIP.items() if mult >= m}
        duck = BS.duckdb_time_suite(specs, d, threads=cpus, sink="table",
                                    skip=skip)
        for n in names:
            prev = data["results"][label].get(n)
            data["results"][label][n] = solo[n]
            if n in duck:
                data["duck"].setdefault(label, {})[n] = duck[n]
            data.setdefault("requeried", {}).setdefault(label, {})[n] = {
                "prev": prev if prev is not None else solo[n],
                "suite": prev if prev is not None else solo[n],
                "solo": solo[n],
                "moved_vs_prev": (
                    prev is not None and min(prev, solo[n]) > 0
                    and max(prev, solo[n]) / min(prev, solo[n])
                    > BS.RERUN_RATIO
                ),
                "reason": "late-fix",
            }
        print(f"{label}: {json.dumps({n: solo[n] for n in names})} "
              f"duck={json.dumps({n: duck.get(n) for n in names})}",
              file=sys.stderr)

    with open(BS._extras_baseline_path(), "w") as f:
        json.dump({"labels": data["results"],
                   "note": "final (post-solo-re-run) extras timings of the "
                           "last committed SCALING.md regeneration; the "
                           "next regeneration diffs against these"},
                  f, indent=1, sort_keys=True)
    with open(os.path.join(REPO, "scripts",
                           "scaling_extras_last.json"), "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)

    scales = [(lb, None, None) for lb in labels]
    lines: list[str] = []
    BS._extras_section(lines.append, scales, data)
    path = os.path.join(REPO, "SCALING.md")
    with open(path) as f:
        doc = f.read().splitlines()
    start = next(i for i, l in enumerate(doc)
                 if l.startswith("## Widening queries at scale"))
    end = next(i for i, l in enumerate(doc[start + 1:], start + 1)
               if l.startswith("## "))
    doc[start:end] = lines
    with open(path, "w") as f:
        f.write("\n".join(doc) + "\n")
    print(f"amended extras section spliced into {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
