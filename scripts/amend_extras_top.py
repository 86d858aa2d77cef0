#!/usr/bin/env python3
"""One-off round-11 amendment: apply the ratio>2 solo-confirm rule to
the just-regenerated SCALING.md without a 2h re-run.

The round-11 regeneration added the cross-round diff, which caught 32
movers — but a row whose PREVIOUS number was contaminated the same way
(adversarial snapshot_diff: 23s published twice, 12s dedicated) or a
drift just under 1.5x (q7 11.7s suite vs 4.4s dedicated, prev 9.7s)
slips through. bench_scale.py now solo-confirms every top-label row
>2x vs DuckDB during regeneration (and dumps its section inputs to
scripts/scaling_extras_last.json); this script retrofits that rule to
the current table by reconstructing the section inputs from the
regeneration's stderr log, running the solo confirmations, and
re-rendering the extras section + baseline JSON in place.

Usage: python scripts/amend_extras_top.py /tmp/regen.log
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_scale as BS  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def reconstruct(log_path: str) -> dict:
    """Rebuild extras_data (results/duck/requeried/invariants) from the
    regeneration log + the final baseline JSON (post-solo numbers)."""
    with open(BS._extras_baseline_path()) as f:
        raw = json.load(f)["labels"]
    # baseline JSON is sort_keys — restore the canonical scale order
    # (sf0.01, sf0.1, then mults ascending) or the rendered table's
    # base/top columns pick the wrong labels
    def _key(lb: str):
        return ((0, float(lb[2:])) if lb.startswith("sf")
                else (1, int(lb.split("x")[0])))
    final = {lb: raw[lb] for lb in sorted(raw, key=_key)}
    duck: dict = {}
    invariants: dict = {}
    flags: list[tuple[str, str, float, float]] = []
    with open(log_path) as f:
        for line in f:
            m = re.match(r"extras (.+?) duckdb: (\{.*\})\s*$", line)
            if m:
                duck[m.group(1)] = json.loads(m.group(2))
                continue
            m = re.match(r"semantic invariant (.+?): (\{.*\})\s*$", line)
            if m:
                invariants[m.group(1)] = json.loads(m.group(2))
                continue
            m = re.match(
                r"DIFF FLAG (.+?)/(\S+): prev=([\d.]+) cur=([\d.]+)", line
            )
            if m:
                flags.append((m.group(1), m.group(2),
                              float(m.group(3)), float(m.group(4))))
    requeried: dict = {}
    for label, name, prev, cur in flags:
        solo = final[label][name]
        requeried.setdefault(label, {})[name] = {
            "prev": prev, "suite": cur, "solo": solo,
            "moved_vs_prev": (min(prev, solo) > 0
                              and max(prev, solo) / min(prev, solo)
                              > BS.RERUN_RATIO),
        }
    return {"results": final, "duck": duck, "requeried": requeried,
            "invariants": invariants}


def main() -> None:
    log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/regen.log"
    data = reconstruct(log_path)
    labels = list(data["results"])
    top = labels[-1]
    workdir = os.environ.get("SPARK_GRAFT_SCALE_WORKDIR", "/tmp/dws-scale")
    top_dir = os.path.join(workdir, "mult" + top.split("x")[0])
    for name, sec in sorted(data["results"][top].items()):
        d_t = data["duck"].get(top, {}).get(name)
        already = name in data["requeried"].get(top, {})
        if d_t and d_t > 0 and sec / d_t > 2.0 and not already:
            print(f"RATIO FLAG {top}/{name}: {sec}s = {sec / d_t:.1f}x "
                  f"— solo confirmation", file=sys.stderr)
            solo = BS._spawn_extras_worker(top_dir, [name])[name]
            data["requeried"].setdefault(top, {})[name] = {
                "prev": sec, "suite": sec, "solo": solo,
                "moved_vs_prev": (max(sec, solo)
                                  / max(min(sec, solo), 1e-9)
                                  > BS.RERUN_RATIO),
                "reason": "ratio>2",
            }
            data["results"][top][name] = solo
            print(f"  solo: {solo}s = {solo / d_t:.1f}x", file=sys.stderr)

    # rewrite baseline + section dump with amended numbers
    with open(BS._extras_baseline_path(), "w") as f:
        json.dump({"labels": data["results"],
                   "note": "final (post-solo-re-run) extras timings of the "
                           "last committed SCALING.md regeneration; the "
                           "next regeneration diffs against these"},
                  f, indent=1, sort_keys=True)
    with open(os.path.join(REPO, "scripts", "scaling_extras_last.json"),
              "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)

    # re-render the extras section and splice into SCALING.md
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
