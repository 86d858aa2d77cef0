"""Regenerate data_wrangling_spark/plans/seeded_goldens_data.py.

Captures the current output of the seeded (non-SQL-expressible) hash /
sketch queries at sf0.001 AND sf0.01 and pins them as content-addressed
golden rows, keyed by a DuckDB-computable corpus fingerprint so ONE
fixed oracle SQL string serves whichever scale factor the harness runs.

Provenance policy (documented in plans/seeded_goldens.py): two tiers —
minhash/simhash/embedding-cosine/topk-lsh goldens are gated on an
INDEPENDENT pure-Python derivation (scripts/pure_seeded_reference.py)
and will not pin unless the engine matches it; the remaining three
(Lloyd-IVF, MLlib BRP, HLL) are pinned snapshots of the engine's own
seeded implementations, whose semantic truth lives in the pytest
recall/equivalence pins (tests/test_dedup.py, test_similarity.py,
test_sketches.py). Run this script ONLY after deliberately changing a
seeded implementation, then re-run the full pytest suite:

    python scripts/capture_seeded_goldens.py
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

#: query -> (base table, DuckDB corpus-fingerprint SQL over that table)
CORPUS_KEYS = {
    "documents": "CAST(SUM(LENGTH(text)) AS BIGINT)",
    "embeddings": "CAST(SUM(CAST(floor(embedding[1] * 1000000) AS BIGINT)) AS BIGINT)",
    "events": "COUNT(*)",
}
QUERY_TABLES = {
    "x_dedup_minhash_lsh": "documents",
    "x_dedup_simhash": "documents",
    "x_dedup_embedding_cosine": "embeddings",
    "x_sim_topk_lsh": "embeddings",
    "x_sim_topk_ivf": "embeddings",
    "x_sim_topk_mllib_brp": "embeddings",
    # x_sketch_hll_weekly_users left this list in round 7: the
    # engine-portable HLL (operators/sketches.py) made its oracle a
    # full independent SQL re-derivation, no snapshot needed
}


def main() -> None:
    import duckdb

    from data_wrangling_spark.plans.registry import QUERIES, queries
    from data_wrangling_spark.session import get_spark

    queries()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()

    capture: dict[str, dict] = {}
    for sf in SF_DIRS:
        keys = {
            t: con.execute(
                f"SELECT {expr} FROM read_parquet('{sf}/{t}.parquet')"
            ).fetchone()[0]
            for t, expr in CORPUS_KEYS.items()
        }
        for name, table in QUERY_TABLES.items():
            df = QUERIES[name].spark(spark, sf).toPandas()
            rows = [
                tuple(
                    None
                    if v is None or (isinstance(v, float) and math.isnan(v))
                    else (float(v) if isinstance(v, float) else int(v) if hasattr(v, "item") and "int" in str(type(v).__name__).lower() else v)
                    for v in row
                )
                for row in df.itertuples(index=False)
            ]
            spec = capture.setdefault(
                name,
                {
                    "table": table,
                    "columns": list(df.columns),
                    "dtypes": [str(df[c].dtype) for c in df.columns],
                    "slices": {},
                },
            )
            assert spec["columns"] == list(df.columns)
            if name in (
                "x_dedup_minhash_lsh",
                "x_dedup_simhash",
                "x_dedup_embedding_cosine",
                "x_sim_topk_lsh",
            ):
                # INDEPENDENT derivation gate (pure-Python XXH64 /
                # fold-exact float64 — scripts/pure_seeded_reference.py):
                # for these four, the golden is only pinned if the
                # engine output equals the dual implementation,
                # upgrading their provenance from regression snapshot to
                # independently derived expected output.
                import pure_seeded_reference as R

                if name in ("x_dedup_embedding_cosine", "x_sim_topk_lsh"):
                    vecs = [
                        (i, list(v) if v is not None else None)
                        for i, v in con.execute(
                            f"SELECT vec_id, embedding FROM "
                            f"read_parquet('{sf}/embeddings.parquet') "
                            "ORDER BY vec_id"
                        ).fetchall()
                    ]
                    if name == "x_dedup_embedding_cosine":
                        want = R.derive_embedding_cosine_pairs(vecs)
                    else:
                        want = R.derive_topk_lsh(vecs)
                else:
                    docs = con.execute(
                        f"SELECT doc_id, text FROM "
                        f"read_parquet('{sf}/documents.parquet')"
                        " ORDER BY doc_id"
                    ).fetchall()
                    if name == "x_dedup_minhash_lsh":
                        want = R.derive_minhash_pairs(docs, threshold=0.35)
                    else:
                        want = R.derive_simhash_pairs(docs, max_hamming=3)
                assert rows == want, (
                    f"{name}@{sf}: engine output diverges from the "
                    f"independent pure-Python derivation "
                    f"({len(rows)} vs {len(want)} rows)"
                )
            spec["slices"][int(keys[table])] = rows

    out = os.path.join(
        os.path.dirname(__file__),
        "..",
        "data_wrangling_spark",
        "plans",
        "seeded_goldens_data.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""AUTO-GENERATED by scripts/capture_seeded_goldens.py — do not '
            "hand-edit.\n\nPinned golden outputs of the seeded hash/sketch "
            "queries per corpus\nfingerprint (see plans/seeded_goldens.py "
            'for the policy)."""\n\n'
        )
        f.write("CORPUS_KEYS = {\n")
        for t, expr in CORPUS_KEYS.items():
            f.write(f"    {t!r}: {expr!r},\n")
        f.write("}\n\nGOLDENS = {\n")
        for name, spec in capture.items():
            f.write(f"    {name!r}: {{\n")
            f.write(f"        'table': {spec['table']!r},\n")
            f.write(f"        'columns': {spec['columns']!r},\n")
            f.write(f"        'dtypes': {spec['dtypes']!r},\n")
            f.write("        'slices': {\n")
            for key, rows in spec["slices"].items():
                f.write(f"            {key}: [\n")
                for row in rows:
                    f.write(f"                {row!r},\n")
                f.write("            ],\n")
            f.write("        },\n    },\n")
        f.write("}\n")
    print(f"wrote {out}")
    for name, spec in capture.items():
        print(name, {k: len(v) for k, v in spec["slices"].items()})


if __name__ == "__main__":
    main()
