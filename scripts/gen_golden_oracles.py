"""Generate golden-row oracle SQL for the contract entries whose
arithmetic no SQL engine can replicate (engine-grade xxHash64 /
hyperplane LSH / IVF k-means / codec features).

The values come from `scripts/ref_kernels.py` — pure Python/numpy
reference implementations built from the public algorithm specs, with
NO pyspark import — executed over the raw parquet at sf0.01 (the scale
the driver's correctness gate runs at). The output is a JSON file of
`SELECT ... FROM (VALUES ...)` oracle statements that DuckDB can run,
which `__spark_entry__.oracle_sql()` serves for these entries; pytest
(tests/test_ref_kernels.py) separately asserts the kernels match the
Spark operators row-for-row, so the golden rows are an independent
oracle, not an echo of the engine output.

Usage: python scripts/gen_golden_oracles.py [sf_dir]
Writes: golden_oracles.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import ref_kernels as RK

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _values_sql(rows: list[tuple], cols: list[tuple[str, str]]) -> str:
    """SELECT CAST(...) wrapper over a VALUES table so names and types
    match the Spark result exactly."""
    names = [c for c, _ in cols]
    casts = ", ".join(
        f"CAST({n} AS {t}) AS {n}" for n, t in cols
    )
    vals = ",\n".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in rows
    )
    return (
        f"SELECT {casts} FROM (VALUES\n{vals}\n) AS __golden({', '.join(names)})"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    embs = [
        (int(i), [float(x) for x in v])
        for i, v in con.execute(
            f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
    ]
    # the contract's fixed query vector (__spark_entry__._QUERY_VEC)
    qv = [(1.0 if i % 2 == 0 else -0.5) + i * 0.01 for i in range(64)]

    oracles: dict[str, str] = {}

    oracles["dedup_minhash_lsh"] = _values_sql(
        RK.minhash_pairs(docs, jaccard_threshold=0.4),
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("jaccard", "DOUBLE")],
    )
    oracles["dedup_simhash"] = _values_sql(
        RK.simhash_pairs(docs, max_hamming=3),
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "INTEGER")],
    )
    oracles["sim_ann_lsh_topk"] = _values_sql(
        RK.lsh_topk(embs, qv, k=20, nbits=6, probes=8, tables=8),
        [("vec_id", "BIGINT"), ("cosine_sim", "DOUBLE")],
    )
    oracles["sim_ann_ivf_topk"] = _values_sql(
        RK.ivf_topk(embs, qv, k=20),
        [("vec_id", "BIGINT"), ("cosine_sim", "DOUBLE")],
    )
    feat_rows = [
        (
            doc_id,
            RK.to_json_doubles(
                RK.as_float32(RK.fake_decode(text.encode("utf-8"), 16))
            ),
            16,
            "ok",
        )
        for doc_id, text in docs
    ]
    cols = [
        ("media_id", "BIGINT"),
        ("feature", "VARCHAR"),
        ("feature_dim", "BIGINT"),
        ("decode_ok", "VARCHAR"),
    ]
    oracles["multimodal_decode_features"] = _values_sql(feat_rows, cols)
    png_rows = [
        (
            doc_id,
            RK.to_json_doubles(RK.as_float32(RK.png_grid_band_means(doc_id, 4))),
            4,
            "ok",
        )
        for doc_id, _ in docs
    ]
    oracles["multimodal_decode_png"] = _values_sql(png_rows, cols)

    out = {
        "sf_dir": sf_dir,
        "generator": "scripts/gen_golden_oracles.py (pure numpy/python kernels, no Spark)",
        "oracles": oracles,
    }
    path = os.path.join(REPO, "golden_oracles.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: " + ", ".join(
        f"{k}={len(v.splitlines()) - 2} rows" for k, v in oracles.items()
    ))


if __name__ == "__main__":
    main()
