"""Parity: pure-Python/numpy reference kernels == Spark operators.

`scripts/ref_kernels.py` re-implements the hash-based operators'
arithmetic from the public algorithm specs with no pyspark import; the
golden-row oracles the driver verifies against
(`golden_oracles.json`, via scripts/gen_golden_oracles.py) are produced
by those kernels. These tests close the loop: kernel output must match
the Spark operator row-for-row at sf0.001, so a frozen golden row is
evidence about the OPERATOR, not a tautology.

Mirrors the reference's golden-fixture strategy
(reference tests/native-fixtures/ — frozen expected rows for
hash-determined outputs)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import ref_kernels as RK  # noqa: E402

SF = "/root/testdata/sf0.001"
QV = [(1.0 if i % 2 == 0 else -0.5) + i * 0.01 for i in range(64)]


@pytest.fixture(scope="module")
def raw_docs(spark):
    return [
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]


@pytest.fixture(scope="module")
def raw_embs(spark):
    return [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    ]


def test_xxh64_matches_spark_strings(spark):
    rows = [("",), ("a",), ("hello world",), ("héllo — ünïcode ™",), ("x" * 100,),
            ("tab\tand\nnewline",), ("0123456789abcdef" * 5,)]
    got = spark.createDataFrame(rows, ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    ).collect()
    for r in got:
        assert RK.xxh64_str(r.s) == r.h


def test_xxh64_matches_spark_long_arrays(spark):
    rows = [([1, 2, 3, 4],), ([-5, 0, 2**61],), ([],), ([42],)]
    got = spark.createDataFrame(rows, "a: array<long>").select(
        "a", F.xxhash64("a").alias("h")
    ).collect()
    for r in got:
        assert RK.xxh64_long_array(list(r.a)) == r.h


def test_minhash_pairs_kernel_parity(spark, raw_docs):
    from sidemantic_spark.operators.dedup import minhash_lsh_pairs

    df = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.4).collect()
    )
    assert got == RK.minhash_pairs(raw_docs, jaccard_threshold=0.4)
    assert len(got) > 0


def test_simhash_pairs_kernel_parity(spark, raw_docs):
    from sidemantic_spark.operators.dedup import simhash_near_dups

    df = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dups(df, max_hamming=3).collect()
    )
    assert got == RK.simhash_pairs(raw_docs, max_hamming=3)
    assert len(got) > 0


def test_lsh_topk_kernel_parity(spark, raw_embs):
    from sidemantic_spark.operators.similarity import lsh_bucket_topk

    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = [
        (r.vec_id, r.cosine_sim)
        for r in lsh_bucket_topk(df, QV, k=20, nbits=6, probes=8, tables=8).collect()
    ]
    assert got == RK.lsh_topk(raw_embs, QV, k=20, nbits=6, probes=8, tables=8)
    assert len(got) == 20


def test_ivf_topk_kernel_parity(spark, raw_embs):
    from sidemantic_spark.operators.similarity import ivf_topk

    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = [(r.vec_id, r.cosine_sim) for r in ivf_topk(df, QV, k=20).collect()]
    assert got == RK.ivf_topk(raw_embs, QV, k=20)
    assert len(got) == 20


def test_decode_features_kernel_parity(spark, raw_docs):
    """fake-codec features through the ARRAY<FLOAT> truncation and the
    contract boundary's to_json(round(x, 6)) string form."""
    from sidemantic_spark.operators.multimodal import (
        decode_features,
        documents_as_media,
    )

    df = spark.read.parquet(f"{SF}/documents.parquet")
    out = decode_features(documents_as_media(df), dim=16, fake=True).select(
        "media_id",
        F.to_json(
            F.transform("feature", lambda x: F.round(x.cast("double"), 6))
        ).alias("feature"),
        "feature_dim",
        "decode_ok",
    )
    got = {r.media_id: (r.feature, r.feature_dim, r.decode_ok) for r in out.collect()}
    for doc_id, text in raw_docs:
        want = RK.to_json_doubles(
            RK.as_float32(RK.fake_decode(text.encode("utf-8"), 16))
        )
        assert got[doc_id] == (want, 16, "ok")


def test_png_band_means_kernel_parity(spark, raw_docs):
    """The synthetic-PNG decode entry: golden features come straight
    from the pixel formula (no PNG codec on the kernel side), so a
    codec bug in encode_png/decode_png_gray surfaces as a mismatch."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.queries()["multimodal_decode_png"](spark, SF)
    got = {r.media_id: (r.feature, r.decode_ok) for r in out.collect()}
    for doc_id, _ in raw_docs:
        want = RK.to_json_doubles(RK.as_float32(RK.png_grid_band_means(doc_id, 4)))
        assert got[doc_id] == (want, "ok")


def test_golden_oracles_fresh():
    """golden_oracles.json must be regenerable byte-for-byte from the
    checked-in kernels + testdata (guards against editing the JSON by
    hand or kernels drifting from the frozen rows)."""
    import json
    import subprocess
    import tempfile

    repo = os.path.join(os.path.dirname(__file__), "..")
    path = os.path.join(repo, "golden_oracles.json")
    if not os.path.exists(path):
        pytest.skip("golden_oracles.json not generated")
    with open(path) as f:
        current = json.load(f)
    with tempfile.TemporaryDirectory() as td:
        env = dict(os.environ)
        subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "gen_golden_oracles.py"),
             current["sf_dir"]],
            check=True, env=env,
            cwd=td,  # script writes to repo root regardless of cwd
        )
    with open(path) as f:
        regenerated = json.load(f)
    assert regenerated == current
