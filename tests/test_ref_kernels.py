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


# ---------------------------------------------------------------------
# round 8: SPEC-level assertions (VERDICT r7 ask #6) — these validate
# the kernels against the published MATH of the algorithms, sharing no
# constants or code paths with the operators, so the golden oracles
# rest on more than kernel==operator parity.
# ---------------------------------------------------------------------

import numpy as np  # noqa: E402


def _jaccard_pair(rng, n: int, target_s: float):
    """Two integer sets with EXACT Jaccard c/(2n-c): |A|=|B|=n sharing
    c elements. Returns (A, B, realized_jaccard)."""
    c = int(round(2 * n * target_s / (1 + target_s)))
    pool = np.unique(rng.randint(1, 2**31 - 1, size=4 * n))
    rng.shuffle(pool)
    shared = pool[:c]
    only_a = pool[c:c + (n - c)]
    only_b = pool[c + (n - c):c + 2 * (n - c)]
    a = np.concatenate([shared, only_a]).tolist()
    b = np.concatenate([shared, only_b]).tolist()
    return a, b, c / float(2 * n - c)


def test_minhash_minwise_independence_spec():
    """Min-wise hashing theory: for sets with Jaccard s,
    P(minhash_i(A) == minhash_i(B)) = s, per hash. The empirical match
    rate over 64 hashes x 40 pairs must track s — a broken permutation
    schedule (correlated LCG constants, bad modulus) fails this
    regardless of what the Spark operator computes."""
    rng = np.random.RandomState(7)
    for target in (0.3, 0.5, 0.8):
        matches = total = 0
        exp = None
        for _ in range(40):
            a, b, exp = _jaccard_pair(rng, 200, target)
            sa = RK.minhash_signature(a, 64)
            sb = RK.minhash_signature(b, 64)
            matches += sum(1 for x, y in zip(sa, sb) if x == y)
            total += 64
        rate = matches / total
        # 2560 samples: binomial sigma ~0.01; affine-permutation
        # min-wise approximation adds small bias — 4-sigma-ish tolerance
        assert abs(rate - exp) < 0.05, (target, exp, rate)


def test_minhash_banding_follows_analytic_s_curve():
    """LSH banding theory: with b bands of r rows,
    P(candidate) = 1 - (1 - s^r)^b. Empirical band-collision rates on
    controlled-Jaccard pairs must track the analytic S-curve (pure
    math — no banding code shared with the operator: band equality is
    raw signature-slice equality)."""
    rng = np.random.RandomState(11)
    b, r = 16, 4
    for target, n_pairs, tol in ((0.2, 80, 0.10), (0.5, 100, 0.16)):
        hits = 0
        exp_s = None
        for _ in range(n_pairs):
            a_set, b_set, exp_s = _jaccard_pair(rng, 200, target)
            sa = RK.minhash_signature(a_set, b * r)
            sb = RK.minhash_signature(b_set, b * r)
            collide = any(
                sa[i * r:(i + 1) * r] == sb[i * r:(i + 1) * r]
                for i in range(b)
            )
            hits += collide
        expected = 1 - (1 - exp_s**r) ** b
        assert abs(hits / n_pairs - expected) < tol, (
            target, expected, hits / n_pairs
        )
        # high-similarity pairs must (almost) always collide
    rng2 = np.random.RandomState(13)
    hi_hits = 0
    for _ in range(40):
        a_set, b_set, _ = _jaccard_pair(rng2, 200, 0.9)
        sa = RK.minhash_signature(a_set, b * r)
        sb = RK.minhash_signature(b_set, b * r)
        hi_hits += any(
            sa[i * r:(i + 1) * r] == sb[i * r:(i + 1) * r] for i in range(b)
        )
    assert hi_hits >= 38  # analytic: 1-(1-0.9^4)^16 = 0.99999


def _brute_topk(embs, q, k):
    scored = [(i, RK.seq_cosine([float(x) for x in v], q)) for i, v in embs]
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def test_ivf_exhaustive_probe_equals_brute_force():
    """IVF spec: probing EVERY cell is exact — identical id set to
    brute-force cosine top-k. Any partition/routing bug breaks this."""
    rng = np.random.RandomState(3)
    embs = [(i, rng.randn(16).tolist()) for i in range(300)]
    q = rng.randn(16).tolist()
    got = RK.ivf_topk(embs, q, k=10, n_cells=8, nprobe=8)
    brute = _brute_topk(embs, q, 10)
    assert [i for i, _ in got] == [i for i, _ in brute]


def test_ivf_partial_probe_recall():
    """IVF spec: nprobe=n_cells/2 keeps high recall@10 on gaussian
    data — the coarse quantizer must actually route near neighbors to
    near cells."""
    rng = np.random.RandomState(5)
    embs = [(i, rng.randn(16).tolist()) for i in range(400)]
    recalls = []
    for t in range(5):
        q = rng.randn(16).tolist()
        brute = {i for i, _ in _brute_topk(embs, q, 10)}
        got = {i for i, _ in RK.ivf_topk(embs, q, k=10, n_cells=8, nprobe=4)}
        recalls.append(len(brute & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_lsh_planted_neighbors_and_probe_monotonicity():
    """Hyperplane-LSH spec (Charikar + Lv et al. multi-probe): vectors
    at cosine ~0.99 to the query share most hyperplane signs, so
    planted near-duplicates must be retrieved; and recall must be
    non-decreasing in the probe count (the flip sequence orders buckets
    by margin)."""
    rng = np.random.RandomState(9)
    embs = [(i, rng.randn(16).tolist()) for i in range(200)]
    q = np.array(rng.randn(16))
    planted = list(range(1000, 1005))
    for pid in planted:
        embs.append((pid, (q + rng.randn(16) * 0.02).tolist()))
    got = {i for i, _ in RK.lsh_topk(embs, q.tolist(), k=5, nbits=8, probes=16)}
    assert len(got & set(planted)) >= 4, got

    def recall(probes: int) -> float:
        r2 = np.random.RandomState(1)
        recs = []
        for _ in range(6):
            qq = r2.randn(16).tolist()
            hit = {i for i, _ in RK.lsh_topk(embs, qq, k=10, nbits=8,
                                             probes=probes)}
            brute = {i for i, _ in _brute_topk(embs, qq, 10)}
            recs.append(len(hit & brute) / 10)
        return sum(recs) / len(recs)

    r1, r16, r37 = recall(1), recall(16), recall(37)
    assert r1 <= r16 + 0.05 and r16 <= r37 + 0.05, (r1, r16, r37)
    assert r37 > r1, (r1, r37)


def test_simhash_hamming_tracks_similarity():
    """SimHash spec (Charikar): near-identical texts get near-identical
    64-bit fingerprints; unrelated texts differ in ~32 bits. Hamming
    distance must order by text similarity."""
    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different subject matter about spark engines " * 6

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    sb = RK.simhash_signature(RK.norm_text(base))
    sn = RK.simhash_signature(RK.norm_text(near))
    sf_ = RK.simhash_signature(RK.norm_text(far))
    assert ham(sb, sn) < ham(sb, sf_)
    assert ham(sb, sn) <= 8
    assert ham(sb, sf_) >= 16
