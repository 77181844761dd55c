"""Product quantization (Jégou et al. 2011): training, encoding, ADC
scan, exact re-ranking. Approximate by construction → no SQL oracle;
evidence is recall floors vs brute force, Lloyd monotonicity, and
determinism — the same strategy as ann_ivf/ann_lsh."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_celery_spark.operators import similarity as S

SF_EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(SF_EMB)


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") % 100 == 0)


@pytest.fixture(scope="module")
def brute(emb, queries):
    return {(r.query_id, r.cand_id)
            for r in S.brute_force_topk(emb, queries, k=5).collect()}


@pytest.fixture(scope="module")
def codebook(emb):
    return S.pq_train(emb, m_sub=8, k_codes=16, iters=2)


def test_pq_shapes_and_validation(emb, codebook):
    assert codebook.shape == (8, 16, 8)
    with pytest.raises(ValueError):
        S.pq_train(emb, m_sub=7)  # 64 % 7 != 0
    with pytest.raises(ValueError):
        S.pq_train(emb, iters=-1)


def test_pq_encode_deterministic_and_bounded(emb, codebook):
    a = {r.vec_id: list(r.codes)
         for r in S.pq_encode(emb, codebook).collect()}
    b = {r.vec_id: list(r.codes)
         for r in S.pq_encode(emb, codebook).collect()}
    assert a == b
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c)
               for c in a.values())


def test_pq_training_reduces_quantization_error(emb):
    """Lloyd iterations must not increase the mean reconstruction error
    (k-means objective is non-increasing)."""
    def mse(cb):
        codes = {r.vec_id: np.array(r.codes)
                 for r in S.pq_encode(emb, cb).collect()}
        vecs = {r.vec_id: np.array(r.embedding, dtype="float64")
                for r in emb.collect()}
        tot = 0.0
        for vid, v in vecs.items():
            v = v / np.linalg.norm(v)
            recon = np.concatenate(
                [cb[m, codes[vid][m]] for m in range(cb.shape[0])])
            tot += float(((v - recon) ** 2).sum())
        return tot / len(vecs)

    e0 = mse(S.pq_train(emb, m_sub=8, k_codes=16, iters=0))
    e2 = mse(S.pq_train(emb, m_sub=8, k_codes=16, iters=2))
    assert e2 <= e0 + 1e-9
    assert e2 < e0  # on this corpus training strictly helps


def test_pq_adc_recall_floor(emb, queries, brute, codebook):
    codes = S.pq_encode(emb, codebook)
    adc = {(r.query_id, r.cand_id)
           for r in S.pq_topk(codes, queries, codebook, k=5).collect()}
    recall = len(adc & brute) / len(brute)
    # 8 bytes/vector on isotropic synthetic vectors: measured 0.36;
    # generous floor guards regressions without pinning noise
    assert recall >= 0.2, recall


def test_pq_rerank_recall_floor_and_improvement(emb, queries, brute,
                                                codebook):
    codes = S.pq_encode(emb, codebook)
    adc = {(r.query_id, r.cand_id)
           for r in S.pq_topk(codes, queries, codebook, k=5).collect()}
    rr = {(r.query_id, r.cand_id)
          for r in S.pq_topk_rerank(codes, emb, queries, codebook, k=5,
                                    shortlist=50).collect()}
    r_adc = len(adc & brute) / len(brute)
    r_rr = len(rr & brute) / len(brute)
    assert r_rr >= r_adc          # rescoring can only refine the shortlist
    assert r_rr >= 0.5, (r_adc, r_rr)  # measured 0.68
    with pytest.raises(ValueError):
        S.pq_topk_rerank(codes, emb, queries, codebook, k=5, shortlist=3)


def test_pq_rerank_scores_are_exact_cosine(emb, queries, codebook):
    """Re-ranked rows carry the EXACT cosine of the candidate — identical
    to brute force for every (query, cand) pair both emit."""
    codes = S.pq_encode(emb, codebook)
    rr = {(r.query_id, r.cand_id): r.cos_sim
          for r in S.pq_topk_rerank(codes, emb, queries, codebook,
                                    k=5).collect()}
    bf = {(r.query_id, r.cand_id): r.cos_sim
          for r in S.brute_force_topk(emb, queries, k=5).collect()}
    shared = set(rr) & set(bf)
    assert shared
    for key in shared:
        assert rr[key] == pytest.approx(bf[key], abs=1e-6), key


def test_pq_train_validates_corpus_size(emb):
    """Empty or undersized corpora must raise, never yield a silently
    short codebook (the (m, k, d_sub) shape is a declared contract)."""
    with pytest.raises(ValueError, match="k_codes"):
        S.pq_train(emb.limit(0), m_sub=8, k_codes=16)
    with pytest.raises(ValueError, match="k_codes"):
        S.pq_train(emb.limit(7), m_sub=8, k_codes=16)


def test_pq_train_is_scale_invariant(emb):
    """Training happens in the same L2-normalized space pq_encode assigns
    in: rescaling every vector (power-of-two factors keep IEEE division
    exact) leaves the trained codebook unchanged. This is the property
    that the raw-component centroid update violated on non-unit corpora."""
    scale = F.pow(F.lit(2.0), ((F.col("vec_id") % 3) + 1).cast("double"))
    scaled = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x * scale).alias("embedding"))
    cb_raw = S.pq_train(emb, m_sub=8, k_codes=16, iters=2)
    cb_scaled = S.pq_train(scaled, m_sub=8, k_codes=16, iters=2)
    assert np.allclose(cb_raw, cb_scaled, atol=1e-9)


def test_pq_zero_norm_vectors_never_poison_codebook(spark, emb):
    """An all-zeros embedding with a LOW id (inside the seed region) must
    neither NaN the codebook (seeds skip zero-norm rows) nor produce
    NaN-derived codes (pq_encode clamps the norm and assigns the zero
    point deterministically); other vectors' codes are unaffected."""
    zero = spark.createDataFrame(
        [(-1, [0.0] * 64)], "vec_id long, embedding array<float>")
    poisoned = emb.select("vec_id", "embedding").unionByName(zero)
    cb = S.pq_train(poisoned, m_sub=8, k_codes=16, iters=1)
    assert np.isfinite(cb).all()
    cb_clean = S.pq_train(emb, m_sub=8, k_codes=16, iters=1)
    # the zero row is excluded from seeding AND the update -> identical
    # codebook to training without it
    assert np.allclose(cb, cb_clean, atol=1e-12)
    codes = {r.vec_id: tuple(r.codes)
             for r in S.pq_encode(poisoned, cb).collect()}
    assert len(codes[-1]) == 8 and all(0 <= c < 16 for c in codes[-1])
    a = {r.vec_id: tuple(r.codes)
         for r in S.pq_encode(poisoned, cb).collect()}
    assert a == codes  # deterministic, zero row included


def test_pq_full_shortlist_equals_brute_force(emb, queries, codebook):
    """The ann_pq_rerank driver identity as a pytest twin: with shortlist
    >= |corpus| the ADC scan keeps every candidate, so the exact re-rank
    must reproduce brute force EXACTLY (same pairs, same ranks, same
    rounded scores) — and in particular the -inf self row that survives
    a full-shortlist ADC cut must never reach the re-rank output."""
    codes = S.pq_encode(emb, codebook)
    got = {(r.query_id, r.rank): (r.cand_id, r.cos_sim)
           for r in S.pq_topk_rerank(codes, emb, queries, codebook,
                                     k=5, shortlist=1 << 30).collect()}
    want = {(r.query_id, r.rank): (r.cand_id, r.cos_sim)
            for r in S.brute_force_topk(emb, queries, k=5).collect()}
    assert got == want
    assert all(q != c for (q, _), (c, _) in got.items())  # no self matches
