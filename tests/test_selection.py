"""Data-selection operators: DSIR importance resampling, bigram-LM
cross-entropy scoring, stride chunking.

Evidence strategy mirrors the dedup families: the md5 form is exact-oracle
checked by the driver (smp_dsir_md5 / txt_lm_perplexity / txt_chunk_stride);
here we pin (a) the math against tiny hand-computable models, (b) the
production xxhash64 forms against the md5 twins in lockstep (same shapes,
same invariants), and (c) the edge cases the corpus doesn't exercise.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_integration_celery_spark.operators import selection, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string, lang string")


@pytest.fixture(scope="module")
def tiny(spark):
    return _docs(spark, [
        (0, "the cat sat on the mat", "en"),
        (1, "the dog sat on the log", "en"),
        (2, "el gato y el perro", "es"),
        (3, "", "en"),
        (4, None, None),
        (5, "one", "en"),
        (6, "the the the the", "en"),
    ])


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

def _py_grams(s):
    toks = [t for t in "".join(c if c.isalnum() else " "
                               for c in s.lower()).split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def test_feature_bag_matches_python_model(spark, tiny):
    """The hashed feature bag has exactly one row per unigram/bigram
    occurrence of the normalized token stream."""
    got = (selection.hashed_ngram_features(tiny, n_buckets=8)
           .groupBy("doc_id").count().collect())
    counts = {r["doc_id"]: r["count"] for r in got}
    for r in tiny.collect():
        expect = len(_py_grams(r.text)) if r.text else 0
        assert counts.get(r.doc_id, 0) == expect, r.doc_id


def test_dsir_scores_match_python_model(spark, tiny):
    """End-to-end DSIR score equals a pure-python reimplementation with the
    same md5 bucketing, smoothing and 6dp rounding discipline."""
    import hashlib
    B, a = 16, 1.0

    def bucket(s):
        return int(hashlib.md5(f"dsir:{s}".encode()).hexdigest()[:13],
                   16) % B

    rows = tiny.collect()
    target = [r for r in rows if r.lang == "es"]
    tc, rc = [0] * B, [0] * B
    for r in target:
        for g in _py_grams(r.text or ""):
            tc[bucket(g)] += 1
    for r in rows:
        for g in _py_grams(r.text or ""):
            rc[bucket(g)] += 1
    t_tot, r_tot = sum(tc), sum(rc)
    ratios = [round(math.log((tc[b] + a) / (t_tot + a * B))
                    - math.log((rc[b] + a) / (r_tot + a * B)), 6)
              for b in range(B)]
    expect = {}
    for r in rows:
        gs = _py_grams(r.text or "")
        # decimal-exact sum of 6dp values == float sum of scaled ints
        expect[r.doc_id] = round(sum(int(round(ratios[bucket(g)] * 1e6))
                                     for g in gs) / 1e6, 6)

    feats_t = selection.hashed_ngram_features(
        tiny.where(F.col("lang") == "es"), n_buckets=B, hasher="md5")
    feats_r = selection.hashed_ngram_features(tiny, n_buckets=B,
                                              hasher="md5")
    lr = selection.bucket_log_ratios(feats_t, feats_r, B, smoothing=a)
    got = selection.dsir_scores(tiny, lr, n_buckets=B, hasher="md5")
    for r in got.collect():
        assert round(r.score, 6) == pytest.approx(expect[r.doc_id],
                                                  abs=2e-6), r.doc_id


def test_gumbel_topk_deterministic_and_seeded(spark, tiny):
    scored = selection.dsir_scores(
        tiny,
        selection.bucket_log_ratios(
            selection.hashed_ngram_features(tiny.where("lang = 'es'"),
                                            n_buckets=8, hasher="md5"),
            selection.hashed_ngram_features(tiny, n_buckets=8, hasher="md5"),
            8),
        n_buckets=8, hasher="md5")
    a = [r.doc_id for r in selection.gumbel_topk(scored, 3).collect()]
    b = [r.doc_id for r in selection.gumbel_topk(scored, 3).collect()]
    c = [r.doc_id for r in selection.gumbel_topk(scored, 3,
                                                 seed="v2").collect()]
    assert a == b                       # rerun-stable
    assert len(a) == 3
    assert sorted(a) != sorted(c) or a != c  # seed actually moves the draw


def test_dsir_hash_families_lockstep(spark, tiny):
    """xxhash64 production form: same row contract and invariants as the
    oracle-checked md5 twin (the selected set may differ — different
    uniforms — but sizes, schema and score bounds hold)."""
    for hasher in ("md5", "xxhash64"):
        out = selection.dsir_select(
            tiny, tiny.where(F.col("lang") == "es"), k=4, n_buckets=32,
            hasher=hasher)
        rows = out.collect()
        assert len(rows) == 4
        assert out.columns == ["doc_id", "n_feats", "score", "sel_key"]
        for r in rows:
            if r.n_feats == 0:
                assert r.score == 0.0


def test_dsir_temperature_flattens(spark, tiny):
    """High temperature → selection approaches the pure Gumbel draw
    (score influence vanishes): keys differ from the T=1 keys."""
    scored = selection.dsir_scores(
        tiny,
        selection.bucket_log_ratios(
            selection.hashed_ngram_features(tiny.where("lang = 'es'"),
                                            n_buckets=8, hasher="md5"),
            selection.hashed_ngram_features(tiny, n_buckets=8, hasher="md5"),
            8),
        n_buckets=8, hasher="md5")
    t1 = {r.doc_id: r.sel_key
          for r in selection.gumbel_topk(scored, 7).collect()}
    t100 = {r.doc_id: r.sel_key
            for r in selection.gumbel_topk(scored, 7,
                                           temperature=100.0).collect()}
    moved = [d for d in t1 if abs(t1[d] - t100[d]) > 1e-9]
    assert moved  # temperature reached the key


def test_dsir_validation_errors(spark, tiny):
    with pytest.raises(ValueError):
        selection.hashed_ngram_features(tiny, n_buckets=0)
    with pytest.raises(ValueError):
        selection.bucket_log_ratios(
            selection.hashed_ngram_features(tiny, n_buckets=4),
            selection.hashed_ngram_features(tiny, n_buckets=4),
            4, smoothing=0.0)
    with pytest.raises(ValueError):
        selection.gumbel_topk(tiny.withColumn("score", F.lit(0.0)), k=0)
    with pytest.raises(ValueError):
        selection.gumbel_topk(tiny.withColumn("score", F.lit(0.0)), k=1,
                              temperature=0.0)


def test_dsir_fused_equals_two_corpora(spark, tiny):
    """Column-target (fused one-pass counting) ≡ DataFrame-target
    (two featurization passes): identical ratios, scores, and selection."""
    fused = selection.dsir_select(tiny, F.col("lang") == "es", k=7,
                                  n_buckets=32, hasher="md5")
    twopass = selection.dsir_select(tiny, tiny.where(F.col("lang") == "es"),
                                    k=7, n_buckets=32, hasher="md5")
    key = lambda df: sorted((r.doc_id, r.n_feats, r.score, r.sel_key)
                            for r in df.collect())
    assert key(fused) == key(twopass)


def test_dsir_empty_target_corpus(spark, tiny):
    """An empty target corpus degrades to the uniform smoothing floor:
    every bucket gets the same ratio, scores ∝ n_feats, no crash."""
    out = selection.dsir_select(tiny, tiny.where("lang = 'xx'"), k=2,
                                n_buckets=8, hasher="md5")
    assert out.count() == 2


# ---------------------------------------------------------------------------
# Bigram LM
# ---------------------------------------------------------------------------

def test_lm_cross_entropy_hand_case(spark, tiny):
    """P('the'|'the') with the en-trained model: c(the,the)=3 (doc 6),
    context c(the,·)=7, V=8 ({the,cat,sat,on,mat,dog,log,one}), k=0.5 →
    P=(3+.5)/(7+.5*8)=3.5/11 → CE(doc 6) = -log2(3.5/11) over its
    3 identical bigrams."""
    model = selection.train_bigram_lm(tiny.where("lang = 'en'"),
                                      hash_grams=False)
    ce = {r.doc_id: r for r in
          selection.lm_cross_entropy(tiny, model, smoothing=0.5,
                                     hash_grams=False).collect()}
    assert ce[6].n_bigrams == 3
    assert ce[6].cross_entropy == pytest.approx(
        round(-math.log2(3.5 / 11.0), 6), abs=1e-6)
    # out-of-domain text scores strictly higher than in-domain
    assert ce[2].cross_entropy > ce[0].cross_entropy
    # degenerate docs: no bigrams → 0 evidence
    for d in (3, 4, 5):
        assert ce[d].n_bigrams == 0 and ce[d].cross_entropy == 0.0


def test_lm_hash_families_lockstep(spark, tiny):
    """Hashed-gram production form scores identically to string keys
    (absent a 64-bit collision, which this corpus cannot produce)."""
    outs = []
    for hg in (False, True):
        model = selection.train_bigram_lm(tiny.where("lang = 'en'"),
                                          hash_grams=hg)
        outs.append({r.doc_id: (r.n_bigrams, r.cross_entropy)
                     for r in selection.lm_cross_entropy(
                         tiny, model, hash_grams=hg).collect()})
    assert outs[0] == outs[1]


def test_lm_fused_equals_composed(spark, tiny):
    """lm_cross_entropy_fused (one flagged bigram stream) ≡ the
    train_bigram_lm + lm_cross_entropy composition, both hash families."""
    for hg in (False, True):
        model = selection.train_bigram_lm(tiny.where("lang = 'en'"),
                                          hash_grams=hg)
        composed = {r.doc_id: (r.n_bigrams, r.cross_entropy)
                    for r in selection.lm_cross_entropy(
                        tiny, model, hash_grams=hg).collect()}
        fused = {r.doc_id: (r.n_bigrams, r.cross_entropy)
                 for r in selection.lm_cross_entropy_fused(
                     tiny, F.col("lang") == "en",
                     hash_grams=hg).collect()}
        assert fused == composed, hg


def test_lm_fused_empty_reference(spark, tiny):
    """No row satisfies the flag → smoothing-floor CE 0 everywhere, no
    rows dropped (the vocab coalesce keeps the 1-row broadcast)."""
    out = selection.lm_cross_entropy_fused(tiny, F.col("lang") == "xx",
                                           hash_grams=False)
    rows = out.collect()
    assert len(rows) == tiny.count()
    assert all(r.cross_entropy == 0.0 for r in rows)


def test_lm_empty_reference_corpus(spark, tiny):
    """Empty reference: V=0 → floor P = k/(k·1) = 1 → CE 0 for every
    scored bigram; no rows dropped by the vocab crossJoin."""
    model = selection.train_bigram_lm(tiny.where("lang = 'xx'"),
                                      hash_grams=False)
    out = selection.lm_cross_entropy(tiny, model, hash_grams=False)
    assert out.count() == tiny.count()
    assert all(r.cross_entropy == 0.0 for r in out.collect())


def test_lm_smoothing_validation(spark, tiny):
    model = selection.train_bigram_lm(tiny, hash_grams=False)
    with pytest.raises(ValueError):
        selection.lm_cross_entropy(tiny, model, smoothing=0.0,
                                   hash_grams=False)


def test_lm_hash_grams_mismatch_raises(spark, tiny):
    """String-keyed model + hashed scoring stream would silently score
    everything at the smoothing floor — must raise instead."""
    model = selection.train_bigram_lm(tiny, hash_grams=False)
    with pytest.raises(ValueError, match="hash_grams mismatch"):
        selection.lm_cross_entropy(tiny, model, hash_grams=True)


def test_models_persist_roundtrip(spark, tiny, tmp_path):
    """The operational 100 TB form: both selection models are plain
    DataFrames — write the DSIR weight table / bigram LM to parquet once,
    score arriving documents against the RELOADED model; scores must be
    bit-identical to the in-memory composition (the same
    persisted-index pattern as incremental minhash/semdedup)."""
    ratios = selection.bucket_log_ratios_fused(
        tiny, F.col("lang") == "es", n_buckets=32, hasher="md5")
    ratios.write.parquet(str(tmp_path / "dsir_weights"))
    reloaded = spark.read.parquet(str(tmp_path / "dsir_weights"))
    live = {r.doc_id: (r.n_feats, r.score) for r in
            selection.dsir_scores(tiny, ratios, n_buckets=32,
                                  hasher="md5").collect()}
    persisted = {r.doc_id: (r.n_feats, r.score) for r in
                 selection.dsir_scores(tiny, reloaded, n_buckets=32,
                                       hasher="md5").collect()}
    assert live == persisted

    model = selection.train_bigram_lm(tiny.where("lang = 'en'"),
                                      hash_grams=True)
    model.write.parquet(str(tmp_path / "lm_model"))
    model_r = spark.read.parquet(str(tmp_path / "lm_model"))
    live = {r.doc_id: (r.n_bigrams, r.cross_entropy) for r in
            selection.lm_cross_entropy(tiny, model,
                                       hash_grams=True).collect()}
    persisted = {r.doc_id: (r.n_bigrams, r.cross_entropy) for r in
                 selection.lm_cross_entropy(tiny, model_r,
                                            hash_grams=True).collect()}
    assert live == persisted


def test_quantile_split_thirds(spark):
    """9 rows → head gets ceil(9/3)=3, middle ceil(18/3)-3=3, tail 3;
    ranks follow (score, id)."""
    df = spark.createDataFrame(
        [(i, float(i % 5)) for i in range(9)], "doc_id int, ce double")
    out = {r.doc_id: (r.rn, r.split)
           for r in selection.quantile_split(df, "ce",
                                             tiebreaks=["doc_id"]).collect()}
    ordered = sorted(range(9), key=lambda i: (i % 5, i))
    for rank0, doc in enumerate(ordered):
        rn = rank0 + 1
        expect = "head" if rn <= 3 else ("middle" if rn <= 6 else "tail")
        assert out[doc] == (rn, expect), doc


def test_quantile_split_custom_fractions(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(10)],
                               "doc_id int, ce double")
    out = selection.quantile_split(df, "ce", fractions=(0.2,),
                                   labels=("keep", "drop"),
                                   tiebreaks=["doc_id"])
    got = {r.doc_id: r.split for r in out.collect()}
    assert [got[i] for i in range(10)] == ["keep"] * 2 + ["drop"] * 8


def test_quantile_split_validation(spark, tiny):
    df = tiny.withColumn("ce", F.lit(0.0))
    with pytest.raises(ValueError):
        selection.quantile_split(df, "ce", fractions=(0.5,),
                                 labels=("a", "b", "c"))
    with pytest.raises(ValueError):
        selection.quantile_split(df, "ce", fractions=(0.7, 0.3),
                                 labels=("a", "b", "c"))
    with pytest.raises(ValueError):
        selection.quantile_split(df, "ce", fractions=(0.0, 0.5),
                                 labels=("a", "b", "c"))


def test_quantile_split_no_single_partition_exchange(spark):
    """The split's physical plan never funnels data rows through a
    SinglePartition exchange (the scalable-rank contract; the only
    permitted single-partition steps run over bucket counts / the 1-row
    total)."""
    df = spark.range(1000).select(
        F.col("id").cast("int").alias("doc_id"),
        (F.col("id") % 97).cast("double").alias("ce"))
    out = selection.quantile_split(df, "ce", tiebreaks=["doc_id"])
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = out._jdf.queryExecution().explainString(
        jvm_mode.fromString("formatted"))
    import re
    # every SinglePartition exchange must sit above a bucket-count or
    # 1-row aggregate, never above the data-row window — the data path
    # partitions by __bkt
    assert "hashpartitioning(__bkt" in plan
    assert plan.count("Exchange SinglePartition") <= 2


# ---------------------------------------------------------------------------
# Chunking
# ---------------------------------------------------------------------------

def test_chunk_with_stride_matches_python_model(spark, tiny):
    got = sorted(
        (r.doc_id, r.chunk_id, r.start_tok, r.n_tok, r.chunk_text)
        for r in text.chunk_with_stride(tiny, chunk_tokens=3,
                                        stride=2).collect())
    expect = []
    for r in tiny.collect():
        if r.text is None:
            continue
        ws = r.text.split(" ")
        for cid, s in enumerate(range(0, len(ws), 2)):
            w = ws[s:s + 3]
            expect.append((r.doc_id, cid, s, len(w), " ".join(w)))
    assert got == sorted(expect)


def test_chunk_full_windows_filterable(spark, tiny):
    out = text.chunk_with_stride(tiny, chunk_tokens=4, stride=4)
    full = out.where(F.col("n_tok") == 4)
    # non-overlapping full windows tile the prefix: start_tok % 4 == 0
    assert all(r.start_tok % 4 == 0 for r in full.collect())


def test_chunk_validation(spark, tiny):
    with pytest.raises(ValueError):
        text.chunk_with_stride(tiny, chunk_tokens=0)
    with pytest.raises(ValueError):
        text.chunk_with_stride(tiny, stride=0)


def test_chunk_no_shuffle_plan(spark, tiny):
    """The chunker's physical plan has no Exchange and no Python eval —
    the 1→N fan-out happens inside the scan task."""
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = (text.chunk_with_stride(tiny)._jdf.queryExecution()
            .explainString(jvm_mode.fromString("formatted")))
    assert "Exchange" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython",
                 "FlatMapGroupsInPandas", "MapInPandas"):
        assert node not in plan
