"""Dedup + similarity: LSH recall vs exact baselines, calendar ops."""

from pyspark.sql import functions as F

from data_integration_celery_spark import catalog
from data_integration_celery_spark.operators import calendar, dedup, similarity


def test_minhash_lsh_finds_exact_dups(spark, sf_dir):
    docs = catalog.load(spark, "documents", sf_dir)
    # exact duplicate groups (same normalized text) must collide in LSH
    fp = docs.select("doc_id", F.md5(F.col("text")).alias("fp"))
    dup_pairs = (fp.alias("a").join(fp.alias("b"),
                                    (F.col("a.fp") == F.col("b.fp"))
                                    & (F.col("a.doc_id") < F.col("b.doc_id")))
                 .select(F.col("a.doc_id").alias("id_a"),
                         F.col("b.doc_id").alias("id_b")))
    expected = {(r["id_a"], r["id_b"]) for r in dup_pairs.collect()}
    got = {(r["id_a"], r["id_b"])
           for r in dedup.minhash_lsh_candidates(docs).collect()}
    assert expected <= got  # identical docs always share every band
    # and estimated jaccard for exact dups is 1.0
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in dedup.minhash_lsh_candidates(docs).collect()}
    for p in expected:
        assert est[p] == 1.0


def test_simhash_identical_texts_collide(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "completely different words entirely unrelated")],
        "doc_id long, text string")
    out = dedup.simhash_dedup(df)
    groups = {r["doc_id"]: r["n_members"] for r in out.collect()}
    assert groups.get(1) == 2 and groups.get(3) == 1


def test_lsh_topk_recall(spark, sf_dir):
    import random
    emb = catalog.load(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    rnd = random.Random(7)
    planes = [[rnd.gauss(0, 1) for _ in range(64)] for _ in range(4)]
    approx = similarity.lsh_topk(emb, queries, planes, k=5)
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.2  # 4 hyperplanes / 16 buckets on random data


def test_calendar_alignment(spark):
    cal = calendar.date_range(spark, "2024-01-01", "2024-01-14")
    open_days = calendar.trading_days(cal).count()
    assert open_days == 10  # two full weeks minus weekends
    daily = spark.createDataFrame(
        [("a", "2024-01-02", 1.0)], "code string, cal_date string, v double") \
        .withColumn("cal_date", F.col("cal_date").cast("date"))
    aligned = calendar.align_to_calendar(daily, cal, "code", "cal_date")
    assert aligned.count() == 10
    assert aligned.where(F.col("v").isNotNull()).count() == 1


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    from pyspark.sql import functions as F
    emb = catalog.load(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") % 150 == 0)
    brute = similarity.brute_force_topk(emb, queries, k=5)
    full = similarity.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=8)
    b = sorted((r["query_id"], r["rank"], r["cand_id"]) for r in brute.collect())
    f = sorted((r["query_id"], r["rank"], r["cand_id"]) for r in full.collect())
    assert b == f  # probing every bucket degenerates to exact search


def test_ivf_partial_probe_recall(spark, sf_dir):
    from pyspark.sql import functions as F
    emb = catalog.load(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") % 150 == 0)
    brute = similarity.brute_force_topk(emb, queries, k=5)
    approx = similarity.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=3)
    b = {(r["query_id"], r["cand_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.5  # probing 3/8 buckets keeps most true neighbours


def test_lsh_multiprobe_improves_recall(spark, sf_dir):
    """Multi-probe (flip up to d sign bits) must dominate single-bucket
    recall, and probing every bucket (n_flips = n_planes) is exhaustive —
    identical to brute force."""
    import random
    emb = catalog.load(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    rnd = random.Random(7)
    planes = [[rnd.gauss(0, 1) for _ in range(64)] for _ in range(4)]

    def recall(n_flips):
        got = similarity.lsh_topk(emb, queries, planes, k=5, n_flips=n_flips)
        a = {(r["query_id"], r["cand_id"]) for r in got.collect()}
        return len(e & a) / len(e)

    r0, r1, r_all = recall(0), recall(1), recall(4)
    assert r1 >= r0
    assert r1 >= 0.4  # 1-flip probes 5/16 buckets: ~2.4x the 0.2 single-bucket floor
    assert r_all == 1.0


def test_all_pairs_topk_block_invariant_and_distributed(spark, sf_dir):
    """Exact block-pair all-pairs: result is independent of the block count
    (1 block ≡ degenerate single task; 5 blocks ≡ 15 block-pair tasks), and
    the plan contains no driver-side corpus collect (no broadcast of the
    embedding matrix — the old scale-killer)."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    r1 = [tuple(r) for r in
          similarity.all_pairs_topk(emb, k=10, n_blocks=1).collect()]
    r5 = [tuple(r) for r in
          similarity.all_pairs_topk(emb, k=10, n_blocks=5).collect()]
    r_auto = [tuple(r) for r in
              similarity.all_pairs_topk(emb, k=10, block_rows=100).collect()]
    assert r1 == r5 == r_auto
    assert len(r1) == 10
    # every returned pair is ordered and scored within [-1, 1]
    for id_a, id_b, cos_sim in r1:
        assert id_a < id_b
        assert -1.0 <= cos_sim <= 1.0


def test_lsh_probe_ordering_budgeted(spark, sf_dir):
    """Query-adaptive probe ordering (max_probes): full budget == exhaustive
    1-flip probing exactly; a half budget spent on the most-uncertain planes
    must dominate bucket-only recall and approach the exhaustive result."""
    import random

    emb = catalog.load(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") % 100 == 0)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    rnd = random.Random(7)
    planes = [[rnd.gauss(0, 1) for _ in range(64)] for _ in range(4)]

    def pairs(**kw):
        got = similarity.lsh_topk(emb, queries, planes, k=5, **kw)
        return {(r["query_id"], r["cand_id"]) for r in got.collect()}

    # full budget == exhaustive 1-flip, same candidate set
    assert pairs(max_probes=4) == pairs(n_flips=1)
    # budgeted ordered probing: superset of bucket-only, within exhaustive
    p0, p2, p4 = pairs(n_flips=0), pairs(max_probes=2), pairs(max_probes=4)
    r0 = len(e & p0) / len(e)
    r2 = len(e & p2) / len(e)
    r4 = len(e & p4) / len(e)
    assert r2 >= r0
    assert r4 >= r2
    # the ordered half-budget should capture most of the 1-flip recall gain
    assert r2 >= r0 + 0.5 * (r4 - r0)


def test_centroid_outlier_scores(spark):
    """Members identical to their centroid score cos=1; an injected far-off
    vector ranks as its label's top outlier."""
    from data_integration_celery_spark.operators import similarity

    dim = 8
    rows = []
    for vid in range(6):                      # label 0: identical vectors
        rows.append((vid, [1.0] * dim, 0))
    rows.append((100, [-1.0] * dim, 1))       # label 1: one opposed outlier
    for vid in range(101, 105):
        rows.append((vid, [1.0] * dim, 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    full = {r["vec_id"]: r["cos_centroid"]
            for r in similarity.centroid_outlier_scores(emb).collect()}
    assert all(abs(full[v] - 1.0) < 1e-6 for v in range(6))

    top = {r["label"]: r["vec_id"]
           for r in similarity.centroid_outlier_scores(emb, bottom_k=1).collect()}
    assert top[1] == 100
    assert full[100] < full[101]


def test_semdedup_prunes_planted_duplicates(spark):
    """Two planted near-duplicate groups inside distinct clusters: each
    group keeps exactly its least-centroid-similar member, cross-cluster
    near-parallel vectors are NOT grouped (cluster is the blocking key),
    and isolated vectors keep themselves."""
    import math
    rows = []
    # cluster A around e0: seeds come from the lowest ids, so id 0 and
    # id 1 (orthogonal) become the two centroids
    rows.append((0, [1.0, 0.0, 0.0, 0.0]))
    rows.append((1, [0.0, 1.0, 0.0, 0.0]))
    # dup group in cluster 0: three tiny rotations of e0
    for i, eps in ((10, 0.01), (11, 0.02), (12, 0.03)):
        n = math.sqrt(1 + eps * eps)
        rows.append((i, [1.0 / n, eps / n, 0.0, 0.0]))
    # dup pair in cluster 1
    for i, eps in ((20, 0.01), (21, 0.02)):
        n = math.sqrt(1 + eps * eps)
        rows.append((i, [eps / n, 1.0 / n, 0.0, 0.0]))
    # isolated vector, its own cluster-1 member but far from everything
    rows.append((30, [0.0, 0.5, 0.0, 0.86]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["id"]: r for r in
           similarity.semdedup(emb, n_clusters=2, tau=0.9).collect()}
    assert len(out) == 8
    # group {0,10,11,12}: all near-identical to centroid 0 -> one component
    comp0 = {out[i]["component"] for i in (0, 10, 11, 12)}
    assert comp0 == {0}
    # keep-rule: member with LOWEST cos_centroid wins -> id 12 (largest eps)
    keepers0 = [i for i in (0, 10, 11, 12) if out[i]["keep"]]
    assert keepers0 == [12]
    # group {1,20,21}: centroid-1 dups; lowest cos_centroid is id 21
    assert {out[i]["component"] for i in (1, 20, 21)} == {1}
    assert [i for i in (1, 20, 21) if out[i]["keep"]] == [21]
    # isolated vector: own singleton component, kept
    assert out[30]["component"] == 30 and out[30]["keep"]


def test_semdedup_edges_never_cross_clusters(spark, sf_dir):
    """Every duplicate group lives inside one cluster (the blocking
    invariant the 100 TB plan relies on): all members of any component
    share the component root's cluster."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    out = similarity.semdedup(emb, n_clusters=8, tau=0.35)
    n_bad = (out.groupBy("component")
             .agg(F.countDistinct("cluster").alias("nc"))
             .where(F.col("nc") > 1).count())
    assert n_bad == 0
    # and the prune list is non-trivial at this tau on the test corpus
    assert out.where(~F.col("keep")).count() > 0
    # exactly one keeper per component
    bad_keep = (out.groupBy("component")
                .agg(F.sum(F.col("keep").cast("int")).alias("k"))
                .where(F.col("k") != 1).count())
    assert bad_keep == 0


def test_semdedup_blas_equals_expr(spark, sf_dir):
    """The per-cluster BLAS pair kernel and the all-JVM expression join
    must produce identical labelings (same 6dp rounding on both paths)."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    a = sorted(map(tuple, similarity.semdedup(emb, 8, 0.4,
                                              method="expr").collect()))
    b = sorted(map(tuple, similarity.semdedup(emb, 8, 0.4,
                                              method="blas").collect()))
    assert a == b


def test_semdedup_kmeans_production_form(spark, sf_dir):
    """iters>0 (real Lloyd k-means via ivf_build) keeps every structural
    invariant of the seed form: one row per vector, edges never cross
    clusters, exactly one keeper per component, and the keeper is the
    least-centroid-similar member (ties on id)."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    out = similarity.semdedup(emb, n_clusters=8, tau=0.35, iters=2)
    rows = out.collect()
    assert len(rows) == emb.count()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        clusters = {m["cluster"] for m in members}
        assert len(clusters) == 1                       # blocking invariant
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1                        # one keeper
        want = min(members, key=lambda m: (m["cos_centroid"], m["id"]))
        assert keepers[0]["id"] == want["id"]           # paper keep-rule
    import pytest
    with pytest.raises(ValueError):
        similarity.semdedup(emb, iters=2, method="expr")


def test_incremental_semdedup_equals_full_restriction(spark, sf_dir):
    """Increment vs persisted index == the all-corpus per-cluster pair set
    (same centroids) restricted to pairs touching >= 1 new id — and
    old-vs-old pairs never appear."""
    from pyspark.sql import functions as F

    emb = catalog.load(spark, "embeddings", sf_dir)
    old = emb.where(F.col("vec_id") % 5 != 0)
    new = emb.where(F.col("vec_id") % 5 == 0)
    member, cents = similarity.semdedup_index(old, n_clusters=8)
    got = {(r["id_a"], r["id_b"], r["cos"]) for r in
           similarity.incremental_semdedup_pairs(
               new, member, cents, tau=0.3).collect()}
    # reference: assign the WHOLE corpus with the same centroid matrix,
    # all within-cluster pairs >= tau, keep pairs touching a new id with
    # the increment's orientation (new side first for new-old pairs)
    nv = F.transform(F.col("embedding"),
                     lambda x: x.cast("double") / similarity._norm(
                         F.col("embedding")))
    vecs = emb.select(F.col("vec_id").alias("id"), nv.alias("nv"))
    allm = similarity._assign_to_centroids(vecs, cents, 6)
    a = allm.select(F.col("cluster").alias("cl"), F.col("id").alias("ia"),
                    F.col("nv").alias("va"))
    b = allm.select(F.col("cluster").alias("cl"), F.col("id").alias("ib"),
                    F.col("nv").alias("vb"))
    full = (a.join(b, "cl").where(F.col("ia") < F.col("ib"))
            .select("ia", "ib",
                    F.round(similarity._dot(F.col("va"), F.col("vb")),
                            6).alias("cos"))
            .where(F.col("cos") >= 0.3).collect())
    want = set()
    for r in full:
        ia, ib, c = r["ia"], r["ib"], r["cos"]
        na, nb = ia % 5 == 0, ib % 5 == 0
        if na and nb:
            want.add((ia, ib, c))          # new-new keeps id order
        elif na:
            want.add((ia, ib, c))          # new first
        elif nb:
            want.add((ib, ia, c))          # reorient old-new -> new-old
    assert got == want and got
    # and strictly no old-old pair leaked
    assert all((x % 5 == 0) or (y % 5 == 0) for x, y, _ in got)


# --------------------------------------------------- r8s2 review regressions


def test_ann_kernels_survive_degenerate_vectors(spark):
    """NULL / zero-norm vectors must not poison the numpy ANN kernels: no
    NaN thresholds dropping valid candidates, no (q, q, -inf) self rows,
    no single-bucket IVF collapse from a poisoned seed."""
    import numpy as np

    from data_integration_celery_spark.operators import similarity as sim
    from pyspark.sql import functions as F
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(12)]
    rows += [(12, [0.0] * 8), (13, None)]  # zero-norm + NULL
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    blas = sim.brute_force_topk(emb, emb, k=5, method="blas")
    expr = sim.brute_force_topk(emb, emb, k=5, method="expr")
    got_b = {(r.query_id, r.rank, r.cand_id) for r in blas.collect()}
    got_e = {(r.query_id, r.rank, r.cand_id)
             for r in expr.where(F.col("cos_sim").isNotNull()).collect()}
    assert got_b == {(q, rk, c) for q, rk, c in got_e if q <= 11 and c <= 11}
    assert blas.where(F.col("query_id") == F.col("cand_id")).count() == 0
    assert blas.where(F.col("cos_sim").isNull() | F.isnan("cos_sim")
                      | (F.col("cos_sim") == float("-inf"))).count() == 0

    pairs = sim.all_pairs_topk(emb, k=6, n_blocks=3)
    assert pairs.count() == 6
    assert pairs.where(F.col("id_a").isin(12, 13)
                       | F.col("id_b").isin(12, 13)).count() == 0

    assign, cents = sim.ivf_build(emb, n_centroids=4, iters=2)
    assert not np.isnan(cents).any(), "zero-norm seed poisoned a centroid"
    n_buckets = assign.select("bucket").distinct().count()
    assert n_buckets > 1, "assignments collapsed to one bucket"

    lab = emb.withColumn("label", F.lit("a"))
    out = sim.centroid_outlier_scores(lab, label_col="label", bottom_k=3)
    assert out.where(F.col("vec_id").isin(12, 13)).count() == 0
    assert out.where(F.col("cos_centroid").isNull()).count() == 0


def test_mixture_fractions_zero_share_and_split_null_scores(spark):
    from data_integration_celery_spark.operators import sampling, selection
    from pyspark.sql import functions as F
    fr = sampling.mixture_fractions({"en": 100, "de": 50},
                                    {"en": 0.8, "de": 0.0})
    assert fr["de"] == 0.0 and 0 < fr["en"] <= 1.0
    import pytest as _pt
    with _pt.raises(ValueError, match="negative"):
        sampling.mixture_fractions({"en": 10}, {"en": -0.1})
    with _pt.raises(ValueError, match="zero"):
        sampling.mixture_fractions({"en": 10}, {"en": 0.0})
    # NULL scores neither rank nor count toward the split thresholds
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(9)] + [(100, None), (101, None)],
        "doc_id long, ce double")
    out = selection.quantile_split(df, "ce", tiebreaks=["doc_id"])
    rows = {r.doc_id: r.split for r in out.collect()}
    assert 100 not in rows and 101 not in rows
    assert [rows[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3)
