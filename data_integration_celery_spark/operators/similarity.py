"""Similarity search over the embeddings table (array<float> × 64).

Baseline: brute-force cosine top-k — a crossJoin bounded by the query-set
size; dot products run JVM-side via zip_with/aggregate (no Python). At scale
the query side broadcasts (queries ≪ corpus) so the probe is a map-only pass
over the corpus — no shuffle until the per-query top-k aggregation, which
carries only k rows per query.

Scale path: LSH bucketing by random-hyperplane signs (cosine LSH). Buckets
co-locate likely-similar vectors; probing hits one bucket (+ optional
multiprobe neighbors) instead of the corpus. Same contract as brute force, so
the two are drop-in interchangeable and differentially testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    # index-ordered reduction → deterministic across engines (double math)
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     round_dp: int = 6, method: str = "auto") -> DataFrame:
    """Exact cosine top-k per query vector.

    Output: (query_id, rank, cand_id, cos_sim). Ties broken on cand_id so the
    ranking is total. ``round_dp`` rounds the similarity before ranking —
    keeps cross-engine float noise out of rank boundaries.

    method='expr' scores with JVM zip_with/aggregate folds (no Python, good
    for small probes); 'blas' streams the corpus through mapInPandas against
    a broadcast query matrix (numpy matmul — ~10x faster for corpus ≫ 10^4);
    'auto' picks 'blas' when the query side is collectable.
    """
    if method == "auto":
        method = "blas"
    if method == "blas":
        import numpy as np

        qpdf = queries.select(id_col, vec_col).toPandas()
        q_ids = qpdf[id_col].to_numpy()
        qm = np.stack(qpdf[vec_col].to_numpy()).astype("float64")
        qm /= np.linalg.norm(qm, axis=1, keepdims=True)
        bc = corpus.sparkSession.sparkContext.broadcast((q_ids, qm))
        margin = 10.0 ** (-round_dp)

        def gen(batches):
            import pandas as pd
            ids_q, mq = bc.value
            for block in batches:
                c_ids = block[id_col].to_numpy()
                cm = np.stack(block[vec_col].to_numpy()).astype("float64")
                cm /= np.linalg.norm(cm, axis=1, keepdims=True)
                sims = mq @ cm.T  # queries x block
                np.place(sims, ids_q[:, None] == c_ids[None, :], -np.inf)
                kk = min(k, sims.shape[1])
                thr = np.partition(sims, -kk, axis=1)[:, -kk]
                keep = np.argwhere(sims >= (thr - margin)[:, None])
                yield pd.DataFrame({
                    "query_id": ids_q[keep[:, 0]],
                    "cand_id": c_ids[keep[:, 1]],
                    "cos_sim": np.round(sims[keep[:, 0], keep[:, 1]], round_dp)})

        scored = corpus.select(id_col, vec_col).mapInPandas(
            gen, "query_id long, cand_id long, cos_sim double")
    else:
        q = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("qv"))
        c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
        sim = F.round(cosine(F.col("qv"), F.col("cv")), round_dp)
        scored = (F.broadcast(q).crossJoin(c)
                  .where(F.col("query_id") != F.col("cand_id"))
                  .select("query_id", "cand_id", sim.alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "cand_id", "cos_sim"))


def all_pairs_topk(emb: DataFrame, k: int = 20, id_col: str = "vec_id",
                   vec_col: str = "embedding", round_dp: int = 6) -> DataFrame:
    """Global top-k most-similar pairs via blocked matrix multiply.

    One side streams through mapInPandas in Arrow blocks; the other side is a
    broadcast (ids, row-normalised matrix). Each block computes its slice of
    the similarity matrix with BLAS and emits only candidates that can reach
    the global top-k (everything ≥ its local k-th score, so id-tiebreak ties
    survive); the global top-k is then a tiny sort. ~100x over per-pair
    expression folds.

    At 100 TB the broadcast side is an IVF/LSH-bucketed partition instead of
    the full corpus — the block kernel stays identical.
    """
    import numpy as np

    pdf = emb.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = emb.sparkSession.sparkContext.broadcast((ids, mat))

    def gen(batches):
        import pandas as pd
        b_ids, bn = bc.value
        # sub-block so the similarity slice stays ~256 rows x corpus — an
        # Arrow batch x full corpus matrix is GBs at 10^5 vectors and the
        # temporaries (round/mask copies) dominate wall-clock
        sub = max(1, min(256, 2 ** 25 // max(len(b_ids), 1)))
        for block in batches:
            all_ids = block[id_col].to_numpy()
            an_full = np.stack(block[vec_col].to_numpy()).astype("float64")
            an_full /= np.linalg.norm(an_full, axis=1, keepdims=True)
            margin = 10.0 ** (-round_dp)  # covers round-up across the cut
            for s0 in range(0, len(all_ids), sub):
                a_ids = all_ids[s0:s0 + sub]
                sims = an_full[s0:s0 + sub] @ bn.T
                np.place(sims, a_ids[:, None] >= b_ids[None, :], -np.inf)
                n_valid = int(np.isfinite(sims).sum())
                if n_valid == 0:
                    continue
                # threshold on raw values with a rounding margin, round only
                # the kept candidates — rounding the full slice costs more
                # than the matmul itself
                kk = min(k, n_valid)
                thr = np.partition(sims.ravel(), -kk)[-kk]
                keep = np.argwhere(sims >= thr - margin)
                yield pd.DataFrame({
                    "id_a": a_ids[keep[:, 0]],
                    "id_b": b_ids[keep[:, 1]],
                    "cos_sim": np.round(sims[keep[:, 0], keep[:, 1]], round_dp),
                })

    cands = emb.select(id_col, vec_col).mapInPandas(
        gen, "id_a long, id_b long, cos_sim double")
    return cands.orderBy(F.col("cos_sim").desc(), "id_a", "id_b").limit(k)


def ivf_build(corpus: DataFrame, n_centroids: int = 16, iters: int = 3,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """Build an IVF (inverted-file) index: Lloyd's k-means over the corpus.

    Deterministic seeding (lowest ids), assignments via broadcast-centroid
    BLAS blocks, centroid update via posexplode + per-dimension mean — every
    step distributed except the (n_centroids × dim) centroid matrix itself.
    Returns (assignments DataFrame (id, bucket), centroids ndarray).
    """
    import numpy as np

    seed_pdf = (corpus.orderBy(id_col).limit(n_centroids)
                .select(vec_col).toPandas())
    centroids = np.stack(seed_pdf[vec_col].to_numpy()).astype("float64")
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext

    assignments = None
    for it in range(iters):
        bc = sc.broadcast(centroids)

        def assign(batches):
            import pandas as pd
            cm = bc.value
            for block in batches:
                vm = np.stack(block[vec_col].to_numpy()).astype("float64")
                vm /= np.linalg.norm(vm, axis=1, keepdims=True)
                bucket = np.argmax(vm @ cm.T, axis=1)
                yield pd.DataFrame({id_col: block[id_col], "bucket": bucket})

        assignments = corpus.select(id_col, vec_col).mapInPandas(
            assign, f"{id_col} long, bucket int")
        if it == iters - 1:
            break
        # centroid update: mean per (bucket, dim), normalised
        joined = corpus.join(assignments, id_col)
        means = (joined.select("bucket", F.posexplode(vec_col).alias("pos", "x"))
                 .groupBy("bucket", "pos").agg(F.avg("x").alias("m"))
                 .groupBy("bucket")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("vs"))
                 .select("bucket", F.transform("vs", lambda s: s.m).alias("c"))
                 .toPandas())
        for _, row in means.iterrows():
            v = np.array(row["c"], dtype="float64")
            n = np.linalg.norm(v)
            if n > 0:
                centroids[int(row["bucket"])] = v / n
    return assignments, centroids


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, nprobe: int = 4, iters: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k probing only the ``nprobe`` nearest IVF
    buckets per query; exact rescoring inside the probed buckets.

    nprobe == n_centroids degenerates to exact brute force (tested). At
    100 TB the assignments table is the persisted index; probing reads only
    the matching bucket partitions.
    """
    import numpy as np

    assignments, centroids = ivf_build(corpus, n_centroids, iters,
                                       id_col, vec_col)
    qpdf = queries.select(id_col, vec_col).toPandas()
    qm = np.stack(qpdf[vec_col].to_numpy()).astype("float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    order = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]
    probe_rows = [(int(qid), int(b))
                  for qid, buckets in zip(qpdf[id_col], order)
                  for b in buckets]
    spark = corpus.sparkSession
    probes = spark.createDataFrame(probe_rows, "query_id long, bucket int")

    cand = (probes
            .join(assignments.withColumnRenamed(id_col, "cand_id"), "bucket")
            .where(F.col("query_id") != F.col("cand_id"))
            .join(queries.select(F.col(id_col).alias("query_id"),
                                 F.col(vec_col).alias("qv")), "query_id")
            .join(corpus.select(F.col(id_col).alias("cand_id"),
                                F.col(vec_col).alias("cv")), "cand_id"))
    scored = cand.select(
        "query_id", "cand_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "cand_id", "cos_sim"))


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of ⟨v, p⟩ per plane."""
    out = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v)
        out = out + F.when(proj > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return out


def lsh_topk(corpus: DataFrame, queries: DataFrame, planes: list[list[float]],
             k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding",
             n_flips: int = 0) -> DataFrame:
    """Approximate cosine top-k: probe the query's LSH bucket, plus — with
    ``n_flips`` ≥ 1 (multi-probe LSH, Lv et al. VLDB'07) — every bucket
    within Hamming distance ``n_flips`` of it.

    Recall < 1 by construction; differential tests measure it against
    brute_force_topk. The fan-out is query-side only (queries ≪ corpus): the
    corpus is still hashed and shuffled exactly once on the bucket id, so at
    100 TB the extra probes cost ``sum(C(P,i))``× more *query* rows, not
    corpus reads. A candidate lives in exactly one bucket, so probed buckets
    never produce duplicate (query, cand) pairs.
    """
    from itertools import combinations
    masks = [0]
    for d in range(1, n_flips + 1):
        for bits in combinations(range(len(planes)), d):
            masks.append(sum(2 ** b for b in bits))
    c = (corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
         .withColumn("bucket", hyperplane_signature(F.col("cv"), planes)))
    q = (queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
         .withColumn("bucket0", hyperplane_signature(F.col("qv"), planes))
         .select("query_id", "qv",
                 F.explode(F.array(*[
                     F.col("bucket0").bitwiseXOR(F.lit(m)) for m in masks
                 ])).alias("bucket")))
    scored = (q.join(c, "bucket")
              .where(F.col("query_id") != F.col("cand_id"))
              .select("query_id", "cand_id",
                      F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "cand_id", "cos_sim"))
