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


def _np_round_half_up(a, dp: int):
    """HALF_UP rounding like Spark's F.round / DuckDB's round — np.round
    is banker's half-to-even, which disagrees on exact decimal halves
    (np.round(0.0078125, 6) = .007812; both engines give .007813).
    Oracle-matched kernels must round the same way the SQL side does."""
    import numpy as np
    scale = 10.0 ** dp
    return np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale


def _dot(a: Column, b: Column) -> Column:
    # index-ordered reduction → deterministic across engines (double math)
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm side yields NULL (no direction), not an ANSI
    # DIVIDE_BY_ZERO job failure; nonzero divisors are bit-identical
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def _cosine_pre(a: Column, b: Column, a_norm: Column,
                b_norm: Column) -> Column:
    """cosine() with the two norms precomputed as stored columns.

    In a join projection, ``cosine(qv, cv)`` re-runs BOTH norm folds per
    OUTPUT PAIR — 3 interpreted array folds per candidate where one (the
    dot) suffices. Materializing each side's norm in its pre-join
    projection evaluates it once per INPUT row (broadcast build sides
    store it in the hashed relation), leaving only the dot fold on the
    pair path — measured 2.6x on the 10x-replica LSH rescore. The norm
    expression is unchanged (same fold, same order), so the quotient is
    bit-identical to cosine() and every oracle hash still matches.
    try_divide mirrors cosine(): zero-norm → NULL, never an ANSI error."""
    return F.try_divide(_dot(a, b), a_norm * b_norm)


def _normalized_vecs(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, nv) with nv = vec/‖vec‖ as double — the shared prologue of the
    SemDeDup family (batch, index, incremental, streaming).

    Null, empty, AND zero-norm rows are excluded: a zero vector has no
    direction, and x/0 is NULL in Spark, so it would surface as an
    all-NaN row that poisons the BLAS kernels and persists into the
    member index where it can never match (NaN >= tau is false). The norm
    is staged as a column and computed ONCE per row — an aggregate inside
    the per-element transform lambda re-evaluates it per element in
    interpreted Catalyst (O(d²) multiply-adds per row)."""
    staged = (emb.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
              .withColumn("__nrm", _norm(F.col(vec_col)))
              .where(F.col("__nrm") > 0))
    nv = F.transform(F.col(vec_col),
                     lambda x: x.cast("double") / F.col("__nrm"))
    return staged.select(F.col(id_col).alias("id"), nv.alias("nv"))


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

        # degenerate rows (NULL/empty/zero-norm) are excluded on BOTH sides,
        # the _normalized_vecs rule: a zero vector normalizes to NaN, and one
        # NaN column poisons np.partition's threshold — the k-th finite
        # candidate then fails the cut and valid rows silently vanish
        qpdf = queries.select(id_col, vec_col).toPandas()
        qpdf = qpdf[qpdf[vec_col].map(
            lambda v: v is not None and len(v) > 0)]
        q_ids = qpdf[id_col].to_numpy()
        qm = (np.stack(qpdf[vec_col].to_numpy()).astype("float64")
              if len(q_ids) else np.zeros((0, 1)))
        qn = np.linalg.norm(qm, axis=1, keepdims=True)
        q_ok = qn[:, 0] > 0
        q_ids, qm, qn = q_ids[q_ok], qm[q_ok], qn[q_ok]
        if len(q_ids):
            qm = qm / qn
        bc = corpus.sparkSession.sparkContext.broadcast((q_ids, qm))
        margin = 10.0 ** (-round_dp)

        def gen(batches):
            import pandas as pd
            ids_q, mq = bc.value
            empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                  "cand_id": pd.Series(dtype="int64"),
                                  "cos_sim": pd.Series(dtype="float64")})
            if not len(ids_q):
                yield empty
                return
            for block in batches:
                ok = block[vec_col].map(
                    lambda v: v is not None and len(v) > 0)
                block = block[ok]
                if not len(block):
                    continue
                c_ids = block[id_col].to_numpy()
                cm = np.stack(block[vec_col].to_numpy()).astype("float64")
                cn = np.linalg.norm(cm, axis=1, keepdims=True)
                good = cn[:, 0] > 0
                c_ids, cm, cn = c_ids[good], cm[good], cn[good]
                if not len(c_ids):
                    continue
                cm = cm / cn
                sims = mq @ cm.T  # queries x block
                np.place(sims, ids_q[:, None] == c_ids[None, :], -np.inf)
                kk = min(k, sims.shape[1])
                thr = np.partition(sims, -kk, axis=1)[:, -kk]
                # isfinite: when a query has < k candidates in the block the
                # threshold collapses to the -inf self cell, which would
                # otherwise pass >= thr and leak a (q, q, -inf) row the expr
                # path never emits
                keep = np.argwhere((sims >= (thr - margin)[:, None])
                                   & np.isfinite(sims))
                yield pd.DataFrame({
                    "query_id": ids_q[keep[:, 0]],
                    "cand_id": c_ids[keep[:, 1]],
                    "cos_sim": _np_round_half_up(sims[keep[:, 0], keep[:, 1]], round_dp)})

        scored = corpus.select(id_col, vec_col).mapInPandas(
            gen, "query_id long, cand_id long, cos_sim double")
    else:
        q = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("qv"),
                           _norm(F.col(vec_col)).alias("__qn"))
        c = corpus.select(F.col(id_col).alias("cand_id"),
                          F.col(vec_col).alias("cv"),
                          _norm(F.col(vec_col)).alias("__cn"))
        sim = F.round(_cosine_pre(F.col("qv"), F.col("cv"),
                                  F.col("__qn"), F.col("__cn")), round_dp)
        scored = (F.broadcast(q).crossJoin(c)
                  .where(F.col("query_id") != F.col("cand_id"))
                  .select("query_id", "cand_id", sim.alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "cand_id", "cos_sim"))


# block-count memo for all_pairs_topk, keyed by DataFrame.semanticHash()
_BLOCK_COUNT_CACHE: dict[int, int] = {}


def all_pairs_topk(emb: DataFrame, k: int = 20, id_col: str = "vec_id",
                   vec_col: str = "embedding", round_dp: int = 6,
                   block_rows: int = 8192, n_blocks: int | None = None) -> DataFrame:
    """Global top-k most-similar pairs — exact, fully distributed.

    Block-pair decomposition: vectors hash into ``B`` balanced blocks
    (``B = ceil(n / block_rows)`` unless ``n_blocks`` is given); every
    unordered block pair (a ≤ b) becomes one task whose executor BLAS-
    multiplies block a against block b (sub-blocked so the similarity slice
    stays ~16 MB) and emits only candidates that can reach the global top-k
    (everything ≥ its local k-th score minus a rounding margin, so id-tiebreak
    ties survive). The global top-k is then a tiny sort over ≤ B(B+1)/2 · k
    candidate rows.

    Exact all-pairs is inherently n² compute; what matters at scale is that
    (1) no single node ever materialises the corpus — each task holds two
    blocks of ``block_rows`` vectors (the previous implementation collected
    the whole corpus to the driver and broadcast it), and (2) shuffle volume
    is O(n·B) rows, the minimum for every-vector-meets-every-vector. For
    near-dup *detection* (threshold, not global top-k) use the LSH/IVF
    bucketed paths, which prune compute as well.
    """
    import numpy as np

    spark = emb.sparkSession
    if n_blocks is None:
        # sizing action kept cheap: ids-only projection (column pruning
        # keeps the vectors out of the scan) and memoized per logical plan,
        # so repeated invocations over the same frame do zero extra jobs.
        # Block sizing tolerates staleness — it only balances task grain.
        try:
            key = emb.semanticHash()
        except Exception:
            key = None
        n = _BLOCK_COUNT_CACHE.get(key) if key is not None else None
        if n is None:
            n = emb.select(id_col).count()
            if key is not None:
                _BLOCK_COUNT_CACHE[key] = n
        n_blocks = max(1, -(-n // block_rows))
    B = int(n_blocks)
    # _normalized_vecs rule: NULL/empty/zero-norm rows out BEFORE the kernel
    # — one NaN row from 0-norm division poisons np.partition's ravel
    # threshold for the whole tile and true top-k pairs silently vanish
    src = (emb.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
           .withColumn("__nrm", _norm(F.col(vec_col)))
           .where(F.col("__nrm") > 0)
           .select(
               F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
               F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int").alias("blk")))
    pairs = spark.createDataFrame(
        [(a, b) for a in range(B) for b in range(a, B)],
        "blk_a int, blk_b int")
    left = (pairs.join(src.withColumnRenamed("blk", "blk_a"), "blk_a")
            .select("blk_a", "blk_b", F.lit(0).alias("side"), "vid", "vec"))
    right = (pairs.where(F.col("blk_a") != F.col("blk_b"))
             .join(src.withColumnRenamed("blk", "blk_b"), "blk_b")
             .select("blk_a", "blk_b", F.lit(1).alias("side"), "vid", "vec"))
    tagged = left.unionByName(right)
    margin = 10.0 ** (-round_dp)  # covers round-up across the top-k cut

    def norm_mat(frame):
        m = np.stack(frame["vec"].to_numpy()).astype("float64")
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return frame["vid"].to_numpy(), m

    def score(key, pdf):
        import pandas as pd
        empty = pd.DataFrame({"id_a": np.array([], dtype="int64"),
                              "id_b": np.array([], dtype="int64"),
                              "cos_sim": np.array([], dtype="float64")})
        diag = key[0] == key[1]
        lpdf = pdf[pdf["side"] == 0]
        rpdf = lpdf if diag else pdf[pdf["side"] == 1]
        if not len(lpdf) or not len(rpdf):
            return empty
        l_ids, lm = norm_mat(lpdf)
        r_ids, rm = (l_ids, lm) if diag else norm_mat(rpdf)
        out = []
        sub = max(1, min(256, 2 ** 21 // max(len(r_ids), 1)))
        for s0 in range(0, len(l_ids), sub):
            a_ids = l_ids[s0:s0 + sub]
            sims = lm[s0:s0 + sub] @ rm.T
            if diag:
                # same set on both sides: keep each unordered pair once
                np.place(sims, a_ids[:, None] >= r_ids[None, :], -np.inf)
            n_valid = int(np.isfinite(sims).sum())
            if n_valid == 0:
                continue
            kk = min(k, n_valid)
            thr = np.partition(sims.ravel(), -kk)[-kk]
            keep = np.argwhere(sims >= thr - margin)
            ia, ib = a_ids[keep[:, 0]], r_ids[keep[:, 1]]
            out.append(pd.DataFrame({
                "id_a": np.minimum(ia, ib),
                "id_b": np.maximum(ia, ib),
                "cos_sim": _np_round_half_up(sims[keep[:, 0], keep[:, 1]], round_dp),
            }))
        return pd.concat(out, ignore_index=True) if out else empty

    cands = tagged.groupBy("blk_a", "blk_b").applyInPandas(
        score, "id_a long, id_b long, cos_sim double")
    return cands.orderBy(F.col("cos_sim").desc(), "id_a", "id_b").limit(k)


def ivf_build(corpus: DataFrame, n_centroids: int = 16, iters: int = 3,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """Build an IVF (inverted-file) index: Lloyd's k-means over the corpus.

    Deterministic seeding (lowest ids), assignments via broadcast-centroid
    BLAS blocks, centroid update via per-Arrow-batch partial sums reduced
    driver-side in a fixed sort order — every step distributed except the
    (n_centroids × dim) centroid matrix itself.
    Returns (assignments DataFrame (id, bucket), centroids ndarray).
    """
    import numpy as np

    # the pq_train rule: degenerate rows (NULL/empty/zero-norm) are excluded
    # from the whole build — ONE zero vector among the lowest-id seeds
    # normalizes to an all-NaN centroid row, np.argmax then returns that
    # poisoned column for EVERY vector, and the index collapses to a single
    # bucket with no error raised
    corpus = (corpus.where(F.col(vec_col).isNotNull()
                           & (F.size(vec_col) > 0))
              .withColumn("__nrm", _norm(F.col(vec_col)))
              .where(F.col("__nrm") > 0).drop("__nrm"))
    seed_pdf = (corpus.orderBy(id_col).limit(n_centroids)
                .select(vec_col).toPandas())
    if not len(seed_pdf):
        raise ValueError("ivf_build: no valid (non-null, nonzero-norm) "
                         "vectors to seed centroids from")
    centroids = np.stack(seed_pdf[vec_col].to_numpy()).astype("float64")
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext

    # every Lloyd iteration re-reads the corpus (assign + centroid update);
    # persist once for the loop so `iters` passes scan parquet exactly once
    corpus = corpus.persist()
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
        # centroid update: mean per bucket of the NORMALIZED members —
        # assignment scores unit vectors, so averaging RAW components
        # would let one large-magnitude member drag the centroid and make
        # Lloyd's two steps optimize different objectives (the pq_train
        # rule: normalize on both sides). Computed as per-Arrow-batch
        # float64 partial sums in ONE mapInPandas pass (assignment redone
        # inline — cheap numpy), reduced on the driver in (bucket, batch
        # min-id) sorted order: every float add happens in the same order
        # for a FIXED partition/Arrow-batch layout, so repeated runs on
        # the same data + config are bit-identical. Unlike the previous
        # DECIMAL(38,6) posexplode mean (exact, hence layout-invariant,
        # but ~1.5-2 s/update at sf0.1 via its join + n×dim shuffle) a
        # config change (cores, maxRecordsPerBatch, maxPartitionBytes)
        # MAY move a boundary assignment — acceptable because nothing
        # oracle-gated depends on assignments: ann_ivf_topk is rows-only
        # and ann_ivf_full_probe's output is assignment-invariant by
        # construction. Partials are K rows per Arrow batch — driver
        # state stays bounded at batches × K × dim.

        def partials(batches):
            import pandas as pd
            cm = bc.value
            for block in batches:
                vm = np.stack(block[vec_col].to_numpy()).astype("float64")
                vm /= np.linalg.norm(vm, axis=1, keepdims=True)
                bucket = np.argmax(vm @ cm.T, axis=1)
                pkey = int(block[id_col].min())
                rows = [(pkey, int(b), vm[bucket == b].sum(axis=0).tolist())
                        for b in np.unique(bucket)]
                yield pd.DataFrame(rows, columns=["pkey", "bucket", "vsum"])

        part_pdf = (corpus.select(id_col, vec_col)
                    .mapInPandas(partials,
                                 "pkey long, bucket int, "
                                 "vsum array<double>")
                    .toPandas())
        part_pdf = part_pdf.sort_values(["bucket", "pkey"])
        for b, grp in part_pdf.groupby("bucket", sort=True):
            v = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0)
            n = np.linalg.norm(v)
            if n > 0:
                centroids[int(b)] = v / n
    # materialize the index (it IS the product — at scale it would be
    # written to storage) so the corpus cache can be released
    assignments = assignments.persist()
    assignments.count()
    corpus.unpersist()
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
                                 F.col(vec_col).alias("qv"),
                                 _norm(F.col(vec_col)).alias("__qn")),
                  "query_id")
            .join(corpus.select(F.col(id_col).alias("cand_id"),
                                F.col(vec_col).alias("cv"),
                                _norm(F.col(vec_col)).alias("__cn")),
                  "cand_id"))
    scored = cand.select(
        "query_id", "cand_id",
        F.round(_cosine_pre(F.col("qv"), F.col("cv"),
                            F.col("__qn"), F.col("__cn")), 6)
        .alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "cand_id", "cos_sim"))


def hyperplane_projections(vec: Column, planes: list[list[float]]) -> Column:
    """All P hyperplane projections ⟨v, p_i⟩ as one array<double> column.

    Each projection is a flat primitive fold (transform with positional
    index into the plane literal, then aggregate) — measured faster than
    both the zip_with form and a column-major struct-accumulator single
    pass (interpreted struct allocation per element costs more than P
    separate primitive folds; see NOTES.md round-4 microbench). Per-plane
    accumulation order over positions is ascending j, so projection values
    are bit-identical to the historical zip_with form.
    """
    projs = []
    for p in planes:
        lit = F.array(*[F.lit(float(x)) for x in p])
        projs.append(F.aggregate(
            F.transform(vec, lambda x, j: x.cast("double")
                        * F.element_at(lit, j + 1)),
            F.lit(0.0), lambda acc, v: acc + v))
    return F.array(*projs)


def hyperplane_signature(vec: Column, planes: list[list[float]],
                         projections: Column | None = None) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of ⟨v, p⟩ per plane.

    Pass ``projections`` (from :func:`hyperplane_projections`, materialized
    via ``withColumn``) to derive the bucket from an already-computed
    projection column instead of re-folding the vector."""
    if projections is not None:
        out = F.lit(0).cast("long")
        for i in range(len(planes)):
            out = out + F.when(F.element_at(projections, i + 1) > 0,
                               F.lit(2 ** i)).otherwise(F.lit(0))
        return out
    out = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        proj = F.aggregate(
            F.transform(vec, lambda x, j: x.cast("double")
                        * F.element_at(lit, j + 1)),
            F.lit(0.0), lambda acc, v: acc + v)
        out = out + F.when(proj > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return out


def lsh_topk(corpus: DataFrame, queries: DataFrame, planes: list[list[float]],
             k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding",
             n_flips: int = 0, max_probes: int | None = None) -> DataFrame:
    """Approximate cosine top-k: probe the query's LSH bucket, plus — with
    ``n_flips`` ≥ 1 (multi-probe LSH, Lv et al. VLDB'07) — every bucket
    within Hamming distance ``n_flips`` of it.

    ``max_probes`` (query-adaptive probe ordering, Lv et al. §4): instead of
    the full Hamming ball, spend a fixed budget on single-bit flips of the
    planes whose projection magnitude |⟨q, p⟩| is SMALLEST for this query —
    the sides the hash was least sure about, hence the buckets most likely
    to hide true neighbours. Per query, probes = own bucket + flips of its
    ``max_probes`` most-uncertain planes (budget capped at len(planes)).
    With ``max_probes = len(planes)`` this equals exhaustive ``n_flips=1``.

    Recall < 1 by construction; differential tests measure it against
    brute_force_topk. The fan-out is query-side only (queries ≪ corpus): the
    corpus is still hashed and shuffled exactly once on the bucket id, so at
    100 TB the extra probes cost probe-count× more *query* rows, not corpus
    reads. A candidate lives in exactly one bucket, so probed buckets never
    produce duplicate (query, cand) pairs.
    """
    from itertools import combinations

    c = (corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
         .withColumn("bucket", hyperplane_signature(F.col("cv"), planes))
         .withColumn("__cn", _norm(F.col("cv"))))
    qbase = (queries.select(F.col(id_col).alias("query_id"),
                            F.col(vec_col).alias("qv"))
             .withColumn("bucket0", hyperplane_signature(F.col("qv"), planes))
             .withColumn("__qn", _norm(F.col("qv"))))
    if max_probes is not None:
        budget = min(max_probes, len(planes))
        # one projection array per query row; both the |proj| ranking and
        # bucket0 could share it, but bucket0 stays an independent fold —
        # Catalyst inlines withColumn refs (no interpreted-mode CSE), so
        # "sharing" a column would duplicate the array build per reference
        projs = F.transform(
            hyperplane_projections(F.col("qv"), planes),
            lambda p, i: F.struct(F.abs(p).alias("a"), i.alias("i")))
        pow2 = F.array(*[F.lit(2 ** i).cast("long") for i in range(len(planes))])
        flips = F.transform(
            F.slice(F.array_sort(projs), 1, budget),
            lambda s: F.col("bucket0").bitwiseXOR(
                F.element_at(pow2, s["i"].cast("int") + 1)))
        buckets = F.concat(F.array(F.col("bucket0").cast("long")), flips)
    else:
        masks = [0]
        for d in range(1, n_flips + 1):
            for bits in combinations(range(len(planes)), d):
                masks.append(sum(2 ** b for b in bits))
        buckets = F.array(*[F.col("bucket0").bitwiseXOR(F.lit(m))
                            for m in masks])
    q = qbase.select("query_id", "qv", "__qn",
                     F.explode(buckets).alias("bucket"))
    scored = (q.join(c, "bucket")
              .where(F.col("query_id") != F.col("cand_id"))
              .select("query_id", "cand_id",
                      F.round(_cosine_pre(F.col("qv"), F.col("cv"),
                                          F.col("__qn"), F.col("__cn")),
                              6).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "cand_id", "cos_sim"))


def centroid_outlier_scores(emb: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            label_col: str = "label",
                            bottom_k: int | None = None,
                            round_dp: int = 6) -> DataFrame:
    """Per-vector cosine to its class centroid — the SemDeDup-style pruning
    signal (Abbas et al. 2023: rank members of a cluster by similarity to
    the cluster centroid; prune the tail as semantic outliers / keep one
    representative of near-duplicate heads).

    Distributed shape: posexplode the vectors once, aggregate per
    (label, position) through DECIMAL(38,6) (exact, parallelism-proof — the
    centroid must not depend on partial-agg order), rebuild each centroid
    array, broadcast-join it back (n_labels arrays — tiny at any corpus
    size), then a map-only JVM fold scores every vector. One shuffle on
    (label, pos) partials + one on the optional per-label ranking window;
    no vector ever reaches the driver.

    With ``bottom_k`` set, returns only each label's k most-outlying
    vectors (rank ascending by cos, vec-id tiebreak) — the prune list.
    """
    # degenerate rows out up front (the _normalized_vecs rule): a NULL or
    # zero-norm embedding scores cos_centroid NULL, and ASC ordering is
    # NULLS FIRST — the junk row would take outlier_rank 1 and push a
    # GENUINE semantic outlier off the prune list
    emb = (emb.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
           .withColumn("__con", _norm(F.col(vec_col)))
           .where(F.col("__con") > 0).drop("__con"))
    pv = emb.select(label_col,
                    F.posexplode(F.col(vec_col)).alias("pos", "v"))
    from ..functions.numeric import DEC
    comp = (pv.groupBy(label_col, "pos")
            .agg((F.sum(F.col("v").cast("double").cast(DEC)).cast("double")
                  / F.count(F.lit(1))).alias("c")))
    cent = (comp.groupBy(label_col)
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"]).alias("centroid")))
    scored = (emb.join(F.broadcast(cent), label_col)
              .select(id_col, label_col,
                      F.round(cosine(F.col(vec_col), F.col("centroid")),
                              round_dp).alias("cos_centroid")))
    if bottom_k is None:
        return scored
    w = Window.partitionBy(label_col).orderBy(F.col("cos_centroid").asc(),
                                              F.col(id_col))
    return (scored.withColumn("outlier_rank", F.row_number().over(w))
            .where(F.col("outlier_rank") <= bottom_k))


def semdedup(emb: DataFrame, n_clusters: int = 8, tau: float = 0.7,
             id_col: str = "vec_id", vec_col: str = "embedding",
             round_dp: int = 6, method: str = "blas",
             iters: int = 0) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    space, find semantic-duplicate groups WITHIN each cluster (cosine ≥
    ``tau``), and keep exactly one representative per group — the member
    with the LOWEST similarity to its cluster centroid (the paper's
    keep-rule: retain the most "edge-of-cluster" exemplar; ties on id).

    Output, one row per input vector:
    (id, cluster, cos_centroid, component, keep) — ``component`` is the
    duplicate-group label (min member id; singletons label themselves),
    ``keep=false`` rows are the semantic duplicates to prune.

    Clustering with ``iters=0`` (default) is the deterministic
    seed-assignment round of ``ivf_build`` (centroid j = the j-th
    lowest-id vector, assignment = argmax cosine, ties to the lowest
    centroid id) — no Lloyd iterations, so the whole pipeline is
    closed-form and exactly mirrorable in SQL for the correctness oracle.
    ``iters>0`` (blas only) is the production form the paper runs: real
    k-means via ``ivf_build`` — better-balanced clusters and recall, same
    downstream algebra (rows-only; the keep-rule/blocking invariants are
    property-tested instead of oracle-matched).

    Scale shape (the reason SemDeDup works at 100 TB where all-pairs
    cannot): the cluster id is the blocking key. The only quadratic work
    is the within-cluster self-join — n·(cluster size) candidate rows, not
    n² — and every downstream step (components over intra-cluster edges,
    per-component argmin) shuffles on keys the pair join already
    partitioned. The seed frame is a broadcast (n_clusters rows); the
    assignment pass is one n×K scored fan-out with a map-side-combinable
    argmax agg, no corpus collect anywhere. Edges never cross clusters, so
    the star contraction converges per-cluster (small diameters, ~2
    rounds). Reference has no counterpart (pandas-era engine); this is a
    net-new LLM-pipeline operator per the build brief.

    ``method='blas'`` (default) runs both dense kernels through numpy:
    assignment is a map-only Arrow pass against the broadcast K×dim seed
    matrix (no n×K row fan-out, no argmax shuffle — the K=250 sweep
    showed the interpreted fan-out dominating at 5M fold rows), and the
    within-cluster pairs are one Arrow-batched applyInPandas per cluster
    — a tiled matmul over the cluster's member matrix, exactly the
    paper's kernel. The Python crossings are justified statefully: the
    pair stage needs the whole cluster co-located by construction (that
    is WHAT clustering is for in SemDeDup), and dense similarity blocks
    are BLAS primitives the interpreted per-pair HOF fold loses to by
    ~8x (sf0.1, 2k vectors, K=8: 32s expr vs 4s blas; same
    interpreted-HOF lesson as est_jaccard in operators/dedup.py).
    np.argmax ties resolve to the FIRST max and the seed ids ascend, so
    tie-breaks match the expr path bit-for-bit. ``method='expr'`` keeps
    the all-JVM Column-expression pipeline — differentially tested equal.
    """
    from .dedup import connected_components_star

    # rows without a valid embedding can be neither clustered nor
    # deduplicated — excluded up front so both methods (and the kernels'
    # np.stack) see the same well-formed input
    emb = emb.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
    vecs = _normalized_vecs(emb, id_col, vec_col)
    if iters > 0 and method != "blas":
        raise ValueError("iters>0 (Lloyd k-means clustering) requires "
                         "method='blas'")
    if method == "blas":
        import numpy as np
        import pandas as pd

        if iters > 0:
            # production form: real k-means clusters + per-member centroid
            # scoring, shared with (and eagerly materialized by)
            # semdedup_index — ivf_build's own final-round assignments are
            # reused and unpersisted there
            member, cents = semdedup_index(emb, n_clusters, iters,
                                           id_col, vec_col, round_dp)
            if cents.size == 0:
                return emb.sparkSession.createDataFrame(
                    [], "id long, cluster long, cos_centroid double, "
                        "component long, keep boolean")
            assigned = member.select("id", "cluster", "cos_centroid")
        else:
            # seed matrix to the driver: K×dim doubles — same bounded
            # collect as ivf_build's centroid state, tiny at any corpus
            seed_pdf = vecs.orderBy("id").limit(n_clusters).toPandas()
            if not len(seed_pdf):
                return emb.sparkSession.createDataFrame(
                    [], "id long, cluster long, cos_centroid double, "
                        "component long, keep boolean")
            cids = seed_pdf["id"].to_numpy()      # ascending by construction
            smat = np.stack(seed_pdf["nv"].to_numpy()).astype("float64")
            bc = emb.sparkSession.sparkContext.broadcast((cids, smat))

            def assign(batches):
                # map-only n×K argmax against the broadcast seed matrix —
                # no fan-out rows, no shuffle; np.argmax returns the FIRST
                # max, and cids ascend, so ties go to the lowest centroid
                # id exactly like the expr path's max(struct(cos, -cid))
                ids_c, sm = bc.value
                for pdf in batches:
                    if not len(pdf):
                        continue
                    m = np.stack(pdf["nv"].to_numpy()).astype("float64")
                    sims = _np_round_half_up(m @ sm.T, round_dp)
                    j = np.argmax(sims, axis=1)
                    yield pd.DataFrame({
                        "id": pdf["id"].to_numpy(),
                        "cluster": ids_c[j],
                        "cos_centroid": sims[np.arange(len(j)), j],
                        "nv": pdf["nv"]})

            # one lazy materialization: member feeds the pair kernel
            # (executed eagerly inside the components fixpoint) AND the
            # final labeled join — without truncation the dense assignment
            # pass runs twice (the minhash_clusters multi-consumer lesson)
            member = vecs.mapInPandas(
                assign, "id long, cluster long, cos_centroid double, "
                        "nv array<double>").localCheckpoint(eager=False)
            assigned = member.select("id", "cluster", "cos_centroid")

        def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
            ids = pdf["id"].to_numpy()
            m = np.stack(pdf["nv"].to_numpy()).astype("float64")
            out_a, out_b = [], []
            # tile the c×c block: bounded memory even for a hot cluster
            tile = 2048
            for lo in range(0, len(ids), tile):
                sims = _np_round_half_up(m[lo:lo + tile] @ m.T, round_dp)
                ra, rb = np.nonzero(sims >= tau)
                ra += lo
                keep = ids[ra] < ids[rb]
                out_a.append(ids[ra][keep])
                out_b.append(ids[rb][keep])
            return pd.DataFrame({"id_a": np.concatenate(out_a),
                                 "id_b": np.concatenate(out_b)})

        pairs = (member.select("cluster", "id", "nv")
                 .groupBy("cluster")
                 .applyInPandas(cluster_pairs, "id_a long, id_b long"))
    else:
        seeds = (vecs.orderBy("id").limit(n_clusters)
                 .select(F.col("id").alias("cid"), F.col("nv").alias("sv")))
        # assignment: argmax over rounded cos via one max(struct) agg —
        # map-side partials, one shuffle on id; rounding keeps
        # cross-engine float noise out of the argmax boundary
        scored = (vecs.join(F.broadcast(seeds))
                  .select("id", "nv", "cid",
                          F.round(_dot(F.col("nv"), F.col("sv")),
                                  round_dp).alias("cos_c")))
        assigned = (scored.groupBy("id")
                    .agg(F.max(F.struct(F.col("cos_c"),
                                        (-F.col("cid")).alias("nc")))
                         .alias("m"))
                    .select("id", F.col("m.cos_c").alias("cos_centroid"),
                            (-F.col("m.nc")).alias("cluster")))
        # same multi-consumer truncation as the blas path
        member = assigned.join(vecs, "id").localCheckpoint(eager=False)
        assigned = member.select("id", "cluster", "cos_centroid")
        a = member.select(F.col("cluster").alias("cl"),
                          F.col("id").alias("ia"), F.col("nv").alias("va"))
        b = member.select(F.col("cluster").alias("cl"),
                          F.col("id").alias("ib"), F.col("nv").alias("vb"))
        pairs = (a.join(b, "cl")
                 .where(F.col("ia") < F.col("ib"))
                 .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"),
                         F.round(_dot(F.col("va"), F.col("vb")),
                                 round_dp).alias("cos"))
                 .where(F.col("cos") >= tau)
                 .select("id_a", "id_b"))
    comp = connected_components_star(pairs)
    labeled = (assigned.join(comp.withColumnRenamed("node", "id"),
                             "id", "left")
               .withColumn("component",
                           F.coalesce("component", F.col("id"))))
    wrep = Window.partitionBy("component")
    rep = F.min(F.struct(F.col("cos_centroid"), F.col("id"))).over(wrep)
    return (labeled.withColumn("rep", rep)
            .withColumn("keep", F.col("id") == F.col("rep.id"))
            .select("id", "cluster", "cos_centroid", "component", "keep"))


def semdedup_index(emb: DataFrame, n_clusters: int = 8, iters: int = 0,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   round_dp: int = 6):
    """The persistable SemDeDup cluster index: ``(member, centroids)``.

    ``member`` is (id, cluster, cos_centroid, nv) — at production scale
    this table is written out bucketed by ``cluster`` (exactly like the
    banded minhash index) so daily increments probe it co-located;
    ``centroids`` is the K×dim float64 matrix that rides along as the
    index's tiny dense state. Cluster labels are centroid INDICES
    (0..K-1): ``iters=0`` normalizes the K lowest-id vectors as fixed
    centroids, ``iters>0`` runs Lloyd via ``ivf_build``.
    """
    import numpy as np
    import pandas as pd

    emb = emb.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
    vecs = _normalized_vecs(emb, id_col, vec_col)
    seed_pdf = vecs.orderBy("id").limit(n_clusters).toPandas()
    if not len(seed_pdf):
        # empty corpus: an empty index, not an np.stack crash — the
        # realistic bootstrap state of the incremental pipeline
        return (emb.sparkSession.createDataFrame(
                    [], "id long, cluster long, cos_centroid double, "
                        "nv array<double>"),
                np.zeros((0, 0)))
    if iters > 0:
        # reuse ivf_build's final-round assignments (it eagerly
        # materializes them — recomputing via argmax would both double
        # the dominant pass and risk tie-disagreement with Lloyd's own
        # round) and score each member against ITS centroid
        assignments, centroids = ivf_build(emb, n_clusters, iters,
                                           id_col, vec_col)
        bcc = emb.sparkSession.sparkContext.broadcast(centroids)

        def score(batches):
            cm = bcc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf["nv"].to_numpy()).astype("float64")
                b = pdf["bucket"].to_numpy()
                cos = _np_round_half_up(
                    np.einsum("ij,ij->i", m, cm[b]), round_dp)
                yield pd.DataFrame({"id": pdf["id"].to_numpy(),
                                    "cluster": b.astype("int64"),
                                    "cos_centroid": cos,
                                    "nv": pdf["nv"]})

        member = (vecs.join(assignments.select(
                      F.col(id_col).alias("id"), "bucket"), "id")
                  .mapInPandas(score,
                               "id long, cluster long, "
                               "cos_centroid double, nv array<double>")
                  .localCheckpoint(eager=True))
        assignments.unpersist()   # ivf_build persisted them for its loop
    else:
        centroids = np.stack(seed_pdf["nv"].to_numpy()).astype("float64")
        member = _assign_to_centroids(vecs, centroids, round_dp)
    return member, centroids


def _assign_to_centroids(vecs: DataFrame, centroids, round_dp: int
                         ) -> DataFrame:
    """Map-only Arrow argmax of (id, nv) rows against a broadcast centroid
    matrix → (id, cluster, cos_centroid, nv); cluster = centroid index
    (ties to the lowest, np.argmax first-max)."""
    import numpy as np
    import pandas as pd

    bc = vecs.sparkSession.sparkContext.broadcast(centroids)

    def assign(batches):
        cm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["nv"].to_numpy()).astype("float64")
            sims = _np_round_half_up(m @ cm.T, round_dp)
            j = np.argmax(sims, axis=1)
            yield pd.DataFrame({
                "id": pdf["id"].to_numpy(),
                "cluster": j.astype("int64"),
                "cos_centroid": sims[np.arange(len(j)), j],
                "nv": pdf["nv"]})

    return vecs.mapInPandas(
        assign, "id long, cluster long, cos_centroid double, "
                "nv array<double>")


def incremental_semdedup_pairs(new_emb: DataFrame, member: DataFrame,
                               centroids, tau: float = 0.7,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               round_dp: int = 6) -> DataFrame:
    """Daily-increment SemDeDup: semantic-dup pairs of NEW vectors against
    a persisted cluster index — old-vs-old is never recomputed (the same
    production contract as ``incremental_minhash_pairs``).

    New vectors assign to the EXISTING centroids (broadcast-matrix argmax
    map — the index's clustering must not drift under increments), then
    one per-cluster COGROUP joins (old members, new arrivals): each task
    BLAS-scores new×old plus the new×new upper triangle and emits pairs
    with cos ≥ ``tau``. Shuffle volume is the increment plus the touched
    clusters' members — co-located when ``member`` is read from a
    cluster-bucketed table. Output: (id_a, id_b, cos), ≥1 side new.
    """
    new_vecs = _normalized_vecs(new_emb, id_col, vec_col)
    if getattr(centroids, "size", 0) == 0:
        # empty index (bootstrap against an empty old corpus): no pairs
        return new_emb.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cos double")
    new_m = _assign_to_centroids(new_vecs, centroids, round_dp)
    return _incremental_pairs_from_members(member, new_m, tau, round_dp)


def _incremental_pairs_from_members(member: DataFrame, new_m: DataFrame,
                                    tau: float, round_dp: int) -> DataFrame:
    """Per-cluster cogroup probe over already-assigned member frames —
    shared by the batch and streaming incremental SemDeDup forms.

    CAUTION: ``member`` and ``new_m`` must NOT share a query lineage
    (e.g. ``member = new_m.limit(0)``): Spark's conflicting-attribute
    dedup for a self-cogroup can rewrite the right child's projection to
    the grouping key alone, and the kernel then receives frames missing
    ``id``/``nv``. Build empty/bootstrap member frames independently
    (``spark.createDataFrame([], schema)``)."""
    import numpy as np
    import pandas as pd

    def pairs(old_pdf: pd.DataFrame, new_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})
        if not len(new_pdf):
            return empty
        nids = new_pdf["id"].to_numpy()
        nm = np.stack(new_pdf["nv"].to_numpy()).astype("float64")
        out = [empty]
        if len(old_pdf):
            oids = old_pdf["id"].to_numpy()
            om = np.stack(old_pdf["nv"].to_numpy()).astype("float64")
            tile = 2048
            for lo in range(0, len(nids), tile):
                sims = _np_round_half_up(nm[lo:lo + tile] @ om.T, round_dp)
                ra, rb = np.nonzero(sims >= tau)
                out.append(pd.DataFrame({
                    "id_a": nids[lo + ra], "id_b": oids[rb],
                    "cos": sims[ra, rb]}))
        tile = 2048
        for lo in range(0, len(nids), tile):
            sims = _np_round_half_up(nm[lo:lo + tile] @ nm.T, round_dp)
            ra, rb = np.nonzero(sims >= tau)
            ra += lo
            keep = nids[ra] < nids[rb]
            out.append(pd.DataFrame({"id_a": nids[ra][keep],
                                     "id_b": nids[rb][keep],
                                     "cos": sims[ra - lo, rb][keep]}))
        return pd.concat(out, ignore_index=True)

    return (member.select("cluster", "id", "nv").groupBy("cluster")
            .cogroup(new_m.select("cluster", "id", "nv").groupBy("cluster"))
            .applyInPandas(lambda l, r: pairs(l, r),
                           "id_a long, id_b long, cos double"))


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid — TPAMI 2011)
# ---------------------------------------------------------------------------

def pq_train(corpus: DataFrame, m_sub: int = 8, k_codes: int = 16,
             iters: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding"):
    """Train product-quantization codebooks: the D-dim space splits into
    ``m_sub`` contiguous subspaces, each learning its own ``k_codes``-
    centroid k-means (Jégou et al. §II). The full quantizer has
    k_codes^m_sub implicit cells for m_sub·k_codes·(D/m_sub) stored floats
    — at 100 TB this is THE memory lever: a 64-dim float32 vector (256 B)
    compresses to m_sub bytes of codes, so a trillion-vector index fits a
    cluster's RAM where raw vectors cannot.

    Distribution discipline mirrors ivf_build: deterministic seeding
    (lowest ids' subvectors), assignment via one mapInPandas per iteration
    against the broadcast codebook (all subspaces in one pass), centroid
    update via per-(sub, code, dim) means collected to the driver — the
    codebook (m·k·d_sub doubles) is the only driver-side state. Vectors
    are L2-normalized before splitting — in BOTH the assignment
    (pq_encode) and the centroid update (the Column-side x/‖v‖ below;
    zero-norm rows are excluded from the update, mirroring ivf_build's
    n > 0 guard) — so inner products of reconstructions approximate
    cosine and Lloyd's non-increasing-error property holds on non-unit
    corpora too. Empty clusters keep their previous centroid. Exactly
    ONE Spark action runs before the Lloyd loop: the seed fetch, which
    also materializes the persisted corpus and supplies the dimensionality
    (no separate first() probe). Returns ndarray (m_sub, k_codes,
    D/m_sub); raises ValueError on an empty corpus or one with fewer than
    ``k_codes`` rows (a silently-short codebook would break the declared
    shape contract).
    """
    import numpy as np

    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    # row L2 norm as a Column: seeds, the update, and pq_encode must all
    # work in the same normalized space
    nrm = F.sqrt(F.aggregate(
        vec_col, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))
    corpus = corpus.select(id_col, vec_col).persist()
    try:
        # the one pre-loop action: TakeOrdered over every partition
        # populates the cache AND yields seeds + dim in the same job.
        # Zero-norm rows cannot seed (they would normalize to NaN and
        # poison every centroid) — the filter keeps seeding deterministic:
        # the k_codes lowest-id rows with a usable direction.
        seed_pdf = (corpus.where(nrm > 0).orderBy(id_col).limit(k_codes)
                    .select(vec_col).toPandas())
        if len(seed_pdf) < k_codes:
            raise ValueError(
                f"pq_train needs >= k_codes ({k_codes}) nonzero rows, got "
                f"{len(seed_pdf)} (empty, undersized, or all-zero corpus)")
        seeds = np.stack(seed_pdf[vec_col].to_numpy()).astype("float64")
        dim = seeds.shape[1]
        if dim % m_sub != 0:
            raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
        d_sub = dim // m_sub
        seeds /= np.linalg.norm(seeds, axis=1, keepdims=True)
        # subspace m seeds from the same lowest-id vectors' m-th slice
        codebook = np.stack([seeds[:, m * d_sub:(m + 1) * d_sub]
                             for m in range(m_sub)])  # (m, k, d_sub)
        for _ in range(iters):
            codes = pq_encode(corpus, codebook, id_col, vec_col)
            exploded = (corpus.join(codes, id_col)
                        .withColumn("_nrm", nrm)
                        .where(F.col("_nrm") > 0)
                        .select(F.posexplode(vec_col).alias("pos", "x"),
                                F.col("codes"), F.col("_nrm"))
                        .select((F.col("pos") / d_sub).cast("int")
                                .alias("sub"),
                                F.pmod("pos", F.lit(d_sub)).alias("p"),
                                F.element_at(
                                    "codes",
                                    (F.col("pos") / d_sub).cast("int") + 1)
                                .alias("code"),
                                (F.col("x") / F.col("_nrm")).alias("x")))
            means = (exploded.groupBy("sub", "code", "p")
                     .agg(F.avg("x").alias("m")).toPandas())
            nxt = codebook.copy()
            for _, r in means.iterrows():
                nxt[int(r["sub"]), int(r["code"]), int(r["p"])] = r["m"]
            codebook = nxt
    finally:
        corpus.unpersist()
    return codebook


def pq_encode(corpus: DataFrame, codebook, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode every vector to its per-subspace nearest-centroid codes:
    one Arrow-batched pass against the broadcast codebook, all subspaces
    scored in one (n, m, k) einsum per block. Returns (id, codes
    array<int> length m_sub); ties in the argmin break to the lowest code
    (np.argmax semantics), deterministic. A zero-norm vector has no
    direction to normalize — it encodes as the zero point (its norm is
    clamped away from zero), deterministically taking each subspace's
    smallest-norm centroid instead of propagating NaN through the
    distance matrix."""
    import numpy as np

    m_sub, k_codes, d_sub = codebook.shape
    bc = corpus.sparkSession.sparkContext.broadcast(np.asarray(codebook))

    def enc(batches):
        import pandas as pd
        cb = bc.value  # (m, k, d)
        for block in batches:
            vm = np.stack(block[vec_col].to_numpy()).astype("float64")
            norms = np.linalg.norm(vm, axis=1, keepdims=True)
            np.maximum(norms, np.finfo("float64").tiny, out=norms)
            vm /= norms
            sub = vm.reshape(len(vm), m_sub, d_sub)
            # squared L2 to each centroid: argmin per (row, sub)
            d2 = (np.einsum("nmd,nmd->nm", sub, sub)[:, :, None]
                  - 2 * np.einsum("nmd,mkd->nmk", sub, cb)
                  + np.einsum("mkd,mkd->mk", cb, cb)[None, :, :])
            codes = np.argmin(d2, axis=2).astype("int32")
            yield pd.DataFrame({id_col: block[id_col],
                                "codes": list(codes)})

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, f"{id_col} long, codes array<int>")


def pq_topk(codes_df: DataFrame, queries: DataFrame, codebook,
            k: int = 5, id_col: str = "vec_id",
            vec_col: str = "embedding", round_dp: int = 6) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: each query builds an (m_sub ×
    k_codes) lookup table of subspace inner products against the codebook
    (Jégou §IV.A — the query stays UNQUANTIZED); a corpus vector's score
    is then m_sub table lookups summed, never a D-dim product. One
    Arrow-batched pass over the CODES (m bytes/vector of state), queries
    broadcast. Returns (query_id, rank, cand_id, adc_sim) — rank total
    via (score desc, cand_id); self-matches excluded."""
    import numpy as np

    m_sub, k_codes, d_sub = codebook.shape
    qpdf = queries.select(id_col, vec_col).toPandas()
    q_ids = qpdf[id_col].to_numpy()
    qm = np.stack(qpdf[vec_col].to_numpy()).astype("float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    # luts[q, m, c] = q_sub[m] · codebook[m, c]
    luts = np.einsum("qmd,mkd->qmk",
                     qm.reshape(len(qm), m_sub, d_sub), codebook)
    bc = codes_df.sparkSession.sparkContext.broadcast((q_ids, luts))
    margin = 10.0 ** (-round_dp)

    def score(batches):
        import pandas as pd
        ids_q, lt = bc.value
        ar = np.arange(m_sub)
        for block in batches:
            c_ids = block[id_col].to_numpy()
            cm = np.stack(block["codes"].to_numpy()).astype("int64")
            # sims[q, n] = sum_m lt[q, m, cm[n, m]]
            sims = lt[:, ar, cm].sum(axis=2)  # (q, n)
            np.place(sims, ids_q[:, None] == c_ids[None, :], -np.inf)
            kk = min(k, sims.shape[1])
            thr = np.partition(sims, -kk, axis=1)[:, -kk]
            # isfinite: with < k candidates in a block thr collapses to the
            # -inf self cell, which would pass >= thr and leak the (q, q,
            # -inf) row the docstring's "self-matches excluded" forbids
            keep = np.argwhere((sims >= (thr - margin)[:, None])
                               & np.isfinite(sims))
            yield pd.DataFrame({
                "query_id": ids_q[keep[:, 0]],
                "cand_id": c_ids[keep[:, 1]],
                "adc_sim": _np_round_half_up(
                    sims[keep[:, 0], keep[:, 1]], round_dp)})

    scored = codes_df.select(id_col, "codes").mapInPandas(
        score, "query_id long, cand_id long, adc_sim double")
    w = Window.partitionBy("query_id").orderBy(F.col("adc_sim").desc(),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "cand_id", "adc_sim"))


def pq_topk_rerank(codes_df: DataFrame, corpus: DataFrame,
                   queries: DataFrame, codebook, k: int = 5,
                   shortlist: int = 50, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   round_dp: int = 6) -> DataFrame:
    """ADC + exact re-ranking (Jégou §IV's IVFADC+R refinement): the PQ
    lookup scan produces a ``shortlist`` of candidates per query, whose
    FULL vectors are then fetched (a semi-join touching shortlist·|Q|
    corpus rows, never n) and rescored with exact cosine; top-k of the
    rescore. Compressed codes do the heavy scan, raw vectors only the
    tail — recall on the sf0.001 corpus: ADC alone 0.36, +rerank@50 0.68
    (pinned as a floor by test). Returns (query_id, rank, cand_id,
    cos_sim).

    ``shortlist >= |corpus|`` degenerates to exact brute force: the ADC
    scan keeps every candidate — the -inf self row included, which is why
    the exact stage below re-excludes self. At normal shortlists the
    -inf self row never survives the ADC cut, but the full-shortlist
    identity is the exact-oracle evidence path for the PQ family
    (ann_pq_rerank), and a self match rescoring to cosine 1.0 must not
    win rank 1 there or anywhere."""
    if shortlist < k:
        raise ValueError(f"shortlist {shortlist} must be >= k {k}")
    cands = (pq_topk(codes_df, queries, codebook, k=shortlist,
                     id_col=id_col, vec_col=vec_col, round_dp=round_dp)
             .select("query_id", F.col("cand_id").alias(id_col)))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("__qv"),
                        _norm(F.col(vec_col)).alias("__qn"))
    exact = (cands.join(corpus.select(id_col, vec_col,
                                      _norm(F.col(vec_col)).alias("__cn")),
                        id_col)
             .join(F.broadcast(qv), "query_id")
             .where(F.col("query_id") != F.col(id_col))
             .select("query_id", F.col(id_col).alias("cand_id"),
                     F.round(_cosine_pre(F.col("__qv"), F.col(vec_col),
                                         F.col("__qn"), F.col("__cn")),
                             round_dp).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("cand_id"))
    return (exact.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "cand_id", "cos_sim"))
