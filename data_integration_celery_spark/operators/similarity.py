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
                     round_dp: int | None = 6) -> DataFrame:
    """Exact cosine top-k per query vector.

    Output: (query_id, rank, cand_id, cos_sim). Ties broken on cand_id so the
    ranking is total. ``round_dp`` rounds the similarity before ranking —
    keeps cross-engine float noise out of rank boundaries.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    sim = cosine(F.col("qv"), F.col("cv"))
    if round_dp is not None:
        sim = F.round(sim, round_dp)
    scored = (F.broadcast(q).crossJoin(c)
              .where(F.col("query_id") != F.col("cand_id"))
              .select("query_id", "cand_id", sim.alias("cos_sim")))
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
             k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k: probe only the query's LSH bucket.

    Recall < 1 by construction; differential tests measure it against
    brute_force_topk. Bucket join shuffles each side once on the bucket id.
    """
    c = (corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
         .withColumn("bucket", hyperplane_signature(F.col("cv"), planes)))
    q = (queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
         .withColumn("bucket", hyperplane_signature(F.col("qv"), planes)))
    scored = (q.join(c, "bucket")
              .where(F.col("query_id") != F.col("cand_id"))
              .select("query_id", "cand_id",
                      F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "cand_id", "cos_sim"))
