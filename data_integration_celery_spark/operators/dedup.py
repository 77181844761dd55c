"""Deduplication operators — exact and near-dup — for the documents corpus.

Scale design notes (the point of each variant):
- exact: one shuffle on the fingerprint; keep min(doc_id) per group.
- minhash+LSH: shingles → k hash-mins → band buckets → candidate pairs join.
  Candidate generation is a self-join on (band, bucket) — only colliding
  bands shuffle together, never the full N² cross join.
- simhash: 64-bit weighted-bit signature; near-dup = small Hamming distance
  within blocking buckets (here: identical signature or banded prefix).
- n-gram Jaccard: exact verification on candidate pairs (or a bounded sample).

All hashing uses Spark's xxhash64/crc32 — deterministic across runs, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalized


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per identical normalized text (hash-groupBy)."""
    return (docs
            .withColumn("__fp", F.md5(normalized(F.col(text_col))))
            .groupBy("__fp")
            .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
            .drop("__fp"))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array of the normalized text."""
    toks = F.split(normalized(text), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))),
    ).otherwise(F.array(normalized(text)))


def minhash_signature(sh: Column, num_hashes: int = 32) -> Column:
    """k independent min-hashes of the shingle set (seeded xxhash64)."""
    return F.array(*[
        F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ])


def minhash_lsh_candidates(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 32,
                           bands: int = 8) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the minhash signature.

    rows_per_band = num_hashes/bands; a band's bucket key is the hash of its
    signature slice. Self-join per (band, bucket) → (id_a < id_b) pairs with
    the estimated Jaccard (fraction of matching minhashes).
    """
    r = num_hashes // bands
    # materialise the shingle array once — inlining it into the signature
    # expression would re-evaluate normalize/split/slice per hash function
    sig = (docs.select(id_col, shingles(F.col(text_col)).alias("__sh"))
               .select(id_col, minhash_signature(F.col("__sh"), num_hashes).alias("sig")))
    banded = sig.select(
        id_col, "sig",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(F.concat_ws(",", *[
                         F.element_at("sig", b * r + i + 1).cast("string")
                         for i in range(r)])).alias("bucket"))
            for b in range(bands)])).alias("bb"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (a.join(b, (F.col("a.bb") == F.col("b.bb"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
             .dropDuplicates(["id_a", "id_b"]))
    return pairs.withColumn("est_jaccard",
                            F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                                       lambda x, y: (x == y).cast("int")),
                                            lambda v: v == 1))
                            / F.size("sig_a")).drop("sig_a", "sig_b")


def simhash(text: Column, bits: int = 64) -> Column:
    """SimHash of the token set: per-bit majority vote of token hashes.

    JVM-side formulation: for each bit position, sum ±1 over tokens according
    to that bit of xxhash64(token); sign → bit. 16 bits kept (cost/benefit on
    a codegen'd expression ladder) — enough for blocking.
    """
    toks = F.array_distinct(F.split(normalized(text), " "))
    out = F.lit(0).cast("long")
    for i in range(16):
        vote = F.aggregate(
            toks, F.lit(0),
            lambda acc, t: acc + F.when(
                F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1,
                F.lit(1)).otherwise(F.lit(-1)))
        out = out + F.when(vote > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return out


def simhash_dedup(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Group docs by identical simhash (near-dup blocking) → representative id."""
    return (docs.withColumn("simhash", simhash(F.col(text_col)))
            .groupBy("simhash")
            .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_members")))


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.0,
                        block_col: str | None = None) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (blocked to avoid N²).

    ``block_col`` bounds the self-join (e.g. 'source' or an LSH bucket); the
    verification itself is array_intersect/array_union — JVM-side.
    """
    sh = docs.select(id_col,
                     *( [block_col] if block_col else [] ),
                     shingles(F.col(text_col), n).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
    union = (F.size("a.sh") + F.size("b.sh")).cast("double") - F.size(F.array_intersect("a.sh", "b.sh"))
    return (a.join(b, cond)
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    (inter / union).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))
