"""Deterministic hash sampling: exhaustive/disjoint splits, stability under
re-partitioning (the property df.sample/randomSplit lack), per-stratum rates."""

import pytest
from pyspark.sql import functions as F

from data_integration_celery_spark.operators import sampling


def test_hash_split_exhaustive_disjoint_deterministic(spark):
    ids = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = sampling.hash_split(ids, "doc_id",
                              {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"]
              for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # exhaustive + disjoint: every row assigned exactly once
    assert sum(counts.values()) == 10_000
    # uniform hash → fractions within a few percent at n=10k
    assert abs(counts["train"] - 8000) < 300
    assert abs(counts["val"] - 1000) < 150
    assert abs(counts["test"] - 1000) < 150
    # deterministic: re-running yields the identical assignment
    again = sampling.hash_split(ids, "doc_id",
                                {"train": 0.8, "val": 0.1, "test": 0.1})
    assert (out.join(again.withColumnRenamed("split", "s2"), "doc_id")
            .where(F.col("split") != F.col("s2")).count()) == 0


def test_hash_sample_stable_under_repartition_and_growth(spark):
    """The two failure modes of df.sample: partitioning changes and corpus
    growth must never change an existing row's fate."""
    ids = spark.range(5_000).withColumnRenamed("id", "doc_id")
    kept1 = {r["doc_id"] for r in
             sampling.hash_sample(ids, "doc_id", 0.2).collect()}
    kept2 = {r["doc_id"] for r in
             sampling.hash_sample(ids.repartition(13), "doc_id", 0.2).collect()}
    assert kept1 == kept2
    grown = spark.range(8_000).withColumnRenamed("id", "doc_id")
    kept3 = {r["doc_id"] for r in
             sampling.hash_sample(grown, "doc_id", 0.2).collect()}
    assert {i for i in kept3 if i < 5_000} == kept1
    assert abs(len(kept1) - 1000) < 150


def test_hash_sample_salt_decorrelates(spark):
    ids = spark.range(5_000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in
         sampling.hash_sample(ids, "doc_id", 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in
         sampling.hash_sample(ids, "doc_id", 0.5, salt="b").collect()}
    overlap = len(a & b) / max(len(a), 1)
    assert 0.35 < overlap < 0.65  # independent 50% samples overlap ~50%


def test_stratified_hash_sample(spark):
    rows = spark.range(12_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"))
    out = sampling.stratified_hash_sample(
        rows, "doc_id", "lang", {"en": 0.5, "de": 0.05})
    counts = {r["lang"]: r["n"]
              for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] - 2000) < 250       # 4000 en rows * 0.5
    assert abs(counts.get("de", 0) - 400) < 150  # 8000 de rows * 0.05
    # default fraction 0 drops unlisted strata entirely
    none = sampling.stratified_hash_sample(rows, "doc_id", "lang", {"en": 0.5})
    assert none.where(F.col("lang") == "de").count() == 0


def test_hash_split_validates_weights(spark):
    ids = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.hash_split(ids, "doc_id", {"a": 0.5, "b": 0.4})


def test_full_fraction_keeps_everything(spark):
    ids = spark.range(1_000).withColumnRenamed("id", "doc_id")
    assert sampling.hash_sample(ids, "doc_id", 1.0).count() == 1_000
    assert sampling.hash_sample(ids, "doc_id", 0.0).count() == 0


def test_mixture_fractions_math():
    counts = {"en": 1000, "zh": 300, "de": 100, "fr": 50}
    fr = sampling.mixture_fractions(counts, {"en": 0.5, "zh": 0.3, "de": 0.2})
    # T = min(1000/.5, 300/.3, 100/.2) = min(2000, 1000, 500) = 500
    assert fr["de"] == 1.0                    # the binding stratum keeps all
    assert abs(fr["en"] - 0.25) < 1e-6        # 0.5*500/1000
    assert abs(fr["zh"] - 0.5) < 1e-6         # 0.3*500/300
    assert "fr" not in fr                     # unlisted strata excluded
    with pytest.raises(ValueError):
        sampling.mixture_fractions({"en": 10}, {"zh": 1.0})


def test_resample_to_mixture_hits_target_shares(spark):
    rows = ([(i, "en") for i in range(8_000)]
            + [(i + 8_000, "zh") for i in range(1_500)]
            + [(i + 9_500, "de") for i in range(500)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.resample_to_mixture(df, "doc_id", "lang",
                                       {"en": 0.5, "zh": 0.3, "de": 0.2})
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # T = min(8000/.5, 1500/.3, 500/.2) = 2500 → en 1250, zh 750, de 500
    assert got["de"] == 500                   # binding stratum kept whole
    assert abs(got["en"] - 1250) < 120        # hash-threshold tolerance
    assert abs(got["zh"] - 750) < 100
    # determinism: same rows on re-run
    again = sampling.resample_to_mixture(df, "doc_id", "lang",
                                         {"en": 0.5, "zh": 0.3, "de": 0.2})
    assert again.count() == out.count()
    assert again.exceptAll(out).count() == 0


def test_cap_per_group_equals_single_window(spark):
    # skewed: group 'hot' has 5000 rows, others 3 each
    rows = ([(i, "hot", i % 997) for i in range(5_000)]
            + [(10_000 + g * 10 + j, f"g{g}", j)
               for g in range(50) for j in range(3)])
    df = spark.createDataFrame(rows, "doc_id long, grp string, score long")
    order = [F.col("score").desc(), F.col("doc_id")]
    got = sampling.cap_per_group(df, "grp", 4, order, tiebreaks=["doc_id"],
                                 n_salts=8)
    from pyspark.sql import Window
    w = Window.partitionBy("grp").orderBy(*order)
    ref = (df.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") <= 4))
    assert got.count() == ref.count()
    assert got.select("doc_id", "grp", "score", "rn") \
              .exceptAll(ref.select("doc_id", "grp", "score", "rn")) \
              .count() == 0
    # no group ever exceeds the cap
    mx = got.groupBy("grp").agg(F.count("*").alias("n")) \
            .agg(F.max("n").alias("m")).collect()[0]["m"]
    assert mx <= 4


def test_select_token_budget_equals_global_window(spark):
    import random
    rnd = random.Random(7)
    rows = [(i, rnd.randrange(1, 200)) for i in range(4_000)]
    df = (spark.createDataFrame(rows, "doc_id long, tok long")
          .withColumn("neg", -F.col("tok")))
    got = sampling.select_token_budget(df, "tok", "neg",
                                       tiebreaks=["doc_id"],
                                       budget=50_000, n_buckets=16)
    from pyspark.sql import Window
    w = (Window.orderBy("neg", "doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    ref = (df.withColumn("cum_tokens", F.sum("tok").over(w))
             .where(F.col("cum_tokens") <= 50_000))
    assert got.count() == ref.count() > 0
    assert got.select("doc_id", "cum_tokens") \
              .exceptAll(ref.select("doc_id", "cum_tokens")).count() == 0
    # degenerate bucketing (n_buckets=1) must agree too
    one = sampling.select_token_budget(df, "tok", "neg",
                                       tiebreaks=["doc_id"],
                                       budget=50_000, n_buckets=1)
    assert one.select("doc_id", "cum_tokens") \
              .exceptAll(ref.select("doc_id", "cum_tokens")).count() == 0


def test_vocab_topk_matches_counter(spark):
    from collections import Counter

    from data_integration_celery_spark.operators import text as T

    rows = [(1, "The cat and the Cat sat"), (2, "cat! dog; the-dog"),
            (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["token"], r["n"]) for r in T.vocab_topk(df, k=3).collect()]
    c = Counter()
    for _, t in rows:
        if t:
            import re
            c.update(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == want


def test_epoch_shuffle_permutation_and_repartition_stable(spark):
    """Each epoch is a full 1..N permutation; the order differs between
    epochs; and the assignment is a pure function of (seed, epoch, id) —
    identical under any input partitioning."""
    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    out = sampling.epoch_shuffle(docs, n_epochs=2, seed=7).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["pos"]
    assert set(by_epoch) == {0, 1}
    for e, m in by_epoch.items():
        assert sorted(m.values()) == list(range(1, 201))
    assert by_epoch[0] != by_epoch[1]  # epochs reshuffle

    again = {(r["epoch"], r["doc_id"]): r["pos"]
             for r in sampling.epoch_shuffle(
                 docs.repartition(7), n_epochs=2, seed=7).collect()}
    assert again == {(e, d): p for e, m in by_epoch.items()
                     for d, p in m.items()}


def test_epoch_shuffle_n_buckets_honored(spark):
    """Any power-of-two n_buckets yields the identical permutation (the
    bucket split is rank-invariant); non-powers raise."""
    import pytest

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    want = {(r["epoch"], r["doc_id"]): r["pos"]
            for r in sampling.epoch_shuffle(docs, n_epochs=1, seed=5).collect()}
    for hasher in ("xxhash64", "md5"):
        for nb in (4, 32, 1024):
            got = {(r["epoch"], r["doc_id"]): r["pos"]
                   for r in sampling.epoch_shuffle(
                       docs, n_epochs=1, seed=5, hasher=hasher,
                       n_buckets=nb).collect()}
            if hasher == "xxhash64":
                assert got == want, (hasher, nb)
            else:
                assert sorted(got.values()) == sorted(want.values())
    with pytest.raises(ValueError):
        sampling.epoch_shuffle(docs, n_buckets=100)


def test_epoch_shuffle_bucketed_rank_equals_single_window(spark):
    """The fixed-prefix-bucket rank decomposition must equal the naive
    single-partition row_number over (key, id) — for both hash families."""
    from pyspark.sql import Window

    docs = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    # nb=32 exercises the non-default prefix shift (md5: a non-nibble-
    # aligned 5-bit prefix; xxhash64: shiftright 59) — the multiset test
    # alone cannot catch a wrong shift because any bucket assignment
    # yields a bijection onto 1..n
    for hasher, nb in (("xxhash64", 256), ("md5", 256),
                       ("xxhash64", 32), ("md5", 32)):
        got = {(r["epoch"], r["doc_id"]): r["pos"]
               for r in sampling.epoch_shuffle(
                   docs, n_epochs=2, seed=3, hasher=hasher,
                   n_buckets=nb).collect()}
        base = docs.withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.lit(1))))
        k = (F.md5(F.concat_ws(",", F.lit(3), F.col("epoch"),
                               F.col("doc_id")))
             if hasher == "md5"
             else F.xxhash64(F.lit(3), F.col("epoch"), F.col("doc_id")))
        w = Window.partitionBy("epoch").orderBy(k, F.col("doc_id"))
        want = {(r["epoch"], r["doc_id"]): r["pos"]
                for r in base.withColumn(
                    "pos", F.row_number().over(w).cast("bigint")).collect()}
        assert got == want


def test_hash_split_drops_null_ids_like_hash_sample(spark):
    """A NULL id previously fell through every when-condition into the
    LAST split (usually eval) regardless of weights, while hash_sample
    dropped the row — the two now agree: NULL ids are excluded."""
    from data_integration_celery_spark.operators import sampling as S

    df = spark.createDataFrame([(1,), (2,), (None,)], "doc_id long")
    out = S.hash_split(df, "doc_id", {"train": 0.9, "test": 0.1})
    assert out.count() == 2
    assert out.where(F.col("doc_id").isNull()).count() == 0


def test_cap_per_group_rejects_unhashable_salt_order(spark):
    """The docstring's own example (order with .desc(), no tiebreaks)
    previously hit a codegen INTERNAL_ERROR (xxhash64 of a SortOrder);
    it must raise a clear ValueError instead — and work with tiebreaks."""
    from data_integration_celery_spark.operators import sampling as S

    df = spark.createDataFrame([(i, "g", i * 10) for i in range(8)],
                               "doc_id long, grp string, n_chars long")
    with pytest.raises(ValueError, match="tiebreaks"):
        S.cap_per_group(df, "grp", 4,
                        [F.col("n_chars").desc(), F.col("doc_id")])
    got = S.cap_per_group(df, "grp", 4,
                          [F.col("n_chars").desc(), F.col("doc_id")],
                          tiebreaks=["doc_id"])
    assert got.count() == 4


def test_select_token_budget_excludes_null_scores(spark):
    """NULL order values previously landed in the LAST bucket (silently
    'best'-adjacent); they are unrankable and must be excluded, budget
    spent on rankable rows only."""
    from data_integration_celery_spark.operators import sampling as S

    df = spark.createDataFrame(
        [(i, 10, float(i)) for i in range(1, 9)] + [(9, 10, None)],
        "doc_id long, tok long, neg double")
    got = sorted(r["doc_id"] for r in
                 S.select_token_budget(df, "tok", "neg", ["doc_id"],
                                       budget=40).collect())
    assert got == [1, 2, 3, 4]


def test_epoch_shuffle_rejects_nonpositive_epochs(spark):
    """n_epochs=0 previously fabricated epochs 0 and -1 via sequence's
    automatic -1 step; it must raise."""
    from data_integration_celery_spark.operators import sampling as S

    ids = spark.range(4).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="n_epochs"):
        S.epoch_shuffle(ids, n_epochs=0)
