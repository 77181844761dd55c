"""Sequence packing: budget invariant, exhaustive assignment, determinism,
FFD efficiency bound, oversize flagging, batch-boundary carry."""

import pytest
from pyspark.sql import functions as F

from data_integration_celery_spark.operators import packing


def _docs(spark, sizes, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, s) for i, s in enumerate(sizes)],
        "doc_id long, n_tokens long")


def test_packs_respect_budget_and_cover_all_docs(spark):
    import random
    rnd = random.Random(11)
    sizes = [rnd.randint(50, 900) for _ in range(2000)]
    docs = _docs(spark, sizes)
    out = packing.pack_documents(docs, "doc_id", "n_tokens", budget=2048)
    rows = out.collect()
    assert len(rows) == 2000                       # every doc assigned
    per_pack = {}
    for r in rows:
        assert r["oversize"] == 0
        per_pack.setdefault(r["pack_id"], 0)
        per_pack[r["pack_id"]] += r["n_tokens"]
    assert all(v <= 2048 for v in per_pack.values())
    # FFD waste bound (loose): no more than 2x the volume lower bound
    lower = -(-sum(sizes) // 2048)
    assert len(per_pack) <= 2 * lower + out.rdd.getNumPartitions()


def test_oversize_docs_get_singleton_flagged_packs(spark):
    docs = _docs(spark, [100, 5000, 200, 9000])
    out = packing.pack_documents(docs, "doc_id", "n_tokens", budget=1024)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["oversize"] == 1 and rows[3]["oversize"] == 1
    assert rows[0]["oversize"] == 0 and rows[2]["oversize"] == 0
    # oversize packs are singletons
    packs = [r["pack_id"] for r in rows.values()]
    assert packs.count(rows[1]["pack_id"]) == 1
    assert packs.count(rows[3]["pack_id"]) == 1


def test_packing_deterministic(spark):
    import random
    rnd = random.Random(3)
    docs = _docs(spark, [rnd.randint(10, 500) for _ in range(800)])
    a = {(r["doc_id"], r["pack_id"]) for r in packing.pack_documents(
        docs, "doc_id", "n_tokens", budget=1024, n_partitions=8).collect()}
    b = {(r["doc_id"], r["pack_id"]) for r in packing.pack_documents(
        docs.repartition(17), "doc_id", "n_tokens", budget=1024,
        n_partitions=8).collect()}
    assert a == b, "packing must not depend on input partitioning"


def test_nextfit_matches_reference_walk(spark):
    """nextfit with one partition must equal the textbook sequential walk
    over the (tokens desc, id) order — proves the batch-boundary carry."""
    import random
    rnd = random.Random(5)
    sizes = [rnd.randint(100, 700) for _ in range(1500)]
    docs = _docs(spark, sizes)
    out = packing.pack_documents(docs, "doc_id", "n_tokens", budget=1000,
                                 n_partitions=1, strategy="nextfit")
    got = {r["doc_id"]: r["pack_id"] for r in out.collect()}

    order = sorted(enumerate(sizes), key=lambda t: (-t[1], t[0]))
    want, pack, used, nxt = {}, None, 0, 0
    for i, s in order:
        if pack is None or used + s > 1000:
            pack, used = nxt, 0
            nxt += 1
        want[i] = pack
        used += s
    assert got == want


def test_pack_stats(spark):
    docs = _docs(spark, [600, 600, 600, 3000])
    out = packing.pack_documents(docs, "doc_id", "n_tokens", budget=1024,
                                 n_partitions=1)
    st = packing.pack_stats(out, "n_tokens", 1024).collect()[0]
    assert st["n_oversize"] == 1
    assert st["n_packs"] == 4  # 600+600 never fits together? 1200>1024 -> 3 packs + oversize
    assert st["padding_tokens"] == 3 * (1024 - 600)
    assert abs(st["mean_fill"] - 600 / 1024) < 1e-9


def test_packing_validates_args(spark):
    docs = _docs(spark, [10])
    with pytest.raises(ValueError, match="budget"):
        packing.pack_documents(docs, "doc_id", "n_tokens", budget=0)
    with pytest.raises(ValueError, match="strategy"):
        packing.pack_documents(docs, "doc_id", "n_tokens", budget=10,
                               strategy="bogus")


def _bucketed(spark, sizes, n_buckets=4):
    return spark.createDataFrame(
        [(i, s, i % n_buckets) for i, s in enumerate(sizes)],
        "doc_id long, n_tokens long, bucket long")


def test_boundary_packing_invariant_to_parallelism(spark):
    """With boundary_col the pack assignment is a pure function of the data:
    identical output at any n_partitions / input layout (the property the
    recursive-CTE oracle relies on)."""
    import random
    rnd = random.Random(7)
    docs = _bucketed(spark, [rnd.randint(10, 500) for _ in range(600)])
    runs = []
    for src, n in ((docs, 2), (docs.repartition(13), 9), (docs, 1)):
        out = packing.pack_documents(src, "doc_id", "n_tokens", budget=1024,
                                     n_partitions=n, strategy="nextfit",
                                     boundary_col="bucket")
        runs.append({(r["doc_id"], r["pack_id"], r["oversize"])
                     for r in out.collect()})
    assert runs[0] == runs[1] == runs[2]


def test_boundary_packing_never_crosses_buckets(spark):
    import random
    rnd = random.Random(9)
    docs = _bucketed(spark, [rnd.randint(10, 900) for _ in range(400)],
                     n_buckets=7)
    out = packing.pack_documents(docs, "doc_id", "n_tokens", budget=1024,
                                 strategy="nextfit", boundary_col="bucket")
    rows = out.collect()
    assert len(rows) == 400
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], set()).add(r["bucket"])
        # pack_id encodes the bucket, never a partition index
        assert r["pack_id"] >> 24 == r["bucket"]
    assert all(len(b) == 1 for b in by_pack.values())


def test_boundary_packing_matches_per_bucket_walk(spark):
    """Boundary next-fit == the textbook walk run independently per bucket
    over the (tokens desc, id) order — including the oversize singleton
    rule (oversize consumes a pack seq but leaves the open pack intact)."""
    import random
    rnd = random.Random(13)
    sizes = [rnd.randint(100, 1500) for _ in range(500)]  # some oversize
    docs = _bucketed(spark, sizes, n_buckets=5)
    out = packing.pack_documents(docs, "doc_id", "n_tokens", budget=1024,
                                 n_partitions=3, strategy="nextfit",
                                 boundary_col="bucket")
    got = {r["doc_id"]: (r["pack_id"], r["oversize"]) for r in out.collect()}

    want = {}
    for b in range(5):
        members = sorted(((i, s) for i, s in enumerate(sizes) if i % 5 == b),
                         key=lambda t: (-t[1], t[0]))
        open_seq, used, nxt = None, 0, 0
        for i, s in members:
            if s > 1024:
                want[i] = ((b << 24) + nxt, 1)
                nxt += 1
                continue
            if open_seq is None or used + s > 1024:
                open_seq, used = nxt, 0
                nxt += 1
            want[i] = ((b << 24) + open_seq, 0)
            used += s
    assert got == want


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(0, 1300), min_size=1, max_size=120),
       st.integers(100, 1100),
       st.integers(1, 5))
def test_boundary_nextfit_property(spark, sizes, budget, n_buckets):
    """Property form of the per-bucket walk equivalence: for ANY sizes /
    budget / bucket count, boundary next-fit equals the textbook sequential
    walk run independently per bucket (incl. oversize singleton rule and
    zero-token docs), and never depends on n_partitions."""
    docs = spark.createDataFrame(
        [(i, s, i % n_buckets) for i, s in enumerate(sizes)],
        "doc_id long, n_tokens long, bucket long")
    out = packing.pack_documents(docs, "doc_id", "n_tokens", budget=budget,
                                 n_partitions=2, strategy="nextfit",
                                 boundary_col="bucket")
    got = {r["doc_id"]: (r["pack_id"], r["oversize"]) for r in out.collect()}

    want = {}
    for b in range(n_buckets):
        members = sorted(((i, s) for i, s in enumerate(sizes)
                          if i % n_buckets == b), key=lambda t: (-t[1], t[0]))
        open_seq, used, nxt = None, 0, 0
        for i, s in members:
            if s > budget:
                want[i] = ((b << 24) + nxt, 1)
                nxt += 1
                continue
            if open_seq is None or used + s > budget:
                open_seq, used = nxt, 0
                nxt += 1
            want[i] = ((b << 24) + open_seq, 0)
            used += s
    assert got == want


def test_boundary_packing_rejects_negative_bucket(spark):
    docs = spark.createDataFrame([(1, 10, -2)],
                                 "doc_id long, n_tokens long, bucket long")
    with pytest.raises(Exception, match="non-negative"):
        packing.pack_documents(docs, "doc_id", "n_tokens", budget=100,
                               strategy="nextfit",
                               boundary_col="bucket").collect()


def test_boundary_bucket_overflow_raises(spark):
    """bucket << 24 must fit int64 alongside the 24-bit pack counter: a
    bucket >= 2**39 would silently collide pack_id spaces, so it raises
    like the negative-bucket validation."""
    df = spark.createDataFrame([(1, 10, 1 << 39)],
                               "doc_id long, n_tokens int, bkt long")
    with pytest.raises(Exception, match="2\\*\\*39"):
        packing.pack_documents(df, "doc_id", "n_tokens", 100,
                               boundary_col="bkt").collect()
