"""Driver-contract smoke tests."""

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_queries_and_oracles_aligned(spark):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_every_query_runs_sf0001(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()


def test_registry_priority_order():
    """The driver gates only a prefix of the registry (first 50). Every
    exact-oracle query that has not yet earned a green driver CORRECTNESS
    row must sit in the first 50 slots; double-green (r1+r2) siblings,
    composites and no-oracle approximates go to the tail."""
    from data_integration_celery_spark.queries import QUERIES, QUERY_PRIORITY
    names = list(QUERIES)
    assert names[:len(QUERY_PRIORITY)] == QUERY_PRIORITY
    first50 = set(names[:50])
    required = {
        # round-2 work that needs its first driver row
        "w11b_adjusted_diff", "w1b_rank_scalable",
        "j8b_interval_join_bucketed", "dedup_components_star",
        "txt_repetition", "txt_pii_redact", "txt_vocab_topk",
        "smp_hash_split", "smp_mixture_resample", "smp_source_quota",
        "smp_token_budget",
        # per-family anchors
        "j6_code_mapping_maintenance", "j14_main_sec_join",
        "f3_cleaning_exprs", "stream_bars_1min",
        "dedup_embedding_pairs", "txt_winnowing", "mm_image_features",
        "a11_accumulation_detect", "w8b_quarterize_exact",
    }
    assert required <= first50, required - first50
    # no top-50 slot may be wasted on a rows-only (no-oracle) query
    import __spark_entry__ as entry_mod
    osql = entry_mod.oracle_sql()
    assert all(n in osql for n in names[:50]), \
        [n for n in names[:50] if n not in osql]
