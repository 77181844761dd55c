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
    """The driver may gate only a prefix of the registry (round 1: first 50).
    Every unique SURVEY §2-mapped query and every distinct LLM-pipeline op
    must sit in the first 50 slots; sibling-covered variants and no-oracle
    approximates go to the tail."""
    from data_integration_celery_spark.queries import QUERIES, QUERY_PRIORITY
    names = list(QUERIES)
    assert names[:len(QUERY_PRIORITY)] == QUERY_PRIORITY
    first50 = set(names[:50])
    required = {
        "j6_code_mapping_maintenance", "j14_main_sec_join",
        "w11_adjusted_continuous", "f3_cleaning_exprs", "stream_bars_1min",
        "dedup_embedding_pairs", "txt_winnowing", "mm_image_features",
        "a11_accumulation_detect", "w8b_quarterize_exact",
    }
    assert required <= first50, required - first50
