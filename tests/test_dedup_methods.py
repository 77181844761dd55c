"""Both exact Jaccard strategies must agree (count vs PPJoin prefix)."""

from data_integration_celery_spark import catalog
from data_integration_celery_spark.operators import dedup


def _pairs(df):
    return {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in df.collect()}


def test_count_and_prefix_methods_agree(spark, sf_dir):
    docs = catalog.load(spark, "documents", sf_dir)
    a = _pairs(dedup.ngram_jaccard_pairs(docs, threshold=0.2,
                                         block_col="lang", method="count"))
    b = _pairs(dedup.ngram_jaccard_pairs(docs, threshold=0.2,
                                         block_col="lang", method="prefix"))
    assert a == b and len(a) > 0


def test_high_threshold_agreement(spark, sf_dir):
    docs = catalog.load(spark, "documents", sf_dir)
    a = _pairs(dedup.ngram_jaccard_pairs(docs, threshold=0.6, method="count"))
    b = _pairs(dedup.ngram_jaccard_pairs(docs, threshold=0.6, method="prefix"))
    assert a == b
