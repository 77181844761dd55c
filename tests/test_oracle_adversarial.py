"""Adversarial-corpus pins for the round-7 recursive-CTE oracles.

The driver gate only ever exercises these oracles against the generated
testdata; if the driver regenerates parquet with different text shapes
(it has before — the r3 timestamp-flavor shift), a latent oracle/engine
divergence would surface as a red gate with no warning. This suite runs
the SAME registry query and the SAME oracle SQL over a hand-built
adversarial corpus: overlapping-merge runs (x==y pairs like 'aaaa'),
single-character and repeated words, punctuation-only, empty and NULL
text, token counts straddling the packing budget and oversize line.
"""

import duckdb
import pytest

from data_integration_celery_spark.queries import QUERIES

ADVERSARIAL = [
    (0, "aaaa bb aaa aa a"),              # x==y overlap runs
    (1, "the the the cat cat sat"),       # high-freq repeats
    (2, "abab abab ababab"),              # alternating pairs
    (3, "x"),                             # single char / single word
    (4, "!!! ??? ..."),                   # normalizes to empty
    (5, ""),                              # empty text
    (6, None),                            # NULL text
    (7, "zz zz zz zz zz zz zz zz"),       # one dominant bigram
    (8, "mixed123 numbers42 9lives"),     # alnum words
    (9, "longwordrepeatedlongwordrepeated"),
    (10, " ".join(["tok%d" % i for i in range(600)])),   # > pack budget (80)
    (11, " ".join(["pad"] * 79)),         # exactly budget-1 tokens
    (12, " ".join(["pad"] * 80)),         # exactly budget tokens
    (13, " ".join(["pad"] * 81)),         # budget+1 -> oversize
    (14, "aa " * 40),                     # 40 tokens, trailing space
    (15, "solo"),
] + [(16 + i, "bucket filler text %d" % i) for i in range(40)]


@pytest.fixture(scope="module")
def adv_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("adv")
    spark.createDataFrame(ADVERSARIAL, "doc_id long, text string") \
        .coalesce(2).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _oracle_rows(adv_dir, sql):
    con = duckdb.connect()
    # Spark writes a directory of part files; the testdata files the gate
    # reads are single files — glob covers both layouts
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{adv_dir}/documents.parquet/*.parquet')")
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


@pytest.mark.parametrize("name", ["txt_bpe_train", "txt_bpe_segment",
                                  "smp_pack_sequences"])
def test_recursive_cte_oracles_hold_on_adversarial_corpus(spark, adv_dir,
                                                          name):
    q = QUERIES[name]
    got = sorted(tuple(r) for r in q.spark(spark, adv_dir).collect())
    want = _oracle_rows(adv_dir, q.sql)
    assert got == want, f"{name}: spark != oracle on adversarial corpus"
    assert got, f"{name}: adversarial corpus produced no rows"
