"""BPE tokenizer induction: distributed trainer ≡ pure-python reference
(exact merge-sequence equality — same counts, same lexicographic
tie-break), segmentation round-trips, and edge cases.

No cross-engine oracle exists (iterative argmax is not SQL-expressible),
so the registry entry is rows-only; THIS differential is the correctness
evidence, mirroring smp_pack_sequences' strategy.
"""

from __future__ import annotations

from collections import Counter

import pytest

from data_integration_celery_spark.operators import bpe


def _py_normalize(s):
    return [t for t in "".join(c if c.isalnum() else " "
                               for c in s.lower()).split() if t]


def _py_train(texts, n_merges, min_freq=2):
    """Reference BPE (Sennrich Algorithm 1) with the engine's tie-break."""
    vocab = Counter()
    for t in texts:
        for w in _py_normalize(t or ""):
            vocab[w] += 1
    words = {w: list(w) + [bpe.END] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            f = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # max count, ties broken lexicographically ascending on (a, b)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b), _n = best
        merges.append((a, b))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


CORPUS = [
    "low lower lowest low low",
    "new newer newest new new newer",
    "wide wider widest wide",
    "low new low new lowest widest",
    "the quick brown fox! The quick, brown fox.",
    "",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")


def test_train_bpe_matches_python_reference(spark):
    """The DISTRIBUTED merge loop (local_threshold=0 forces it) matches
    the reference exactly."""
    got = bpe.train_bpe(_docs(spark, CORPUS), n_merges=25,
                        checkpoint_every=5, local_threshold=0)
    expect = _py_train(CORPUS, 25)
    assert got == expect
    assert len(got) > 5  # the corpus actually yields merges


def test_bpe_local_equals_distributed(spark):
    """The driver-side small-vocab path and the distributed loop produce
    the identical merge sequence."""
    docs = _docs(spark, CORPUS)
    local = bpe.train_bpe(docs, n_merges=15)  # vocab ≪ default threshold
    dist = bpe.train_bpe(docs, n_merges=15, local_threshold=0,
                         checkpoint_every=4)
    assert local == dist


def test_train_bpe_deterministic_tiebreak(spark):
    """All pair counts equal → merges come out in lexicographic order
    (both paths)."""
    texts = ["ab cd ab cd"]
    for thr in (0, 100_000):
        got = bpe.train_bpe(_docs(spark, texts), n_merges=4, min_freq=2,
                            local_threshold=thr)
        assert got == _py_train(texts, 4)


def test_train_bpe_min_freq_stops(spark):
    texts = ["abc def"]  # every pair occurs once
    assert bpe.train_bpe(_docs(spark, texts), n_merges=5,
                         min_freq=2) == []


def test_train_bpe_validation(spark):
    with pytest.raises(ValueError):
        bpe.train_bpe(_docs(spark, CORPUS), n_merges=0)


def test_segment_consistent_with_training(spark):
    """Segmenting the training corpus with the learned merges reproduces
    the trainer's final symbol state for every word."""
    merges = bpe.train_bpe(_docs(spark, CORPUS), n_merges=20)

    # python-side trainer final state
    vocab = Counter()
    for t in CORPUS:
        for w in _py_normalize(t):
            vocab[w] += 1
    words = {w: list(w) + [bpe.END] for w in vocab}
    for a, b in merges:
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

    ranks = {p: i for i, p in enumerate(merges)}
    for w, syms in words.items():
        assert bpe._segment_word(w, ranks) == syms, w


def test_bpe_segment_dataframe(spark):
    merges = bpe.train_bpe(_docs(spark, CORPUS), n_merges=15)
    out = bpe.bpe_segment(_docs(spark, CORPUS), merges)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == len(CORPUS)
    ranks = {p: i for i, p in enumerate(merges)}
    for i, t in enumerate(CORPUS):
        words = _py_normalize(t)
        toks = [s for w in words for s in bpe._segment_word(w, ranks)]
        assert rows[i].n_words == len(words)
        assert rows[i].n_subwords == len(toks)
        assert list(rows[i].subwords) == toks
    # every subword sequence reassembles to its word stream
    for i, t in enumerate(CORPUS):
        joined = "".join(rows[i].subwords).replace(bpe.END, " ").strip()
        assert joined == " ".join(_py_normalize(t))


def test_bpe_segment_empty_merges(spark):
    out = bpe.bpe_segment(_docs(spark, ["ab"]), [])
    r = out.collect()[0]
    assert list(r.subwords) == ["a", "b", bpe.END]


def _py_gpt2_encode(word, ranks):
    """Independent GPT-2-style encoder (different code shape from
    bpe._segment_word on purpose): repeatedly merge every occurrence of
    the lowest-ranked adjacent pair, left to right, until none applies."""
    syms = list(word) + [bpe.END]
    while len(syms) > 1:
        ranked = sorted((ranks.get(p, float("inf")), p)
                        for p in zip(syms, syms[1:]))
        rank, (a, b) = ranked[0]
        if rank == float("inf"):
            break
        nxt, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                nxt.append(a + b)
                i += 2
            else:
                nxt.append(syms[i])
                i += 1
        syms = nxt
    return syms


def test_txt_bpe_segment_query_matches_python(spark):
    """End-to-end pin of the registered APPLY-path query: every document's
    word count, subword count, AND the md5 fingerprint of the exact
    subword sequence must equal the independent pure-python encoder's on
    the same fixed merges. This is the rows-only entry's correctness
    evidence (no SQL oracle exists for a sequential merge loop)."""
    import hashlib

    from data_integration_celery_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    ranks = {p: i for i, p in enumerate(Q._BPE_FIXED_MERGES)}
    got = {r.doc_id: r
           for r in Q.QUERIES["txt_bpe_segment"].spark(spark, sf).collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    assert len(got) == len(docs) > 0
    fired = 0
    for row in docs:
        words = _py_normalize(row.text or "")
        toks = [t for w in words for t in _py_gpt2_encode(w, ranks)]
        r = got[row.doc_id]
        assert r.n_words == len(words), row.doc_id
        assert r.n_subwords == len(toks), row.doc_id
        fp = hashlib.md5("\x1f".join(toks).encode()).hexdigest()
        assert r.sub_fp == fp, row.doc_id
        fired += sum(len(w) + 1 != n for w, n in
                     ((w, len(_py_gpt2_encode(w, ranks))) for w in words))
    assert fired > 0  # the fixed merges actually fire on this corpus
