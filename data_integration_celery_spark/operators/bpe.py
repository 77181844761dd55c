"""Distributed BPE tokenizer induction + application (Sennrich et al.,
ACL 2016, "Neural Machine Translation of Rare Words with Subword Units").

The vocabulary-learning step of an LLM data pipeline, Spark-first:

- **One corpus pass** builds the (word, freq) table — after that, every
  merge iteration runs against the VOCABULARY table (distinct words), whose
  size is corpus-sublinear (~millions of rows at 100 TB, never the corpus).
  The corpus itself is touched exactly once.
- **Each merge iteration is one small Spark job**: explode adjacent symbol
  pairs weighted by word freq → groupBy pair → top-1 (TakeOrderedAndProject
  with a lexicographic tie-break, so training is deterministic) → apply the
  merge to the symbol arrays with a pure-Column left-to-right fold. The
  1-row-per-iteration collect is the algorithm's sequential dependency
  (same O(iterations) driver pattern as Lloyd k-means / star contraction).
- Lineage is truncated with localCheckpoint every few iterations —
  identical discipline to connected_components_star.
- **Segmentation** (applying learned merges to new text) is the justified
  Arrow-batched Python path: per-word greedy lowest-rank merging is a
  data-dependent sequential loop (the GPT-2 encoder shape) driven by a
  broadcast merge-rank dict; one mapInPandas pass, no shuffle.

The merge fold: applying pair (a, b) left-to-right non-overlapping is
  acc = []; for x in syms: if acc and acc[-1] == a and x == b:
      acc[-1] = a + b  else: acc.append(x)
which is exactly greedy first-to-last merging (after processing any prefix,
acc equals the greedy output of that prefix; a just-merged token a+b can
never re-match `a` since b is non-empty). Expressed as one F.aggregate —
arrays are word-length, so the interpreted HOF cost is bounded by max word
length, not corpus size.

Determinism contract: pair counts are exact integers; ties break on the
pair's lexicographic order; training output is therefore bit-stable at any
parallelism. No cross-engine oracle exists (iterative argmax is not
SQL-expressible) — the registry entry is rows-only by design and the
training loop is differentially tested against a pure-python reference
implementation in test_bpe.py (exact merge-sequence equality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalized

END = "</w>"  # end-of-word marker symbol (Sennrich §3.2)


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the normalized corpus — the ONE corpus-scale pass
    (one shuffle on the word)."""
    toks = F.filter(F.split(normalized(F.col(text_col)), " "),
                    lambda t: t != "")
    return (docs.select(F.explode(toks).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _initial_symbols(word: Column) -> Column:
    """Character symbols + the end-of-word marker."""
    chars = F.transform(F.sequence(F.lit(1), F.length(word)),
                        lambda i: word.substr(i, F.lit(1)))
    return F.concat(chars, F.array(F.lit(END)))


def _adjacent_pairs(syms: Column) -> Column:
    """Array of (a, b) structs for each adjacent symbol pair."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.zip_with(F.slice(syms, 1, n - 1), F.slice(syms, 2, n - 1),
                   lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping replacement of (a, b) → a+b."""
    merged = a + b
    return F.aggregate(
        syms, F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(x))))


def _train_local(word_freqs: list[tuple[str, int]], n_merges: int,
                 min_freq: int) -> list[tuple[str, str]]:
    """Driver-side merge loop over a collected (word, freq) table — the
    IDENTICAL algorithm and tie-break as the distributed loop (pinned by
    test_bpe_local_equals_distributed)."""
    words = {w: list(w) + [END] for w, _ in word_freqs}
    freqs = dict(word_freqs)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_freq:
            break
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


def train_bpe(docs: DataFrame, n_merges: int, text_col: str = "text",
              min_freq: int = 2, checkpoint_every: int = 8,
              local_threshold: int = 100_000) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list [(a, b), ...]. Stops early when the best pair's weighted
    count drops below ``min_freq``.

    Scale switch: the corpus pass (word_frequencies) is always
    distributed; if the resulting VOCABULARY has ≤ ``local_threshold``
    distinct words it is collected once and the merge loop runs
    driver-side — 20 merge iterations over a sub-100k-row table cost less
    in one process than as 20 scheduled cluster jobs (the same local-mode
    escape spark.ml uses for small models). Above the threshold — the
    genuinely-huge multilingual-vocabulary case — every iteration runs
    distributed against the cached symbol table. Both paths are the same
    algorithm with the same deterministic tie-break and are pinned equal
    by test_bpe_local_equals_distributed; set ``local_threshold=0`` to
    force the distributed loop."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    wf = word_frequencies(docs, text_col)
    if local_threshold > 0:
        head = wf.limit(local_threshold + 1).collect()
        if len(head) <= local_threshold:
            return _train_local([(r["word"], r["freq"]) for r in head],
                                n_merges, min_freq)
    words = (wf
             .select(_initial_symbols(F.col("word")).alias("syms"), "freq")
             .localCheckpoint())
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (words.select(F.explode(_adjacent_pairs(F.col("syms")))
                            .alias("p"), "freq")
               .groupBy("p.a", "p.b").agg(F.sum("freq").alias("n"))
               .orderBy(F.col("n").desc(), "a", "b")
               .limit(1).collect())
        if not top or top[0]["n"] < min_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.select(_apply_merge(F.col("syms"), a, b).alias("syms"),
                             "freq")
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


def _segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merging (the GPT-2 encoder loop) — merges are
    applied in TRAINING order, which reproduces the training segmentation."""
    syms = list(word) + [END]
    while len(syms) >= 2:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, syms[i], syms[i + 1])
        if best is None:
            break
        _, a, b = best
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]],
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Tokenize every document with the learned merges: one Arrow-batched
    mapInPandas pass (per-word greedy merging is a data-dependent sequential
    loop — the one justified Python crossing here), merge ranks broadcast.
    Returns (id, n_words, n_subwords, subwords array)."""
    import pandas as pd

    spark = docs.sparkSession
    ranks_bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)})
    norm = docs.select(id_col, normalized(F.col(text_col)).alias("__norm"))
    schema = f"{id_col} long, n_words long, n_subwords long, " \
             "subwords array<string>"

    def encode(batches):
        ranks = ranks_bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, nw, ns, subs = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf["__norm"]):
                words = [w for w in (text or "").split(" ") if w]
                toks: list[str] = []
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _segment_word(w, ranks)
                    toks.extend(got)
                ids.append(doc_id)
                nw.append(len(words))
                ns.append(len(toks))
                subs.append(toks)
            yield pd.DataFrame({id_col: ids, "n_words": nw,
                                "n_subwords": ns, "subwords": subs})

    return norm.mapInPandas(encode, schema=schema)
