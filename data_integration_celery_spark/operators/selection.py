"""Data-selection operators for LLM training pipelines.

Two published corpus-selection methods the reference engine has no analogue
for (they belong to SURVEY §2.12, the LLM-pipeline extension surface):

- **DSIR** — Data Selection via Importance Resampling (Xie et al., NeurIPS
  2023, arXiv:2302.03169): documents are featurized as a bag of HASHED
  unigrams+bigrams over ``n_buckets`` buckets; a per-bucket importance
  weight ``ln p_target(b) - ln p_raw(b)`` is estimated from a target corpus
  (the distribution you want, e.g. curated text) and the raw corpus; each
  document's importance score is the sum of its features' log-ratios; the
  selected subset is a Gumbel top-k over score (equivalent to sampling
  without replacement proportionally to the importance weights).

- **Reference-corpus bigram-LM cross-entropy** — the CCNet scoring stage
  (Wenzek et al., LREC 2020) ranks documents by perplexity under a language
  model trained on a reference corpus (KenLM 5-gram in the paper). The
  engine form trains an add-k-smoothed bigram model ON-CLUSTER from a
  reference DataFrame and scores every document with its per-bigram
  cross-entropy — no external model artifact, one pass over each corpus.

Scale design (100 TB):
- Featurization is zero-shuffle: grams are built per-row with array
  expressions (split → filter → zip_with), then exploded; nothing needs a
  window or a sort. Feature state is ``n_buckets`` rows (DSIR) or the
  reference vocabulary (LM) — never the corpus.
- The DSIR weight table is ``n_buckets`` rows and is broadcast to the
  scoring join; the per-document aggregation is ONE shuffle on the doc id.
- LM counts shuffle on the gram key (xxhash64 in production → 8-byte keys);
  context counts derive from the bigram counts (small-on-small), the
  vocabulary size is a 1-row broadcast. Scoring joins the (thresholdable)
  model table — AQE broadcasts it when it fits.
- Selection is a Gumbel top-k: ``TakeOrderedAndProject``, never a global
  sort.

Cross-engine determinism follows the repo contract (queries.py header):
counts are exact integers; per-row double arithmetic is IEEE-identical;
per-row transcendentals (ln/log2) are rounded to 6 dp on BOTH engines
before any reduction; double reductions go through DECIMAL(38,6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from .text import normalized

# 2^52: md5's first 13 hex digits as an integer are uniform on [0, 2^52).
_H13_SPACE = 1 << 52


def _clean_tokens(text: Column) -> Column:
    """Normalized token array with empty tokens removed (the corpus-wide
    tokenizer shared with frequent_ngram_stats / corpus stats)."""
    return F.filter(F.split(normalized(text), " "), lambda t: t != "")


def unigram_bigram_array(text: Column) -> Column:
    """All unigrams followed by all bigrams ("w1 w2") of the normalized
    token sequence, as one array — built per-row, no shuffle."""
    toks = _clean_tokens(text)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                   lambda a, b: F.concat_ws(" ", a, b))
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _md5_u52(s: Column, salt: str) -> Column:
    """First 13 hex digits of md5('salt:' || s) as a BIGINT in [0, 2^52) —
    engine-portable (DuckDB: ('0x' || substring(md5(...),1,13))::UBIGINT)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"), s)), 1, 13),
                  16, 10).cast("bigint")


def feature_bucket(s: Column, n_buckets: int, hasher: str = "xxhash64",
                   salt: str = "dsir") -> Column:
    """Hash a gram string into [0, n_buckets). Production ``xxhash64`` is a
    seeded 8-byte JVM hash; ``md5`` is the engine-portable twin the exact
    oracle uses (identical construction, different hash family)."""
    if hasher == "md5":
        return (_md5_u52(s, salt) % n_buckets).cast("int")
    return F.pmod(F.xxhash64(F.lit(salt), s), F.lit(n_buckets)).cast("int")


def hashed_ngram_features(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", n_buckets: int = 1024,
                          hasher: str = "xxhash64",
                          salt: str = "dsir") -> DataFrame:
    """(id, bucket) — one row per unigram/bigram OCCURRENCE (a bag, not a
    set: DSIR's features are counts). Zero shuffles."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    return docs.select(
        id_col,
        F.explode(unigram_bigram_array(F.col(text_col))).alias("s")
    ).select(id_col, feature_bucket(F.col("s"), n_buckets, hasher,
                                    salt).alias("bucket"))


def _ratios_from_counts(counts: DataFrame, n_buckets: int,
                        smoothing: float) -> DataFrame:
    """(bucket, target_count, raw_count) → add-k log-ratios. The totals
    live in a 1-row aggregate crossJoined back (broadcast, never a driver
    collect)."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    totals = counts.agg(F.sum("target_count").alias("t_tot"),
                        F.sum("raw_count").alias("r_tot"))
    a, b = float(smoothing), float(n_buckets)
    p_t = (F.col("target_count") + a) / (F.col("t_tot") + a * b)
    p_r = (F.col("raw_count") + a) / (F.col("r_tot") + a * b)
    # per-row ln rounded 6dp (libm-ulp rule) — the later decimal sum of
    # these is then exact on any engine at any parallelism
    return (counts.crossJoin(F.broadcast(totals))
            .select("bucket", "target_count", "raw_count",
                    F.round(F.log(p_t) - F.log(p_r), 6).alias("log_ratio")))


def _bucket_spine(spark, n_buckets: int) -> DataFrame:
    return spark.range(n_buckets).select(F.col("id").cast("int")
                                         .alias("bucket"))


def bucket_log_ratios(target_feats: DataFrame, raw_feats: DataFrame,
                      n_buckets: int, smoothing: float = 1.0) -> DataFrame:
    """Per-bucket importance log-ratio ``ln p_target(b) - ln p_raw(b)``
    with add-k smoothing over the FULL bucket range (zero-count buckets get
    the smoothing floor, so every document scores a finite value).

    Output is ``n_buckets`` rows: (bucket, target_count, raw_count,
    log_ratio) — the broadcastable DSIR "model". Two-corpora form; when
    the target is a FILTER of the raw corpus use
    ``bucket_log_ratios_fused`` (one corpus pass instead of two)."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    spine = _bucket_spine(target_feats.sparkSession, n_buckets)
    tc = (target_feats.groupBy("bucket")
          .agg(F.count(F.lit(1)).alias("target_count")))
    rc = (raw_feats.groupBy("bucket")
          .agg(F.count(F.lit(1)).alias("raw_count")))
    counts = (spine.join(tc, "bucket", "left").join(rc, "bucket", "left")
              .select("bucket",
                      F.coalesce("target_count", F.lit(0))
                       .alias("target_count"),
                      F.coalesce("raw_count", F.lit(0)).alias("raw_count")))
    return _ratios_from_counts(counts, n_buckets, smoothing)


def bucket_log_ratios_fused(docs: DataFrame, target_cond: Column,
                            text_col: str = "text",
                            id_col: str = "doc_id", n_buckets: int = 1024,
                            smoothing: float = 1.0,
                            hasher: str = "xxhash64",
                            salt: str = "dsir") -> DataFrame:
    """Same output as ``bucket_log_ratios`` for the common case where the
    target corpus is ``docs.where(target_cond)`` — but counts both sides
    in ONE corpus pass (count + count_if per bucket), halving the scan
    work at 100 TB. Identical values by construction (count_if over the
    union ≡ count over the filtered subset)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    grams = docs.select(
        target_cond.alias("__t"),
        F.explode(unigram_bigram_array(F.col(text_col))).alias("s"))
    feats = grams.select(
        "__t", feature_bucket(F.col("s"), n_buckets, hasher,
                              salt).alias("bucket"))
    return _ratios_from_tagged_feats(docs.sparkSession, feats, n_buckets,
                                     smoothing)


def _ratios_from_tagged_feats(spark, feats: DataFrame, n_buckets: int,
                              smoothing: float) -> DataFrame:
    """Bucket log-ratios from a tagged feature stream — one row per hashed
    gram with (``__t`` target-membership flag, ``bucket``). The shared
    kernel of ``bucket_log_ratios_fused`` and ``dsir_select``'s
    Column-target branch: count + count_if per bucket in one pass."""
    both = (feats.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("raw_count"),
                 F.count_if(F.coalesce("__t", F.lit(False)))
                  .alias("target_count")))
    spine = _bucket_spine(spark, n_buckets)
    counts = (spine.join(both, "bucket", "left")
              .select("bucket",
                      F.coalesce("target_count", F.lit(0))
                       .alias("target_count"),
                      F.coalesce("raw_count", F.lit(0)).alias("raw_count")))
    return _ratios_from_counts(counts, n_buckets, smoothing)


def _scores_from_feats(docs: DataFrame, feats: DataFrame,
                       log_ratios: DataFrame, id_col: str) -> DataFrame:
    """Per-document Σ log_ratio(bucket) from a (id, bucket) feature stream.
    Broadcast join on the bucket, one shuffle (the per-doc aggregation);
    featureless docs (empty/null text) keep a 0.0 score so selection sees
    the whole corpus. Shared by ``dsir_scores`` and ``dsir_select``."""
    scored = (feats.join(F.broadcast(log_ratios.select("bucket",
                                                       "log_ratio")),
                         "bucket")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_feats"),
                   dsum("log_ratio", "score")))
    return (docs.select(id_col).join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
                    F.coalesce("score", F.lit(0.0)).alias("score")))


def dsir_scores(docs: DataFrame, log_ratios: DataFrame,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 1024, hasher: str = "xxhash64",
                salt: str = "dsir") -> DataFrame:
    """Per-document DSIR importance score: Σ log_ratio(bucket) over the
    document's hashed n-gram bag. Broadcast join on the bucket, one shuffle
    (the per-doc aggregation); featureless docs (empty/null text) keep a
    0.0 score so selection sees the whole corpus."""
    feats = hashed_ngram_features(docs, text_col, id_col, n_buckets,
                                  hasher, salt)
    return _scores_from_feats(docs, feats, log_ratios, id_col)


def gumbel_topk(scored: DataFrame, k: int, score_col: str = "score",
                id_col: str = "doc_id", seed: str = "v1",
                temperature: float = 1.0,
                hasher: str = "md5") -> DataFrame:
    """Gumbel top-k selection: keep the k rows maximizing
    ``score/temperature + Gumbel(hash(seed, id))`` — exactly sampling k
    documents without replacement with probability ∝ exp(score/temperature)
    (Gumbel-max trick), but fully deterministic given the seed.

    The uniform comes from the row's id hash (md5 for the engine-portable
    form, xxhash64 in production), mapped into (0,1) exclusive; the key is
    rounded to 6 dp (per-row transcendental rule) and tie-broken on the id,
    so the selected set is bit-stable across engines and parallelism.
    Physical plan: TakeOrderedAndProject — never a global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    sid = F.col(id_col).cast("string")
    if hasher == "md5":
        h = _md5_u52(sid, seed)
    else:
        h = F.pmod(F.xxhash64(F.lit(seed), sid), F.lit(_H13_SPACE))
    # u ∈ (0,1): (h+1)/(2^52+1); h+1 ≤ 2^52 < 2^53 so the double is exact
    u = (h + 1).cast("double") / float(_H13_SPACE + 1)
    gumbel = -F.log(-F.log(u))
    key = F.round(F.col(score_col) / temperature + gumbel, 6)
    return (scored.withColumn("sel_key", key)
            .orderBy(F.col("sel_key").desc(), F.col(id_col))
            .limit(k))


def dsir_select(docs: DataFrame, target: DataFrame | Column, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 1024, smoothing: float = 1.0,
                seed: str = "v1", temperature: float = 1.0,
                hasher: str = "xxhash64") -> DataFrame:
    """End-to-end DSIR: featurize, estimate bucket log-ratios, score
    ``docs``, Gumbel-top-k select. Returns the k selected rows as
    (id, n_feats, score, sel_key).

    ``target`` as a Column is a predicate over ``docs`` (the common case:
    "the curated slice of this corpus"): the bucketed feature stream —
    (id, bucket), ~12 bytes/gram after hashing — is built ONCE, persisted
    (MEMORY_AND_DISK: at corpus scale, spilling 12-byte rows beats
    re-hashing raw text), and feeds both the ratio counts (count +
    count_if per bucket) and the per-document scoring: one featurization
    pass total (sf0.1 md5 form: 4.0s → 1.4s warm). The cached stream
    lives until LRU eviction or a caller-side unpersist — at 100 TB wrap
    the returned plan in a job-scoped lifecycle. A separate DataFrame
    target (a different corpus entirely) pays the classic three passes."""
    if isinstance(target, Column):
        from pyspark import StorageLevel

        feats = (docs.select(id_col, target.alias("__t"),
                             F.explode(unigram_bigram_array(
                                 F.col(text_col))).alias("s"))
                 .select(id_col, "__t",
                         feature_bucket(F.col("s"), n_buckets,
                                        hasher).alias("bucket"))
                 .persist(StorageLevel.MEMORY_AND_DISK))
        ratios = _ratios_from_tagged_feats(docs.sparkSession, feats,
                                           n_buckets, smoothing)
        scored = _scores_from_feats(docs, feats, ratios, id_col)
    else:
        t_feats = hashed_ngram_features(target, text_col, id_col,
                                        n_buckets, hasher)
        r_feats = hashed_ngram_features(docs, text_col, id_col, n_buckets,
                                        hasher)
        ratios = bucket_log_ratios(t_feats, r_feats, n_buckets, smoothing)
        scored = dsir_scores(docs, ratios, text_col, id_col, n_buckets,
                             hasher)
    return gumbel_topk(scored, k, "score", id_col, seed, temperature,
                       hasher)


# ---------------------------------------------------------------------------
# Bigram-LM cross-entropy (CCNet-style reference-corpus scoring)
# ---------------------------------------------------------------------------

def _bigram_rows(docs: DataFrame, text_col: str, id_col: str,
                 hash_grams: bool) -> DataFrame:
    """(id, c1, c2) — one row per bigram position, zero shuffles.
    ``hash_grams`` swaps token strings for xxhash64 (8-byte join keys)."""
    toks = _clean_tokens(F.col(text_col))
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                   lambda a, b: F.struct(a.alias("c1"), b.alias("c2")))
    ).otherwise(F.array().cast("array<struct<c1:string,c2:string>>"))
    out = (docs.select(id_col, F.explode(pairs).alias("bg"))
           .select(id_col, F.col("bg.c1").alias("c1"),
                   F.col("bg.c2").alias("c2")))
    if hash_grams:
        out = out.select(id_col, F.xxhash64("c1").alias("c1"),
                         F.xxhash64("c2").alias("c2"))
    return out


def train_bigram_lm(ref_docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    hash_grams: bool = True) -> DataFrame:
    """Train an add-k-smoothable bigram table from a reference corpus:
    (c1, c2, bigram_count, context_count) per observed bigram, plus the
    vocabulary size as a crossJoined broadcast column ``vocab``.

    One shuffle (groupBy bigram); context counts derive from the bigram
    counts (small-on-small); vocab is a 1-row aggregate. The model is a
    DataFrame — persist it, write it bucketed by c1, or let AQE broadcast
    it into scoring."""
    bg = _bigram_rows(ref_docs, text_col, id_col, hash_grams)
    bgc = bg.groupBy("c1", "c2").agg(F.count(F.lit(1))
                                     .alias("bigram_count"))
    ctx = bgc.groupBy("c1").agg(F.sum("bigram_count").alias("context_count"))
    toks = (ref_docs.select(F.explode(_clean_tokens(F.col(text_col)))
                            .alias("tok")))
    if hash_grams:
        toks = toks.select(F.xxhash64("tok").alias("tok"))
    vocab = toks.agg(F.countDistinct("tok").alias("vocab"))
    return (bgc.join(ctx, "c1")
            .crossJoin(F.broadcast(vocab)))


def lm_cross_entropy(docs: DataFrame, model: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     smoothing: float = 0.5,
                     hash_grams: bool = True) -> DataFrame:
    """Per-document bigram cross-entropy under the reference model:
    CE = -(1/n) Σ log2 P(w2|w1),
    P(w2|w1) = (c(w1,w2)+k) / (c(w1,·)+k·V)   (add-k smoothing).

    Unseen bigrams/contexts fall to the smoothing floor, so out-of-domain
    text scores HIGH cross-entropy — CCNet's head/middle/tail split is a
    quantile cut over this column. Docs with <2 tokens return n_bigrams=0,
    ce=0.0 (no evidence ≠ low perplexity; filter on n_bigrams downstream).

    Per-row log2 rounded to 6 dp → decimal-exact per-doc sum → exact /n.
    Joins: doc bigrams ⋈ model on (c1,c2) then contexts on c1 — both
    gram-key shuffles (AQE broadcasts a small model); one doc-id shuffle."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    k = float(smoothing)
    bg = _bigram_rows(docs, text_col, id_col, hash_grams)
    # a hashed bigram stream joined against a string-keyed model (or vice
    # versa) would match NOTHING and silently score every document at the
    # smoothing floor — fail loudly instead
    m_t = dict(model.dtypes)["c1"]
    b_t = dict(bg.dtypes)["c1"]
    if m_t != b_t:
        raise ValueError(
            f"hash_grams mismatch: model keys are {m_t} but the scoring "
            f"stream built {b_t} — train and score with the same setting")
    # V as a 1-row broadcast (coalesced MAX so an EMPTY model still yields
    # one row with vocab 0 instead of dropping every document in the
    # crossJoin); greatest(vocab,1) keeps the floor probability finite
    vocab = model.agg(F.coalesce(F.max("vocab"), F.lit(0)).alias("vocab"))
    ctx = (model.select("c1", "context_count").distinct())
    p = ((F.coalesce("bigram_count", F.lit(0)) + k)
         / (F.coalesce("context_count", F.lit(0))
            + k * F.greatest(F.col("vocab"), F.lit(1))))
    neg_log2 = F.round(-F.log2(p), 6)
    per_doc = (bg.join(model.select("c1", "c2", "bigram_count"),
                       ["c1", "c2"], "left")
               .join(ctx, "c1", "left")
               .crossJoin(F.broadcast(vocab))
               .withColumn("nl2", neg_log2)
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_bigrams"),
                    dsum("nl2", "nl2_sum")))
    return (docs.select(id_col).join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.when(F.coalesce("n_bigrams", F.lit(0)) > 0,
                           F.round(F.col("nl2_sum") / F.col("n_bigrams"), 6))
                     .otherwise(F.lit(0.0)).alias("cross_entropy")))


def lm_cross_entropy_fused(docs: DataFrame, ref_cond: Column,
                           text_col: str = "text", id_col: str = "doc_id",
                           smoothing: float = 0.5,
                           hash_grams: bool = True) -> DataFrame:
    """train_bigram_lm + lm_cross_entropy for the common case where the
    reference corpus is ``docs.where(ref_cond)``: the bigram stream is
    built ONCE over the full corpus with a reference flag, persisted, and
    feeds both the model counts (flagged subset) and the scoring join —
    the only extra scan is the (cheap, reference-slice-only) vocabulary
    pass. Identical values to the two-operator composition by
    construction (count over the flagged subset ≡ count over the filtered
    corpus); pinned by a fused ≡ composed differential test.

    Cache lifecycle (same contract as ``dsir_select``): the corpus-scale
    bigram stream is persisted MEMORY_AND_DISK and lives until LRU
    eviction or a caller-side unpersist — at 100 TB wrap the returned
    plan in a job-scoped lifecycle: run the action, then release the
    stream via ``spark.catalog.clearCache()`` (or unpersist the cached
    RDD found under ``spark.sparkContext._jsc.getPersistentRDDs``)."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    from pyspark import StorageLevel

    k = float(smoothing)
    toks = _clean_tokens(F.col(text_col))
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                   lambda a, b: F.struct(a.alias("c1"), b.alias("c2")))
    ).otherwise(F.array().cast("array<struct<c1:string,c2:string>>"))
    # the flag rides the explode — no join back, the stream is one scan
    bg = (docs.select(id_col,
                      F.coalesce(ref_cond, F.lit(False)).alias("__r"),
                      F.explode(pairs).alias("bg"))
          .select(id_col, "__r", F.col("bg.c1").alias("c1"),
                  F.col("bg.c2").alias("c2")))
    if hash_grams:
        bg = bg.select(id_col, "__r", F.xxhash64("c1").alias("c1"),
                       F.xxhash64("c2").alias("c2"))
    bg = bg.persist(StorageLevel.MEMORY_AND_DISK)
    bgc = (bg.where("__r").groupBy("c1", "c2")
           .agg(F.count(F.lit(1)).alias("bigram_count")))
    ctx = bgc.groupBy("c1").agg(F.sum("bigram_count")
                                .alias("context_count"))
    toks = (docs.where(ref_cond)
            .select(F.explode(_clean_tokens(F.col(text_col)))
                    .alias("tok")))
    if hash_grams:
        toks = toks.select(F.xxhash64("tok").alias("tok"))
    vocab = toks.agg(F.coalesce(F.count_distinct("tok"), F.lit(0))
                     .alias("vocab"))
    p = ((F.coalesce("bigram_count", F.lit(0)) + k)
         / (F.coalesce("context_count", F.lit(0))
            + k * F.greatest(F.col("vocab"), F.lit(1))))
    per_doc = (bg.join(bgc, ["c1", "c2"], "left")
               .join(ctx, "c1", "left")
               .crossJoin(F.broadcast(vocab))
               .withColumn("nl2", F.round(-F.log2(p), 6))
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_bigrams"),
                    dsum("nl2", "nl2_sum")))
    return (docs.select(id_col).join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.when(F.coalesce("n_bigrams", F.lit(0)) > 0,
                           F.round(F.col("nl2_sum") / F.col("n_bigrams"),
                                   6))
                     .otherwise(F.lit(0.0)).alias("cross_entropy")))


def quantile_split(df: DataFrame, score_col: str,
                   fractions: tuple[float, ...] = (1 / 3, 2 / 3),
                   labels: tuple[str, ...] = ("head", "middle", "tail"),
                   tiebreaks: list[str] | None = None,
                   alias: str = "split") -> DataFrame:
    """CCNet's corpus split (Wenzek et al. §4.4): rank every row by
    ``score_col`` ascending (low cross-entropy = most in-domain = head)
    and cut at the given cumulative fractions — row i of n gets
    ``labels[j]`` for the first j with rank ≤ ceil(fractions[j]·n).

    Built on ``windows.rank_rows_scalable`` — the global order comes from
    range-bucketed parallel windows, never an Exchange SinglePartition
    over data rows; n arrives as a broadcast 1-row count. Deterministic:
    (score, *tiebreaks) must be a strict total order (same contract as
    w1), thresholds are exact integer comparisons against ceil(f·n).

    Returns df + (rank alias'd ``rn``, n_total, ``split``)."""
    if len(labels) != len(fractions) + 1:
        raise ValueError(
            f"need len(labels) == len(fractions)+1, got {len(labels)} "
            f"labels for {len(fractions)} cut points")
    if list(fractions) != sorted(fractions) or not all(
            0.0 < f < 1.0 for f in fractions):
        raise ValueError(f"fractions must be ascending in (0,1): {fractions}")
    from .windows import rank_rows_scalable
    # rank_rows_scalable's order_col contract is NON-NULL (a NULL score is
    # NULL in every range-bucket CASE arm and lands in the last bucket at
    # an arbitrary local rank, shifting every real row's split) — filter
    # them out of BOTH the ranking and n_total, the select_token_budget
    # rule
    df = df.where(F.col(score_col).isNotNull())
    ranked = rank_rows_scalable(df, score_col, tiebreaks or [], alias="rn")
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    out = ranked.crossJoin(F.broadcast(total))
    label = None
    for f, lab in zip(fractions, labels):
        cond = F.col("rn") <= F.ceil(F.lit(float(f)) * F.col("n_total"))
        label = F.when(cond, F.lit(lab)) if label is None \
            else label.when(cond, F.lit(lab))
    label = label.otherwise(F.lit(labels[-1]))
    return out.withColumn(alias, label)
