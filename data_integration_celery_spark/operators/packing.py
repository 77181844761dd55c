"""Sequence packing: bin documents into fixed token budgets (training-data op).

Pretraining pipelines concatenate documents into fixed-length training
sequences; the packing step assigns each document to a "pack" whose total
token count stays within the context budget, minimising padding waste. The
classical greedy algorithms (next-fit / first-fit-decreasing) are inherently
sequential — running capacity is cross-row state — so the Spark-first shape
is the same one the engine uses for the contract-selection scan: distribute
documents across partitions, sort within each partition, run the greedy pass
as ONE Arrow-batched ``mapInPandas`` scan per partition with carry across
batches. Packs never cross partition boundaries, so every partition packs
independently (the only fleet-wide cost is one repartition) and the result
is deterministic for a fixed (salt, n_partitions).

Waste analysis: next-fit within a partition is a 2-approximation of optimal
bin count; partition boundaries add at most one under-filled pack per
partition — negligible when each partition holds thousands of documents
(at 100 TB you size n_partitions so each holds ~executor-memory worth of
docs, exactly like every other shuffle in this engine).

No reference counterpart (the reference ingests market data); part of the
LLM-pipeline extension surface alongside dedup/sampling/text.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_documents(docs: DataFrame, id_col: str, tokens_col: str,
                   budget: int, n_partitions: int | None = None,
                   strategy: str = "ffd",
                   boundary_col: str | None = None) -> DataFrame:
    """Assign every document a ``pack_id`` with sum(tokens) ≤ ``budget``.

    ``strategy``:
    - ``'ffd'`` (default): first-fit-decreasing within the partition — sort
      by token count descending, place each doc in the first open pack with
      room (11/9·OPT+1 bins; open packs tracked in a list, fine for
      partition-sized inputs);
    - ``'nextfit'``: keep one open pack, close it when the next doc does not
      fit (2·OPT, O(1) state — the streaming-friendly form).

    Documents larger than ``budget`` get a singleton pack (flagged
    ``oversize=1``) — the caller decides whether to truncate or drop.

    ``boundary_col=None`` (default): packs never cross Spark PARTITION
    boundaries; ``pack_id = partition_id * 2^40 + local pack`` and the
    result is deterministic for a fixed (id hash, n_partitions).

    ``boundary_col='bucket'``: packs never cross values of an explicit
    non-negative integer bucket column — the greedy state resets at every
    bucket change and ``pack_id = bucket * 2^24 + local pack``. Because the
    bucket is data (not a TaskContext partition index), the output is
    IDENTICAL at any parallelism / cluster layout — the reproducible form a
    100 TB pipeline should persist, and the form a cross-engine oracle can
    replay (the driver's ``smp_pack_sequences`` recursive-CTE oracle walks
    the same fold per bucket in lockstep). At scale, choose the bucket so
    each holds ~one executor-memory worth of docs, exactly like any other
    shuffle key.

    Returns the input columns plus (pack_id long, oversize int).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if strategy not in ("ffd", "nextfit"):
        raise ValueError(f"unknown strategy {strategy!r}")
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)
    out_schema = StructType(list(docs.schema.fields)
                            + [StructField("pack_id", LongType()),
                               StructField("oversize", IntegerType())])

    shuffle_key = F.col(boundary_col) if boundary_col else F.col(id_col)
    part = docs.repartition(*( [n_partitions] if n_partitions else [] ),
                            shuffle_key)
    sort_cols = ([F.col(boundary_col)] if boundary_col else []) \
        + [F.col(tokens_col).desc(), F.col(id_col)]
    part = part.sortWithinPartitions(*sort_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        base = TaskContext.get().partitionId() << 40
        cur_bucket = None
        open_packs: list[tuple[int, int]] = []   # (pack_id, used)
        next_pack = 0

        def new_pack_id() -> int:
            # boundary mode allots 24 bits to the per-bucket counter
            # (partition mode gets 40): an unguarded overflow would
            # silently collide into the NEXT bucket's pack_id space and
            # merge unrelated packs — raise instead, mirroring the
            # negative-bucket validation
            nonlocal next_pack
            if boundary_col is not None and next_pack >= 1 << 24:
                raise ValueError(
                    f"bucket {cur_bucket} produced >= 2**24 packs; "
                    "boundary-mode pack_ids allot 24 bits per bucket")
            pid = base + next_pack
            next_pack += 1
            return pid

        for pdf in batches:
            ids, overs = [], []
            buckets = (pdf[boundary_col].to_numpy() if boundary_col
                       else [None] * len(pdf))
            for t, bval in zip(pdf[tokens_col].to_numpy(), buckets):
                if boundary_col is not None and bval != cur_bucket:
                    # greedy state never crosses a bucket boundary
                    cur_bucket = bval
                    open_packs.clear()
                    next_pack = 0
                    if pd.isna(bval) or int(bval) < 0:
                        raise ValueError(
                            f"boundary_col must be non-negative, got {bval}")
                    if int(bval) >= 1 << 39:
                        raise ValueError(
                            f"boundary_col {bval} >= 2**39 would overflow "
                            "the int64 pack_id (bucket << 24 + 24-bit seq)")
                    base = int(bval) << 24
                if pd.isna(t):
                    # a NULL token count cannot be packed (int(NaN) would
                    # abort the task): flag it a singleton like the
                    # oversize path — the caller decides its fate
                    ids.append(new_pack_id())
                    overs.append(1)
                    continue
                t = int(t)
                if t > budget:
                    ids.append(new_pack_id()); overs.append(1)
                    continue
                placed = None
                if strategy == "ffd":
                    for i, (pid, used) in enumerate(open_packs):
                        if used + t <= budget:
                            placed = pid
                            open_packs[i] = (pid, used + t)
                            break
                elif open_packs:  # nextfit: single open pack
                    pid, used = open_packs[0]
                    if used + t <= budget:
                        placed = pid
                        open_packs[0] = (pid, used + t)
                    else:
                        open_packs.clear()
                if placed is None:
                    placed = new_pack_id()
                    open_packs.append((placed, t))
                ids.append(placed); overs.append(0)
            out = pdf.copy()
            out["pack_id"] = pd.array(ids, dtype="int64")
            out["oversize"] = pd.array(overs, dtype="int32")
            yield out

    return part.mapInPandas(run, out_schema)


def pack_stats(packed: DataFrame, tokens_col: str, budget: int) -> DataFrame:
    """Per-run packing summary: pack count, mean fill, padding waste."""
    per_pack = (packed.groupBy("pack_id")
                .agg(F.sum(tokens_col).alias("tok"),
                     F.max("oversize").alias("oversize")))
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("oversize").cast("long").alias("n_oversize"),
        F.avg(F.when(F.col("oversize") == 0,
                     F.col("tok") / F.lit(float(budget)))).alias("mean_fill"),
        F.sum(F.when(F.col("oversize") == 0, F.lit(budget) - F.col("tok"))
               .otherwise(F.lit(0))).cast("long").alias("padding_tokens"))
