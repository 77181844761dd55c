"""Vendor REST/API connector pattern (SURVEY S2).

Reference: every importer loops codes on the driver, calling
``invoker.wsd(code, fields, from, to)`` with retry/backoff, buffering frames
until a flush threshold (/root/reference tasks/wind/future.py:272-378;
retry wrapper ``try_n_times`` tasks/tushare/tushare_stock_daily/stock.py:45-48).

Spark-first: the fetch-range *plan* is a DataFrame (operators.incremental.
fetch_ranges); the fetch itself runs inside ``mapInPandas`` so every executor
pulls its slice of codes concurrently — the driver loop, manual buffering and
flush thresholds all disappear (Spark owns batching and memory).

No network exists in this container, so the transport is injectable: tests
pass a deterministic fake fetcher; production passes the real HTTP client.
Retries stay *inside* the fetcher (plus spark.task.maxFailures above it).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

FetchFn = Callable[[str, object, object], pd.DataFrame]


def with_retry(fetch: FetchFn, tries: int = 5, base_sleep: float = 0.05) -> FetchFn:
    """try_n_times semantics: n attempts with linear backoff, then raise."""
    def wrapped(code, date_from, date_to):
        last = None
        for i in range(tries):
            try:
                return fetch(code, date_from, date_to)
            except Exception as exc:  # noqa: BLE001 — vendor SDKs raise anything
                last = exc
                time.sleep(min(base_sleep * (i + 1), 1.0))
        raise last
    return wrapped


def fetch_distributed(ranges: DataFrame, fetch: FetchFn, out_schema: str,
                      code_col: str = "code", from_col: str = "date_from",
                      to_col: str = "date_to") -> DataFrame:
    """Run the vendor fetch across the cluster: one call per plan row,
    Arrow-batched results unioned into a single DataFrame.

    ``ranges`` is the incremental plan (one row per code needing data).
    Repartition upstream to spread hot vendors across executors.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                got = fetch(getattr(row, code_col), getattr(row, from_col),
                            getattr(row, to_col))
                if got is not None and len(got):
                    frames.append(got)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return ranges.mapInPandas(run, out_schema)


def bisect_ranges(fetch: FetchFn, code: str, date_from, date_to,
                  step: int = 20, row_limit: int = 3000):
    """Rate-limit-aware date-range bisection (reference
    tasks/jqdata/stock/finance_report/__init__.py:35-64).

    Walk ``(date_from, date_to]`` in windows of ``step`` days (the fetcher
    contract is from-exclusive / to-inclusive, matching the reference's
    ``pub_date > from AND pub_date <= to`` — window boundaries would
    double-fetch under inclusive-from). NOTE: ``incremental.fetch_ranges``
    and ``ingest_series_catalog`` emit INCLUSIVE ``[date_from, date_to]``
    plans (date_from = watermark + 1); wrap a from-exclusive fetcher with
    ``inclusive_from`` before handing it to those planners, or the plan's
    first day is silently skipped forever. A window whose result hits
    ``row_limit`` probably got truncated by the vendor cap: re-fetch it as
    two half-step windows, recursively, until step < 2 — then yield what we
    got with ``truncated=True`` so the caller can flag the gap.

    Yields ``(frame, date_from, date_to, truncated)``. Runs *inside* the
    executor-side fetcher (see ``fetch_bisected``) so the driver never loops.
    """
    import datetime as _dt
    one_step = _dt.timedelta(days=step)
    cur = date_from
    while cur < date_to:
        nxt = min(cur + one_step, date_to)
        df = fetch(code, cur, nxt)
        n = 0 if df is None else len(df)
        if n >= row_limit and step >= 2:
            yield from bisect_ranges(fetch, code, cur, nxt, step // 2, row_limit)
        else:
            yield df, cur, nxt, n >= row_limit
        cur = nxt


def fetch_bisected(fetch: FetchFn, step: int = 20,
                   row_limit: int = 3000) -> FetchFn:
    """Wrap a capped vendor fetcher so ``fetch_distributed`` transparently
    splits ranges that exceed the vendor's row cap. Sub-frames concat in
    date order; truncated leaf windows are kept (the reference logs and
    keeps them too — completeness audits catch the gap downstream)."""
    def wrapped(code, date_from, date_to):
        frames = [df for df, _f, _t, _trunc in
                  bisect_ranges(fetch, code, date_from, date_to, step, row_limit)
                  if df is not None and len(df)]
        return pd.concat(frames, ignore_index=True) if frames else None
    return wrapped


def inclusive_from(fetch: FetchFn, granularity_days: int = 1) -> FetchFn:
    """Adapt a from-EXCLUSIVE vendor fetcher (``pub_date > from`` — the
    ``bisect_ranges`` contract) to the INCLUSIVE ``[date_from, date_to]``
    plans that ``incremental.fetch_ranges`` / ``ingest_series_catalog``
    emit (they compute ``date_from = watermark + 1 day``): shifts ``from``
    back one granularity step so the plan's first day is actually fetched.

    Without this adapter, an exclusive fetcher driven by an inclusive plan
    silently skips one day per increment — and a brand-new series' very
    first observation (date_from = inception) is never ingested, with the
    gap re-planned away forever because the next watermark starts past it.
    """
    import datetime as _dt
    delta = _dt.timedelta(days=granularity_days)

    def wrapped(code, date_from, date_to):
        return fetch(code, date_from - delta, date_to)
    return wrapped
