"""Deterministic finance-domain fixtures (FIXTURES.md shapes).

The driver supplies TPC-H-ish tables; these generators add the domain-shaped
inputs the reference actually processes — vendor daily md with disagreements
and NULLs, futures contracts with CZC 3-digit codes, a trading calendar —
so the merge/continuous/audit pipelines are exercised on realistic keys.
Seeded random → stable across runs.
"""

from __future__ import annotations

import datetime as dt
import random


def trading_calendar(spark, start="2020-01-01", end="2020-03-31"):
    d0 = dt.date.fromisoformat(start)
    d1 = dt.date.fromisoformat(end)
    rows = []
    d = d0
    while d <= d1:
        rows.append(("SSE", d, 1 if d.weekday() < 5 else 0))
        d += dt.timedelta(days=1)
    return spark.createDataFrame(rows, "exchange string, cal_date date, is_open int")


def vendor_daily(spark, vendor: str, n_codes=6, n_days=40, seed=7,
                 disagree_pct=0.05, null_pct=0.02):
    """One vendor's view of stock daily md. Two vendors built with the same
    seed agree except on ``disagree_pct`` of closes (shifted by >tolerance)
    and each drops a disjoint slice of rows (vendor outages)."""
    rnd = random.Random(seed)  # same seed across vendors → comparable truth
    codes = [f"60000{i}.SH" for i in range(n_codes)]
    base = dt.date(2020, 1, 1)
    rows = []
    vshift = 0 if vendor == "A" else 1
    for ci, code in enumerate(codes):
        px = 10.0 + ci
        for day in range(n_days):
            d = base + dt.timedelta(days=day)
            if d.weekday() >= 5:
                continue
            px *= 1.0 + rnd.uniform(-0.02, 0.02)
            close = round(px, 2)
            r = rnd.random()
            if r < null_pct:
                close = None
            elif r < null_pct + disagree_pct and vendor == "B":
                close = round(close * 1.5, 2)  # beyond any tolerance
            # disjoint outage slices: A misses day%17==vshift... B the other
            if (day + ci) % 17 == (0 if vendor == "A" else 1):
                continue
            rows.append((code, d, close, float(1000 + day)))
    return spark.createDataFrame(
        rows, "code string, trade_date date, close double, vol double")


def future_daily(spark, seed=11, n_days=60):
    """Futures daily md across contracts incl. CZC 3-digit codes; volume
    migrates from near to far contracts over time (forces main switches)."""
    rnd = random.Random(seed)
    by_type = {"RB": ["RB2001.SHF", "RB2005.SHF", "RB2010.SHF"],
               "SR": ["SR001.CZC", "SR005.CZC"]}
    base = dt.date(2019, 10, 1)
    rows = []
    for day in range(n_days):
        d = base + dt.timedelta(days=day)
        if d.weekday() >= 5:
            continue
        for chain in by_type.values():
            # volume peak travels across the type's own contract chain
            peak = day / float(n_days) * (len(chain) - 1)
            for i, code in enumerate(chain):
                vol = max(5.0, 1000.0 * (1.0 - abs(i - peak)) + rnd.uniform(0, 50))
                close = round(3500 + 10 * i + rnd.uniform(-30, 30), 1)
                rows.append((code, d, float(round(vol)), close))
    return spark.createDataFrame(
        rows, "code string, trade_date date, vol double, close double")
