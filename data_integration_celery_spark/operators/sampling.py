"""Deterministic hash-based sampling / split assignment (training-data ops).

At 100 TB you cannot train/val split with ``df.randomSplit`` or sample with
``df.sample``: both are seed+partitioning dependent (a repartition or AQE
re-plan silently reassigns rows), and neither is reproducible across engines
or re-runs over a growing corpus. The standard fix is content hashing: a row's
split is a pure function of its id and a salt, so

- it is map-only (no shuffle, no state, survives any re-partitioning);
- re-runs and backfills agree forever (adding rows never moves old rows);
- any engine computes the same assignment (md5 is everywhere).

Mechanics: take the first 8 hex chars of ``md5(salt || ':' || id)`` and
compare lexicographically against fraction thresholds — hex(floor(f * 16^8)),
zero-padded. Lowercase-hex string comparison is equivalent to comparing the
32-bit integer prefix, and is expressible identically in Spark and any SQL
oracle, so these operators are exact-testable, not rows-only.

The reference has no sampling (it ingests everything); this is part of the
LLM-pipeline extension surface, same tier as dedup/similarity/text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8
_SPACE = 16 ** _HEX_DIGITS


def hash_bucket(id_col: Column, salt: str = "v1") -> Column:
    """First 8 hex chars of md5(salt:id) — an 8-char lowercase hex string
    uniform over [0, 16^8)."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string"))),
        1, _HEX_DIGITS)


def _threshold(cum_fraction: float) -> str:
    """Hex threshold t such that bucket < t selects ≈cum_fraction of rows."""
    edge = min(max(int(cum_fraction * _SPACE), 0), _SPACE)
    if edge == _SPACE:          # 'g' > every hex digit → selects everything
        return "g"
    return format(edge, f"0{_HEX_DIGITS}x")


def hash_sample(df: DataFrame, id_col: str, fraction: float,
                salt: str = "v1") -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen deterministically by id hash.

    Unlike ``df.sample``: stable under re-partitioning, re-runs, engine
    changes, and corpus growth (a row's fate never changes). Map-only.
    """
    return df.where(hash_bucket(F.col(id_col), salt) < _threshold(fraction))


def hash_split(df: DataFrame, id_col: str, weights: dict[str, float],
               salt: str = "v1", split_col: str = "split") -> DataFrame:
    """Assign every row to exactly one named split (train/val/test...).

    ``weights`` must sum to 1 (±1e-9); the last split absorbs rounding so the
    assignment is exhaustive and disjoint by construction. Order of dict
    entries defines the threshold ladder — keep it fixed for reproducibility.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if not weights:
        raise ValueError("at least one split required")
    b = hash_bucket(F.col(id_col), salt)
    names = list(weights)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = b < _threshold(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_hash_sample(df: DataFrame, id_col: str, strata_col: str,
                           fractions: dict[str, float],
                           default_fraction: float = 0.0,
                           salt: str = "v1") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downweight one language).

    ``df.sampleBy`` with the same portability/stability upgrade: the keep
    decision is a pure function of (id, salt), the per-stratum threshold a
    pure function of the stratum value — still map-only, no shuffle.
    """
    b = hash_bucket(F.col(id_col), salt)
    thr = F.lit(_threshold(default_fraction))
    for value, frac in fractions.items():
        thr = F.when(F.col(strata_col) == F.lit(value),
                     F.lit(_threshold(frac))).otherwise(thr)
    return df.where(b < thr)
