"""Cross-vendor merge kernels as pure Column expressions.

The reference merges two vendors' views of the same instrument-day with a rule
dictionary ``{out_col: (dtype, kernel, kwargs)}`` applied **row by row in
Python** (``merge_data``, /root/reference tasks/merge/__init__.py:20-95; rule
tables tasks/merge/stock.py:52-66,121-169). That is O(rows × cols) interpreted
Python — the single hottest path in the reference.

Here every kernel is a Catalyst Column expression, so the whole merge is one
whole-stage-codegen projection over the joined frame: no Python in the loop,
same semantics (including the NaN/None matrix and the tolerance warning).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ok(c: Column) -> Column:
    """is_not_nan_or_none analogue (reference tasks/merge/__init__.py:14-17).

    NULL and NaN are both "missing". isnan only applies to float types;
    callers pass numeric columns here.
    """
    return c.isNotNull() & ~F.isnan(c.cast("double"))


def _clean(c: Column) -> Column:
    """Normalise NaN → NULL so coalesce treats them identically."""
    return F.when(_ok(c), c)


def prefer_left(left: Column, right: Column) -> Column:
    """Take left when present (non-null, non-NaN), else right."""
    return F.coalesce(_clean(left), _clean(right))


def prefer_right(left: Column, right: Column) -> Column:
    return F.coalesce(_clean(right), _clean(left))


def get_value(col: Column) -> Column:
    """Pass-through of a single vendor's column."""
    return col


def mean_value(left: Column, right: Column) -> Column:
    """Mean when both present, else whichever exists.

    (Reference logs a warning when |l-r| ≥ tolerance — see
    ``mean_value_warning`` below for the side-output expression.)
    """
    l, r = _clean(left), _clean(right)
    return (
        F.when(l.isNotNull() & r.isNotNull(), (l + r) / F.lit(2.0))
        .otherwise(F.coalesce(l, r))
    )


def mean_value_warning(left: Column, right: Column, tol: float) -> Column:
    """True where the two vendors disagree beyond tolerance — route to an
    audit side-output instead of a log line (reference
    tasks/merge/__init__.py:58-69, thresholds tasks/merge/stock.py:124-164)."""
    l, r = _clean(left), _clean(right)
    return l.isNotNull() & r.isNotNull() & (F.abs(l - r) >= F.lit(tol))


def max_up_or_down(left: Column, right: Column) -> Column:
    """涨跌停-label merge → {-1,0,1}; -2 both-unknown, -3 conflict.

    Reference tasks/merge/stock.py:187-227: each vendor reports a limit-move
    label; both missing → -2 ("状态不明", status unknown — distinct from 0 =
    no limit move); one missing → the other; equal → that value; both present
    and different → -3 ("状态冲突", conflict), regardless of direction.
    """
    l, r = _clean(left), _clean(right)
    return (
        F.when(l.isNull() & r.isNull(), F.lit(-2.0))
        .when(l.isNull(), r)
        .when(r.isNull(), l)
        .when(l == r, l)
        .otherwise(F.lit(-3.0))
    )


KERNELS = {
    "prefer_left": prefer_left,
    "prefer_right": prefer_right,
    "mean_value": mean_value,
    "get_value": get_value,
    "max_up_or_down": max_up_or_down,
}


def compile_merge_rules(
    joined: DataFrame,
    rules: Mapping[str, tuple[str, str, Mapping]],
    key_cols: list[Column | str] | None = None,
) -> DataFrame:
    """Compile a reference-style rule dict into one select() projection.

    ``rules``: {out_col: (dtype, kernel_name, kwargs)} where kwargs carries
    'left'/'right' (or 'col' for get_value) source column names on ``joined``.
    The whole merge becomes a single codegen'd projection — the Spark-first
    replacement for the row-wise ``merge_data`` interpreter.
    """
    cols: list[Column] = [F.col(c) if isinstance(c, str) else c
                          for c in (key_cols or [])]
    for out, (dtype, kernel, kw) in rules.items():
        fn = KERNELS[kernel]
        if kernel == "get_value":
            expr = fn(F.col(kw["col"]))
        else:
            expr = fn(F.col(kw["left"]), F.col(kw["right"]))
        cols.append(expr.cast(dtype).alias(out))
    return joined.select(*cols)
