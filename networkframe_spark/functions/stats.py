"""Grouped distribution statistics over event/metric tables: exact and
approximate percentiles.

Scale-extension operators (no reference counterpart).  The exact path
is the oracle-checkable one; the approximate path is the 100 TB one —
same call shape, so pipelines can flip a flag when the group
cardinality makes exact sorting unreasonable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pct_alias(p: float) -> str:
    # 0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9
    return "p" + f"{p * 100:g}".replace(".", "_")


def group_percentiles(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str],
    ps: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group percentiles of ``value_col``: one row per group with a
    ``pXX`` column per requested percentile (linear interpolation at
    rank ``p*(n-1)`` — the ANSI ``percentile_cont`` definition), each
    rounded to 6 dp, plus ``n_rows``.

    ``exact=True`` uses ``F.percentile`` — a full per-group sort,
    deterministic and oracle-exact; right while groups fit an executor
    (it is still one partial/final hash aggregate, not a window).
    ``exact=False`` switches to ``F.approx_percentile`` (KLL-sketch,
    mergeable, bounded memory per group) — the only sane choice when a
    single group holds billions of rows; results are
    rank-error-bounded by ``1/accuracy``, not exact, so the oracle
    contract only covers the exact path.
    """
    keys = [by] if isinstance(by, str) else list(by)
    v = F.col(value_col).cast("double")
    fn = F.percentile if exact else (
        lambda c, p: F.approx_percentile(c, p, accuracy)
    )
    aggs = [
        F.round(fn(v, F.lit(float(p))), 6).alias(_pct_alias(p)) for p in ps
    ]
    return df.groupBy(*keys).agg(
        *aggs, F.count(F.lit(1)).alias("n_rows")
    )
