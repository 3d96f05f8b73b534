"""Dataset profiling: per-column statistics in ONE pass over the table.

The 100 TB workflow before any curation decision is "what does this
corpus look like": row counts, null rates, cardinalities, value ranges,
quantiles. The reference exposes per-column metadata through
``Table.describe()`` / column stats (reference catalog/table.py), but has
no distributed profiler; this is the Spark-first analog.

Two modes:

* ``exact=True`` — exact distinct counts (count(distinct)) and exact
  interpolated percentiles (``percentile``, the quantile_cont formula),
  bit-reproducible by the DuckDB oracle. One wide aggregate; Catalyst
  plans the distinct-counts via expand, so cost grows with the number of
  profiled columns — right for a correctness gate or a sampled profile.
* ``exact=False`` — the scale path: HyperLogLog++ distinct
  (``approx_count_distinct``) and KLL-sketch quantiles
  (``percentile_approx``). Single pass, map-side partials, no expand;
  this is what you run on the full 100 TB corpus.

Output is long-format — one row per (column, statistic) — so the result
schema is stable no matter which columns are profiled.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "float",
                    "double", "decimal")


def profile_table(df: DataFrame, cols: Sequence[str] | None = None,
                  percentiles: Sequence[float] = (0.25, 0.5, 0.75),
                  exact: bool = True,
                  accuracy: int = 10_000) -> DataFrame:
    """Profile ``cols`` (default: every numeric column): one output row
    per (column, stat) with stats n, n_null, n_distinct, min, max, mean,
    p<q> for each requested percentile. All values are doubles; the
    single wide aggregate means one job / one shuffle-free reduction
    however many columns are profiled."""
    if cols is None:
        cols = [f.name for f in df.schema.fields
                if f.dataType.simpleString().startswith(NUMERIC_PREFIXES)]
    aggs = []
    stats: list[tuple[str, str]] = []

    def add(col: str, stat: str, expr) -> None:
        aggs.append(expr.cast("double").alias(f"{col}__{stat}"))
        stats.append((col, stat))

    for c in cols:
        x = F.col(c)
        add(c, "n", F.count(x))
        add(c, "n_null", F.count(F.when(x.isNull(), 1)))
        if exact:
            add(c, "n_distinct", F.count_distinct(x))
        else:
            add(c, "n_distinct", F.approx_count_distinct(x))
        add(c, "min", F.min(x))
        add(c, "max", F.max(x))
        add(c, "mean", F.avg(x))
        for p in percentiles:
            tag = f"p{int(round(p * 100)):02d}"
            if exact:
                add(c, tag, F.percentile(x, F.lit(float(p))))
            else:
                add(c, tag, F.percentile_approx(x, F.lit(float(p)),
                                                F.lit(accuracy)))
    wide = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(c).alias("col_name"), F.lit(s).alias("stat"),
                 F.col(f"{c}__{s}").alias("value"))
        for c, s in stats
    ])
    return (wide.select(F.explode(pairs).alias("ps"))
            .select("ps.col_name", "ps.stat", "ps.value"))
