"""Reshape operators: pivot (long -> wide cross-tab) and melt (wide ->
long), the pandas pivot_table/melt surface re-expressed on Spark.

100 TB design: pivot with EXPLICIT pivot values compiles to Spark's
two-phase pivot — aggregate by (index, pivot col), then pivot_first by
index. Two exchanges, but BOTH carry map-side-combined aggregates (the
second moves one row per (index, pivot value), not raw data), so shuffle
volume is output-sized. Omitting the value list makes Spark run a distinct-collect
job over the pivot column first (driver-bounded at
``spark.sql.pivotMaxValues``, default 10k) — fine interactively, but
pass the list in production so the schema is static and the extra job
disappears. melt is Spark's native ``unpivot`` — a zero-shuffle
generator expansion (each input row emits len(value_vars) rows in-place,
no exchange).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_table(df: DataFrame, index: Sequence[str], column: str,
                value: str, agg: str = "sum",
                pivot_values: Optional[Sequence] = None,
                fill_value=None) -> DataFrame:
    """Cross-tab: one output row per distinct `index`, one column per
    pivot value of `column`, cells = agg(value). `pivot_values` fixes
    the output schema (and skips the distinct-scan job); `fill_value`
    replaces the NULLs of empty cells (e.g. 0 for counts)."""
    g = df.groupBy(*[F.col(c) for c in index])
    p = g.pivot(column, list(pivot_values)) if pivot_values is not None \
        else g.pivot(column)
    out = p.agg(getattr(F, agg)(value))
    if fill_value is not None:
        cells = [c for c in out.columns if c not in set(index)]
        out = out.fillna(fill_value, subset=cells)
    return out


def melt(df: DataFrame, id_vars: Sequence[str],
         value_vars: Sequence[str], var_name: str = "variable",
         value_name: str = "value") -> DataFrame:
    """Wide -> long: one output row per (input row, value_var). Narrow
    (zero-shuffle) generator expansion via Spark's native unpivot; all
    value_vars are cast to their common promoted type, as in pandas."""
    return df.unpivot([F.col(c) for c in id_vars],
                      [F.col(c) for c in value_vars],
                      var_name, value_name)
