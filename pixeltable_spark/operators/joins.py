"""Join operators Spark's DataFrame API lacks natively: as-of
(point-in-time) join and range join.

Spark-first design (100 TB): the as-of join is the union-and-carry
formulation — tag both sides, union, shuffle ONCE on the `by` keys, sort
within partitions by (time, side), and carry the latest right-side row
forward with a running `last(ignorenulls)` window. That is one shuffle of
left+right (exactly what a sort-merge join would pay) with no range
explosion and no per-key skew beyond the data's own: the classic
distributed point-in-time-correct join used for feature stores and
market-data enrichment. DuckDB/kdb express the same thing as ASOF JOIN,
which is what the oracle uses.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: Optional[Sequence[str]] = None,
              right_cols: Optional[Sequence[str]] = None,
              suffix: str = "_r",
              tolerance=None) -> DataFrame:
    """Left as-of join: for every left row, attach the right row with the
    greatest ``on`` <= left.``on`` within the same ``by`` group (backward
    direction, ties included — DuckDB ``ASOF LEFT JOIN ... ON l.by = r.by
    AND l.on >= r.on`` semantics). Unmatched left rows keep nulls.

    ``right_cols`` limits the carried columns (default: all non-key
    right columns, named ``<col><suffix>`` plus ``<on><suffix>`` for the
    matched time). ``tolerance`` (seconds or a Column-compatible
    interval) drops matches older than ``on - tolerance``.

    The right side's carried values ride in ONE struct, so a right row
    whose value column is legitimately NULL still matches (null-safe —
    an ignorenulls carry of bare columns would skip it)."""
    by = list(by or [])
    if not by:
        # the running-carry window has no partition key: every row lands in
        # ONE task — fine for bounded inputs, an OOM/straggler at scale
        import warnings
        warnings.warn(
            "asof_join with no `by` keys degenerates to a single-partition "
            "global window; pass partition keys (instrument/entity id) for "
            "distributed execution", stacklevel=2)
    rvals = list(right_cols
                 or [c for c in right.columns if c not in set(by) | {on}])
    lcols = left.columns

    payload = F.struct(F.col(on).alias("__t"),
                       *[F.col(c) for c in rvals])
    r = right.select(
        *by, F.col(on).alias("__evt"), F.lit(0).alias("__is_left"),
        payload.alias("__pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in by])
    l = left.select(
        *by, F.col(on).alias("__evt"), F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__pay"].dataType).alias("__pay"),
        *[F.col(c) for c in lcols if c not in by])
    u = l.unionByName(r.select(*l.columns))

    # one shuffle on `by`; right rows sort before left rows at equal time
    # so an exactly-equal right timestamp is visible to the left row
    w = (W.partitionBy(*by) if by else W.partitionBy(F.lit(1))) \
        .orderBy(F.col("__evt").asc(), F.col("__is_left").asc()) \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    carried = F.last(F.when(F.col("__is_left") == 0, F.col("__pay")),
                     ignorenulls=True).over(w)
    out = (u.withColumn("__match", carried)
           .filter(F.col("__is_left") == 1))
    if tolerance is not None:
        tol = tolerance if not isinstance(tolerance, (int, float)) else \
            F.expr(f"INTERVAL {int(tolerance)} SECONDS")
        out = out.withColumn(
            "__match",
            F.when(F.col("__match.__t") >= F.col("__evt") - tol,
                   F.col("__match")))
    sel = ([F.col(c) for c in by]
           + [F.col("__evt").alias(on)]
           + [F.col(c) for c in lcols if c not in set(by) | {on}]
           + [F.col(f"__match.{c}").alias(c + suffix) for c in rvals]
           + [F.col("__match.__t").alias(on + suffix)])
    return out.select(*sel)


def range_join(left: DataFrame, right: DataFrame,
               left_point: str, right_lo: str, right_hi: str,
               by: Optional[Sequence[str]] = None,
               bin_width: Optional[float] = None) -> DataFrame:
    """Inner range join: left rows paired with right rows whose
    [right_lo, right_hi] interval contains left_point (plus optional
    equi-keys). Without `bin_width`, Spark would plan a broadcast/
    nested-loop theta join; with it, both sides explode to shared range
    bins so the pairing becomes an equi-join on (by..., bin) — the
    standard binned range-join trick (Databricks' range-join hint does
    the same), with exact predicate re-applied after."""
    by = list(by or [])
    if bin_width is None:
        cond = [left[left_point] >= right[right_lo],
                left[left_point] <= right[right_hi]]
        cond += [left[b] == right[b] for b in by]
        return left.join(right, cond)
    lb = left.withColumn(
        "__bin", F.floor(F.col(left_point) / F.lit(float(bin_width))))
    rb = right.withColumn(
        "__bins", F.sequence(
            F.floor(F.col(right_lo) / F.lit(float(bin_width))),
            F.floor(F.col(right_hi) / F.lit(float(bin_width)))))
    rb = rb.withColumn("__bin", F.explode("__bins")).drop("__bins")
    on = ["__bin"] + by
    joined = lb.alias("l").join(rb.alias("r"), on)
    return (joined
            .filter((F.col(f"l.{left_point}") >= F.col(f"r.{right_lo}"))
                    & (F.col(f"l.{left_point}") <= F.col(f"r.{right_hi}")))
            .drop("__bin"))


# ---------------------------------------------------------------------------
# explicit skew salting (for engines/paths where AQE's runtime skew split
# doesn't apply: streaming joins, fixed partitioning, windowed aggs)
# ---------------------------------------------------------------------------

def salted_join(left: DataFrame, right: DataFrame, on: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Hot-key-safe equi-join with EXPLICIT salting: the left side gets a
    random-but-deterministic salt (md5 of all its columns, mod n_salts),
    the right side replicates n_salts times, and the join runs on
    (key, salt) — a key holding half the table spreads over n_salts
    tasks instead of one. Result-identical to ``left.join(right, on)``
    for how in {'inner', 'left'} — the only supported modes: the right
    side is replicated n_salts times, so 'right'/'full' would emit each
    unmatched right row n_salts times and semi/anti change shape.

    AQE's runtime skew split covers the batch shuffle-join case already;
    reach for this where AQE cannot re-plan: stream-static joins, joins
    that must preserve a fixed partitioning, or engines with AQE off.
    Cost: the right side is duplicated n_salts-fold — use for
    small-to-medium right sides (dimension tables with hot keys)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated right side would duplicate unmatched right rows "
            f"{n_salts}x under right/full joins and break semi/anti shapes")
    salt = (F.pmod(F.hash(*[F.col(c) for c in left.columns]),
                   F.lit(n_salts))).alias("__salt")
    l_s = left.withColumn("__salt", salt)
    r_s = right.crossJoin(
        F.broadcast(right.sparkSession.range(n_salts)
                    .select(F.col("id").cast("int").alias("__salt"))))
    out = l_s.join(r_s, on=[l_s[on] == r_s[on],
                            l_s["__salt"] == r_s["__salt"]], how=how)
    keep = [l_s[c] for c in left.columns] + \
           [r_s[c] for c in right.columns if c != on]
    return out.select(*keep)


def salted_agg(df: DataFrame, key: str, aggs: dict,
               n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation for ALGEBRAIC aggregates: partial
    aggregate by (key, salt), then final merge by key. ``aggs`` maps
    output name -> (fn, column) with fn in sum/count/min/max.
    Result-identical to ``df.groupBy(key).agg(...)``; useful when
    map-side partial aggregation is defeated (high-cardinality
    pre-projection, re-keyed streams) and one key dominates."""
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    part_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for name, (fn, _col) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{name}: non-algebraic agg {fn!r} cannot salt")
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]),
                         F.lit(n_salts)))
    partial = salted.groupBy(key, "__salt").agg(
        *[part_fn[fn](F.col(c)).alias(name)
          for name, (fn, c) in aggs.items()])
    return partial.groupBy(key).agg(
        *[merge_fn[fn](F.col(name)).alias(name)
          for name, (fn, _c) in aggs.items()])


def blocked_fuzzy_join(left: DataFrame, right: DataFrame,
                       left_col: str, right_col: str,
                       block_left: Column, block_right: Column,
                       max_dist: int = 2,
                       how: str = "inner") -> DataFrame:
    """Record-linkage fuzzy equi-join: candidates are generated by an
    exact join on a caller-supplied BLOCKING key (country code, zip
    prefix, soundex, first-n chars...), then verified with JVM
    ``levenshtein(left_col, right_col) <= max_dist``. The classic
    blocking-and-verification shape: recall is governed by the blocking
    function (records in different blocks are never compared — that's
    the contract, not a bug), cost by the largest block's cross size.

    Output: every left column, every right column (right-side name
    collisions suffixed ``_r``), and ``edit_dist``. ``how='left'`` keeps
    unmatched left rows with NULL right columns.

    100 TB design: one equi-shuffle on the block key (AQE-splittable
    across DISTINCT keys; a single pathological block is the caller's
    blocking-granularity choice), Levenshtein entirely in whole-stage
    codegen, and the distance filter applied inside the join so
    non-matches never materialize."""
    if how not in ("inner", "left"):
        raise ValueError(f"blocked_fuzzy_join: how must be inner|left, "
                         f"got {how!r}")
    from .text import spread
    # the probe side does O(block size) levenshteins PER ROW; a few-split
    # parquet scan would run the whole battery on one core (measured 24 s
    # -> 2 s at sf0.1 on a single-file customer table)
    left = spread(left)
    l = left.withColumn("__blk", block_left)
    r = right.withColumn("__blk", block_right)
    rename = {c: f"{c}_r" if c in set(left.columns) else c
              for c in right.columns}
    r = r.select("__blk", *[F.col(c).alias(rename[c])
                            for c in right.columns])
    dist = F.levenshtein(F.col(left_col), F.col(rename[right_col]))
    out = l.join(r, on=[l["__blk"] == r["__blk"], dist <= max_dist],
                 how=how)
    return out.select(*[l[c] for c in left.columns],
                      *[F.col(rename[c]) for c in right.columns],
                      dist.alias("edit_dist"))


def interval_join(left: DataFrame, right: DataFrame,
                  left_lo: str, left_hi: str,
                  right_lo: str, right_hi: str,
                  by: Optional[Sequence[str]] = None,
                  bin_width: Optional[float] = None) -> DataFrame:
    """Inner interval-OVERLAP join: pairs where [left_lo, left_hi] and
    [right_lo, right_hi] intersect (closed ends), plus optional
    equi-keys — the genomics/temporal "overlap join" that point-in-
    interval range_join doesn't cover.

    Without `bin_width` Spark plans the theta join directly (broadcast
    nested loop — fine when one side is small). With it, BOTH sides
    explode to shared range bins and the pairing becomes an equi-join on
    (by..., bin); a pair overlapping several shared bins would emit
    once per bin, so the join keeps only the FIRST shared bin — the bin
    of max(floor(left_lo/w), floor(right_lo/w)), the later of the two
    interval starts, which both sides provably cover when the intervals
    overlap. Same emit-once projection trick as the LSH
    first-agreeing-band-wins pair join (operators/dedup.py) — no
    distinct() shuffle. Right-side name collisions are suffixed `_r`."""
    by = list(by or [])
    rename = {c: f"{c}_r" if c in set(left.columns) else c
              for c in right.columns}
    r = right.select(*[F.col(c).alias(rename[c]) for c in right.columns])
    rlo, rhi = rename[right_lo], rename[right_hi]
    overlap = [F.col(left_lo) <= F.col(rhi), F.col(rlo) <= F.col(left_hi)]
    eq = [left[b] == r[rename[b]] for b in by]
    if bin_width is None:
        out = left.join(r, on=overlap + eq)
        return out.select(*[left[c] for c in left.columns],
                          *[F.col(rename[c]) for c in right.columns])
    w = float(bin_width)
    lb = left.withColumn("__bin", F.explode(F.sequence(
        F.floor(F.col(left_lo) / w), F.floor(F.col(left_hi) / w))))
    rb = r.withColumn("__bin", F.explode(F.sequence(
        F.floor(F.col(rlo) / w), F.floor(F.col(rhi) / w))))
    first_shared = F.greatest(F.floor(F.col(left_lo) / w),
                              F.floor(F.col(rlo) / w))
    on = [lb["__bin"] == rb["__bin"]] + \
        [lb[b] == rb[rename[b]] for b in by]
    out = (lb.join(rb, on=on)
           .filter(overlap[0] & overlap[1])
           .filter(lb["__bin"] == first_shared))
    return out.select(*[lb[c] for c in left.columns],
                      *[rb[rename[c]] for c in right.columns])
