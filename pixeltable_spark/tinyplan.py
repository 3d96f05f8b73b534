"""Scoped "tiny plan" execution mode: AQE off + a data-derived shuffle
partition count for operator sections whose intermediate volume is known
to be small.

Why: with AQE on, EVERY shuffle stage of an action materializes as its
own Spark job, with a driver replanning pass between stage jobs. That is
the right trade for wide data-dependent plans (runtime coalescing, skew
splits, join-strategy rewrites), but for operator sections that reduce a
*bounded* table — an iterative fixpoint loop over a checkpointed edge
set, model/sketch tables bounded by a vocab or register count, commit
probes over a literal batch — the runtime statistics can never change
the plan, so the per-stage job floor (measured 30-145 ms/job depending
on boot) and the replanning gaps are pure overhead. Measured on the
connected-components loop: 8-9 jobs per star round with AQE vs 1
without, identical results.

The partition count is NEVER a constant: callers derive it from the
data, e.g. the materialized partition count of an eagerly-checkpointed
frame (which was itself byte-coalesced by AQE when it materialized) or a
driver-known row count. That keeps the mode scale-adaptive — a 100 TB
dup graph's loop runs at the width its checkpoint materialized with, a
bench-scale one at 1.

Partitioning cannot change results for the sections this is applied to
(exact-key groupBy/join/distinct pipelines and global aggregates); the
oracle gate re-verifies every touched query.
"""

from __future__ import annotations

from contextlib import contextmanager

_AQE_KEY = "spark.sql.adaptive.enabled"
_SHUF_KEY = "spark.sql.shuffle.partitions"


@contextmanager
def tiny_plan(spark, nparts: int):
    """Run the enclosed plan-building AND its actions with AQE disabled
    and ``spark.sql.shuffle.partitions`` set to ``nparts`` (data-derived
    by the caller). Reentrant: nested scopes keep the outermost
    settings. Confs are restored on exit; plans built inside but
    executed after the scope are planned with the restored session
    confs (callers must materialize inside the scope when that
    matters)."""
    depth = getattr(tiny_plan, "_depth", 0)
    tiny_plan._depth = depth + 1
    saved: list[tuple[str, str | None]] = []
    if depth == 0:
        for key, val in ((_AQE_KEY, "false"),
                         (_SHUF_KEY, str(max(1, int(nparts))))):
            try:
                saved.append((key, spark.conf.get(key, None)))
                spark.conf.set(key, val)
            except Exception:  # noqa: BLE001 — conf is an optimization
                pass
    try:
        yield
    finally:
        tiny_plan._depth = depth
        for key, old in saved:
            try:
                if old is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, old)
            except Exception:  # noqa: BLE001 — restore is best-effort
                pass


def materialized_width(df) -> int:
    """Partition count of an already-materialized (checkpointed)
    DataFrame — the scale proxy handed to :func:`tiny_plan`. The frame
    was materialized under AQE, so this is the byte-coalesced width of
    the real data volume (1 at bench scale, hundreds+ at 100 TB)."""
    try:
        return max(1, df.rdd.getNumPartitions())
    except Exception:  # noqa: BLE001 — fall back to a safe small width
        return 1
