"""Plan-shape guards: the optimizations the 100 TB design depends on
must be visible in the physical plan, not assumed."""

from __future__ import annotations

import pixeltable_spark as pxt

SF_DIR = "/root/testdata/sf0.001"


def _plan(q) -> str:
    df = q.df() if hasattr(q, "df") else q
    return df._jdf.queryExecution().executedPlan().toString()


class TestScanPushdown:
    def test_filter_reaches_parquet_scan(self, spark):
        t = pxt.table_from_parquet(spark, f"{SF_DIR}/lineitem.parquet")
        q = t.where(t.l_quantity > 30).select(t.l_orderkey)
        plan = _plan(q)
        assert "PushedFilters: [" in plan
        assert "l_quantity" in plan.split("PushedFilters:")[1].split("]")[0]

    def test_column_pruning_reaches_scan(self, spark):
        t = pxt.table_from_parquet(spark, f"{SF_DIR}/lineitem.parquet")
        q = t.select(t.l_orderkey, t.l_quantity)
        plan = _plan(q)
        read = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "l_orderkey" in read and "l_quantity" in read
        # the 16-column table must NOT be read wholesale for a 2-col select
        assert "l_comment" not in read and "l_shipdate" not in read

    def test_small_dim_join_broadcasts(self, spark):
        big = pxt.table_from_parquet(spark, f"{SF_DIR}/lineitem.parquet")
        dim = pxt.table_from_parquet(spark, f"{SF_DIR}/nation.parquet")
        q = big.join(dim, big.l_suppkey == dim.n_nationkey) \
               .select(big.l_orderkey, dim.n_name)
        plan = _plan(q)
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_topk_is_take_ordered(self, spark):
        t = pxt.table_from_parquet(spark, f"{SF_DIR}/lineitem.parquet")
        q = t.select(t.l_orderkey, t.l_quantity) \
             .order_by(t.l_quantity, asc=False).limit(5)
        plan = _plan(q)
        # partition-local top-k, never a global sort of the table
        assert "TakeOrderedAndProject" in plan

    def test_limit_no_order_does_not_sort(self, spark):
        t = pxt.table_from_parquet(spark, f"{SF_DIR}/lineitem.parquet")
        plan = _plan(t.select(t.l_orderkey).limit(7))
        assert "Sort " not in plan
