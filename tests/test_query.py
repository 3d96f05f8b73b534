"""Query-semantics tests (select/where/joins/group_by/order/limit/distinct/
sample/head/tail/count), mirroring reference tests/test_query.py:67-1260."""

from __future__ import annotations

import pytest

import pixeltable_spark as pxt
from pixeltable_spark import functions as pxtf


class TestSelectWhere:
    def test_select_rename(self, test_tbl):
        t = test_tbl
        got = t.select(t.c2, renamed=t.c3).limit(1).df()
        assert got.columns == ["c2", "renamed"]

    def test_where_pushdown_split(self, test_tbl):
        """Mixed Catalyst + Python predicates in one where()."""
        t = test_tbl
        py_pred = t.c1.apply(lambda s: int(s.rsplit(" ", 1)[1]) % 2 == 0, pxt.Bool())
        n = t.where((t.c2 < 50) & py_pred).count()
        assert n == 25

    def test_count(self, test_tbl):
        assert test_tbl.count() == 100


class TestJoins:
    def test_inner(self, orders, customer):
        q = orders.join(customer, on=orders.o_custkey == customer.c_custkey)
        assert q.count() == 1500

    def test_left(self, customer, orders):
        q = customer.join(orders, on=customer.c_custkey == orders.o_custkey, how="left")
        n_left = q.count()
        assert n_left >= 1500  # every customer row survives

    def test_semi_anti_partition(self, customer, orders):
        semi = customer.join(orders, on=customer.c_custkey == orders.o_custkey,
                             how="semi").count()
        anti = customer.join(orders, on=customer.c_custkey == orders.o_custkey,
                             how="anti").count()
        assert semi + anti == customer.count()

    def test_cross(self, spark):
        a = pxt.table_from_rows(spark, [{"x": 1}, {"x": 2}], "a")
        b = pxt.table_from_rows(spark, [{"y": 10}, {"y": 20}, {"y": 30}], "b")
        assert a.join(b, how="cross").count() == 6

    def test_join_agg_disambiguation(self, orders, customer):
        q = (
            orders.join(customer, on=orders.o_custkey == customer.c_custkey)
            .group_by(customer.c_mktsegment)
            .select(customer.c_mktsegment, n=pxtf.count(orders.o_orderkey))
        )
        got = q.collect()
        assert sum(r["n"] for r in got) == 1500


class TestGroupBy:
    def test_group_agg(self, test_tbl):
        t = test_tbl
        got = (
            t.group_by(t.c4)
            .select(t.c4, n=pxtf.count(t.c2), s=pxtf.sum(t.c3), m=pxtf.mean(t.c3))
            .order_by(t.c4)
            .collect()
        )
        assert [r["n"] for r in got] == [50, 50]
        evens = sum(float(i) for i in range(0, 100, 2))
        assert got[0]["s"] == pytest.approx(evens)

    def test_group_by_expr(self, test_tbl):
        t = test_tbl
        decade = t.c2 // 10
        got = (
            t.group_by(decade)
            .select(dec=decade, n=pxtf.count(t.c2))
            .order_by(decade)
            .collect()
        )
        assert len(got) == 10 and all(r["n"] == 10 for r in got)

    def test_global_agg(self, test_tbl):
        t = test_tbl
        got = t.select(n=pxtf.count(t.c2), s=pxtf.sum(t.c2)).collect()
        assert got[0]["n"] == 100 and got[0]["s"] == 4950

    def test_distinct(self, test_tbl):
        t = test_tbl
        assert t.select(t.c4).distinct().count() == 2

    def test_non_agg_non_group_raises(self, test_tbl):
        t = test_tbl
        with pytest.raises(ValueError, match="neither an aggregate"):
            t.group_by(t.c4).select(t.c2, n=pxtf.count(t.c2)).df()


class TestWindow:
    def test_running_sum(self, test_tbl):
        t = test_tbl
        got = (
            t.where(t.c2 < 10)
            .select(t.c2, t.c4, run=pxtf.sum(t.c3, group_by=t.c4, order_by=t.c2))
            .order_by(t.c2)
            .collect()
        )
        by_group: dict = {}
        for r in got:
            by_group.setdefault(r["c4"], 0.0)
            by_group[r["c4"]] += float(r["c2"])
            assert r["run"] == pytest.approx(by_group[r["c4"]])

    def test_row_number(self, test_tbl):
        t = test_tbl
        got = (
            t.where(t.c2 < 6)
            .select(t.c2, rn=pxtf.row_number(group_by=t.c4, order_by=t.c2))
            .order_by(t.c2).collect()
        )
        assert [r["rn"] for r in got] == [1, 1, 2, 2, 3, 3]


class TestOrderLimit:
    def test_order_desc_limit_offset(self, test_tbl):
        t = test_tbl
        got = t.select(t.c2).order_by(t.c2, asc=False).limit(3, offset=2).collect()
        assert [r["c2"] for r in got] == [97, 96, 95]

    def test_head_tail(self, test_tbl):
        t = test_tbl
        assert [r["c2"] for r in t.head(3).select(t.c2).collect()] == [0, 1, 2]
        tail = t.tail(3).select(t.c2).collect()
        assert [r["c2"] for r in tail] == [97, 98, 99]

    def test_head_rejects_order_by(self, test_tbl):
        t = test_tbl
        with pytest.raises(ValueError):
            t.order_by(t.c2).head(3)


class TestSample:
    def test_fraction_deterministic(self, lineitem):
        t = lineitem
        a = sorted(r["l_orderkey"] * 10 + r["l_linenumber"]
                   for r in t.sample(fraction=0.25, seed=5)
                   .select(t.l_orderkey, t.l_linenumber).collect())
        b = sorted(r["l_orderkey"] * 10 + r["l_linenumber"]
                   for r in t.sample(fraction=0.25, seed=5)
                   .select(t.l_orderkey, t.l_linenumber).collect())
        assert a == b
        assert 0.2 < len(a) / 6000 < 0.3

    def test_seed_changes_sample(self, lineitem):
        t = lineitem
        a = {r["l_orderkey"] for r in t.sample(fraction=0.1, seed=1)
             .select(t.l_orderkey).collect()}
        b = {r["l_orderkey"] for r in t.sample(fraction=0.1, seed=2)
             .select(t.l_orderkey).collect()}
        assert a != b

    def test_n_per_stratum(self, lineitem):
        t = lineitem
        got = (
            t.sample(n_per_stratum=7, stratify_by=[t.l_returnflag], seed=3)
            .select(t.l_returnflag).collect()
        )
        from collections import Counter
        assert all(v == 7 for v in Counter(r["l_returnflag"] for r in got).values())

    def test_global_n(self, lineitem):
        t = lineitem
        assert len(t.sample(n=50, seed=9).select(t.l_orderkey).collect()) == 50


class TestUDF:
    def test_scalar_udf(self, test_tbl):
        @pxt.udf
        def shout(s: str) -> str:
            return s.upper() + "!"

        t = test_tbl
        got = t.where(t.c2 == 2).select(v=shout(t.c1)).collect()
        assert got[0]["v"] == "TEST STRING 2!"

    def test_uda_grouped(self, test_tbl):
        @pxt.uda
        class weighted_sum:
            def __init__(self):
                self.acc = 0.0

            def update(self, v, w):
                if v is not None:
                    self.acc += v * w

            def value(self) -> float:
                return self.acc

        t = test_tbl
        got = (
            t.group_by(t.c4)
            .select(t.c4, ws=weighted_sum(t.c3, t.c2 + 1))
            .order_by(t.c4)
            .collect()
        )
        exp = {False: sum(float(i) * (i + 1) for i in range(0, 100, 2)),
               True: sum(float(i) * (i + 1) for i in range(1, 100, 2))}
        for r in got:
            assert r["ws"] == pytest.approx(exp[r["c4"]])

    def test_uda_mixed_with_native(self, test_tbl):
        @pxt.uda
        class my_max:
            def __init__(self):
                self.m = None

            def update(self, v):
                if v is not None and (self.m is None or v > self.m):
                    self.m = v

            def value(self) -> float:
                return self.m

        t = test_tbl
        got = (
            t.group_by(t.c4)
            .select(t.c4, mx=my_max(t.c3), n=pxtf.count(t.c2))
            .order_by(t.c4).collect()
        )
        assert got[0]["mx"] == 98.0 and got[1]["mx"] == 99.0
        assert got[0]["n"] == 50

    def test_uda_window_running(self, test_tbl):
        @pxt.uda
        class running_mean:
            def __init__(self):
                self.n, self.s = 0, 0.0

            def update(self, v):
                if v is not None:
                    self.n += 1
                    self.s += v

            def value(self) -> float:
                return self.s / self.n if self.n else None

        t = test_tbl
        got = (
            t.where(t.c2 < 8)
            .select(t.c2, t.c4, rm=running_mean(t.c3, group_by=t.c4, order_by=t.c2))
            .order_by(t.c2).collect()
        )
        state: dict = {}
        for r in got:
            st = state.setdefault(r["c4"], [0, 0.0])
            st[0] += 1
            st[1] += float(r["c2"])
            assert r["rm"] == pytest.approx(st[1] / st[0])


class TestHaving:
    def test_having_on_agg_output(self, test_tbl):
        from pixeltable_spark.exprs import ColumnRef
        t = test_tbl
        decade = t.c2 // 10
        q = (
            t.group_by(decade)
            .select(dec=decade, s=pxtf.sum(t.c3))
            .having(ColumnRef("s", pxt.Float()) > 500.0)
            .order_by(ColumnRef("dec", pxt.Int()))
        )
        got = q.collect()
        # decades 5..9 have sums 545..945
        assert [r["dec"] for r in got] == [5, 6, 7, 8, 9]

    def test_having_composes_with_count(self, lineitem):
        from pixeltable_spark.exprs import ColumnRef
        t = lineitem
        q = (
            t.group_by(t.l_suppkey)
            .select(t.l_suppkey, n=pxtf.count(t.l_orderkey))
            .having(ColumnRef("n", pxt.Int()) > 600)
        )
        for r in q.collect():
            assert r["n"] > 600
