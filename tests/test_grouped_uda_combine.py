"""Map-side combine for mergeable grouped @uda aggregates: when the
aggregator class implements merge(other), grouped aggregation folds each
input partition locally (mapInPandas) and shuffles only pickled states —
the plan that survives 3 heavy groups over 100 TB of rows."""

from __future__ import annotations

import pytest

import pixeltable_spark as pxt
from pixeltable_spark import functions as pxtf
from pixeltable_spark.plans.query import Planner


def _wavg_cls(with_merge: bool):
    if with_merge:
        @pxt.uda
        class weighted_avg:
            def __init__(self):
                self.num, self.den = 0.0, 0.0

            def update(self, price, qty):
                if price is not None and qty is not None:
                    self.num += price * qty
                    self.den += qty

            def merge(self, other):
                self.num += other.num
                self.den += other.den

            def value(self) -> float:
                return round(self.num / self.den, 4) if self.den else None
        return weighted_avg

    @pxt.uda
    class weighted_avg_nomerge:
        def __init__(self):
            self.num, self.den = 0.0, 0.0

        def update(self, price, qty):
            if price is not None and qty is not None:
                self.num += price * qty
                self.den += qty

        def value(self) -> float:
            return round(self.num / self.den, 4) if self.den else None
    return weighted_avg_nomerge


class TestMergeableGroupedUda:
    def _run(self, t, uda):
        q = (t.group_by(t.c4)
             .select(t.c4, w=uda(t.c3, t.c2), n=pxtf.count(t.c2))
             .order_by(t.c4))
        return [(r["c4"], r["w"], r["n"]) for r in q.collect()]

    def test_matches_naive_path(self, test_tbl):
        merged = self._run(test_tbl, _wavg_cls(True))
        naive = self._run(test_tbl, _wavg_cls(False))
        assert merged == naive
        assert len(merged) == 2 and all(n == 50 for _, _, n in merged)

    def test_combine_path_is_taken(self, test_tbl, monkeypatch):
        calls = []
        orig = Planner._apply_grouped_udas_mergeable

        def spy(self, *a, **kw):
            calls.append(1)
            return orig(self, *a, **kw)

        monkeypatch.setattr(Planner, "_apply_grouped_udas_mergeable", spy)
        self._run(test_tbl, _wavg_cls(True))
        assert calls, "mergeable grouped UDA did not take the combine path"
        calls.clear()
        self._run(test_tbl, _wavg_cls(False))
        assert not calls, "merge-less UDA must stay on the naive path"

    def test_null_group_keys_merge(self, test_tbl):
        t = test_tbl
        uda = _wavg_cls(True)
        q = (t.group_by(t.c1n)
             .select(t.c1n, w=uda(t.c3, t.c2))
             .order_by(t.c1n))
        rows = q.collect()
        # 10 of 100 rows have c1n NULL -> exactly one null group
        nulls = [r for r in rows if r["c1n"] is None]
        assert len(nulls) == 1
        # rows 0,10,..,90: weighted avg = sum(i*i)/sum(i)
        num = sum(float(i) * i for i in range(0, 100, 10))
        den = sum(i for i in range(0, 100, 10))
        assert nulls[0]["w"] == pytest.approx(round(num / den, 4))

    def test_flush_cap_spills_and_remerges(self, test_tbl, monkeypatch):
        import pixeltable_spark.plans.query as qp
        # cap of 1 forces a spill after every arrow batch, so every group
        # emits many partial-state rows and stage 2 must re-merge them
        monkeypatch.setattr(qp, "_UDA_COMBINE_FLUSH_AT", 1)
        merged = self._run(test_tbl, _wavg_cls(True))
        naive = self._run(test_tbl, _wavg_cls(False))
        assert merged == naive and len(merged) == 2
