"""Expr/Query JSON serialization (reference exprs/expr.py as_dict/
from_dict, _query.py:1904-1985 Query.as_dict/from_dict): queries over
catalog tables round-trip through pure JSON and rebind by table name."""
import json

import pytest

import pixeltable_spark as pxt
from pixeltable_spark import functions as pxtf
from pixeltable_spark.exprs import Expr


@pytest.fixture()
def cat_t(spark, tmp_path):
    cat = pxt.Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("t", {"k": pxt.Int(False), "x": pxt.Int(),
                               "s": pxt.String()})
    t.insert([{"k": i, "x": i * i, "s": f"row{i}"} for i in range(10)])
    return cat, t


def _roundtrip(q, cat):
    blob = json.dumps(q.as_dict())          # must be pure JSON
    return pxt.Query.from_dict(json.loads(blob), cat)


class TestExprSerialization:
    def test_predicate_tree(self, cat_t):
        cat, t = cat_t
        r = t.ref()
        e = ((r.x > 4) & (r.s != "row9")) | r.k.isin([1, 2])
        e2 = Expr.from_dict(json.loads(json.dumps(e.as_dict())), r)
        q1 = sorted(row["k"] for row in r.where(e).select(r.k).collect())
        q2 = sorted(row["k"] for row in r.where(e2).select(r.k).collect())
        assert q1 == q2 and len(q1) > 0

    def test_function_by_registry_path(self, cat_t):
        cat, t = cat_t
        r = t.ref()
        e = pxtf.math.round(r.x / 7.0, digits=2)
        d = e.as_dict()
        assert json.dumps(d)
        e2 = Expr.from_dict(d, r)
        a = [row["v"] for row in r.select(v=e).order_by(r.k).collect()]
        b = [row["v"] for row in r.select(v=e2).order_by(r.k).collect()]
        assert a == b

    def test_unserializable_callable_refuses(self, cat_t):
        cat, t = cat_t
        with pytest.raises(ValueError, match="not serializable"):
            t.ref().s.apply(lambda x: x).as_dict()


class TestQuerySerialization:
    def test_full_clause_roundtrip(self, cat_t):
        cat, t = cat_t
        r = t.ref()
        q = (r.where(r.x > 4).select(r.k, d=r.x * 2, up=r.s.upper())
             .order_by(r.k).limit(4))
        assert _roundtrip(q, cat).collect() == q.collect()

    def test_agg_groupby_roundtrip(self, cat_t):
        cat, t = cat_t
        r = t.ref()
        q = (r.group_by(r.x % 3)
             .select(g=r.x % 3, n=pxtf.count(r.k), tot=pxtf.sum(r.x)))
        a = sorted(map(tuple, (row.values() for row in q.collect())))
        b = sorted(map(tuple,
                       (row.values()
                        for row in _roundtrip(q, cat).collect())))
        assert a == b

    def test_sample_roundtrip_deterministic(self, cat_t):
        cat, t = cat_t
        r = t.ref()
        q = r.sample(fraction=0.5, seed=42).select(r.k)
        assert _roundtrip(q, cat).collect() == q.collect()

    def test_join_roundtrip(self, cat_t):
        cat, t = cat_t
        u = cat.create_table("u", {"k": pxt.Int(False), "y": pxt.Int()})
        u.insert([{"k": i, "y": 10 * i} for i in range(5)])
        r, ru = t.ref(), u.ref()
        q = (r.join(ru, on="k").select(r.k, ru.y).order_by(r.k))
        assert _roundtrip(q, cat).collect() == q.collect()

    def test_pinned_version_rebinds(self, cat_t):
        cat, t = cat_t
        t.insert([{"k": 100, "x": 0, "s": "late"}])     # v2
        r1 = t.ref(version=1)
        q = r1.select(r1.k).order_by(r1.k)
        got = _roundtrip(q, cat).collect()
        assert len(got) == 10 and got[-1]["k"] == 9     # v1 rows only

    def test_free_ref_refuses(self, spark, cat_t):
        cat, _t = cat_t
        free = pxt.table_from_parquet(
            spark, "/root/testdata/sf0.001/nation.parquet")
        with pytest.raises(ValueError, match="catalog tables"):
            free.select(free.n_name).as_dict()

    def test_window_function_roundtrip(self, cat_t):
        cat, t = cat_t
        r = t.ref()
        q = r.select(r.k, run=pxtf.sum(r.x, group_by=r.x % 2,
                                       order_by=[r.k])).order_by(r.k)
        assert _roundtrip(q, cat).collect() == q.collect()
