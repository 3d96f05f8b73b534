"""Round-11 optimization pins: the literal-list insert fast path.

A list insert whose rows render as a one-partition literal plan must
(a) skip the batch-side precheck Spark job and the rowid window
exchange while producing EXACTLY the rowids/ranges the Spark path
would, and (b) keep every constraint check (NOT NULL, intra-batch PK
dup, existing-key collision) behaviorally identical.
"""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pixeltable_spark as pxt  # noqa: E402
from pixeltable_spark import localframe  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    return pxt.get_session(app_name="pxt_test_insert_fastpath")


@pytest.fixture()
def cat(spark, tmp_path):
    return pxt.Catalog(spark, str(tmp_path / "wh"))


def _jobs(spark):
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None)
               or [])


def test_literal_insert_job_count_and_rowids(spark, cat):
    t = cat.create_table("t", {"k": pxt.Int(False), "s": pxt.String(True)},
                         primary_key=["k"], n_buckets=4)
    t.insert([{"k": i, "s": f"v{i}"} for i in range(40)])
    before = _jobs(spark)
    t.insert([{"k": 100 + i, "s": None if i % 3 else f"x{i}"}
              for i in range(25)])
    # PK probe + write — the precheck job and any rowid-window job are gone
    assert _jobs(spark) - before <= 2
    rows = t.df().orderBy("_rowid").select("_rowid", "k").collect()
    assert [r["_rowid"] for r in rows] == list(range(65))
    assert [r["k"] for r in rows] == list(range(40)) + [100 + i
                                                        for i in range(25)]


def test_precheck_local_matches_spark_ranges(spark, cat):
    t = cat.create_table("t", {"k": pxt.Int(False), "s": pxt.String(True)},
                         primary_key=["k"], n_buckets=2)
    rows = [{"k": v, "s": "x"} for v in (7, -3, 99, 42)]
    counts, ranges = t._precheck_local(rows)
    assert counts == {0: 4}
    assert ranges == [("k", ">=", -3), ("k", "<=", 99)]
    # Spark replica agrees
    from pixeltable_spark.type_system import schema_to_struct
    src = localframe.local_df(spark, rows, schema_to_struct(t.schema))
    src = src.select(*[src[c].cast(t.schema[c].spark_type())
                       for c in t.schema])
    s_counts, s_ranges = t._insert_precheck(src)
    assert sum(s_counts.values()) == 4 and s_ranges == ranges


def test_precheck_local_declines_unsafe_values(cat):
    t = cat.create_table("t", {"k": pxt.Int(False)}, primary_key=["k"])
    import numpy as np
    assert t._precheck_local([{"k": np.int64(5)}]) == (None, None)
    assert t._precheck_local([{"k": True}]) == (None, None)
    t2 = cat.create_table("t2", {"k": pxt.Float(False)}, primary_key=["k"])
    assert t2._precheck_local([{"k": 1.5}]) == (None, None)


def test_constraints_identical_on_fast_path(cat):
    t = cat.create_table("t", {"k": pxt.Int(False), "s": pxt.String(True)},
                         primary_key=["k"], n_buckets=2)
    t.insert([{"k": 1, "s": "a"}])
    with pytest.raises(ValueError, match="already exists"):
        t.insert([{"k": 1, "s": "dup"}])
    with pytest.raises(ValueError, match="duplicate primary key"):
        t.insert([{"k": 9, "s": "a"}, {"k": 9, "s": "b"}])
    with pytest.raises(ValueError, match="missing required"):
        t.insert([{"k": None, "s": "a"}])
    assert t.count() == 1


def test_string_pk_fast_path(cat):
    t = cat.create_table("t", {"k": pxt.String(False)}, primary_key=["k"])
    t.insert([{"k": "m"}, {"k": "a"}, {"k": "z"}])
    counts, ranges = t._precheck_local([{"k": "b"}, {"k": "y"}])
    assert ranges == [("k", ">=", "b"), ("k", "<=", "y")]
    with pytest.raises(ValueError, match="already exists"):
        t.insert([{"k": "z"}])
    t.insert([{"k": "q"}])
    assert t.count() == 4
