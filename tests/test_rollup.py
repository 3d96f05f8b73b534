"""Incrementally-maintained aggregate rollups (catalog.py Rollup /
create_rollup — the continuous-aggregate design): one row per group,
only delta-affected groups recomputed per base commit, MVCC-versioned
like views."""
import pytest
from pyspark.sql import functions as F

import pixeltable_spark as pxt
from pixeltable_spark.exceptions import Error, NotFoundError


@pytest.fixture()
def cat(spark, tmp_path):
    return pxt.Catalog(spark, str(tmp_path / "wh"))


def _mk(cat, n=100, groups=5):
    t = cat.create_table("t", {"g": pxt.String(True),
                               "v": pxt.Float(True)}, n_buckets=4)
    t.insert([{"g": f"g{i % groups}", "v": float(i)} for i in range(n)])
    r = cat.create_rollup("r", t, ["g"], {
        "n": ("count", None), "s": ("sum", "v"),
        "mx": ("max", "v"), "nd": ("count_distinct", "v")})
    return t, r


def _scratch(t):
    return sorted(
        (row["g"], row["n"], row["s"], row["mx"], row["nd"])
        for row in t.df().groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.max("v").alias("mx"),
            F.countDistinct("v").alias("nd")).collect())


def _state(r, version=None):
    df = r.df(version) if version is not None else r.df()
    return sorted((row["g"], row["n"], row["s"], row["mx"], row["nd"])
                  for row in df.collect())


class TestRollupMaintenance:
    def test_matches_scratch_through_mutations(self, cat):
        t, r = _mk(cat)
        assert _state(r) == _scratch(t)
        # insert: existing + brand-new group
        t.insert([{"g": "g1", "v": 999.0}, {"g": "new", "v": 7.0}])
        assert _state(r) == _scratch(t)
        # update that MOVES rows between groups (old key must shrink)
        t.update({"g": "moved"}, where=t.ref().g == "g2")
        assert _state(r) == _scratch(t)
        # delete a whole group (rows vanish, group disappears)
        t.delete(t.ref().g == "g3")
        assert _state(r) == _scratch(t)
        # delete part of a group
        t.delete(t.ref().v < 10.0)
        assert _state(r) == _scratch(t)

    def test_incremental_is_group_scoped(self, cat, spark):
        """The maintenance plan rewrites only the files holding the
        affected groups: an update touching one group leaves the other
        groups' rollup rows at their old version interval."""
        t, r = _mk(cat, n=100, groups=5)
        v_before = r.version
        t.update({"v": 12345.0}, where=t.ref().g == "g0")
        raw = r._read_current_raw()
        live = raw.filter(F.col("_vv_max") > r.version) \
                  .select("g", "_vv_min").collect()
        vmin = {row["g"]: row["_vv_min"] for row in live}
        assert vmin["g0"] == v_before + 1        # recomputed
        assert all(v <= v_before for g, v in vmin.items() if g != "g0")

    def test_time_travel_and_version_bump(self, cat):
        t, r = _mk(cat)
        v1 = _state(r)
        t.insert([{"g": "g0", "v": 1.5}])
        assert _state(r, 1) == v1            # rollup itself time-travels
        assert r.version == 2

    def test_count_distinct_no_retraction_algebra(self, cat):
        """count_distinct is the agg partial-merge schemes can't
        retract — the recompute-affected-groups design handles it."""
        t, r = _mk(cat)
        t.insert([{"g": "g0", "v": 0.0}])   # duplicate value: nd stays
        assert _state(r) == _scratch(t)
        t.delete((t.ref().g == "g0") & (t.ref().v == 0.0))
        assert _state(r) == _scratch(t)

    def test_persistence_and_catchup(self, cat, spark, tmp_path):
        t, r = _mk(cat)
        want = _state(r)
        # reload: rollup comes back with spec intact
        cat2 = pxt.Catalog(spark, str(tmp_path / "wh"))
        r2 = cat2.get_table("r")
        assert r2.group_cols == ["g"] and _state(r2) == want
        # base advanced through a handle that never loaded the rollup:
        # the next load catches the materialization up
        t2 = cat2.get_table("t")
        t2.insert([{"g": "late", "v": 3.0}])
        cat3 = pxt.Catalog(spark, str(tmp_path / "wh"))
        r3 = cat3.get_table("r")
        assert ("late", 1, 3.0, 3.0, 1) in _state(r3)

    def test_validation(self, cat):
        t = cat.create_table("tv", {"g": pxt.String(True)})
        with pytest.raises(NotFoundError, match="group column"):
            cat.create_rollup("x", t, ["nope"], {"n": ("count", None)})
        with pytest.raises(ValueError, match="unknown aggregate"):
            cat.create_rollup("x", t, ["g"], {"n": ("mode", "g")})
        with pytest.raises(NotFoundError, match="agg column"):
            cat.create_rollup("x", t, ["g"], {"n": ("sum", "zz")})
        v = cat.create_view("vv", t)
        r = cat.create_rollup("rv0", v, ["g"], {"n": ("count", None)})
        with pytest.raises(Error, match="rollups over rollups"):
            cat.create_rollup("x", r, ["g"], {"n": ("count", None)})
        with pytest.raises(NotFoundError, match="group column"):
            cat.create_rollup("x", v, ["zz"], {"n": ("count", None)})

    def test_multi_column_groups(self, cat):
        t = cat.create_table("tm", {"a": pxt.String(True),
                                    "b": pxt.Int(True),
                                    "v": pxt.Float(True)}, n_buckets=2)
        t.insert([{"a": f"a{i % 3}", "b": i % 2, "v": float(i)}
                  for i in range(60)])
        r = cat.create_rollup("rm", t, ["a", "b"],
                              {"n": ("count", None), "s": ("sum", "v")})
        t.update({"b": 5}, where=t.ref().a == "a1")
        got = sorted((row["a"], row["b"], row["n"], row["s"])
                     for row in r.df().collect())
        want = sorted((row["a"], row["b"], row["n"], row["s"])
                      for row in t.df().groupBy("a", "b").agg(
                          F.count(F.lit(1)).alias("n"),
                          F.sum("v").alias("s")).collect())
        assert got == want


class TestRollupSchemaInterplay:
    def test_drop_rename_of_referenced_columns_refuse(self, cat):
        t, r = _mk(cat)
        with pytest.raises(ValueError, match="referenced by views"):
            t.drop_column("g")          # group key
        with pytest.raises(ValueError, match="referenced by views"):
            t.drop_column("v")          # aggregate input
        with pytest.raises(ValueError, match="referenced by views"):
            t.rename_column("g", "grp")

    def test_base_revert_refreshes_rollup(self, cat):
        t, r = _mk(cat)
        before = _state(r)
        t.insert([{"g": "x", "v": 1.0}])
        assert _state(r) != before
        t.revert()
        assert _state(r) == _scratch(t) == before


class TestRollupExtras:
    def test_median_agg(self, cat):
        t = cat.create_table("tmed", {"g": pxt.String(True),
                                      "v": pxt.Float(True)}, n_buckets=2)
        t.insert([{"g": f"g{i % 2}", "v": float(i)} for i in range(21)])
        r = cat.create_rollup("rmed", t, ["g"], {"md": ("median", "v")})
        t.delete(t.ref().v >= 15.0)
        got = {row["g"]: row["md"] for row in r.df().collect()}
        want = {row["g"]: row["md"] for row in
                t.df().groupBy("g").agg(F.median("v").alias("md"))
                .collect()}
        assert got == want

    def test_streaming_ingest_maintains_rollup(self, cat, spark, tmp_path):
        """Exactly-once streaming ingest (incremental_ingest) flows
        through Table.insert, so attached rollups maintain per
        micro-batch with no extra wiring."""
        from pyspark.sql import types as T

        from pixeltable_spark.streaming import (incremental_ingest,
                                                stream_from_directory)
        t = cat.create_table("ts", {"g": pxt.String(True),
                                    "v": pxt.Float(True)}, n_buckets=2)
        t.insert([{"g": "a", "v": 1.0}])
        r = cat.create_rollup("rs", t, ["g"], {"n": ("count", None),
                                               "s": ("sum", "v")})
        landing = str(tmp_path / "landing")
        schema = T.StructType([T.StructField("g", T.StringType()),
                               T.StructField("v", T.DoubleType())])
        for i, rows in enumerate([[("a", 2.0), ("b", 3.0)],
                                  [("b", 4.0)]]):
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.mode("append").parquet(landing)
        src = stream_from_directory(spark, landing, schema,
                                    options={"maxFilesPerTrigger": "1"})
        q = incremental_ingest(src, t,
                               checkpoint_dir=str(tmp_path / "ckpt"))
        q.awaitTermination()
        got = sorted((row["g"], row["n"], row["s"])
                     for row in r.df().collect())
        assert got == [("a", 2, 3.0), ("b", 2, 7.0)]


class TestRollupOverView:
    def test_view_base_incremental(self, cat):
        """Rollup over a PREDICATE VIEW: base mutations propagate
        table -> view (row-wise incremental) -> rollup (group
        incremental), and the rollup equals a from-scratch aggregation
        of the view at every step."""
        t = cat.create_table("tb", {"g": pxt.String(True),
                                    "v": pxt.Float(True)}, n_buckets=2)
        t.insert([{"g": f"g{i % 4}", "v": float(i)} for i in range(80)])
        view = cat.create_view("big", t, predicate=t.ref().v >= 10.0)
        r = cat.create_rollup("rv", view, ["g"],
                              {"n": ("count", None), "s": ("sum", "v")})

        def scratch():
            return sorted((row["g"], row["n"], row["s"]) for row in
                          view.df().groupBy("g").agg(
                              F.count(F.lit(1)).alias("n"),
                              F.sum("v").alias("s")).collect())

        def state():
            return sorted((row["g"], row["n"], row["s"])
                          for row in r.df().collect())

        assert state() == scratch()
        t.insert([{"g": "g0", "v": 100.0}, {"g": "new", "v": 50.0},
                  {"g": "tiny", "v": 1.0}])   # 'tiny' filtered out
        assert state() == scratch()
        # update that moves rows ACROSS the predicate boundary
        t.update({"v": 5.0}, where=t.ref().g == "g1")
        assert state() == scratch()
        t.delete(t.ref().g == "g2")
        assert state() == scratch()
