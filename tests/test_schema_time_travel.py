"""Versioned schema: metadata-only drop_column, schema-true time travel,
and revert() restoring dropped columns (reference keeps a versioned
schema in its catalog — catalog/table_version.py bump_schema_version,
868-880 drop; Delta/Iceberg analog: drop column = metadata change,
reader schema keeps resolving retired physicals)."""
import pytest

import pixeltable_spark as pxt
from pixeltable_spark.exceptions import NotFoundError


@pytest.fixture()
def t(spark, tmp_path):
    cat = pxt.Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("t", {"k": pxt.Int(False), "x": pxt.Int()})
    t.insert([{"k": 1, "x": 10}, {"k": 2, "x": 20}])   # v1
    return cat, t


def _rows(df):
    return sorted(tuple(sorted(r.asDict().items())) for r in df.collect())


class TestSchemaTimeTravel:
    def test_added_column_absent_before_add(self, t):
        cat, t = t
        t.add_column("y", pxt.Int())                   # v2
        assert [f.name for f in t.user_df(version=1).schema.fields] \
            == ["k", "x"]
        assert "y" in [f.name for f in t.user_df(version=2).schema.fields]

    def test_dropped_column_visible_at_old_versions(self, t):
        cat, t = t
        t.add_column("y", pxt.Int())                   # v2
        t.insert([{"k": 3, "x": 30, "y": 300}])        # v3
        t.drop_column("y")                             # v4, metadata-only
        assert t.columns() == ["k", "x"]
        old = {r["k"]: r["y"] for r in t.user_df(version=3).collect()}
        assert old[3] == 300 and old[1] is None
        # current reads have no y at all
        assert "y" not in [f.name for f in t.user_df().schema.fields]

    def test_drop_is_metadata_only(self, t):
        cat, t = t
        t.add_column("y", pxt.Int())
        files_before = sorted(t._current_files())
        t.drop_column("y")
        assert sorted(t._current_files()) == files_before  # no rewrite

    def test_revert_restores_dropped_plain_column(self, t):
        cat, t = t
        t.add_column("y", pxt.Int())                   # v2
        t.update({"y": 7}, where=t.ref().k == 1)       # v3
        t.drop_column("y")                             # v4
        t.revert()                                     # v3 again
        assert t.columns() == ["k", "x", "y"]
        vals = {r["k"]: r["y"] for r in t.collect()}
        assert vals[1] == 7 and vals[2] is None

    def test_revert_restores_computed_column_def(self, t):
        cat, t = t
        t.add_computed_column("c", t.ref().x * 2)      # v2
        t.drop_column("c")                             # v3
        t.revert()                                     # v2
        assert "c" in t.columns()
        t.insert([{"k": 9, "x": 90}])                  # def must still run
        vals = {r["k"]: r["c"] for r in t.collect()}
        assert vals[9] == 180 and vals[1] == 20

    def test_revert_of_add_retires_column(self, t):
        cat, t = t
        t.add_column("y", pxt.Int())                   # v2
        t.revert()                                     # v1: y gone
        assert t.columns() == ["k", "x"]
        with pytest.raises(Exception):
            _ = t.ref().y

    def test_drop_then_readd_new_type(self, t):
        cat, t = t
        t.add_column("y", pxt.Int())                   # v2
        t.update({"y": 5})                             # v3
        vold = t.version
        t.drop_column("y")                             # v4
        t.add_column("y", pxt.String())                # v5, exhumed
        t.update({"y": "new"})                         # v6
        assert {r["y"] for r in t.collect()} == {"new"}
        # the OLD incarnation's values survive at the old version
        assert {r["y"] for r in t.user_df(version=vold).collect()} == {5}

    def test_persistence_across_reload(self, t, spark, tmp_path):
        cat, t = t
        t.add_column("y", pxt.Int())
        t.update({"y": 42})
        vold = t.version
        t.drop_column("y")
        t2 = pxt.Catalog(spark, str(tmp_path / "wh")).get_table("t")
        assert t2.columns() == ["k", "x"]
        assert {r["y"] for r in t2.user_df(version=vold).collect()} == {42}
        t2.revert()
        assert "y" in t2.columns()

    def test_ref_version_binds_old_schema(self, t):
        cat, t = t
        t.add_column("y", pxt.Int())                   # v2
        r1 = t.ref(version=1)
        assert "y" not in r1.column_names()
        with pytest.raises(AttributeError):
            _ = r1.y
        r2 = t.ref(version=2)
        got = r2.select(r2.k, r2.y).collect()
        assert len(got) == 2

    def test_invalid_version_still_raises(self, t):
        cat, t = t
        with pytest.raises(NotFoundError):
            t.user_df(version=99)

    def test_rename_keeps_history_resolvable(self, t):
        cat, t = t
        t.rename_column("x", "z")                      # v2 (rewrite)
        # old version shows the OLD logical name, same values
        old = t.user_df(version=1)
        assert [f.name for f in old.schema.fields] == ["k", "x"]
        assert {r["x"] for r in old.collect()} == {10, 20}
        assert {r["z"] for r in t.collect()} == {10, 20}

    def test_alter_column_type_history(self, t):
        cat, t = t
        t.alter_column("x", pxt.Float())               # v2
        t.update({"x": 7.5}, where=t.ref().k == 1)     # v3
        old = {r["k"]: r["x"] for r in t.user_df(version=1).collect()}
        assert old[1] == 10 and isinstance(old[1], int)  # int AS OF v1
        new = {r["k"]: r["x"] for r in t.collect()}
        assert new[1] == 7.5

    def test_drop_of_view_referenced_column_refuses(self, t):
        cat, t = t
        cat.create_view("v", t, predicate=t.ref().x > 1)
        with pytest.raises(ValueError, match="referenced by views"):
            t.drop_column("x")

    def test_mutations_after_drop_keep_retired_values(self, t):
        cat, t = t
        t.add_column("y", pxt.Int())                   # v2
        t.update({"y": 1}, where=t.ref().k == 1)       # v3
        vpre = t.version
        t.drop_column("y")                             # v4
        # a post-drop rewrite of the files must not lose retired data
        t.update({"x": 99}, where=t.ref().k == 1)      # v5 rewrites file
        old = {r["k"]: r["y"] for r in t.user_df(version=vpre).collect()}
        assert old[1] == 1


class TestSchemaCrashSafety:
    """Schema ops are METADATA-ONLY (Delta column-mapping design): the
    exhume/restore alias moves live purely in phys_map + the alias-keyed
    maps, so a crash before the meta save simply means the op never
    happened — no files were touched, nothing to reconcile."""

    def test_crash_after_exhume_before_meta_save_is_a_noop(self, spark,
                                                           tmp_path):
        wh = str(tmp_path / "wh")
        cat = pxt.Catalog(spark, wh)
        t = cat.create_table("t", {"k": pxt.Int(False), "y": pxt.Int()})
        t.insert([{"k": 1, "y": 42}])
        vold = t.version
        t.drop_column("y")                    # retired under alias 'y'
        # simulate: the exhume runs, then the writer dies before any
        # meta save (add_column never completes). Exhume is metadata-only
        # now, so NOTHING became durable — the reload shows the
        # pre-exhume state, consistent.
        t._exhume_if_retired("y")
        t2 = pxt.Catalog(spark, wh).get_table("t")
        assert "y" in t2.retired              # exhume never landed
        assert {r["y"] for r in t2.user_df(version=vold).collect()} \
            == {42}
        # the re-add runs its own exhume and completes cleanly
        t2.add_column("y", pxt.String())
        t2.update({"y": "new"})
        assert {r["y"] for r in t2.collect()} == {"new"}
        assert {r["y"] for r in t2.user_df(version=vold).collect()} \
            == {42}

    def test_metadata_only_revert_crash_reconciles(self, spark, tmp_path,
                                                    monkeypatch):
        """Schema-only reverts COMMIT through the store before the meta
        save (round 10; Delta: schema changes are log actions) — a
        crash after the commit point reconciles to the REVERTED state
        on reload, exactly like any crashed data commit."""
        wh = str(tmp_path / "wh")
        cat = pxt.Catalog(spark, wh)
        t = cat.create_table("t", {"k": pxt.Int(False), "y": pxt.Int()})
        t.insert([{"k": 1, "y": 42}])         # v1
        t.drop_column("y")                    # v2 (metadata-only)
        monkeypatch.setattr(type(t), "_save_meta",
                            lambda self: (_ for _ in ()).throw(
                                RuntimeError("crash")))
        with pytest.raises(RuntimeError):
            t.revert()                        # v2 -> v1, pure metadata
        t2 = pxt.Catalog(spark, wh).get_table("t")
        assert t2.version == 1                # commit point won
        assert t2.columns() == ["k", "y"]     # y restored
        assert {r["y"] for r in t2.collect()} == {42}

    def test_crash_mid_mangled_restore_reconciles(self, spark, tmp_path,
                                                  monkeypatch):
        """The mangled restore (revert past a drop-then-re-add) is
        metadata-only AND commits through the store (round 10): a crash
        after the commit point reconciles to the reverted state on
        reload — the commit is the commit point, not the meta save."""
        wh = str(tmp_path / "wh")
        cat = pxt.Catalog(spark, wh)
        t = cat.create_table("t", {"k": pxt.Int(False), "y": pxt.Int()})
        t.insert([{"k": 1, "y": 42}])         # v1
        t.drop_column("y")                    # v2 (y retired)
        t.add_column("y", pxt.String())       # v3 (exhume: y -> y__v2)
        t.revert()                            # v2: string y retired
        orig = type(t)._save_meta

        def boom(self):
            raise RuntimeError("crash before meta save")

        monkeypatch.setattr(type(t), "_save_meta", boom)
        with pytest.raises(RuntimeError):
            t.revert()                        # v1: mangled restore runs
        monkeypatch.setattr(type(t), "_save_meta", orig)
        t2 = pxt.Catalog(spark, wh).get_table("t")
        assert t2.version == 1                # commit point won
        assert t2.columns() == ["k", "y"]     # int y restored
        assert {r["y"] for r in t2.collect()} == {42}
        # the rewound table stays fully usable
        t2.update({"y": 43})
        assert {r["y"] for r in t2.collect()} == {43}


class TestColumnMapping:
    """Delta-style column-ID mapping (catalog.py phys_map): rename and
    drop-then-re-add are METADATA-ONLY — no data file is rewritten at
    any table size (the reference gets this free from Postgres,
    catalog/table.py:221-459)."""

    def test_rename_is_metadata_only(self, t):
        cat, t = t
        files_before = sorted(t._current_files())
        t.rename_column("x", "z")
        assert sorted(t._current_files()) == files_before  # no rewrite
        assert {r["z"] for r in t.collect()} == {10, 20}

    def test_drop_readd_is_metadata_only(self, t):
        cat, t = t
        t.add_column("y", pxt.Int())                   # v2
        t.update({"y": 5})                             # v3
        vold = t.version
        files_before = sorted(t._current_files())
        t.drop_column("y")                             # v4, metadata-only
        t.add_column("y", pxt.String())                # v5, exhume: no rewrite
        assert sorted(t._current_files()) == files_before
        # new incarnation reads NULL (no backfill), old one time-travels
        assert {r["y"] for r in t.collect()} == {None}
        assert {r["y"] for r in t.user_df(version=vold).collect()} == {5}

    def test_rename_survives_reload_and_mutation(self, t, spark, tmp_path):
        cat, t = t
        t.rename_column("x", "z")
        t2 = pxt.Catalog(spark, str(tmp_path / "wh")).get_table("t")
        assert t2.columns() == ["k", "z"]
        t2.update({"z": 99}, where=t2.ref().k == 1)    # COW rewrite
        vals = {r["k"]: r["z"] for r in t2.collect()}
        assert vals[1] == 99 and vals[2] == 20
        # time travel across the rename still shows the OLD logical name
        old = t2.user_df(version=1)
        assert [f.name for f in old.schema.fields] == ["k", "x"]
        assert {r["x"] for r in old.collect()} == {10, 20}

    def test_rename_then_insert_then_rename_back(self, t):
        cat, t = t
        t.rename_column("x", "z")
        t.insert([{"k": 3, "z": 30}])
        t.rename_column("z", "x")                      # round trip
        assert t.phys_map == {}                        # identity pruned
        assert {r["x"] for r in t.collect()} == {10, 20, 30}

    def test_rename_swap(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "whsw"))
        t = cat.create_table("s", {"a": pxt.Int(), "b": pxt.Int()})
        t.insert([{"a": 1, "b": 100}])
        t.rename_column("a", "tmp")
        t.rename_column("b", "a")
        t.rename_column("tmp", "b")                    # a<->b swapped
        r = t.collect()[0]
        assert r["a"] == 100 and r["b"] == 1
        t.insert([{"a": 200, "b": 2}])
        got = sorted((r["a"], r["b"]) for r in t.collect())
        assert got == [(100, 1), (200, 2)]

    def test_rename_computed_column(self, t):
        cat, t = t
        t.add_computed_column("c", t.ref().x * 2)
        files_before = sorted(t._current_files())
        t.rename_column("c", "doubled")
        assert sorted(t._current_files()) == files_before
        assert {r["doubled"] for r in t.collect()} == {20, 40}
        t.insert([{"k": 5, "x": 50}])                  # def still runs
        vals = {r["k"]: r["doubled"] for r in t.collect()}
        assert vals[5] == 100

    def test_readd_then_write_both_incarnations_resolve(self, t):
        cat, t = t
        t.add_column("y", pxt.Int())
        t.update({"y": 7})
        vold = t.version
        t.drop_column("y")
        t.add_column("y", pxt.String())
        t.update({"y": "s"})                           # rewrites files
        assert {r["y"] for r in t.collect()} == {"s"}
        assert {r["y"] for r in t.user_df(version=vold).collect()} == {7}

    def test_bloom_filter_follows_rename(self, t):
        cat, t = t
        t.add_bloom_filter("x")
        t.rename_column("x", "z")
        assert "z" in t.bloom_cols and "x" not in t.bloom_cols
        # pruned point lookup on the new name still answers correctly
        assert {r["z"] for r in t.scan(where=t.ref().z == 10).collect()} \
            == {10}

    def test_rename_of_view_referenced_column_refuses(self, t):
        cat, t = t
        cat.create_view("vr", t, predicate=t.ref().x > 1)
        with pytest.raises(ValueError, match="referenced by views"):
            t.rename_column("x", "z")

    def test_rename_pk_column_keeps_enforcement(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "whpk"))
        t = cat.create_table("p", {"id": pxt.Int(False), "x": pxt.Int()},
                             primary_key=["id"])
        t.insert([{"id": 1, "x": 1}])
        t.rename_column("id", "ident")
        assert t.primary_key == ["ident"]
        t.insert([{"ident": 2, "x": 2}])          # probes use new name
        with pytest.raises(ValueError, match="already exists"):
            t.insert([{"ident": 1, "x": 9}])


class TestColumnMappingInterplay:
    """Adversarial interplay of metadata-only renames with the rest of
    the engine: embedding indexes, computed columns, stats-pruned
    mutations, optimize, and reload chains."""

    def test_rename_then_index_search_and_sync(self, spark, tmp_path):
        from pixeltable_spark.index import add_embedding_index
        cat = pxt.Catalog(spark, str(tmp_path / "whix"))
        t = cat.create_table("d", {"doc_id": pxt.Int(False),
                                   "body": pxt.String(False)})
        t.insert([{"doc_id": i, "body": f"document {i} topic {i % 3}"}
                  for i in range(20)])
        def _embed(text, dim=8):
            import asyncio

            from pixeltable_spark.functions.llm import \
                DeterministicFakeClient
            loop = asyncio.new_event_loop()
            try:
                return loop.run_until_complete(
                    DeterministicFakeClient().embed(
                        text, "fake-embed-1", dim=dim))
            finally:
                loop.close()

        idx = add_embedding_index(t, "body", dim=8)
        t.rename_column("body", "content")
        assert idx.column == "content"
        hits = idx.search(_embed("document 7 topic 1"), k=1).collect()
        assert hits[0].doc_id == 7
        # index stays insert-synced THROUGH the rename
        t.insert([{"doc_id": 100, "content": "a brand new document"}])
        hits = idx.search(_embed("a brand new document"), k=1).collect()
        assert hits[0].doc_id == 100

    def test_rename_dependency_of_computed_column(self, t):
        cat, t = t
        t.add_computed_column("c", t.ref().x * 2)
        # x is referenced by computed c AND x is renamable (computed
        # refs are rewritten); new inserts must compute c from z
        t.rename_column("x", "z")
        t.insert([{"k": 7, "z": 70}])
        vals = {r["k"]: r["c"] for r in t.collect()}
        assert vals[7] == 140 and vals[1] == 20

    def test_mutation_after_rename_prunes_and_rewrites(self, spark,
                                                       tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "whmu"))
        t = cat.create_table("m", {"k": pxt.Int(False), "v": pxt.Float()})
        for j in range(4):
            t.insert([{"k": 1000 * j + i, "v": 0.0} for i in range(50)])
        t.rename_column("k", "key")
        ref = t.ref()
        t.update({"v": 9.0}, where=ref.key == 2005)     # stats-pruned COW
        vals = {r["key"]: r["v"] for r in t.collect()}
        assert vals[2005] == 9.0 and vals[2004] == 0.0
        t.delete(where=t.ref().key == 1001)
        assert t.count() == 199

    def test_optimize_after_rename_and_drop_readd(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "whopt"))
        t = cat.create_table("o", {"k": pxt.Int(False), "a": pxt.Int()})
        t.insert([{"k": i, "a": i} for i in range(20)])
        vold = t.version
        t.rename_column("a", "b")
        t.drop_column("b")
        t.add_column("b", pxt.String())
        t.update({"b": "s"}, where=t.ref().k == 3)
        t.optimize()                                    # full rewrite
        # current values survive compaction
        vals = {r["k"]: r["b"] for r in t.collect()}
        assert vals[3] == "s" and vals[4] is None
        # and the OLD incarnation still time-travels (its file column
        # rode through the optimize rewrite under the mangled alias)
        old = {r["k"]: r["a"] for r in t.user_df(version=vold).collect()}
        assert old[3] == 3

    def test_reload_chain_rename_mutate_reload(self, spark, tmp_path):
        wh = str(tmp_path / "whrl")
        cat = pxt.Catalog(spark, wh)
        t = cat.create_table("r", {"k": pxt.Int(False), "x": pxt.Int()})
        t.insert([{"k": 1, "x": 10}])
        t.rename_column("x", "y")
        t2 = pxt.Catalog(spark, wh).get_table("r")
        t2.update({"y": 11})
        t2.rename_column("y", "z")
        t3 = pxt.Catalog(spark, wh).get_table("r")
        assert {r["z"] for r in t3.collect()} == {11}
        assert [f.name for f in t3.user_df(version=1).schema.fields] \
            == ["k", "x"]
