"""Store-side constraint enforcement: NOT NULL + primary-key integrity
(reference gets these from Postgres — catalog/table_version.py:875,1246,
local_table.py:669, io/table_data_conduit.py:172; Spark storage enforces
neither, so the engine probes before writing)."""
import pytest

import pixeltable_spark as pxt


@pytest.fixture()
def pk_table(spark, tmp_path):
    cat = pxt.Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("t", {"id": pxt.Int(False), "x": pxt.Int()},
                         primary_key=["id"])
    t.insert([{"id": i, "x": i} for i in range(3)])
    return t


class TestPrimaryKeyIntegrity:
    def test_duplicate_key_vs_existing_rejected(self, pk_table):
        with pytest.raises(ValueError, match="already exists"):
            pk_table.insert([{"id": 0, "x": 99}])
        # nothing was written, no version bump
        assert pk_table.count() == 3 and pk_table.version == 1

    def test_duplicate_key_within_batch_rejected(self, pk_table):
        with pytest.raises(ValueError, match="within inserted rows"):
            pk_table.insert([{"id": 7, "x": 1}, {"id": 7, "x": 2}])
        assert pk_table.count() == 3

    def test_composite_key(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh2"))
        t = cat.create_table(
            "c", {"a": pxt.Int(False), "b": pxt.Int(False),
                  "v": pxt.Int()}, primary_key=["a", "b"])
        t.insert([{"a": 1, "b": 1, "v": 0}, {"a": 1, "b": 2, "v": 0}])
        t.insert([{"a": 2, "b": 1, "v": 0}])       # same b, new a: fine
        with pytest.raises(ValueError, match="already exists"):
            t.insert([{"a": 1, "b": 2, "v": 9}])

    def test_update_pk_column_rejected(self, pk_table):
        with pytest.raises(ValueError, match="primary key"):
            pk_table.update({"id": 99})
        with pytest.raises(ValueError, match="primary key"):
            pk_table.where(pk_table.ref().x == 0).update({"id": 99})

    def test_drop_and_alter_pk_column_rejected(self, pk_table):
        with pytest.raises(ValueError, match="primary key"):
            pk_table.drop_column("id")
        with pytest.raises(ValueError, match="primary key"):
            pk_table.alter_column("id", pxt.Float())

    def test_enforcement_env_escape(self, pk_table, monkeypatch):
        monkeypatch.setenv("PXT_SPARK_ENFORCE_PK", "0")
        pk_table.insert([{"id": 0, "x": 99}])      # bulk-load escape hatch
        assert pk_table.count() == 4

    def test_upsert_still_works(self, pk_table):
        st = pk_table.batch_update(
            [{"id": 1, "x": 100}, {"id": 50, "x": 5}],
            if_not_exists="insert")
        rows = {r["id"]: r["x"] for r in pk_table.collect()}
        assert rows[1] == 100 and rows[50] == 5

    def test_no_pk_table_pays_nothing(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh3"))
        t = cat.create_table("free", {"k": pxt.Int()})
        t.insert([{"k": 1}, {"k": 1}])             # dups fine without PK
        assert t.count() == 2


class TestRequiredColumns:
    def test_rows_path_missing_and_none(self, pk_table):
        with pytest.raises(ValueError, match="required"):
            pk_table.insert([{"x": 1}])
        with pytest.raises(ValueError, match="required"):
            pk_table.insert([{"id": None, "x": 1}])

    def test_dataframe_path_null_rejected(self, pk_table, spark):
        df = spark.createDataFrame([(None, 3)], "id int, x int")
        with pytest.raises(ValueError, match="required"):
            pk_table.insert(df)
        assert pk_table.count() == 3               # nothing written

    def test_dataframe_path_nonnull_schema_skips_probe(self, spark,
                                                       tmp_path):
        # a source whose schema proves non-null inserts without the probe
        cat = pxt.Catalog(spark, str(tmp_path / "wh4"))
        t = cat.create_table("t", {"id": pxt.Int(False), "x": pxt.Int()})
        src = spark.range(5).selectExpr("id", "id AS x")  # id non-nullable
        t.insert(src)
        assert t.count() == 5
