"""Declarative table models (model.py): the reference's model_base
surface — Column specs, create_all / diff_all / update_all migrations,
forwarded Table methods (reference catalog/model.py:31,1468)."""
import pytest

import pixeltable_spark as pxt
from pixeltable_spark.exceptions import Error


@pytest.fixture()
def cat(spark, tmp_path):
    return pxt.Catalog(spark, str(tmp_path / "wh"))


def _docs_model(Base):
    class Docs(Base, name="docs"):
        doc_id = pxt.Column(pxt.Int(False), primary_key=True)
        text = pxt.Column(pxt.String())
        n_chars = pxt.Column(value=lambda t: t.text.len())
    return Docs


class TestModelBase:
    def test_create_all_and_forwarding(self, cat):
        Base = pxt.model_base()
        Docs = _docs_model(Base)
        created, existed = Base.create_all(cat)
        assert created == ["docs"] and existed == []
        t = cat.get_table("docs")
        assert t.primary_key == ["doc_id"]
        assert "n_chars" in t.computed
        # forwarded Table methods work as class-level operations
        Docs.insert([{"doc_id": 1, "text": "hello"}])
        assert Docs.count() == 1
        rows = Docs.where(Docs.doc_id == 1).select(Docs.n_chars).collect()
        assert rows[0]["n_chars"] == 5
        # idempotent: second create_all reports existing
        created2, existed2 = Base.create_all(cat)
        assert created2 == [] and existed2 == ["docs"]

    def test_create_all_refuses_on_drift(self, cat):
        Base = pxt.model_base()
        _docs_model(Base)
        Base.create_all(cat)
        cat.get_table("docs").add_column("extra", pxt.Float())
        with pytest.raises(Error, match="update_all"):
            Base.create_all(cat)

    def test_diff_and_update_adds_columns(self, cat):
        Base = pxt.model_base()
        _docs_model(Base)
        Base.create_all(cat)

        Base2 = pxt.model_base()

        class Docs2(Base2, name="docs"):
            doc_id = pxt.Column(pxt.Int(False), primary_key=True)
            text = pxt.Column(pxt.String())
            n_chars = pxt.Column(value=lambda t: t.text.len())
            lang = pxt.Column(pxt.String())          # model-new column

        diff = Base2.get_model_diff(cat)["docs"]
        assert diff["resolution"] == "update"
        assert [c["op"] for c in diff["changes"]] == ["add"]
        applied = Base2.update_all(cat)
        assert applied == ["add docs.lang"]
        assert "lang" in cat.get_table("docs").columns()
        assert Base2.diff_all(cat) == ["Catalog is up to date."]

    def test_update_drop_needs_destructive_flag(self, cat):
        Base = pxt.model_base()
        _docs_model(Base)
        Base.create_all(cat)

        Base2 = pxt.model_base()

        class Docs2(Base2, name="docs"):             # n_chars removed
            doc_id = pxt.Column(pxt.Int(False), primary_key=True)
            text = pxt.Column(pxt.String())

        with pytest.raises(Error, match="allow_destructive"):
            Base2.update_all(cat)
        applied = Base2.update_all(cat, allow_destructive=True)
        assert applied == ["drop docs.n_chars"]
        assert "n_chars" not in cat.get_table("docs").columns()

    def test_type_change_is_unsupported(self, cat):
        Base = pxt.model_base()
        _docs_model(Base)
        Base.create_all(cat)

        Base2 = pxt.model_base()

        class Docs2(Base2, name="docs"):
            doc_id = pxt.Column(pxt.Int(False), primary_key=True)
            text = pxt.Column(pxt.Float())           # type drift
            n_chars = pxt.Column(value=lambda t: t.text.len())

        diff = Base2.get_model_diff(cat)["docs"]
        assert diff["resolution"] == "unsupported"
        with pytest.raises(Error, match="unsupported"):
            Base2.update_all(cat)

    def test_bind_all_attaches_existing(self, cat):
        Base = pxt.model_base()
        _docs_model(Base)
        Base.create_all(cat)
        Base2 = pxt.model_base()
        Docs2 = _docs_model(Base2)
        Base2.bind_all(cat)
        Docs2.insert([{"doc_id": 9, "text": "bound"}])
        assert Docs2.count() == 1

    def test_column_spec_validation(self):
        with pytest.raises(ValueError, match="exactly one"):
            pxt.Column()
        with pytest.raises(ValueError, match="exactly one"):
            pxt.Column(pxt.Int(), value=1)

    def test_unbound_model_raises(self, cat):
        Base = pxt.model_base()
        Docs = _docs_model(Base)
        with pytest.raises(Error, match="not bound"):
            Docs.count()


class TestColumnSpecInCreateTable:
    def test_create_table_accepts_column_specs(self, cat):
        t = cat.create_table("films", {
            "fid": pxt.Column(pxt.Int(False), primary_key=True),
            "name": pxt.Column(pxt.String()),
            "upper": pxt.Column(value=lambda r: r.name.upper()),
        })
        assert t.primary_key == ["fid"]
        t.insert([{"fid": 1, "name": "alien"}])
        assert t.collect()[0]["upper"] == "ALIEN"

    def test_failing_computed_spec_rolls_back(self, cat):
        """A failing Column(value=...) expression must not leave a
        half-created table behind (plain columns committed, computed
        columns missing) — the whole create rolls back and a retry
        succeeds instead of hitting AlreadyExistsError."""
        with pytest.raises(Exception):
            cat.create_table("halfway", {
                "fid": pxt.Column(pxt.Int(False)),
                "boom": pxt.Column(value=lambda r: r.no_such_col.upper()),
            })
        assert "halfway" not in cat.list_tables()
        t = cat.create_table("halfway",
                             {"fid": pxt.Column(pxt.Int(False))})
        assert t.count() == 0

    def test_spec_pk_deduped_against_explicit_pk(self, cat):
        t = cat.create_table("dd", {
            "fid": pxt.Column(pxt.Int(False), primary_key=True),
            "name": pxt.Column(pxt.String()),
        }, primary_key=["fid"])
        assert t.primary_key == ["fid"]

    def test_tools_container(self):
        def add(a: int, b: int) -> int:
            """Add two ints."""
            return a + b

        ts = pxt.tools(add)
        assert isinstance(ts, pxt.Tools) and isinstance(ts, list)
        assert ts.specs()[0]["name"] == "add"
        ch = ts.choice(tool="add")
        assert ch.tool == "add" and not ch.auto
        with pytest.raises(ValueError, match="Exactly one"):
            ts.choice(auto=True, required=True)
        # list-compat: invoke_tools still takes it directly
        out = pxt.invoke_tools(ts, {"tool_calls": [
            {"name": "add", "arguments": {"a": 2, "b": 3}}]})
        assert out[0]["result"] == 5
