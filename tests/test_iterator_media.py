"""@iterator UDTF, media prefetch/save, and cell-metadata property tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import pixeltable_spark as pxt
from pixeltable_spark.exprs import ColumnRef
from pixeltable_spark.operators import multimodal


@pxt.iterator(output_schema={"word": pxt.String(), "wlen": pxt.Int()})
def word_iter(text: str):
    for w in text.split():
        yield {"word": w, "wlen": len(w)}


class TestIterator:
    def test_explode_with_pos(self, spark):
        df = spark.createDataFrame([{"doc_id": 1, "text": "a bb ccc"},
                                    {"doc_id": 2, "text": "x"}])
        out = word_iter.explode(df).orderBy("doc_id", "_pos").collect()
        assert [(r.doc_id, r._pos, r.word, r.wlen) for r in out] == [
            (1, 0, "a", 1), (1, 1, "bb", 2), (1, 2, "ccc", 3), (2, 0, "x", 1)]

    def test_component_view_with_iterator_decorator(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table("docs", {"doc_id": pxt.Int(False),
                                      "text": pxt.String(False)})
        t.insert([{"doc_id": 1, "text": "alpha beta"}])
        v = cat.create_view("words", t, iterator=word_iter.as_view_iterator())
        assert v.count() == 2
        t.insert([{"doc_id": 2, "text": "gamma delta epsilon"}])
        assert v.count() == 5  # incremental: only the new doc explodes
        rows = v.collect()
        assert {r["word"] for r in rows} == {"alpha", "beta", "gamma", "delta", "epsilon"}

    def test_missing_output_schema_rejected(self):
        with pytest.raises(ValueError, match="output_schema"):
            @pxt.iterator
            def bad(text: str):
                yield {}


class TestMediaLifecycle:
    def test_prefetch_save_roundtrip(self, spark, tmp_path):
        # write some "media" files, reference them by path, prefetch -> save
        src_dir = tmp_path / "media_src"
        src_dir.mkdir()
        rows = []
        for i in range(5):
            p = src_dir / f"m{i}.bin"
            p.write_bytes(bytes([i]) * (10 + i))
            rows.append({"media_id": i, "media_path": str(p)})
        rows.append({"media_id": 99, "media_path": str(src_dir / "missing.bin")})
        df = spark.createDataFrame(rows)

        fetched = multimodal.prefetch_payloads(df)
        got = {r.media_id: r for r in fetched.collect()}
        assert got[3].payload == bytes([3]) * 13
        assert got[3]["_fetch_error_payload"] is None
        # missing file -> null payload + error string, batch survives
        assert got[99].payload is None
        assert "FileNotFoundError" in got[99]["_fetch_error_payload"]

        dest = str(tmp_path / "media_out")
        saved = multimodal.save_payloads(fetched.filter(F.col("payload").isNotNull()), dest)
        out = {r.media_id: r.media_url for r in saved.collect()}
        assert out[0].startswith("file://")
        assert os.path.exists(out[0].removeprefix("file://"))
        with open(out[2].removeprefix("file://"), "rb") as f:
            assert f.read() == bytes([2]) * 12


class TestCellmdProperties:
    def test_errortype_errormsg_sugar(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table("t", {"k": pxt.Int(False), "v": pxt.Float(True)})
        t.insert([{"k": 0, "v": 0.0}, {"k": 1, "v": 2.0}])
        t.add_computed_column(
            "inv", ColumnRef("v", pxt.Float()).apply(lambda v: 1.0 / v, pxt.Float()),
            on_error="ignore")
        r = t.ref()
        got = {x["k"]: x for x in
               r.select(r.k, et=r.inv.errortype, em=r.inv.errormsg).collect()}
        assert got[0]["et"] == "ZeroDivisionError"
        assert "division" in got[0]["em"]
        assert got[1]["et"] is None

    def test_fileurl_identity(self, test_tbl):
        t = test_tbl
        got = t.where(t.c2 == 1).select(u=t.c1.fileurl).collect()
        assert got[0]["u"] == "test string 1"


@pxt.iterator(output_schema={"word": pxt.String()})
def brittle_iter(text: str):
    if "boom" in text:
        raise ValueError(f"bad doc: {text}")
    for w in text.split():
        yield {"word": w}


class TestIteratorErrors:
    def test_abort_default(self, spark):
        df = spark.createDataFrame([{"doc_id": 1, "text": "boom"}])
        with pytest.raises(Exception):
            brittle_iter.explode(df).collect()

    def test_ignore_captures_per_row(self, spark):
        df = spark.createDataFrame([{"doc_id": 1, "text": "ok fine"},
                                    {"doc_id": 2, "text": "boom now"},
                                    {"doc_id": 3, "text": "yes"}])
        out = brittle_iter.explode(df, on_error="ignore") \
            .orderBy("doc_id", "_pos").collect()
        good = [(r.doc_id, r.word) for r in out if r._pos is not None]
        assert good == [(1, "ok"), (1, "fine"), (3, "yes")]
        bad = [r for r in out if r._pos is None]
        assert len(bad) == 1 and bad[0].doc_id == 2
        assert bad[0]._cellmd_word.errortype == "ValueError"
        assert "bad doc" in bad[0]._cellmd_word.errormsg

    def test_ignore_in_component_view(self, spark, tmp_path):
        cat = pxt.Catalog(spark, str(tmp_path / "wh"))
        t = cat.create_table("docs", {"doc_id": pxt.Int(False),
                                      "text": pxt.String(False)})
        t.insert([{"doc_id": 1, "text": "alpha"},
                  {"doc_id": 2, "text": "boom"}])
        v = cat.create_view(
            "words", t,
            iterator=brittle_iter.as_view_iterator(on_error="ignore"))
        rows = v.collect()
        assert len(rows) == 2  # one component + one error row
        errs = [r for r in rows if r["word"] is None]
        assert len(errs) == 1


@pxt.iterator(output_schema={"tok": pxt.String(), "ncalls": pxt.Int()})
class seekable_tokens:
    """Class-based seekable iterator (reference func/iterator.py:48-285
    set_pos): counts __next__ calls so tests can prove the seek path did
    NOT replay positions 0..p-1."""

    def __init__(self, text: str):
        self.toks = text.split()
        self.i = 0
        self.ncalls = 0

    def set_pos(self, pos: int) -> None:
        self.i = pos

    def __iter__(self):
        return self

    def __next__(self):
        self.ncalls += 1
        if self.i >= len(self.toks):
            raise StopIteration
        t = {"tok": self.toks[self.i], "ncalls": self.ncalls}
        self.i += 1
        return t


class TestSeekableIterator:
    def test_explode_at_fixed_pos(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "x y"), (3, "p q r")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               seekable_tokens.explode_at(df, 2).collect()}
        assert out[1]["tok"] == "c" and out[3]["tok"] == "r"
        assert 2 not in out  # only 2 tokens, pos 2 out of range
        # seek proof: exactly ONE __next__ call, not three
        assert out[1]["ncalls"] == 1

    def test_explode_at_per_row_pos_column(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d", 0), (2, "x y z", 2)],
            "doc_id long, text string, want long")
        out = {r["doc_id"]: r["tok"] for r in
               seekable_tokens.explode_at(df, "want").collect()}
        assert out == {1: "a", 2: "z"}

    def test_plain_generator_falls_back_to_islice(self, spark):
        @pxt.iterator(output_schema={"w": pxt.String()})
        def words(text: str):
            for w in text.split():
                yield {"w": w}

        df = spark.createDataFrame([(1, "u v w")], "doc_id long, text string")
        out = words.explode_at(df, 1).collect()
        assert len(out) == 1 and out[0]["w"] == "v"

    def test_class_iterator_full_explode(self, spark):
        df = spark.createDataFrame([(1, "m n")], "doc_id long, text string")
        rows = seekable_tokens.explode(df).orderBy("_pos").collect()
        assert [r["tok"] for r in rows] == ["m", "n"]
