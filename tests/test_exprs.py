"""Expression-level tests, mirroring the reference's dual-path strategy
(reference tests/test_exprs.py: every operator through the SQL-pushdown
path AND the Python path): each expression is checked through the compiled
Column path, and selected ones against plain-Python recomputation of the
same rows."""

from __future__ import annotations

import math

import pytest

import pixeltable_spark as pxt
from pixeltable_spark import functions as pxtf
from pixeltable_spark.exprs import CompileCtx, Literal


def rows_of(q):
    return q.collect()


class TestArithmetic:
    def test_basic_ops(self, test_tbl):
        t = test_tbl
        got = (
            t.where(t.c2 < 10)
            .select(t.c2, a=t.c2 + 1, b=t.c2 - 2, c=t.c2 * 3, d=t.c2 / 4,
                    e=t.c3 ** 2)
            .order_by(t.c2)
            .collect()
        )
        for r in got:
            i = r["c2"]
            assert r["a"] == i + 1 and r["b"] == i - 2 and r["c"] == i * 3
            assert r["d"] == pytest.approx(i / 4)
            assert r["e"] == pytest.approx(float(i) ** 2)

    def test_python_mod_floordiv_semantics(self, test_tbl):
        """% and // must follow Python sign semantics, incl. negatives
        (reference exprs/arithmetic_expr.py divergence from SQL)."""
        t = test_tbl
        got = (
            t.where(t.c2 < 20)
            .select(t.c2, m=(t.c2 - 10) % 3, fd=(t.c2 - 10) // 3)
            .order_by(t.c2)
            .collect()
        )
        for r in got:
            i = r["c2"]
            assert r["m"] == (i - 10) % 3, f"mod mismatch at {i}"
            assert r["fd"] == (i - 10) // 3, f"floordiv mismatch at {i}"

    def test_string_concat_repeat(self, test_tbl):
        t = test_tbl
        got = t.where(t.c2 == 3).select(s=t.c1 + "!", r=t.c1 * 2).collect()
        assert got[0]["s"] == "test string 3!"
        assert got[0]["r"] == "test string 3test string 3"


class TestPredicates:
    def test_comparisons_and_compound(self, test_tbl):
        t = test_tbl
        n = t.where((t.c2 >= 10) & (t.c2 < 20) | (t.c2 == 50)).count()
        assert n == 11

    def test_isnull(self, test_tbl):
        t = test_tbl
        assert t.where(t.c1n == None).count() == 10  # noqa: E711
        assert t.where(t.c1n != None).count() == 90  # noqa: E711

    def test_isin(self, test_tbl):
        t = test_tbl
        assert t.where(t.c2.isin([1, 5, 99, 1000])).count() == 3

    def test_between_not(self, test_tbl):
        t = test_tbl
        assert t.where(~t.c2.between(10, 98)).count() == 11

    def test_null_comparison_propagates(self, test_tbl):
        t = test_tbl
        # NULL > 'x' is NULL -> filtered out, never True: all 90 non-null
        # rows match, the 10 NULL rows never do
        assert t.where(t.c1n > "test string 0").count() == 90
        assert t.where(~(t.c1n > "test string 0")).count() == 0


class TestCastSliceJson:
    def test_astype(self, test_tbl):
        t = test_tbl
        got = t.where(t.c2 == 7).select(
            s=t.c2.astype(pxt.String()), f=t.c2.astype(pxt.Float()),
            i=t.c3.astype(pxt.Int()),
        ).collect()[0]
        assert got["s"] == "7" and got["f"] == 7.0 and got["i"] == 7

    def test_string_slice(self, test_tbl):
        t = test_tbl
        got = t.where(t.c2 == 42).select(p=t.c1[0:4], q=t.c1[5:11]).collect()[0]
        assert got["p"] == "test" and got["q"] == "string"

    def test_json_path_scalar(self, test_tbl):
        t = test_tbl
        got = (
            t.where(t.c2 == 13)
            .select(f1=t.c6.f1, f2=t.c6.f2.astype(pxt.Int()),
                    nested=t.c6.f6.f7, arr0=t.c6["f5"][0].astype(pxt.Int()))
            .collect()[0]
        )
        assert got["f1"] == "test string 13"
        assert got["f2"] == 13
        assert got["nested"] == "test string 2"
        assert got["arr0"] == 0

    def test_json_path_filter(self, test_tbl):
        t = test_tbl
        assert t.where(t.c6.f2.astype(pxt.Int()) < 5).count() == 5

    def test_inline_dict_array(self, test_tbl):
        import json
        t = test_tbl
        d = pxt.InlineDict({"x": t.c2, "y": t.c1})
        a = pxt.InlineArray([t.c2, t.c2 + 1])
        got = t.where(t.c2 == 5).select(d=d, a=a).collect()[0]
        assert json.loads(got["d"]) == {"x": 5, "y": "test string 5"}
        assert got["a"] == [5, 6]


class TestStringFns:
    """Dual-path: native Spark column vs the Python fallback must agree
    (the reference's interchangeability checks,
    reference tests/test_exprs.py:860-1039)."""

    CASES = [
        ("upper", (), str.upper), ("lower", (), str.lower),
        ("capitalize", (), str.capitalize), ("reverse", (), lambda s: s[::-1]),
        ("len", (), len), ("strip", (), str.strip),
        ("startswith", ("test",), lambda s: s.startswith("test")),
        ("endswith", ("9",), lambda s: s.endswith("9")),
        ("find", ("string",), lambda s: s.find("string")),
        ("count", ("t",), lambda s: s.count("t")),
        ("replace", ("string", "STR"), lambda s: s.replace("string", "STR")),
        ("removeprefix", ("test ",), lambda s: s.removeprefix("test ")),
        ("removesuffix", (" 3",), lambda s: s.removesuffix(" 3")),
        ("title", (), str.title),           # python-fallback path
        ("swapcase", (), str.swapcase),     # python-fallback path
        ("zfill", (20,), lambda s: s.zfill(20)),  # python-fallback path
        ("isalpha", (), str.isalpha),       # python-fallback path
    ]

    @pytest.mark.parametrize("name,args,pyfn", CASES, ids=[c[0] for c in CASES])
    def test_matches_python(self, test_tbl, name, args, pyfn):
        t = test_tbl
        expr = getattr(t.c1, name)(*args)
        got = t.where(t.c2 < 20).select(t.c2, v=expr).order_by(t.c2).collect()
        for r in got:
            expected = pyfn(f"test string {r['c2']}")
            assert r["v"] == expected, f"{name} mismatch at c2={r['c2']}"


class TestMathTimestampFns:
    def test_math(self, test_tbl):
        t = test_tbl
        got = (
            t.where((t.c2 > 0) & (t.c2 < 10))
            .select(t.c2, sq=pxtf.math.sqrt(t.c3), lg=pxtf.math.log(t.c3),
                    fl=pxtf.math.floor(t.c3 / 2), rn=pxtf.math.round(t.c3 / 7, digits=2))
            .order_by(t.c2).collect()
        )
        for r in got:
            i = r["c2"]
            assert r["sq"] == pytest.approx(math.sqrt(i))
            assert r["lg"] == pytest.approx(math.log(i))
            assert r["fl"] == i // 2
            assert r["rn"] == pytest.approx(round(i / 7, 2), abs=1e-9)

    def test_timestamp_parts(self, test_tbl):
        t = test_tbl
        got = (
            t.where(t.c2.isin([0, 25, 73]))
            .select(t.c2, y=t.c5.year(), mo=t.c5.month(), d=t.c5.day(),
                    h=t.c5.hour(), wd=t.c5.weekday())
            .order_by(t.c2).collect()
        )
        import datetime
        for r in got:
            ts = datetime.datetime(2024, 7, 1) + datetime.timedelta(hours=r["c2"])
            assert (r["y"], r["mo"], r["d"], r["h"], r["wd"]) == (
                ts.year, ts.month, ts.day, ts.hour, ts.weekday())


class TestApplyAndLiterals:
    def test_apply_python_fn(self, test_tbl):
        t = test_tbl
        got = (
            t.where(t.c2 < 5)
            .select(t.c2, v=t.c1.apply(lambda s: s[::-1].upper(), pxt.String()))
            .order_by(t.c2).collect()
        )
        for r in got:
            assert r["v"] == f"test string {r['c2']}"[::-1].upper()

    def test_literal_compile(self, spark):
        ctx = CompileCtx()
        for v in [1, 1.5, "x", True, None]:
            col = Literal(v).to_column(ctx)
            assert col is not None


class TestStrIsPredicates:
    """The 11 str.is* predicates (reference functions/string.py): exact
    Python Unicode semantics via vectorized pandas .str accessors."""

    def test_matches_python_semantics(self, spark):
        import pixeltable_spark as pxt
        vals = ["Hello", "hello world", "abc123", "123", "  ", "Ψφλ",
                "_ident9", "", "½", "Title Case", "UPPER", "mixedCase"]
        t = pxt.table_from_rows(
            spark, [{"i": i, "s": s} for i, s in enumerate(vals)], "strs_t")
        preds = ["isalnum", "isalpha", "isascii", "isdecimal", "isdigit",
                 "isidentifier", "islower", "isnumeric", "isspace",
                 "istitle", "isupper"]
        q = t.select(t.i, **{p: getattr(t.s, p)() for p in preds}).order_by(t.i)
        rows = {r["i"]: r for r in q.collect()}
        for i, s in enumerate(vals):
            for p in preds:
                assert rows[i][p] == getattr(s, p)(), (s, p)


class TestMakeTimestamp:
    def test_jvm_and_defaults(self, spark):
        import datetime

        import pixeltable_spark as pxt
        from pixeltable_spark.functions import timestamp as ts
        t = pxt.table_from_rows(spark, [{"i": 1, "y": 2024, "mo": 7, "d": 15}],
                                "mts_t")
        q = t.select(t.i, a=ts.make_timestamp(t.y, t.mo, t.d),
                     b=ts.make_timestamp(t.y, t.mo, t.d, 13, 45, 30, 250000))
        r = q.collect()[0]
        assert r["a"].replace(tzinfo=None) == datetime.datetime(2024, 7, 15)
        assert r["b"].replace(tzinfo=None) == datetime.datetime(
            2024, 7, 15, 13, 45, 30, 250000)
