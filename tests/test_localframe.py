"""Differential battery for localframe.local_df's one-string SQL literal
path: every supported scalar type must round-trip bit-identically to the
stock createDataFrame ground truth, and nasty strings must survive the
SQL escaping. Also pins the plan contract: one partition, no Python
(ExistingRDD) scan for the fast path."""

import datetime
import math
import random

import pytest
from pyspark.sql import types as T

import pixeltable_spark as pxt
from pixeltable_spark import localframe


@pytest.fixture(scope="module")
def spark():
    return pxt.get_session(shuffle_partitions=4)


def _collect_norm(df):
    out = []
    for r in df.collect():
        row = []
        for v in r:
            if isinstance(v, float) and math.isnan(v):
                v = "__nan__"
            if isinstance(v, datetime.datetime):
                v = v.replace(tzinfo=None)
            if isinstance(v, bytearray):
                v = bytes(v)
            row.append(v)
        out.append(tuple(row))
    return out


def _assert_matches_ground_truth(spark, data, schema):
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    # call the SQL renderer DIRECTLY: a silent fallback to the per-cell
    # path would hide escaping/rendering bugs behind identical results
    fast = localframe._sql_plan(spark, data, schema.fields)
    truth = spark.createDataFrame(data, schema)
    assert fast.schema.fieldNames() == truth.schema.fieldNames()
    assert [f.dataType for f in fast.schema.fields] == \
           [f.dataType for f in truth.schema.fields]
    assert _collect_norm(fast) == _collect_norm(truth)
    return fast


def _is_fast_plan(df):
    """The SQL fast path (and the per-cell literal path) read from a
    1-partition range; the createDataFrame fallback scans a pickled
    ExistingRDD."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "ExistingRDD" not in plan and df.rdd.getNumPartitions() == 1


class TestScalars:
    def test_ints_all_widths(self, spark):
        schema = T.StructType([
            T.StructField("b", T.ByteType()),
            T.StructField("s", T.ShortType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("l", T.LongType()),
        ])
        data = [(-128, -32768, -2147483648, -(1 << 63)),
                (127, 32767, 2147483647, (1 << 63) - 1),
                (0, 0, 0, 0), (None, None, None, None)]
        df = _assert_matches_ground_truth(spark, data, schema)
        assert _is_fast_plan(df)

    def test_doubles_exact_bits(self, spark):
        import struct as st
        vals = [0.0, -0.0, 1.0, -1.5, math.pi, 1e-308, 5e-324,
                1.7976931348623157e308, 2.2250738585072014e-308,
                float("inf"), float("-inf"), float("nan"), None,
                0.1, 1 / 3, 123456789.123456789]
        rng = random.Random(7)
        vals += [st.unpack("<d", st.pack("<Q", rng.getrandbits(64)))[0]
                 for _ in range(64)]
        vals = [v if (v is None or v == v) else float("nan") for v in vals]
        data = [(v,) for v in vals]
        df = localframe._sql_plan(spark, data,
            T._parse_datatype_string("x double").fields)
        got = [r[0] for r in df.collect()]
        for g, v in zip(got, vals):
            if v is None:
                assert g is None
            elif math.isnan(v):
                assert math.isnan(g)
            else:  # bit-exact, incl. signed zero
                assert st.pack("<d", g) == st.pack("<d", v), (g, v)
        assert _is_fast_plan(df)

    def test_float32_narrowing(self, spark):
        data = [(0.1,), (1.5,), (3.4028235e38,), (None,), (-0.0,)]
        df = _assert_matches_ground_truth(
            spark, data, T.StructType([T.StructField("f", T.FloatType())]))
        assert _is_fast_plan(df)

    def test_bool_null_binary(self, spark):
        schema = T.StructType([
            T.StructField("t", T.BooleanType()),
            T.StructField("z", T.BinaryType()),
        ])
        data = [(True, b"\x00\xff\x7f'"), (False, b""), (None, None)]
        df = _assert_matches_ground_truth(spark, data, schema)
        assert _is_fast_plan(df)

    def test_dates(self, spark):
        schema = T.StructType([T.StructField("d", T.DateType())])
        data = [(datetime.date(2026, 8, 17),), (datetime.date(1, 1, 1),),
                (datetime.date(9999, 12, 31),), (datetime.date(1969, 7, 20),),
                (None,)]
        df = _assert_matches_ground_truth(spark, data, schema)
        assert _is_fast_plan(df)

    def test_timestamps_naive(self, spark):
        schema = T.StructType([T.StructField("ts", T.TimestampType())])
        data = [(datetime.datetime(2026, 8, 17, 12, 34, 56, 789012),),
                (datetime.datetime(1999, 12, 31, 23, 59, 59, 999999),),
                (datetime.datetime(1970, 1, 1, 0, 0, 0),),
                (None,)]
        df = _assert_matches_ground_truth(spark, data, schema)
        assert _is_fast_plan(df)

    def test_timestamps_aware(self, spark):
        tz = datetime.timezone(datetime.timedelta(hours=5, minutes=30))
        schema = T.StructType([T.StructField("ts", T.TimestampType())])
        data = [(datetime.datetime(2026, 1, 2, 3, 4, 5, 600007,
                                   tzinfo=tz),),
                (datetime.datetime(2026, 1, 2, 3, 4, 5,
                                   tzinfo=datetime.timezone.utc),)]
        df = _assert_matches_ground_truth(spark, data, schema)
        assert _is_fast_plan(df)


class TestStrings:
    NASTY = [
        "", "plain", "it's", 'double"quote', "back\\slash", "two''",
        "tab\there", "new\nline", "\r\n", "nul\x00byte", "\x1b[31mansi",
        "unicode: café 中文 рус",
        "astral \U0001F600\U0001F4A9", "'; DROP TABLE x; --",
        "\\u0041 literal-looking", "endswith\\", "'", "\\", "\\'",
        "named_struct('a', 1)", "\x7f\x80\x9f", "mixed'\\\n  ",
    ]

    def test_nasty_strings(self, spark):
        data = [(i, s) for i, s in enumerate(self.NASTY)] + [(999, None)]
        df = _assert_matches_ground_truth(
            spark, data, "i int, s string")
        assert _is_fast_plan(df)

    def test_random_unicode_fuzz(self, spark):
        rng = random.Random(42)
        pool = (
            [chr(c) for c in range(0x20, 0x7F)]
            + ["\\", "'", '"', "\n", "\t", "\x00", "\x07"]
            + [chr(rng.randrange(0xA0, 0xD7FF)) for _ in range(40)]
            + [chr(rng.randrange(0x10000, 0x10FFFF)) for _ in range(20)]
        )
        data = [("".join(rng.choice(pool)
                         for _ in range(rng.randrange(0, 30))),)
                for _ in range(100)]
        df = _assert_matches_ground_truth(spark, data, "s string")
        assert _is_fast_plan(df)

    def test_field_name_escaping(self, spark):
        schema = T.StructType([T.StructField("weird 'name\\", T.LongType())])
        df = _assert_matches_ground_truth(spark, [(1,), (2,)], schema)
        assert _is_fast_plan(df)


class TestRowShapesAndFallback:
    def test_dict_and_row_inputs(self, spark):
        schema = "a int, b string"
        fields = T._parse_datatype_string(schema).fields
        d1 = localframe._sql_plan(spark, [{"a": 1, "b": "x"},
                                          {"a": None, "b": None}], fields)
        assert _collect_norm(d1) == [(1, "x"), (None, None)]
        from pyspark.sql import Row
        d2 = localframe._sql_plan(spark, [Row(a=2, b="y")], fields)
        assert _collect_norm(d2) == [(2, "y")]
        assert _is_fast_plan(d1) and _is_fast_plan(d2)

    def test_oversize_int_falls_back_correct(self, spark):
        # > int64 kills every literal path; stock createDataFrame also
        # rejects it for a long column — behavior must match the old code
        with pytest.raises(Exception):
            localframe.local_df(spark, [(1 << 70,)], "x bigint").collect()

    def test_large_list_falls_back(self, spark):
        data = [(i,) for i in range(300)]  # > literal_threshold
        df = localframe.local_df(spark, data, "x int")
        assert sorted(r[0] for r in df.collect()) == list(range(300))

    def test_nonatomic_schema_falls_back(self, spark):
        schema = T.StructType([
            T.StructField("a", T.ArrayType(T.IntegerType()))])
        df = localframe.local_df(spark, [([1, 2],), ([3],)], schema)
        assert [list(r[0]) for r in df.collect()] == [[1, 2], [3]]

    def test_mixed_numeric_promotion(self, spark):
        # int value into a double column: CAST(intL AS DOUBLE) mirrors
        # the old lit(int).cast("double") (createDataFrame REJECTS this
        # shape, so compare against the expected values directly)
        schema = T.StructType([T.StructField("x", T.DoubleType())])
        df = localframe._sql_plan(spark, [(1,), (2,), ((1 << 62),)],
                                  schema.fields)
        got = [r[0] for r in df.collect()]
        assert got == [1.0, 2.0, float(1 << 62)]
        assert all(isinstance(g, float) for g in got)
        assert _is_fast_plan(df)

    def test_numpy_scalars(self, spark):
        np = pytest.importorskip("numpy")
        data = [(np.int64(7), np.float64(0.1), np.bool_(True)),
                (np.int32(-3), np.float32(1.5), np.bool_(False))]
        df = localframe._sql_plan(
            spark, data,
            T._parse_datatype_string("i bigint, f double, b boolean").fields)
        got = _collect_norm(df)
        assert got[0][0] == 7 and got[1][0] == -3
        assert got[0][1] == 0.1 and got[1][1] == 1.5
        assert got[0][2] is True and got[1][2] is False
        assert _is_fast_plan(df)
