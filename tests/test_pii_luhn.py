"""Luhn-validated card detection (operators/pii.py; public ISO/IEC
7812 mod-10): the checksum must kill the naive \\d{13,16} pattern's
false positives, agree with a python reference fold, and mirror
exactly into DuckDB for the q136 oracle."""

from __future__ import annotations

import duckdb
from pyspark.sql import Row
from pyspark.sql import functions as F

from pixeltable_spark.operators.pii import (card_candidates, luhn_sql,
                                            luhn_valid, pii_count,
                                            valid_card_count)

VALID = ["4111111111111111", "5555555555554444", "378282246310005",
         "6011111111111117", "30569309025904"]
INVALID = ["4111111111111112", "1234567890123456", "9999999999999",
           "378282246310004"]
TOO_SHORT = ["411111111111"]  # 12 digits: below the 13-digit floor


def _py_luhn(s: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(s), 1):
        d = int(ch)
        if i % 2 == 0:
            d = d * 2
            if d > 9:
                d -= 9
        total += d
    return len(s) >= 13 and total % 10 == 0


class TestLuhn:
    def test_matches_python_reference(self, spark):
        nums = VALID + INVALID + TOO_SHORT
        df = spark.createDataFrame([Row(s=n) for n in nums], "s string")
        got = {r["s"]: r["ok"] for r in
               df.select("s", luhn_valid(F.col("s")).alias("ok")).collect()}
        for n in nums:
            assert got[n] == _py_luhn(n), n

    def test_duckdb_mirror_identical(self, spark):
        nums = VALID + INVALID + TOO_SHORT
        df = spark.createDataFrame([Row(s=n) for n in nums], "s string")
        got = {r["s"]: r["ok"] for r in
               df.select("s", luhn_valid(F.col("s")).alias("ok")).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE t (s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(n,) for n in nums])
        want = dict(con.execute(
            f"SELECT s, {luhn_sql('s')} FROM t").fetchall())
        assert got == want

    def test_candidates_with_separators(self, spark):
        df = spark.createDataFrame(
            [Row(t="pay 4111 1111 1111 1111 or 5555-5555-5555-4444 now")],
            "t string")
        r = df.select(
            card_candidates(F.col("t")).alias("c"),
            valid_card_count(F.col("t")).alias("n")).collect()[0]
        assert sorted(r["c"]) == ["4111111111111111", "5555555555554444"]
        assert r["n"] == 2

    def test_precision_beats_naive_pattern(self, spark):
        """A timestamp-like 16-digit number fools the naive regex but
        not the checksum."""
        df = spark.createDataFrame(
            [Row(t="order id 1234567890123456 paid with 4111111111111111")],
            "t string")
        r = df.select(
            pii_count(F.col("t"), "credit_card").alias("naive"),
            valid_card_count(F.col("t")).alias("luhn")).collect()[0]
        assert r["naive"] == 2 and r["luhn"] == 1

    def test_no_digits_no_crash(self, spark):
        df = spark.createDataFrame(
            [Row(t="no numbers at all"), Row(t=""), Row(t=None)],
            "t string")
        rows = df.select(valid_card_count(F.col("t")).alias("n")).collect()
        assert [r["n"] for r in rows][:2] == [0, 0]
