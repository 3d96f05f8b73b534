"""Cross-corpus dedup (operators/dedup.py dedup_flags_against /
dedup_against): flags and filtering of a corpus against a reference
set — the dedup-new-crawl-vs-training-set pipeline stage."""

from __future__ import annotations

import pytest

from pixeltable_spark.operators.dedup import (dedup_against,
                                              dedup_flags_against)


@pytest.fixture(scope="module")
def corpora(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog again today"),
        (1, "completely original text about distributed query planning"),
        (2, "the quick brown fox jumps over the lazy dog again today"),
        (3, "the quick brown fox jumps over the lazy cat again today"),
        (4, "another unique document mentioning spark catalyst optimizer"),
    ]
    df = spark.createDataFrame(base, "doc_id long, text string")
    ref = spark.createDataFrame(base[:1], "doc_id long, text string")
    return df, ref


class TestCrossCorpusDedup:
    def test_flags(self, corpora):
        df, ref = corpora
        flags = {r.doc_id: (r.dup_exact, r.dup_near)
                 for r in dedup_flags_against(df, ref, num_hashes=4,
                                              bands=2).collect()}
        assert flags[0] == (True, True)       # in the reference itself
        assert flags[2] == (True, True)       # byte-identical to ref doc
        assert flags[1][0] is False           # unrelated: not exact-dup
        assert flags[4][0] is False
        # near-identical doc 3 is never an EXACT dup
        assert flags[3][0] is False

    def test_filtering_exact_only(self, corpora):
        df, ref = corpora
        kept = {r.doc_id for r in dedup_against(df, ref, near=False).collect()}
        assert kept == {1, 3, 4}

    def test_filtering_near(self, corpora):
        df, ref = corpora
        kept = {r.doc_id for r in
                dedup_against(df, ref, near=True, num_hashes=4,
                              bands=2).collect()}
        # exact dups gone; unrelated docs survive regardless of banding
        assert 0 not in kept and 2 not in kept
        assert 1 in kept and 4 in kept

    def test_broadcast_ref_same_result(self, corpora):
        df, ref = corpora
        a = sorted(map(tuple, dedup_flags_against(
            df, ref, num_hashes=4, bands=2).collect()))
        b = sorted(map(tuple, dedup_flags_against(
            df, ref, num_hashes=4, bands=2, broadcast_ref=True).collect()))
        assert a == b
