"""Separator-aware document splitter tests (reference
functions/document.py document_splitter options: heading / paragraph /
sentence / token_limit / char_limit, metadata title/heading)."""

from __future__ import annotations

import json

import pytest

from pixeltable_spark.functions.document import document_splitter_v2

MD = """# Guide

Intro paragraph one. It has two sentences.

## Install

Run the installer. Then restart.

## Usage

Use it daily.

# Appendix

Extra notes here.
"""


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame([(1, MD)], "doc_id long, text string")


class TestStructuralSeparators:
    def test_paragraph_split(self, docs):
        rows = document_splitter_v2(docs, separators="paragraph").collect()
        chunks = [r["text"] for r in sorted(rows, key=lambda r: r["pos"])]
        assert chunks[0] == "# Guide"
        assert chunks[1] == "Intro paragraph one. It has two sentences."
        assert len(chunks) == 8

    def test_sentence_split(self, docs):
        rows = document_splitter_v2(docs, separators="paragraph,sentence").collect()
        chunks = [r["text"] for r in sorted(rows, key=lambda r: r["pos"])]
        assert "Intro paragraph one." in chunks
        assert "It has two sentences." in chunks
        assert "Run the installer." in chunks

    def test_heading_split_with_hierarchy_metadata(self, docs):
        rows = document_splitter_v2(docs, separators="heading",
                                    metadata="title,heading").collect()
        rows = sorted(rows, key=lambda r: r["pos"])
        assert all(r["title"] == "Guide" for r in rows)
        h = [json.loads(r["heading"]) for r in rows]
        assert h[0]["h1"] == "Guide" and h[0].get("h2") is None
        assert h[1] == {"h1": "Guide", "h2": "Install"}
        assert h[2] == {"h1": "Guide", "h2": "Usage"}
        # new h1 section: h2 carries over as last-open in strict running
        assert h[3]["h1"] == "Appendix"

    def test_invalid_separator_rejected(self, docs):
        with pytest.raises(ValueError, match="invalid separators"):
            document_splitter_v2(docs, separators="chapter")

    def test_page_gated(self, docs):
        with pytest.raises(NotImplementedError):
            document_splitter_v2(docs, separators="page")


class TestLimitSeparators:
    def test_token_limit_within_paragraphs(self, docs):
        rows = document_splitter_v2(docs, separators="paragraph,token_limit",
                                    limit=3).collect()
        for r in rows:
            assert len(r["text"].split()) <= 3
        # a 6-token paragraph yields ceil(6/3)=2 chunks
        intro = [r["text"] for r in rows if "Intro" in r["text"]]
        assert intro == ["Intro paragraph one."]

    def test_token_limit_overlap(self, spark):
        df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
        rows = document_splitter_v2(df, separators="token_limit", limit=4,
                                    overlap=2)
        chunks = [r["text"] for r in rows.orderBy("pos").collect()]
        assert chunks[0] == "a b c d"
        assert chunks[1] == "c d e f"

    def test_char_limit(self, spark):
        df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
        chunks = [r["text"] for r in
                  document_splitter_v2(df, separators="char_limit", limit=4)
                  .orderBy("pos").collect()]
        assert chunks == ["abcd", "efgh", "ij"]

    def test_pos_is_global_chunk_ordinal(self, docs):
        rows = document_splitter_v2(docs, separators="paragraph,token_limit",
                                    limit=2).collect()
        poss = sorted(r["pos"] for r in rows)
        assert poss == list(range(len(rows)))

    def test_overlap_must_be_smaller(self, docs):
        with pytest.raises(ValueError, match="overlap"):
            document_splitter_v2(docs, separators="token_limit", limit=4, overlap=4)
