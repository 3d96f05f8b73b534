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

    def test_page_requires_pdf_input(self, docs):
        with pytest.raises(ValueError, match="input_format='pdf'"):
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


HTML = """<html><head><title>x</title><style>p {color:red}</style></head>
<body>
<h1 class="big">Guide</h1>
<p>Intro paragraph one. It has two sentences.</p>
<h2>Install</h2>
<p>Run the &amp; installer.<br>Then restart.</p>
<h2>Usage</h2>
<p>Use it <b>daily</b>.</p>
<h1>Appendix</h1>
<p>Extra notes here.</p>
<script>var x = "<h1>not a heading</h1>";</script>
</body></html>"""


class TestHtmlInput:
    @pytest.fixture()
    def html_docs(self, spark):
        return spark.createDataFrame([(1, HTML)], "doc_id long, text string")

    def test_heading_split_with_metadata(self, html_docs):
        rows = document_splitter_v2(
            html_docs, separators="heading", metadata="title,heading",
            input_format="html").collect()
        rows.sort(key=lambda r: r["pos"])
        assert all(r["title"] == "Guide" for r in rows)
        heads = [json.loads(r["heading"]) for r in rows]
        texts = [r["text"] for r in rows]
        # the Install section carries h1=Guide, h2=Install
        install = next(i for i, t in enumerate(texts) if "installer" in t)
        assert heads[install]["h1"] == "Guide"
        assert heads[install]["h2"] == "Install"
        # h2 resets when the next h1 opens
        appendix = next(i for i, t in enumerate(texts) if "Extra notes" in t)
        assert heads[appendix]["h1"] == "Appendix"
        # a new h1 closes h2: the key is absent (reference Heading carries
        # only the currently-open levels)
        assert heads[appendix].get("h2") is None
        # style/script bodies are gone, tags stripped, entities unescaped
        joined = " ".join(texts)
        assert "color:red" not in joined and "not a heading" not in joined
        assert "Run the & installer." in joined
        assert "<b>" not in joined and "daily" in joined

    def test_paragraph_split_html(self, html_docs):
        rows = document_splitter_v2(
            html_docs, separators="heading,paragraph",
            input_format="html").collect()
        texts = [r["text"] for r in sorted(rows, key=lambda r: r["pos"])]
        assert any(t.startswith("# Guide") for t in texts)
        assert "Run the & installer." in texts  # <br> makes its own break
        assert "Then restart." in texts

    def test_bad_format_raises(self, html_docs):
        # docx/pptx/xlsx/epub are supported as of round 5 — fake format
        with pytest.raises(ValueError, match="input_format"):
            document_splitter_v2(html_docs, input_format="mobi")


class TestMarkdownSetext:
    def test_setext_headings_normalize(self, spark):
        md = ("Guide\n=====\n\nIntro text here.\n\n"
              "Install\n-------\n\nRun the installer.\n")
        df = spark.createDataFrame([(1, md)], "doc_id long, text string")
        rows = document_splitter_v2(
            df, separators="heading", metadata="title,heading",
            input_format="markdown").collect()
        rows.sort(key=lambda r: r["pos"])
        assert all(r["title"] == "Guide" for r in rows)
        h = [json.loads(r["heading"]) for r in rows]
        assert h[0]["h1"] == "Guide"
        assert h[1] == {"h1": "Guide", "h2": "Install"}

    def test_hr_and_table_rules_not_headings(self, spark):
        md = "para one\n\n---\n\n| a | b |\n|---|---|\n| 1 | 2 |\n"
        df = spark.createDataFrame([(1, md)], "doc_id long, text string")
        rows = document_splitter_v2(df, separators="heading",
                                    input_format="markdown").collect()
        joined = " ".join(r["text"] for r in rows)
        assert "##" not in joined  # no fake setext promotion


def _make_pdf(pages: list) -> bytes:
    """Minimal two-object-per-page PDF with FlateDecode content streams
    (enough of ISO 32000 to exercise the extractor)."""
    import zlib

    objs = []
    page_refs = []
    n_fixed = 2  # catalog=1, pages=2
    for i, lines in enumerate(pages):
        content_id = n_fixed + 1 + 2 * i
        page_id = content_id + 1
        ops = "BT /F1 12 Tf 72 720 Td " + " T* ".join(
            f"({ln}) Tj" for ln in lines) + " ET"
        stream = zlib.compress(ops.encode("latin-1"))
        objs.append((content_id,
                     b"<< /Filter /FlateDecode /Length "
                     + str(len(stream)).encode() + b" >>\nstream\n"
                     + stream + b"\nendstream\n"))
        objs.append((page_id,
                     f"<< /Type /Page /Parent 2 0 R /Contents {content_id} 0 R >>\n"
                     .encode()))
        page_refs.append(page_id)
    kids = " ".join(f"{r} 0 R" for r in page_refs)
    objs.insert(0, (2, f"<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>\n".encode()))
    objs.insert(0, (1, b"<< /Type /Catalog /Pages 2 0 R >>\n"))
    out = bytearray(b"%PDF-1.4\n")
    for num, body in objs:
        out += f"{num} 0 obj\n".encode() + body + b"endobj\n"
    out += b"trailer << /Root 1 0 R >>\n%%EOF"
    return bytes(out)


def _make_objstm_pdf(pages: list) -> bytes:
    """PDF 1.5-style layout: the catalog/pages/page DICTIONARIES live in
    a compressed /ObjStm; only content streams are direct objects —
    what every modern PDF writer produces."""
    import zlib

    content_objs = []
    dict_objs = []  # (objnum, body str) going into the ObjStm
    page_refs = []
    next_id = 10
    for i, lines in enumerate(pages):
        content_id = next_id
        page_id = next_id + 1
        next_id += 2
        ops = "BT /F1 12 Tf 72 720 Td " + " T* ".join(
            f"({ln}) Tj" for ln in lines) + " ET"
        stream = zlib.compress(ops.encode("latin-1"))
        content_objs.append((content_id,
                             b"<< /Filter /FlateDecode /Length "
                             + str(len(stream)).encode() + b" >>\nstream\n"
                             + stream + b"\nendstream\n"))
        dict_objs.append((page_id,
                          f"<< /Type /Page /Parent 2 0 R "
                          f"/Contents {content_id} 0 R >>"))
        page_refs.append(page_id)
    kids = " ".join(f"{r} 0 R" for r in page_refs)
    dict_objs.insert(0, (2, f"<< /Type /Pages /Kids [{kids}] "
                            f"/Count {len(pages)} >>"))
    dict_objs.insert(0, (1, "<< /Type /Catalog /Pages 2 0 R >>"))
    # build the object stream payload
    bodies = [b.encode() for _n, b in dict_objs]
    body_blob = bytearray()
    offsets = []
    for b in bodies:
        offsets.append(len(body_blob))
        body_blob += b + b" "
    header = " ".join(f"{n} {o}" for (n, _), o in
                      zip(dict_objs, offsets)).encode() + b" "
    stm = zlib.compress(bytes(header + body_blob))
    out = bytearray(b"%PDF-1.5\n")
    out += (b"9 0 obj\n<< /Type /ObjStm /N "
            + str(len(dict_objs)).encode()
            + b" /First " + str(len(header)).encode()
            + b" /Filter /FlateDecode /Length "
            + str(len(stm)).encode() + b" >>\nstream\n" + stm
            + b"\nendstream\nendobj\n")
    for num, body in content_objs:
        out += f"{num} 0 obj\n".encode() + body + b"endobj\n"
    out += b"trailer << /Root 1 0 R >>\n%%EOF"
    return bytes(out)


def _make_type0_pdf(text: str) -> bytes:
    """Type0/Identity-H PDF: text drawn as 2-byte CID hex strings, decoded
    only through the font's /ToUnicode CMap — the modern-writer layout."""
    import zlib
    # CID = codepoint + 3 (arbitrary non-identity mapping proves the CMap
    # is actually applied, not a latin-1 fallback)
    cids = [ord(c) + 3 for c in text]
    hexstr = "".join(f"{c:04X}" for c in cids)
    ops = f"BT /F9 12 Tf 72 720 Td <{hexstr}> Tj ET"
    stream = zlib.compress(ops.encode())
    lo = min(cids)
    hi = max(cids)
    cmap = ("/CIDInit /ProcSet findresource begin\n"
            "begincmap\n"
            "1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            f"1 beginbfrange <{lo:04X}> <{hi:04X}> <{lo - 3:04X}> "
            "endbfrange\nendcmap\nend").encode()
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>\n"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/Resources << /Font << /F9 5 0 R >> >> >>\n"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"),
        (4, b"<< /Filter /FlateDecode /Length "
            + str(len(stream)).encode() + b" >>\nstream\n" + stream
            + b"\nendstream\n"),
        (5, b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
            b"/ToUnicode 6 0 R >>\n"),
        (6, b"<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
            + cmap + b"\nendstream\n"),
    ]
    out = bytearray(b"%PDF-1.6\n")
    for num, body in objs:
        out += f"{num} 0 obj\n".encode() + body + b"endobj\n"
    out += b"trailer << /Root 1 0 R >>\n%%EOF"
    return bytes(out)


class TestType0Pdf:
    def test_tounicode_cmap_applied(self):
        from pixeltable_spark.functions.pdf_codec import extract_pages
        pdf = _make_type0_pdf("Hello CID world")
        pages = extract_pages(pdf)
        assert pages == ["Hello CID world"]

    def test_bfchar_form(self):
        from pixeltable_spark.functions.pdf_codec import _parse_tounicode
        cmap = (b"2 beginbfchar <0041> <0058> <0042> <0059> endbfchar")
        m = _parse_tounicode(cmap)
        assert m[0x41] == "X" and m[0x42] == "Y"

    def test_bfrange_array_form(self):
        from pixeltable_spark.functions.pdf_codec import _parse_tounicode
        cmap = b"1 beginbfrange <0001> <0003> [<0041> <0042> <0043>] endbfrange"
        m = _parse_tounicode(cmap)
        assert (m[1], m[2], m[3]) == ("A", "B", "C")

    def test_surrogate_pair_utf16(self):
        from pixeltable_spark.functions.pdf_codec import _parse_tounicode
        # U+1F600 as UTF-16BE surrogate pair
        cmap = b"1 beginbfchar <0010> <D83DDE00> endbfchar"
        m = _parse_tounicode(cmap)
        assert m[0x10] == "\U0001F600"


class TestObjStmPdf:
    def test_objstm_pages_extract(self):
        from pixeltable_spark.functions.pdf_codec import extract_pages, probe
        pdf = _make_objstm_pdf([["Modern page one."], ["Second page."]])
        pages = extract_pages(pdf)
        assert len(pages) == 2
        assert "Modern page one." in pages[0]
        assert "Second page." in pages[1]
        assert probe(pdf)["n_pages"] == 2

    def test_direct_objects_win_over_objstm_copies(self):
        from pixeltable_spark.functions.pdf_codec import extract_pages
        pdf = _make_objstm_pdf([["Inside objstm."]])
        # append a direct redefinition of page object 11 with no contents
        pdf2 = pdf.replace(
            b"trailer",
            b"11 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\ntrailer")
        # direct scan found object 11 first -> its (empty) page wins
        pages = extract_pages(pdf2)
        assert pages == [""]


class TestPdfInput:
    def test_extract_pages(self):
        from pixeltable_spark.functions.pdf_codec import extract_pages, probe
        pdf = _make_pdf([["First page line one.", "Second line."],
                         ["Page two content here."]])
        pages = extract_pages(pdf)
        assert len(pages) == 2
        assert "First page line one." in pages[0]
        assert "Second line." in pages[0]
        assert "Page two content here." in pages[1]
        assert probe(pdf)["n_pages"] == 2

    def test_non_pdf_raises(self):
        from pixeltable_spark.functions.pdf_codec import extract_pages
        with pytest.raises(ValueError, match="not a PDF"):
            extract_pages(b"plain text")

    def test_page_separator_through_splitter(self, spark):
        pdf = _make_pdf([["Alpha one.", "Alpha two."], ["Beta page."],
                         ["Gamma page text."]])
        df = spark.createDataFrame([(1, pdf)], "doc_id long, text binary")
        rows = document_splitter_v2(df, separators="page",
                                    input_format="pdf").collect()
        rows.sort(key=lambda r: r["pos"])
        assert len(rows) == 3
        assert rows[0]["text"].startswith("Alpha one.")
        assert rows[1]["text"] == "Beta page."
        assert rows[2]["text"] == "Gamma page text."

    def test_page_plus_sentence(self, spark):
        pdf = _make_pdf([["One. Two.", "Three."], ["Four."]])
        df = spark.createDataFrame([(1, pdf)], "doc_id long, text binary")
        rows = document_splitter_v2(df, separators="page,sentence",
                                    input_format="pdf").collect()
        texts = [r["text"] for r in sorted(rows, key=lambda r: r["pos"])]
        assert texts[0].startswith("One.") and "Four." in texts[-1]
        assert len(texts) >= 4

    def test_page_without_pdf_format_raises(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="input_format='pdf'"):
            document_splitter_v2(df, separators="page")


class TestXmlInput:
    def test_xml_text_extraction(self, spark):
        xml = ("<?xml version='1.0'?><doc><!-- note --><title>Annual "
               "Report</title><section><p>Revenue grew.</p>"
               "<p><![CDATA[Margins & costs.]]></p></section></doc>")
        df = spark.createDataFrame([(1, xml)], ["doc_id", "text"])
        rows = document_splitter_v2(df, separators="paragraph",
                                    input_format="xml").collect()
        texts = [r["text"] for r in rows]
        assert any("Annual Report" in t for t in texts)
        assert any("Revenue grew." in t for t in texts)
        assert any("Margins & costs." in t for t in texts)
        assert not any("<" in t or "note" in t for t in texts)
