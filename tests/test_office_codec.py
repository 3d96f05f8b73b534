"""OOXML -> markdown converters (functions/office_codec.py) and their
wiring through document_splitter_v2 input_format='docx'|'pptx'|'xlsx'.
Test packages are hand-built ECMA-376 zips — written by this test, not
by our own writer, so the parse is against the public format."""

from __future__ import annotations

import io
import zipfile

import pytest

from pixeltable_spark.functions import office_codec as oc

W_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
A_NS = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
P_NS = 'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'
S_NS = 'xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'


def _zip(files: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in files.items():
            zf.writestr(name, data)
    return buf.getvalue()


def make_docx() -> bytes:
    doc = f"""<?xml version="1.0"?>
<w:document {W_NS}><w:body>
  <w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>
    <w:r><w:t>Quarterly Report</w:t></w:r></w:p>
  <w:p><w:r><w:t>Revenue grew </w:t></w:r><w:r><w:t>12 percent.</w:t></w:r></w:p>
  <w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr>
    <w:r><w:t>Details</w:t></w:r></w:p>
  <w:p><w:pPr><w:numPr><w:ilvl w:val="0"/></w:numPr></w:pPr>
    <w:r><w:t>first item</w:t></w:r></w:p>
  <w:p><w:pPr><w:numPr><w:ilvl w:val="0"/></w:numPr></w:pPr>
    <w:r><w:t>second item</w:t></w:r></w:p>
  <w:tbl>
    <w:tr><w:tc><w:p><w:r><w:t>region</w:t></w:r></w:p></w:tc>
          <w:tc><w:p><w:r><w:t>sales</w:t></w:r></w:p></w:tc></w:tr>
    <w:tr><w:tc><w:p><w:r><w:t>emea</w:t></w:r></w:p></w:tc>
          <w:tc><w:p><w:r><w:t>42</w:t></w:r></w:p></w:tc></w:tr>
  </w:tbl>
</w:body></w:document>"""
    return _zip({"word/document.xml": doc,
                 "[Content_Types].xml": "<Types/>"})


def make_pptx() -> bytes:
    def slide(title, body):
        return f"""<?xml version="1.0"?>
<p:sld {P_NS} {A_NS}><p:cSld><p:spTree>
  <p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
    <p:txBody><a:p><a:r><a:t>{title}</a:t></a:r></a:p></p:txBody></p:sp>
  <p:sp><p:nvSpPr><p:nvPr/></p:nvSpPr>
    <p:txBody><a:p><a:r><a:t>{body}</a:t></a:r></a:p></p:txBody></p:sp>
</p:spTree></p:cSld></p:sld>"""
    return _zip({
        "ppt/slides/slide1.xml": slide("Intro", "welcome text"),
        "ppt/slides/slide2.xml": slide("Results", "numbers went up"),
        "[Content_Types].xml": "<Types/>",
    })


def make_xlsx() -> bytes:
    wb = f'<?xml version="1.0"?><x:workbook {S_NS}><x:sheets>' \
         '<x:sheet name="Budget" sheetId="1"/></x:sheets></x:workbook>'
    ss = f'<?xml version="1.0"?><x:sst {S_NS}>' \
         '<x:si><x:t>item</x:t></x:si><x:si><x:t>cost</x:t></x:si>' \
         '<x:si><x:t>rent</x:t></x:si></x:sst>'
    sheet = f"""<?xml version="1.0"?>
<x:worksheet {S_NS}><x:sheetData>
 <x:row r="1"><x:c r="A1" t="s"><x:v>0</x:v></x:c>
              <x:c r="B1" t="s"><x:v>1</x:v></x:c></x:row>
 <x:row r="2"><x:c r="A2" t="s"><x:v>2</x:v></x:c>
              <x:c r="B2"><x:v>1200</x:v></x:c></x:row>
</x:sheetData></x:worksheet>"""
    return _zip({"xl/workbook.xml": wb, "xl/sharedStrings.xml": ss,
                 "xl/worksheets/sheet1.xml": sheet,
                 "[Content_Types].xml": "<Types/>"})


class TestConverters:
    def test_docx_structure(self):
        md = oc.docx_to_markdown(make_docx())
        assert "# Quarterly Report" in md
        assert "Revenue grew 12 percent." in md  # runs concatenated
        assert "## Details" in md
        assert "- first item" in md and "- second item" in md
        assert "| region | sales |" in md and "| emea | 42 |" in md

    def test_pptx_slides(self):
        md = oc.pptx_to_markdown(make_pptx())
        assert "## Intro" in md and "## Results" in md
        assert "welcome text" in md and "numbers went up" in md
        assert md.index("## Intro") < md.index("## Results")

    def test_xlsx_table(self):
        md = oc.xlsx_to_markdown(make_xlsx())
        assert "## Budget" in md
        assert "| item | cost |" in md
        assert "| rent | 1200 |" in md

    def test_rejects_non_office(self):
        with pytest.raises(ValueError, match="zip"):
            oc.docx_to_markdown(b"plain text, not a zip")
        with pytest.raises(ValueError, match="document.xml"):
            oc.docx_to_markdown(_zip({"other.txt": "x"}))
        with pytest.raises(ValueError, match="slides"):
            oc.pptx_to_markdown(_zip({"other.txt": "x"}))
        with pytest.raises(ValueError, match="workbook"):
            oc.xlsx_to_markdown(_zip({"other.txt": "x"}))


class TestSplitterWiring:
    def test_docx_heading_chunks_with_metadata(self, spark):
        from pixeltable_spark.functions.document import document_splitter_v2
        df = spark.createDataFrame([(1, bytearray(make_docx()))],
                                   "doc_id long, text binary")
        out = document_splitter_v2(
            df, separators="heading", metadata="title,heading",
            input_format="docx").collect()
        texts = [r["text"] for r in out]
        assert any("Quarterly Report" in t for t in texts)
        assert any("Details" in t for t in texts)
        assert all(r["title"] == "Quarterly Report" for r in out)
        import json
        h = json.loads(out[-1]["heading"])
        assert h.get("h2") == "Details"

    def test_pptx_slides_as_sections(self, spark):
        from pixeltable_spark.functions.document import document_splitter_v2
        df = spark.createDataFrame([(1, bytearray(make_pptx()))],
                                   "doc_id long, text binary")
        out = document_splitter_v2(df, separators="heading",
                                   input_format="pptx").collect()
        assert len(out) == 2  # one section per slide heading


def make_typed_xlsx() -> bytes:
    """Two sheets with typed cells: shared + inline strings, ints,
    floats, bools, a blank, and a formula-cached string."""
    wb = f'<?xml version="1.0"?><x:workbook {S_NS}><x:sheets>' \
         '<x:sheet name="People" sheetId="1"/>' \
         '<x:sheet name="Empty" sheetId="2"/></x:sheets></x:workbook>'
    ss = f'<?xml version="1.0"?><x:sst {S_NS}>' \
         '<x:si><x:t>name</x:t></x:si><x:si><x:t>alice</x:t></x:si></x:sst>'
    sheet = f"""<?xml version="1.0"?>
<x:worksheet {S_NS}><x:sheetData>
 <x:row r="1"><x:c r="A1" t="s"><x:v>0</x:v></x:c>
              <x:c r="B1" t="inlineStr"><x:is><x:t>age</x:t></x:is></x:c>
              <x:c r="C1" t="inlineStr"><x:is><x:t>score</x:t></x:is></x:c>
              <x:c r="D1" t="inlineStr"><x:is><x:t>active</x:t></x:is></x:c></x:row>
 <x:row r="2"><x:c r="A2" t="s"><x:v>1</x:v></x:c>
              <x:c r="B2"><x:v>34</x:v></x:c>
              <x:c r="C2"><x:v>9.25</x:v></x:c>
              <x:c r="D2" t="b"><x:v>1</x:v></x:c></x:row>
 <x:row r="3"><x:c r="A3" t="str"><x:v>bob</x:v></x:c>
              <x:c r="B3"><x:v>41</x:v></x:c>
              <x:c r="D3" t="b"><x:v>0</x:v></x:c></x:row>
</x:sheetData></x:worksheet>"""
    sheet2 = f'<?xml version="1.0"?><x:worksheet {S_NS}>' \
             '<x:sheetData/></x:worksheet>'
    return _zip({"xl/workbook.xml": wb, "xl/sharedStrings.xml": ss,
                 "xl/worksheets/sheet1.xml": sheet,
                 "xl/worksheets/sheet2.xml": sheet2,
                 "[Content_Types].xml": "<Types/>"})


class TestXlsxRows:
    def test_typed_cells(self):
        sheets = oc.xlsx_sheet_rows(make_typed_xlsx())
        assert list(sheets) == ["People", "Empty"]
        rows = sheets["People"]
        assert rows[0] == ["name", "age", "score", "active"]
        assert rows[1] == ["alice", 34, 9.25, True]
        assert rows[2] == ["bob", 41, None, False]
        assert sheets["Empty"] == []


class TestImportExcel:
    def test_import_excel(self, spark, tmp_path):
        from pixeltable_spark.sources.io import import_excel
        p = tmp_path / "t.xlsx"
        p.write_bytes(make_typed_xlsx())
        df = import_excel(spark, str(p))
        assert [f.name for f in df.schema.fields] \
            == ["name", "age", "score", "active"]
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        assert types == {"name": "string", "age": "bigint",
                         "score": "double", "active": "boolean"}
        got = sorted((r["name"], r["age"], r["score"], r["active"])
                     for r in df.collect())
        assert got == [("alice", 34, 9.25, True), ("bob", 41, None, False)]
        # by sheet name + headerless
        df2 = import_excel(spark, str(p), sheet_name="People", header=False)
        assert df2.count() == 3 and df2.columns == ["col0", "col1", "col2", "col3"]
        import pytest as _pt
        with _pt.raises(ValueError, match="no sheet named"):
            import_excel(spark, str(p), sheet_name="Missing")
        with _pt.raises(ValueError, match="empty sheet"):
            import_excel(spark, str(p), sheet_name="Empty")


def make_epub() -> bytes:
    container = """<?xml version="1.0"?>
<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
 <rootfiles><rootfile full-path="OEBPS/content.opf"
  media-type="application/oebps-package+xml"/></rootfiles></container>"""
    opf = """<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0">
 <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
  <dc:title>My Book</dc:title></metadata>
 <manifest>
  <item id="c2" href="ch2.xhtml" media-type="application/xhtml+xml"/>
  <item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/>
 </manifest>
 <spine><itemref idref="c1"/><itemref idref="c2"/></spine></package>"""
    ch1 = ("<html><body><h1>Chapter One</h1><p>It was a dark &amp; "
           "stormy night.</p><p>Second para.</p></body></html>")
    ch2 = ("<html><body><h2>Chapter Two</h2><p>The end.</p></body></html>")
    return _zip({"META-INF/container.xml": container,
                 "OEBPS/content.opf": opf,
                 "OEBPS/ch1.xhtml": ch1, "OEBPS/ch2.xhtml": ch2,
                 "mimetype": "application/epub+zip"})


class TestEpub:
    def test_spine_order_and_structure(self):
        md = oc.epub_to_markdown(make_epub())
        assert md.startswith("# My Book")
        assert "# Chapter One" in md and "## Chapter Two" in md
        assert md.index("Chapter One") < md.index("Chapter Two")
        assert "dark & stormy night." in md
        assert "The end." in md

    def test_not_epub(self):
        import pytest as _pt
        with _pt.raises(ValueError, match="container.xml"):
            oc.epub_to_markdown(_zip({"foo.txt": "x"}))

    def test_splitter_accepts_epub(self, spark):
        from pixeltable_spark.functions.document import document_splitter_v2
        df = spark.createDataFrame(
            [(1, bytearray(make_epub()))], "doc_id long, payload binary")
        out = document_splitter_v2(df, text_col="payload",
                                   separators="heading",
                                   metadata="title,heading",
                                   input_format="epub").collect()
        assert len(out) >= 3
        texts = [r["text"] for r in out]
        assert any("Chapter One" in t for t in texts)
        import json as _json
        heads = [_json.loads(r["heading"]) for r in out
                 if r["heading"] is not None]
        assert any(h.get("h1") == "Chapter One" for h in heads)
