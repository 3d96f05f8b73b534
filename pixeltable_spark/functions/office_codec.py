"""Pure-stdlib Office Open XML -> markdown converters: DOCX, PPTX, XLSX.

The reference funnels office documents through MarkItDown into markdown
and parses that (reference utils/documents.py:108 get_office_handle);
neither markitdown nor python-docx install in this container, so these
read the OOXML packages directly — they are just zip archives of XML
(ECMA-376 / ISO 29500, public spec):

* DOCX: ``word/document.xml`` — w:p paragraphs with w:pStyle Heading<n>
  -> ATX headings, w:numPr -> list items, w:tbl -> markdown pipe tables,
  text = the concatenated w:t runs (tabs/breaks normalized).
* PPTX: ``ppt/slides/slide<n>.xml`` — one ``##`` heading per slide
  (title placeholder text when present), body a:t runs as paragraphs.
* XLSX: ``xl/worksheets/sheet<n>.xml`` + sharedStrings — one ``##``
  heading per sheet, rows as a markdown pipe table (first row = header).

Output feeds the same markdown splitter path as HTML
(functions/document.py document_splitter_v2 input_format='md'), so
heading metadata, separators and token chunking all apply unchanged.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"


def _para_text(p) -> str:
    """Concatenated run text of a w:p, with tabs/breaks as spaces."""
    parts = []
    for node in p.iter():
        if node.tag == f"{_W}t":
            parts.append(node.text or "")
        elif node.tag in (f"{_W}tab", f"{_W}br", f"{_W}cr"):
            parts.append(" ")
    return "".join(parts).strip()


def _para_style(p):
    ppr = p.find(f"{_W}pPr")
    if ppr is None:
        return None, False
    style = ppr.find(f"{_W}pStyle")
    sval = style.get(f"{_W}val") if style is not None else None
    is_list = ppr.find(f"{_W}numPr") is not None
    return sval, is_list


_HEADING_RE = re.compile(r"^[Hh]eading\s*(\d)$")


def docx_to_markdown(payload: bytes) -> str:
    """DOCX bytes -> markdown text. Raises ValueError on non-DOCX zips."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a DOCX (not a zip archive): {e}") from e
    try:
        doc_xml = zf.read("word/document.xml")
    except KeyError as e:
        raise ValueError("not a DOCX (missing word/document.xml)") from e
    root = ET.fromstring(doc_xml)
    body = root.find(f"{_W}body")
    if body is None:
        return ""
    out: list[str] = []
    for el in body:
        if el.tag == f"{_W}p":
            text = _para_text(el)
            if not text:
                continue
            sval, is_list = _para_style(el)
            m = _HEADING_RE.match(sval or "")
            if m:
                out.append("#" * int(m.group(1)) + " " + text)
            elif (sval or "").lower() == "title":
                out.append("# " + text)
            elif is_list:
                out.append("- " + text)
            else:
                out.append(text)
        elif el.tag == f"{_W}tbl":
            rows = []
            for tr in el.findall(f"{_W}tr"):
                cells = []
                for tc in tr.findall(f"{_W}tc"):
                    cells.append(" ".join(
                        _para_text(p) for p in tc.findall(f"{_W}p")).strip())
                rows.append(cells)
            if rows:
                width = max(len(r) for r in rows)
                rows = [r + [""] * (width - len(r)) for r in rows]
                out.append("| " + " | ".join(rows[0]) + " |")
                out.append("|" + "---|" * width)
                for r in rows[1:]:
                    out.append("| " + " | ".join(r) + " |")
    return "\n\n".join(out)


def pptx_to_markdown(payload: bytes) -> str:
    """PPTX bytes -> markdown: '## <title>' per slide + body paragraphs."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a PPTX (not a zip archive): {e}") from e
    slide_names = sorted(
        (n for n in zf.namelist()
         if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
        key=lambda n: int(re.search(r"\d+", n.rsplit("/", 1)[-1]).group()))
    if not slide_names:
        raise ValueError("not a PPTX (no ppt/slides/*.xml)")
    out: list[str] = []
    for name in slide_names:
        root = ET.fromstring(zf.read(name))
        shapes = []
        for sp in root.iter(f"{_P}sp"):
            paras = []
            for ap in sp.iter(f"{_A}p"):
                txt = "".join(t.text or "" for t in ap.iter(f"{_A}t")).strip()
                if txt:
                    paras.append(txt)
            ph = sp.find(f".//{_P}nvSpPr/{_P}nvPr/{_P}ph")
            is_title = ph is not None and ph.get("type") in ("title",
                                                             "ctrTitle")
            if paras:
                shapes.append((is_title, paras))
        title = next((ps[0] for is_t, ps in shapes if is_t), None)
        out.append(f"## {title}" if title
                   else f"## Slide {len(out) + 1}")
        for is_t, paras in shapes:
            if is_t:
                paras = paras[1:]
            out.extend(paras)
    return "\n\n".join(out)


def _cell_col(ref: str) -> int:
    """'BC12' -> 0-based column index 54."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def xlsx_to_markdown(payload: bytes, max_rows: int = 1000) -> str:
    """XLSX bytes -> markdown: '## <sheet>' + a pipe table per sheet."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not an XLSX (not a zip archive): {e}") from e
    if "xl/workbook.xml" not in zf.namelist():
        raise ValueError("not an XLSX (missing xl/workbook.xml)")
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sroot = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in sroot.findall(f"{_S}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_S}t")))
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    names = [sh.get("name", f"Sheet{i+1}") for i, sh in
             enumerate(wb.iter(f"{_S}sheet"))]
    sheet_files = sorted(
        (n for n in zf.namelist()
         if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"\d+", n.rsplit("/", 1)[-1]).group()))
    out: list[str] = []
    for i, fname in enumerate(sheet_files):
        root = ET.fromstring(zf.read(fname))
        rows: list[list[str]] = []
        for row in root.iter(f"{_S}row"):
            if len(rows) >= max_rows:
                break
            cells: dict[int, str] = {}
            for c in row.findall(f"{_S}c"):
                v = c.find(f"{_S}v")
                if v is None or v.text is None:
                    txt = ""
                elif c.get("t") == "s":
                    idx = int(v.text)
                    txt = shared[idx] if idx < len(shared) else ""
                else:
                    txt = v.text
                cells[_cell_col(c.get("r", "A1"))] = txt
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(j, "") for j in range(width)])
        out.append(f"## {names[i] if i < len(names) else f'Sheet{i+1}'}")
        if rows:
            width = max(len(r) for r in rows)
            rows = [r + [""] * (width - len(r)) for r in rows]
            out.append("| " + " | ".join(rows[0]) + " |")
            out.append("|" + "---|" * width)
            for r in rows[1:]:
                out.append("| " + " | ".join(r) + " |")
    return "\n\n".join(out)


def xlsx_sheet_rows(payload: bytes, max_rows: int = 1_000_000) -> dict:
    """XLSX bytes -> {sheet_name: list[list[cell]]} with typed cells:
    numbers come back as int/float, booleans as bool, strings (shared,
    inline or formula-cached) as str, empty cells as None. The tabular
    counterpart of xlsx_to_markdown, backing io.import_excel (reference
    io/pandas.py import_excel delegates to pandas.read_excel; same class
    of documents, stdlib-only)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not an XLSX (not a zip archive): {e}") from e
    if "xl/workbook.xml" not in zf.namelist():
        raise ValueError("not an XLSX (missing xl/workbook.xml)")
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sroot = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in sroot.findall(f"{_S}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_S}t")))
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    names = [sh.get("name", f"Sheet{i+1}") for i, sh in
             enumerate(wb.iter(f"{_S}sheet"))]
    sheet_files = sorted(
        (n for n in zf.namelist()
         if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"\d+", n.rsplit("/", 1)[-1]).group()))

    def _cell_value(c):
        t = c.get("t")
        if t == "inlineStr":
            return "".join(x.text or "" for x in c.iter(f"{_S}t"))
        v = c.find(f"{_S}v")
        if v is None or v.text is None:
            return None
        if t == "s":
            idx = int(v.text)
            return shared[idx] if idx < len(shared) else None
        if t == "b":
            return v.text.strip() == "1"
        if t == "str":      # formula cached string
            return v.text
        txt = v.text.strip()
        try:
            f = float(txt)
        except ValueError:
            return txt
        return int(f) if f.is_integer() and "." not in txt \
            and "e" not in txt.lower() else f

    out: dict = {}
    for i, fname in enumerate(sheet_files):
        root = ET.fromstring(zf.read(fname))
        rows: list[list] = []
        for row in root.iter(f"{_S}row"):
            if len(rows) >= max_rows:
                break
            cells: dict[int, object] = {}
            for c in row.findall(f"{_S}c"):
                cells[_cell_col(c.get("r", "A1"))] = _cell_value(c)
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(j) for j in range(width)])
        out[names[i] if i < len(names) else f"Sheet{i+1}"] = rows
    return out


def _html_to_md(html: str) -> str:
    """Python-side mirror of document.html_to_markdown's Column chain
    (headings -> ATX, block tags -> blank lines, tags stripped, core
    entities) for formats that arrive as HTML inside containers (EPUB)."""
    s = re.sub(r"(?is)<(script|style)[^>]*>.*?</\1\s*>", " ", html)
    for lvl in range(1, 7):
        s = re.sub(rf"(?is)<h{lvl}[^>]*>(.*?)</h{lvl}\s*>",
                   lambda m, L=lvl: "\n\n" + "#" * L + " "
                   + re.sub(r"(?s)<[^>]+>", "", m.group(1)).strip()
                   + "\n\n", s)
    s = re.sub(r"(?i)<(?:/p|p[^>]*|br\s*/?|/li|li[^>]*|/div|div[^>]*)>",
               "\n\n", s)
    s = re.sub(r"(?s)<[^>]+>", " ", s)
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")):
        s = s.replace(ent, ch)
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n{3,}", "\n\n", s)
    return s.strip()


def epub_to_markdown(payload: bytes) -> str:
    """EPUB (OCF zip) -> markdown: container.xml -> OPF -> spine order,
    each XHTML chapter through the HTML->markdown chain. Pure stdlib —
    an EPUB is a zip of XHTML, which the engine already speaks."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not an EPUB (not a zip archive): {e}") from e
    try:
        container = ET.fromstring(zf.read("META-INF/container.xml"))
    except KeyError:
        raise ValueError("not an EPUB (missing META-INF/container.xml)") \
            from None
    opf_path = None
    for rf in container.iter():
        if rf.tag.endswith("rootfile"):
            opf_path = rf.get("full-path")
            break
    if not opf_path or opf_path not in zf.namelist():
        raise ValueError("EPUB missing OPF rootfile")
    opf = ET.fromstring(zf.read(opf_path))
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    manifest = {}
    spine = []
    title = None
    for el in opf.iter():
        tag = el.tag.rsplit("}", 1)[-1]
        if tag == "item" and el.get("id") and el.get("href"):
            manifest[el.get("id")] = el.get("href")
        elif tag == "itemref" and el.get("idref"):
            spine.append(el.get("idref"))
        elif tag == "title" and el.text:
            title = el.text.strip()
    parts = [f"# {title}"] if title else []
    for idref in spine:
        href = manifest.get(idref)
        if not href:
            continue
        name = base + href
        if name not in zf.namelist():
            continue
        parts.append(_html_to_md(zf.read(name).decode("utf-8", "replace")))
    if len(parts) <= (1 if title else 0):
        raise ValueError("EPUB spine resolved no readable chapters")
    return "\n\n".join(p for p in parts if p)
