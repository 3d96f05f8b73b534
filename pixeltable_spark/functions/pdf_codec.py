"""Pure-stdlib PDF text extraction: the 'page' separator without pdfminer.

Implements the subset of ISO 32000 (the public PDF spec) needed to pull
page text out of straightforward PDFs:

* object scan (``N G obj … endobj``), page-tree walk (/Pages → /Kids in
  document order), per-page /Contents resolution (single ref or array),
* stream decoding (/FlateDecode via zlib; uncompressed passthrough),
* content-stream text operators: Tj, ' , " and TJ arrays inside BT…ET
  blocks, with Td/TD/T* treated as line breaks; () literal strings with
  escape sequences and <hex> strings.

Object streams (/ObjStm, PDF 1.5+ — where modern writers put the page
tree and page dictionaries) are expanded: the Flate-decoded stream's
``/First``-offset header maps object numbers to offsets, and the
contained dictionary objects merge into the object table.

Out of scope (raises ValueError so callers fall back loudly): encrypted
PDFs, CID/Type0 composite fonts (text shows as the raw bytes),
LZW/other filters.
"""

from __future__ import annotations

import re
import zlib
from typing import Optional


def _parse_objects(data: bytes) -> dict:
    objs: dict[int, bytes] = {}
    for m in re.finditer(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", data, re.S):
        objs[int(m.group(1))] = m.group(2)
    return objs


def _expand_object_streams(objs: dict) -> None:
    """Merge objects stored inside /ObjStm streams (PDF 1.5+) into the
    object table. ObjStm layout (ISO 32000 §7.5.7): N pairs of
    "objnum offset" in the first /First bytes, then the concatenated
    dictionary objects."""
    for _n, body in list(objs.items()):
        if not re.search(rb"/Type\s*/ObjStm\b", body):
            continue
        try:
            stream = _stream_bytes(body)
        except ValueError:
            continue
        if stream is None:
            continue
        m_count = re.search(rb"/N\s+(\d+)", body)
        m_first = re.search(rb"/First\s+(\d+)", body)
        if not (m_count and m_first):
            continue
        count, first = int(m_count.group(1)), int(m_first.group(1))
        header = stream[:first].split()
        if len(header) < 2 * count:
            continue
        pairs = [(int(header[2 * i]), int(header[2 * i + 1]))
                 for i in range(count)]
        for i, (objnum, off) in enumerate(pairs):
            end = first + pairs[i + 1][1] if i + 1 < count else len(stream)
            # direct "N G obj" definitions win over ObjStm copies
            objs.setdefault(objnum, stream[first + off:end])


def _ref(body: bytes, key: bytes) -> Optional[int]:
    m = re.search(key + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _refs_array(body: bytes, key: bytes) -> list:
    m = re.search(key + rb"\s*\[(.*?)\]", body, re.S)
    if not m:
        r = _ref(body, key)
        return [r] if r is not None else []
    return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]


def _stream_bytes(body: bytes) -> Optional[bytes]:
    m = re.search(rb"stream\r?\n(.*?)\r?\nendstream", body, re.S)
    if not m:
        return None
    raw = m.group(1)
    if b"/FlateDecode" in body:
        try:
            return zlib.decompress(raw)
        except zlib.error as e:
            raise ValueError(f"bad FlateDecode stream: {e}") from e
    if b"/Filter" in body:
        raise ValueError("unsupported PDF stream filter (only FlateDecode)")
    return raw


_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _literal_string(tok: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(tok):
        c = tok[i:i + 1]
        if c == b"\\" and i + 1 < len(tok):
            nxt = tok[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            m = re.match(rb"[0-7]{1,3}", tok[i + 1:i + 4])
            if m:  # octal escape
                oct_digits = m.group(0)
                out.append(int(oct_digits, 8) & 0xFF)
                i += 1 + len(oct_digits)
                continue
            # unknown escape (incl. \8, \9): spec says drop the backslash
            i += 1
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _content_text(stream: bytes) -> str:
    """Text shown by a content stream: Tj/'/"/TJ inside BT…ET, line breaks
    on Td/TD/T*/'."""
    parts: list[str] = []
    for bt in re.finditer(rb"BT(.*?)ET", stream, re.S):
        body = bt.group(1)
        pos = 0
        # token scan: strings, hex strings, operators
        token_re = re.compile(
            rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|\[|\]|[A-Za-z'\"*]+|\S")
        pending: list[str] = []
        for m in token_re.finditer(body):
            tok = m.group(0)
            if tok.startswith(b"("):
                pending.append(_literal_string(tok[1:-1]))
            elif tok.startswith(b"<") and tok.endswith(b">"):
                hx = re.sub(rb"\s", b"", tok[1:-1])
                if len(hx) % 2:
                    hx += b"0"
                pending.append(bytes.fromhex(hx.decode()).decode("latin-1"))
            elif tok in (b"Tj", b"TJ"):
                parts.extend(pending)
                pending = []
            elif tok in (b"'", b'"'):
                parts.append("\n")
                parts.extend(pending)
                pending = []
            elif tok in (b"Td", b"TD", b"T*"):
                pending = []
                if parts and not parts[-1].endswith("\n"):
                    parts.append("\n")
            else:
                pending = pending  # numbers/names: ignore
        _ = pos
    return "".join(parts)


def extract_pages(payload: bytes) -> list:
    """Per-page text of a PDF, in page-tree order. Raises ValueError for
    non-PDF payloads or unsupported PDF features."""
    data = bytes(payload)
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    if b"/Encrypt" in data:
        raise ValueError("encrypted PDF")
    objs = _parse_objects(data)
    if not objs:
        raise ValueError("no PDF objects found")
    _expand_object_streams(objs)
    # page order via the page tree when present, else document order
    page_ids: list[int] = []
    roots = [n for n, b in objs.items()
             if b"/Type" in b and re.search(rb"/Type\s*/Pages\b", b)
             and b"/Parent" not in b]

    def walk(node: int) -> None:
        body = objs.get(node, b"")
        for kid in _refs_array(body, rb"/Kids"):
            kb = objs.get(kid, b"")
            if re.search(rb"/Type\s*/Pages\b", kb):
                walk(kid)
            else:
                page_ids.append(kid)

    for r in roots:
        walk(r)
    if not page_ids:
        page_ids = [n for n, b in objs.items()
                    if re.search(rb"/Type\s*/Page\b", b)
                    and not re.search(rb"/Type\s*/Pages\b", b)]
    pages: list[str] = []
    for pid in page_ids:
        body = objs.get(pid, b"")
        text_parts: list[str] = []
        for cid in _refs_array(body, rb"/Contents"):
            cbody = objs.get(cid)
            if cbody is None:
                continue
            stream = _stream_bytes(cbody)
            if stream is not None:
                text_parts.append(_content_text(stream))
        pages.append("".join(text_parts))
    return pages


def probe(payload: bytes) -> Optional[dict]:
    """Cheap header check + page count, or None if not a PDF."""
    if payload is None or not bytes(payload[:5]) == b"%PDF-":
        return None
    try:
        n = len(extract_pages(payload))
    except ValueError:
        n = None
    return {"format": "PDF",
            "version": bytes(payload[5:8]).decode("latin-1", "ignore"),
            "n_pages": n}
