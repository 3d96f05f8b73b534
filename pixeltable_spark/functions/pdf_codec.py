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

CID/Type0 composite fonts decode through their /ToUnicode CMap
(bfchar/bfrange mappings, ISO 32000 §9.10.3): the extractor tracks the
current font per Tf operator, resolves the page's /Resources /Font
dictionary, and maps 2-byte code strings to Unicode. Fonts without a
ToUnicode map fall back to latin-1 of the raw bytes.

Encrypted documents using the standard security handler with an empty
user password (the common permissions-only encryption) are decrypted via
``pdf_crypto`` — RC4 40-128 bit (V1/V2) and AES-128-CBC (/AESV2).

Out of scope (raises ValueError so callers fall back loudly):
password-protected PDFs (non-empty user password), AES-256 (V5/R6),
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


def _decrypt_objects(data: bytes, objs: dict) -> None:
    """Decrypt stream bodies in place for standard-security-handler
    documents with an empty user password (pdf_crypto). Cross-reference
    streams are never encrypted (ISO 32000 §7.5.8.2); the /Encrypt
    dictionary itself and its strings stay as-is (only /O and /U are read
    from it, and those are stored unencrypted)."""
    from .pdf_crypto import PdfDecryptor

    m_enc = re.search(rb"/Encrypt\s+(\d+)\s+(\d+)\s*R", data)
    if not m_enc:
        raise ValueError("encrypted PDF with inline /Encrypt unsupported")
    enc_num = int(m_enc.group(1))
    m_id = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>", data)
    id0 = bytes.fromhex(m_id.group(1).decode()) if m_id else b""
    enc_body = objs.get(enc_num)
    if enc_body is None:
        raise ValueError("missing /Encrypt object")
    dec = PdfDecryptor(enc_body, id0)
    gens = {int(m.group(1)): int(m.group(2)) for m in
            re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", data)}
    for num, body in list(objs.items()):
        if num == enc_num or re.search(rb"/Type\s*/XRef\b", body):
            continue
        ms = re.search(rb"stream\r?\n", body)
        if not ms:
            continue
        start = ms.end()
        m_len = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s*R)", body)
        if m_len:
            raw = body[start:start + int(m_len.group(1))]
        else:
            m_ref = re.search(rb"/Length\s+(\d+)\s+\d+\s*R", body)
            if m_ref:
                lb = objs.get(int(m_ref.group(1)), b"")
                m_iv = re.search(rb"(\d+)", lb)
                raw = body[start:start + int(m_iv.group(1))] if m_iv else b""
            else:
                m_end = re.search(rb"\r?\nendstream", body[start:])
                raw = body[start:start + m_end.start()] if m_end else b""
        try:
            plain = dec.decrypt(num, gens.get(num, 0), raw)
        except ValueError:
            continue   # leave undecryptable stream as-is
        objs[num] = (body[:ms.start()] + b"stream\n" + plain
                     + b"\nendstream")


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


def _parse_tounicode(cmap: bytes) -> dict:
    """code(int) -> str from a ToUnicode CMap stream (bfchar/bfrange)."""
    out: dict[int, str] = {}

    def u16s(hx: bytes) -> str:
        raw = bytes.fromhex(hx.decode())
        try:
            return raw.decode("utf-16-be")
        except UnicodeDecodeError:
            return raw.decode("latin-1")

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for src, dst in re.findall(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                                   m.group(1)):
            out[int(src, 16)] = u16s(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        body = m.group(1)
        for lo, hi, dst in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                body):
            lo_i, hi_i, base = int(lo, 16), int(hi, 16), int(dst, 16)
            width = len(dst)
            for c in range(lo_i, hi_i + 1):
                out[c] = u16s(b"%0*X" % (width, base + (c - lo_i)))
        for lo, arr in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<[0-9A-Fa-f]+>\s*\[(.*?)\]",
                body, re.S):
            lo_i = int(lo, 16)
            for j, dst in enumerate(re.findall(rb"<([0-9A-Fa-f]+)>", arr)):
                out[lo_i + j] = u16s(dst)
    return out


def _hex_to_text(hx: bytes, cmap: "Optional[dict]") -> str:
    if len(hx) % 2:
        hx += b"0"
    raw = bytes.fromhex(hx.decode())
    if cmap:
        # composite fonts use 2-byte codes
        return "".join(cmap.get(int.from_bytes(raw[i:i + 2], "big"),
                                "") or ""
                       for i in range(0, len(raw) - 1, 2))
    return raw.decode("latin-1")


def _content_text(stream: bytes, font_cmaps: "Optional[dict]" = None) -> str:
    """Text shown by a content stream: Tj/'/"/TJ inside BT…ET, line breaks
    on Td/TD/T*/'. ``font_cmaps`` maps font resource names (e.g. 'F1')
    to ToUnicode dicts; the Tf operator switches the active map."""
    font_cmaps = font_cmaps or {}
    parts: list[str] = []
    for bt in re.finditer(rb"BT(.*?)ET", stream, re.S):
        body = bt.group(1)
        # token scan: names, strings, hex strings, operators
        token_re = re.compile(
            rb"/[^\s/<>()\[\]]+|\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>"
            rb"|\[|\]|[A-Za-z'\"*]+|\S")
        pending: list[str] = []
        cur_cmap: Optional[dict] = None
        last_name: Optional[str] = None
        for m in token_re.finditer(body):
            tok = m.group(0)
            if tok.startswith(b"/"):
                last_name = tok[1:].decode("latin-1")
            elif tok.startswith(b"("):
                pending.append(_literal_string(tok[1:-1]))
            elif tok.startswith(b"<") and tok.endswith(b">"):
                hx = re.sub(rb"\s", b"", tok[1:-1])
                pending.append(_hex_to_text(hx, cur_cmap))
            elif tok == b"Tf":
                if last_name is not None:
                    cur_cmap = font_cmaps.get(last_name)
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
    return "".join(parts)


def _balanced_dict(data: bytes, start: int) -> bytes:
    """The << ... >> dictionary starting at `start`, nesting-aware."""
    depth, i = 0, start
    n = len(data)
    while i < n - 1:
        two = data[i:i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[start:i]
        else:
            i += 1
    return data[start:]


def _value_dict(objs: dict, body: bytes, key: bytes) -> Optional[bytes]:
    """Resolve `key` in a dict body to a dictionary: inline << >> or an
    indirect reference."""
    m = re.search(key + rb"\s*", body)
    if not m:
        return None
    at = m.end()
    if body[at:at + 2] == b"<<":
        return _balanced_dict(body, at)
    mr = re.match(rb"(\d+)\s+\d+\s+R", body[at:at + 32])
    if mr:
        return objs.get(int(mr.group(1)))
    return None


def _page_font_cmaps(objs: dict, page_body: bytes) -> dict:
    """font resource name -> ToUnicode map for a page, following
    /Resources inheritance up the /Parent chain."""
    body: Optional[bytes] = page_body
    res = None
    for _ in range(8):
        if body is None:
            break
        res = _value_dict(objs, body, rb"/Resources")
        if res is not None:
            break
        par = _ref(body, rb"/Parent")
        body = objs.get(par) if par is not None else None
    if res is None:
        return {}
    fonts = _value_dict(objs, res, rb"/Font")
    if fonts is None:
        return {}
    out: dict = {}
    for name, fid in re.findall(rb"/([^\s/<>()\[\]]+)\s+(\d+)\s+\d+\s+R",
                                fonts):
        fbody = objs.get(int(fid))
        if fbody is None:
            continue
        tou = _ref(fbody, rb"/ToUnicode")
        if tou is None:
            continue
        tbody = objs.get(tou)
        if tbody is None:
            continue
        try:
            stream = _stream_bytes(tbody)
        except ValueError:
            continue
        if stream:
            out[name.decode("latin-1")] = _parse_tounicode(stream)
    return out


def extract_pages(payload: bytes) -> list:
    """Per-page text of a PDF, in page-tree order. Raises ValueError for
    non-PDF payloads or unsupported PDF features."""
    data = bytes(payload)
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    objs = _parse_objects(data)
    if not objs:
        raise ValueError("no PDF objects found")
    if re.search(rb"/Encrypt\b", data):
        # RC4 / AES-128 standard security handler, empty user password
        # (pdf_crypto); raises for password-protected / V5 documents
        _decrypt_objects(data, objs)
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
        cmaps = _page_font_cmaps(objs, body)
        text_parts: list[str] = []
        for cid in _refs_array(body, rb"/Contents"):
            cbody = objs.get(cid)
            if cbody is None:
                continue
            stream = _stream_bytes(cbody)
            if stream is not None:
                text_parts.append(_content_text(stream, cmaps))
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
