"""Document functions: chunk splitting for RAG pipelines.

The analog of the reference's document_splitter iterator
(reference functions/document.py + iterators/document.py:10): explode each
document into overlapping token-window chunks, each with a ``pos`` ordinal —
the component-view pattern (reference exec/component_iteration_node.py).

Spark-first: posexplode over a sequence of chunk starts — pure higher-order
functions, no UDF, so chunking 100 TB of documents is a single codegen'd
narrow transformation (no shuffle at all).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def document_splitter(df: DataFrame, chunk_tokens: int = 50, overlap: int = 10,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode documents into overlapping token chunks.

    Output: id, pos (chunk ordinal), start_token, n_chunk_tokens, chunk text.
    Stride = chunk_tokens - overlap.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)), F.lit(stride))
    return (
        df.select(F.col(id_col), words.alias("__w"),
                  F.posexplode(starts).alias("pos", "start_token"))
        .select(
            F.col(id_col),
            F.col("pos").cast(T.LongType()).alias("pos"),
            F.col("start_token").cast(T.LongType()).alias("start_token"),
            F.least(F.lit(chunk_tokens), F.size("__w") - F.col("start_token"))
            .cast(T.LongType()).alias("n_chunk_tokens"),
            F.array_join(F.slice("__w", F.col("start_token") + 1, chunk_tokens), " ")
            .alias("chunk"),
        )
    )


_SENT = "\x01"  # sentinel inserted at structural boundaries before split
_PAGE = "\x02"  # page boundary sentinel (PDF input)


def _pdf_pages_col(col):
    """Binary PDF payload → extracted text with _PAGE between pages
    (reference iterators/document.py PDF path; extractor is the
    pure-stdlib functions/pdf_codec.py)."""
    import pandas as pd

    def fn(s):
        from .pdf_codec import extract_pages
        out = []
        for p in s:
            if p is None:
                out.append(None)
                continue
            out.append(_PAGE.join(extract_pages(bytes(p))))
        return pd.Series(out)

    return F.pandas_udf(fn, T.StringType())(col)


def _office_markdown_col(col, fmt: str):
    """Binary OOXML payload → markdown (pure-stdlib office_codec.py; the
    reference funnels DOCX/PPTX/XLSX through MarkItDown the same way —
    reference utils/documents.py:108)."""
    import pandas as pd

    def fn(s):
        from . import office_codec as oc
        conv = {"docx": oc.docx_to_markdown, "pptx": oc.pptx_to_markdown,
                "xlsx": oc.xlsx_to_markdown,
                "epub": oc.epub_to_markdown}[fmt]
        return pd.Series([None if p is None else conv(bytes(p)) for p in s])

    return F.pandas_udf(fn, T.StringType())(col)


_VALID_SEPARATORS = {"heading", "paragraph", "sentence", "token_limit",
                     "char_limit", "page"}


def html_to_markdown(col):
    """Normalize an HTML document to markdown-ish plain text with ATX
    headings, as a pure column expression (reference iterators/document.py
    _html_sections walks a bs4 tree; here the structural signal — heading
    level + paragraph boundary — is extracted by a regex chain so 100 TB of
    HTML chunks inside whole-stage codegen with no Python).

    <h1..6>text</h1..6> → '#'*n text, <p>/<br>/<li> → blank-line breaks,
    script/style bodies dropped, remaining tags stripped, the five
    predefined entities + &nbsp; unescaped.
    """
    # drop non-content element bodies (two passes — no backreference, so
    # the same regex runs on RE2-based oracle engines)
    col = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script\s*>", " ")
    col = F.regexp_replace(col, r"(?is)<style[^>]*>.*?</style\s*>", " ")
    # headings → ATX markers (one pass per level: the marker length cannot
    # be computed inside a single replacement)
    for n in range(1, 7):
        col = F.regexp_replace(
            col, rf"(?is)<h{n}[^>]*>(.*?)</h{n}\s*>",
            "\n\n" + "#" * n + " $1\n\n")
    # block boundaries → blank lines
    col = F.regexp_replace(col, r"(?i)<(?:/p|p[^>]*|br\s*/?|/li|li[^>]*)>", "\n\n")
    # inline formatting tags vanish without leaving a space ("<b>x</b>." → "x.")
    col = F.regexp_replace(
        col, r"(?i)</?(?:b|i|em|strong|u|s|code|span|a)(?:\s[^>]*)?>", "")
    # strip remaining tags
    col = F.regexp_replace(col, r"(?s)<[^>]+>", " ")
    # minimal entity unescape (the predefined XML set + nbsp) — before the
    # whitespace collapse so an unescaped &nbsp; collapses too
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    # collapse intra-line whitespace runs (tag-strip artifacts); newlines
    # stay — they carry the paragraph structure
    col = F.regexp_replace(col, r"[ \t]+", " ")
    col = F.regexp_replace(col, r" ?\n ?", "\n")
    return col


def document_splitter_v2(df: DataFrame, separators: str = "token_limit",
                         limit: int = 300, overlap: int = 0,
                         metadata: str = "",
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         input_format: str = "text") -> DataFrame:
    """Separator-aware chunking (reference functions/document.py
    document_splitter + iterators/document.py:10): the document is chunked
    by the requested `separators` — structural ones first (`heading` on
    markdown heading lines, `paragraph` on blank lines, `sentence` after
    .!? + whitespace), then `token_limit`/`char_limit` subdivide each
    section into windows of at most `limit` tokens/chars with `overlap`.

    `metadata` may request `title` (first heading of the doc) and
    `heading` (the currently-open heading hierarchy h1..h6 as JSON — the
    reference's Heading TypedDict shape).

    Spark-first: boundaries are INSERTED as sentinel chars by
    regexp_replace (capture-group form — no lookbehind, so the same regex
    runs on any RE2-based oracle engine), then one split+posexplode; the
    heading hierarchy is a running last-non-null window per level, and the
    chunk ordinal a row_number — everything stays in codegen, chunking
    100 TB needs no Python and no shuffle except the metadata windows.

    `page` requires input_format='pdf' (pure-stdlib pdf_codec.py).

    Output: id, pos, text [, title, heading].
    """
    from pyspark.sql import Window as W

    seps = [s.strip() for s in separators.split(",") if s.strip()]
    bad = set(seps) - _VALID_SEPARATORS
    if bad:
        raise ValueError(
            f"invalid separators {sorted(bad)}; valid: {sorted(_VALID_SEPARATORS)}")
    if "page" in seps and input_format != "pdf":
        raise ValueError(
            "'page' chunking requires input_format='pdf' "
            "(reference iterators/document.py PDF path)")
    meta = [m.strip() for m in metadata.split(",") if m.strip()]
    bad_meta = set(meta) - {"title", "heading"}
    if bad_meta:
        raise ValueError(f"unsupported metadata {sorted(bad_meta)}")
    if overlap and overlap >= limit:
        raise ValueError("overlap must be smaller than limit")

    if input_format not in ("text", "markdown", "html", "xml", "pdf",
                            "docx", "pptx", "xlsx", "epub"):
        raise ValueError(
            f"input_format must be text|markdown|html|xml|pdf|docx|pptx"
            f"|xlsx|epub, got {input_format!r}")

    # All Column/Window expressions below are df-independent (they
    # reference columns by NAME only), so they are built once per
    # argument combination: rebuilding the chain costs 300-600 py4j
    # round trips (~1 ms each) per invocation, and view maintenance
    # re-invokes the splitter on every commit. UDF-bearing formats stay
    # uncached (a cached UDF column could go stale across session
    # restarts).
    build = (_v2_build if input_format in ("pdf", "docx", "pptx",
                                           "xlsx", "epub")
             else _v2_build_cached)
    ns = build(separators, limit, overlap, metadata, text_col, id_col,
               input_format)

    out = (df.select(ns.id_c, ns.sec_explode)
           .filter(ns.sec_nonempty)
           .withColumn("__section", ns.sec_trim))

    if "title" in meta or "heading" in meta:
        out = out.withColumn("__hlvl", ns.lvl).withColumn("__htext",
                                                          ns.htext)
        if "heading" in meta:
            out = out.withColumn("heading", ns.heading_json)
        if "title" in meta:
            out = out.withColumn("title", ns.title_expr)
        out = out.drop("__hlvl", "__htext")

    # limit stage: subdivide each section into windows
    if "token_limit" in seps:
        out = (out.withColumn("__w", ns.words)
               .select("*", ns.start_explode)
               .withColumn("__chunk", ns.chunk_expr)
               .drop("__w", "__k"))
    elif "char_limit" in seps:
        out = (out.select("*", ns.start_explode)
               .withColumn("__chunk", ns.chunk_expr)
               .drop("__k"))
    else:
        out = out.withColumn("__chunk", ns.chunk_expr)

    return (out.withColumn("pos", ns.pos_expr)
            .withColumn("text", ns.text_expr)
            .select(*ns.keep))


def _v2_build(separators: str, limit: int, overlap: int, metadata: str,
              text_col: str, id_col: str, input_format: str):
    """df-independent expression set for document_splitter_v2 (see the
    call site for why this is split out and cached)."""
    from types import SimpleNamespace

    from pyspark.sql import Window as W

    seps = [s.strip() for s in separators.split(",") if s.strip()]
    meta = [m.strip() for m in metadata.split(",") if m.strip()]

    col = F.col(text_col)
    if input_format == "markdown":
        # setext headings (underlined with === / ---) normalize to ATX so
        # the heading separator/metadata machinery sees them (reference
        # parses markdown with mistune, which supports both forms)
        col = F.regexp_replace(col, r"(?m)^([^\s#>\-=][^\n]*)\n=+[ \t]*$",
                               "# $1")
        col = F.regexp_replace(col, r"(?m)^([^\s#>\-=|][^\n]*)\n-+[ \t]*$",
                               "## $1")
    elif input_format == "html":
        col = html_to_markdown(col)
    elif input_format == "xml":
        # reference parses XML with bs4 and walks text nodes
        # (iterators/document.py get_xml_handle); the Column analog strips
        # tags/comments/CDATA-markers and collapses whitespace
        col = F.regexp_replace(col, r"(?s)<!\[CDATA\[(.*?)\]\]>", "$1")
        col = F.regexp_replace(col, r"(?s)<!--.*?-->", " ")
        col = F.regexp_replace(col, r"(?s)<\?.*?\?>", " ")
        col = F.regexp_replace(col, r"(?s)<[^>]+>", "\n\n")
        col = F.regexp_replace(col, r"[ \t]+", " ")
    elif input_format in ("docx", "pptx", "xlsx", "epub"):
        # binary OOXML → markdown, then the markdown pipeline applies
        col = _office_markdown_col(col, input_format)
    elif input_format == "pdf":
        # binary payload → page texts (pure-stdlib extractor,
        # functions/pdf_codec.py) joined by the page sentinel
        col = _pdf_pages_col(col)
        col = F.regexp_replace(
            col, _PAGE, _SENT if "page" in seps else "\n\n")
    # structural boundaries -> sentinel inserts (order matters; mirrored by
    # the oracle SQL)
    if "heading" in seps:
        col = F.regexp_replace(col, r"(?m)^(#{1,6}\s)", _SENT + "$1")
    if "paragraph" in seps:
        col = F.regexp_replace(col, r"\n\s*\n", _SENT)
    if "sentence" in seps:
        col = F.regexp_replace(col, r"([.!?])\s+", "$1" + _SENT)
    sections = F.split(col, _SENT)

    ns = SimpleNamespace()
    ns.id_c = F.col(id_col)
    ns.sec_explode = F.posexplode(sections).alias("__sec_pos", "__section")
    ns.sec_nonempty = F.length(F.trim(F.col("__section"))) > 0
    ns.sec_trim = F.trim(F.col("__section"))

    if "title" in meta or "heading" in meta:
        ns.lvl = F.length(F.regexp_extract("__section", r"^(#{1,6})\s", 1))
        ns.htext = F.regexp_extract("__section", r"^#{1,6}\s*([^\n]*)", 1)
        wdoc = (W.partitionBy(id_col).orderBy("__sec_pos")
                .rowsBetween(W.unboundedPreceding, W.currentRow))
        if "heading" in meta:
            # reference semantics (iterators/document.py update_metadata): a
            # heading CLOSES all lower levels — h_n is set only if the most
            # recent heading of level <= n is exactly level n
            levels = []
            for n in range(1, 7):
                ev = F.last(
                    F.when((F.col("__hlvl") >= 1) & (F.col("__hlvl") <= n),
                           F.struct(F.col("__hlvl").alias("l"),
                                    F.col("__htext").alias("t"))),
                    True).over(wdoc)
                levels.append(F.when(ev["l"] == n, ev["t"]).alias(f"h{n}"))
            ns.heading_json = F.to_json(F.struct(*levels))
        if "title" in meta:
            wall = (W.partitionBy(id_col).orderBy("__sec_pos")
                    .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
            ns.title_expr = F.first(
                F.when(F.col("__hlvl") > 0, F.col("__htext")), True).over(wall)

    # limit stage: subdivide each section into windows
    if "token_limit" in seps or "char_limit" in seps:
        stride = limit - overlap
        if "token_limit" in seps:
            ns.words = F.split(F.col("__section"), r"\s+")
            starts = F.sequence(F.lit(0),
                                F.greatest(F.size(ns.words) - 1, F.lit(0)),
                                F.lit(stride))
            ns.chunk_expr = F.array_join(
                F.slice("__w", F.col("__start") + 1, limit), " ")
        else:
            starts = F.sequence(
                F.lit(0),
                F.greatest(F.length("__section") - 1, F.lit(0)), F.lit(stride))
            ns.chunk_expr = F.substring(
                F.col("__section"), F.col("__start") + 1, limit)
        ns.start_explode = F.posexplode(starts).alias("__k", "__start")
        order = [F.col("__sec_pos"), F.col("__start")]
    else:
        ns.chunk_expr = F.col("__section")
        order = [F.col("__sec_pos")]

    wpos = W.partitionBy(id_col).orderBy(*order)
    ns.keep = [id_col, "pos", "text"] + [m for m in ("title", "heading")
                                         if m in meta]
    ns.pos_expr = (F.row_number().over(wpos) - 1).cast(T.LongType())
    ns.text_expr = F.col("__chunk")
    return ns


_v2_build_cached = functools.lru_cache(maxsize=64)(_v2_build)


def string_splitter(df: DataFrame, separator: str = r"\n\n",
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Separator-based splitter (reference functions/string.py
    string_splitter iterator): one row per separated segment with pos."""
    parts = F.split(F.col(text_col), separator)
    return df.select(
        F.col(id_col), F.posexplode(parts).alias("pos", "segment")
    ).withColumn("pos", F.col("pos").cast(T.LongType()))
