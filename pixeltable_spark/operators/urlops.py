"""URL canonicalization + URL-identity dedup keys (the web-corpus
curation primitive: the same page is crawled under scheme/case/port/
tracking-param/fragment variants, and URL-level dedup runs BEFORE
content dedup because it is free).

Rules (the standard canonical form, RFC 3986 §6 normalization plus the
universal tracking-param strip):
  1. drop the #fragment
  2. lowercase the scheme://host authority prefix
  3. drop default ports (:80 for http, :443 for https)
  4. drop tracking query params (utm_*, gclid, fbclid, msclkid, ref),
     sort the survivors for order-independence, drop an empty '?'
  5. strip one trailing '/' from a non-root path

Everything is JVM regex/array column math (codegen, map-only, no
Python, no shuffle) and every step has an exact DuckDB mirror
(canonical_url_sql) so oracle checks are cell-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)="


def canonical_url(url: Column) -> Column:
    u = F.regexp_replace(F.trim(url), "#.*$", "")  # 1. fragment
    pre = F.lower(F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    rest = F.regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    # 3. default ports (scheme-conditional)
    pre = F.when(pre.startswith("http://"),
                 F.regexp_replace(pre, ":80$", "")) \
        .when(pre.startswith("https://"),
              F.regexp_replace(pre, ":443$", "")) \
        .otherwise(pre)
    path = F.regexp_replace(rest, "\\?.*$", "")
    q = F.regexp_extract(rest, "\\?(.*)$", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING))
    qs = F.array_join(F.array_sort(params), "&")
    path = F.when(path.rlike("^.+/$") & (path != "/"),
                  F.regexp_replace(path, "/$", "")).otherwise(path)
    out = F.concat(pre, path,
                   F.when(qs != "", F.concat(F.lit("?"), qs))
                   .otherwise(F.lit("")))
    # no scheme (pre extracted empty): pass the trimmed, defragmented
    # input through unchanged rather than mangling it
    return F.when(pre == "", u).otherwise(out)


def url_dedup_key(url: Column) -> Column:
    """md5 of the canonical URL — the join/groupBy key for URL-level
    exact dedup at corpus scale."""
    return F.md5(canonical_url(url))


def dedup_by_url(df: DataFrame, url_col: str = "url",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, url, canonical, key, is_canonical_rep): one representative
    (min id) per canonical URL — one hash-key groupBy, never n^2.

    NULL contract: rows with a NULL url have NULL canonical/key and are
    each their own representative (is_canonical_rep=true) — a NULL url
    carries no identity to dedup on, and an inner equi-join would
    silently drop them (NULL never equals NULL), so they are split off
    before the join and unioned back annotated."""
    d = df.select(id_col, url_col,
                  canonical_url(F.col(url_col)).alias("canonical"),
                  url_dedup_key(F.col(url_col)).alias("key"))
    nulls = d.where(F.col("key").isNull()) \
        .select(id_col, url_col, "canonical", "key",
                F.lit(True).alias("is_canonical_rep"))
    keyed = d.where(F.col("key").isNotNull())
    reps = keyed.groupBy("key").agg(F.min(id_col).alias("__rep"))
    return (keyed.join(reps, "key")
            .select(id_col, url_col, "canonical", "key",
                    (F.col(id_col) == F.col("__rep"))
                    .alias("is_canonical_rep"))
            .unionByName(nulls))


def canonical_url_sql(expr: str) -> str:
    """DuckDB expression mirroring canonical_url (same regexes, same
    list ops, same ordering) for oracle checks."""
    u = f"regexp_replace(trim({expr}), '#.*$', '')"
    pre0 = (f"lower(regexp_extract({u}, "
            f"'^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1))")
    rest = (f"regexp_replace({u}, "
            f"'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '')")
    pre = (f"CASE WHEN {pre0} LIKE 'http://%' "
           f"THEN regexp_replace({pre0}, ':80$', '') "
           f"WHEN {pre0} LIKE 'https://%' "
           f"THEN regexp_replace({pre0}, ':443$', '') "
           f"ELSE {pre0} END")
    path0 = f"regexp_replace({rest}, '\\?.*$', '')"
    q = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    params = (f"list_filter(string_split({q}, '&'), "
              f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING}'))")
    qs = f"list_aggregate(list_sort({params}), 'string_agg', '&')"
    path = (f"CASE WHEN regexp_matches({path0}, '^.+/$') "
            f"AND {path0} <> '/' "
            f"THEN regexp_replace({path0}, '/$', '') ELSE {path0} END")
    qs_nn = f"coalesce({qs}, '')"
    out = (f"({pre} || {path} || "
           f"CASE WHEN {qs_nn} <> '' THEN '?' || {qs_nn} ELSE '' END)")
    return f"CASE WHEN {pre} = '' THEN {u} ELSE {out} END"
