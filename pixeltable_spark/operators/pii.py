"""PII detection and scrubbing for training-data pipelines.

Everything here is pure-JVM column math (`regexp_count` /
`regexp_replace`) — zero Python in the hot path, so the scan stays inside
whole-stage codegen and filters on the counts push down. Patterns are
written in the common Java-regex/RE2 subset (no lookarounds, no
backreferences) so a DuckDB oracle reproduces matches exactly.

At 100 TB this is a map-only pass: no shuffle, no state; scrubbing
composes with any downstream operator as a plain projection.

Reference has no PII surface — this is part of the beyond-reference
training-pipeline family (driver brief), modeled on the public
presidio/CCNet-style regex recognizers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: scrub applies greediest first so e.g. an email is not first
# mangled by the phone pattern eating its digits
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "credit_card": r"\b\d{13,16}\b",
}


def pii_count(text: Column, kind: str) -> Column:
    """Number of non-overlapping matches of one PII kind."""
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind]))


def pii_counts(text: Column, kinds: list[str] | None = None) -> dict[str, Column]:
    """One count column per PII kind (all JVM-side; select them together
    and the scan is read once)."""
    return {k: pii_count(text, k) for k in (kinds or list(PII_PATTERNS))}


def scrub_pii(text: Column, kinds: list[str] | None = None) -> Column:
    """Replace each PII match with a `<KIND>` placeholder token — the
    standard pre-training scrub. Chained regexp_replace stays a single
    projection (one codegen stage)."""
    out = text
    for k in kinds or list(PII_PATTERNS):
        out = F.regexp_replace(out, PII_PATTERNS[k], f"<{k.upper()}>")
    return out


def has_pii(text: Column, kinds: list[str] | None = None) -> Column:
    """Boolean flag: any PII kind present. Written as a single RLIKE on the
    alternation so it can serve as a pushed-down filter."""
    pat = "|".join(f"(?:{PII_PATTERNS[k]})" for k in (kinds or list(PII_PATTERNS)))
    return text.rlike(pat)


# ---------------------------------------------------------------------------
# Luhn-validated card detection (public ISO/IEC 7812 mod-10 checksum):
# the naive \d{13,16} pattern flags every long number (timestamps, ids);
# the checksum kills ~90% of those false positives. Pure column math —
# a fold over the digit string, codegen'd, with an exact DuckDB mirror.
# ---------------------------------------------------------------------------

def luhn_valid(digits: Column) -> Column:
    """True when the digit string passes the Luhn mod-10 check. Fold
    from the RIGHT: every second digit doubles (minus 9 when > 9)."""
    n = F.length(digits)
    idx = F.sequence(F.lit(1), n)

    def term(i):
        d = F.ascii(F.substring(digits, (n - i + 1).cast("int"), 1)) - 48
        doubled = d * 2
        return F.when(i % 2 == 0,
                      F.when(doubled > 9, doubled - 9).otherwise(doubled)
                      ).otherwise(d)

    total = F.aggregate(idx, F.lit(0),
                        lambda acc, i: acc + term(i.cast("int")))
    return (n >= 13) & (total % 10 == 0)


def luhn_sql(expr: str) -> str:
    """DuckDB expression mirroring luhn_valid for oracle checks."""
    n = f"length({expr})"
    term = (f"CASE WHEN i % 2 = 0 THEN "
            f"CASE WHEN 2 * (ascii(substr({expr}, CAST({n} - i + 1 AS INT), 1)) - 48) > 9 "
            f"THEN 2 * (ascii(substr({expr}, CAST({n} - i + 1 AS INT), 1)) - 48) - 9 "
            f"ELSE 2 * (ascii(substr({expr}, CAST({n} - i + 1 AS INT), 1)) - 48) END "
            f"ELSE ascii(substr({expr}, CAST({n} - i + 1 AS INT), 1)) - 48 END")
    total = (f"list_aggregate(list_transform(range(1, CAST({n} AS INT) + 1), "
             f"i -> {term}), 'sum')")
    return f"({n} >= 13 AND coalesce({total}, -1) % 10 = 0)"


def card_candidates(text: Column) -> Column:
    """All 13-16 digit runs in the text (array<string>), allowing the
    common space/dash grouping (e.g. '4111 1111 1111 1111'), with the
    separators stripped so the candidates are plain digit strings."""
    runs = F.regexp_extract_all(
        text, F.lit(r"\b(?:\d[ -]?){12,18}\d\b"), F.lit(0))
    cleaned = F.transform(
        runs, lambda s: F.regexp_replace(s, r"[ -]", ""))
    return F.filter(cleaned,
                    lambda s: (F.length(s) >= 13) & (F.length(s) <= 16))


def valid_card_count(text: Column) -> Column:
    """Number of Luhn-valid card candidates — the high-precision PII
    signal (pii_count('credit_card') is the high-recall one)."""
    return F.size(F.filter(card_candidates(text), luhn_valid))
