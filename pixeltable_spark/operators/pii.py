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
