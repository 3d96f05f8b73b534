"""Data-quality audit operators: referential-integrity checking (the
dbt-style `relationships` test, distributed).

100 TB design: fk_violations is a LEFT ANTI join on the key — the
parent side reduces to its distinct keys first (aggregate-sized, and
broadcast when small), so the child table streams through one pruned
scan; the summary variant adds a single-row conditional aggregate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fk_violations(child: DataFrame, parent: DataFrame,
                  child_keys: Sequence[str],
                  parent_keys: Sequence[str]) -> DataFrame:
    """Rows of `child` whose (non-null) foreign key has no match in
    `parent` — NULL keys are skipped (SQL FK semantics: NULL means
    'no reference', not a violation). Returns the violating child rows
    unchanged."""
    if len(child_keys) != len(parent_keys) or not child_keys:
        raise ValueError("fk_violations: key lists must be same-length "
                         "and non-empty")
    pk = parent.select(*[F.col(p).alias(f"__pk_{i}")
                         for i, p in enumerate(parent_keys)]).distinct()
    cond = [child[c] == pk[f"__pk_{i}"]
            for i, c in enumerate(child_keys)]
    non_null = child
    for c in child_keys:
        non_null = non_null.filter(F.col(c).isNotNull())
    return non_null.join(pk, on=cond, how="left_anti")


def fk_summary(child: DataFrame, parent: DataFrame,
               child_keys: Sequence[str],
               parent_keys: Sequence[str]) -> DataFrame:
    """One-row audit summary: total child rows, rows with a NULL key,
    violations, and the violation rate over non-null keys."""
    viol = fk_violations(child, parent, child_keys, parent_keys)
    null_cond = None
    for c in child_keys:
        n = F.col(c).isNull()
        null_cond = n if null_cond is None else (null_cond | n)
    totals = child.agg(
        F.count("*").alias("total_rows"),
        F.count(F.when(null_cond, F.lit(1))).alias("null_keys"))
    v = viol.agg(F.count("*").alias("violations"))
    # every key NULL -> zero non-null keys -> rate undefined (NULL), not
    # an ANSI divide-by-zero killing the audit job
    nn = F.col("total_rows") - F.col("null_keys")
    return (totals.crossJoin(F.broadcast(v))
            .select("total_rows", "null_keys", "violations",
                    F.when(nn > 0,
                           F.round(F.col("violations") / nn, 6))
                    .alias("violation_rate")))


def benford_audit(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-significant-digit audit (the classic
    fabricated-numbers / unit-mixing detector for financial and metric
    columns): per digit 1-9, observed count and frequency vs the
    Benford expectation log10(1 + 1/d), plus the corpus chi-square
    statistic repeated on every row (9-row output; >> ~20 means the
    column does not follow Benford — judgment is domain-specific).

    The first significant digit is extracted from the decimal STRING
    rendering (first [1-9] char) rather than floor(x / 10^floor(log10
    x)) — the arithmetic form flips digits at exact powers of ten when
    log10 lands an ulp under an integer, and engines differ in exactly
    those ulps. One conditional-aggregate pass + a 9-row rollup."""
    x = F.abs(F.col(col).cast("double"))
    digit = F.regexp_extract(x.cast("string"), "[1-9]", 0)
    counts = (df.filter(x > 0)
              .select(digit.alias("digit"))
              .filter(F.col("digit") != "")
              .groupBy("digit").agg(F.count("*").alias("n"))
              .select(F.col("digit").cast("int").alias("digit"), "n"))
    # Left-join onto a literal 1..9 spine so absent digits contribute their
    # full (0 - N*p_d)^2 / (N*p_d) chi-square term — summing only observed
    # digits UNDERSTATES chi2 exactly in the most anomalous case (e.g. a
    # column whose values all start with 1), and breaks the documented
    # 9-row contract. The spine is 9 rows: broadcast, no extra shuffle.
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit"))
    counts = (spine.join(F.broadcast(counts), "digit", "left")
              .select("digit",
                      F.coalesce(F.col("n"), F.lit(0)).cast("long")
                      .alias("n")))
    total = F.sum("n").over(Window.partitionBy())
    # Empty input (total == 0) would make freq and chi2 0/0 = NaN;
    # emit NULL stats on the 9-row spine instead (documented contract).
    freq = F.try_divide(F.col("n"), total)
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    chi2_term = F.try_divide(
        (F.col("n") - total * benford) * (F.col("n") - total * benford),
        total * benford)
    w_all = Window.partitionBy()
    return (counts
            .withColumn("freq", F.round(freq, 6))
            .withColumn("benford", F.round(benford, 6))
            .withColumn("chi2",
                        F.when(total > 0,
                               F.round(F.sum(chi2_term).over(w_all), 6)))
            .select("digit", "n", "freq", "benford", "chi2")
            .orderBy("digit"))
