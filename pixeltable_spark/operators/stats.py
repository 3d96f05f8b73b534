"""Experimentation statistics: Welch's two-sample t-test for A/B
analysis, computed entirely in whole-stage-codegen column math.

100 TB design: ONE conditional-aggregate pass (no per-group scans, no
join, no driver math beyond reading the single output row) — n / mean /
sample variance per variant ride the same map-side-combined aggregate.
The normal CDF uses the Abramowitz & Stegun 7.1.26 erf polynomial
(|err| < 1.5e-7, plenty for experiment decisions) expressed as column
arithmetic: both this engine and any SQL oracle evaluate the IDENTICAL
IEEE-double formula, so results are bit-comparable across engines —
which is the property that makes an experiment readout auditable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A&S 7.1.26 coefficients
_ERF_P = 0.3275911
_ERF_A = (0.254829592, -0.284496736, 1.421413741,
          -1.453152027, 1.061405429)


def erf_approx(x: Column) -> Column:
    """Abramowitz & Stegun 7.1.26 polynomial erf (|error| < 1.5e-7),
    odd-extended to negative x. Pure column math — stays in codegen."""
    ax = F.abs(x)
    t = 1.0 / (1.0 + _ERF_P * ax)
    poly = F.lit(0.0)
    for a in reversed(_ERF_A):
        poly = (poly + a) * t
    e = 1.0 - poly * F.exp(-(ax * ax))
    return F.signum(x) * e


def normal_cdf(x: Column) -> Column:
    """Phi(x) via erf_approx."""
    return 0.5 * (1.0 + erf_approx(x / F.lit(2.0 ** 0.5)))


def ab_test(df: DataFrame, metric_col: str, group_col: str,
            control, treatment) -> DataFrame:
    """Welch's unequal-variance two-sample t-test: one row with per-
    variant n/mean, the difference, Welch's t statistic and degrees of
    freedom, and the two-sided p-value from the NORMAL approximation to
    the t distribution (appropriate for the large n where this operator
    matters; for n < ~30 use a local stats package on the collected
    aggregate — the aggregates here are the expensive part).

    Rows whose group is neither `control` nor `treatment`, or whose
    metric is NULL, are excluded. Raises downstream (NULL stats) if a
    variant has < 2 observations or zero variance in both arms."""
    x = F.col(metric_col).cast("double")
    is_c = F.col(group_col) == F.lit(control)
    is_t = F.col(group_col) == F.lit(treatment)
    xc, xt = F.when(is_c, x), F.when(is_t, x)
    agg = df.agg(
        F.count(xc).alias("n_c"), F.count(xt).alias("n_t"),
        F.avg(xc).alias("mean_c"), F.avg(xt).alias("mean_t"),
        F.var_samp(xc).alias("__v_c"), F.var_samp(xt).alias("__v_t"))
    se2_c = F.col("__v_c") / F.col("n_c")
    se2_t = F.col("__v_t") / F.col("n_t")
    se = F.sqrt(se2_c + se2_t)
    # both arms zero-variance -> undefined test -> NULL, not an ANSI
    # divide-by-zero
    t_stat = F.when(se > 0, (F.col("mean_t") - F.col("mean_c")) / se)
    # Welch df guards: n=1 arms make (n-1)=0 and zero-variance arms make
    # the whole denominator 0 — both must yield NULL, not kill the job
    # (var_samp already returns NULL for n<2, so the per-arm guard only
    # needs to dodge the 0/0; the outer guard covers 0-variance arms)
    nm1_c, nm1_t = F.col("n_c") - 1, F.col("n_t") - 1
    d = (F.when(nm1_c > 0, se2_c * se2_c / nm1_c).otherwise(F.lit(0.0))
         + F.when(nm1_t > 0, se2_t * se2_t / nm1_t).otherwise(F.lit(0.0)))
    welch_df = F.when(d > 0, (se2_c + se2_t) * (se2_c + se2_t) / d)
    p = 2.0 * (1.0 - normal_cdf(F.abs(t_stat)))
    return agg.select(
        "n_c", "n_t",
        F.round("mean_c", 6).alias("mean_c"),
        F.round("mean_t", 6).alias("mean_t"),
        F.round(F.col("mean_t") - F.col("mean_c"), 6).alias("diff"),
        F.round(t_stat, 6).alias("t_stat"),
        F.round(welch_df, 6).alias("welch_df"),
        F.round(p, 6).alias("p_value"))


def two_proportion_test(df: DataFrame, success_col: str, group_col: str,
                        control, treatment) -> DataFrame:
    """Two-proportion z-test (conversion-rate A/B): per-variant trials/
    successes/rate, the rate difference, the pooled-variance z statistic

        z = (p_t - p_c) / sqrt(p_pool (1 - p_pool) (1/n_c + 1/n_t))

    and the two-sided p-value via the same A&S erf polynomial as
    ab_test. `success_col` is evaluated as a boolean (non-null true =
    success). ONE conditional-aggregate pass, column math in codegen,
    oracle-replayable IEEE association order."""
    s = F.col(success_col).cast("boolean")
    is_c = F.col(group_col) == F.lit(control)
    is_t = F.col(group_col) == F.lit(treatment)
    agg = df.agg(
        F.count(F.when(is_c, F.lit(1))).alias("n_c"),
        F.count(F.when(is_t, F.lit(1))).alias("n_t"),
        F.count(F.when(is_c & s, F.lit(1))).alias("succ_c"),
        F.count(F.when(is_t & s, F.lit(1))).alias("succ_t"))
    # empty arms (n=0) make every ratio 0/0 — NULL stats, not a dead job
    p_c = F.when(F.col("n_c") > 0, F.col("succ_c") / F.col("n_c"))
    p_t = F.when(F.col("n_t") > 0, F.col("succ_t") / F.col("n_t"))
    pool = F.when(F.col("n_c") + F.col("n_t") > 0,
                  (F.col("succ_c") + F.col("succ_t"))
                  / (F.col("n_c") + F.col("n_t")))
    se = F.sqrt(pool * (1.0 - pool)
                * (F.when(F.col("n_c") > 0, 1.0 / F.col("n_c"))
                   + F.when(F.col("n_t") > 0, 1.0 / F.col("n_t"))))
    # pooled rate 0 or 1 (nobody / everybody converts) gives se = 0:
    # the test is undefined -> NULL, not an ANSI divide-by-zero
    z = F.when(se > 0, (p_t - p_c) / se)
    p = 2.0 * (1.0 - normal_cdf(F.abs(z)))
    return agg.select(
        "n_c", "n_t", "succ_c", "succ_t",
        F.round(p_c, 6).alias("rate_c"),
        F.round(p_t, 6).alias("rate_t"),
        F.round(p_t - p_c, 6).alias("diff"),
        F.round(z, 6).alias("z_stat"),
        F.round(p, 6).alias("p_value"))
