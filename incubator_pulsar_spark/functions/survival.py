"""Survival analysis: the Kaplan–Meier product-limit estimator —
churn/retention curves with right-censoring (the statistic behind
"what fraction of users survive past day N", subscription lifetime
curves, and reliability analysis), which plain retention counting
gets WRONG when observation windows differ (censored users are not
churned users; dropping them biases the curve down).

Determinism discipline: durations are exact integers, at-risk /
event counts are exact BIGINTs, each survival factor's
ln(1 − d/n) snaps to 9 decimals (d/n is one IEEE-exact division;
ln is the only libm surface — the module-wide snap rule), the
log-survival accumulates in exact DECIMAL, and ONE exp + round-6
lands at the end (exp's last-ulp engine drift is invisible under
round-6 except on measure-zero ties, the established transcendental
posture). The d = n extinction step (ln 0 = −∞) short-circuits to
an exact 0.0 via a cumulative flag, never through the float path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(df: DataFrame, group_cols: list[str], *,
                 duration_col: str, event_col: str) -> DataFrame:
    """Kaplan–Meier survival curve per group over (duration, event)
    rows — duration an exact INTEGER time-to-event-or-censoring
    (days, hours, ms — any unit), event 1 = observed (churned /
    failed), 0 = right-censored (still alive when observation ended):

        S(t) = Π over event times u ≤ t of (1 − d_u / n_u)

    with d_u = events AT u and n_u = subjects at risk (duration ≥ u;
    the standard deaths-before-censoring convention at tied times).
    One curve row per EVENT time (censoring-only times move n
    silently, as in the textbook estimator).

    Plan: one (group, duration) count aggregation, one descending
    cumulative window for the at-risk counts (n_risk at t = the
    desc-cumsum of all subjects at ≥ t — no self-join), one ascending
    cumulative window for the log-survival fold. Both windows share
    the group partition — one shuffle total.

    Output: group_cols + (duration BIGINT, n_risk BIGINT,
    n_events BIGINT, survival DOUBLE round-6, monotone non-increasing
    per group; exactly 0.0 after an extinction step).
    """
    base = (df.select(*group_cols,
                      F.col(duration_col).cast("long").alias("_t"),
                      F.col(event_col).cast("int").alias("_e"))
            .filter(F.col("_t").isNotNull() & F.col("_e").isNotNull()))
    per_t = (base.groupBy(*group_cols, "_t")
             .agg(F.count(F.lit(1)).cast("long").alias("_c"),
                  F.sum("_e").cast("long").alias("_d")))
    w_desc = (Window.partitionBy(*group_cols)
              .orderBy(F.col("_t").desc())
              .rowsBetween(Window.unboundedPreceding, 0))
    w_asc = (Window.partitionBy(*group_cols).orderBy("_t")
             .rowsBetween(Window.unboundedPreceding, 0))
    risked = per_t.withColumn("_n", F.sum("_c").over(w_desc))
    # ln(1 − d/n) snapped; NULL on non-event rows (they don't factor)
    term = F.when(
        (F.col("_d") > 0) & (F.col("_d") < F.col("_n")),
        F.round(F.log(F.lit(1.0)
                      - F.col("_d").cast("double")
                      / F.col("_n").cast("double")), 9)
        .cast("decimal(38,9)"))
    curved = (risked
              .withColumn("_lnS", F.sum(term).over(w_asc))
              .withColumn("_dead",
                          F.max((F.col("_d") == F.col("_n"))
                                .cast("int")).over(w_asc)))
    surv = F.when(F.col("_dead") == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.coalesce(F.col("_lnS").cast("double"),
                                 F.lit(0.0))), 6))
    return (curved.filter(F.col("_d") > 0)
            .select(*group_cols, F.col("_t").alias("duration"),
                    F.col("_n").alias("n_risk"),
                    F.col("_d").alias("n_events"),
                    surv.alias("survival")))
