"""Data-quality contract (SURVEY.md §5) — dbt test parity as Spark.

Replaces the reference's dbt gates (schema tests in
``dbt/models/staging/schema.yml`` + ``marts/schema.yml``, singular
tests in ``dbt/tests/*.sql``, freshness SLAs in ``sources.yml``) with
DataFrame assertions composed into ONE aggregated validation job.

Every check compiles to a conditional count over the same scan —
``validate`` runs a single job computing all violation counts at once
(one pass, map-side combine) rather than one action per check, which
is what a naive dbt→Spark port would do (N full scans). At 100 TB
that difference is the whole game.

Singular-test parity:
- high ≥ low                (``dbt/tests/assert_high_not_below_low.sql``)
- no future trade dates     (``dbt/tests/assert_no_future_trades.sql``)
- stream window integrity   (``dbt/tests/assert_stream_window_integrity.sql``)
are expressible directly as :func:`expect_zero_rows` predicates.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    violation: Column  # boolean column: TRUE == violating row
    severity: str = "error"  # or "warn" (dbt warn-severity range tests)


@dataclass
class CheckReport:
    total_rows: int
    results: list[dict] = field(default_factory=list)

    @property
    def failures(self) -> list[dict]:
        return [r for r in self.results if r["violations"] > 0 and r["severity"] == "error"]

    @property
    def warnings(self) -> list[dict]:
        return [r for r in self.results if r["violations"] > 0 and r["severity"] == "warn"]

    @property
    def ok(self) -> bool:
        return not self.failures


def expect_not_null(col: str) -> Check:
    return Check(f"not_null:{col}", F.col(col).isNull())


def expect_between(col: str, lo, hi, severity: str = "error") -> Check:
    c = F.col(col)
    return Check(f"between:{col}[{lo},{hi}]", c.isNotNull() & ~c.between(lo, hi), severity)


def expect_accepted_values(col: str, values: list) -> Check:
    c = F.col(col)
    return Check(f"accepted_values:{col}", c.isNotNull() & ~c.isin(values))


def expect_zero_rows(name: str, predicate: Column) -> Check:
    """Singular-test shape: predicate selects violating rows."""
    return Check(f"singular:{name}", predicate)


def unique_check_frame(df: DataFrame, cols: list[str]) -> DataFrame:
    """dbt ``unique`` needs a groupBy — returned as a separate tiny
    aggregate (duplicate key count)."""
    return (
        df.groupBy(*cols)
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count(F.lit(1)).alias("duplicate_keys"))
    )


def validate(
    df: DataFrame,
    checks: list[Check],
    unique_keys: list[list[str]] | None = None,
    freshness: tuple[str, str] | None = None,
) -> CheckReport:
    """Run all checks in one aggregate pass (+1 tiny job per unique key
    set, +1 for freshness).

    freshness: (timestamp_col, max_age_interval) — parity with dbt
    source freshness SLAs (``sources.yml:11-14,52-55``).
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, ch in enumerate(checks):
        aggs.append(F.count_if(ch.violation).alias(f"__c{i}"))
    row = df.agg(*aggs).first()
    report = CheckReport(total_rows=row["__total"])
    for i, ch in enumerate(checks):
        report.results.append(
            {"check": ch.name, "violations": row[f"__c{i}"], "severity": ch.severity}
        )
    for cols in unique_keys or []:
        dup = unique_check_frame(df, cols).first()
        n = dup["duplicate_keys"] if dup else 0
        report.results.append(
            {"check": f"unique:{'+'.join(cols)}", "violations": n or 0, "severity": "error"}
        )
    if freshness:
        ts_col, max_age = freshness
        # Compare in epoch seconds on the JVM side — collecting a
        # timestamp yields a naive datetime rendered in the DRIVER's
        # local timezone, which would skew staleness by the UTC offset
        # on any non-UTC host.
        import time as _time

        mx_epoch = df.agg(
            F.max(F.unix_timestamp(F.col(ts_col))).alias("mx")
        ).first()["mx"]
        is_stale = 1
        if mx_epoch is not None:
            qty, unit = max_age.split()
            seconds = int(qty) * {"HOURS": 3600, "HOUR": 3600, "DAYS": 86400, "DAY": 86400}[
                unit.upper()
            ]
            is_stale = 1 if (_time.time() - mx_epoch) > seconds else 0
        report.results.append(
            {"check": f"freshness:{ts_col}<{max_age}", "violations": is_stale, "severity": "warn"}
        )
    return report


def daily_bars_checks() -> list[Check]:
    """The reference's full contract for the daily mart inputs."""
    return [
        expect_not_null("symbol"),
        expect_not_null("trade_date"),
        expect_not_null("close_price"),
        expect_between("open_price", 0.000001, 1_000_000),
        expect_between("close_price", 0.000001, 1_000_000),
        expect_between("volume", 0, 2**63 - 1),
        expect_zero_rows("high_not_below_low", F.col("high_price") < F.col("low_price")),
        expect_zero_rows("no_future_trades", F.col("trade_date") > F.current_date()),
    ]


def realtime_checks() -> list[Check]:
    return [
        expect_not_null("symbol"),
        expect_not_null("window_start_at"),
        expect_not_null("window_end_at"),
        expect_accepted_values(
            "momentum_signal", ["BULLISH", "BEARISH", "NEUTRAL"]
        ),
        expect_accepted_values(
            "volatility_regime", ["LOW", "NORMAL", "ELEVATED", "HIGH"]
        ),
        expect_zero_rows(
            "stream_window_integrity",
            (F.col("window_end_at") <= F.col("window_start_at"))
            | (F.col("window_duration_minutes") <= 0),
        ),
    ]
