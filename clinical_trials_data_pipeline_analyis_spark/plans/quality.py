"""Data-quality assertion suite.

Encodes the reference's de-facto correctness method — its ~1,650 lines of
exploratory QA queries (``aact_silver_layer.sql:567-2215``) — as
executable invariants (SURVEY.md §5 table). Each check returns the number
of violating rows (0 == pass) so the suite can run as a post-write gate
in the pipeline driver and as pytest assertions.

All checks are aggregations, not collect()-loops — they run distributed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig


@dataclass(frozen=True)
class CheckResult:
    name: str
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def _count(df: DataFrame) -> int:
    return df.count()


def check_unique_key(df: DataFrame, *keys: str, name: str = "") -> CheckResult:
    """PK-style uniqueness (replaces ALTER TABLE ADD PRIMARY KEY, S7;
    duplicate-detection QA aact_silver_layer.sql:588-590)."""
    dupes = df.groupBy(*keys).count().filter(F.col("count") > 1)
    return CheckResult(name or f"unique({','.join(keys)})", _count(dupes))


def check_no_nulls(df: DataFrame, *cols: str, name: str = "") -> CheckResult:
    """Null-count audit (aact_silver_layer.sql:583-584,697-700): columns
    declared fully-imputed must have zero NULLs."""
    cond = None
    for col in cols:
        c = F.col(col).isNull()
        cond = c if cond is None else (cond | c)
    return CheckResult(name or f"no_nulls({','.join(cols)})", _count(df.filter(cond)))


def check_domain(df: DataFrame, col: str, allowed: list[str]) -> CheckResult:
    """Distribution check after recode (aact_silver_layer.sql:644-646):
    recoded domain must be a subset of the declared category set."""
    bad = df.filter(~F.col(col).isin(allowed) | F.col(col).isNull())
    return CheckResult(f"domain({col})", _count(bad))


def check_bounds(
    df: DataFrame, col: str, lo=None, hi=None, name: str = ""
) -> CheckResult:
    """Outlier bounds MIN/MAX audit (aact_silver_layer.sql:923-924)."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return CheckResult(name or f"bounds({col})", _count(df.filter(cond)))


def check_mutually_exclusive(df: DataFrame, a: str, b: str) -> CheckResult:
    """Mutual-exclusivity proof (aact_silver_layer.sql:966-984):
    number_of_arms / number_of_groups never both non-null."""
    both = df.filter(F.col(a).isNotNull() & F.col(b).isNotNull())
    return CheckResult(f"mutex({a},{b})", _count(both))


def check_implies_nonnull(df: DataFrame, if_col: str, then_col: str) -> CheckResult:
    """Cross-column logic validation (aact_silver_layer.sql:1385-1391):
    then_col non-null wherever if_col non-null."""
    bad = df.filter(F.col(if_col).isNotNull() & F.col(then_col).isNull())
    return CheckResult(f"implies({if_col}->{then_col})", _count(bad))


def check_row_preservation(src: DataFrame, dst: DataFrame, name: str) -> CheckResult:
    """Row-preservation: 1:1 CTAS keeps the count (SURVEY §5)."""
    return CheckResult(name, abs(src.count() - dst.count()))


PHASE_DOMAIN = ["PHASE 1", "PHASE 2", "PHASE 3", "PHASE 4", "Not Applicable"]
OVERALL_STATUS_DOMAIN = ["Active", "Complete", "Stopped", "Unknown"]
YES_NO_UNKNOWN = ["Yes", "No", "Unknown"]


def silver_studies_suite(
    bronze: DataFrame,
    silver: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> list[CheckResult]:
    """The full invariants table from SURVEY.md §5 for silver.studies."""
    imputed_cols = [
        "report_status", "start_date_type", "verification_date_type",
        "completion_date_type", "primary_completion_date_type", "study_type",
        "acronym", "baseline_population", "brief_title", "official_title",
        "overall_status", "last_known_status", "phase", "enrollment",
        "enrollment_type", "source", "limitations_and_caveats",
        "number_of_participants_groups", "why_stopped",
        "why_stopped_category", "has_expanded_access", "has_dmc",
        "is_fda_regulated_drug", "is_fda_regulated_device",
        "is_unapproved_device", "is_ppsd", "is_us_export",
        "biospec_retention", "source_class", "delayed_posting",
        "expanded_access_status_for_nctid", "fdaaa801_violation",
        "patient_registry", "target_duration_flag",
    ]
    return [
        check_unique_key(silver, "nct_id", name="studies_pk"),
        check_no_nulls(silver, *imputed_cols, name="imputed_no_nulls"),
        check_domain(silver, "phase", PHASE_DOMAIN),
        check_domain(silver, "overall_status", OVERALL_STATUS_DOMAIN),
        check_domain(silver, "has_dmc", YES_NO_UNKNOWN),
        check_bounds(
            silver,
            "start_date",
            lo=config.min_valid_date,
            hi=config.analysis_date,
            name="start_date_window",
        ),
        check_bounds(
            silver, "target_duration_days", hi=config.duration_cap_days
        ),
        # Enrollment caps apply per study_type (UNKNOWN is uncapped, as in
        # the reference: aact_silver_layer.sql:162-167).
        CheckResult(
            "enrollment_caps",
            _count(
                silver.filter(
                    (
                        (F.col("study_type") == "OBSERVATIONAL")
                        & (F.col("enrollment") > config.enrollment_cap_observational)
                    )
                    | (
                        (F.col("study_type") == "INTERVENTIONAL")
                        & (F.col("enrollment") > config.enrollment_cap_interventional)
                    )
                    | (F.col("enrollment") < 0)
                )
            ),
        ),
        check_mutually_exclusive(bronze, "number_of_arms", "number_of_groups"),
        check_implies_nonnull(
            silver, "expanded_access_nctid", "expanded_access_status_for_nctid"
        ),
        check_row_preservation(bronze, silver, "studies_row_preservation"),
    ]
