"""Silver layer: cleansing / conformance / enrichment transforms.

Pure ``DataFrame -> DataFrame`` functions (so they also run unchanged
under Structured Streaming ``foreachBatch``). Each mirrors one reference
CTAS; every fidelity note from SURVEY.md §2.10 is preserved:

- N1: all expressions read RAW bronze columns in ONE ``select`` — e.g.
  ``is_unapproved_device`` tests raw ``is_fda_regulated_device = 't'``,
  never the cleaned 'Yes'.
- N2: ``phase IN ('NA', NULL)`` never matches NULL — NULL phases land in
  'PHASE 4'.
- N3: first-match-wins ILIKE chains in the exact live order (note
  'Funding Issues' demoted to 16th).
- N4: decimal duration strings yield NULL via try_cast (documented).
- N5: ``CURRENT_DATE`` replaced by the injectable ``analysis_date``.

Physical shape: the whole studies cleaner is one Project node — Catalyst
collapses it into a single whole-stage-codegen'd map stage with zero
shuffles; the mapping joins (sponsors/interventions) broadcast their
lookup side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.cleaning import (
    duration_flag,
    first_match_category,
    null_to,
    parse_duration_days,
    pg_bool_yes_no,
    truncate_at_comma,
)

# ---------------------------------------------------------------------
# Pattern constants (single source of truth: the pytest oracle SQL is
# generated from these same lists, so Spark and DuckDB can't drift).
# ---------------------------------------------------------------------

#: aact_silver_layer.sql:194-213 — order is load-bearing (N3); the live
#: script demoted 'Funding Issues' below the other categories.
WHY_STOPPED_BRANCHES: list[tuple[list[str], str]] = [
    (["%not started%", "%not initiated%", "%canceled%", "%abandoned%",
      "%not activated%", "%withdrawn%", "%did not start%"],
     "Study Not Initiated"),
    (["%interim analysis%", "%futility%", "%dsmb%", "%stopping rule%"],
     "Early Termination (Interim Analysis/Futility)"),
    (["%unethical%", "%ethical committee%", "%consent%", "%irb%"],
     "Ethical/Regulatory Issues"),
    (["%pharmacokinetic%", "%pk/pd%", "%tolerability%"],
     "PK/PD or Tolerability Issues"),
    (["%graft failure%", "%software%", "%unreliable data%",
      "%technical problem%"],
     "Technical/Procedural Failure"),
    (["%recruitment%", "%enrollment%", "%enrolment%", "%accrual%",
      "%recruit%", "%patients%", "%participants%", "%subjects%",
      "%inclusion%", "%accrue%"],
     "Recruitment Issues"),
    (["%safety%", "%toxicity%", "%adverse event%", "%risk%"],
     "Safety Concern"),
    (["%efficacy%", "%endpoint%", "%benefit%", "%objective%", "%superior%",
      "%therapeutic effect%", "%not effective%", "%no difference%"],
     "Efficacy Issues"),
    (["%covid-19%", "%covid%", "%corona pandemic%", "%pandemic%"],
     "COVID-19 Related"),
    (["%business%", "%administrative%", "%sponsor%", "%strategic%",
      "%corporate%", "%development program%", "%decision%"],
     "Business/Admin Decision"),
    (["%investigator%", "%pi leaving%", "%pi relocated%", "%personnel%",
      "%staff%", "%pi left%", "%pi decision%"],
     "Investigator/Site Issues"),
    (["%device%", "%drug%", "%supply%", "%resource%", "%equipment%",
      "%logistic%", "%technical%", "%materials%"],
     "Logistical/Resource Issues"),
    (["%approval%", "%fda%", "%regulatory%", "%authorities%"],
     "Regulatory/Approval Issues"),
    (["%design%", "%protocol%"], "Study Design Issues"),
    (["%feasible%", "%feasibility%", "%practical%"],
     "Study Feasibility Issues"),
    (["%fund%", "%financial%", "%budget%"], "Funding Issues"),
]

#: aact_silver_layer.sql:454-500 — the 12-way therapeutic-area categorizer.
THERAPEUTIC_AREA_BRANCHES: list[tuple[list[str], str]] = [
    (["%cancer%", "%carcinoma%", "%tumor%", "%lymphoma%", "%leukemia%",
      "%sarcoma%", "%neoplasm%", "%melanoma%", "%myeloma%",
      "%glioblastoma%"],
     "Oncology"),
    (["%neuro%", "%nervous%", "%stroke%", "%alzheimer%", "%parkinson%",
      "%brain%", "%spinal%", "%dementia%", "%epilepsy%",
      "%multiple sclerosis%", "%cognitive impairment%"],
     "Central Nervous System"),
    (["%cardiac%", "%heart%", "%vascular%", "%artery%", "%hypertension%",
      "%atrial fibrillation%", "%atherosclerosis%",
      "%myocardial infarction%"],
     "Cardiovascular"),
    (["%obesity%", "%diabetes%", "%metabolic syndrome%", "%overweight%",
      "%hypercholesterolemia%", "%insulin resistance%"],
     "Metabolic"),
    (["%hiv%", "%covid-19%", "%influenza%", "%hepatitis%", "%tuberculosis%",
      "%malaria%", "%sepsis%", "%pneumonia%", "%infection%"],
     "Infectious Disease"),
    (["%rheumatoid arthritis%", "%crohn's disease%", "%ulcerative colitis%",
      "%psoriasis%", "%inflammation%", "%atopic dermatitis%", "%asthma%"],
     "Inflammatory & Autoimmune"),
    (["%depression%", "%anxiety%", "%schizophrenia%", "%bipolar disorder%",
      "%insomnia%", "%stress%", "%autism%", "%depressive disorder%"],
     "Mental Health"),
    (["%copd%", "%pulmonary%", "%cystic fibrosis%", "%sleep apnea%"],
     "Respiratory"),
    (["%osteoarthritis%", "%low back pain%", "%osteoporosis%",
      "%arthritis%", "%sarcopenia%", "%fibromyalgia%"],
     "Musculoskeletal"),
    (["%pain%", "%anesthesia%", "%analgesia%", "%migraine%"],
     "Pain & Anesthesiology"),
    (["%bully%", "%teen pregnancy%", "%smoking cessation%", "%exercise%",
      "%physical activity%", "%smoking%"],
     "Social & Behavioral"),
]

_COMPLETED_STATUSES = ("COMPLETED", "APPROVED_FOR_MARKETING")


def silver_studies(
    bronze: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """The ~40-expression studies cleaner (``aact_silver_layer.sql:13-408``).

    One ``select`` over raw bronze columns (N1) followed by the
    target_duration derivation, which the reference applies in an outer
    SELECT over the CTE — the duration expressions only read the raw
    ``target_duration`` passthrough column, so composing them into the
    same projection is semantics-preserving (and Catalyst collapses the
    reference's two-level shape to this anyway).
    """
    c = F.col
    analysis_date = F.lit(config.analysis_date)
    min_date = F.lit(config.min_valid_date)

    completed = c("overall_status").isin(*_COMPLETED_STATUSES)

    def date_outlier(col: Column) -> Column:
        return (col < min_date) | (col > analysis_date)

    start_bad = c("start_date").isNull() | date_outlier(c("start_date"))
    completion_outlier = date_outlier(c("completion_date"))
    primary_outlier = date_outlier(c("primary_completion_date"))
    completed_missing_any = completed & (
        c("primary_completion_date").isNull()
        | c("completion_date").isNull()
        | c("last_update_submitted_date").isNull()
    )

    exprs: list[Column] = [
        c("nct_id"),
        c("study_first_submitted_date"),
        # report_status (:18-24)
        F.when(c("results_first_submitted_date").isNotNull(), "Report submitted")
        .when(
            completed & c("results_first_submitted_date").isNull(),
            "Completed but no report Recorded",
        )
        .otherwise("No Report Submitted")
        .alias("report_status"),
        c("results_first_submitted_date"),
        c("disposition_first_submitted_date"),
        c("last_update_submitted_date"),
        c("study_first_submitted_qc_date"),
        c("study_first_posted_date"),
        c("study_first_posted_date_type"),
        c("results_first_submitted_qc_date"),
        c("results_first_posted_date"),
        # results_first_posted_date_type (:33-39)
        F.when(
            completed & c("results_first_submitted_date").isNull(),
            "Completed but study not posted",
        )
        .when(c("results_first_submitted_date").isNull(), "Result not posted")
        .otherwise(c("results_first_posted_date_type"))
        .alias("results_first_posted_date_type"),
        c("disposition_first_submitted_qc_date"),
        c("disposition_first_posted_date"),
        c("disposition_first_posted_date_type"),
        c("last_update_submitted_qc_date"),
        c("last_update_posted_date"),
        c("last_update_posted_date_type"),
        # start_date_type (:47-53)
        F.when(start_bad, "Imputed")
        .when(c("start_date_type").isNull(), "Not Categorized")
        .otherwise(c("start_date_type"))
        .alias("start_date_type"),
        # start_date (:55-59)
        F.when(start_bad, c("study_first_submitted_date"))
        .otherwise(c("start_date"))
        .alias("start_date"),
        c("verification_date"),
        # verification_date_type (:61-66) — note the reference's literal
        # double space in 'Invalid  - Verification too early'.
        F.when(c("verification_date").isNull(), "Information Witheld")
        .when(
            c("verification_date") < c("study_first_submitted_date"),
            "Invalid  - Verification too early",
        )
        .when(c("verification_date") > analysis_date, "Invalid - In the future")
        .otherwise("Valid")
        .alias("verification_date_type"),
        # completion_date_type (:68-76)
        F.when(
            c("completion_date_type").isNotNull() & completion_outlier, "Imputed"
        )
        .when(completed_missing_any, "Imputed")
        .when(c("completion_date_type").isNull(), "ESTIMATED")
        .otherwise(c("completion_date_type"))
        .alias("completion_date_type"),
        # completion_date (:78-86)
        F.when(
            c("completion_date").isNotNull() & completion_outlier,
            c("last_update_submitted_date"),
        )
        .when(
            completed,
            F.coalesce(c("completion_date"), c("last_update_submitted_date")),
        )
        .otherwise(c("completion_date"))
        .alias("completion_date"),
        # primary_completion_date (:88-96)
        F.when(
            c("primary_completion_date").isNotNull() & primary_outlier,
            c("last_update_submitted_date"),
        )
        .when(
            completed,
            F.coalesce(
                c("primary_completion_date"), c("last_update_submitted_date")
            ),
        )
        .otherwise(c("primary_completion_date"))
        .alias("primary_completion_date"),
        # primary_completion_date_type (:98-106)
        F.when(
            c("primary_completion_date_type").isNotNull() & primary_outlier,
            "Imputed",
        )
        .when(completed_missing_any, "Imputed")
        .when(c("primary_completion_date_type").isNull(), "ESTIMATED")
        .otherwise(c("primary_completion_date_type"))
        .alias("primary_completion_date_type"),
        c("target_duration"),
        null_to(c("study_type"), "UNKNOWN").alias("study_type"),
        null_to(c("acronym"), "[No Acronym defined]").alias("acronym"),
        null_to(c("baseline_population"), "[Not Defined]").alias(
            "baseline_population"
        ),
        null_to(c("brief_title"), "[No Brief Title]").alias("brief_title"),
        null_to(c("official_title"), "[No Official Title]").alias(
            "official_title"
        ),
        # overall_status recode (:140-145)
        F.when(
            c("overall_status").isin(
                "RECRUITING",
                "ACTIVE_NOT_RECRUITING",
                "NOT_YET_RECRUITING",
                "ENROLLING_BY_INVITATION",
            ),
            "Active",
        )
        .when(c("overall_status").isin(*_COMPLETED_STATUSES), "Complete")
        .when(
            c("overall_status").isin("TERMINATED", "WITHDRAWN", "SUSPENDED"),
            "Stopped",
        )
        .otherwise("Unknown")
        .alias("overall_status"),
        null_to(c("last_known_status"), "NO STATUS UPDATE").alias(
            "last_known_status"
        ),
        # phase recode (:154-160) — N2: isin never matches NULL, so NULL
        # phases deliberately land in 'PHASE 4'. Do not "fix".
        F.when(c("phase").isin("PHASE1", "EARLY_PHASE1"), "PHASE 1")
        .when(c("phase").isin("PHASE1/PHASE2", "PHASE2"), "PHASE 2")
        .when(c("phase").isin("PHASE2/PHASE3", "PHASE3"), "PHASE 3")
        .when(c("phase").isin("NA"), "Not Applicable")
        .otherwise("PHASE 4")
        .alias("phase"),
        # enrollment caps (:162-167)
        F.when(c("enrollment").isNull(), 0)
        .when(
            (c("study_type") == "OBSERVATIONAL")
            & (c("enrollment") > config.enrollment_cap_observational),
            config.enrollment_cap_observational,
        )
        .when(
            (c("study_type") == "INTERVENTIONAL")
            & (c("enrollment") > config.enrollment_cap_interventional),
            config.enrollment_cap_interventional,
        )
        .otherwise(c("enrollment"))
        .alias("enrollment"),
        null_to(c("enrollment_type"), "Unknown").alias("enrollment_type"),
        null_to(c("source"), "Unknown").alias("source"),
        null_to(c("limitations_and_caveats"), "[Not Defined]").alias(
            "limitations_and_caveats"
        ),
        # mutually-exclusive arms/groups merge (:187)
        F.coalesce(c("number_of_arms"), c("number_of_groups"), F.lit(0)).alias(
            "number_of_participants_groups"
        ),
        null_to(c("why_stopped"), "No Comment").alias("why_stopped"),
        # why_stopped_category (:194-213): 16 ordered branches, then
        # IS NOT NULL -> 'Other', else 'No Comment'.
        _why_stopped_category(c("why_stopped")).alias("why_stopped_category"),
        # has_expanded_access derived from expanded_access_nctid (:215-219)
        F.when(c("expanded_access_nctid").isNull(), "No")
        .otherwise("Yes")
        .alias("has_expanded_access"),
        F.when(c("expanded_access_type_individual").isNull(), "No")
        .otherwise("Yes")
        .alias("expanded_access_type_individual"),
        F.when(c("expanded_access_type_intermediate").isNull(), "No")
        .otherwise("Yes")
        .alias("expanded_access_type_intermediate"),
        F.when(c("expanded_access_type_treatment").isNull(), "No")
        .otherwise("Yes")
        .alias("expanded_access_type_treatment"),
        pg_bool_yes_no(c("has_dmc")).alias("has_dmc"),
        pg_bool_yes_no(c("is_fda_regulated_drug")).alias("is_fda_regulated_drug"),
        pg_bool_yes_no(c("is_fda_regulated_device")).alias(
            "is_fda_regulated_device"
        ),
        # is_unapproved_device (:261-267) — reads RAW is_fda_regulated_device
        F.when(c("is_unapproved_device") == "t", "Unapproved")
        .when(
            (c("is_fda_regulated_device") == "t")
            & c("is_unapproved_device").isNull(),
            "Approved",
        )
        .otherwise("Not Applicable")
        .alias("is_unapproved_device"),
        # is_ppsd (:269-275)
        F.when(c("is_ppsd") == "t", "PPSD study")
        .when(
            (c("is_fda_regulated_device") == "t") & c("is_ppsd").isNull(),
            "Not PPSD study",
        )
        .otherwise("Not Applicable")
        .alias("is_ppsd"),
        pg_bool_yes_no(c("is_us_export")).alias("is_us_export"),
        null_to(c("biospec_retention"), "Unknown").alias("biospec_retention"),
        null_to(c("biospec_description"), "Not defined").alias(
            "biospec_description"
        ),
        null_to(c("ipd_time_frame"), "Not specified").alias("ipd_time_frame"),
        null_to(c("ipd_access_criteria"), "Not specified").alias(
            "ipd_access_criteria"
        ),
        null_to(c("ipd_url"), "Not specified").alias("ipd_url"),
        null_to(c("plan_to_share_ipd"), "Not specified").alias(
            "plan_to_share_ipd"
        ),
        null_to(c("plan_to_share_ipd_description"), "Not specified").alias(
            "plan_to_share_ipd_description"
        ),
        c("created_at"),
        c("updated_at"),
        null_to(c("source_class"), "UNKNOWN").alias("source_class"),
        # delayed_posting (:335-339): only 't' means Yes
        F.when(c("delayed_posting") == "t", "Yes")
        .otherwise("Not Specified")
        .alias("delayed_posting"),
        c("expanded_access_nctid"),
        # expanded_access_status_for_nctid (:342-346)
        F.when(
            c("expanded_access_status_for_nctid").isNull(), "Not Applicable"
        )
        .otherwise(
            F.replace(
                c("expanded_access_status_for_nctid"), F.lit("_"), F.lit(" ")
            )
        )
        .alias("expanded_access_status_for_nctid"),
        # fdaaa801_violation (:348-352): NULL means no violation
        F.when(c("fdaaa801_violation") == "t", "Violation")
        .otherwise("No Violation")
        .alias("fdaaa801_violation"),
        pg_bool_yes_no(c("patient_registry")).alias("patient_registry"),
        # target_duration parser + flag (:370-406)
        parse_duration_days(c("target_duration"), config.duration_cap_days)
        .alias("target_duration_days"),
        duration_flag(c("target_duration"), config.duration_cap_days).alias(
            "target_duration_flag"
        ),
    ]
    return bronze.select(*exprs)


def _why_stopped_category(col: Column) -> Column:
    expr = None
    from ..functions.cleaning import ilike_any

    for patterns, label in WHY_STOPPED_BRANCHES:
        cond = ilike_any(col, patterns)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    # The reference applies the chain to raw why_stopped; our input here is
    # the already-imputed column would break the final IS NOT NULL arm, so
    # this helper must receive the RAW column. silver_studies passes raw.
    return expr.when(col.isNotNull(), "Other").otherwise("No Comment")


def silver_sponsors(bronze_sponsors: DataFrame, mapping: DataFrame) -> DataFrame:
    """Entity standardization via mapping lookup
    (``aact_silver_layer.sql:417-430``): LEFT JOIN on the raw name,
    COALESCE(clean, raw) + default category 'Other'. Mapping side broadcast."""
    raw = bronze_sponsors.alias("raw")
    m = mapping.alias("map")
    return raw.join(
        F.broadcast(m), F.col("raw.name") == F.col("map.raw_sponsor_name"), "left"
    ).select(
        F.col("raw.id").alias("id"),
        F.col("raw.nct_id").alias("nct_id"),
        F.coalesce(F.col("map.clean_sponsor_name"), F.col("raw.name")).alias(
            "clean_sponsor_name"
        ),
        F.coalesce(F.col("map.sponsor_category"), F.lit("Other")).alias(
            "sponsor_category"
        ),
        F.col("raw.lead_or_collaborator").alias("lead_or_collaborator"),
    )


def silver_conditions(bronze_conditions: DataFrame) -> DataFrame:
    """Comma truncation + therapeutic-area categorization
    (``aact_silver_layer.sql:439-502``)."""
    return bronze_conditions.select(
        "id",
        "nct_id",
        truncate_at_comma(F.col("downcase_name")).alias("name"),
        first_match_category(
            F.col("downcase_name"), THERAPEUTIC_AREA_BRANCHES, "Others"
        ).alias("therapeutic_area"),
    )


def silver_interventions(
    bronze_interventions: DataFrame, mapping: DataFrame
) -> DataFrame:
    """Normalized-key mapping join (``aact_silver_layer.sql:515-530``):
    join on LOWER(TRIM(name)), NULL name -> 'no intervention'."""
    raw = bronze_interventions.alias("raw")
    m = mapping.alias("map")
    join_key = F.lower(F.trim(F.col("raw.name")))
    return raw.join(
        F.broadcast(m), join_key == F.col("map.raw_name"), "left"
    ).select(
        F.col("raw.id").alias("id"),
        F.col("raw.nct_id").alias("nct_id"),
        F.when(F.col("raw.name").isNull(), "no intervention")
        .otherwise(
            F.coalesce(F.col("map.clean_name"), F.lower(F.trim(F.col("raw.name"))))
        )
        .alias("name"),
        F.col("raw.intervention_type").alias("intervention_type"),
    )


def silver_outcomes(bronze_outcomes: DataFrame) -> DataFrame:
    """Trim + impute, drop granular stats columns
    (``aact_silver_layer.sql:539-548``; drop rationale ``:558-562``)."""
    return bronze_outcomes.select(
        "id",
        "nct_id",
        "outcome_type",
        F.coalesce(F.trim(F.col("title")), F.lit("not specified")).alias("title"),
        F.coalesce(F.trim(F.col("time_frame")), F.lit("not specified")).alias(
            "time_frame"
        ),
        F.coalesce(F.trim(F.col("population")), F.lit("not specified")).alias(
            "population"
        ),
    )
