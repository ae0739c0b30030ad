"""DuckDB translation of the reference pipeline, used as an independent
oracle for the Spark medallion plans.

The SQL mirrors /root/reference/aact_{silver,gold}_layer.sql semantics
(with the documented decisions: CURRENT_DATE -> fixed analysis date (N5),
TRY_CAST for the duration parse (N4), DOUBLE instead of REAL in the score
(exactness), unpadded month/day names (N6), total-order surrogate keys).
ILIKE-chain SQL is GENERATED from the same pattern constants the Spark
implementation uses, so patterns cannot drift between the two.
"""

from __future__ import annotations

from clinical_trials_data_pipeline_analyis_spark.plans.silver import (
    THERAPEUTIC_AREA_BRANCHES,
    WHY_STOPPED_BRANCHES,
)

ANALYSIS_DATE = "DATE '2025-08-09'"
MIN_DATE = "DATE '1999-09-17'"


def _sqlq(s: str) -> str:
    return s.replace("'", "''")


def _ilike_or(col: str, patterns: list[str]) -> str:
    return "(" + " OR ".join(f"{col} ILIKE '{_sqlq(p)}'" for p in patterns) + ")"


def _case_chain(col: str, branches, extra_arms: str, otherwise: str) -> str:
    arms = "\n".join(
        f"WHEN {_ilike_or(col, pats)} THEN '{_sqlq(label)}'"
        for pats, label in branches
    )
    return f"CASE\n{arms}\n{extra_arms}\nELSE '{otherwise}'\nEND"


WHY_STOPPED_CASE = _case_chain(
    "why_stopped",
    WHY_STOPPED_BRANCHES,
    "WHEN why_stopped IS NOT NULL THEN 'Other'",
    "No Comment",
)

THERAPEUTIC_AREA_CASE = _case_chain(
    "downcase_name", THERAPEUTIC_AREA_BRANCHES, "", "Others"
)

# Spark's try_cast(string->int) is strict (decimal strings -> NULL, per the
# documented N4 decision); DuckDB's TRY_CAST rounds '1.5' to 2, so the
# oracle guards the cast with a digits-only regex to match Spark.
_NUM = "SPLIT_PART(REGEXP_REPLACE(target_duration, '[^0-9.]', '', 'g'), ' ', 1)"
_INT = f"(CASE WHEN regexp_matches({_NUM}, '^[0-9]+$') THEN CAST({_NUM} AS INTEGER) END)"

_DUR_INNER = f"""
CASE
    WHEN target_duration ILIKE '%Day%' OR target_duration ILIKE '%Days%' THEN {_INT} * 1
    WHEN target_duration ILIKE '%Week%' OR target_duration ILIKE '%Weeks%' THEN {_INT} * 7
    WHEN target_duration ILIKE '%Month%' OR target_duration ILIKE '%Months%' THEN {_INT} * 30
    WHEN target_duration ILIKE '%Year%' OR target_duration ILIKE '%Years%' THEN {_INT} * 365
    ELSE NULL
END
"""

SILVER_STUDIES_SQL = f"""
CREATE OR REPLACE TABLE silver_studies AS
WITH base_cleaning AS (
    SELECT
        nct_id,
        study_first_submitted_date,
        CASE
            WHEN results_first_submitted_date IS NOT NULL THEN 'Report submitted'
            WHEN overall_status IN ('COMPLETED', 'APPROVED_FOR_MARKETING') AND results_first_submitted_date IS NULL
                THEN 'Completed but no report Recorded'
            ELSE 'No Report Submitted'
        END AS report_status,
        results_first_submitted_date,
        disposition_first_submitted_date,
        last_update_submitted_date,
        study_first_submitted_qc_date,
        study_first_posted_date,
        study_first_posted_date_type,
        results_first_submitted_qc_date,
        results_first_posted_date,
        CASE
            WHEN overall_status IN ('COMPLETED', 'APPROVED_FOR_MARKETING') AND results_first_submitted_date IS NULL
                THEN 'Completed but study not posted'
            WHEN results_first_submitted_date IS NULL THEN 'Result not posted'
            ELSE results_first_posted_date_type
        END AS results_first_posted_date_type,
        disposition_first_submitted_qc_date,
        disposition_first_posted_date,
        disposition_first_posted_date_type,
        last_update_submitted_qc_date,
        last_update_posted_date,
        last_update_posted_date_type,
        CASE
            WHEN start_date IS NULL OR (start_date < {MIN_DATE}) OR start_date > {ANALYSIS_DATE} THEN 'Imputed'
            WHEN start_date_type IS NULL THEN 'Not Categorized'
            ELSE start_date_type
        END AS start_date_type,
        CASE
            WHEN start_date IS NULL OR (start_date < {MIN_DATE}) OR start_date > {ANALYSIS_DATE}
                THEN study_first_submitted_date
            ELSE start_date
        END AS start_date,
        verification_date,
        CASE
            WHEN verification_date IS NULL THEN 'Information Witheld'
            WHEN verification_date < study_first_submitted_date THEN 'Invalid  - Verification too early'
            WHEN verification_date > {ANALYSIS_DATE} THEN 'Invalid - In the future'
            ELSE 'Valid'
        END AS verification_date_type,
        CASE
            WHEN completion_date_type IS NOT NULL AND
                    (completion_date < {MIN_DATE} OR completion_date > {ANALYSIS_DATE}) THEN 'Imputed'
            WHEN (overall_status IN ('COMPLETED', 'APPROVED_FOR_MARKETING'))
                 AND (primary_completion_date IS NULL OR completion_date IS NULL OR last_update_submitted_date IS NULL)
                THEN 'Imputed'
            WHEN completion_date_type IS NULL THEN 'ESTIMATED'
            ELSE completion_date_type
        END AS completion_date_type,
        CASE
            WHEN completion_date IS NOT NULL AND
                    (completion_date < {MIN_DATE} OR completion_date > {ANALYSIS_DATE})
                THEN last_update_submitted_date
            WHEN overall_status IN ('COMPLETED', 'APPROVED_FOR_MARKETING')
                THEN COALESCE(completion_date, last_update_submitted_date)
            ELSE completion_date
        END AS completion_date,
        CASE
            WHEN primary_completion_date IS NOT NULL AND
                    (primary_completion_date < {MIN_DATE} OR primary_completion_date > {ANALYSIS_DATE})
                THEN last_update_submitted_date
            WHEN overall_status IN ('COMPLETED', 'APPROVED_FOR_MARKETING')
                THEN COALESCE(primary_completion_date, last_update_submitted_date)
            ELSE primary_completion_date
        END AS primary_completion_date,
        CASE
            WHEN primary_completion_date_type IS NOT NULL AND
                    (primary_completion_date < {MIN_DATE} OR primary_completion_date > {ANALYSIS_DATE})
                THEN 'Imputed'
            WHEN (overall_status IN ('COMPLETED', 'APPROVED_FOR_MARKETING'))
                 AND (primary_completion_date IS NULL OR completion_date IS NULL OR last_update_submitted_date IS NULL)
                THEN 'Imputed'
            WHEN primary_completion_date_type IS NULL THEN 'ESTIMATED'
            ELSE primary_completion_date_type
        END AS primary_completion_date_type,
        target_duration,
        CASE WHEN study_type IS NULL THEN 'UNKNOWN' ELSE study_type END AS study_type,
        CASE WHEN acronym IS NULL THEN '[No Acronym defined]' ELSE acronym END AS acronym,
        CASE WHEN baseline_population IS NULL THEN '[Not Defined]' ELSE baseline_population END AS baseline_population,
        CASE WHEN brief_title IS NULL THEN '[No Brief Title]' ELSE brief_title END AS brief_title,
        CASE WHEN official_title IS NULL THEN '[No Official Title]' ELSE official_title END AS official_title,
        CASE
            WHEN overall_status IN ('RECRUITING', 'ACTIVE_NOT_RECRUITING', 'NOT_YET_RECRUITING', 'ENROLLING_BY_INVITATION') THEN 'Active'
            WHEN overall_status IN ('COMPLETED', 'APPROVED_FOR_MARKETING') THEN 'Complete'
            WHEN overall_status IN ('TERMINATED', 'WITHDRAWN', 'SUSPENDED') THEN 'Stopped'
            ELSE 'Unknown'
        END AS overall_status,
        CASE WHEN last_known_status IS NULL THEN 'NO STATUS UPDATE' ELSE last_known_status END AS last_known_status,
        CASE
            WHEN phase IN ('PHASE1', 'EARLY_PHASE1') THEN 'PHASE 1'
            WHEN phase IN ('PHASE1/PHASE2', 'PHASE2') THEN 'PHASE 2'
            WHEN phase IN ('PHASE2/PHASE3', 'PHASE3') THEN 'PHASE 3'
            WHEN phase IN ('NA', NULL) THEN 'Not Applicable'
            ELSE 'PHASE 4'
        END AS phase,
        CASE
            WHEN enrollment IS NULL THEN 0
            WHEN (study_type = 'OBSERVATIONAL') AND (enrollment > 566401) THEN 566401
            WHEN (study_type = 'INTERVENTIONAL') AND (enrollment > 15886) THEN 15886
            ELSE enrollment
        END AS enrollment,
        CASE WHEN enrollment_type IS NULL THEN 'Unknown' ELSE enrollment_type END AS enrollment_type,
        CASE WHEN "source" IS NULL THEN 'Unknown' ELSE "source" END AS "source",
        CASE WHEN limitations_and_caveats IS NULL THEN '[Not Defined]' ELSE limitations_and_caveats END AS limitations_and_caveats,
        COALESCE(number_of_arms, number_of_groups, 0) AS number_of_participants_groups,
        CASE WHEN why_stopped IS NULL THEN 'No Comment' ELSE why_stopped END AS why_stopped,
        {WHY_STOPPED_CASE} AS why_stopped_category,
        CASE WHEN expanded_access_nctid IS NULL THEN 'No' ELSE 'Yes' END AS has_expanded_access,
        CASE WHEN expanded_access_type_individual IS NULL THEN 'No' ELSE 'Yes' END AS expanded_access_type_individual,
        CASE WHEN expanded_access_type_intermediate IS NULL THEN 'No' ELSE 'Yes' END AS expanded_access_type_intermediate,
        CASE WHEN expanded_access_type_treatment IS NULL THEN 'No' ELSE 'Yes' END AS expanded_access_type_treatment,
        CASE WHEN has_dmc = 't' THEN 'Yes' WHEN has_dmc = 'f' THEN 'No' ELSE 'Unknown' END AS has_dmc,
        CASE WHEN is_fda_regulated_drug = 't' THEN 'Yes' WHEN is_fda_regulated_drug = 'f' THEN 'No' ELSE 'Unknown' END AS is_fda_regulated_drug,
        CASE WHEN is_fda_regulated_device = 't' THEN 'Yes' WHEN is_fda_regulated_device = 'f' THEN 'No' ELSE 'Unknown' END AS is_fda_regulated_device,
        CASE
            WHEN is_unapproved_device = 't' THEN 'Unapproved'
            WHEN is_fda_regulated_device = 't' AND is_unapproved_device IS NULL THEN 'Approved'
            ELSE 'Not Applicable'
        END AS is_unapproved_device,
        CASE
            WHEN is_ppsd = 't' THEN 'PPSD study'
            WHEN is_fda_regulated_device = 't' AND is_ppsd IS NULL THEN 'Not PPSD study'
            ELSE 'Not Applicable'
        END AS is_ppsd,
        CASE WHEN is_us_export = 't' THEN 'Yes' WHEN is_us_export = 'f' THEN 'No' ELSE 'Unknown' END AS is_us_export,
        CASE WHEN biospec_retention IS NULL THEN 'Unknown' ELSE biospec_retention END AS biospec_retention,
        CASE WHEN biospec_description IS NULL THEN 'Not defined' ELSE biospec_description END AS biospec_description,
        CASE WHEN ipd_time_frame IS NULL THEN 'Not specified' ELSE ipd_time_frame END AS ipd_time_frame,
        CASE WHEN ipd_access_criteria IS NULL THEN 'Not specified' ELSE ipd_access_criteria END AS ipd_access_criteria,
        CASE WHEN ipd_url IS NULL THEN 'Not specified' ELSE ipd_url END AS ipd_url,
        CASE WHEN plan_to_share_ipd IS NULL THEN 'Not specified' ELSE plan_to_share_ipd END AS plan_to_share_ipd,
        CASE WHEN plan_to_share_ipd_description IS NULL THEN 'Not specified' ELSE plan_to_share_ipd_description END AS plan_to_share_ipd_description,
        created_at,
        updated_at,
        CASE WHEN source_class IS NULL THEN 'UNKNOWN' ELSE source_class END AS source_class,
        CASE WHEN delayed_posting = 't' THEN 'Yes' ELSE 'Not Specified' END AS delayed_posting,
        expanded_access_nctid,
        CASE
            WHEN expanded_access_status_for_nctid IS NULL THEN 'Not Applicable'
            ELSE REPLACE(expanded_access_status_for_nctid, '_', ' ')
        END AS expanded_access_status_for_nctid,
        CASE WHEN fdaaa801_violation = 't' THEN 'Violation' ELSE 'No Violation' END AS fdaaa801_violation,
        CASE WHEN patient_registry = 't' THEN 'Yes' WHEN patient_registry = 'f' THEN 'No' ELSE 'Unknown' END AS patient_registry
    FROM bronze_studies
)
SELECT
    *,
    CASE
        WHEN ({_DUR_INNER}) > 10950 THEN 10950
        ELSE ({_DUR_INNER})
    END AS target_duration_days,
    CASE
        WHEN target_duration IS NULL THEN 'Not Provided'
        WHEN ({_DUR_INNER}) > 10950 THEN 'Capped Outlier'
        ELSE 'Actual'
    END AS target_duration_flag
FROM base_cleaning
"""

SILVER_SPONSORS_SQL = """
CREATE OR REPLACE TABLE silver_sponsors AS
SELECT
    raw.id,
    raw.nct_id,
    COALESCE(map.clean_sponsor_name, raw.name) AS clean_sponsor_name,
    COALESCE(map.sponsor_category, 'Other') AS sponsor_category,
    raw.lead_or_collaborator
FROM bronze_sponsors AS raw
LEFT JOIN bronze_sponsor_mapping AS map ON raw.name = map.raw_sponsor_name
"""

SILVER_CONDITIONS_SQL = f"""
CREATE OR REPLACE TABLE silver_conditions AS
SELECT
    id,
    nct_id,
    TRIM(
        CASE
            WHEN STRPOS(downcase_name, ',') > 0
                THEN SUBSTRING(downcase_name, 1, STRPOS(downcase_name, ',') - 1)
            ELSE downcase_name
        END
    ) AS name,
    {THERAPEUTIC_AREA_CASE} AS therapeutic_area
FROM bronze_conditions
"""

SILVER_INTERVENTIONS_SQL = """
CREATE OR REPLACE TABLE silver_interventions AS
SELECT
    raw.id,
    raw.nct_id,
    CASE
        WHEN raw.name IS NULL THEN 'no intervention'
        ELSE COALESCE(map.clean_name, LOWER(TRIM(raw.name)))
    END AS name,
    raw.intervention_type
FROM bronze_interventions AS raw
LEFT JOIN bronze_intervention_mapping AS map ON LOWER(TRIM(raw.name)) = map.raw_name
"""

SILVER_OUTCOMES_SQL = """
CREATE OR REPLACE TABLE silver_outcomes AS
SELECT
    id,
    nct_id,
    outcome_type,
    COALESCE(TRIM(title), 'not specified') AS title,
    COALESCE(TRIM(time_frame), 'not specified') AS time_frame,
    COALESCE(TRIM(population), 'not specified') AS population
FROM bronze_outcomes
"""

GOLD_SQL = """
CREATE OR REPLACE TABLE dim_studies AS
SELECT
    CAST(ROW_NUMBER() OVER (ORDER BY nct_id) AS BIGINT) AS study_key,
    nct_id, brief_title, official_title, acronym, study_type,
    limitations_and_caveats, overall_status, phase, why_stopped,
    why_stopped_category, has_dmc, is_fda_regulated_drug,
    is_fda_regulated_device, patient_registry
FROM silver_studies;

CREATE OR REPLACE TABLE dim_sponsors AS
SELECT
    CAST(ROW_NUMBER() OVER (ORDER BY sponsor_name, sponsor_category) AS BIGINT) AS sponsor_key,
    sponsor_name,
    sponsor_category
FROM (
    SELECT DISTINCT clean_sponsor_name AS sponsor_name, sponsor_category
    FROM silver_sponsors
);

CREATE OR REPLACE TABLE dim_conditions AS
SELECT
    CAST(ROW_NUMBER() OVER (ORDER BY condition_name) AS BIGINT) AS condition_key,
    condition_name
FROM (SELECT DISTINCT name AS condition_name FROM silver_conditions);

CREATE OR REPLACE TABLE dim_interventions AS
SELECT
    CAST(ROW_NUMBER() OVER (ORDER BY intervention_name, intervention_type) AS BIGINT) AS intervention_key,
    intervention_name,
    intervention_type
FROM (
    SELECT DISTINCT name AS intervention_name, intervention_type
    FROM silver_interventions
);

CREATE OR REPLACE TABLE dim_dates AS
SELECT
    CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
    CAST(d AS DATE) AS full_date,
    CAST(year(d) AS INT) AS year,
    CAST(quarter(d) AS INT) AS quarter,
    CAST(month(d) AS INT) AS month,
    monthname(d) AS month_name,
    CAST(day(d) AS INT) AS day,
    dayname(d) AS day_name,
    CAST(week(d) AS INT) AS week,
    isodow(d) IN (6, 7) AS is_weekend
FROM (SELECT unnest(generate_series(DATE '1980-01-01', DATE '2030-12-31', INTERVAL 1 DAY)) AS d);

CREATE OR REPLACE TABLE fact_trials AS
SELECT
    s.nct_id,
    s.enrollment,
    s.target_duration_days,
    s.number_of_participants_groups,
    ds.study_key,
    COALESCE(dd.date_key, 0) AS start_date_key,
    COALESCE(dd_comp.date_key, 0) AS completion_date_key,
    COALESCE(dd_prim.date_key, 0) AS primary_completion_date_key
FROM silver_studies AS s
LEFT JOIN dim_studies AS ds ON s.nct_id = ds.nct_id
LEFT JOIN dim_dates AS dd ON s.start_date = dd.full_date
LEFT JOIN dim_dates AS dd_comp ON s.completion_date = dd_comp.full_date
LEFT JOIN dim_dates AS dd_prim ON s.primary_completion_date = dd_prim.full_date;

CREATE OR REPLACE TABLE bridge_trial_sponsors AS
SELECT s.nct_id, s.lead_or_collaborator, ds.sponsor_key
FROM silver_sponsors AS s
JOIN dim_sponsors AS ds ON s.clean_sponsor_name = ds.sponsor_name;

CREATE OR REPLACE TABLE bridge_trial_conditions AS
SELECT s.nct_id, dc.condition_key
FROM silver_conditions AS s
JOIN dim_conditions AS dc ON s.name = dc.condition_name;

CREATE OR REPLACE TABLE bridge_trial_interventions AS
SELECT s.nct_id, di.intervention_key
FROM silver_interventions AS s
JOIN dim_interventions AS di ON s.name = di.intervention_name;

CREATE OR REPLACE TABLE opportunity_rank AS
WITH trial_priority AS (
    SELECT
        nct_id,
        MIN(CASE
                WHEN LOWER(intervention_type) IN ('drug', 'biological') THEN 1
                WHEN LOWER(intervention_type) = 'dietary supplement' THEN 2
                ELSE 3
            END) AS best_priority
    FROM silver_interventions
    GROUP BY nct_id
),
relevant_trials AS (
    SELECT s.nct_id, s.phase, s.start_date
    FROM silver_studies s
    LEFT JOIN trial_priority tp ON s.nct_id = tp.nct_id
    WHERE COALESCE(tp.best_priority, 99) <= 2 AND s.study_type = 'INTERVENTIONAL'
),
condition_metrics AS (
    SELECT
        c.name AS condition_name,
        c.therapeutic_area,
        COUNT(rt.nct_id) AS total_trials,
        COUNT(rt.nct_id) AS drug_trial_count,
        CAST(SUM(CASE WHEN rt.phase IN ('PHASE 3', 'PHASE 4') THEN 1 ELSE 0 END) AS BIGINT) AS late_phase_count,
        CAST(SUM(CASE WHEN rt.start_date >= DATE '2023-08-09' THEN 1 ELSE 0 END) AS BIGINT) AS recent_trials,
        CAST(SUM(CASE WHEN rt.start_date BETWEEN DATE '2021-08-09' AND DATE '2023-08-08' THEN 1 ELSE 0 END) AS BIGINT) AS older_trials
    FROM relevant_trials rt
    JOIN silver_conditions c ON rt.nct_id = c.nct_id
    GROUP BY c.name, c.therapeutic_area
),
condition_sponsors AS (
    SELECT
        c.name AS condition_name,
        CAST(COUNT(DISTINCT spon.clean_sponsor_name) AS BIGINT) AS industry_sponsor_count
    FROM relevant_trials rt
    JOIN silver_conditions c ON rt.nct_id = c.nct_id
    JOIN silver_sponsors spon ON rt.nct_id = spon.nct_id
    WHERE spon.sponsor_category = 'Industry'
    GROUP BY c.name
)
SELECT
    cm.condition_name,
    cm.therapeutic_area,
    cm.total_trials,
    (
        (COALESCE(cm.drug_trial_count, 0) * 1.0 / cm.total_trials) * 0.4
        + (1.0 / (1 + COALESCE(cs.industry_sponsor_count, 0))) * 0.3
        + (1.0 / (1 + COALESCE(cm.late_phase_count, 0))) * 0.2
        + (CASE
               WHEN cm.older_trials = 0 AND cm.recent_trials > 0 THEN 1.0
               WHEN cm.older_trials > 0
                   THEN (CAST(cm.recent_trials AS DOUBLE) - cm.older_trials) / cm.older_trials
               ELSE 0.0
           END) * 0.1
    ) AS opportunity_score
FROM condition_metrics cm
LEFT JOIN condition_sponsors cs ON cm.condition_name = cs.condition_name
WHERE cm.total_trials > 10
  AND cm.therapeutic_area NOT IN ('Others', 'Social & Behavioral')
  AND cm.condition_name NOT ILIKE '%healthy%';
"""
