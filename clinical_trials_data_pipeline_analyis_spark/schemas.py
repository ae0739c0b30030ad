"""Explicit StructTypes for every bronze table.

Mirrors the reference DDL (schema-on-write, no inference):
- studies               ``aact_bronze_layer.sql:13-85`` (79 columns)
- sponsors              ``aact_bronze_layer.sql:109-115``
- sponsor_mapping       ``aact_bronze_layer.sql:133-138``
- conditions            ``aact_bronze_layer.sql:159-164``
- interventions         ``aact_bronze_layer.sql:187-193``
- intervention_mapping  ``aact_bronze_layer.sql:214-218``
- outcomes              ``aact_bronze_layer.sql:243-257``

VARCHAR(n)/TEXT -> StringType (length caps are not semantically
load-bearing), DATE -> DateType, TIMESTAMPTZ -> TimestampType (session TZ
is UTC), INT -> IntegerType. All columns nullable, as in the source DDL.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _fields(spec: list[tuple[str, object]]) -> StructType:
    return StructType([StructField(n, t(), True) for n, t in spec])


S = StringType
D = DateType
I = IntegerType  # noqa: E741
TS = TimestampType

STUDIES_SCHEMA = _fields(
    [
        ("nct_id", S),
        ("nlm_download_date_description", S),
        ("study_first_submitted_date", D),
        ("results_first_submitted_date", D),
        ("disposition_first_submitted_date", D),
        ("last_update_submitted_date", D),
        ("study_first_submitted_qc_date", D),
        ("study_first_posted_date", D),
        ("study_first_posted_date_type", S),
        ("results_first_submitted_qc_date", D),
        ("results_first_posted_date", D),
        ("results_first_posted_date_type", S),
        ("disposition_first_submitted_qc_date", D),
        ("disposition_first_posted_date", D),
        ("disposition_first_posted_date_type", S),
        ("last_update_submitted_qc_date", D),
        ("last_update_posted_date", D),
        ("last_update_posted_date_type", S),
        ("start_month_year", S),
        ("start_date_type", S),
        ("start_date", D),
        ("verification_month_year", S),
        ("verification_date", D),
        ("completion_month_year", S),
        ("completion_date_type", S),
        ("completion_date", D),
        ("primary_completion_month_year", S),
        ("primary_completion_date_type", S),
        ("primary_completion_date", D),
        ("target_duration", S),
        ("study_type", S),
        ("acronym", S),
        ("baseline_population", S),
        ("brief_title", S),
        ("official_title", S),
        ("overall_status", S),
        ("last_known_status", S),
        ("phase", S),
        ("enrollment", I),
        ("enrollment_type", S),
        ("source", S),
        ("limitations_and_caveats", S),
        ("number_of_arms", I),
        ("number_of_groups", I),
        ("why_stopped", S),
        ("has_expanded_access", S),
        ("expanded_access_type_individual", S),
        ("expanded_access_type_intermediate", S),
        ("expanded_access_type_treatment", S),
        ("has_dmc", S),
        ("is_fda_regulated_drug", S),
        ("is_fda_regulated_device", S),
        ("is_unapproved_device", S),
        ("is_ppsd", S),
        ("is_us_export", S),
        ("biospec_retention", S),
        ("biospec_description", S),
        ("ipd_time_frame", S),
        ("ipd_access_criteria", S),
        ("ipd_url", S),
        ("plan_to_share_ipd", S),
        ("plan_to_share_ipd_description", S),
        ("created_at", TS),
        ("updated_at", TS),
        ("source_class", S),
        ("delayed_posting", S),
        ("expanded_access_nctid", S),
        ("expanded_access_status_for_nctid", S),
        ("fdaaa801_violation", S),
        ("baseline_type_units_analyzed", S),
        ("patient_registry", S),
    ]
)

SPONSORS_SCHEMA = _fields(
    [
        ("id", S),
        ("nct_id", S),
        ("agency_class", S),
        ("lead_or_collaborator", S),
        ("name", S),
    ]
)

SPONSOR_MAPPING_SCHEMA = _fields(
    [
        ("raw_sponsor_name", S),
        ("clean_sponsor_name", S),
        ("sponsor_category", S),
    ]
)

CONDITIONS_SCHEMA = _fields(
    [
        ("id", S),
        ("nct_id", S),
        ("name", S),
        ("downcase_name", S),
    ]
)

INTERVENTIONS_SCHEMA = _fields(
    [
        ("id", S),
        ("nct_id", S),
        ("intervention_type", S),
        ("name", S),
        ("description", S),
    ]
)

INTERVENTION_MAPPING_SCHEMA = _fields(
    [
        ("raw_name", S),
        ("clean_name", S),
    ]
)

OUTCOMES_SCHEMA = _fields(
    [
        ("id", S),
        ("nct_id", S),
        ("outcome_type", S),
        ("title", S),
        ("description", S),
        ("time_frame", S),
        ("population", S),
        ("anticipated_posting_date", D),
        ("anticipated_posting_month_year", S),
        ("units", S),
        ("units_analyzed", S),
        ("dispersion_type", S),
        ("param_type", S),
    ]
)

BRONZE_SCHEMAS: dict[str, StructType] = {
    "studies": STUDIES_SCHEMA,
    "sponsors": SPONSORS_SCHEMA,
    "sponsor_mapping": SPONSOR_MAPPING_SCHEMA,
    "conditions": CONDITIONS_SCHEMA,
    "interventions": INTERVENTIONS_SCHEMA,
    "intervention_mapping": INTERVENTION_MAPPING_SCHEMA,
    "outcomes": OUTCOMES_SCHEMA,
}
