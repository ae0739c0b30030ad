"""Deterministic AACT-shaped synthetic fixtures per FIXTURES.md.

Seeded random generation hitting every silver-layer branch >= 20 times:
date outliers, NULL phases (N2), 't'/'f'/NULL pg-booleans, cap-busting
enrollments and durations, decimal duration strings (N4), every
why_stopped and therapeutic-area pattern branch, sponsor name variants
with partial mapping coverage, comma-bearing condition names, whitespace/
case intervention variants, and >10-trial conditions for the score filter.
"""

from __future__ import annotations

import datetime as dt
import random

ANALYSIS_DATE = dt.date(2025, 8, 9)
MIN_DATE = dt.date(1999, 9, 17)

_WHY_STOPPED_SAMPLES = [
    "study was not started due to site closure",
    "trial canceled before first patient",
    "interim analysis showed futility",
    "DSMB recommended stop",
    "IRB withdrew consent approval process",
    "poor tolerability in cohort 2",
    "pharmacokinetic profile inadequate",
    "graft failure in device arm",
    "software fault produced unreliable data",
    "slow recruitment of participants",
    "low enrollment and accrual",
    "safety signal: toxicity grade 4",
    "adverse event rate exceeded risk threshold",
    "lack of efficacy at primary endpoint",
    "no difference versus placebo",
    "halted due to COVID-19 restrictions",
    "corona pandemic site closures",
    "sponsor made a strategic business decision",
    "administrative closure by corporate",
    "principal investigator left the site",
    "staff turnover, personnel shortage",
    "drug supply could not be secured",
    "equipment and materials unavailable",
    "awaiting FDA approval, regulatory delay",
    "protocol design flaw discovered",
    "study no longer feasible at this site",
    "funding was withdrawn",
    "budget cuts ended the financial support",
    "reasons unrelated to any known category whatsoever",
]

_CONDITION_POOL = [
    # (downcase_name, expected hits per FIXTURES: every branch + Others)
    "breast cancer",
    "non-small cell lung carcinoma",
    "b-cell lymphoma",
    "acute leukemia",
    "glioblastoma multiforme",
    "ischemic stroke",
    "alzheimer disease",
    "parkinson's disease",
    "epilepsy, refractory",
    "multiple sclerosis",
    "heart failure",
    "hypertension",
    "atrial fibrillation",
    "myocardial infarction, acute",
    "type 2 diabetes",
    "obesity",
    "metabolic syndrome",
    "insulin resistance",
    "hiv infection",
    "covid-19",
    "hepatitis b",
    "tuberculosis",
    "pneumonia, community acquired",
    "rheumatoid arthritis",
    "ulcerative colitis",
    "psoriasis",
    "atopic dermatitis",
    "asthma",
    "major depression",
    "generalized anxiety disorder",
    "schizophrenia",
    "bipolar disorder",
    "chronic insomnia",
    "copd",
    "pulmonary fibrosis",
    "cystic fibrosis",
    "sleep apnea, obstructive",
    "osteoarthritis of the knee",
    "osteoporosis",
    "fibromyalgia",
    "chronic low back pain",
    "migraine",
    "postoperative pain",
    "smoking cessation",
    "physical activity promotion",
    "teen pregnancy prevention",
    "healthy volunteers",
    "rare genetic disorder xq28",
    "unclassified syndrome",
]

_SPONSOR_VARIANTS = [
    ("Pfizer", ["Pfizer", "Pfizer Inc.", "Pfizer Ltd"]),
    ("Novartis", ["Novartis", "Novartis Pharma AG"]),
    ("Roche", ["Roche", "Hoffmann-La Roche", "F. Hoffmann-La Roche"]),
    ("Merck", ["Merck", "Merck & Co."]),
    ("NIH", ["National Institutes of Health", "NIH Clinical Center"]),
    ("Mayo Clinic", ["Mayo Clinic", "Mayo Clinic Rochester"]),
    ("Assiut University", ["Assiut University"]),
    ("Acme Biotech", ["Acme Biotech LLC", "Acme Biotech"]),
]

_INTERVENTION_POOL = [
    ("Drug", "Aspirin "),
    ("DRUG", "aspirin"),
    ("Drug", "Metformin"),
    ("Biological", "mRNA Vaccine"),
    ("biological", " mrna vaccine "),
    ("Dietary Supplement", "Vitamin D"),
    ("Device", "Stent Model X"),
    ("Procedure", "Laparoscopy"),
    ("Behavioral", "Counseling"),
    ("Other", "Placebo"),
]

_STATUSES = [
    "RECRUITING", "ACTIVE_NOT_RECRUITING", "NOT_YET_RECRUITING",
    "ENROLLING_BY_INVITATION", "COMPLETED", "APPROVED_FOR_MARKETING",
    "TERMINATED", "WITHDRAWN", "SUSPENDED", "UNKNOWN",
]
_PHASES = [
    "EARLY_PHASE1", "PHASE1", "PHASE1/PHASE2", "PHASE2", "PHASE2/PHASE3",
    "PHASE3", "PHASE4", "NA", None,
]
_DURATIONS = [
    None, None, None, None, None, None, None, None,
    "10 Days", "6 Weeks", "3 Months", "2 Years", "40 Years",
    "1.5 Years", "90 Day", "18 Month", "1 Year", "52 Weeks",
]


def _rand_date(rng: random.Random, start: dt.date, end: dt.date) -> dt.date:
    return start + dt.timedelta(days=rng.randrange((end - start).days + 1))


def make_bronze_fixtures(
    n_studies: int = 800, seed: int = 42
) -> dict[str, list[dict]]:
    """Plain Python row dicts (no pandas) so Spark's createDataFrame gets
    exact types: date stays date, None stays None, int stays int."""
    rng = random.Random(seed)
    studies, sponsors, conditions, interventions, outcomes = [], [], [], [], []

    for i in range(n_studies):
        nct = f"NCT{i:08d}"
        submitted = _rand_date(rng, MIN_DATE, ANALYSIS_DATE)
        status = rng.choice(_STATUSES)
        study_type = rng.choices(
            ["INTERVENTIONAL", "OBSERVATIONAL", None], [0.6, 0.35, 0.05]
        )[0]

        r = rng.random()
        if r < 0.03:
            start = None
        elif r < 0.05:
            start = dt.date(1990, 1, 1) + dt.timedelta(days=rng.randrange(3000))
        elif r < 0.07:
            start = ANALYSIS_DATE + dt.timedelta(days=rng.randrange(30, 900))
        else:
            start = _rand_date(rng, MIN_DATE, ANALYSIS_DATE)

        def maybe_date(p_null=0.3, outlier=0.05):
            q = rng.random()
            if q < p_null:
                return None
            if q < p_null + outlier:
                return dt.date(1980, 1, 1) + dt.timedelta(days=rng.randrange(5000))
            return _rand_date(rng, MIN_DATE, ANALYSIS_DATE)

        completion = maybe_date()
        primary_completion = maybe_date()
        verification = maybe_date(p_null=0.02, outlier=0.02)
        enrollment = (
            None
            if rng.random() < 0.08
            else rng.choices(
                [rng.randrange(0, 2000), rng.randrange(16000, 600000), 900000],
                [0.85, 0.1, 0.05],
            )[0]
        )
        arms_groups = rng.random()
        number_of_arms = (
            rng.randrange(1, 6)
            if study_type == "INTERVENTIONAL" and arms_groups < 0.8
            else None
        )
        number_of_groups = (
            rng.randrange(1, 4)
            if number_of_arms is None and arms_groups < 0.9
            else None
        )

        def pg_bool(p_t=0.3, p_f=0.3):
            q = rng.random()
            return "t" if q < p_t else ("f" if q < p_t + p_f else None)

        why_stopped = (
            rng.choice(_WHY_STOPPED_SAMPLES) if rng.random() < 0.25 else None
        )
        expanded_nctid = f"NCTE{i:07d}" if rng.random() < 0.05 else None
        studies.append(
            {
                "nct_id": nct,
                "nlm_download_date_description": None,
                "study_first_submitted_date": submitted,
                "results_first_submitted_date": maybe_date(p_null=0.9, outlier=0),
                "disposition_first_submitted_date": maybe_date(p_null=0.95, outlier=0),
                "last_update_submitted_date": _rand_date(rng, submitted, ANALYSIS_DATE),
                "study_first_submitted_qc_date": submitted,
                "study_first_posted_date": submitted,
                "study_first_posted_date_type": rng.choice(["ACTUAL", "ESTIMATED", None]),
                "results_first_submitted_qc_date": None,
                "results_first_posted_date": maybe_date(p_null=0.9, outlier=0),
                "results_first_posted_date_type": rng.choice(["ACTUAL", "ESTIMATED", None]),
                "disposition_first_submitted_qc_date": None,
                "disposition_first_posted_date": None,
                "disposition_first_posted_date_type": None,
                "last_update_submitted_qc_date": None,
                "last_update_posted_date": _rand_date(rng, submitted, ANALYSIS_DATE),
                "last_update_posted_date_type": rng.choice(["ACTUAL", "ESTIMATED"]),
                "start_month_year": None,
                "start_date_type": rng.choice(["ACTUAL", "ESTIMATED", None]),
                "start_date": start,
                "verification_month_year": None,
                "verification_date": verification,
                "completion_month_year": None,
                "completion_date_type": rng.choice(["ACTUAL", "ESTIMATED", None]),
                "completion_date": completion,
                "primary_completion_month_year": None,
                "primary_completion_date_type": rng.choice(["ACTUAL", "ESTIMATED", None]),
                "primary_completion_date": primary_completion,
                "target_duration": rng.choice(_DURATIONS),
                "study_type": study_type,
                "acronym": f"ACR{i}" if rng.random() < 0.4 else None,
                "baseline_population": "adults 18+" if rng.random() < 0.3 else None,
                "brief_title": f"Brief study title {i}" if rng.random() < 0.97 else None,
                "official_title": f"Official study title {i}" if rng.random() < 0.9 else None,
                "overall_status": status,
                "last_known_status": rng.choice(["RECRUITING", None, None, None, None, None]),
                "phase": rng.choice(_PHASES),
                "enrollment": enrollment,
                "enrollment_type": rng.choice(["ACTUAL", "ESTIMATED", None]),
                "source": f"Source Org {rng.randrange(20)}" if rng.random() < 0.95 else None,
                "limitations_and_caveats": None if rng.random() < 0.9 else "small sample",
                "number_of_arms": number_of_arms,
                "number_of_groups": number_of_groups,
                "why_stopped": why_stopped,
                "has_expanded_access": pg_bool(),
                "expanded_access_type_individual": "t" if rng.random() < 0.05 else None,
                "expanded_access_type_intermediate": "t" if rng.random() < 0.03 else None,
                "expanded_access_type_treatment": "t" if rng.random() < 0.03 else None,
                "has_dmc": pg_bool(),
                "is_fda_regulated_drug": pg_bool(),
                "is_fda_regulated_device": pg_bool(),
                "is_unapproved_device": "t" if rng.random() < 0.05 else None,
                "is_ppsd": "t" if rng.random() < 0.03 else None,
                "is_us_export": pg_bool(),
                "biospec_retention": rng.choice(["Samples With DNA", "None Retained", None]),
                "biospec_description": None if rng.random() < 0.8 else "serum samples",
                "ipd_time_frame": None if rng.random() < 0.85 else "6 months after",
                "ipd_access_criteria": None if rng.random() < 0.85 else "researchers",
                "ipd_url": None if rng.random() < 0.95 else "https://example.org/ipd",
                "plan_to_share_ipd": rng.choice(["YES", "NO", "UNDECIDED", None]),
                "plan_to_share_ipd_description": None if rng.random() < 0.9 else "on request",
                "created_at": dt.datetime(2020, 1, 1) + dt.timedelta(hours=i),
                "updated_at": dt.datetime(2024, 1, 1) + dt.timedelta(hours=i),
                "source_class": rng.choice(["INDUSTRY", "OTHER", "NIH", None]),
                "delayed_posting": "t" if rng.random() < 0.03 else None,
                "expanded_access_nctid": expanded_nctid,
                "expanded_access_status_for_nctid": (
                    rng.choice(["AVAILABLE", "NO_LONGER_AVAILABLE", "TEMPORARILY_NOT_AVAILABLE"])
                    if expanded_nctid is not None
                    else None
                ),
                "fdaaa801_violation": "t" if rng.random() < 0.02 else None,
                "baseline_type_units_analyzed": None,
                "patient_registry": pg_bool(),
            }
        )

        # children -------------------------------------------------------
        for j in range(rng.randrange(1, 6)):
            canonical, variants = rng.choice(_SPONSOR_VARIANTS)
            sponsors.append(
                {
                    "id": f"sp{i}_{j}",
                    "nct_id": nct,
                    "agency_class": rng.choice(["INDUSTRY", "NIH", "OTHER_GOV", "OTHER"]),
                    "lead_or_collaborator": "lead" if j == 0 else "collaborator",
                    "name": rng.choice(variants),
                }
            )
        # skew some conditions hot so >10-trial groups exist
        n_conds = rng.randrange(1, 4)
        for j in range(n_conds):
            name = (
                _CONDITION_POOL[rng.randrange(12)]
                if rng.random() < 0.6
                else rng.choice(_CONDITION_POOL)
            )
            conditions.append(
                {
                    "id": f"c{i}_{j}",
                    "nct_id": nct,
                    "name": name.title(),
                    "downcase_name": name,
                }
            )
        for j in range(rng.randrange(0, 4)):
            itype, iname = rng.choice(_INTERVENTION_POOL)
            interventions.append(
                {
                    "id": f"iv{i}_{j}",
                    "nct_id": nct,
                    "intervention_type": itype,
                    "name": iname if rng.random() < 0.95 else None,
                    "description": None,
                }
            )
        for j in range(rng.randrange(1, 4)):
            outcomes.append(
                {
                    "id": f"o{i}_{j}",
                    "nct_id": nct,
                    "outcome_type": rng.choice(["Primary", "Secondary", "Other Pre-specified"]),
                    "title": rng.choice([f"Outcome {j} ", f"  Outcome {j}", f"Outcome {j}"]),
                    "description": "long text",
                    "time_frame": None if rng.random() < 0.01 else "12 weeks",
                    "population": None if rng.random() < 0.25 else " all participants ",
                    "anticipated_posting_date": None,
                    "anticipated_posting_month_year": None,
                    "units": None,
                    "units_analyzed": None,
                    "dispersion_type": None,
                    "param_type": rng.choice(["Mean", "Median", None]),
                }
            )

    sponsor_mapping = []
    for canonical, variants in _SPONSOR_VARIANTS[:6]:  # ~60% coverage of pools
        for v in variants:
            sponsor_mapping.append(
                {
                    "raw_sponsor_name": v,
                    "clean_sponsor_name": canonical,
                    "sponsor_category": (
                        "Industry"
                        if canonical in ("Pfizer", "Novartis", "Roche", "Merck")
                        else ("Government" if canonical == "NIH" else "Academia")
                    ),
                }
            )

    intervention_mapping = [
        {"raw_name": "aspirin", "clean_name": "acetylsalicylic acid"},
        {"raw_name": "mrna vaccine", "clean_name": "mrna-based vaccine"},
        {"raw_name": "vitamin d", "clean_name": "cholecalciferol"},
    ]

    return {
        "studies": studies,
        "sponsors": sponsors,
        "sponsor_mapping": sponsor_mapping,
        "conditions": conditions,
        "interventions": interventions,
        "intervention_mapping": intervention_mapping,
        "outcomes": outcomes,
    }
