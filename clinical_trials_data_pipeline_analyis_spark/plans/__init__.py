from .silver import (
    silver_studies,
    silver_sponsors,
    silver_conditions,
    silver_interventions,
    silver_outcomes,
)
from .gold import (
    dim_studies,
    dim_sponsors,
    dim_conditions,
    dim_interventions,
    dim_dates,
    fact_trials,
    bridge_trial_sponsors,
    bridge_trial_conditions,
    bridge_trial_interventions,
)
from .opportunity import opportunity_rank

__all__ = [
    "silver_studies",
    "silver_sponsors",
    "silver_conditions",
    "silver_interventions",
    "silver_outcomes",
    "dim_studies",
    "dim_sponsors",
    "dim_conditions",
    "dim_interventions",
    "dim_dates",
    "fact_trials",
    "bridge_trial_sponsors",
    "bridge_trial_conditions",
    "bridge_trial_interventions",
    "opportunity_rank",
]
