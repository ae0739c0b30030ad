"""Injectable pipeline constants.

The reference hard-codes several analysis-time values; we surface them as a
config object so runs are reproducible (SURVEY.md N5):

- ``analysis_date`` replaces ``CURRENT_DATE`` in the outlier rules
  (reference ``aact_silver_layer.sql:48,56,64,71``); defaults to the
  reference's authoring-era snapshot date so golden outputs are stable.
- cohort boundary dates for the momentum score
  (``aact_gold_layer.sql:300-301``).
- enrollment caps, the 99.7th-percentile-derived constants
  (``aact_silver_layer.sql:164-165``).
- duration cap (30 years, ``aact_silver_layer.sql:380``).
- opportunity-score weights (``aact_gold_layer.sql:332-341``).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # -- silver.studies outlier / imputation rules ------------------------
    analysis_date: _dt.date = _dt.date(2025, 8, 9)  # frozen CURRENT_DATE
    min_valid_date: _dt.date = _dt.date(1999, 9, 17)  # aact_silver_layer.sql:48
    enrollment_cap_observational: int = 566_401  # aact_silver_layer.sql:164
    enrollment_cap_interventional: int = 15_886  # aact_silver_layer.sql:165
    duration_cap_days: int = 10_950  # aact_silver_layer.sql:380

    # -- gold date spine (aact_gold_layer.sql:121-125; N10: code wins) ----
    date_spine_start: _dt.date = _dt.date(1980, 1, 1)
    date_spine_end: _dt.date = _dt.date(2030, 12, 31)

    # -- opportunity score (aact_gold_layer.sql:300-301,332-341) ----------
    recent_cohort_start: _dt.date = _dt.date(2023, 8, 9)
    older_cohort_start: _dt.date = _dt.date(2021, 8, 9)
    older_cohort_end: _dt.date = _dt.date(2023, 8, 8)
    min_trials_for_score: int = 10  # aact_gold_layer.sql:347
    weight_relevance: float = 0.4
    weight_competition: float = 0.3
    weight_saturation: float = 0.2
    weight_momentum: float = 0.1
    excluded_areas: tuple[str, ...] = ("Others", "Social & Behavioral")

    # -- IO ----------------------------------------------------------------
    warehouse_dir: str = "spark-warehouse/medallion"
    #: Opt-in: write gold fact_trials partitioned by start_year (derived
    #: from start_date_key) so year-scoped scans prune at the file
    #: listing and incremental refreshes can dynamic-overwrite only the
    #: touched years. Off by default: the unpartitioned layout matches
    #: the reference's DROP+CTAS tables and keeps small-fixture runs
    #: from fragmenting into per-year files.
    partition_gold: bool = False

    def layer_path(self, layer: str, table: str) -> str:
        return f"{self.warehouse_dir}/{layer}/{table}"


DEFAULT_CONFIG = PipelineConfig()
