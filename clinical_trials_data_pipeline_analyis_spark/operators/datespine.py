"""Generated date dimension (dim_dates).

Reference: ``aact_gold_layer.sql:92-125`` — generate_series spine
1980-01-01..2030-12-31 (18,628 rows; N10: the in-code range wins over the
1970 the docs claim) with date-part derivations.

Semantics deltas handled here (SURVEY F13/F15/N6):
- PostgreSQL ``EXTRACT(DOW)`` is 0=Sunday; Spark ``dayofweek`` is
  1=Sunday — weekend is ``dayofweek IN (1,7)``.
- ``TO_CHAR(d,'Month')`` blank-pads to 9 chars in pg; we emit unpadded
  month/day names (documented decision; oracle comparisons rtrim).

Scale: the spine is generated, tiny (~18.6k rows for 50 years) and always
broadcast into the role-playing fact joins.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def date_spine(spark: SparkSession, start: dt.date, end: dt.date) -> DataFrame:
    d = F.col("full_date")
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(F.lit(start), F.lit(end), F.expr("interval 1 day"))
            ).alias("full_date")
        )
        .select(
            F.date_format(d, "yyyyMMdd").cast("int").alias("date_key"),
            d,
            F.year(d).alias("year"),
            F.quarter(d).alias("quarter"),
            F.month(d).alias("month"),
            F.date_format(d, "MMMM").alias("month_name"),
            F.dayofmonth(d).alias("day"),
            F.date_format(d, "EEEE").alias("day_name"),
            F.weekofyear(d).alias("week"),
            F.dayofweek(d).isin(1, 7).alias("is_weekend"),
        )
    )
