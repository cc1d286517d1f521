"""Analytics tour: the BI / experimentation / survival surface.

Run: python examples/analytics_tour.py [sf_dir]

Walks the event and order fixtures through the round-5 analytics
batches — every step a registered, oracle-checked query:

1. trend      — per-type OLS revenue slope (q_revenue_trend)
2. drift      — type x weekday chi-square cells (q_type_weekday_chisq)
3. experiment — hash-split A/B readout with z statistic (q_ab_test)
4. sessions   — 30-minute sessionization histogram (q_sessionize)
5. survival   — Kaplan-Meier curve over premium lifetimes (q_survival_km)
6. gaps       — hourly revenue with linear interpolation (q_interpolate_hourly)
7. features   — PIT-correct feature join + standardization
               (q_join_pit, q_feature_scale)
8. reconcile  — migration table diff (q_table_diff)
9. quantiles  — continuous p50/p95/p99 from the rollup registry
               (q_stream_quantiles)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark import get_spark
from self_healing_data_pipeline_spark.registry import QUERIES, load_all

load_all()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("analytics-tour")

    print("== revenue trend (cents/day) ==")
    QUERIES["q_revenue_trend"](spark, sf_dir).show()

    print("== weekly-mix drift (top chi-square cells) ==")
    QUERIES["q_type_weekday_chisq"](spark, sf_dir).orderBy(
        F.desc("chi_contrib")
    ).limit(5).show()

    print("== A/B experiment readout ==")
    QUERIES["q_ab_test"](spark, sf_dir).show()

    print("== session-size histogram ==")
    QUERIES["q_sessionize"](spark, sf_dir).limit(8).show()

    print("== Kaplan-Meier survival (head of curve) ==")
    QUERIES["q_survival_km"](spark, sf_dir).limit(8).show()

    print("== hourly revenue, gap-filled (first interpolated rows) ==")
    QUERIES["q_interpolate_hourly"](spark, sf_dir).filter(
        F.col("is_interpolated")
    ).limit(5).show()

    print("== point-in-time features (sample) ==")
    QUERIES["q_join_pit"](spark, sf_dir).limit(5).show()
    QUERIES["q_feature_scale"](spark, sf_dir).limit(5).show()

    print("== migration reconciliation ==")
    QUERIES["q_table_diff"](spark, sf_dir).show()

    print("== continuous quantiles (sketch bounds vs exact) ==")
    QUERIES["q_stream_quantiles"](spark, sf_dir).show()

    spark.stop()


if __name__ == "__main__":
    main()
