"""Ordered funnel: single-shuffle fold vs chained-min reference.

The fold in operators/funnel advances greedily through the sorted
event list; the reference semantics are the textbook chained
aggregations (t0 = min stage-1 ts; t_k = min stage-(k+1) ts > t_{k-1}).
Greedy earliest-first is provably equivalent — these tests check it on
random data plus the tie/strictness edge cases.
"""

import datetime
import random

import pyspark.sql.functions as F

from vechord_spark.operators.funnel import funnel_counts, funnel_stages

STAGES = ["view", "click", "purchase"]


def _ts(sec):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=sec)


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(s), e) for u, s, e in rows],
        "user_id long, ts timestamp, event_type string",
    )


def _chained_reference(rows):
    """Per-user stage depth via chained mins (pure Python oracle)."""
    by_user = {}
    for u, s, e in rows:
        by_user.setdefault(u, []).append((s, e))
    out = {}
    for u, evs in by_user.items():
        prev_t = None
        depth = 0
        for stage in STAGES:
            cand = [s for s, e in evs if e == stage and (prev_t is None or s > prev_t)]
            if not cand:
                break
            prev_t = min(cand)
            depth += 1
        out[u] = depth
    return out


def test_funnel_matches_chained_mins_random(spark):
    rng = random.Random(7)
    types = STAGES + ["signup", "error"]
    rows = [
        (rng.randrange(400), rng.randrange(200), rng.choice(types))
        for _ in range(1500)
    ]
    got = {
        r.user_id: r.stage_reached
        for r in funnel_stages(
            _events_df(spark, rows), "user_id", "ts", "event_type", STAGES
        ).collect()
    }
    want = _chained_reference(rows)
    for u, d in got.items():
        assert d == want[u], f"user {u}: fold={d} chained={want[u]}"
    # users absent from the fold output had no stage-typed events at
    # all (filtered below the shuffle); the reference scores them 0
    missing = set(want) - set(got)
    assert all(want[u] == 0 for u in missing)
    # and the depths actually exercise every stage on this seed
    assert {0, 1, 2, 3} <= set(got.values()) | {0}


def test_funnel_strictly_after_previous_stage(spark):
    # click at the SAME timestamp as the first view must not advance
    rows = [(1, 10, "view"), (1, 10, "click"), (1, 20, "purchase")]
    got = funnel_stages(
        _events_df(spark, rows), "user_id", "ts", "event_type", STAGES
    ).collect()
    assert got[0].stage_reached == 1

    # click one second later does advance, then same-ts purchase does not
    rows = [(1, 10, "view"), (1, 11, "click"), (1, 11, "purchase")]
    got = funnel_stages(
        _events_df(spark, rows), "user_id", "ts", "event_type", STAGES
    ).collect()
    assert got[0].stage_reached == 2


def test_funnel_uses_first_qualifying_stage_event(spark):
    # earliest view (t=5) gates the click at t=7 even though a later
    # view (t=9) also exists — chained-mins semantics, not "any view"
    rows = [(1, 5, "view"), (1, 7, "click"), (1, 9, "view"), (1, 8, "purchase")]
    got = funnel_stages(
        _events_df(spark, rows), "user_id", "ts", "event_type", STAGES
    ).collect()
    assert got[0].stage_reached == 3


def test_funnel_out_of_order_input(spark):
    # arrival order scrambled; the in-fold array_sort restores time order
    rows = [(1, 30, "purchase"), (1, 10, "view"), (1, 20, "click")]
    got = funnel_stages(
        _events_df(spark, rows), "user_id", "ts", "event_type", STAGES
    ).collect()
    assert got[0].stage_reached == 3


def test_funnel_counts_shape(spark):
    rows = [
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        (2, 1, "view"), (2, 2, "click"),
        (3, 1, "view"),
        (4, 1, "click"),  # no view: filtered user never reaches stage 1
    ]
    row = funnel_counts(
        _events_df(spark, rows), "user_id", "ts", "event_type", STAGES
    ).collect()[0]
    assert (row.n_view, row.n_click, row.n_purchase) == (3, 2, 1)


def test_funnel_single_exchange_plan(spark):
    """Scale-shape pin: the per-user depth plan has exactly ONE
    exchange (the user_id groupBy) and the stage-type IN filter is
    applied below it."""
    df = _events_df(spark, [(1, 1, "view"), (2, 2, "click")])
    plan = funnel_stages(df, "user_id", "ts", "event_type", STAGES)._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("exchange") == 1
    assert "event_type" in plan
