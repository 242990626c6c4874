"""Pre-checkpoint plan capture for the optimization-round plan artifacts.

Operators that return an eagerly-checkpointed frame (triangle_count,
pagerank, the funnel day-2 stages) explain() as a one-node ExistingRDD
scan — the committed "after" plan dump says nothing about the tree that
actually ran (round-13 verdict item 4/6). When ``CAPTURE`` is on (set by
benchmarks/profile_queries.py only — zero overhead in production paths),
checkpoint sites call :func:`note` with the frame FEEDING the checkpoint
so the profiler can dump the real tree alongside the final plan.
"""

from __future__ import annotations

CAPTURE = False
FRAMES: list = []  # (tag, DataFrame) in checkpoint order


def note(tag: str, df):
    """Record ``df`` (about to be checkpointed) for plan dumping."""
    if CAPTURE:
        FRAMES.append((tag, df))
    return df


def drain() -> list:
    out = list(FRAMES)
    FRAMES.clear()
    return out
