"""Bounded per-call-site persist slots.

Registered queries persist derived frames (MinHash signature table,
IVF centroid/assignment tables) because several downstream branches
of ONE execution reuse them. But a re-run of the same query — bench
loops, oracle compares, repeated test sessions on a shared
SparkSession — re-persists a fresh frame while the previous call's
cache sits orphaned in the block manager forever. A slot keeps AT
MOST ONE live cached frame per call site: registering a new frame
unpersists the old one (dead the moment its query returned).

Concurrency note: two threads running the same query interleaved can
unpersist a frame the other still references — Spark then recomputes
that branch (correctness unaffected, cache benefit lost), which is
the right trade against an unbounded leak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SLOTS: dict[str, DataFrame] = {}


def cache_slot(key: str, df: DataFrame) -> DataFrame:
    old = _SLOTS.get(key)
    if old is not None:
        try:
            old.unpersist()
        except Exception:
            pass  # session of the old frame may already be stopped
    df = df.persist()
    _SLOTS[key] = df
    return df
