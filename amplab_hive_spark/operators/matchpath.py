"""matchpath — row-pattern matching over ordered partitions.

Reference parity (SURVEY.md §2.1): the MatchPath PTF
(QL/udf/ptf/MatchPath.java, registered as `matchpath`,
FunctionRegistry.java:434-439) matches a symbol pattern against each
ordered partition and emits one row per match with path metadata.
Spark has no MATCH_RECOGNIZE, so this is one of the few genuinely
custom operators (SURVEY.md §7.3 hard list #4): implemented as
``applyInPandas`` over ``partitionBy`` groups — each group is
classified row-by-row into symbols, the symbol string is matched
with a compiled regex, and matches are emitted as rows.

Scale: one shuffle on the partition key; each partition is matched
independently in an Arrow batch. Pattern state never crosses
partition boundaries (matching the reference's PTF partition
semantics), so the operator parallelizes perfectly. Partitions must
fit in executor memory — same contract as the reference's
PTFPartition buffer.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StructField, StructType

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register


def matchpath(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    symbols: dict[str, Callable[[pd.DataFrame], "pd.Series"]],
    pattern: str,
    result_schema: StructType,
    emit: Callable[[pd.DataFrame, int, int], dict],
) -> DataFrame:
    """Generic row-pattern matcher.

    symbols: name (single char) → predicate over the ordered
    partition frame (vectorized; may reference shifted columns).
    pattern: regex over symbol characters (e.g. ``"UU+D*"``).
    emit(frame, start, end) → dict for one match (non-overlapping,
    leftmost-longest like the reference's MatchPath.java).

    r14 optimization (guide §4.1/§4.5 — batch the Python boundary):
    the original ``groupBy().applyInPandas`` paid one Arrow
    round-trip + pandas-frame construction PER GROUP (~5-8 ms each:
    1.5k customer groups ≈ 12 s at sf0.01 for microseconds of actual
    matching).
    Now ONE hash shuffle on the partition key + a partition-level
    sort feeds ``mapInPandas``, and groups are iterated INSIDE the
    Python worker; a group straddling two Arrow batches is stitched
    by carrying the trailing (possibly incomplete) group into the
    next batch. Same single-exchange plan (test_matchpath_single_
    shuffle), same per-group matching semantics and memory contract.
    """
    for name in symbols:
        if len(name) != 1:
            raise ValueError(f"symbol names must be single characters: {name!r}")
    compiled = re.compile(pattern)
    pcols = list(partition_by)
    ocols = list(order_by)
    cols = [f.name for f in result_schema.fields]

    def match_group(pdf: pd.DataFrame, out: list) -> None:
        # rows arrive already ordered by (partition_by, order_by);
        # symbol chars built in numpy (a pandas Series + boolean-mask
        # assignment per symbol measured ~4× slower on small groups)
        import numpy as np

        chars = np.full(len(pdf), "?", dtype="<U1")
        for ch, pred in symbols.items():
            mask = pred(pdf).fillna(False).astype(bool).to_numpy()
            chars[mask] = ch
        s = "".join(chars)
        pos = 0
        while pos < len(s):
            m = compiled.search(s, pos)
            if not m:
                break
            if m.start() == m.end():
                # zero-width match (e.g. pattern "U*" at a non-U
                # position): emit nothing for it, but ADVANCE past it
                # — breaking here would abort the scan and silently
                # drop every real match later in the partition.
                pos = m.start() + 1
                continue
            out.append(emit(pdf, m.start(), m.end()))
            pos = m.end()

    def match_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        # groups are CONTIGUOUS after the partition sort, so slice at
        # key-change boundaries instead of hash-groupby iteration
        # (pandas groupby materialization measured ~4× slower); null
        # keys compare equal to each other, like Spark's groupBy.
        import numpy as np

        out: list = []
        pdf = pdf.reset_index(drop=True)
        if len(pdf) > 1:
            neq = np.zeros(len(pdf) - 1, dtype=bool)
            for c in pcols:
                cur = pdf[c].iloc[1:].reset_index(drop=True)
                prev = pdf[c].iloc[:-1].reset_index(drop=True)
                neq |= (~(cur.eq(prev) | (cur.isna() & prev.isna()))).to_numpy()
            bounds = np.flatnonzero(np.r_[True, neq, True])
        else:
            bounds = np.array([0, len(pdf)])
        for s, e in zip(bounds[:-1], bounds[1:]):
            match_group(pdf.iloc[s:e].reset_index(drop=True), out)
        return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
            {c: pd.Series(dtype="object") for c in cols}
        )

    def _key_match(pdf: pd.DataFrame, row) -> pd.Series:
        # null keys compare equal, like Spark's groupBy / match_frame
        m = pd.Series(True, index=pdf.index)
        for c in pcols:
            m &= pdf[c].eq(row[c]) | (pdf[c].isna() & pd.isna(row[c]))
        return m

    def stream(batches):
        # carry = PIECES of the trailing (possibly incomplete) group,
        # concatenated ONCE at the group boundary. The r14 version
        # re-concatenated the accumulated carry onto every subsequent
        # batch, so one group spanning many batches copied the growing
        # frame once per batch — O(G²/B) for a giant group (ADVICE
        # r14); a piece list makes it O(G).
        carry: list = []
        for pdf in batches:
            if not len(pdf):
                continue
            if carry:
                # leading run of rows continuing the carried group's key
                lead = _key_match(pdf, carry[-1].iloc[-1])
                lead_len = int(lead.astype(int).cumprod().sum())
                if lead_len == len(pdf):
                    carry.append(pdf)
                    continue
                if lead_len:
                    carry.append(pdf.iloc[:lead_len])
                    pdf = pdf.iloc[lead_len:]
                yield match_frame(
                    pd.concat(carry, ignore_index=True) if len(carry) > 1 else carry[0]
                )
                carry = []
            # groups are contiguous after the partition sort: hold back
            # the trailing run of rows sharing the last row's key — it
            # may continue in the next Arrow batch
            is_last = _key_match(pdf, pdf.iloc[-1])
            tail_len = int(is_last.iloc[::-1].astype(int).cumprod().sum())
            head = pdf.iloc[: len(pdf) - tail_len]
            carry = [pdf.iloc[len(pdf) - tail_len:]]
            if len(head):
                yield match_frame(head)
        if carry:
            yield match_frame(
                pd.concat(carry, ignore_index=True) if len(carry) > 1 else carry[0]
            )

    return (
        df.repartition(*pcols)
        .sortWithinPartitions(*(pcols + ocols))
        .mapInPandas(stream, schema=result_schema)
    )


_RUNS_ORACLE = """
WITH ordered AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         lag(o_totalprice) OVER w AS prev_price,
         row_number() OVER w AS rn
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
flagged AS (
  SELECT *, CASE WHEN prev_price IS NOT NULL AND o_totalprice > prev_price
                 THEN 0 ELSE 1 END AS brk
  FROM ordered
),
islands AS (
  SELECT *, SUM(brk) OVER (PARTITION BY o_custkey ORDER BY rn
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT o_custkey AS custkey,
       arg_min(o_orderkey, rn) AS start_orderkey,
       COUNT(*) AS run_len
FROM islands
GROUP BY o_custkey, island
HAVING COUNT(*) >= 3
ORDER BY custkey, start_orderkey
"""


@register("matchpath_price_runs", tags=("ptf", "matchpath", "pandas-udf"), oracle=_RUNS_ORACLE)
def matchpath_price_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MatchPath query: per customer (ordered by date), find maximal
    runs of ≥3 orders with strictly increasing totalprice — pattern
    ``FU{2,}`` over symbols F=first-or-not-increase, U=increase.
    Oracled by gaps-and-islands SQL computing identical runs."""
    t = tables(spark, sf_dir)
    schema = StructType(
        [
            StructField("custkey", LongType()),
            StructField("start_orderkey", LongType()),
            StructField("run_len", LongType()),
        ]
    )

    def is_up(pdf: pd.DataFrame) -> pd.Series:
        return pdf["o_totalprice"] > pdf["o_totalprice"].shift(1)

    def is_break(pdf: pd.DataFrame) -> pd.Series:
        return ~(pdf["o_totalprice"] > pdf["o_totalprice"].shift(1))

    def emit(pdf: pd.DataFrame, start: int, end: int) -> dict:
        return {
            "custkey": int(pdf["o_custkey"].iloc[start]),
            "start_orderkey": int(pdf["o_orderkey"].iloc[start]),
            "run_len": end - start,
        }

    return matchpath(
        t.orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        symbols={"U": is_up, "F": is_break},
        pattern="FU{2,}",
        result_schema=schema,
        emit=emit,
    ).orderBy("custkey", "start_orderkey")
