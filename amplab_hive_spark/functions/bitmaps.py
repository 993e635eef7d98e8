"""EWAH compressed bitmaps — the reference's bitmap-index aggregate
family, previously a documented drop (SURVEY §2 row 44), now
implemented natively:

- ``ewah_bitmap(expr)`` UDAF
  (ql/udf/generic/GenericUDAFEWAHBitmap.java:52) — aggregates int row
  positions per group into an EWAH-compressed bitmap; partials merge
  with OR (GenericUDAFEWAHBitmap.java:171).
- ``ewah_bitmap_and`` / ``ewah_bitmap_or``
  (ql/udf/generic/GenericUDFEWAHBitmapAnd.java,
  AbstractGenericUDFEWAHBitmapBop.java) — binary ops over two
  bitmaps, returning a bitmap.
- ``ewah_bitmap_empty`` (GenericUDFEWAHBitmapEmpty.java) — true iff
  the bitmap has no set bits.
- The bitmap-index layout (ql/index/bitmap/BitmapIndexHandler.java):
  the index table groups row offsets by (indexed value, bucket) so a
  single bitmap never spans more rows than one bucket holds — that
  is the 100 TB contract here too (``build_bitmap_index`` buckets by
  ``position >> bucket_bits``; each bitmap's universe is
  2**bucket_bits positions, state bounded regardless of table size).

Wire shape — parity with the reference's observable output:
the UDAF emits ``array<bigint>`` laid out exactly like Hive's
``BitmapObjectOutput`` list (ql/index/bitmap/BitmapObjectOutput.java:35,
fed by javaewah ``EWAHCompressedBitmap.writeExternal``):

    [size_in_bits, n_words, word_0 .. word_{n-1}, rlw_position]

Word format (public EWAH spec, 64-bit variant): the stream is a
sequence of marker words ("running length words"), each followed by
its literal words. Marker layout, LSB first:

    bit 0       run bit (the value of the run: all-zero / all-one words)
    bits 1..32  run length, in 64-bit words (max 2^32-1)
    bits 33..63 number of literal words following (max 2^31-1)

Bit k of payload word w addresses position ``w*64 + k``. An empty
bitmap is a single zero marker word. The canonical encoding here
compresses maximal all-zero and all-one word runs into markers,
which is what javaewah's ``set()`` path produces for bits set in
increasing order — the only order the reference UDAF accepts
(GenericUDAFEWAHBitmap.java:188 "Can't set bits out of order").

javaewah is NOT bundled with Spark (unlike the Hive RCFile /
SequenceFile classes), so there is no Java cross-validation here;
instead the codec is property-tested (round-trip, canonical-form,
op-vs-set-algebra) and the word layout is pinned against
hand-computed examples in tests/test_bitmaps.py.

Scale notes: positions collapse to DISTINCT ints group-side
(map-side partial aggregation) before anything moves — the same
asymptotic state as the reference's per-group bitmap buffer
(BitmapAgg.estimate() = sizeInBytes). The only Python is the Arrow
encode/op step over the final per-group arrays (a documented Arrow
path). Cardinality and the EMPTY test are computed straight off the
word stream (one-run lengths + literal popcounts — no position list
is ever materialized); the pairwise AND/OR decode each operand to a
position set per pair, bounded by the bitmap's universe (the bucket
size in the index layout) — a word-aligned stream merge would avoid
that and is noted as the upgrade path in ewah_bitmap_and.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import ArrayType, BooleanType, LongType

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.registry import register

_WORD = 64
_FULL = (1 << _WORD) - 1
_RUN_LEN_BITS = 32
_MAX_RUN = (1 << _RUN_LEN_BITS) - 1
_MAX_LIT = (1 << (_WORD - 1 - _RUN_LEN_BITS)) - 1  # 2^31-1
_SIGN = 1 << 63


def _to_signed(w: int) -> int:
    """uint64 word -> Spark bigint (two's complement)."""
    return w - (1 << 64) if w >= _SIGN else w


def _to_unsigned(w: int) -> int:
    return w + (1 << 64) if w < 0 else w


def ewah_encode(positions: Iterable[int]) -> tuple[int, list[int], int]:
    """Sorted-unique non-negative positions -> (size_in_bits,
    uint64 words, rlw_position). Canonical form: maximal zero/one
    runs become markers, everything else literals."""
    # segments: [run_bit, run_len, [literal words]]
    segments: list[list] = [[0, 0, []]]

    def _add_run(bit: int, n: int) -> None:
        while n:
            seg = segments[-1]
            if seg[2] or (seg[1] and seg[0] != bit) or seg[1] >= _MAX_RUN:
                segments.append([bit, 0, []])
                seg = segments[-1]
            if not seg[1]:
                seg[0] = bit
            take = min(n, _MAX_RUN - seg[1])
            seg[1] += take
            n -= take

    def _add_literal(word: int) -> None:
        seg = segments[-1]
        if len(seg[2]) >= _MAX_LIT:
            segments.append([0, 0, []])
            seg = segments[-1]
        seg[2].append(word)

    max_pos = -1
    next_word = 0  # next word index to emit
    cur_idx = -1
    cur_word = 0

    def _flush_word() -> None:
        nonlocal next_word, cur_word
        if cur_idx < 0:
            return
        if cur_idx > next_word:
            _add_run(0, cur_idx - next_word)
        if cur_word == _FULL:
            _add_run(1, 1)
        else:
            _add_literal(cur_word)
        next_word = cur_idx + 1
        cur_word = 0

    for p in positions:
        if p < 0:
            raise ValueError(f"negative bit position: {p}")
        if p <= max_pos:
            raise ValueError("positions must be strictly increasing "
                             "(reference: can't set bits out of order)")
        max_pos = p
        w = p // _WORD
        if w != cur_idx:
            _flush_word()
            cur_idx = w
        cur_word |= 1 << (p % _WORD)
    _flush_word()

    words: list[int] = []
    rlw_position = 0
    for run_bit, run_len, literals in segments:
        rlw_position = len(words)
        words.append((len(literals) << (_RUN_LEN_BITS + 1))
                     | (run_len << 1) | run_bit)
        words.extend(literals)
    return (max_pos + 1 if max_pos >= 0 else 0), words, rlw_position


def ewah_cardinality_words(words: Sequence[int]) -> int:
    """Set-bit count straight off the compressed stream: 64 bits per
    one-run word plus a popcount per literal — never materializes
    positions (javaewah cardinality() walks words the same way)."""
    total = 0
    i = 0
    while i < len(words):
        marker = words[i]
        i += 1
        if marker & 1:
            total += ((marker >> 1) & _MAX_RUN) * _WORD
        n_lit = marker >> (_RUN_LEN_BITS + 1)
        for _ in range(n_lit):
            total += words[i].bit_count()
            i += 1
    return total


def ewah_decode(words: Sequence[int]) -> list[int]:
    """uint64 word stream -> sorted bit positions."""
    out: list[int] = []
    base = 0  # current position offset in bits
    i = 0
    while i < len(words):
        marker = words[i]
        i += 1
        run_bit = marker & 1
        run_len = (marker >> 1) & _MAX_RUN
        n_lit = marker >> (_RUN_LEN_BITS + 1)
        if run_bit:
            out.extend(range(base, base + run_len * _WORD))
        base += run_len * _WORD
        for _ in range(n_lit):
            w = words[i]
            i += 1
            while w:
                low = w & -w
                out.append(base + low.bit_length() - 1)
                w ^= low
            base += _WORD
    return out


# --- Hive BitmapObjectOutput list layout ------------------------------

def positions_to_hive_list(positions: Iterable[int]) -> list[int]:
    """Sorted positions -> the reference's List<LongWritable> layout
    [size_in_bits, n_words, words..., rlw_position], words as signed
    bigints (Spark array<bigint>)."""
    size_in_bits, words, rlw_position = ewah_encode(positions)
    return ([size_in_bits, len(words)]
            + [_to_signed(w) for w in words]
            + [rlw_position])


def hive_list_to_positions(arr: Sequence[int]) -> list[int]:
    """Inverse of positions_to_hive_list (BitmapObjectInput analogue)."""
    return ewah_decode(_words_of(arr))


# --- Arrow-path column functions (the documented Python steps) --------

@F.pandas_udf(ArrayType(LongType()))
def _encode_positions(positions: pd.Series) -> pd.Series:
    return positions.apply(
        lambda ps: positions_to_hive_list(int(p) for p in ps))


@F.pandas_udf(ArrayType(LongType()))
def _bitmap_and(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([
        positions_to_hive_list(sorted(
            set(hive_list_to_positions(x)) & set(hive_list_to_positions(y))))
        for x, y in zip(a, b)
    ])


@F.pandas_udf(ArrayType(LongType()))
def _bitmap_or(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([
        positions_to_hive_list(sorted(
            set(hive_list_to_positions(x)) | set(hive_list_to_positions(y))))
        for x, y in zip(a, b)
    ])


def _words_of(arr: Sequence[int]) -> list[int]:
    """Validated payload words of a Hive bitmap list — the ONE place
    the [sizeInBits, nWords, words..., rlwPos] framing is checked."""
    if len(arr) < 3:
        raise ValueError(f"malformed bitmap list (len {len(arr)})")
    n_words = int(arr[1])
    if len(arr) != n_words + 3:
        raise ValueError(
            f"malformed bitmap list: {len(arr)} elems for {n_words} words")
    return [_to_unsigned(int(w)) for w in arr[2:2 + n_words]]


@F.pandas_udf(LongType())
def _bitmap_cardinality(a: pd.Series) -> pd.Series:
    # popcount over the word stream — positions never materialize
    return a.apply(lambda x: ewah_cardinality_words(_words_of(x)))


def ewah_bitmap_and(a: Column, b: Column) -> Column:
    """GenericUDFEWAHBitmapAnd: bitmap ∧ bitmap -> bitmap. The op
    decodes both operands to position sets per pair (bounded by the
    bitmap universe — the bucket size in the index layout); a
    word-aligned stream merge like javaewah's andToContainer would
    avoid the expansion and is the upgrade path if un-bucketed
    bitmaps ever appear."""
    return _bitmap_and(a, b)


def ewah_bitmap_or(a: Column, b: Column) -> Column:
    """GenericUDFEWAHBitmapOr: bitmap ∨ bitmap -> bitmap (same
    decode-bounded shape as ewah_bitmap_and)."""
    return _bitmap_or(a, b)


def ewah_bitmap_empty(a: Column) -> Column:
    """GenericUDFEWAHBitmapEmpty: true iff no set bits — a popcount
    over the word stream, no position list."""
    return _bitmap_cardinality(a) == F.lit(0)


def ewah_bitmap_cardinality(a: Column) -> Column:
    """Set-bit count (not in the reference registry; the natural
    companion — Hive reads it via the index handler's row counts).
    Computed off the compressed stream (ewah_cardinality_words)."""
    return _bitmap_cardinality(a)


# --- the UDAF and the index layout ------------------------------------

def ewah_bitmap(df: DataFrame, group_cols: Sequence[str],
                pos_col: str) -> DataFrame:
    """``SELECT group_cols, ewah_bitmap(pos) FROM df GROUP BY
    group_cols`` (GenericUDAFEWAHBitmap). Positions cast to int as
    the reference does (PrimitiveObjectInspectorUtils.getInt).

    collect_set partial-aggregates map-side (JVM), so only DISTINCT
    positions per group cross the wire; sort_array gives the
    increasing order the encoder (and the reference's set()) demands;
    the Arrow encode touches one array per group."""
    return (
        df.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_set(F.col(pos_col).cast("int")))
             .alias("_positions"))
        .select(*group_cols, _encode_positions("_positions").alias("bitmap"))
    )


def build_bitmap_index(df: DataFrame, value_col: str, pos_col: str,
                       bucket_bits: int = 20) -> DataFrame:
    """BitmapIndexHandler.java's index-table layout: one row per
    (indexed value, bucket) with the EWAH bitmap of row offsets
    WITHIN the bucket. Bucketing by position >> bucket_bits bounds
    every bitmap to a 2**bucket_bits universe — the reference gets
    the same bound from (_bucketname, _offset) file framing."""
    bucketed = df.select(
        F.col(value_col).alias("value"),
        F.shiftright(F.col(pos_col).cast("long"), bucket_bits)
        .alias("_bucketname"),
        (F.col(pos_col).cast("long") % F.lit(1 << bucket_bits))
        .alias("_offset"),
    )
    return (
        ewah_bitmap(bucketed, ["value", "_bucketname"], "_offset")
        .withColumnRenamed("bitmap", "_bitmaps")
    )


def bitmap_index_lookup(index: DataFrame, values: Sequence,
                        bucket_bits: int = 20) -> DataFrame:
    """Evaluate ``value IN (...)`` via the index: OR the per-bucket
    bitmaps of the wanted values, re-expand offsets to positions.
    Returns DataFrame[position: bigint]. Mirrors the reference's
    bitmap-OR access path (ql/index/bitmap/BitmapOuterQuery.java)."""
    hits = index.filter(F.col("value").isin(list(values)))
    merged = (
        hits.select(
            "_bucketname",
            F.explode(_decode_positions("_bitmaps")).alias("_offset"))
        .distinct()  # union across values == the bitmap OR
    )
    return merged.select(
        (F.shiftleft(F.col("_bucketname"), bucket_bits) + F.col("_offset"))
        .alias("position"))


@F.pandas_udf(ArrayType(LongType()))
def _decode_positions(a: pd.Series) -> pd.Series:
    return a.apply(hive_list_to_positions)


# --- graded query ------------------------------------------------------

@register(
    "ewah_bitmap_ops",
    tags=("function", "udaf", "bitmap"),
    oracle="""
WITH s AS (SELECT DISTINCT o_orderpriority AS p, o_custkey AS k FROM orders),
     card AS (SELECT p, COUNT(*) AS n FROM s GROUP BY p),
     pairs AS (
       SELECT a.p AS p1, b.p AS p2, COUNT(*) AS and_card
       FROM s a JOIN s b ON a.k = b.k
       WHERE a.p < b.p
       GROUP BY a.p, b.p
     )
SELECT pairs.p1 AS p1, pairs.p2 AS p2,
       pairs.and_card AS and_card,
       c1.n + c2.n - pairs.and_card AS or_card,
       pairs.and_card = 0 AS and_empty
FROM pairs
JOIN card c1 ON c1.p = pairs.p1
JOIN card c2 ON c2.p = pairs.p2
ORDER BY p1, p2
""",
)
def ewah_bitmap_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ewah_bitmap family end-to-end: per-priority bitmaps of
    customer keys, then pairwise AND/OR/EMPTY over the compressed
    streams — cardinalities oracled as set algebra in DuckDB (the
    words themselves aren't SQL-expressible; the codec layout is
    pinned separately in tests/test_bitmaps.py)."""
    t = tables(spark, sf_dir)
    bm = ewah_bitmap(t.orders, ["o_orderpriority"], "o_custkey")
    a = bm.select(F.col("o_orderpriority").alias("p1"),
                  F.col("bitmap").alias("bm1"))
    b = bm.select(F.col("o_orderpriority").alias("p2"),
                  F.col("bitmap").alias("bm2"))
    pairs = a.join(F.broadcast(b), F.col("p1") < F.col("p2"))
    # materialize each bitmap op once; card/empty derive from it
    ops = pairs.select(
        "p1", "p2",
        ewah_bitmap_and("bm1", "bm2").alias("_and"),
        ewah_bitmap_or("bm1", "bm2").alias("_or"),
    )
    return (
        ops.select(
            "p1", "p2",
            ewah_bitmap_cardinality("_and").alias("and_card"),
            ewah_bitmap_cardinality("_or").alias("or_card"),
            ewah_bitmap_empty("_and").alias("and_empty"),
        )
        .orderBy("p1", "p2")
    )
