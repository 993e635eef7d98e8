"""EWAH bitmap family (SURVEY §2 row 44, formerly a documented drop).

Reference anchors:
- ql/udf/generic/GenericUDAFEWAHBitmap.java (UDAF, OR-merge partials)
- ql/udf/generic/GenericUDFEWAHBitmap{And,Or,Empty}.java
- ql/index/bitmap/BitmapObjectOutput.java (list layout
  [sizeInBits, nWords, words..., rlwPos])
- ql/index/bitmap/BitmapIndexHandler.java (per-(value,bucket) index)

javaewah is not bundled with Spark, so unlike the RCFile /
SequenceFile codecs there is no Java cross-validation; the word
layout is pinned here against hand-computed examples from the public
EWAH spec, and everything else is property-tested against set
algebra.
"""

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import Row, functions as F

from amplab_hive_spark.functions.bitmaps import (
    bitmap_index_lookup,
    build_bitmap_index,
    ewah_bitmap,
    ewah_bitmap_and,
    ewah_bitmap_cardinality,
    ewah_bitmap_empty,
    ewah_bitmap_or,
    ewah_decode,
    ewah_encode,
    hive_list_to_positions,
    positions_to_hive_list,
)
from amplab_hive_spark.registry import all_queries
from amplab_hive_spark.testing import compare

# --- pinned word-layout examples (hand-computed from the EWAH spec) ---


def test_empty_bitmap_layout():
    size, words, rlw = ewah_encode([])
    assert (size, words, rlw) == (0, [0], 0)
    assert positions_to_hive_list([]) == [0, 1, 0, 0]


def test_single_bit_zero_layout():
    # one literal word with bit 0: marker says 0-run, 1 literal
    size, words, rlw = ewah_encode([0])
    assert size == 1
    assert words == [1 << 33, 1]
    assert rlw == 0


def test_full_word_becomes_one_run():
    size, words, rlw = ewah_encode(range(64))
    assert size == 64
    # marker: run_bit=1, run_len=1, no literals
    assert words == [(1 << 1) | 1]
    assert rlw == 0


def test_skipped_words_become_zero_run():
    # bit 200 lives in word 3: zero-run of 3 then one literal
    size, words, rlw = ewah_encode([200])
    assert size == 201
    assert words == [(1 << 33) | (3 << 1), 1 << (200 % 64)]
    assert rlw == 0


def test_mixed_runs_and_literals():
    # words: [0..63] one-run, word1 skipped (zero-run), bit 130 literal
    size, words, rlw = ewah_encode(list(range(64)) + [130])
    assert size == 131
    assert words[0] == (1 << 1) | 1          # 1-run of one word
    assert words[1] == (1 << 33) | (1 << 1)  # 0-run of one word + 1 literal
    assert words[2] == 1 << 2                # bit 130 = word 2, offset 2
    assert rlw == 1


def test_high_bit_word_is_signed_in_hive_list():
    # bit 63 sets the sign bit of the literal word
    arr = positions_to_hive_list([63])
    assert arr[0] == 64 and arr[1] == 2
    assert arr[3] == -(1 << 63)  # two's complement bigint
    assert hive_list_to_positions(arr) == [63]


def test_out_of_order_positions_rejected():
    # GenericUDAFEWAHBitmap.java:188 — can't set bits out of order
    with pytest.raises(ValueError, match="increasing"):
        ewah_encode([5, 3])
    with pytest.raises(ValueError, match="negative"):
        ewah_encode([-1])


def test_malformed_hive_list_rejected():
    with pytest.raises(ValueError, match="malformed"):
        hive_list_to_positions([0, 5, 0, 0])


# --- property tests: round-trip + op algebra --------------------------

positions_sets = st.sets(st.integers(min_value=0, max_value=5000),
                         max_size=400)


@settings(max_examples=200, deadline=None)
@given(positions_sets)
def test_roundtrip_property(ps):
    sorted_ps = sorted(ps)
    size, words, rlw = ewah_encode(sorted_ps)
    assert ewah_decode(words) == sorted_ps
    assert size == (max(ps) + 1 if ps else 0)
    # rlw points at a marker whose literal span ends the stream
    marker = words[rlw]
    assert rlw + (marker >> 33) == len(words) - 1
    assert hive_list_to_positions(positions_to_hive_list(sorted_ps)) == sorted_ps
    # stream-level cardinality (no position materialization) agrees
    from amplab_hive_spark.functions.bitmaps import ewah_cardinality_words
    assert ewah_cardinality_words(words) == len(ps)


@settings(max_examples=100, deadline=None)
@given(positions_sets)
def test_dense_runs_compress(ps):
    # encoded word count never exceeds words-touched + markers bound
    sorted_ps = sorted(ps)
    _, words, _ = ewah_encode(sorted_ps)
    touched = len({p // 64 for p in ps})
    assert len(words) <= 2 * touched + 1 or not ps


# --- Spark surface -----------------------------------------------------


def _sets_df(spark):
    rows = [Row(grp=g, pos=p)
            for g, ps in [("a", [1, 2, 3, 64, 65, 1000]),
                          ("b", [2, 3, 200, 1000, 4096]),
                          ("c", [])]
            for p in ps]
    return spark.createDataFrame(rows or [], "grp string, pos int")


def test_ewah_bitmap_udaf_groups(spark):
    df = _sets_df(spark)
    out = {r["grp"]: r["bitmap"]
           for r in ewah_bitmap(df, ["grp"], "pos").collect()}
    assert hive_list_to_positions(out["a"]) == [1, 2, 3, 64, 65, 1000]
    assert hive_list_to_positions(out["b"]) == [2, 3, 200, 1000, 4096]
    assert "c" not in out  # no rows -> no group, like any Hive GROUP BY


def test_ewah_bitmap_dedups_positions(spark):
    df = spark.createDataFrame(
        [("a", 7), ("a", 7), ("a", 9)], "grp string, pos int")
    [r] = ewah_bitmap(df, ["grp"], "pos").collect()
    assert hive_list_to_positions(r["bitmap"]) == [7, 9]


def test_bitmap_and_or_empty_columns(spark):
    a = positions_to_hive_list([1, 2, 3, 64])
    b = positions_to_hive_list([2, 64, 100])
    c = positions_to_hive_list([])
    df = spark.createDataFrame(
        [(a, b), (a, c)], "x array<bigint>, y array<bigint>")
    got = df.select(
        ewah_bitmap_and("x", "y").alias("andv"),
        ewah_bitmap_or("x", "y").alias("orv"),
        ewah_bitmap_empty(ewah_bitmap_and("x", "y")).alias("emp"),
        ewah_bitmap_cardinality("x").alias("card"),
    ).collect()
    assert hive_list_to_positions(got[0]["andv"]) == [2, 64]
    assert hive_list_to_positions(got[0]["orv"]) == [1, 2, 3, 64, 100]
    assert got[0]["emp"] is False and got[0]["card"] == 4
    assert hive_list_to_positions(got[1]["andv"]) == []
    assert got[1]["emp"] is True


def test_bitmap_index_lookup_equals_direct_filter(spark, sf_dir):
    # index orders by priority, positions = o_orderkey; small
    # bucket_bits forces multi-bucket bitmaps
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    idx = build_bitmap_index(orders, "o_orderpriority", "o_orderkey",
                             bucket_bits=8)
    wanted = ["1-URGENT", "5-LOW"]
    via_index = sorted(
        r["position"]
        for r in bitmap_index_lookup(idx, wanted, bucket_bits=8).collect())
    direct = sorted(
        r["o_orderkey"]
        for r in orders.filter(
            F.col("o_orderpriority").isin(wanted)).collect())
    assert via_index == direct and via_index


def test_index_bitmaps_are_bucket_bounded(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    idx = build_bitmap_index(orders, "o_orderpriority", "o_orderkey",
                             bucket_bits=8).collect()
    assert len({r["_bucketname"] for r in idx}) > 1
    for r in idx:
        ps = hive_list_to_positions(r["_bitmaps"])
        assert ps and max(ps) < (1 << 8)


def test_registered_query_matches_oracle(spark):
    spec = all_queries()["ewah_bitmap_ops"]
    compare(spark, spec, "/root/testdata/sf0.001")
    compare(spark, spec, "/root/testdata/sf0.01")


# r8: word-aligned stream merge (replaces the decode-to-position-sets
# pairwise ops — the r7 verdict's noted upgrade path)

from hypothesis import given, settings, strategies as st

from amplab_hive_spark.functions.bitmaps import (
    ewah_decode as _dec,
    ewah_encode as _enc,
    ewah_merge_words as _merge,
)


@settings(max_examples=120, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=3000), max_size=60),
    st.sets(st.integers(min_value=0, max_value=3000), max_size=60),
    st.booleans(),  # densify a into a run-heavy shape
    st.booleans(),
)
def test_stream_merge_matches_set_algebra(a, b, dense_a, dense_b):
    """ewah_merge_words == set algebra, and the merged stream is
    CANONONICALLY identical to encoding the reference set — trailing
    zeros trimmed, full words folded to one-runs, size_in_bits ends
    at the highest set bit. Dense variants force long one-runs so
    the run x run, run x literal and tail paths all execute."""
    if dense_a and a:
        a = set(range(min(a), min(a) + 64 * 5)) | a
    if dense_b and b:
        b = set(range(min(b), min(b) + 64 * 3)) | b
    _, wa, _ = _enc(sorted(a))
    _, wb, _ = _enc(sorted(b))
    for op, ref in (("and", a & b), ("or", a | b)):
        size, words, rlw = _merge(wa, wb, op)
        assert _dec(words) == sorted(ref)
        assert (size, words, rlw) == _enc(sorted(ref))


def test_stream_merge_never_materializes_positions():
    """A 2^20-bit one-run intersects in O(words), not O(bits): the
    merged stream of two huge runs is a couple of marker words."""
    _, wa, _ = _enc(range(0, 1 << 20))
    _, wb, _ = _enc(range(1 << 10, (1 << 20) + (1 << 10)))
    size, words, rlw = _merge(wa, wb, "and")
    assert len(words) <= 4  # zero-run marker + one-run marker
    assert size == 1 << 20
    _, worse, _ = _merge(wa, wb, "or")
    assert len(worse) <= 4
