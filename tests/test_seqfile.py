"""Hadoop SequenceFile source tests.

The correctness claim is NOT self-agreement: files our pure-Python
codec writes are read back by the Hadoop implementation bundled with
Spark (``sc.sequenceFile``), and files Hadoop writes — via
``saveAsSequenceFile``, including BLOCK-compressed DefaultCodec
output — are read by our codec. Reference semantic anchors:
ql/src/java/org/apache/hadoop/hive/ql/io/
SequenceFileStorageFormatDescriptor.java (``STORED AS
SEQUENCEFILE``) and the ignore-key Text-row table layout consumed by
serde2/lazy/LazySimpleSerDe.java.
"""

import glob
import io
import os

import pytest
from pyspark.sql import functions as F

from amplab_hive_spark.sources import seqfile_codec as codec
from amplab_hive_spark.sources.seqfile import (
    read_sequencefile,
    read_sequencefile_split,
    read_sequencefile_text_table,
    write_sequencefile,
    write_sequencefile_text_table,
)
from amplab_hive_spark.sources.seqfile_codec import (
    BYTES_WRITABLE,
    FileSpanReader,
    LONG_WRITABLE,
    SeqFileError,
    TEXT,
    encode_seqfile,
    read_header,
    read_seqfile_pairs,
    read_vlong,
    write_vlong,
)


# ---------------------------------------------------------------- #
# pure-codec unit tests
# ---------------------------------------------------------------- #


def test_vlong_hadoop_encoding_edges():
    """WritableUtils.writeVLong: single byte in [-112,127], else a
    length-tagged prefix. Known-good byte patterns + round-trips."""
    assert write_vlong(0) == b"\x00"
    assert write_vlong(127) == b"\x7f"
    assert write_vlong(-112) == bytes([(-112) & 0xFF])
    # 128 needs the 1-byte-positive tag -113 (0x8f)
    assert write_vlong(128) == b"\x8f\x80"
    # -113 is the first negative escape: tag -121 (0x87), payload ~(-113)=112
    assert write_vlong(-113) == b"\x87\x70"
    for v in (0, 1, -1, 127, -112, 128, -113, 255, 256, -129, 2**31 - 1,
              -(2**31), 2**63 - 1, -(2**63)):
        buf = write_vlong(v)
        got, pos = read_vlong(buf, 0)
        assert (got, pos) == (v, len(buf)), v


@pytest.mark.parametrize("compress", [False, True])
def test_codec_roundtrip_with_sync_markers(compress):
    """500 growing records crosses SYNC_INTERVAL several times, so
    the reader exercises the -1 escape path."""
    recs = [(f"k{i}", "v" * i) for i in range(500)]
    buf = encode_seqfile(recs, TEXT, TEXT, record_compress=compress, sync_seed="s")
    header = read_header(buf)
    assert header.compressed is compress
    assert read_seqfile_pairs(buf) == recs


def test_codec_typed_writables_roundtrip():
    recs = [(i, bytes([i % 256]) * i) for i in range(0, 300, 7)]
    buf = encode_seqfile(recs, LONG_WRITABLE, BYTES_WRITABLE, sync_seed="t")
    assert read_seqfile_pairs(buf) == recs


def test_codec_error_paths():
    with pytest.raises(SeqFileError, match="not a SequenceFile"):
        read_header(b"PAR1junkjunkjunkjunkjunk")
    with pytest.raises(SeqFileError, match="unsupported SequenceFile version"):
        read_header(b"SEQ\x04" + b"\x00" * 40)
    with pytest.raises(SeqFileError, match="unsupported Writable"):
        encode_seqfile([(1, 2)], "org.example.Custom", TEXT)
    buf = encode_seqfile([("a", "b")], TEXT, TEXT, sync_seed="e")
    with pytest.raises(SeqFileError, match="corrupt|truncated"):
        read_seqfile_pairs(buf[:-3])
    # a gzip/snappy codec name in the header must fail loudly
    bad = bytearray(encode_seqfile([("a", "b")], TEXT, TEXT, record_compress=True))
    bad_str = bytes(bad).replace(
        b"org.apache.hadoop.io.compress.DefaultCodec",
        b"org.apache.hadoop.io.compress.GzipCodecXX",
    )
    with pytest.raises(SeqFileError, match="unsupported compression codec"):
        read_header(bad_str)


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("span", [97, 1000, 5000])
def test_span_reader_tiles_exactly_once(compress, span):
    """Consecutive byte spans must cover every record exactly once
    (Hadoop's SequenceFileRecordReader contract: read past `end`
    until the terminating sync; anchor on the first sync after
    `start`)."""
    recs = [(f"k{i}", "v" * i) for i in range(400)]
    buf = encode_seqfile(recs, TEXT, TEXT, record_compress=compress, sync_seed="sp")
    header = read_header(buf)
    fh = io.BytesIO(buf)
    got = []
    for start in range(0, len(buf), span):
        reader = FileSpanReader(fh, header)
        got.extend(reader.rows_in_span(start, min(start + span, len(buf))))
    decoded = [(codec._dec_text(k), codec._dec_text(v)) for k, v in got]
    assert decoded == recs


# ---------------------------------------------------------------- #
# cross-validation against the Hadoop implementation in Spark
# ---------------------------------------------------------------- #


def test_hadoop_reads_our_files(spark, tmp_path):
    """Files from our writer (NONE and RECORD compression) read back
    by Hadoop's SequenceFile reader via sc.sequenceFile."""
    df = spark.range(0, 500).select(
        F.concat(F.lit("key"), F.col("id")).alias("key"),
        F.concat(F.lit("val-"), F.col("id")).alias("value"),
    )
    for comp in (False, True):
        path = str(tmp_path / f"ours_{comp}")
        n = write_sequencefile(df.repartition(3), path, record_compress=comp)
        assert n == 500
        back = dict(spark.sparkContext.sequenceFile(path).collect())
        assert len(back) == 500
        assert back["key42"] == "val-42"


def test_we_read_hadoop_files_all_compressions(spark, tmp_path):
    """Files from Hadoop's writer — uncompressed AND DefaultCodec
    (which saveAsSequenceFile emits BLOCK-compressed) — decoded by
    our reader with the schema typed from the header."""
    sc = spark.sparkContext
    plain = str(tmp_path / "plain")
    sc.parallelize([(f"k{i}", f"v{i}") for i in range(1000)], 3).saveAsSequenceFile(plain)
    got = read_sequencefile(spark, plain)
    assert got.schema.simpleString() == "struct<key:string,value:string>"
    pairs = dict((r.key, r.value) for r in got.collect())
    assert len(pairs) == 1000 and pairs["k7"] == "v7"

    block = str(tmp_path / "block")
    sc.parallelize([(f"k{i}", "x" * i) for i in range(800)], 2).saveAsSequenceFile(
        block, "org.apache.hadoop.io.compress.DefaultCodec"
    )
    # prove we're exercising the BLOCK branch, not a degenerate file
    part = sorted(glob.glob(block + "/part-*"))[0]
    with open(part, "rb") as fh:
        header = read_header(fh.read(1 << 20))
    assert header.block_compressed
    got_b = dict((r.key, r.value) for r in read_sequencefile(spark, block).collect())
    assert len(got_b) == 800 and got_b["k9"] == "x" * 9


def test_typed_writable_mapping_through_hadoop(spark, tmp_path):
    """int key + binary value map to IntWritable/BytesWritable on
    disk (verified by the header AND by Hadoop reading them)."""
    df = spark.range(0, 60).select(
        F.col("id").cast("int").alias("key"),
        F.encode(F.concat(F.lit("b"), F.col("id")), "utf-8").alias("value"),
    )
    path = str(tmp_path / "typed")
    write_sequencefile(df, path)
    part = sorted(glob.glob(path + "/part-*"))[0]
    with open(part, "rb") as fh:
        header = read_header(fh.read(1 << 20))
    assert header.key_class.endswith("IntWritable")
    assert header.value_class.endswith("BytesWritable")
    back = dict(spark.sparkContext.sequenceFile(path).collect())
    assert bytes(back[7]) == b"b7"
    got = read_sequencefile(spark, path)
    assert got.schema.simpleString() == "struct<key:int,value:binary>"


# ---------------------------------------------------------------- #
# split-parallel reader
# ---------------------------------------------------------------- #


def test_split_reader_covers_every_row_exactly_once(spark, tmp_path):
    """Small split_bytes forces many spans per file; the union must
    equal the whole-file read, with no duplicates — including over a
    Hadoop-written BLOCK-compressed file."""
    sc = spark.sparkContext
    block = str(tmp_path / "blocksplit")
    sc.parallelize([(f"k{i}", "y" * (i % 97)) for i in range(3000)], 2).saveAsSequenceFile(
        block, "org.apache.hadoop.io.compress.DefaultCodec"
    )
    whole = sorted(
        (r.key, r.value) for r in read_sequencefile(spark, block).collect()
    )
    split = sorted(
        (r.key, r.value)
        for r in read_sequencefile_split(spark, block, split_bytes=4096).collect()
    )
    assert split == whole and len(split) == 3000

    mine = str(tmp_path / "minesplit")
    df = spark.range(0, 2000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        F.repeat(F.lit("z"), (F.col("id") % 53).cast("int")).alias("value"),
    )
    write_sequencefile(df.repartition(2), mine)
    whole_m = sorted((r.key, r.value) for r in read_sequencefile(spark, mine).collect())
    split_m = sorted(
        (r.key, r.value)
        for r in read_sequencefile_split(spark, mine, split_bytes=2048).collect()
    )
    assert split_m == whole_m and len(split_m) == 2000


def test_writable_drift_across_files_raises(spark, tmp_path):
    d = str(tmp_path / "drift")
    os.makedirs(d)
    with open(os.path.join(d, "a.seq"), "wb") as fh:
        codec.write_seqfile_stream(fh, [("a", "1")], TEXT, TEXT, sync_seed="a")
    with open(os.path.join(d, "b.seq"), "wb") as fh:
        codec.write_seqfile_stream(fh, [(1, b"x")], LONG_WRITABLE, BYTES_WRITABLE, sync_seed="b")
    with pytest.raises(Exception, match="Writable drift"):
        read_sequencefile_split(spark, d).collect()


# ---------------------------------------------------------------- #
# the Hive table layout
# ---------------------------------------------------------------- #


def test_hive_text_table_roundtrip_with_nulls(spark, tmp_path):
    """STORED AS SEQUENCEFILE layout: \\x01-delimited Text rows,
    \\N nulls, empty-BytesWritable keys — written by us, readable by
    Hadoop, parsed back JVM-side with the original schema."""
    src = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, None, None), (3, "gam,ma", -0.25)],
        "id INT, name STRING, score DOUBLE",
    )
    path = str(tmp_path / "hivetab")
    n = write_sequencefile_text_table(src, path)
    assert n == 3
    part = sorted(glob.glob(path + "/part-*"))[0]
    with open(part, "rb") as fh:
        header = read_header(fh.read(1 << 20))
    assert header.key_class.endswith("BytesWritable")  # the ignore-key layout
    assert header.value_class.endswith("Text")
    back = read_sequencefile_text_table(spark, path, "id INT, name STRING, score DOUBLE")
    assert sorted(back.collect()) == sorted(src.collect())
    # Hadoop sees the same raw lines
    values = [v for _, v in spark.sparkContext.sequenceFile(path).collect()]
    assert sorted(values)[0].startswith("1\x01alpha")


def test_hive_text_table_custom_delimiter_is_regex_quoted(spark, tmp_path):
    """A '|' delimiter must be treated literally, not as regex
    alternation (split() takes a Java regex)."""
    src = spark.createDataFrame([(10, "aa"), (20, None)], "id INT, s STRING")
    path = str(tmp_path / "pipes")
    write_sequencefile_text_table(src, path, field_delim="|")
    back = read_sequencefile_text_table(spark, path, "id INT, s STRING", field_delim="|")
    assert sorted(back.collect()) == sorted(src.collect())


def test_text_table_parse_stays_jvm_side(spark, tmp_path):
    """The container decode is the documented Python path, but field
    extraction must be Catalyst: beyond mapInArrow there is no
    python_eval operator in the plan."""
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, s STRING")
    path = str(tmp_path / "planned")
    write_sequencefile_text_table(src, path)
    df = read_sequencefile_text_table(spark, path, "id INT, s STRING")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly the one decode stage, no per-row Python after it
    assert plan.count("MapInArrow") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_engine_facade_sequencefile(spark, tmp_path):
    from amplab_hive_spark.engine import Engine

    eng = Engine(spark)
    df = spark.range(0, 20).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        F.concat(F.lit("v"), F.col("id")).alias("value"),
    )
    path = str(tmp_path / "facade")
    assert eng.write_sequencefile(df, path) == 20
    assert eng.read_sequencefile(path).count() == 20


def test_span_reader_block_larger_than_initial_read(spark, tmp_path, monkeypatch):
    """ADVICE r7: a block whose compressed size exceeds the span
    reader's first read must still decode (growing re-read, simulating
    a writer-raised io.seqfile.compress.blocksize), and a genuinely
    truncated block must raise SeqFileError, not IndexError deep in
    read_vlong."""
    import io as _io

    from amplab_hive_spark.sources import seqfile_codec as sc

    block = str(tmp_path / "bigblock")
    spark.sparkContext.parallelize(
        [(f"k{i:05d}", "v" * 200 + str(i)) for i in range(2000)], 1
    ).saveAsSequenceFile(block, "org.apache.hadoop.io.compress.DefaultCodec")
    part = sorted(glob.glob(block + "/part-*"))[0]
    buf = open(part, "rb").read()
    assert read_header(buf).block_compressed

    def span_pairs(data):
        reader = sc.FileSpanReader(_io.BytesIO(data), read_header(data))
        return list(reader.rows_in_span(0, len(data)))

    want = span_pairs(buf)
    assert len(want) == 2000  # normal path first
    # force the initial read far below the block size so the doubling
    # path executes
    monkeypatch.setattr(sc, "_BLOCK_READ_BYTES", 256)
    assert span_pairs(buf) == want
    # truncated file: loud SeqFileError, never a bare IndexError
    with pytest.raises(sc.SeqFileError):
        span_pairs(buf[: len(buf) - 40])
