"""Hive RCFile source tests.

The correctness claim is NOT self-agreement: files our pure-Python
codec writes are read back by the Hive implementation bundled with
Spark (``org.apache.hadoop.hive.ql.io.RCFile`` via py4j), and files
Hive's Writer produces — plain AND DefaultCodec-compressed — are
decoded by our codec. Reference semantic anchors:
ql/src/java/org/apache/hadoop/hive/ql/io/RCFile.java (container),
RCFileStorageFormatDescriptor.java (``STORED AS RCFILE``), and
serde2/columnar/ColumnarSerDe.java (the text-cell table layout).
"""

import glob
import io
import os

import pytest
from pyspark.sql import functions as F

from amplab_hive_spark.sources.rcfile import (
    HIVE_NULL,
    read_rcfile_split,
    read_rcfile_table,
    write_rcfile_table,
)
from amplab_hive_spark.sources.rcfile_codec import (
    COLUMN_NUMBER_METADATA,
    RCFileError,
    RCSpanReader,
    decode_cell_lengths,
    encode_cell_lengths,
    encode_rcfile,
    read_rc_header,
    read_rcfile_rows,
)

ROWS3 = [(f"k{i}".encode(), str(i * i).encode(), b"z" * (i % 5)) for i in range(1200)]


# ---------------------------------------------------------------- #
# pure-codec unit tests
# ---------------------------------------------------------------- #


def test_cell_length_rle_known_patterns_and_roundtrip():
    """ColumnBuffer's RLE: a run's length once, then ~extraRepeats.
    The RCFile.java doc example: lengths 1,1,1,2 -> 1, ~2, 2."""
    import itertools

    from amplab_hive_spark.sources.seqfile_codec import write_vlong

    assert encode_cell_lengths([1, 1, 1, 2]) == (
        write_vlong(1) + write_vlong(~2) + write_vlong(2)
    )
    assert encode_cell_lengths([1, 2, 3]) == b"".join(write_vlong(v) for v in [1, 2, 3])
    for lens in ([0], [0, 0, 0], [5] * 300, [1, 1, 2, 2, 1], [130, 130, 7],
                 list(itertools.chain(*[[n] * (n % 4 + 1) for n in range(50)]))):
        assert decode_cell_lengths(encode_cell_lengths(lens), len(lens)) == lens
    # a nulled column stores an empty buffer -> all-zero lengths
    assert decode_cell_lengths(b"", 4) == [0, 0, 0, 0]


@pytest.mark.parametrize("compress", [False, True])
def test_codec_roundtrip_multi_group_with_sync(compress):
    """group_bytes small enough for many row groups and sync escapes."""
    buf = encode_rcfile(ROWS3, 3, compress=compress, sync_seed="t", group_bytes=2000)
    header = read_rc_header(buf)
    assert header.compressed is compress
    assert header.num_columns == 3
    assert header.metadata[COLUMN_NUMBER_METADATA] == "3"
    assert read_rcfile_rows(buf) == ROWS3


@pytest.mark.parametrize("compress", [False, True])
def test_codec_projection_skips_columns(compress):
    """wanted=[2,0] returns those columns in that order; with
    compression, the skipped column's payload is never inflated."""
    buf = encode_rcfile(ROWS3, 3, compress=compress, sync_seed="p", group_bytes=4000)
    assert read_rcfile_rows(buf, wanted=[2, 0]) == [(r[2], r[0]) for r in ROWS3]


def test_codec_error_paths():
    with pytest.raises(RCFileError, match="not an RCFile"):
        read_rc_header(b"PAR1" + b"\x00" * 40)
    with pytest.raises(RCFileError, match="at least one column"):
        encode_rcfile([], 0)
    buf = encode_rcfile([(b"a",)], 1, sync_seed="e")
    with pytest.raises(RCFileError, match="corrupt|truncated"):
        read_rcfile_rows(buf[:-2])
    with pytest.raises(RCFileError, match="cells"):
        encode_rcfile([(b"a", b"b")], 3)
    bad = buf.replace(
        b"org.apache.hadoop.io.compress.DefaultCodec", b""
    )  # no codec string present uncompressed; force a bad codec header instead
    comp = encode_rcfile([(b"a",)], 1, compress=True, sync_seed="e2")
    comp_bad = comp.replace(
        b"org.apache.hadoop.io.compress.DefaultCodec",
        b"org.apache.hadoop.io.compress.GzipCodecXXX",
    )
    with pytest.raises(RCFileError, match="unsupported compression codec"):
        read_rc_header(comp_bad)


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("span", [137, 1000, 7000])
def test_span_reader_tiles_groups_exactly_once(compress, span):
    """Consecutive byte spans must decode every row group exactly
    once (RCFileRecordReader's contract: consume past `end` until
    the terminating sync; anchor on the first sync after `start`)."""
    buf = encode_rcfile(ROWS3, 3, compress=compress, sync_seed="sp", group_bytes=1500)
    header = read_rc_header(buf)
    fh = io.BytesIO(buf)
    got = []
    for start in range(0, len(buf), span):
        reader = RCSpanReader(fh, header)
        for _n, cols in reader.groups_in_span(start, min(start + span, len(buf))):
            got.extend(zip(cols[0], cols[1], cols[2]))
    assert got == ROWS3


# ---------------------------------------------------------------- #
# cross-validation against the Hive implementation in Spark's JVM
# ---------------------------------------------------------------- #


def _java_rcfile_env(spark, num_cols):
    jvm = spark._jvm
    conf = jvm.org.apache.hadoop.conf.Configuration()
    # the WRITER-side conf key differs from the in-file metadata key
    conf.setInt("hive.io.rcfile.column.number.conf", num_cols)
    fs = jvm.org.apache.hadoop.fs.FileSystem.getLocal(conf)
    return jvm, conf, fs


def _java_write(spark, f, rows, num_cols, compress=False):
    jvm, conf, fs = _java_rcfile_env(spark, num_cols)
    codec = None
    if compress:
        codec = jvm.org.apache.hadoop.io.compress.DefaultCodec()
        codec.setConf(conf)
    w = jvm.org.apache.hadoop.hive.ql.io.RCFile.Writer(
        fs, conf, jvm.org.apache.hadoop.fs.Path(f), None, codec
    )
    for r in rows:
        jr = jvm.org.apache.hadoop.hive.serde2.columnar.BytesRefArrayWritable(num_cols)
        for ci, cell in enumerate(r):
            jr.set(ci, jvm.org.apache.hadoop.hive.serde2.columnar.BytesRefWritable(cell))
        w.append(jr)
    w.close()


def _java_read(spark, f, num_cols):
    jvm, conf, fs = _java_rcfile_env(spark, num_cols)
    rd = jvm.org.apache.hadoop.hive.ql.io.RCFile.Reader(
        fs, jvm.org.apache.hadoop.fs.Path(f), conf
    )
    rowid = jvm.org.apache.hadoop.io.LongWritable()
    jr = jvm.org.apache.hadoop.hive.serde2.columnar.BytesRefArrayWritable()
    out = []
    while rd.next(rowid):
        rd.getCurrentRow(jr)
        out.append(tuple(bytes(jr.get(ci).getBytesCopy()) for ci in range(jr.size())))
    rd.close()
    return out


@pytest.mark.parametrize("compress", [False, True])
def test_hive_java_reads_our_files(spark, tmp_path, compress):
    f = str(tmp_path / f"ours_{compress}.rc")
    with open(f, "wb") as fh:
        from amplab_hive_spark.sources.rcfile_codec import write_rcfile_stream

        n = write_rcfile_stream(
            fh, ROWS3, 3, compress=compress, sync_seed=f, group_bytes=3000
        )
    assert n == len(ROWS3)
    assert _java_read(spark, f, 3) == ROWS3


@pytest.mark.parametrize("compress", [False, True])
def test_we_read_hive_java_files(spark, tmp_path, compress):
    f = str(tmp_path / f"java_{compress}.rc")
    _java_write(spark, f, ROWS3, 3, compress=compress)
    with open(f, "rb") as fh:
        buf = fh.read()
    header = read_rc_header(buf)
    assert header.compressed is compress
    assert read_rcfile_rows(buf) == ROWS3
    # and the projected read agrees on Java-written payloads too
    assert read_rcfile_rows(buf, wanted=[1]) == [(r[1],) for r in ROWS3]


# ---------------------------------------------------------------- #
# distributed table layer
# ---------------------------------------------------------------- #


def test_table_roundtrip_with_nulls(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, None, None), (3, "gam,ma", -0.25), (4, "", 0.0)],
        "id INT, name STRING, score DOUBLE",
    )
    path = str(tmp_path / "tab")
    n = write_rcfile_table(src, path)
    assert n == 4
    back = read_rcfile_table(spark, path, "id INT, name STRING, score DOUBLE")
    assert sorted(back.collect()) == sorted(src.collect())
    # empty string survives as empty string, not NULL
    assert back.filter("id = 4").first().name == ""


def test_table_column_projection_prunes_decode(spark, tmp_path):
    """Projection must reach the container decode: the mapInArrow
    output schema carries ONLY the projected columns."""
    src = spark.range(0, 500).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("nm"), F.col("id")).alias("name"),
        (F.col("id") * 2).alias("twice"),
    )
    path = str(tmp_path / "proj")
    write_rcfile_table(src.repartition(2), path, compress=True)
    got = read_rcfile_table(
        spark, path, "id INT, name STRING, twice BIGINT", columns=["twice", "id"]
    )
    assert got.columns == ["twice", "id"]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = {r.id: r.twice for r in got.collect()}
    assert len(rows) == 500 and rows[7] == 14


def test_table_schema_evolution_missing_tail_reads_null(spark, tmp_path):
    """Hive reads a file with fewer columns than the table as NULL
    for the missing tail."""
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, s STRING")
    path = str(tmp_path / "evolve")
    write_rcfile_table(src, path)
    widened = read_rcfile_table(spark, path, "id INT, s STRING, extra DOUBLE")
    got = sorted((r.id, r.s, r.extra) for r in widened.collect())
    assert got == [(1, "a", None), (2, "b", None)]


@pytest.mark.parametrize("compress", [False, True])
def test_split_reader_covers_every_row_exactly_once(spark, tmp_path, compress):
    src = spark.range(0, 3000).select(
        F.col("id").cast("int").alias("id"),
        F.repeat(F.lit("y"), (F.col("id") % 97).cast("int")).alias("pad"),
    )
    path = str(tmp_path / f"split_{compress}")
    write_rcfile_table(
        src.repartition(2), path, compress=compress, group_bytes=2048
    )
    whole = sorted((r.id, r.pad) for r in
                   read_rcfile_table(spark, path, "id INT, pad STRING").collect())
    split = sorted(
        (r.id, r.pad)
        for r in read_rcfile_split(
            spark, path, "id INT, pad STRING", split_bytes=4096
        ).collect()
    )
    assert split == whole and len(split) == 3000


def test_table_layout_matches_hive_columnar_cells(spark, tmp_path):
    """The table writer's cells must be exactly the ColumnarSerDe
    text layout: Hive's own Reader sees field text and \\N nulls."""
    src = spark.createDataFrame(
        [(10, "aa", None), (20, None, 2.5)], "id INT, s STRING, d DOUBLE"
    )
    path = str(tmp_path / "cells")
    write_rcfile_table(src.coalesce(1), path)
    part = sorted(glob.glob(path + "/part-*"))[0]
    cells = _java_read(spark, part, 3)
    assert sorted(cells) == sorted(
        [
            (b"10", b"aa", HIVE_NULL.encode()),
            (b"20", HIVE_NULL.encode(), b"2.5"),
        ]
    )


def test_engine_facade_rcfile(spark, tmp_path):
    from amplab_hive_spark.engine import Engine

    eng = Engine(spark)
    df = spark.range(0, 25).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    path = str(tmp_path / "facade")
    assert eng.write_rcfile(df, path) == 25
    got = eng.read_rcfile(path, "id INT, v STRING", columns=["v"])
    assert got.count() == 25 and got.columns == ["v"]


def test_lineitem_slice_roundtrip_against_parquet(spark, sf_dir, tmp_path):
    """End-to-end on real testdata: a lineitem projection written to
    RCFile (compressed) and read back equals the parquet original."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"
    )
    ddl = ("l_orderkey BIGINT, l_linenumber INT, l_quantity DOUBLE, "
           "l_returnflag STRING, l_shipdate TIMESTAMP")
    path = str(tmp_path / "li")
    n = write_rcfile_table(li.repartition(3), path, compress=True)
    assert n == li.count()
    back = read_rcfile_table(spark, path, ddl)
    a = sorted(map(tuple, li.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
