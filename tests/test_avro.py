"""Avro source tests (closes the round-4 "what's missing" item 1).

The correctness claim is NOT self-agreement: the files our pure-Python
codec writes are read back by the official Apache Avro JAVA library
(avro-1.12.1.jar, already on Spark's classpath, driven via py4j), and
files written by the Java library are read by our codec. Reference
semantic anchor: serde/src/java/org/apache/hadoop/hive/serde2/avro/
AvroSerDe.java (Hive's Avro storage format).
"""

import json
import math
import os

import pytest

from amplab_hive_spark.catalog import tables
from amplab_hive_spark.sources.avro import (
    avro_to_spark_schema,
    read_avro,
    spark_to_avro_schema,
    write_avro,
)
from amplab_hive_spark.sources.avro_codec import (
    AvroError,
    read_container,
    write_container,
)

RICH_SCHEMA = {
    "type": "record",
    "name": "rich",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": {"type": "array", "items": "float"}},
        {"name": "d", "type": "double"},
        {"name": "ts", "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}]},
        {"name": "m", "type": {"type": "map", "values": "int"}},
        {"name": "bin", "type": "bytes"},
        {"name": "flag", "type": "boolean"},
    ],
}

RICH_ROWS = [
    {
        "a": -(2**63),  # zigzag lower edge
        "b": None,
        "c": [1.5, -2.25],
        "d": 3.14159,
        "ts": 1700000000000000,
        "m": {"x": 1, "y": -2},
        "bin": b"\x00\xff\x10",
        "flag": True,
    },
    {
        "a": 2**63 - 1,  # zigzag upper edge
        "b": "héllo ünïcode ☃",
        "c": [],
        "d": float("nan"),
        "ts": None,
        "m": {},
        "bin": b"",
        "flag": False,
    },
    {"a": 0, "b": "", "c": [0.0], "d": -0.0, "ts": 0, "m": {"k": 0}, "bin": b"\x7f", "flag": True},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_codec_roundtrip_rich_types(codec):
    blob = write_container(RICH_SCHEMA, RICH_ROWS, codec=codec)
    schema, rows = read_container(blob)
    got = list(rows)
    assert schema == RICH_SCHEMA
    assert len(got) == 3
    assert got[0] == RICH_ROWS[0]
    assert got[1]["a"] == 2**63 - 1 and got[1]["b"] == RICH_ROWS[1]["b"]
    assert math.isnan(got[1]["d"]) and got[1]["ts"] is None
    assert got[2] == RICH_ROWS[2]


def test_codec_multiblock_and_order():
    rows = [{"a": i, "b": str(i), "c": [float(i)], "d": i / 7, "ts": i, "m": {}, "bin": b"", "flag": False} for i in range(10_000)]
    blob = write_container(RICH_SCHEMA, rows)
    got = list(read_container(blob)[1])
    assert len(got) == 10_000
    assert [r["a"] for r in got] == list(range(10_000))  # block framing preserves order


def test_codec_error_paths():
    with pytest.raises(AvroError, match="magic"):
        read_container(b"PAR1" + b"\x00" * 64)
    with pytest.raises(AvroError, match="codec"):
        write_container("long", [1], codec="snappy")
    with pytest.raises(AvroError, match="union"):
        write_container(["int", "string"], ["x"])
    with pytest.raises(AvroError, match="unsupported Avro type"):
        write_container({"type": "enum", "name": "e", "symbols": ["A"]}, ["A"])


def test_schema_translation_roundtrip(spark, sf_dir):
    for name in ["region", "orders", "lineitem", "events", "documents", "embeddings"]:
        df = getattr(tables(spark, sf_dir), name)
        back = avro_to_spark_schema(spark_to_avro_schema(df.schema))
        assert [(f.name, f.dataType) for f in back.fields] == [
            (f.name, f.dataType) for f in df.schema.fields
        ], name


def test_spark_roundtrip_all_tables(spark, sf_dir, tmp_path):
    """Every testdata table: write_avro -> read_avro must preserve
    schema (names + types) and the full value multiset. Covers long/
    int/double/string, timestamp_ntz, and array<float>."""
    t = tables(spark, sf_dir)
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        df = getattr(t, name)
        path = str(tmp_path / name)
        n = write_avro(df, path)
        assert n == df.count()
        back = read_avro(spark, path)
        assert [(f.name, f.dataType) for f in back.schema.fields] == [
            (f.name, f.dataType) for f in df.schema.fields
        ], name
        assert sorted(map(str, back.collect())) == sorted(map(str, df.collect())), name
        assert os.path.exists(os.path.join(path, "_SUCCESS"))


def test_repartition_controls_file_fanout(spark, sf_dir, tmp_path):
    t = tables(spark, sf_dir)
    path = str(tmp_path / "orders4")
    write_avro(t.orders.repartition(4), path)
    files = [f for f in os.listdir(path) if f.endswith(".avro")]
    assert len(files) == 4


def test_java_library_reads_our_files(spark, sf_dir, tmp_path):
    """Files written by the Python codec must be readable by
    org.apache.avro.file.DataFileReader — the official implementation
    is the oracle, not our own reader."""
    t = tables(spark, sf_dir)
    path = str(tmp_path / "nation")
    write_avro(t.nation, path)
    jvm = spark._jvm
    total, names = 0, set()
    for af in sorted(os.listdir(path)):
        if not af.endswith(".avro"):
            continue
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(os.path.join(path, af)),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        while reader.hasNext():
            rec = reader.next()
            total += 1
            names.add(str(rec.get("n_name")))
        reader.close()
    expected = {r.n_name for r in t.nation.collect()}
    assert total == 25 and names == expected


def test_we_read_java_written_files(spark, tmp_path):
    """Files written by the official Java library (deflate codec,
    including its array encoding and null unions) must decode
    correctly here."""
    jvm = spark._jvm
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "jrec",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "label", "type": ["null", "string"]},
                {"name": "score", "type": "double"},
                {"name": "tags", "type": {"type": "array", "items": "int"}},
            ],
        }
    )
    jschema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    jpath = str(tmp_path / "javafile.avro")
    writer.create(jschema, jvm.java.io.File(jpath))
    GD = jvm.org.apache.avro.generic.GenericData
    for i in range(50):
        rec = GD.Record(jschema)
        rec.put("id", i)
        rec.put("label", None if i % 5 == 0 else f"L{i}")
        rec.put("score", i / 3.0)
        arr = jvm.java.util.ArrayList()
        for k in range(i % 4):
            arr.add(k)
        rec.put("tags", arr)
        writer.append(rec)
    writer.close()
    with open(jpath, "rb") as fh:
        _schema, rows = read_container(fh.read())
    got = list(rows)
    assert len(got) == 50
    assert got[0] == {"id": 0, "label": None, "score": 0.0, "tags": []}
    assert got[7] == {"id": 7, "label": "L7", "score": 7 / 3.0, "tags": [0, 1, 2]}
    # and the Spark-level reader agrees end-to-end
    df = read_avro(spark, jpath)
    assert df.count() == 50
    assert df.filter("label IS NULL").count() == 10


def test_temporal_values_exact_to_the_microsecond(spark, tmp_path):
    """Timestamps travel as integer micros through Arrow casts — no
    float or strptime on the path. A microsecond-precision value must
    survive exactly."""
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-02-29 23:59:59.999999' AS ts, "
        "DATE '2024-02-29' AS d, CAST(NULL AS TIMESTAMP_NTZ) AS ts_null"
    )
    path = str(tmp_path / "temporal")
    write_avro(df, path)
    back = read_avro(spark, path).collect()[0]
    assert str(back.ts) == "2024-02-29 23:59:59.999999"
    assert str(back.d) == "2024-02-29"
    assert back.ts_null is None


def test_engine_facade_avro(spark, sf_dir, tmp_path):
    from amplab_hive_spark.engine import Engine

    e = Engine(spark, sf_dir=sf_dir)
    path = str(tmp_path / "facade_nation")
    assert e.write_avro(e.table("nation"), path) == 25
    back = e.read_avro(path)
    assert back.count() == 25
    assert {r.n_name for r in back.collect()} == {
        r.n_name for r in e.table("nation").collect()
    }
    assert e.read_avro_split(path, split_bytes=1 << 12).count() == 25


def test_split_reader_covers_every_row_exactly_once(spark, sf_dir, tmp_path):
    """read_avro_split: ONE container file carved into byte spans
    far smaller than the file must reproduce the whole-file read
    exactly — every block consumed by precisely the span containing
    its first byte (the Hadoop/Avro split contract). This is the
    few-huge-files scale path the per-file reader can't parallelize."""
    from amplab_hive_spark.sources.avro import read_avro_split

    t = tables(spark, sf_dir)
    path = str(tmp_path / "one_file")
    n = write_avro(t.lineitem.coalesce(1), path)
    whole = read_avro(spark, path)
    split = read_avro_split(spark, path, split_bytes=64 << 10)  # many spans
    assert split.count() == whole.count() == n
    assert (
        split.selectExpr("sum(l_orderkey)").collect()[0][0]
        == whole.selectExpr("sum(l_orderkey)").collect()[0][0]
    )
    a = sorted(map(tuple, split.groupBy("l_returnflag").count().collect()))
    b = sorted(map(tuple, whole.groupBy("l_returnflag").count().collect()))
    assert a == b


def test_split_reader_multi_file_dir(spark, sf_dir, tmp_path):
    from amplab_hive_spark.sources.avro import read_avro_split

    t = tables(spark, sf_dir)
    path = str(tmp_path / "multi")
    write_avro(t.orders.repartition(3), path)
    split = read_avro_split(spark, path, split_bytes=32 << 10)
    assert split.count() == t.orders.count()
    assert {r.o_orderstatus for r in split.select("o_orderstatus").distinct().collect()} == {
        r.o_orderstatus for r in t.orders.select("o_orderstatus").distinct().collect()
    }


def test_split_ownership_at_exact_block_boundaries():
    """Regression: a span boundary landing exactly ON a block start,
    or inside the 16-byte sync marker preceding it, must not drop (or
    double-read) that block. The owner rule is Java's pastSync: a
    block belongs to the span containing the first byte of its
    preceding sync (block_start - 16). Before this rule, the earlier
    span stopped at block_start < end and the later span's scan could
    not see a sync pattern that began before its start — both sides
    skipped the block. Exercises every block start offset b and every
    boundary in [b-17, b+1], plus boundaries inside the header's
    trailing sync."""
    import io

    from amplab_hive_spark.sources.avro_codec import (
        FileBlockReader,
        _Reader,
        read_header,
        write_container_stream,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "id", "type": "long"}],
    }
    n = 10_000  # 4096-row blocks -> 3 blocks
    buf = io.BytesIO()
    write_container_stream(buf, schema, ({"id": i} for i in range(n)), codec="null")
    data = buf.getvalue()
    size = len(data)
    _, codec, sync, header_len = read_header(data)

    # Walk the container to learn the true block start offsets.
    block_starts = []
    r = _Reader(data, header_len)
    while not r.eof():
        block_starts.append(r.pos)
        r.read_long()
        r.read(r.read_long())
        assert r.read(16) == sync
    assert len(block_starts) == 3

    def ids_in(spans):
        out = []
        for s, e in spans:
            fh = io.BytesIO(data)
            rd = FileBlockReader(fh, schema, codec, sync, header_len)
            out.extend(row["id"] for row in rd.rows_in_span(s, e))
        return out

    boundaries = {header_len - 16, header_len - 8, header_len}
    for b in block_starts:
        boundaries.update(range(b - 17, b + 2))
    for b in sorted(boundaries):
        got = ids_in([(0, b), (b, size)])
        assert sorted(got) == list(range(n)), (
            f"boundary {b}: {len(got)} rows, "
            f"missing={set(range(n)) - set(got) or '-'} "
            f"dups={len(got) - len(set(got))}"
        )

    # and a many-tiny-spans sweep (97-byte steps, prime to avoid
    # accidental alignment) still covers every row exactly once
    spans = [(s, min(s + 97, size)) for s in range(0, size, 97)]
    got = ids_in(spans)
    assert sorted(got) == list(range(n))


def test_map_and_struct_columns_through_arrow_write_path(spark, tmp_path):
    """Regression: Arrow's RecordBatch.to_pylist() renders MapType
    cells as lists of (key, value) TUPLES, not dicts — the codec's
    map encoder must accept both or write_avro crashes on any
    DataFrame with a map column (previously AttributeError: 'list'
    object has no attribute 'items' inside the executor)."""
    from amplab_hive_spark.sources.avro import read_avro, write_avro

    df = spark.createDataFrame(
        [
            (1, {"a": 1, "b": 2}, {"x": 1.5}, ["u", "v"]),
            (2, {}, None, []),
            (3, {"c": 30}, {"y": -2.25}, None),
        ],
        "id long, counts map<string,int>, weights map<string,double>, tags array<string>",
    )
    path = str(tmp_path / "maps")
    assert write_avro(df, path) == 3
    back = {r["id"]: r for r in read_avro(spark, path).collect()}
    assert back[1]["counts"] == {"a": 1, "b": 2}
    assert back[1]["weights"] == {"x": 1.5}
    assert back[1]["tags"] == ["u", "v"]
    assert back[2]["counts"] == {} and back[2]["weights"] is None
    assert back[3]["counts"] == {"c": 30} and back[3]["tags"] is None


def test_split_reader_raises_on_truncated_file():
    """A file truncated inside a block header (crashed writer,
    partial copy) must RAISE from the split path, not silently
    return partial rows — read_container and the split reader have
    to agree that corruption is an error."""
    import io

    import pytest as _pytest

    from amplab_hive_spark.sources.avro_codec import (
        AvroError,
        FileBlockReader,
        read_header,
        write_container,
    )

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "id", "type": "long"}]}
    data = write_container(schema, ({"id": i} for i in range(9000)), codec="null")
    _, codec, sync, hlen = read_header(data)

    def rows_from(buf):
        rd = FileBlockReader(io.BytesIO(buf), schema, codec, sync, hlen)
        return list(rd.rows_in_span(0, len(buf)))

    assert len(rows_from(data)) == 9000
    # truncate INSIDE the second block (mid-payload): short payload read
    second_block = data.find(sync, hlen) + 16
    with _pytest.raises(AvroError):
        rows_from(data[: second_block + 40])
    # truncate inside the count/size varints right at the block start
    with _pytest.raises(AvroError):
        rows_from(data[: second_block + 1])


def test_read_avro_schema_evolution(spark, tmp_path):
    """allow_evolution: a directory mixing an old-schema file (no
    'score' column) with a new-schema file reads as the first file's
    schema — the missing nullable column fills NULL, extra columns
    in other files are dropped, and a TYPE change on a shared field
    is still an error. Default remains strict."""
    import pytest as _pytest

    from amplab_hive_spark.sources.avro import read_avro, write_avro
    from amplab_hive_spark.sources.avro_codec import AvroError

    path = str(tmp_path / "evo")
    os.makedirs(path)
    # file 0 (sorted first): the TARGET schema (id, label, score)
    df_new = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id long, label string, score double"
    )
    write_avro(df_new.coalesce(1), path + "/0new")
    os.rename(path + "/0new/part-00000.avro", path + "/a-new.avro")
    # later file: old schema without 'score', plus an extra column
    df_old = spark.createDataFrame(
        [(3, "c", 99), (4, "d", 98)], "id long, label string, legacy int"
    )
    write_avro(df_old.coalesce(1), path + "/1old")
    os.rename(path + "/1old/part-00000.avro", path + "/b-old.avro")

    with _pytest.raises(Exception):  # strict default still rejects
        read_avro(spark, path).collect()
    got = {r["id"]: r for r in read_avro(spark, path, allow_evolution=True).collect()}
    assert sorted(got) == [1, 2, 3, 4]
    assert got[1]["score"] == 1.5 and got[3]["score"] is None
    assert "legacy" not in got[3].asDict()

    # shared-field type change is never reconcilable
    df_bad = spark.createDataFrame([(5, 7, 0.1)], "id long, label int, score double")
    write_avro(df_bad.coalesce(1), path + "/2bad")
    os.rename(path + "/2bad/part-00000.avro", path + "/c-bad.avro")
    with _pytest.raises(Exception, match="schema evolution"):
        read_avro(spark, path, allow_evolution=True).collect()


# --- round 6: decimal logical type ---------------------------------
DEC_SCHEMA = {
    "type": "record",
    "name": "decrec",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "amt", "type": {"type": "bytes", "logicalType": "decimal",
                                 "precision": 12, "scale": 2}},
        {"name": "opt", "type": ["null", {"type": "bytes", "logicalType": "decimal",
                                          "precision": 38, "scale": 10}]},
    ],
}


def test_codec_decimal_roundtrip():
    from decimal import Decimal as D

    rows = [
        {"id": 1, "amt": D("0.00"), "opt": None},
        {"id": 2, "amt": D("-0.01"), "opt": D("1234567890123456789012345678.0000000001")},
        {"id": 3, "amt": D("9999999999.99"), "opt": D("-0.0000000001")},
        {"id": 4, "amt": D("-9999999999.99"), "opt": D("42.0000000000")},
        {"id": 5, "amt": D("128.00"), "opt": D("-128.0000000000")},  # byte-length edges
    ]
    blob = write_container(DEC_SCHEMA, rows)
    schema, out = read_container(blob)
    got = list(out)
    assert schema == DEC_SCHEMA
    assert got == rows
    # a value that does not fit the declared scale must fail loudly
    from decimal import Decimal as D2
    with pytest.raises(AvroError, match="scale"):
        write_container(DEC_SCHEMA, [{"id": 9, "amt": D2("0.001"), "opt": None}])


def test_spark_decimal_roundtrip(spark, tmp_path):
    """DecimalType columns survive write_avro -> read_avro with exact
    schema (precision/scale) and values — including negatives, nulls,
    and 38-digit precision (the Spark maximum)."""
    df = spark.sql("""
        SELECT id,
               CAST(id * 1.01 - 5 AS DECIMAL(12, 2)) AS amt,
               CASE WHEN id % 3 = 0 THEN NULL
                    ELSE CAST(id AS DECIMAL(38, 10)) / 7 END AS frac
        FROM range(50)
    """)
    path = str(tmp_path / "decimals")
    assert write_avro(df, path) == 50
    back = read_avro(spark, path)
    assert [(f.name, f.dataType.simpleString()) for f in back.schema.fields] == [
        ("id", "bigint"), ("amt", "decimal(12,2)"), ("frac", "decimal(38,10)")
    ]
    assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))


def test_java_reads_our_decimals(spark, tmp_path):
    """The official Java library must decode our decimal bytes to the
    same unscaled integers (GenericDatumReader returns the raw
    ByteBuffer; we compare two's-complement decodings)."""
    df = spark.sql(
        "SELECT id, CAST(id - 25 + 0.25 AS DECIMAL(10, 2)) AS amt FROM range(50)"
    )
    path = str(tmp_path / "jdec")
    write_avro(df.coalesce(1), path)
    jvm = spark._jvm
    got = {}
    for af in os.listdir(path):
        if not af.endswith(".avro"):
            continue
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(os.path.join(path, af)),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        while reader.hasNext():
            rec = reader.next()
            buf = rec.get("amt")  # java.nio.ByteBuffer (heap-backed)
            # py4j copies Python->Java args, so buf.get(bytearray)
            # can't write back — copy the range out on the JVM side.
            raw = jvm.java.util.Arrays.copyOfRange(
                buf.array(),
                buf.arrayOffset() + buf.position(),
                buf.arrayOffset() + buf.limit(),
            )
            got[rec.get("id")] = int.from_bytes(bytes(raw), "big", signed=True)
        reader.close()
    want = {r.id: int(r.amt.scaleb(2)) for r in df.collect()}
    assert got == want


def test_we_read_java_written_decimals(spark, tmp_path):
    """Decimal bytes written by the official Java library decode to
    the right Spark DecimalType column and values."""
    from decimal import Decimal as D

    jvm = spark._jvm
    schema_json = json.dumps(DEC_SCHEMA)
    jschema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    )
    jpath = str(tmp_path / "javadec")
    os.makedirs(jpath)
    writer.create(jschema, jvm.java.io.File(os.path.join(jpath, "part-0.avro")))
    GD = jvm.org.apache.avro.generic.GenericData
    vals = [D("-1.23"), D("0.00"), D("12345678.90"), D("-9999999999.99")]
    for i, v in enumerate(vals):
        rec = GD.Record(jschema)
        rec.put("id", i)
        unscaled = int(v.scaleb(2))
        length = max(1, (unscaled.bit_length() + 8) // 8)
        rec.put("amt", jvm.java.nio.ByteBuffer.wrap(
            unscaled.to_bytes(length, "big", signed=True)))
        rec.put("opt", None if i % 2 else jvm.java.nio.ByteBuffer.wrap(
            int(D(i).scaleb(10)).to_bytes(6, "big", signed=True)))
        writer.append(rec)
    writer.close()
    back = read_avro(spark, jpath)
    assert back.schema["amt"].dataType.simpleString() == "decimal(12,2)"
    assert back.schema["opt"].dataType.simpleString() == "decimal(38,10)"
    rows = {r.id: (r.amt, r.opt) for r in back.collect()}
    assert [rows[i][0] for i in range(4)] == vals
    assert rows[0][1] == D("0.0000000000") and rows[1][1] is None
    assert rows[2][1] == D("2.0000000000")


# --- round 7: decimal over FIXED (the spec's second carrier) --------
FIXED_DEC_SCHEMA = {
    "type": "record",
    "name": "fixdecrec",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "amt", "type": {"type": "fixed", "name": "amt_fix", "size": 5,
                                 "logicalType": "decimal",
                                 "precision": 12, "scale": 2}},
        {"name": "opt", "type": ["null", {"type": "fixed", "name": "opt_fix",
                                          "size": 16,
                                          "logicalType": "decimal",
                                          "precision": 38, "scale": 10}]},
    ],
}


def test_codec_fixed_decimal_roundtrip():
    """decimal over fixed: exactly `size` octets, no length prefix —
    including sign-extension edges and the null branch; a value too
    wide for the fixed size fails loudly."""
    from decimal import Decimal as D

    rows = [
        {"id": 1, "amt": D("0.00"), "opt": None},
        {"id": 2, "amt": D("-0.01"), "opt": D("1234567890123456789012345678.0000000001")},
        # 5 bytes signed: max unscaled 2^39-1 = 549755813887 -> 5497558138.87
        {"id": 3, "amt": D("5497558138.87"), "opt": D("-0.0000000001")},
        {"id": 4, "amt": D("-5497558138.88"), "opt": D("42.0000000000")},
        {"id": 5, "amt": D("128.00"), "opt": D("-128.0000000000")},
    ]
    blob = write_container(FIXED_DEC_SCHEMA, rows)
    schema, out = read_container(blob)
    assert schema == FIXED_DEC_SCHEMA
    assert list(out) == rows
    with pytest.raises(AvroError, match="does not fit fixed"):
        write_container(
            FIXED_DEC_SCHEMA,
            [{"id": 9, "amt": D("5497558138.88"), "opt": None}],  # 2^39 unscaled
        )
    with pytest.raises(AvroError, match="scale"):
        write_container(
            FIXED_DEC_SCHEMA, [{"id": 9, "amt": D("0.001"), "opt": None}]
        )


def test_java_reads_our_fixed_decimals(spark, tmp_path):
    """The official Java library must read our fixed-decimal bytes:
    GenericData.Fixed carries exactly size octets whose two's-
    complement value is the unscaled integer."""
    from decimal import Decimal as D

    rows = [
        {"id": i, "amt": D(i * 7 - 50).scaleb(-2).quantize(D("0.01")),
         "opt": None if i % 2 else D(i).scaleb(-10).quantize(D("1E-10"))}
        for i in range(20)
    ]
    blob = write_container(FIXED_DEC_SCHEMA, rows)
    f = tmp_path / "ours.avro"
    f.write_bytes(blob)
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(str(f)),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = {}
    while reader.hasNext():
        rec = reader.next()
        amt = int.from_bytes(bytes(rec.get("amt").bytes()), "big", signed=True)
        o = rec.get("opt")
        opt = None if o is None else int.from_bytes(
            bytes(o.bytes()), "big", signed=True
        )
        got[rec.get("id")] = (amt, opt)
    reader.close()
    want = {
        r["id"]: (
            int(r["amt"].scaleb(2)),
            None if r["opt"] is None else int(r["opt"].scaleb(10)),
        )
        for r in rows
    }
    assert got == want


def test_we_read_java_written_fixed_decimals(spark, tmp_path):
    """Fixed-decimal written by the official Java library decodes
    here to the same Decimals, and read_avro maps the fixed carrier
    to the right Spark DecimalType."""
    import os
    from decimal import Decimal as D

    jvm = spark._jvm
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(FIXED_DEC_SCHEMA))
    amt_schema = jschema.getField("amt").schema()
    opt_schema = jschema.getField("opt").schema().getTypes().get(1)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    )
    jpath = tmp_path / "javafix"
    os.makedirs(jpath)
    writer.create(jschema, jvm.java.io.File(str(jpath / "part-0.avro")))
    GD = jvm.org.apache.avro.generic.GenericData
    vals = [D("-1.23"), D("0.00"), D("12345678.90"), D("-5497558138.88")]
    for i, v in enumerate(vals):
        rec = GD.Record(jschema)
        rec.put("id", i)
        rec.put("amt", GD.Fixed(
            amt_schema, int(v.scaleb(2)).to_bytes(5, "big", signed=True)))
        rec.put("opt", None if i % 2 else GD.Fixed(
            opt_schema, int(D(i).scaleb(10)).to_bytes(16, "big", signed=True)))
        writer.append(rec)
    writer.close()
    back = read_avro(spark, str(jpath))
    assert back.schema["amt"].dataType.simpleString() == "decimal(12,2)"
    assert back.schema["opt"].dataType.simpleString() == "decimal(38,10)"
    rows = {r.id: (r.amt, r.opt) for r in back.collect()}
    assert [rows[i][0] for i in range(4)] == vals
    assert rows[0][1] == D("0.0000000000") and rows[1][1] is None
    assert rows[2][1] == D("2.0000000000")


# --- round 7: schema-resolution promotions + reader defaults --------


def test_read_avro_type_promotions(spark, tmp_path):
    """Avro spec Schema Resolution promotions under allow_evolution:
    a writer-int column reads into a long/double target, writer-float
    into double, and string<->bytes convert through UTF-8 — while an
    illegal direction (long file vs int target) still errors."""
    import pytest as _pytest

    from amplab_hive_spark.sources.avro import read_avro, write_avro

    path = str(tmp_path / "promo")
    os.makedirs(path)
    # target (sorted first): wide types
    df_wide = spark.createDataFrame(
        [(1, 10.5, 2.25, b"bin", "str")],
        "id long, d double, f double, payload binary, label string",
    )
    write_avro(df_wide.coalesce(1), path + "/0w")
    os.rename(path + "/0w/part-00000.avro", path + "/a-wide.avro")
    # writer file with promotable narrow types: int id, int d,
    # float f, string payload, bytes label
    df_narrow = spark.createDataFrame(
        [(2, 7, 1.5, "text", b"raw")],
        "id int, d int, f float, payload string, label binary",
    )
    write_avro(df_narrow.coalesce(1), path + "/1n")
    os.rename(path + "/1n/part-00000.avro", path + "/b-narrow.avro")

    got = {r["id"]: r for r in
           read_avro(spark, path, allow_evolution=True).collect()}
    assert sorted(got) == [1, 2]
    assert got[2]["d"] == 7.0 and abs(got[2]["f"] - 1.5) < 1e-9
    assert got[2]["payload"] == b"text"      # string -> bytes via UTF-8
    assert got[2]["label"] == "raw"          # bytes -> string via UTF-8
    assert got[1]["payload"] == b"bin" and got[1]["label"] == "str"

    # the reverse arrow (long file into int target) is NOT a promotion
    path2 = str(tmp_path / "promo_bad")
    os.makedirs(path2)
    write_avro(spark.createDataFrame([(1,)], "id int").coalesce(1), path2 + "/0")
    os.rename(path2 + "/0/part-00000.avro", path2 + "/a.avro")
    write_avro(spark.createDataFrame([(2,)], "id long").coalesce(1), path2 + "/1")
    os.rename(path2 + "/1/part-00000.avro", path2 + "/b.avro")
    with _pytest.raises(Exception, match="not a legal Avro promotion"):
        read_avro(spark, path2, allow_evolution=True).collect()


def test_read_avro_reader_defaults(spark, tmp_path):
    """A field missing from a writer file fills the TARGET schema's
    default (Avro resolution rule) — including for a NON-nullable
    field, which previously required nullability; a [null, T] field
    without a usable default still fills NULL."""
    from amplab_hive_spark.sources.avro import read_avro
    from amplab_hive_spark.sources.avro_codec import write_container

    path = str(tmp_path / "defs")
    os.makedirs(path)
    target = {
        "type": "record", "name": "r", "fields": [
            {"name": "id", "type": "long"},
            {"name": "tier", "type": "string", "default": "standard"},
            {"name": "note", "type": ["null", "string"], "default": None},
        ],
    }
    old = {
        "type": "record", "name": "r", "fields": [
            {"name": "id", "type": "long"},
        ],
    }
    with open(path + "/a-target.avro", "wb") as fh:
        fh.write(write_container(
            target, [{"id": 1, "tier": "gold", "note": "hi"}]))
    with open(path + "/b-old.avro", "wb") as fh:
        fh.write(write_container(old, [{"id": 2}]))

    got = {r["id"]: r for r in
           read_avro(spark, path, allow_evolution=True).collect()}
    assert got[1]["tier"] == "gold" and got[1]["note"] == "hi"
    assert got[2]["tier"] == "standard", "reader default must fill"
    assert got[2]["note"] is None


def test_promotion_rounds_inexact_ints_and_names_utf8_errors(spark, tmp_path):
    """Review-pass regressions: (a) an int not exactly representable
    in the float/double target (2^24+1) must ROUND like the spec's
    widening, not crash the arrow build; (b) non-UTF-8 bytes under a
    bytes->string promotion raise a NAMED AvroError, not a raw
    UnicodeDecodeError; (c) a nullable writer field cannot resolve
    into a non-nullable target (null datums would silently violate
    the Spark schema)."""
    import pytest as _pytest

    from amplab_hive_spark.sources.avro import read_avro
    from amplab_hive_spark.sources.avro_codec import write_container

    # (a) inexact int -> float
    path = str(tmp_path / "inexact")
    os.makedirs(path)
    target = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"}, {"name": "x", "type": "float"}]}
    old = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"}, {"name": "x", "type": "int"}]}
    with open(path + "/a.avro", "wb") as fh:
        fh.write(write_container(target, [{"id": 1, "x": 0.5}]))
    with open(path + "/b.avro", "wb") as fh:
        fh.write(write_container(old, [{"id": 2, "x": (1 << 24) + 1}]))
    got = {r["id"]: r["x"] for r in
           read_avro(spark, path, allow_evolution=True).collect()}
    assert got[1] == 0.5 and abs(got[2] - float((1 << 24) + 1)) <= 1.0

    # (b) non-UTF-8 bytes -> string
    path2 = str(tmp_path / "badutf8")
    os.makedirs(path2)
    t2 = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"}, {"name": "s", "type": "string"}]}
    o2 = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"}, {"name": "s", "type": "bytes"}]}
    with open(path2 + "/a.avro", "wb") as fh:
        fh.write(write_container(t2, [{"id": 1, "s": "ok"}]))
    with open(path2 + "/b.avro", "wb") as fh:
        fh.write(write_container(o2, [{"id": 2, "s": b"\xff\xfe"}]))
    with _pytest.raises(Exception, match="not valid UTF-8"):
        read_avro(spark, path2, allow_evolution=True).collect()

    # (c) nullable writer field into non-nullable target
    path3 = str(tmp_path / "nullability")
    os.makedirs(path3)
    t3 = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"}, {"name": "s", "type": "string"}]}
    o3 = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": ["null", "string"]}]}
    with open(path3 + "/a.avro", "wb") as fh:
        fh.write(write_container(t3, [{"id": 1, "s": "ok"}]))
    with open(path3 + "/b.avro", "wb") as fh:
        fh.write(write_container(o3, [{"id": 2, "s": None}]))
    with _pytest.raises(Exception, match="nullable here"):
        read_avro(spark, path3, allow_evolution=True).collect()
