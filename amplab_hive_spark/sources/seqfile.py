"""Distributed Hadoop SequenceFile read/write on Spark, built on the
pure-Python codec in ``seqfile_codec.py``.

The reference registers SequenceFile as a first-class storage format
(``STORED AS SEQUENCEFILE`` — ql/src/java/org/apache/hadoop/hive/ql/io/
SequenceFileStorageFormatDescriptor.java) and its default table
layout is one LazySimpleSerDe-delimited text row per ``Text`` value
with the key ignored (an empty ``BytesWritable`` — see
HiveSequenceFileOutputFormat / HiveIgnoreKeyTextOutputFormat in
ql/io). Spark's DataFrame reader has no SequenceFile format (only
the legacy RDD API), so this module re-expresses it Spark-first,
mirroring the Avro module (``avro.py``) shape exactly:

- **read_sequencefile(spark, path)**: ``binaryFile`` (one task per
  file) → ``mapInArrow`` decode → DataFrame of the key/value columns
  typed from the Writable classes in the header (Text → string,
  BytesWritable → binary, Int/Long/Float/Double/Boolean → their
  Spark scalars; a NullWritable side is omitted). The driver reads
  only one file's HEADER for the schema.
- **read_sequencefile_split(spark, path)**: the few-huge-files path —
  byte spans carved driver-side, executors sync-scan their span and
  decode exactly the records tiled to it (Hadoop's
  SequenceFileRecordReader split contract; works for NONE, RECORD
  and BLOCK compression).
- **write_sequencefile(df, path)**: one container file per partition
  via ``write_seqfile_stream`` (streaming, bounded memory) + a
  one-row manifest per task — ``df.repartition(n)`` is the file-size
  knob, same contract as ``write_avro``.
- **read_sequencefile_text_table / write_sequencefile_text_table**:
  the Hive table layout. The container decode is the honest Python
  path, but the ROW parsing stays JVM-side: Catalyst ``split`` +
  ``element_at`` + casts (read) and ``concat_ws`` over coalesced
  casts (write), with LazySimpleSerDe's ``\\x01`` field delimiter
  and ``\\N`` null sentinel as defaults.

Cross-validated both directions against the Hadoop implementation
bundled with Spark (``sc.sequenceFile`` / ``saveAsSequenceFile``,
including a BLOCK-compressed DefaultCodec file) in
tests/test_seqfile.py.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .seqfile_codec import (
    BOOLEAN_WRITABLE,
    BYTES_WRITABLE,
    DOUBLE_WRITABLE,
    FLOAT_WRITABLE,
    FileSpanReader,
    INT_WRITABLE,
    LONG_WRITABLE,
    NULL_WRITABLE,
    SeqFileError,
    TEXT,
    read_header,
    read_seqfile,
    write_seqfile_stream,
    writable_codec,
)

_DECODE_BATCH_ROWS = 8192

_WRITABLE_TO_SPARK: dict[str, T.DataType] = {
    TEXT: T.StringType(),
    BYTES_WRITABLE: T.BinaryType(),
    INT_WRITABLE: T.IntegerType(),
    LONG_WRITABLE: T.LongType(),
    FLOAT_WRITABLE: T.FloatType(),
    DOUBLE_WRITABLE: T.DoubleType(),
    BOOLEAN_WRITABLE: T.BooleanType(),
}

_SPARK_TO_WRITABLE: dict[type, str] = {
    T.StringType: TEXT,
    T.BinaryType: BYTES_WRITABLE,
    T.IntegerType: INT_WRITABLE,
    T.LongType: LONG_WRITABLE,
    T.FloatType: FLOAT_WRITABLE,
    T.DoubleType: DOUBLE_WRITABLE,
    T.BooleanType: BOOLEAN_WRITABLE,
}

HIVE_FIELD_DELIM = "\x01"
HIVE_NULL = r"\N"


def _files(path: str) -> list[str]:
    if os.path.isdir(path):
        found = sorted(
            f for f in _glob.glob(os.path.join(path, "*"))
            if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
        )
    else:
        found = sorted(_glob.glob(path))
    if not found:
        raise SeqFileError(f"no SequenceFiles at {path}")
    return found


def _pair_schema(header) -> T.StructType:
    fields = []
    if header.key_class != NULL_WRITABLE:
        if header.key_class not in _WRITABLE_TO_SPARK:
            writable_codec(header.key_class)  # raise the canonical error
        fields.append(T.StructField("key", _WRITABLE_TO_SPARK[header.key_class], True))
    if header.value_class != NULL_WRITABLE:
        if header.value_class not in _WRITABLE_TO_SPARK:
            writable_codec(header.value_class)
        fields.append(T.StructField("value", _WRITABLE_TO_SPARK[header.value_class], True))
    if not fields:
        raise SeqFileError("both key and value are NullWritable — nothing to read")
    return T.StructType(fields)


def _check_same_layout(header, first, f: str) -> None:
    if (header.key_class, header.value_class) != (first.key_class, first.value_class):
        raise SeqFileError(
            f"Writable drift across files: {f} is "
            f"({header.key_class}, {header.value_class}), expected "
            f"({first.key_class}, {first.value_class})"
        )


def _pairs_to_batch(pairs: list, header, arrow_schema):
    import pyarrow as pa

    cols: list[list] = []
    if header.key_class != NULL_WRITABLE:
        cols.append([k for k, _ in pairs])
    if header.value_class != NULL_WRITABLE:
        cols.append([v for _, v in pairs])
    arrays = [
        pa.array(col, type=field.type)
        for col, field in zip(cols, arrow_schema)
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def read_sequencefile(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory (or glob) of SequenceFiles into a DataFrame
    of ``key``/``value`` columns typed from the header's Writable
    classes. One task per file; payloads never visit the driver."""
    files = _files(path)
    with open(files[0], "rb") as fh:
        first = read_header(fh.read(1 << 20))
    spark_schema = _pair_schema(first)
    key_class, value_class = first.key_class, first.value_class

    binary = (
        spark.read.format("binaryFile").load(files)
    ).select("content")

    def decode(batches: Iterator) -> Iterator:
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(spark_schema)
        for batch in batches:
            for rec in batch.to_pylist():
                header, rows = read_seqfile(rec["content"])
                if (header.key_class, header.value_class) != (key_class, value_class):
                    raise SeqFileError(
                        f"Writable drift across files: got "
                        f"({header.key_class}, {header.value_class})"
                    )
                chunk: list = []
                for pair in rows:
                    chunk.append(pair)
                    if len(chunk) >= _DECODE_BATCH_ROWS:
                        yield _pairs_to_batch(chunk, header, arrow_schema)
                        chunk = []
                if chunk:
                    yield _pairs_to_batch(chunk, header, arrow_schema)

    return binary.mapInArrow(decode, spark_schema)


def read_sequencefile_split(
    spark: SparkSession, path: str, split_bytes: int = 32 << 20
) -> DataFrame:
    """Split-parallel SequenceFile reader: the 100 TB path for FEW
    HUGE files. The driver reads each file's header + size, carves
    ``split_bytes`` spans, and ships (file, start, end) tasks;
    executors seek, scan to the next sync escape, and decode exactly
    the records tiled to their span (``FileSpanReader``). Requires
    executors to reach ``path`` (shared FS — same contract as the
    Avro twin ``read_avro_split``)."""
    files = _files(path)
    headers = {}
    first = None
    for f in files:
        with open(f, "rb") as fh:
            header = read_header(fh.read(1 << 20))
        if first is None:
            first = header
        else:
            _check_same_layout(header, first, f)
        headers[f] = (header, os.path.getsize(f))
    spark_schema = _pair_schema(first)

    spans = []
    for f, (_header, size) in headers.items():
        start = 0
        while start < size:
            spans.append((f, start, min(start + split_bytes, size)))
            start += split_bytes
    spans_df = spark.createDataFrame(
        spans, "file string, start bigint, end bigint"
    ).repartition(max(len(spans), 1))

    def decode(batches: Iterator) -> Iterator:
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(spark_schema)
        for batch in batches:
            for rec in batch.to_pylist():
                with open(rec["file"], "rb") as fh:
                    header = read_header(fh.read(1 << 20))
                    _, dec_key = writable_codec(header.key_class)
                    _, dec_val = writable_codec(header.value_class)
                    reader = FileSpanReader(fh, header)
                    chunk: list = []
                    for kb, vb in reader.rows_in_span(rec["start"], rec["end"]):
                        chunk.append((dec_key(kb), dec_val(vb)))
                        if len(chunk) >= _DECODE_BATCH_ROWS:
                            yield _pairs_to_batch(chunk, header, arrow_schema)
                            chunk = []
                    if chunk:
                        yield _pairs_to_batch(chunk, header, arrow_schema)

    return spans_df.mapInArrow(decode, spark_schema)


def write_sequencefile(
    df: DataFrame,
    path: str,
    key_col: str | None = "key",
    value_col: str = "value",
    *,
    record_compress: bool = False,
) -> int:
    """Write ``df`` to ``path/part-*.seq`` (one container per
    partition) + ``_SUCCESS``; returns total rows. Writable classes
    derive from the column Spark types; ``key_col=None`` writes an
    empty ``BytesWritable`` key (the Hive ignore-key layout).
    ``df.repartition(n)`` is the file-count/size knob."""
    if key_col is None:
        key_class = BYTES_WRITABLE
        cols = [F.lit(b"").alias("__key"), F.col(value_col).alias("__value")]
        kt = T.BinaryType()
    else:
        kt = df.schema[key_col].dataType
        if type(kt) not in _SPARK_TO_WRITABLE:
            raise SeqFileError(f"no Writable mapping for key type {kt.simpleString()}")
        key_class = _SPARK_TO_WRITABLE[type(kt)]
        cols = [F.col(key_col).alias("__key"), F.col(value_col).alias("__value")]
    vt = df.schema[value_col].dataType
    if type(vt) not in _SPARK_TO_WRITABLE:
        raise SeqFileError(f"no Writable mapping for value type {vt.simpleString()}")
    value_class = _SPARK_TO_WRITABLE[type(vt)]
    narrow = df.select(*cols)
    os.makedirs(path, exist_ok=True)

    def serialize(batches: Iterator) -> Iterator:
        import pyarrow as pa
        from pyspark import TaskContext

        ctx = TaskContext.get()
        fname = os.path.join(path, f"part-{ctx.partitionId():05d}.seq")

        def pairs() -> Iterator[tuple]:
            for batch in batches:
                keys = batch.column(0).to_pylist()
                vals = batch.column(1).to_pylist()
                yield from zip(keys, vals)

        # attempt-unique tmp + atomic rename: same safety argument as
        # write_avro (attempts serialize identical partition data).
        tmp = fname + f".inprogress-{ctx.taskAttemptId()}"
        with open(tmp, "wb") as fh:
            n = write_seqfile_stream(
                fh, pairs(), key_class, value_class,
                record_compress=record_compress, sync_seed=fname,
            )
        os.replace(tmp, fname)
        yield pa.RecordBatch.from_pylist(
            [{"file": fname, "rows": n}],
            schema=pa.schema([("file", pa.string()), ("rows", pa.int64())]),
        )

    manifest = narrow.mapInArrow(serialize, "file string, rows bigint").collect()
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
    return sum(r.rows for r in manifest)


# ---------------------------------------------------------------- #
# the Hive table layout: delimited text rows in Text values
# ---------------------------------------------------------------- #


def write_sequencefile_text_table(
    df: DataFrame,
    path: str,
    field_delim: str = HIVE_FIELD_DELIM,
    null_str: str = HIVE_NULL,
    *,
    record_compress: bool = False,
) -> int:
    """Hive's ``STORED AS SEQUENCEFILE`` table write: each row is
    serialized to one LazySimpleSerDe-delimited text line (JVM-side
    ``concat_ws`` over coalesced string casts; NULL → ``\\N``) and
    written as the ``Text`` value under an empty ``BytesWritable``
    key — the layout the reference's HiveSequenceFileOutputFormat
    produces."""
    line = F.concat_ws(
        field_delim,
        *[F.coalesce(F.col(c).cast("string"), F.lit(null_str)) for c in df.columns],
    ).alias("value")
    return write_sequencefile(
        df.select(line), path, key_col=None, value_col="value",
        record_compress=record_compress,
    )


def read_sequencefile_text_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    field_delim: str = HIVE_FIELD_DELIM,
    null_str: str = HIVE_NULL,
) -> DataFrame:
    """Read a Hive-layout SequenceFile table: container decode yields
    the ``Text`` value lines; field extraction stays in Catalyst —
    ``split`` + ``element_at`` + casts per column, ``\\N`` → NULL —
    so the schema-on-read parse is JVM-side and codegen'd, exactly
    like LazySimpleSerDe's lazy field access."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    raw = read_sequencefile(spark, path)
    if "value" not in raw.columns:
        raise SeqFileError("text-table read requires a Text value column")
    # split() takes a Java regex: \Q...\E quotes arbitrary delimiters
    parts = F.split(F.col("value"), "\\Q" + field_delim + "\\E", -1)
    cols = []
    for i, field in enumerate(schema.fields):
        c = F.element_at(parts, i + 1)
        c = F.when(c == null_str, F.lit(None)).otherwise(c)
        cols.append(c.cast(field.dataType).alias(field.name))
    return raw.select(*cols)


__all__ = [
    "HIVE_FIELD_DELIM",
    "HIVE_NULL",
    "read_sequencefile",
    "read_sequencefile_split",
    "read_sequencefile_text_table",
    "write_sequencefile",
    "write_sequencefile_text_table",
]
