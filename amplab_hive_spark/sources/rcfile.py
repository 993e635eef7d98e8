"""Distributed Hive RCFile read/write on Spark, built on the
pure-Python codec in ``rcfile_codec.py``.

RCFile is the reference's columnar format (``STORED AS RCFILE`` —
ql/src/java/org/apache/hadoop/hive/ql/io/
RCFileStorageFormatDescriptor.java) with the ColumnarSerDe table
layout (serde2/columnar/ColumnarSerDe.java): each cell is the
LazySimpleSerDe text rendering of the field, nulls are ``\\N``, and
a reader that needs k of n columns touches (and decompresses) only
those k column payloads per row group — the columnar projection
that motivated the format. Spark has no RCFile source, so this
module re-expresses it Spark-first, mirroring ``seqfile.py``:

- **read_rcfile_table(spark, path, schema, columns=...)**: one task
  per file (``binaryFile`` → ``mapInArrow``); the decode emits ONLY
  the projected columns as strings — unprojected column payloads are
  never decompressed (``rcfile_codec._decode_group`` skips them by
  the key's on-disk lengths) — and the ``\\N``→NULL mapping plus all
  type casts stay JVM-side in Catalyst. Files with fewer columns
  than the schema read as NULL for the missing tail (Hive's
  schema-evolution behavior).
- **read_rcfile_split(...)**: the few-huge-files path — byte spans
  carved driver-side; executors sync-scan to the next row-group
  boundary and decode exactly the groups tiled to their span
  (RCFileRecordReader's split contract).
- **write_rcfile_table(df, path)**: serialization is JVM-side
  (coalesced string casts, NULL → ``\\N``); the Python task only
  encodes cell bytes into the streaming group writer — one container
  per partition, ``df.repartition(n)`` is the file-size knob.

Cross-validated both directions against the Hive implementation
bundled with Spark (``org.apache.hadoop.hive.ql.io.RCFile`` via
py4j) in tests/test_rcfile.py.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .rcfile_codec import (
    DEFAULT_GROUP_BYTES,
    RCFileError,
    RCHeader,
    RCSpanReader,
    iter_row_groups,
    read_rc_header,
    write_rcfile_stream,
)

HIVE_NULL = r"\N"
_HIVE_NULL_BYTES = rb"\N"


def _files(path: str) -> list[str]:
    if os.path.isdir(path):
        found = sorted(
            f for f in _glob.glob(os.path.join(path, "*"))
            if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
        )
    else:
        found = sorted(_glob.glob(path))
    if not found:
        raise RCFileError(f"no RCFiles at {path}")
    return found


def _resolve_projection(
    schema: T.StructType, columns: Sequence[str] | None
) -> tuple[list[str], list[int]]:
    """-> (projected field names, their indices in file column order)."""
    by_name = {f.name: i for i, f in enumerate(schema.fields)}
    if columns is None:
        names = [f.name for f in schema.fields]
    else:
        missing = [c for c in columns if c not in by_name]
        if missing:
            raise RCFileError(f"columns not in schema: {missing}")
        names = list(columns)
    return names, [by_name[n] for n in names]


def _string_struct(names: Sequence[str]) -> T.StructType:
    return T.StructType([T.StructField(n, T.StringType(), True) for n in names])


def _group_to_batch(n_rows, cols, indices, arrow_schema, num_file_cols):
    import pyarrow as pa

    arrays = []
    for idx in indices:
        if idx < num_file_cols:
            # bytes -> utf8 string array without a per-cell Python loop
            arrays.append(pa.array(cols[idx], type=pa.string()))
        else:  # schema has more columns than the file: NULL tail
            arrays.append(pa.nulls(n_rows, type=pa.string()))
    return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def _cast_projected(
    raw: DataFrame, schema: T.StructType, names: Sequence[str], null_str: str
) -> DataFrame:
    fields = {f.name: f for f in schema.fields}
    cols = []
    for n in names:
        c = F.col(n)
        c = F.when(c == null_str, F.lit(None)).otherwise(c)
        cols.append(c.cast(fields[n].dataType).alias(n))
    return raw.select(*cols)


def read_rcfile_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    columns: Sequence[str] | None = None,
    null_str: str = HIVE_NULL,
) -> DataFrame:
    """Read a directory (or glob) of RCFiles with ``schema`` naming
    the file's columns in order; ``columns`` projects a subset — the
    projection reaches the container decode, so unwanted column
    payloads are skipped without decompression (the RCFile analogue
    of parquet column pruning). One task per file."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    names, indices = _resolve_projection(schema, columns)
    out_schema = _string_struct(names)

    binary = spark.read.format("binaryFile").load(_files(path)).select("content")

    def decode(batches: Iterator) -> Iterator:
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(out_schema)
        for batch in batches:
            for rec in batch.to_pylist():
                buf = rec["content"]
                header = read_rc_header(buf)
                wanted = [i for i in indices if i < header.num_columns]
                for n_rows, cols in iter_row_groups(buf, header, wanted):
                    yield _group_to_batch(
                        n_rows, cols, indices, arrow_schema, header.num_columns
                    )

    raw = binary.mapInArrow(decode, out_schema)
    return _cast_projected(raw, schema, names, null_str)


def read_rcfile_split(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    columns: Sequence[str] | None = None,
    split_bytes: int = 64 << 20,
    null_str: str = HIVE_NULL,
) -> DataFrame:
    """Split-parallel RCFile reader: the 100 TB path for FEW HUGE
    files. The driver carves ``split_bytes`` spans; executors
    sync-scan their span and decode exactly the row groups tiled to
    it (requires executors to reach ``path`` — same shared-FS
    contract as ``read_avro_split`` / ``read_sequencefile_split``)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    names, indices = _resolve_projection(schema, columns)
    out_schema = _string_struct(names)

    spans = []
    for f in _files(path):
        size = os.path.getsize(f)
        start = 0
        while start < size:
            spans.append((f, start, min(start + split_bytes, size)))
            start += split_bytes
    spans_df = spark.createDataFrame(
        spans, "file string, start bigint, end bigint"
    ).repartition(max(len(spans), 1))

    def decode(batches: Iterator) -> Iterator:
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(out_schema)
        for batch in batches:
            for rec in batch.to_pylist():
                with open(rec["file"], "rb") as fh:
                    header = read_rc_header(fh.read(1 << 20))
                    wanted = [i for i in indices if i < header.num_columns]
                    reader = RCSpanReader(fh, header)
                    for n_rows, cols in reader.groups_in_span(
                        rec["start"], rec["end"], wanted
                    ):
                        yield _group_to_batch(
                            n_rows, cols, indices, arrow_schema, header.num_columns
                        )

    raw = spans_df.mapInArrow(decode, out_schema)
    return _cast_projected(raw, schema, names, null_str)


def write_rcfile_table(
    df: DataFrame,
    path: str,
    *,
    compress: bool = False,
    group_bytes: int = DEFAULT_GROUP_BYTES,
) -> int:
    """Write ``df`` to ``path/part-*.rc`` (one container per
    partition) + ``_SUCCESS``; returns total rows. Cell text is
    rendered JVM-side (string casts, NULL → ``\\N``); the Python
    task streams cell bytes into ~``group_bytes`` row groups.
    ``df.repartition(n)`` is the file-count/size knob."""
    ncols = len(df.columns)
    if ncols == 0:
        raise RCFileError("cannot write an RCFile with zero columns")
    rendered = df.select(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(HIVE_NULL)).alias(c)
            for c in df.columns
        ]
    )
    os.makedirs(path, exist_ok=True)

    def serialize(batches: Iterator) -> Iterator:
        import pyarrow as pa
        from pyspark import TaskContext

        from .rcfile_codec import RCFileWriter

        ctx = TaskContext.get()
        fname = os.path.join(path, f"part-{ctx.partitionId():05d}.rc")
        tmp = fname + f".inprogress-{ctx.taskAttemptId()}"
        with open(tmp, "wb") as fh:
            writer = RCFileWriter(
                fh, ncols, compress=compress, sync_seed=fname,
                group_bytes=group_bytes,
            )
            for batch in batches:
                cols = [
                    [v.encode("utf-8") for v in batch.column(i).to_pylist()]
                    for i in range(ncols)
                ]
                for row in zip(*cols):
                    writer.append(row)
            writer.close()
        os.replace(tmp, fname)
        yield pa.RecordBatch.from_pylist(
            [{"file": fname, "rows": writer.rows_written}],
            schema=pa.schema([("file", pa.string()), ("rows", pa.int64())]),
        )

    manifest = rendered.mapInArrow(serialize, "file string, rows bigint").collect()
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
    return sum(r.rows for r in manifest)


__all__ = [
    "HIVE_NULL",
    "read_rcfile_split",
    "read_rcfile_table",
    "write_rcfile_table",
]
