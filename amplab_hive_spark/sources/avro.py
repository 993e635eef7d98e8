"""Distributed Avro read/write on Spark, built on the pure-Python
codec in ``avro_codec.py``.

The reference ships Avro as a first-class storage format
(serde/src/java/org/apache/hadoop/hive/serde2/avro/AvroSerDe.java);
Spark's own support lives in the external ``spark-avro`` module,
which is absent in this environment. Rather than keep Avro a
documented drop, this module re-expresses it Spark-first:

- **read_avro(spark, path)**: ``binaryFile`` source (one task per
  container file) → ``mapInArrow`` decode inside executors → a
  normal DataFrame. The driver reads only ONE file's header to learn
  the schema (exactly like parquet footer inference); file payloads
  never visit the driver. Parallelism is per-file — right whenever
  the writer-side contract below (many ~128 MB files) holds.
- **read_avro_split(spark, path)**: the few-huge-files case — byte
  spans carved driver-side from header+size alone, executors seek,
  sync-scan, and decode exactly the blocks starting in their span
  (Hadoop's AvroInputFormat split contract), one decompressed block
  of memory per task.
- **write_avro(df, path)**: each partition serializes itself into
  one container file via ``write_container_stream`` (block-at-a-time,
  bounded memory) and emits a one-row manifest (file, rows); the
  manifest is the job's output, so the write is still a single Spark
  action and the file fan-out equals the partition fan-out —
  ``df.repartition(n)`` IS the file-size knob. Executors write to a
  filesystem path that must be shared in cluster mode (documented —
  local mode and any NFS/object-mount deployment satisfy it).

Arrow is the bridge in both directions: timestamp[us] ↔
timestamp-micros and date32 ↔ date logical types are exact integer
casts at the Arrow level, so no float/strptime round-trips touch
temporal values. The Python codec is the honest slow path (measured
in tests, not hidden); columnar vectorization of the inner loop is
possible but the container framing itself is inherently row-ordered.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .avro_codec import (
    AvroError,
    FileBlockReader,
    read_container,
    read_header,
    write_container_stream,
)

_DECODE_BATCH_ROWS = 8192


# ---------------------------------------------------------------- #
# schema translation
# ---------------------------------------------------------------- #

_SPARK_TO_AVRO_PRIMITIVE: dict[type, Any] = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def spark_to_avro_schema(schema: T.StructType, name: str = "spark_record") -> dict:
    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": _field_type(f.dataType, f.nullable, f.name)}
            for f in schema.fields
        ],
    }


def _field_type(dt: T.DataType, nullable: bool, path: str) -> Any:
    avro: Any
    if type(dt) in _SPARK_TO_AVRO_PRIMITIVE:
        avro = _SPARK_TO_AVRO_PRIMITIVE[type(dt)]
    elif isinstance(dt, T.TimestampType):
        avro = {"type": "long", "logicalType": "timestamp-micros"}
    elif isinstance(dt, T.TimestampNTZType):
        avro = {"type": "long", "logicalType": "local-timestamp-micros"}
    elif isinstance(dt, T.DateType):
        avro = {"type": "int", "logicalType": "date"}
    elif isinstance(dt, T.DecimalType):
        # spec: bytes + decimal logical type, two's-complement
        # big-endian unscaled int (the AvroSerDe's mapping too,
        # serde2/avro/AvroSerDe.java)
        avro = {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    elif isinstance(dt, T.ArrayType):
        avro = {
            "type": "array",
            "items": _field_type(dt.elementType, dt.containsNull, path + ".item"),
        }
    elif isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise AvroError(f"Avro maps require string keys (column {path})")
        avro = {
            "type": "map",
            "values": _field_type(dt.valueType, dt.valueContainsNull, path + ".value"),
        }
    elif isinstance(dt, T.StructType):
        avro = spark_to_avro_schema(dt, name=path.replace(".", "_"))
    else:
        raise AvroError(f"no Avro mapping for Spark type {dt.simpleString()} (column {path})")
    return ["null", avro] if nullable else avro


def avro_to_spark_field(avro: Any, name: str) -> tuple[T.DataType, bool]:
    """-> (sparkType, nullable)."""
    if isinstance(avro, list):  # union
        non_null = [b for b in avro if b != "null"]
        if len(non_null) != 1 or len(non_null) == len(avro):
            raise AvroError(f"only [null, T] unions map to Spark (field {name}): {avro}")
        dt, _ = avro_to_spark_field(non_null[0], name)
        return dt, True
    if isinstance(avro, dict):
        logical = avro.get("logicalType")
        if logical == "timestamp-micros":
            return T.TimestampType(), False
        if logical == "local-timestamp-micros":
            return T.TimestampNTZType(), False
        if logical == "date":
            return T.DateType(), False
        if logical == "decimal" and avro.get("type") in ("bytes", "fixed"):
            # spec: decimal annotates bytes (length-prefixed) or fixed
            # (exactly `size` bytes) — both map to the same Spark type
            if "precision" not in avro:
                # spec requires precision; scale alone is defaulted
                raise AvroError(
                    f"decimal logical type for field {name} is missing the "
                    f"required 'precision' attribute: {avro}"
                )
            return T.DecimalType(int(avro["precision"]), int(avro.get("scale", 0))), False
        t = avro["type"]
        if t == "array":
            item, item_null = avro_to_spark_field(avro["items"], name + ".item")
            return T.ArrayType(item, containsNull=item_null), False
        if t == "map":
            val, val_null = avro_to_spark_field(avro["values"], name + ".value")
            return T.MapType(T.StringType(), val, valueContainsNull=val_null), False
        if t == "record":
            fields = [
                T.StructField(f["name"], *avro_to_spark_field(f["type"], f["name"]))
                for f in avro["fields"]
            ]
            return T.StructType(fields), False
        avro = t  # primitive spelled as {"type": "long"}
    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
        "null": T.NullType(),
    }.get(avro)
    if prim is None:
        raise AvroError(f"unsupported Avro type for Spark (field {name}): {avro!r}")
    return prim, avro == "null"


def avro_to_spark_schema(avro: dict) -> T.StructType:
    if avro.get("type") != "record":
        raise AvroError(f"top-level Avro schema must be a record, got {avro!r}")
    fields = []
    for f in avro["fields"]:
        dt, nullable = avro_to_spark_field(f["type"], f["name"])
        fields.append(T.StructField(f["name"], dt, nullable=nullable))
    return T.StructType(fields)


# ---------------------------------------------------------------- #
# Arrow bridging: temporal types travel as their exact integer
# representations (epoch micros / epoch days), never through
# datetime objects or floats.
# ---------------------------------------------------------------- #


def _arrow_storage_type(t):
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return pa.int64()
    if pa.types.is_date32(t):
        return pa.int32()
    if pa.types.is_list(t):
        return pa.list_(_arrow_storage_type(t.value_type))
    if pa.types.is_map(t):
        return pa.map_(t.key_type, _arrow_storage_type(t.item_type))
    if pa.types.is_struct(t):
        return pa.struct(
            [pa.field(f.name, _arrow_storage_type(f.type), f.nullable) for f in t]
        )
    return t


def _batch_to_rows(batch) -> list[dict]:
    """Arrow RecordBatch -> python dicts with avro-physical values
    (timestamps/dates already integers via exact arrow casts)."""
    import pyarrow as pa

    cols = []
    for i, field in enumerate(batch.schema):
        storage = _arrow_storage_type(field.type)
        col = batch.column(i)
        if storage != field.type:
            col = col.cast(storage)
        cols.append(col)
    cast_batch = pa.RecordBatch.from_arrays(
        cols, names=[f.name for f in batch.schema]
    )
    return cast_batch.to_pylist()


def _rows_to_batch(rows: list[dict], arrow_schema):
    """Decoded avro rows -> Arrow RecordBatch matching arrow_schema;
    ints become timestamps/dates through exact integer casts."""
    import pyarrow as pa

    arrays = []
    for field in arrow_schema:
        vals = [r.get(field.name) for r in rows]
        storage = _arrow_storage_type(field.type)
        arr = pa.array(vals, type=storage)
        if storage != field.type:
            arr = arr.cast(field.type)
        arrays.append(arr)
    return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


# ---------------------------------------------------------------- #
# public API
# ---------------------------------------------------------------- #


def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> int:
    """Write ``df`` to ``path/part-*.avro`` (one file per partition)
    + ``_SUCCESS``. Returns total rows written. ``df.repartition(n)``
    beforehand is the file-count/size knob."""
    avro_schema = spark_to_avro_schema(df.schema)
    schema_json = json.dumps(avro_schema)
    os.makedirs(path, exist_ok=True)

    def serialize(batches: Iterator) -> Iterator:
        import pyarrow as pa
        from pyspark import TaskContext

        ctx = TaskContext.get()
        fname = os.path.join(path, f"part-{ctx.partitionId():05d}.avro")

        def rows() -> Iterator[dict]:
            for batch in batches:
                yield from _batch_to_rows(batch)

        # attempt-unique tmp name: a speculative or retried attempt
        # must never interleave writes with a still-running twin; the
        # atomic rename means whichever attempt finishes last wins
        # whole, which is safe because attempts serialize identical
        # partition data.
        tmp = fname + f".inprogress-{ctx.taskAttemptId()}"
        with open(tmp, "wb") as fh:
            n = write_container_stream(
                fh, json.loads(schema_json), rows(), codec=codec, sync_seed=fname
            )
        os.replace(tmp, fname)  # readers never observe partial files
        yield pa.RecordBatch.from_pylist(
            [{"file": fname, "rows": n}],
            schema=pa.schema([("file", pa.string()), ("rows", pa.int64())]),
        )

    manifest = df.mapInArrow(serialize, "file string, rows bigint").collect()
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
    return sum(r.rows for r in manifest)


def _header_schema(file_path: str) -> dict:
    """Driver-side schema inference: parse ONE file's header (the
    metadata map sits at the front; 1 MiB covers any sane schema)."""
    with open(file_path, "rb") as fh:
        prefix = fh.read(1 << 20)
    schema, _rows = read_container(prefix)
    return schema


# Avro spec "Schema Resolution" type promotions (writer -> reader),
# spelled as Spark simpleString pairs. long->float and int->float are
# spec-legal despite the precision loss; string<->bytes convert
# through UTF-8, exactly as the spec prescribes.
_PROMOTIONS = {
    ("int", "bigint"), ("int", "float"), ("int", "double"),
    ("bigint", "float"), ("bigint", "double"),
    ("float", "double"),
    ("string", "binary"), ("binary", "string"),
}

# Reader-default support is limited to plain primitives whose Avro
# JSON default IS the Python value — logical types (date = int days,
# decimal = bytes), records, arrays, and non-null union defaults are
# out of the subset and fall back to the NULL-if-nullable rule.
_DEFAULTABLE_PRIMS = {"int", "long", "float", "double", "string", "boolean"}


def _usable_default(avro_field: dict):
    """(has_default, value) for the resolution subset."""
    if "default" not in avro_field:
        return False, None
    t = avro_field["type"]
    if isinstance(t, list):  # [null, T] union: default must be null
        return avro_field["default"] is None, None
    if isinstance(t, dict):  # logical/complex types: out of subset
        return False, None
    if t in _DEFAULTABLE_PRIMS:
        return True, avro_field["default"]
    return False, None


def _bytes_to_str(name: str):
    def conv(v, _name=name):
        try:
            return bytes(v).decode("utf-8")
        except UnicodeDecodeError as ex:
            raise AvroError(
                f"bytes->string promotion for field {_name!r}: value is "
                f"not valid UTF-8 ({ex})"
            ) from ex

    return conv


def _resolve_file(file_schema: dict, expected: dict, evolve: bool):
    """Validate a file's schema against the target and return the
    row adapter it needs (or None). ONE function for both halves so
    the accepted promotion set and the adaptation logic cannot
    drift (review finding r7: a split version accepted 8 promotion
    pairs but adapted only 2).

    Strict mode: normalized name/type/nullability equality, no
    adapter. ``evolve`` mode (Avro schema-resolution subset): a file
    may LACK a target field (rows fill the target's plain-primitive
    default if any, else NULL — so the field must carry a default or
    be nullable) and may carry EXTRA fields (ignored); a shared
    field may differ in type only along the spec's promotion arrows
    (_PROMOTIONS), and may not be nullable here if the target says
    non-nullable (a null datum inside a non-nullable Spark column
    would silently break null-aware optimizations downstream).

    Adaptation per promotion: int/long -> float/double convert via
    float() BEFORE the arrow build (pyarrow REFUSES pythonints not
    exactly representable in the target — 2^24+1 into float32 raises
    ArrowInvalid; the spec's promotion is value-rounding, like
    Java's implicit widening); string<->bytes convert through UTF-8
    with a named error on undecodable bytes; int->long and
    float->double need nothing (exact widenings pyarrow performs)."""
    got = avro_to_spark_schema(file_schema)
    want = avro_to_spark_schema(expected)
    if got == want:
        return None
    if not evolve:
        raise AvroError(f"schema drift across files: {file_schema} != {expected}")
    got_fields = {f.name: f for f in got.fields}
    want_avro = {f["name"]: f for f in expected["fields"]}
    conv: dict = {}
    defaults: dict = {}
    for f in want.fields:
        g = got_fields.get(f.name)
        if g is None:
            has_default, value = _usable_default(want_avro.get(f.name, {}))
            if not f.nullable and not has_default:
                raise AvroError(
                    f"schema evolution: file lacks non-nullable field "
                    f"{f.name!r} and the target schema has no usable default"
                )
            if has_default and value is not None:
                defaults[f.name] = value
            continue
        if g.nullable and not f.nullable:
            raise AvroError(
                f"schema evolution: field {f.name!r} is nullable here "
                f"but non-nullable in the target schema"
            )
        if g.dataType == f.dataType:
            continue
        pair = (g.dataType.simpleString(), f.dataType.simpleString())
        if pair not in _PROMOTIONS:
            raise AvroError(
                f"schema evolution: field {f.name!r} is "
                f"{g.dataType.simpleString()} here but "
                f"{f.dataType.simpleString()} in the target schema "
                f"(not a legal Avro promotion)"
            )
        if pair == ("string", "binary"):
            conv[f.name] = lambda v: v.encode("utf-8")
        elif pair == ("binary", "string"):
            conv[f.name] = _bytes_to_str(f.name)
        elif pair[1] in ("float", "double") and pair[0] in ("int", "bigint"):
            conv[f.name] = float
        # (int, bigint) and (float, double): exact, no adaptation
    if not conv and not defaults:
        return None

    def adapt(row: dict) -> dict:
        for k, fn in conv.items():
            if row.get(k) is not None:
                row[k] = fn(row[k])
        for k, d in defaults.items():
            if k not in row:
                row[k] = d
        return row

    return adapt


def read_avro(spark: SparkSession, path: str, allow_evolution: bool = False) -> DataFrame:
    """Read ``path`` (a directory of ``*.avro`` or a single file)
    into a DataFrame. Schema comes from the first file's header;
    every file is decoded on an executor.

    ``allow_evolution``: accept files whose record schema differs
    from the first file's in the Avro schema-resolution subset the
    decode path supports structurally — a file missing one of the
    target's NULLABLE fields yields NULL there (``_rows_to_batch``
    reads absent keys as None), and fields the target doesn't know
    are dropped; a type change on a shared field is still an error.
    Default strict, because silently nulling a column on a typo'd
    schema is worse than an error when evolution wasn't intended.
    The target schema is the FIRST file's (sorted order)."""
    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.avro")))
    else:
        files = sorted(_glob.glob(path))
    if not files:
        raise AvroError(f"no .avro files at {path}")
    avro_schema = _header_schema(files[0])
    spark_schema = avro_to_spark_schema(avro_schema)
    schema_json = json.dumps(avro_schema)

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path if os.path.isdir(path) else files)
    ).select("content")

    def decode(batches: Iterator) -> Iterator:
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(spark_schema)
        expected = json.loads(schema_json)
        for batch in batches:
            for rec in batch.to_pylist():
                file_schema, rows = read_container(rec["content"])
                adapt = _resolve_file(file_schema, expected, allow_evolution)
                chunk: list[dict] = []
                for row in rows:
                    chunk.append(adapt(row) if adapt else row)
                    if len(chunk) >= _DECODE_BATCH_ROWS:
                        yield _rows_to_batch(chunk, arrow_schema)
                        chunk = []
                if chunk:
                    yield _rows_to_batch(chunk, arrow_schema)

    return binary.mapInArrow(decode, spark_schema)




def read_avro_split(
    spark: SparkSession, path: str, split_bytes: int = 32 << 20
) -> DataFrame:
    """Split-parallel Avro reader: the 100 TB path for FEW HUGE
    files, where ``read_avro``'s one-task-per-file unit can't use
    the cluster. The driver reads each file's HEADER only (schema,
    codec, sync marker) plus its size, carves byte spans of
    ``split_bytes``, and ships (file, start, end) tasks; each task
    seeks to its span, scans to the next sync marker, and decodes
    exactly the blocks that START inside its span — the same split
    contract as Hadoop's AvroInputFormat, so consecutive spans cover
    every row once. Memory per task is one decompressed block.

    Requires executors to reach ``path`` (shared FS — same contract
    as write_avro). All files in a directory must share one schema
    (verified driver-side against the headers)."""
    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.avro")))
    else:
        files = sorted(_glob.glob(path))
    if not files:
        raise AvroError(f"no .avro files at {path}")

    headers = {}
    first_schema = None
    for f in files:
        with open(f, "rb") as fh:
            schema, codec, sync, hlen = read_header(fh.read(1 << 20))
        if first_schema is None:
            first_schema = schema
        elif avro_to_spark_schema(schema) != avro_to_spark_schema(first_schema):
            # normalized comparison: incidental attributes (doc,
            # namespace, field defaults) are not drift — only a
            # name/type/nullability difference is.
            raise AvroError(f"schema drift across files: {f}")
        headers[f] = (codec, sync.hex(), hlen, os.path.getsize(f))

    spark_schema = avro_to_spark_schema(first_schema)
    schema_json = json.dumps(first_schema)
    spans = []
    for f, (codec, sync_hex, hlen, size) in headers.items():
        start = 0
        while start < size:
            spans.append((f, codec, sync_hex, hlen, start, min(start + split_bytes, size)))
            start += split_bytes
    spans_df = spark.createDataFrame(
        spans, "file string, codec string, sync_hex string, header_len bigint, start bigint, end bigint"
    ).repartition(max(len(spans), 1))

    def decode(batches: Iterator) -> Iterator:
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(spark_schema)
        schema = json.loads(schema_json)
        for batch in batches:
            for rec in batch.to_pylist():
                with open(rec["file"], "rb") as fh:
                    reader = FileBlockReader(
                        fh, schema, rec["codec"],
                        bytes.fromhex(rec["sync_hex"]), rec["header_len"],
                    )
                    chunk: list[dict] = []
                    for row in reader.rows_in_span(rec["start"], rec["end"]):
                        chunk.append(row)
                        if len(chunk) >= _DECODE_BATCH_ROWS:
                            yield _rows_to_batch(chunk, arrow_schema)
                            chunk = []
                    if chunk:
                        yield _rows_to_batch(chunk, arrow_schema)

    return spans_df.mapInArrow(decode, spark_schema)


__all__ = [
    "avro_to_spark_schema",
    "read_avro",
    "read_avro_split",
    "spark_to_avro_schema",
    "write_avro",
]
