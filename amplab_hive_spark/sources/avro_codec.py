"""Pure-Python Avro object-container-file codec.

Implements the PUBLIC Apache Avro 1.x specification (binary encoding
+ object container files) with no third-party dependency, because
this environment has neither the ``spark-avro`` datasource module nor
a Python avro package — yet Avro is the one §1.4 storage format of
the reference (serde/src/java/org/apache/hadoop/hive/serde2/avro/
AvroSerDe.java, registered via ql/.../io/AvroFileStorageFormat
Descriptor.java) a real user would actually hit. This module is the
format layer only; the distributed read/write paths live in
``sources/avro.py`` and run this codec inside executors.

Scope (everything the engine's data model needs):
- primitives: null, boolean, int, long, float, double, bytes, string
- complex: record, array, map (string keys), union
- nullability as the idiomatic ``["null", T]`` union
- logical types: timestamp-micros (on long), date (on int) — exactly
  Spark's TimestampType / DateType physical semantics — and
  decimal(precision, scale) on bytes AND on fixed (two's-complement
  big-endian unscaled integer, per the spec — length-prefixed for
  bytes, exactly ``size`` octets for fixed; values travel as
  decimal.Decimal)
- codecs: ``null`` and ``deflate`` (raw RFC-1951, per the spec)
- container: magic ``Obj\\x01``, file-metadata map, 16-byte sync
  marker, count+size-prefixed data blocks

Decoding handles the general array/map block form (negative counts
with a byte-size prefix) so files produced by the Java implementation
read correctly. Unsupported Avro features (enum, bare fixed without
the decimal annotation, recursive types, non-nullable multi-branch
unions) raise with a clear message rather than mis-decoding.

Cross-validated in tests against the official Apache Avro JAVA
library (avro-1.12.1.jar, already on Spark's classpath) in both
directions: files we write are read by ``org.apache.avro.file.
DataFileReader``, and files written by the Java library are read
here. That, not self-agreement, is the correctness claim.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from hashlib import md5
from typing import Any, Callable, Iterable, Iterator

MAGIC = b"Obj\x01"
_BLOCK_ROWS = 4096  # rows per container block before a flush
_BLOCK_BYTES = 1 << 20  # ...or bytes, whichever comes first


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------- #
# primitive binary encoding (spec: "Binary Encoding")
# ---------------------------------------------------------------- #


def _zigzag_encode(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1)


def write_long(out: bytearray, v: int) -> None:
    n = _zigzag_encode(v)
    while n & ~0x7F:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def write_bytes(out: bytearray, b: bytes) -> None:
    write_long(out, len(b))
    out += b


def write_string(out: bytearray, s: str) -> None:
    write_bytes(out, s.encode("utf-8"))


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def eof(self) -> bool:
        return self.pos >= len(self.buf)

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise AvroError(f"truncated input: wanted {n} bytes, got {len(b)}")
        self.pos += n
        return b

    def read_long(self) -> int:
        n = 0
        shift = 0
        while True:
            byte = self.buf[self.pos]
            self.pos += 1
            n |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 63:
                raise AvroError("varint too long")
        return (n >> 1) ^ -(n & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")


# ---------------------------------------------------------------- #
# schema-driven value encode/decode
#
# Schemas are the parsed-JSON form (str for primitives, dict for
# complex/logical, list for unions). ``_encoder``/``_decoder``
# compile a schema node into a closure once per file, so the per-row
# path does no schema interpretation.
# ---------------------------------------------------------------- #

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _type_name(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, dict):
        return schema["type"]
    if isinstance(schema, list):
        return "union"
    raise AvroError(f"unparseable schema node: {schema!r}")


def _decimal_info(schema: Any) -> tuple[int, int | None] | None:
    """(scale, fixed_size) iff this node is the spec's decimal logical
    type — fixed_size is None for the bytes carrier, the mandatory
    ``size`` for the fixed carrier (spec: decimal annotates bytes OR
    fixed)."""
    if not (isinstance(schema, dict) and schema.get("logicalType") == "decimal"):
        return None
    if schema.get("type") == "bytes":
        return int(schema.get("scale", 0)), None
    if schema.get("type") == "fixed":
        if "size" not in schema:
            raise AvroError(f"fixed decimal is missing the required 'size': {schema}")
        return int(schema.get("scale", 0)), int(schema["size"])
    return None


def _encoder(schema: Any) -> Callable[[bytearray, Any], None]:
    dec_info = _decimal_info(schema)
    if dec_info is not None:
        dec_scale, dec_size = dec_info

        def enc_decimal(out: bytearray, v: Any) -> None:
            # spec: two's-complement big-endian UNSCALED integer.
            # Integer arithmetic on the Decimal's own (sign, digits,
            # exponent) tuple — context-free and EXACT at any
            # precision (Decimal.scaleb would silently round beyond
            # the ambient context's 28 digits).
            sign, digits, exp = v.as_tuple()
            if not isinstance(exp, int):
                # NaN/Infinity carry a string exponent ('n'/'F') —
                # the Avro decimal logical type has no encoding for
                # non-finite values (unreachable via Spark's
                # DecimalType, reachable by direct codec users).
                raise AvroError(f"non-finite decimal {v} has no Avro encoding")
            n = int("".join(map(str, digits)))
            shift = exp + dec_scale
            if shift < 0:
                q, r = divmod(n, 10 ** (-shift))
                if r:
                    raise AvroError(
                        f"decimal value {v} does not fit scale {dec_scale}"
                    )
                n = q
            else:
                n *= 10**shift
            unscaled = -n if sign else n
            if dec_size is not None:
                # fixed carrier: exactly size bytes, no length prefix
                try:
                    out += unscaled.to_bytes(dec_size, "big", signed=True)
                except OverflowError:
                    raise AvroError(
                        f"decimal value {v} does not fit fixed({dec_size})"
                    ) from None
                return
            length = max(1, (unscaled.bit_length() + 8) // 8)
            write_bytes(out, unscaled.to_bytes(length, "big", signed=True))

        return enc_decimal
    t = _type_name(schema)
    if t == "null":
        return lambda out, v: None
    if t == "boolean":
        return lambda out, v: out.append(1 if v else 0)
    if t in ("int", "long"):
        return write_long
    if t == "float":
        return lambda out, v: out.__iadd__(struct.pack("<f", v))
    if t == "double":
        return lambda out, v: out.__iadd__(struct.pack("<d", v))
    if t == "bytes":
        return lambda out, v: write_bytes(out, bytes(v))
    if t == "string":
        return write_string
    if t == "union":
        branches = [(_type_name(b), _encoder(b)) for b in schema]
        null_idx = next((i for i, (n, _) in enumerate(branches) if n == "null"), None)
        if null_idx is None or len(branches) != 2:
            raise AvroError(f"only [null, T] unions supported for writing, got {schema}")
        other_idx = 1 - null_idx
        other_enc = branches[other_idx][1]

        def enc_union(out: bytearray, v: Any) -> None:
            if v is None:
                write_long(out, null_idx)
            else:
                write_long(out, other_idx)
                other_enc(out, v)

        return enc_union
    if t == "array":
        item_enc = _encoder(schema["items"])

        def enc_array(out: bytearray, v: Any) -> None:
            if v:
                write_long(out, len(v))
                for item in v:
                    item_enc(out, item)
            write_long(out, 0)

        return enc_array
    if t == "map":
        val_enc = _encoder(schema["values"])

        def enc_map(out: bytearray, v: Any) -> None:
            # dict (python rows) or list of (key, value) pairs —
            # Arrow's RecordBatch.to_pylist() renders map cells as
            # the latter, and the write path feeds those through
            # unchanged.
            if v:
                items = v.items() if isinstance(v, dict) else v
                write_long(out, len(v))
                for k, val in items:
                    write_string(out, k)
                    val_enc(out, val)
            write_long(out, 0)

        return enc_map
    if t == "record":
        field_encs = [(f["name"], _encoder(f["type"])) for f in schema["fields"]]

        def enc_record(out: bytearray, v: Any) -> None:
            for name, enc in field_encs:
                enc(out, v[name])

        return enc_record
    raise AvroError(f"unsupported Avro type for writing: {t}")


def _decoder(schema: Any) -> Callable[[_Reader], Any]:
    dec_info = _decimal_info(schema)
    if dec_info is not None:
        dec_scale, dec_size = dec_info
        from decimal import Decimal

        def dec_decimal(r: _Reader) -> Any:
            raw = r.read(dec_size) if dec_size is not None else r.read_bytes()
            unscaled = int.from_bytes(raw, "big", signed=True)
            # tuple construction is context-free and exact at any
            # precision (scaleb/division would round past 28 digits)
            return Decimal(
                (
                    1 if unscaled < 0 else 0,
                    tuple(int(c) for c in str(abs(unscaled))),
                    -dec_scale,
                )
            )

        return dec_decimal
    t = _type_name(schema)
    if t == "null":
        return lambda r: None
    if t == "boolean":
        return lambda r: r.read(1) != b"\x00"
    if t in ("int", "long"):
        return _Reader.read_long
    if t == "float":
        return lambda r: struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return lambda r: struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return _Reader.read_bytes
    if t == "string":
        return _Reader.read_string
    if t == "union":
        branch_decs = [_decoder(b) for b in schema]

        def dec_union(r: _Reader) -> Any:
            idx = r.read_long()
            if not 0 <= idx < len(branch_decs):
                raise AvroError(f"union index {idx} out of range")
            return branch_decs[idx](r)

        return dec_union
    if t == "array":
        item_dec = _decoder(schema["items"])

        def dec_array(r: _Reader) -> list:
            out = []
            while True:
                count = r.read_long()
                if count == 0:
                    return out
                if count < 0:  # general form: byte size follows
                    count = -count
                    r.read_long()
                for _ in range(count):
                    out.append(item_dec(r))

        return dec_array
    if t == "map":
        val_dec = _decoder(schema["values"])

        def dec_map(r: _Reader) -> dict:
            out: dict = {}
            while True:
                count = r.read_long()
                if count == 0:
                    return out
                if count < 0:
                    count = -count
                    r.read_long()
                for _ in range(count):
                    # key MUST be read before the value (Python
                    # evaluates the RHS of a subscript-assign first)
                    k = r.read_string()
                    out[k] = val_dec(r)

        return dec_map
    if t == "record":
        field_decs = [(f["name"], _decoder(f["type"])) for f in schema["fields"]]

        def dec_record(r: _Reader) -> dict:
            return {name: dec(r) for name, dec in field_decs}

        return dec_record
    raise AvroError(f"unsupported Avro type for reading: {t}")


# ---------------------------------------------------------------- #
# object container files (spec: "Object Container Files")
# ---------------------------------------------------------------- #


def _encode_metadata(out: bytearray, meta: dict[str, bytes]) -> None:
    write_long(out, len(meta))
    for k, v in meta.items():
        write_string(out, k)
        write_bytes(out, v)
    write_long(out, 0)


def write_container_stream(
    fh,
    schema: Any,
    rows: Iterable[Any],
    codec: str = "deflate",
    sync_seed: str = "amplab_hive_spark",
) -> int:
    """Serialize ``rows`` (each matching ``schema``, dicts for
    records) into ``fh`` as one Avro container file, flushing block
    by block so a partition never has to fit in memory twice. The
    sync marker is derived deterministically from the seed + schema,
    which the spec permits (it only needs to delimit blocks).
    Returns the number of rows written."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r} (null | deflate)")
    enc = _encoder(schema)
    sync = md5((sync_seed + json.dumps(schema, sort_keys=True)).encode()).digest()
    header = bytearray(MAGIC)
    _encode_metadata(
        header,
        {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("ascii"),
        },
    )
    header += sync
    fh.write(bytes(header))

    block = bytearray()
    n_in_block = 0
    total = 0

    def flush() -> None:
        nonlocal block, n_in_block
        if not n_in_block:
            return
        payload = bytes(block)
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw DEFLATE per spec
            payload = comp.compress(payload) + comp.flush()
        frame = bytearray()
        write_long(frame, n_in_block)
        write_long(frame, len(payload))
        frame += payload
        frame += sync
        fh.write(bytes(frame))
        block = bytearray()
        n_in_block = 0

    for row in rows:
        enc(block, row)
        n_in_block += 1
        total += 1
        if n_in_block >= _BLOCK_ROWS or len(block) >= _BLOCK_BYTES:
            flush()
    flush()
    return total


def write_container(
    schema: Any,
    rows: Iterable[Any],
    codec: str = "deflate",
    sync_seed: str = "amplab_hive_spark",
) -> bytes:
    """In-memory convenience wrapper over ``write_container_stream``."""
    buf = io.BytesIO()
    write_container_stream(buf, schema, rows, codec=codec, sync_seed=sync_seed)
    return buf.getvalue()


def read_container(data: bytes) -> tuple[Any, Iterator[Any]]:
    """Parse one container file -> (schema, row iterator). Rows of a
    record schema come back as dicts keyed by field name."""
    schema, codec, sync, header_len = read_header(data)
    r = _Reader(data, header_len)
    dec = _decoder(schema)

    def rows() -> Iterator[Any]:
        while not r.eof():
            n = r.read_long()
            size = r.read_long()
            payload = r.read(size)
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            if r.read(16) != sync:
                raise AvroError("sync marker mismatch (corrupt block boundary)")
            br = _Reader(payload)
            for _ in range(n):
                yield dec(br)

    return schema, rows()


def read_schema(data: bytes) -> Any:
    """Header-only parse: the writer schema without touching blocks."""
    return read_header(data)[0]


def read_header(data: bytes) -> tuple[Any, str, bytes, int]:
    """Parse just the container header from a file PREFIX ->
    (schema, codec, sync_marker, header_length). The building block
    for split reading: a task that knows (sync, header_length) can
    enter the block stream at any offset."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise AvroError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        count = r.read_long()
        if count == 0:
            break
        if count < 0:
            count = -count
            r.read_long()
        for _ in range(count):
            k = r.read_string()  # key before value: RHS evaluates first
            meta[k] = r.read_bytes()
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("ascii")
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    sync = r.read(16)
    return schema, codec, sync, r.pos


class FileBlockReader:
    """Stream decoded rows from an OPEN binary file handle, block by
    block, bounded memory (one decompressed block at a time).

    Split semantics match Hadoop/Avro's own (DataFileReader.sync +
    pastSync): a block belongs to the split containing the FIRST BYTE
    OF ITS PRECEDING SYNC MARKER (block_start - 16; the header's
    trailing sync precedes the first block). ``rows_in_span(start,
    end)`` scans forward from ``start`` for a whole sync pattern, then
    yields blocks while ``block_start < end + 16`` — the Java
    ``pastSync(end)`` test. The two sides must use the same reference
    point: a scan from ``start`` can only find syncs STARTING at
    >= ``start``, so claiming blocks by ``block_start < end`` instead
    would drop any block whose sync crosses or abuts a span boundary
    (both the previous span and the next would skip it). With the
    sync-start rule, each block's owner (the unique span containing
    block_start - 16) both finds and claims it, so consecutive spans
    cover every row exactly once. Sync-scan false positives (marker
    bytes inside a compressed payload) are possible at probability
    ~2⁻¹²⁸; the official Java DataFileReader.sync() accepts the same
    odds."""

    _SCAN_CHUNK = 1 << 16

    def __init__(self, fh, schema: Any, codec: str, sync: bytes, header_len: int):
        self.fh = fh
        self.codec = codec
        self.sync = sync
        self.header_len = header_len
        self._dec = _decoder(schema)

    def _read_long_stream(self):
        n = 0
        shift = 0
        first = True
        while True:
            b = self.fh.read(1)
            if not b:
                if first:
                    return None  # clean EOF at a block boundary
                # EOF inside a varint = truncated file; silence here
                # would turn corruption into silent partial results.
                raise AvroError("truncated input: EOF inside a block-header varint")
            first = False
            byte = b[0]
            n |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 63:
                raise AvroError("varint too long")
        return (n >> 1) ^ -(n & 1)

    def _seek_to_block_after(self, offset: int) -> int | None:
        """Position the handle at the first block whose preceding
        sync STARTS at or after ``offset``; return that block's start
        offset. The header's trailing sync (starting at
        header_len - 16) precedes the first block, so only spans that
        contain that sync's first byte may claim block one — a span
        starting inside the sync must scan past it, exactly like a
        mid-file span whose boundary falls inside a marker."""
        if offset <= self.header_len - 16:
            self.fh.seek(self.header_len)
            return self.header_len
        self.fh.seek(offset)
        tail = b""
        pos = offset
        while True:
            chunk = self.fh.read(self._SCAN_CHUNK)
            if not chunk:
                return None
            buf = tail + chunk
            idx = buf.find(self.sync)
            if idx != -1:
                block_start = pos - len(tail) + idx + 16
                self.fh.seek(block_start)
                return block_start
            tail = buf[-15:]
            pos += len(chunk)

    def rows_in_span(self, start: int, end: int) -> Iterator[Any]:
        block_start = self._seek_to_block_after(start)
        # pastSync(end): claim while the preceding sync's first byte
        # (block_start - 16) is inside [start, end).
        while block_start is not None and block_start < end + 16:
            n = self._read_long_stream()
            if n is None:
                return
            size = self._read_long_stream()
            if size is None:
                raise AvroError("truncated input: block count without a size")
            payload = self.fh.read(size)
            if len(payload) != size:
                raise AvroError("truncated block payload")
            if self.fh.read(16) != self.sync:
                raise AvroError("sync marker mismatch (corrupt block boundary)")
            if self.codec == "deflate":
                payload = zlib.decompress(payload, -15)
            br = _Reader(payload)
            for _ in range(n):
                yield self._dec(br)
            block_start = self.fh.tell()


__all__ = [
    "AvroError",
    "FileBlockReader",
    "read_header",
    "MAGIC",
    "read_container",
    "read_schema",
    "write_container",
    "write_container_stream",
]
