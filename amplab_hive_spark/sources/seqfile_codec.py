"""Pure-Python Hadoop SequenceFile codec (read + write), from the
public on-disk format only.

The reference registers SequenceFile as a first-class storage format
(ql/src/java/org/apache/hadoop/hive/ql/io/SequenceFileStorageFormatDescriptor.java,
``STORED AS SEQUENCEFILE``) and its ``RECORDREADER``/default table
layout wraps one delimited-text row per ``Text`` value with the key
ignored (serde2/lazy/LazySimpleSerDe.java consumes the value side).
Spark's DataFrame reader has no SequenceFile format, so — exactly as
with Avro (``avro_codec.py``) — this module re-implements the
container from the published spec, and ``seqfile.py`` distributes it.

Format (version 6, the only on-disk version Hadoop has written since
0.17; see the SequenceFile javadoc — public documentation):

  header   := "SEQ" 0x06
              Text(keyClassName) Text(valueClassName)
              bool(valuesCompressed) bool(blockCompressed)
              [Text(codecClassName) if valuesCompressed]
              int32_be(metaCount) metaCount*(Text k, Text v)
              sync[16]
  record   := int32_be(recordLen) int32_be(keyLen)
              key[keyLen] value[recordLen-keyLen]
              -- recordLen == -1 escapes a 16-byte sync marker
              -- RECORD compression: value bytes are codec-compressed
  block    := (always preceded by the -1+sync escape)
              vint(nRecords)
              4 x ( vint(bufLen) buf[bufLen] )   -- each codec-compressed
              -- bufs: keyLengths, keys, valueLengths, values;
              -- the length bufs decompress to nRecords vints each

Writables are serialized with Hadoop's public Writable contracts:
``Text`` = vint length + UTF-8, ``BytesWritable`` = int32_be length +
bytes, ``IntWritable``/``LongWritable`` = big-endian fixed width,
``NullWritable`` = zero bytes. The vint is WritableUtils.writeVLong's
encoding (single byte for [-112,127], else a length-tagged prefix).

Supported codec: ``org.apache.hadoop.io.compress.DefaultCodec``
(zlib-wrapped DEFLATE — Python ``zlib`` speaks it natively). Writing
supports NONE and RECORD compression; reading additionally supports
BLOCK (what Spark's ``saveAsSequenceFile(path, DefaultCodec)``
emits). Gzip/Snappy/LZO codecs raise loudly.

Cross-validated both directions against the Hadoop implementation
bundled with Spark (``sc.sequenceFile`` / ``saveAsSequenceFile``) in
tests/test_seqfile.py.
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib
from typing import Any, BinaryIO, Iterable, Iterator

MAGIC = b"SEQ"
VERSION = 6
SYNC_SIZE = 16
SYNC_INTERVAL = 100 * (SYNC_SIZE + 4)  # Hadoop's default: every ~2000 bytes
SYNC_ESCAPE = b"\xff\xff\xff\xff"  # int32_be(-1)

# First read size for one block-compressed block in the span reader;
# grows by doubling when a writer-raised io.seqfile.compress.blocksize
# produces a bigger block (see FileSpanReader._read_block).
_BLOCK_READ_BYTES = 16 << 20

DEFAULT_CODEC = "org.apache.hadoop.io.compress.DefaultCodec"

TEXT = "org.apache.hadoop.io.Text"
BYTES_WRITABLE = "org.apache.hadoop.io.BytesWritable"
INT_WRITABLE = "org.apache.hadoop.io.IntWritable"
LONG_WRITABLE = "org.apache.hadoop.io.LongWritable"
FLOAT_WRITABLE = "org.apache.hadoop.io.FloatWritable"
DOUBLE_WRITABLE = "org.apache.hadoop.io.DoubleWritable"
BOOLEAN_WRITABLE = "org.apache.hadoop.io.BooleanWritable"
NULL_WRITABLE = "org.apache.hadoop.io.NullWritable"


class SeqFileError(ValueError):
    pass


# ---------------------------------------------------------------- #
# Hadoop variable-length integers (WritableUtils.writeVLong)
# ---------------------------------------------------------------- #


def write_vlong(i: int) -> bytes:
    if -112 <= i <= 127:
        return bytes([i & 0xFF])
    tag = -112
    if i < 0:
        i = ~i
        tag = -120
    nbytes = (i.bit_length() + 7) // 8
    out = bytearray([(tag - nbytes) & 0xFF])
    for shift in range(8 * (nbytes - 1), -1, -8):
        out.append((i >> shift) & 0xFF)
    return bytes(out)


def read_vlong(buf: bytes, pos: int) -> tuple[int, int]:
    """-> (value, new_pos)."""
    first = buf[pos]
    if first > 0x7F:
        first -= 0x100  # sign
    pos += 1
    if first >= -112:
        return first, pos
    negative = first < -120
    nbytes = (-(first + 120)) if negative else (-(first + 112))
    val = 0
    for b in buf[pos : pos + nbytes]:
        val = (val << 8) | b
    pos += nbytes
    return (~val if negative else val), pos


# ---------------------------------------------------------------- #
# Writable value codecs (class name -> encode/decode)
# ---------------------------------------------------------------- #


def _enc_text(v: Any) -> bytes:
    raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    return write_vlong(len(raw)) + raw


def _dec_text(buf: bytes) -> str:
    n, pos = read_vlong(buf, 0)
    if pos + n != len(buf):
        raise SeqFileError(f"Text length {n} does not consume the record ({len(buf)} bytes)")
    return buf[pos:].decode("utf-8")


def _enc_bytes(v: Any) -> bytes:
    raw = bytes(v)
    return struct.pack(">i", len(raw)) + raw


def _dec_bytes(buf: bytes) -> bytes:
    (n,) = struct.unpack_from(">i", buf, 0)
    if 4 + n != len(buf):
        raise SeqFileError(f"BytesWritable length {n} does not consume the record")
    return buf[4 : 4 + n]


_WRITABLES: dict[str, tuple[Any, Any]] = {
    TEXT: (_enc_text, _dec_text),
    BYTES_WRITABLE: (_enc_bytes, _dec_bytes),
    INT_WRITABLE: (
        lambda v: struct.pack(">i", v),
        lambda b: struct.unpack(">i", b)[0],
    ),
    LONG_WRITABLE: (
        lambda v: struct.pack(">q", v),
        lambda b: struct.unpack(">q", b)[0],
    ),
    FLOAT_WRITABLE: (
        lambda v: struct.pack(">f", v),
        lambda b: struct.unpack(">f", b)[0],
    ),
    DOUBLE_WRITABLE: (
        lambda v: struct.pack(">d", v),
        lambda b: struct.unpack(">d", b)[0],
    ),
    BOOLEAN_WRITABLE: (
        lambda v: struct.pack(">?", v),
        lambda b: struct.unpack(">?", b)[0],
    ),
    NULL_WRITABLE: (lambda v: b"", lambda b: None),
}


def writable_codec(class_name: str) -> tuple[Any, Any]:
    try:
        return _WRITABLES[class_name]
    except KeyError:
        raise SeqFileError(
            f"unsupported Writable class {class_name!r}; supported: "
            + ", ".join(sorted(_WRITABLES))
        ) from None


# ---------------------------------------------------------------- #
# header
# ---------------------------------------------------------------- #


class Header:
    __slots__ = (
        "key_class",
        "value_class",
        "compressed",
        "block_compressed",
        "codec",
        "metadata",
        "sync",
        "length",
    )

    def __init__(self, key_class, value_class, compressed, block_compressed,
                 codec, metadata, sync, length):
        self.key_class = key_class
        self.value_class = value_class
        self.compressed = compressed
        self.block_compressed = block_compressed
        self.codec = codec
        self.metadata = metadata
        self.sync = sync
        self.length = length


def _read_java_string(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = read_vlong(buf, pos)
    return buf[pos : pos + n].decode("utf-8"), pos + n


def read_header(buf: bytes) -> Header:
    if buf[:3] != MAGIC:
        raise SeqFileError(f"not a SequenceFile (magic {buf[:3]!r})")
    if buf[3] != VERSION:
        raise SeqFileError(f"unsupported SequenceFile version {buf[3]}")
    pos = 4
    key_class, pos = _read_java_string(buf, pos)
    value_class, pos = _read_java_string(buf, pos)
    compressed = bool(buf[pos]); pos += 1
    block_compressed = bool(buf[pos]); pos += 1
    codec = None
    if compressed or block_compressed:
        codec, pos = _read_java_string(buf, pos)
        if codec != DEFAULT_CODEC:
            raise SeqFileError(
                f"unsupported compression codec {codec!r} "
                f"(only {DEFAULT_CODEC} — zlib/DEFLATE — is implemented)"
            )
    (meta_count,) = struct.unpack_from(">i", buf, pos); pos += 4
    metadata = {}
    for _ in range(meta_count):
        k, pos = _read_java_string(buf, pos)
        v, pos = _read_java_string(buf, pos)
        metadata[k] = v
    sync = buf[pos : pos + SYNC_SIZE]; pos += SYNC_SIZE
    if len(sync) != SYNC_SIZE:
        raise SeqFileError("truncated SequenceFile header")
    return Header(key_class, value_class, compressed, block_compressed,
                  codec, metadata, sync, pos)


def _write_java_string(out: BinaryIO, s: str) -> None:
    raw = s.encode("utf-8")
    out.write(write_vlong(len(raw)))
    out.write(raw)


def write_header(
    out: BinaryIO,
    key_class: str,
    value_class: str,
    *,
    record_compress: bool = False,
    metadata: dict[str, str] | None = None,
    sync_seed: str = "",
) -> bytes:
    """Write the container header; returns the sync marker (derived
    deterministically from ``sync_seed`` so retried task attempts
    produce byte-identical files)."""
    sync = hashlib.md5(("amplab-seqfile:" + sync_seed).encode()).digest()
    out.write(MAGIC)
    out.write(bytes([VERSION]))
    _write_java_string(out, key_class)
    _write_java_string(out, value_class)
    out.write(b"\x01" if record_compress else b"\x00")
    out.write(b"\x00")  # block compression: write side not implemented
    if record_compress:
        _write_java_string(out, DEFAULT_CODEC)
    metadata = metadata or {}
    out.write(struct.pack(">i", len(metadata)))
    for k, v in metadata.items():
        _write_java_string(out, k)
        _write_java_string(out, v)
    out.write(sync)
    return sync


# ---------------------------------------------------------------- #
# writer (NONE / RECORD compression)
# ---------------------------------------------------------------- #


def write_seqfile_stream(
    out: BinaryIO,
    records: Iterable[tuple[Any, Any]],
    key_class: str = TEXT,
    value_class: str = TEXT,
    *,
    record_compress: bool = False,
    metadata: dict[str, str] | None = None,
    sync_seed: str = "",
) -> int:
    """Stream ``(key, value)`` pairs into ``out``; returns the record
    count. Memory is one record at a time; a sync marker is emitted
    every ~``SYNC_INTERVAL`` bytes (Hadoop's cadence), which is what
    makes the file splittable for ``read_sequencefile_split``."""
    enc_key, _ = writable_codec(key_class)
    enc_val, _ = writable_codec(value_class)
    sync = write_header(
        out, key_class, value_class,
        record_compress=record_compress, metadata=metadata, sync_seed=sync_seed,
    )
    n = 0
    since_sync = 0
    for key, value in records:
        if since_sync >= SYNC_INTERVAL:
            out.write(SYNC_ESCAPE)
            out.write(sync)
            since_sync = 0
        kb = enc_key(key)
        vb = enc_val(value)
        if record_compress:
            vb = zlib.compress(vb)
        rec = struct.pack(">ii", len(kb) + len(vb), len(kb)) + kb + vb
        out.write(rec)
        since_sync += len(rec)
        n += 1
    return n


# ---------------------------------------------------------------- #
# reader
# ---------------------------------------------------------------- #


def _iter_block(buf: bytes, pos: int, header: Header) -> tuple[list[tuple[bytes, bytes]], int]:
    """Decode one block-compressed block starting at ``pos`` (just
    after the sync escape). -> (records, new_pos)."""
    n_records, pos = read_vlong(buf, pos)
    bufs = []
    for _ in range(4):
        blen, pos = read_vlong(buf, pos)
        bufs.append(zlib.decompress(buf[pos : pos + blen]))
        pos += blen
    key_lens_raw, keys_raw, val_lens_raw, vals_raw = bufs

    def lengths(raw: bytes) -> list[int]:
        out, p = [], 0
        for _ in range(n_records):
            v, p = read_vlong(raw, p)
            out.append(v)
        return out

    records = []
    kpos = vpos = 0
    for klen, vlen in zip(lengths(key_lens_raw), lengths(val_lens_raw)):
        records.append((keys_raw[kpos : kpos + klen], vals_raw[vpos : vpos + vlen]))
        kpos += klen
        vpos += vlen
    return records, pos


def iter_raw_records(buf: bytes, header: Header | None = None) -> Iterator[tuple[bytes, bytes]]:
    """Yield (key_bytes, value_bytes) with compression undone but
    Writable payloads still encoded."""
    if header is None:
        header = read_header(buf)
    pos = header.length
    end = len(buf)
    while pos < end:
        if buf[pos : pos + 4] == SYNC_ESCAPE:
            if buf[pos + 4 : pos + 4 + SYNC_SIZE] != header.sync:
                raise SeqFileError(f"sync marker mismatch at offset {pos}")
            pos += 4 + SYNC_SIZE
            if header.block_compressed:
                records, pos = _iter_block(buf, pos, header)
                yield from records
            continue
        if header.block_compressed:
            raise SeqFileError(f"block-compressed file: expected sync escape at {pos}")
        if pos + 8 > end:
            raise SeqFileError(f"truncated record header at offset {pos}")
        rec_len, key_len = struct.unpack_from(">ii", buf, pos)
        pos += 8
        if key_len < 0 or rec_len < key_len or pos + rec_len > end:
            raise SeqFileError(f"corrupt record framing at offset {pos - 8}")
        kb = buf[pos : pos + key_len]
        vb = buf[pos + key_len : pos + rec_len]
        pos += rec_len
        if header.compressed:
            vb = zlib.decompress(vb)
        yield kb, vb


def read_seqfile(buf: bytes) -> tuple[Header, Iterator[tuple[Any, Any]]]:
    """-> (header, iterator of decoded (key, value) pairs)."""
    header = read_header(buf)
    _, dec_key = writable_codec(header.key_class)
    _, dec_val = writable_codec(header.value_class)

    def rows() -> Iterator[tuple[Any, Any]]:
        for kb, vb in iter_raw_records(buf, header):
            yield dec_key(kb), dec_val(vb)

    return header, rows()


# ---------------------------------------------------------------- #
# span reader — the split contract for huge files
# ---------------------------------------------------------------- #


class FileSpanReader:
    """Read exactly the records whose framing STARTS inside
    ``[start, end)`` of an open SequenceFile — Hadoop's
    SequenceFileRecordReader split contract, so consecutive spans
    tile a file with no row read twice or dropped.

    A span that does not begin at the first record boundary scans
    forward for the 20-byte ``-1 + sync`` escape; record-mode files
    get one from the writer every ~2 KB (``SYNC_INTERVAL``),
    block-mode files before every block. Memory is one IO chunk +
    one record (or one decompressed block)."""

    _CHUNK = 4 << 20

    def __init__(self, fh: BinaryIO, header: Header):
        self.fh = fh
        self.header = header
        self._needle = SYNC_ESCAPE + header.sync

    def _find_sync_at_or_after(self, offset: int) -> int | None:
        """Absolute offset of the first sync ESCAPE at/after offset,
        or None. Overlap by needle-1 bytes across chunks."""
        tail = b""
        base = offset
        self.fh.seek(offset)
        while True:
            chunk = self.fh.read(self._CHUNK)
            if not chunk:
                return None
            hay = tail + chunk
            idx = hay.find(self._needle)
            if idx >= 0:
                return base - len(tail) + idx
            tail = hay[-(len(self._needle) - 1):]
            base += len(chunk)

    def rows_in_span(self, start: int, end: int) -> Iterator[tuple[bytes, bytes]]:
        """Hadoop's SequenceFileRecordReader tiling: a reader keeps
        consuming records PAST ``end`` until it meets a sync escape
        (or EOF); the next span begins at the first sync escape
        at/after its own ``start``. The sync that terminates span N
        is exactly the one span N+1 anchors on, so consecutive spans
        cover every record once."""
        header = self.header
        if start == 0:
            pos = header.length
        else:
            found = self._find_sync_at_or_after(start)
            if found is None or found >= end:
                return  # span ends inside the run the previous span finishes
            pos = found  # the main loop consumes the anchoring escape
            # (and, in block mode, the block it introduces)
        self.fh.seek(pos)
        while True:
            head = self.fh.read(4)
            if len(head) < 4:
                return  # EOF terminates the last span
            if head == SYNC_ESCAPE:
                sync = self.fh.read(SYNC_SIZE)
                if sync != header.sync:
                    raise SeqFileError(f"sync marker mismatch at offset {pos}")
                if pos >= end:
                    return  # the next span anchors on this very sync
                pos += 4 + SYNC_SIZE
                if header.block_compressed:
                    yield from self._read_block(pos)
                    pos = self.fh.tell()
                continue
            if header.block_compressed:
                raise SeqFileError(f"block-compressed file: expected sync escape at {pos}")
            (rec_len,) = struct.unpack(">i", head)
            key_len_raw = self.fh.read(4)
            (key_len,) = struct.unpack(">i", key_len_raw)
            body = self.fh.read(rec_len)
            if key_len < 0 or rec_len < key_len or len(body) < rec_len:
                raise SeqFileError(f"corrupt record framing at offset {pos}")
            kb, vb = body[:key_len], body[key_len:]
            if header.compressed:
                vb = zlib.decompress(vb)
            yield kb, vb
            pos += 8 + rec_len

    def _read_block(self, pos: int) -> Iterator[tuple[bytes, bytes]]:
        # blocks are small (~1 MB compressed) so one generous read
        # usually suffices — but io.seqfile.compress.blocksize is a
        # writer knob, so a block CAN exceed any fixed guess. Decode
        # failures on a non-EOF buffer mean "read more", not
        # "corrupt": double and retry until the block fits or EOF
        # proves real corruption (every truncation path in
        # _iter_block raises loudly — zlib on an incomplete stream,
        # IndexError from read_vlong past the buffer).
        size = _BLOCK_READ_BYTES
        while True:
            self.fh.seek(pos)
            buf = self.fh.read(size)
            at_eof = len(buf) < size
            try:
                records, consumed = _iter_block(buf, 0, self.header)
            except (IndexError, struct.error, zlib.error) as ex:
                if at_eof:
                    raise SeqFileError(
                        f"corrupt or truncated block at offset {pos}: {ex}"
                    ) from ex
                size *= 2
                continue
            self.fh.seek(pos + consumed)
            yield from records
            return


def read_seqfile_pairs(buf: bytes) -> list[tuple[Any, Any]]:
    """Convenience: fully materialize a file's decoded pairs."""
    _, rows = read_seqfile(buf)
    return list(rows)


def encode_seqfile(
    records: Iterable[tuple[Any, Any]],
    key_class: str = TEXT,
    value_class: str = TEXT,
    **kw: Any,
) -> bytes:
    out = io.BytesIO()
    write_seqfile_stream(out, records, key_class, value_class, **kw)
    return out.getvalue()


__all__ = [
    "BOOLEAN_WRITABLE",
    "BYTES_WRITABLE",
    "DEFAULT_CODEC",
    "DOUBLE_WRITABLE",
    "FLOAT_WRITABLE",
    "FileSpanReader",
    "Header",
    "INT_WRITABLE",
    "LONG_WRITABLE",
    "NULL_WRITABLE",
    "SeqFileError",
    "TEXT",
    "encode_seqfile",
    "iter_raw_records",
    "read_header",
    "read_seqfile",
    "read_seqfile_pairs",
    "read_vlong",
    "write_header",
    "write_seqfile_stream",
    "write_vlong",
    "writable_codec",
]
