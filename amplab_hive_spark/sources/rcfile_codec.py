"""Pure-Python Hive RCFile codec (read + write), from the public
on-disk format only.

RCFile is the reference's columnar storage format (``STORED AS
RCFILE`` — ql/src/java/org/apache/hadoop/hive/ql/io/
RCFileStorageFormatDescriptor.java, container implementation
ql/src/java/org/apache/hadoop/hive/ql/io/RCFile.java): rows are
buffered into *row groups* (~4 MB), each written as one record whose
KEY part holds the per-column cell-length metadata and whose VALUE
part holds the column payloads back-to-back — so a reader can skip
whole columns (and skip *decompressing* them) using only the key.
Spark has no RCFile DataFrame source, so — exactly as with Avro
(``avro_codec.py``) and SequenceFile (``seqfile_codec.py``) — this
module re-implements the container from the published format and
``rcfile.py`` distributes it.

Format (version 1, the explicit-magic header Hive has written by
default since 0.12; the original SequenceFile-framed header
``SEQ\\x06`` is accepted on read):

  header    := "RCF" 0x01
               bool(compressed) [Text(codecClassName) if compressed]
               int32_be(metaCount) metaCount*(Text k, Text v)
               -- metadata carries "hive.io.rcfile.column.number"
               sync[16]
  row group := int32_be(recordLen)   -- == keyLen + valueOnDiskLen
               int32_be(keyLen)      -- UNCOMPRESSED key size
               int32_be(keyOnDiskLen)-- == keyLen when not compressed
               key[keyOnDiskLen] value[recordLen - keyLen]
               -- recordLen == -1 escapes a 16-byte sync marker
  key       := vint(numRows)
               per column: vint(valueOnDiskLen) vint(valuePlainLen)
                           vint(lenBufLen) lenBuf[lenBufLen]
  lenBuf    := run-length encoded cell lengths: each run is
               vint(length) [vint(~extraRepeats) if run > 1]
  value     := per column, the cell bytes back-to-back; when
               compressed, each column is an independent zlib stream

The vint is WritableUtils.writeVLong (shared with the SequenceFile
codec). Supported codec:
``org.apache.hadoop.io.compress.DefaultCodec`` (zlib-wrapped
DEFLATE); others raise loudly. Cross-validated both directions
against the Hive implementation bundled with Spark
(``org.apache.hadoop.hive.ql.io.RCFile`` in hive-exec) in
tests/test_rcfile.py.
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib
from typing import Any, BinaryIO, Iterable, Iterator, Sequence

from .seqfile_codec import (
    DEFAULT_CODEC,
    read_vlong,
    write_vlong,
)

MAGIC = b"RCF"
VERSION = 1
ORIGINAL_MAGIC = b"SEQ\x06"  # pre-0.12 header framing
SYNC_SIZE = 16
SYNC_INTERVAL = 100 * (SYNC_SIZE + 4)
SYNC_ESCAPE = b"\xff\xff\xff\xff"  # int32_be(-1)

COLUMN_NUMBER_METADATA = "hive.io.rcfile.column.number"

# the KeyBuffer/ValueBuffer class names the SEQ-framed header carries
_KEY_CLASS = "org.apache.hadoop.hive.ql.io.RCFile$KeyBuffer"
_VALUE_CLASS = "org.apache.hadoop.hive.ql.io.RCFile$ValueBuffer"

DEFAULT_GROUP_BYTES = 4 << 20  # hive.io.rcfile.record.buffer.size


class RCFileError(ValueError):
    pass


# ---------------------------------------------------------------- #
# cell-length run-length encoding (RCFile.Writer.ColumnBuffer)
# ---------------------------------------------------------------- #


def encode_cell_lengths(lengths: Sequence[int]) -> bytes:
    """[1,1,1,2] -> vint(1) vint(~2) vint(2): a run's length once,
    then the bitwise-NOT of the extra-repeat count if > 0."""
    out = bytearray()
    prev = -1
    run = 0
    for n in lengths:
        if prev < 0:
            prev, run = n, 0
        elif n == prev:
            run += 1
        else:
            out += write_vlong(prev)
            if run > 0:
                out += write_vlong(~run)
            prev, run = n, 0
    if prev >= 0:
        out += write_vlong(prev)
        if run > 0:
            out += write_vlong(~run)
    return bytes(out)


def decode_cell_lengths(raw: bytes, n_rows: int) -> list[int]:
    if not raw:  # a nulled column stores an empty length buffer
        return [0] * n_rows
    out: list[int] = []
    pos = 0
    prev = 0
    while len(out) < n_rows:
        v, pos = read_vlong(raw, pos)
        if v < 0:
            out.extend([prev] * (~v))
        else:
            prev = v
            out.append(v)
    if len(out) != n_rows:
        raise RCFileError(
            f"cell-length buffer decodes to {len(out)} cells, expected {n_rows}"
        )
    return out


# ---------------------------------------------------------------- #
# header
# ---------------------------------------------------------------- #


class RCHeader:
    __slots__ = ("num_columns", "compressed", "codec", "metadata", "sync", "length")

    def __init__(self, num_columns, compressed, codec, metadata, sync, length):
        self.num_columns = num_columns
        self.compressed = compressed
        self.codec = codec
        self.metadata = metadata
        self.sync = sync
        self.length = length


def _read_java_string(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = read_vlong(buf, pos)
    return buf[pos : pos + n].decode("utf-8"), pos + n


def _write_java_string(out: BinaryIO, s: str) -> None:
    raw = s.encode("utf-8")
    out.write(write_vlong(len(raw)))
    out.write(raw)


def read_rc_header(buf: bytes) -> RCHeader:
    if buf[:4] == MAGIC + bytes([VERSION]):
        pos = 4
    elif buf[:4] == ORIGINAL_MAGIC:
        # SEQ-framed original header: KeyBuffer/ValueBuffer class
        # names precede the booleans, and a block-compressed flag
        # (always false) follows the compressed flag.
        pos = 4
        key_class, pos = _read_java_string(buf, pos)
        value_class, pos = _read_java_string(buf, pos)
        if (key_class, value_class) != (_KEY_CLASS, _VALUE_CLASS):
            raise RCFileError(
                f"not an RCFile: SEQ header carries ({key_class}, {value_class})"
            )
    else:
        raise RCFileError(f"not an RCFile (magic {buf[:4]!r})")
    original = buf[:3] != MAGIC
    compressed = bool(buf[pos]); pos += 1
    if original:
        if buf[pos]:  # block-compressed: RCFile never writes it
            raise RCFileError("not an RCFile: block-compressed SEQ header")
        pos += 1
    codec = None
    if compressed:
        codec, pos = _read_java_string(buf, pos)
        if codec != DEFAULT_CODEC:
            raise RCFileError(
                f"unsupported compression codec {codec!r} "
                f"(only {DEFAULT_CODEC} — zlib/DEFLATE — is implemented)"
            )
    (meta_count,) = struct.unpack_from(">i", buf, pos); pos += 4
    metadata = {}
    for _ in range(meta_count):
        k, pos = _read_java_string(buf, pos)
        v, pos = _read_java_string(buf, pos)
        metadata[k] = v
    try:
        num_columns = int(metadata[COLUMN_NUMBER_METADATA])
    except (KeyError, ValueError):
        raise RCFileError(
            f"RCFile header lacks a valid {COLUMN_NUMBER_METADATA!r} entry"
        ) from None
    sync = buf[pos : pos + SYNC_SIZE]; pos += SYNC_SIZE
    if len(sync) != SYNC_SIZE:
        raise RCFileError("truncated RCFile header")
    return RCHeader(num_columns, compressed, codec, metadata, sync, pos)


def write_rc_header(
    out: BinaryIO,
    num_columns: int,
    *,
    compress: bool = False,
    metadata: dict[str, str] | None = None,
    sync_seed: str = "",
) -> bytes:
    """Write the RCF-v1 header; returns the sync marker (derived
    deterministically from ``sync_seed`` so retried task attempts
    produce byte-identical files)."""
    if num_columns <= 0:
        raise RCFileError("RCFile needs at least one column")
    sync = hashlib.md5(("amplab-rcfile:" + sync_seed).encode()).digest()
    out.write(MAGIC)
    out.write(bytes([VERSION]))
    out.write(b"\x01" if compress else b"\x00")
    if compress:
        _write_java_string(out, DEFAULT_CODEC)
    meta = dict(metadata or {})
    meta[COLUMN_NUMBER_METADATA] = str(num_columns)
    out.write(struct.pack(">i", len(meta)))
    for k, v in meta.items():
        _write_java_string(out, k)
        _write_java_string(out, v)
    out.write(sync)
    return sync


# ---------------------------------------------------------------- #
# writer — streaming row-group writer
# ---------------------------------------------------------------- #


class RCFileWriter:
    """Buffer rows column-wise and flush ~``group_bytes`` row groups
    (RCFile.Writer's columnsBufferSize contract). Cells are raw
    bytes; the table-layout null sentinel is the caller's concern
    (``rcfile.py`` uses LazySimpleSerDe's ``\\N``)."""

    def __init__(
        self,
        out: BinaryIO,
        num_columns: int,
        *,
        compress: bool = False,
        metadata: dict[str, str] | None = None,
        sync_seed: str = "",
        group_bytes: int = DEFAULT_GROUP_BYTES,
        group_rows: int | None = None,
    ):
        self.out = out
        self.num_columns = num_columns
        self.compress = compress
        self.group_bytes = group_bytes
        self.group_rows = group_rows
        self.sync = write_rc_header(
            out, num_columns, compress=compress, metadata=metadata,
            sync_seed=sync_seed,
        )
        self._pos = out.tell()
        self._last_sync = 0  # RCFile.Writer starts lastSyncPos at 0
        self._col_vals: list[list[bytes]] = [[] for _ in range(num_columns)]
        self._col_lens: list[list[int]] = [[] for _ in range(num_columns)]
        self._buffered_rows = 0
        self._buffered_bytes = 0
        self.rows_written = 0

    def append(self, row: Sequence[bytes]) -> None:
        if len(row) != self.num_columns:
            raise RCFileError(
                f"row has {len(row)} cells, file has {self.num_columns} columns"
            )
        for i, cell in enumerate(row):
            self._col_vals[i].append(cell)
            self._col_lens[i].append(len(cell))
            self._buffered_bytes += len(cell)
        self._buffered_rows += 1
        if self._buffered_bytes > self.group_bytes or (
            self.group_rows is not None and self._buffered_rows >= self.group_rows
        ):
            self._flush_group()

    def _flush_group(self) -> None:
        if self._buffered_rows == 0:
            return
        key = bytearray(write_vlong(self._buffered_rows))
        payloads: list[bytes] = []
        for i in range(self.num_columns):
            plain = b"".join(self._col_vals[i])
            disk = zlib.compress(plain) if self.compress else plain
            lenbuf = encode_cell_lengths(self._col_lens[i])
            key += write_vlong(len(disk))
            key += write_vlong(len(plain))
            key += write_vlong(len(lenbuf))
            key += lenbuf
            payloads.append(disk)
        key_bytes = bytes(key)
        value_len = sum(len(p) for p in payloads)
        record_len = len(key_bytes) + value_len  # plain key + on-disk value

        if self._pos >= self._last_sync + SYNC_INTERVAL:
            self.out.write(SYNC_ESCAPE)
            self.out.write(self.sync)
            self._pos += 4 + SYNC_SIZE
            self._last_sync = self._pos

        self.out.write(struct.pack(">i", record_len))
        self.out.write(struct.pack(">i", len(key_bytes)))
        if self.compress:
            key_disk = zlib.compress(key_bytes)
            self.out.write(struct.pack(">i", len(key_disk)))
            self.out.write(key_disk)
            self._pos += 12 + len(key_disk)
        else:
            self.out.write(struct.pack(">i", len(key_bytes)))
            self.out.write(key_bytes)
            self._pos += 12 + len(key_bytes)
        for p in payloads:
            self.out.write(p)
        self._pos += value_len

        self.rows_written += self._buffered_rows
        self._col_vals = [[] for _ in range(self.num_columns)]
        self._col_lens = [[] for _ in range(self.num_columns)]
        self._buffered_rows = 0
        self._buffered_bytes = 0

    def close(self) -> None:
        self._flush_group()


def write_rcfile_stream(
    out: BinaryIO,
    rows: Iterable[Sequence[bytes]],
    num_columns: int,
    **kw: Any,
) -> int:
    writer = RCFileWriter(out, num_columns, **kw)
    for row in rows:
        writer.append(row)
    writer.close()
    return writer.rows_written


def encode_rcfile(rows: Iterable[Sequence[bytes]], num_columns: int, **kw: Any) -> bytes:
    out = io.BytesIO()
    write_rcfile_stream(out, rows, num_columns, **kw)
    return out.getvalue()


# ---------------------------------------------------------------- #
# reader
# ---------------------------------------------------------------- #


def _parse_key(kb: bytes, num_columns: int) -> tuple[int, list[tuple[int, int, bytes]]]:
    """-> (n_rows, [(on_disk_len, plain_len, len_buf)] per column)."""
    pos = 0
    n_rows, pos = read_vlong(kb, pos)
    cols = []
    for _ in range(num_columns):
        disk, pos = read_vlong(kb, pos)
        plain, pos = read_vlong(kb, pos)
        lb_len, pos = read_vlong(kb, pos)
        cols.append((disk, plain, kb[pos : pos + lb_len]))
        pos += lb_len
    if pos != len(kb):
        raise RCFileError(
            f"RCFile key buffer has {len(kb) - pos} trailing bytes"
        )
    return n_rows, cols


def _decode_group(
    key_bytes: bytes,
    value_bytes: bytes,
    header: RCHeader,
    wanted: Sequence[int] | None,
) -> tuple[int, dict[int, list[bytes]]]:
    """Decode one row group -> (n_rows, {col_index: cells}). Columns
    not in ``wanted`` are skipped WITHOUT decompression — the
    columnar projection that is RCFile's reason to exist."""
    n_rows, cols = _parse_key(key_bytes, header.num_columns)
    want = set(range(header.num_columns)) if wanted is None else set(wanted)
    out: dict[int, list[bytes]] = {}
    off = 0
    for ci, (disk, plain, lenbuf) in enumerate(cols):
        if ci in want:
            raw = value_bytes[off : off + disk]
            if header.compressed:
                raw = zlib.decompress(raw)
            if len(raw) != plain:
                raise RCFileError(
                    f"column {ci}: payload is {len(raw)} bytes, key says {plain}"
                )
            cells = []
            p = 0
            for n in decode_cell_lengths(lenbuf, n_rows):
                cells.append(raw[p : p + n])
                p += n
            out[ci] = cells
        off += disk
    if off != len(value_bytes):
        raise RCFileError(
            f"row-group value section has {len(value_bytes) - off} trailing bytes"
        )
    return n_rows, out


def iter_row_groups(
    buf: bytes,
    header: RCHeader | None = None,
    wanted: Sequence[int] | None = None,
) -> Iterator[tuple[int, dict[int, list[bytes]]]]:
    """Yield decoded (n_rows, {col: cells}) per row group."""
    if header is None:
        header = read_rc_header(buf)
    pos = header.length
    end = len(buf)
    while pos < end:
        if buf[pos : pos + 4] == SYNC_ESCAPE:
            if buf[pos + 4 : pos + 4 + SYNC_SIZE] != header.sync:
                raise RCFileError(f"sync marker mismatch at offset {pos}")
            pos += 4 + SYNC_SIZE
            continue
        if pos + 12 > end:
            raise RCFileError(f"truncated row-group header at offset {pos}")
        record_len, key_len, key_disk_len = struct.unpack_from(">iii", buf, pos)
        pos += 12
        value_len = record_len - key_len
        if key_len < 0 or value_len < 0 or pos + key_disk_len + value_len > end:
            raise RCFileError(f"corrupt row-group framing at offset {pos - 12}")
        kb = buf[pos : pos + key_disk_len]
        pos += key_disk_len
        if header.compressed:
            kb = zlib.decompress(kb)
            if len(kb) != key_len:
                raise RCFileError(
                    f"key decompresses to {len(kb)} bytes, header says {key_len}"
                )
        vb = buf[pos : pos + value_len]
        pos += value_len
        yield _decode_group(kb, vb, header, wanted)


def read_rcfile(
    buf: bytes, wanted: Sequence[int] | None = None
) -> tuple[RCHeader, Iterator[tuple[bytes, ...]]]:
    """-> (header, iterator of per-row cell tuples). With ``wanted``,
    each row tuple holds only those columns, in ``wanted`` order."""
    header = read_rc_header(buf)
    order = list(range(header.num_columns)) if wanted is None else list(wanted)

    def rows() -> Iterator[tuple[bytes, ...]]:
        for n_rows, cols in iter_row_groups(buf, header, order):
            yield from zip(*(cols[ci] for ci in order)) if order else iter(
                [()] * n_rows
            )

    return header, rows()


def read_rcfile_rows(buf: bytes, wanted: Sequence[int] | None = None) -> list[tuple[bytes, ...]]:
    _, rows = read_rcfile(buf, wanted)
    return list(rows)


# ---------------------------------------------------------------- #
# span reader — the split contract for huge files
# ---------------------------------------------------------------- #


class RCSpanReader:
    """Decode exactly the row groups whose framing STARTS inside
    ``[start, end)`` of an open RCFile — RCFileRecordReader's split
    contract (a reader consumes groups past ``end`` until it meets a
    sync escape; the next span anchors on the first sync at/after its
    own ``start``), so consecutive spans tile a file with no group
    decoded twice or dropped. Row groups flush at ~4 MB, which is
    ≥ SYNC_INTERVAL, so in practice every group is sync-preceded."""

    _CHUNK = 4 << 20

    def __init__(self, fh: BinaryIO, header: RCHeader):
        self.fh = fh
        self.header = header
        self._needle = SYNC_ESCAPE + header.sync

    def _find_sync_at_or_after(self, offset: int) -> int | None:
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

    def groups_in_span(
        self, start: int, end: int, wanted: Sequence[int] | None = None
    ) -> Iterator[tuple[int, dict[int, list[bytes]]]]:
        header = self.header
        if start == 0:
            pos = header.length
        else:
            found = self._find_sync_at_or_after(start)
            if found is None or found >= end:
                return
            pos = found
        self.fh.seek(pos)
        while True:
            head = self.fh.read(4)
            if len(head) < 4:
                return
            if head == SYNC_ESCAPE:
                sync = self.fh.read(SYNC_SIZE)
                if sync != header.sync:
                    raise RCFileError(f"sync marker mismatch at offset {pos}")
                if pos >= end:
                    return
                pos += 4 + SYNC_SIZE
                continue
            lens = self.fh.read(8)
            if len(lens) < 8:
                raise RCFileError(f"truncated row-group header at offset {pos}")
            (record_len,) = struct.unpack(">i", head)
            key_len, key_disk_len = struct.unpack(">ii", lens)
            value_len = record_len - key_len
            kb = self.fh.read(key_disk_len)
            vb = self.fh.read(value_len)
            if key_len < 0 or value_len < 0 or len(kb) < key_disk_len or len(vb) < value_len:
                raise RCFileError(f"corrupt row-group framing at offset {pos}")
            if header.compressed:
                kb = zlib.decompress(kb)
            yield _decode_group(kb, vb, header, wanted)
            pos += 12 + key_disk_len + value_len


__all__ = [
    "COLUMN_NUMBER_METADATA",
    "DEFAULT_GROUP_BYTES",
    "RCFileError",
    "RCFileWriter",
    "RCHeader",
    "RCSpanReader",
    "decode_cell_lengths",
    "encode_cell_lengths",
    "encode_rcfile",
    "iter_row_groups",
    "read_rc_header",
    "read_rcfile",
    "read_rcfile_rows",
    "write_rc_header",
    "write_rcfile_stream",
]
