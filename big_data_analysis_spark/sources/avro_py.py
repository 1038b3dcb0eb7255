"""Pure-Python Apache Avro object-container reader/writer + a Spark
Python DataSource wrapping it.

Why this exists: the spark-avro JVM DataSource module is not on this
container's classpath and there is no network to fetch it (and no
Python avro/fastavro package either) — but Avro is a first-class
interchange format any analytics engine is expected to ingest. The
Avro OBJECT CONTAINER FILE format is small and fully public
(https://avro.apache.org/docs/1.12.0/specification/ — "Object
Container Files" + "Binary Encoding"), so this module implements it
from the spec with stdlib only (struct/zlib/json), the same ethos as
the WAV/BMP/PNG/AVI/MP4 wire-format parsers in operators/multimodal.py:
no fixture-formula shortcuts, real bytes in, real rows out.

Supported (the flat-record subset an analytics scan needs):
  - records of null/boolean/int/long/float/double/string/bytes fields,
    plus 2-branch ["null", T] unions (the ubiquitous nullable column)
  - codecs: null and deflate (raw RFC-1951, per spec)
  - container framing: magic Obj\\x01, metadata map (avro.schema,
    avro.codec), 16-byte sync marker, block = (row count, byte size,
    payload, sync) with sync verification on every block

Scale: the DataSource plans ONE partition PER FILE — the writer
shards, so parallelism = shard count, exactly how file-based scans
parallelize. At 100 TB you would additionally split within a file by
scanning for the 16-byte sync marker (the same trick Hadoop input
formats use — blocks are independently decodable by design); per-file
granularity keeps this implementation honest without pretending to a
splitter the local fixture cannot exercise.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- codec

def _zigzag_encode(n: int) -> bytes:
    """Avro int/long: zigzag then base-128 varint, little-endian."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift, u = 0, 0
    while True:
        (b,) = buf.read(1)
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _encode_value(typ, v) -> bytes:
    if isinstance(typ, list):  # ["null", T] union
        if v is None:
            return _zigzag_encode(typ.index("null"))
        other = 1 - typ.index("null")
        return _zigzag_encode(other) + _encode_value(typ[other], v)
    if typ == "null":
        return b""
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ in ("int", "long"):
        return _zigzag_encode(int(v))
    if typ == "float":
        return struct.pack("<f", v)
    if typ == "double":
        return struct.pack("<d", v)
    if typ == "string":
        raw = v.encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        return _zigzag_encode(len(v)) + v
    raise ValueError(f"unsupported avro type {typ!r}")


def _decode_value(typ, buf: io.BytesIO):
    if isinstance(typ, list):
        branch = typ[_zigzag_decode(buf)]
        return _decode_value(branch, buf)
    if typ == "null":
        return None
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    if typ in ("int", "long"):
        return _zigzag_decode(buf)
    if typ == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "string":
        return buf.read(_zigzag_decode(buf)).decode("utf-8")
    if typ == "bytes":
        return buf.read(_zigzag_decode(buf))
    raise ValueError(f"unsupported avro type {typ!r}")


# ------------------------------------------------------------ container

# Fixed (deterministic output, no RNG) but high-entropy sync marker:
# split planning locates block boundaries by SEARCHING for this
# 16-byte pattern, so a low-entropy marker (0x00010203...) would court
# accidental matches inside deflate payloads. The spec itself accepts
# the 2^-128-ish residual collision odds — Hadoop input formats rely
# on the same property.
_DEFAULT_SYNC = bytes.fromhex("6bd79e2a41c85f03b7e1d4968c2a5fd0")


def write_container(
    path: str,
    schema: dict,
    rows,
    codec: str = "deflate",
    sync: bytes = _DEFAULT_SYNC,
    block_rows: int = 1000,
) -> None:
    """Write an Avro object container file. ``schema`` is the record
    schema as a dict; ``rows`` yields tuples in field order. The sync
    marker is fixed (not random) so output is byte-deterministic —
    Spark-side results must not depend on RNG state."""
    assert schema["type"] == "record"
    assert len(sync) == 16
    fields = [(f["name"], f["type"]) for f in schema["fields"]]

    def encode_block(block) -> bytes:
        payload = b"".join(
            b"".join(_encode_value(t, v) for (_, t), v in zip(fields, row))
            for row in block
        )
        if codec == "deflate":  # raw RFC-1951 per spec: no zlib header
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        return (
            _zigzag_encode(len(block))
            + _zigzag_encode(len(payload))
            + payload
            + sync
        )

    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(_zigzag_encode(len(meta)))
        for k, v in sorted(meta.items()):
            fh.write(_encode_value("string", k))
            fh.write(_encode_value("bytes", v))
        fh.write(_zigzag_encode(0))  # metadata map terminator
        fh.write(sync)
        block = []
        for row in rows:
            block.append(row)
            if len(block) >= block_rows:
                fh.write(encode_block(block))
                block = []
        if block:
            fh.write(encode_block(block))


def read_header(path: str) -> tuple[dict, str, bytes, int]:
    """Parse the container header; returns (schema, codec, sync,
    offset of the first data block)."""
    with open(path, "rb") as fh:
        raw = fh.read()
    if raw[:4] != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container")
    buf = io.BytesIO(raw[4:])
    meta = {}
    while True:
        n = _zigzag_decode(buf)
        if n == 0:
            break
        if n < 0:  # negative count form: abs count + byte size
            n = -n
            _zigzag_decode(buf)
        for _ in range(n):
            k = _decode_value("string", buf)
            meta[k] = _decode_value("bytes", buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, 4 + buf.tell()


def read_container(path: str, start: int | None = None, end: int | None = None):
    """Yield row tuples from an Avro object container file, verifying
    the sync marker after every block.

    With (start, end) set, reads only the blocks whose START offset o
    satisfies ``start <= o < end`` — the Hadoop split ownership rule:
    a reader positioned at an arbitrary byte offset scans forward for
    the 16-byte sync marker (scanning from start-16 so a boundary
    landing exactly on ``start`` is owned, not skipped) and decodes
    from the block after it, running PAST ``end`` to finish the last
    owned block. Every block is decoded by exactly one split, so
    concatenating all splits' rows reproduces the file."""
    schema, codec, sync, first = read_header(path)
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    with open(path, "rb") as fh:
        raw = fh.read()
    if start is None or start <= first:
        pos = first
    else:
        hit = raw.find(sync, start - 16)
        if hit < 0:
            return
        pos = hit + 16
    stop = len(raw) if end is None else min(end, len(raw))
    buf = io.BytesIO(raw)
    buf.seek(pos)
    while buf.tell() < len(raw) and buf.tell() < stop:
        count = _zigzag_decode(buf)
        size = _zigzag_decode(buf)
        payload = buf.read(size)
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        if codec == "deflate":
            payload = zlib.decompressobj(-15).decompress(payload)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        pbuf = io.BytesIO(payload)
        for _ in range(count):
            yield tuple(_decode_value(t, pbuf) for _, t in fields)


def plan_splits(path: str, split_bytes: int) -> list[tuple[int, int]]:
    """Chop a container file's data region into ~split_bytes byte
    ranges for independent readers (block boundaries are recovered by
    each reader's own sync scan, so the cut points need no alignment)."""
    _, _, _, first = read_header(path)
    size = os.path.getsize(path)
    if size <= first:
        return []
    cuts = list(range(first, size, max(split_bytes, 1)))
    return [
        (s, e)
        for s, e in zip(cuts, cuts[1:] + [size])
    ]


_AVRO_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


def spark_ddl_of(schema: dict) -> str:
    """Map the flat Avro record schema to a Spark DDL string; a
    ["null", T] union maps to plain (nullable) T."""
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            t = next(b for b in t if b != "null")
        cols.append(f"{f['name']} {_AVRO_TO_SPARK[t]}")
    return ", ".join(cols)


def avro_py_datasource():
    """Build the Spark Python DataSource class lazily (pyspark 4
    public API) — format name "avro_py", option path=<dir of *.avro
    shards>. Partition planning is (file x byte-range): each file's
    data region is chopped into ~splitBytes ranges (default 128 MiB,
    the parquet maxPartitionBytes convention) and each task
    sync-scans to its first owned block — so parallelism scales with
    BYTES, not file count, exactly like Spark's file-based scans."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _RangePart(InputPartition):
        def __init__(self, path: str, start: int, end: int):
            self.path, self.start, self.end = path, start, end

    class _AvroReader(DataSourceReader):
        def __init__(self, directory: str, split_bytes: int):
            self._parts = [
                _RangePart(p, s, e)
                for p in sorted(
                    os.path.join(directory, f)
                    for f in os.listdir(directory)
                    if f.endswith(".avro")
                )
                for s, e in plan_splits(p, split_bytes)
            ]

        def partitions(self):
            return self._parts

        def read(self, part):
            yield from read_container(part.path, part.start, part.end)

    class AvroPyDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "avro_py"

        def schema(self) -> str:
            directory = self.options["path"]
            first = sorted(
                f for f in os.listdir(directory) if f.endswith(".avro")
            )[0]
            hdr_schema, _, _, _ = read_header(os.path.join(directory, first))
            return spark_ddl_of(hdr_schema)

        def reader(self, schema):
            return _AvroReader(
                self.options["path"],
                int(self.options.get("splitBytes", 128 * 1024 * 1024)),
            )

    return AvroPyDataSource
