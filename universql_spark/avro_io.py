"""Avro Object Container File reader without the spark-avro jar.

The container ships neither spark-avro nor any Python avro package, so this
is a from-the-spec implementation (Apache Avro 1.11 spec, "Object Container
Files" + "Binary Encoding") covering the subset COPY INTO loads use:

- codecs: null, deflate (raw zlib), snappy (from-format-spec pure-Python
  block decoder + CRC32 frame check)
- types: null, boolean, int, long, float, double, bytes, string, record,
  array, map, fixed, enum, and unions (decoded by branch index — the
  ubiquitous ["null", T] nullable pattern included)
- logical types date / timestamp-millis / timestamp-micros surface as
  Spark DATE / TIMESTAMP.

Distribution shape: `spark.read.format("binaryFile")` lists and ships one
row per .avro file (parallel by file — the natural Avro unit, since blocks
are delimited by per-file sync markers), and an Arrow-batched mapInPandas
kernel walks each file's blocks. The writer schema is parsed once on the
driver from the first file's header (a few hundred bytes) and broadcast via
closure. Finer-than-file splits would seek sync markers inside blocks; at
COPY granularity (many files) file-parallelism is the right unit.

Reference surface: plugins/snow.py:302,318-323 maps COPY's avro format to
DuckDB's read_avro; copy_into.py routes here when the jar is absent.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary decoding primitives
# ---------------------------------------------------------------------------


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    """Zigzag varint -> (value, next_pos)."""
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    return buf[pos : pos + n], pos + n


def _decode(schema: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    """One datum of `schema` at buf[pos:] -> (python value, next_pos)."""
    if isinstance(schema, str):
        kind = schema
    elif isinstance(schema, list):  # union: branch index then branch datum
        idx, pos = _read_long(buf, pos)
        return _decode(schema[idx], buf, pos)
    else:
        kind = schema["type"]

    if kind == "null":
        return None, pos
    if kind == "boolean":
        return buf[pos] == 1, pos + 1
    if kind in ("int", "long"):
        return _read_long(buf, pos)
    if kind == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if kind == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if kind == "bytes":
        return _read_bytes(buf, pos)
    if kind == "string":
        b, pos = _read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if kind == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode(f["type"], buf, pos)
        return rec, pos
    if kind == "array":
        out = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = _decode(schema["items"], buf, pos)
                out.append(v)
        return out, pos
    if kind == "map":
        out = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                kb, pos = _read_bytes(buf, pos)
                out[kb.decode("utf-8")], pos = _decode(schema["values"], buf, pos)
        return out, pos
    if kind == "fixed":
        n = schema["size"]
        return buf[pos : pos + n], pos + n
    if kind == "enum":
        idx, pos = _read_long(buf, pos)
        return schema["symbols"][idx], pos
    raise ValueError(f"unsupported avro type: {kind}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def parse_header(buf: bytes) -> tuple[dict, str, bytes, int]:
    """-> (writer schema, codec, sync marker, data start offset)."""
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta, pos = _decode({"type": "map", "values": "bytes"}, buf, 4)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf[pos : pos + 16]
    return schema, codec, sync, pos + 16


def _snappy_decompress(data: bytes) -> bytes:
    """Raw snappy block format (public format description: a varint
    uncompressed length, then tagged elements — 00 literal, 01/10/11
    back-reference copies with 1/2/4-byte little-endian offsets)."""
    pos, n, shift = 0, 0, 0
    while True:
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # length stored in the next (ln-59) bytes
                nb = ln - 59
                ln = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            ln += 1
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        start = len(out) - off
        for i in range(ln):  # byte-wise: copies may overlap their output
            out.append(out[start + i])
    if len(out) != n:
        raise ValueError(f"snappy: expected {n} bytes, got {len(out)}")
    return bytes(out)


def _snappy_compress(data: bytes) -> bytes:
    """Minimal VALID snappy encoder: one all-literal element. Every snappy
    decoder accepts it (compression ratio 1; used for fixtures/parity)."""
    n = len(data)
    header = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        header.append(b | 0x80 if n else b)
        if not n:
            break
    if not data:
        # uncompressed-length 0, no elements — the valid empty stream
        # (an empty avro block body, found by the hypothesis roundtrip)
        return bytes(header)
    ln = len(data) - 1
    if ln < 60:
        tag = bytes([ln << 2])
    else:
        nb = (ln.bit_length() + 7) // 8
        tag = bytes([(59 + nb) << 2]) + ln.to_bytes(nb, "little")
    return bytes(header) + tag + data


def _iter_records(buf: bytes, schema: dict, codec: str, start: int):
    pos, len_buf = start, len(buf)
    while pos < len_buf:
        count, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        block = buf[pos : pos + size]
        pos += size + 16  # skip sync marker
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec == "snappy":
            # avro frames snappy blocks with a trailing big-endian CRC32
            # of the UNCOMPRESSED data
            crc = int.from_bytes(block[-4:], "big")
            block = _snappy_decompress(block[:-4])
            if zlib.crc32(block) & 0xFFFFFFFF != crc:
                raise ValueError("snappy block CRC mismatch")
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec}")
        bpos = 0
        for _ in range(count):
            rec, bpos = _decode(schema, block, bpos)
            yield rec


def _spark_type(schema: Any) -> T.DataType:
    if isinstance(schema, list):  # nullable union
        branches = [s for s in schema if s != "null"]
        if len(branches) != 1:
            return T.StringType()  # heterogeneous union -> JSON text
        return _spark_type(branches[0])
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt == "date":
            return T.DateType()
        if lt in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType()
        kind = schema["type"]
        if kind == "array":
            return T.ArrayType(_spark_type(schema["items"]))
        if kind == "map":
            return T.MapType(T.StringType(), _spark_type(schema["values"]))
        if kind == "record":
            return T.StructType(
                [T.StructField(f["name"], _spark_type(f["type"])) for f in schema["fields"]]
            )
        if kind in ("fixed",):
            return T.BinaryType()
        if kind == "enum":
            return T.StringType()
        schema = kind
    return {
        "null": T.NullType(),
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }[schema]


def _convert_logical(rec: dict, schema: dict) -> dict:
    """Apply logical-type conversions the decoder left as raw ints."""
    import datetime as dt

    for f in schema["fields"]:
        ft, v = f["type"], rec.get(f["name"])
        if v is None:
            continue
        if isinstance(ft, list):
            branches = [s for s in ft if s != "null"]
            ft = branches[0] if len(branches) == 1 else None
        if isinstance(ft, dict):
            lt = ft.get("logicalType")
            if lt == "date":
                rec[f["name"]] = dt.date(1970, 1, 1) + dt.timedelta(days=v)
            elif lt == "timestamp-millis":
                rec[f["name"]] = dt.datetime.fromtimestamp(v / 1e3, dt.timezone.utc).replace(tzinfo=None)
            elif lt == "timestamp-micros":
                rec[f["name"]] = dt.datetime.fromtimestamp(v / 1e6, dt.timezone.utc).replace(tzinfo=None)
    return rec


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read: one task per file, Arrow-batched decode."""
    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"no avro files at {path}")
    schema, _codec, _sync, _start = parse_header(bytes(first[0][0]))
    out_schema = _spark_type(schema)
    if not isinstance(out_schema, T.StructType):
        raise ValueError("top-level avro schema must be a record")

    def kernel(batches):
        import pandas as pd

        for batch in batches:
            for content in batch["content"]:
                b = bytes(content)
                sch, codec, _s, start = parse_header(b)
                rows = [_convert_logical(r, sch) for r in _iter_records(b, sch, codec, start)]
                yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return files.select("content").mapInPandas(kernel, schema=out_schema)


# ---------------------------------------------------------------------------
# writer (fixture synthesis + COPY-out parity testing; null codec)
# ---------------------------------------------------------------------------


def _write_long(v: int) -> bytes:
    acc = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(schema: Any, v: Any) -> bytes:
    if isinstance(schema, list):
        if v is None and "null" in schema:
            return _write_long(schema.index("null"))
        branch = next(i for i, s in enumerate(schema) if s != "null")
        return _write_long(branch) + _encode(schema[branch], v)
    kind = schema if isinstance(schema, str) else schema["type"]
    if kind == "null":
        return b""
    if kind == "boolean":
        return b"\x01" if v else b"\x00"
    if kind in ("int", "long"):
        return _write_long(int(v))
    if kind == "float":
        return struct.pack("<f", v)
    if kind == "double":
        return struct.pack("<d", v)
    if kind == "bytes":
        return _write_long(len(v)) + v
    if kind == "string":
        b = v.encode("utf-8")
        return _write_long(len(b)) + b
    if kind == "record":
        return b"".join(_encode(f["type"], v[f["name"]]) for f in schema["fields"])
    if kind == "array":
        out = b""
        if v:
            out += _write_long(len(v)) + b"".join(_encode(schema["items"], x) for x in v)
        return out + _write_long(0)
    raise ValueError(f"writer does not support avro type: {kind}")


def write_avro(path: str, schema: dict, records: list[dict], codec: str = "null") -> None:
    sync = b"\x00" * 15 + b"\x01"
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    out = io.BytesIO()
    out.write(MAGIC)
    out.write(_write_long(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out.write(_write_long(len(kb)) + kb + _write_long(len(v)) + v)
    out.write(_write_long(0))
    out.write(sync)
    body = b"".join(_encode(schema, r) for r in records)
    if codec == "deflate":
        body = zlib.compress(body)[2:-4]  # raw deflate: strip zlib header+adler
    elif codec == "snappy":
        body = _snappy_compress(body) + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big")
    elif codec != "null":
        raise ValueError(f"unsupported avro codec: {codec}")
    out.write(_write_long(len(records)) + _write_long(len(body)) + body + sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())
