"""Third-party Iceberg interop via golden files (VERDICT r3 'Next round' #5).

No external Iceberg engine ships in this container, so interop is proven
with a TEST-LOCAL, independently-written Avro object-container codec
(`_GoldenAvro`, built directly from the public Avro 1.11 spec — zigzag
varints, blocks, sync markers; it shares no code with
`universql_spark.avro_io`) plus golden metadata authored the way a real
engine writes it:

- reader direction: a complete v2 chain (version-hint -> metadata.json ->
  manifest-list -> manifest -> parquet) is authored by the independent
  codec using the SPEC-COMPLETE schemas — including the optional stats
  fields our own writer never emits (column_sizes, value_counts,
  split_offsets, sort_order_id, key_metadata, field_summary partitions) and
  the deflate codec. Our IcebergTable must scan it and prune on bounds.
- writer direction: a table written by OUR writer is decoded with the
  independent codec only, and its manifest-list/manifest records are
  checked field-for-field against the spec's required fields.

Spec references: Iceberg Table Spec v2 ("Manifests" field-ids 100-142,
"Manifest Lists" 500-519), Avro 1.11 object container files.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

from universql_spark.iceberg_format import IcebergTable

# ---------------------------------------------------------------------------
# independent Avro codec (spec-driven, no shared code with avro_io)
# ---------------------------------------------------------------------------


class _GoldenAvro:
    MAGIC = b"Obj\x01"
    SYNC = bytes(range(16))  # fixed marker: determinism beats randomness here

    # -- primitive encoders ------------------------------------------------
    @staticmethod
    def _zigzag(n: int) -> bytes:
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

    @classmethod
    def _enc(cls, schema, value) -> bytes:
        if isinstance(schema, list):  # union: branch index + branch value
            if value is None and "null" in schema:
                return cls._zigzag(schema.index("null"))
            branch = next(
                (i, s) for i, s in enumerate(schema) if s != "null"
            )
            return cls._zigzag(branch[0]) + cls._enc(branch[1], value)
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                return b"".join(
                    cls._enc(f["type"], value.get(f["name"])) for f in schema["fields"]
                )
            if t == "array":
                if not value:
                    return cls._zigzag(0)
                body = b"".join(cls._enc(schema["items"], v) for v in value)
                return cls._zigzag(len(value)) + body + cls._zigzag(0)
            if t == "map":
                if not value:
                    return cls._zigzag(0)
                body = b"".join(
                    cls._enc("string", k) + cls._enc(schema["values"], v)
                    for k, v in value.items()
                )
                return cls._zigzag(len(value)) + body + cls._zigzag(0)
            return cls._enc(t, value)  # {"type": "int", "logicalType": ...}
        if schema == "null":
            return b""
        if schema == "boolean":
            return b"\x01" if value else b"\x00"
        if schema in ("int", "long"):
            return cls._zigzag(int(value))
        if schema == "float":
            return struct.pack("<f", value)
        if schema == "double":
            return struct.pack("<d", value)
        if schema in ("string", "bytes"):
            raw = value.encode() if isinstance(value, str) else bytes(value)
            return cls._zigzag(len(raw)) + raw
        raise AssertionError(f"golden encoder: unsupported {schema!r}")

    @classmethod
    def write(cls, path, schema: dict, records: list[dict], codec: str = "null"):
        body = b"".join(cls._enc(schema, r) for r in records)
        if codec == "deflate":
            body = zlib.compress(body)[2:-1]  # raw deflate per avro spec
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        buf = bytearray(cls.MAGIC)
        buf += cls._zigzag(len(meta))
        for k, v in meta.items():
            buf += cls._enc("string", k) + cls._enc("bytes", v)
        buf += cls._zigzag(0)
        buf += cls.SYNC
        buf += cls._zigzag(len(records)) + cls._zigzag(len(body)) + body + cls.SYNC
        with open(path, "wb") as f:
            f.write(bytes(buf))

    # -- decoder (for verifying OUR writer's output independently) ---------
    @classmethod
    def _dec(cls, schema, buf: bytes, pos: int):
        if isinstance(schema, list):
            idx, pos = cls._dec("long", buf, pos)
            return cls._dec(schema[idx], buf, pos)
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                out = {}
                for f in schema["fields"]:
                    out[f["name"]], pos = cls._dec(f["type"], buf, pos)
                return out, pos
            if t == "array":
                items = []
                while True:
                    n, pos = cls._dec("long", buf, pos)
                    if n == 0:
                        return items, pos
                    if n < 0:  # block with byte size prefix
                        _sz, pos = cls._dec("long", buf, pos)
                        n = -n
                    for _ in range(n):
                        v, pos = cls._dec(schema["items"], buf, pos)
                        items.append(v)
            if t == "map":
                out = {}
                while True:
                    n, pos = cls._dec("long", buf, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:
                        _sz, pos = cls._dec("long", buf, pos)
                        n = -n
                    for _ in range(n):
                        k, pos = cls._dec("string", buf, pos)
                        out[k], pos = cls._dec(schema["values"], buf, pos)
            return cls._dec(t, buf, pos)
        if schema == "null":
            return None, pos
        if schema == "boolean":
            return buf[pos] == 1, pos + 1
        if schema in ("int", "long"):
            shift = u = 0
            while True:
                b = buf[pos]
                pos += 1
                u |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            return (u >> 1) ^ -(u & 1), pos
        if schema == "float":
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
        if schema == "double":
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
        if schema in ("string", "bytes"):
            n, pos = cls._dec("long", buf, pos)
            raw = buf[pos : pos + n]
            return (raw.decode() if schema == "string" else bytes(raw)), pos + n
        raise AssertionError(f"golden decoder: unsupported {schema!r}")

    @classmethod
    def read(cls, path) -> tuple[dict, list[dict]]:
        buf = open(path, "rb").read()
        assert buf[:4] == cls.MAGIC
        pos = 4
        meta = {}
        while True:
            n, pos = cls._dec("long", buf, pos)
            if n == 0:
                break
            if n < 0:
                _sz, pos = cls._dec("long", buf, pos)
                n = -n
            for _ in range(n):
                k, pos = cls._dec("string", buf, pos)
                meta[k], pos = cls._dec("bytes", buf, pos)
        schema = json.loads(meta["avro.schema"])
        codec = meta.get("avro.codec", b"null").decode()
        sync = buf[pos : pos + 16]
        pos += 16
        records = []
        while pos < len(buf):
            cnt, pos = cls._dec("long", buf, pos)
            size, pos = cls._dec("long", buf, pos)
            block = buf[pos : pos + size]
            pos += size
            assert buf[pos : pos + 16] == sync
            pos += 16
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            elif codec == "snappy":
                import snappy  # pragma: no cover

                block = snappy.decompress(block[:-4])
            bp = 0
            for _ in range(cnt):
                rec, bp = cls._dec(schema, block, bp)
                records.append(rec)
        return schema, records


# ---------------------------------------------------------------------------
# spec-complete golden schemas (richer than our writer's: all optional
# stats fields a Java/Spark writer emits)
# ---------------------------------------------------------------------------


def _kv_array(name, fid, kid, vid, vtype="bytes"):
    return {
        "name": name,
        "type": ["null", {
            "type": "array",
            "items": {
                "type": "record",
                "name": f"k{kid}_v{vid}",
                "fields": [
                    {"name": "key", "type": "int", "field-id": kid},
                    {"name": "value", "type": vtype, "field-id": vid},
                ],
            },
        }],
        "field-id": fid,
        "default": None,
    }


GOLDEN_DATA_FILE = {
    "type": "record",
    "name": "r2",
    "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition",
         "type": {"type": "record", "name": "r102", "fields": []},
         "field-id": 102},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        _kv_array("column_sizes", 108, 117, 118, "long"),
        _kv_array("value_counts", 109, 119, 120, "long"),
        _kv_array("null_value_counts", 110, 121, 122, "long"),
        _kv_array("nan_value_counts", 137, 138, 139, "long"),
        _kv_array("lower_bounds", 125, 126, 127),
        _kv_array("upper_bounds", 128, 129, 130),
        {"name": "key_metadata", "type": ["null", "bytes"], "field-id": 131,
         "default": None},
        {"name": "split_offsets",
         "type": ["null", {"type": "array", "items": "long", "element-id": 133}],
         "field-id": 132, "default": None},
        {"name": "equality_ids",
         "type": ["null", {"type": "array", "items": "int", "element-id": 136}],
         "field-id": 135, "default": None},
        {"name": "sort_order_id", "type": ["null", "int"], "field-id": 140,
         "default": None},
    ],
}

GOLDEN_MANIFEST_ENTRY = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"], "field-id": 4},
        {"name": "data_file", "type": GOLDEN_DATA_FILE, "field-id": 2},
    ],
}

GOLDEN_MANIFEST_FILE = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {"name": "partitions",
         "type": ["null", {"type": "array", "items": {
             "type": "record", "name": "r508", "fields": [
                 {"name": "contains_null", "type": "boolean", "field-id": 509},
                 {"name": "contains_nan", "type": ["null", "boolean"],
                  "field-id": 518, "default": None},
                 {"name": "lower_bound", "type": ["null", "bytes"],
                  "field-id": 510, "default": None},
                 {"name": "upper_bound", "type": ["null", "bytes"],
                  "field-id": 511, "default": None},
             ]}, "element-id": 508}],
         "field-id": 507, "default": None},
        {"name": "key_metadata", "type": ["null", "bytes"], "field-id": 519,
         "default": None},
    ],
}


def _long_le(v: int) -> bytes:
    """Iceberg single-value serialization for long bounds: 8-byte LE."""
    return struct.pack("<q", v)


def _author_golden_table(root: str) -> tuple[str, int]:
    """Author a spec-conformant v2 table the way a real engine lays it out.
    Two data files with disjoint id ranges (bounds enable file skipping)."""
    meta_dir = os.path.join(root, "metadata")
    data_dir = os.path.join(root, "data")
    os.makedirs(meta_dir)
    os.makedirs(data_dir)

    files = []
    for lo, hi in ((0, 50), (50, 100)):
        path = os.path.join(data_dir, f"golden-{lo}.parquet")
        pq.write_table(
            pa.table({
                "id": pa.array(range(lo, hi), pa.int64()),
                "cat": pa.array([f"c{i % 5}" for i in range(lo, hi)]),
                "v": pa.array([i * 1.5 for i in range(lo, hi)], pa.float64()),
            }),
            path,
        )
        files.append((path, lo, hi))

    manifest_path = os.path.join(meta_dir, "golden-m0.avro")
    entries = [
        {
            "status": 1,
            "snapshot_id": 4910234,
            "sequence_number": 1,
            "file_sequence_number": 1,
            "data_file": {
                "content": 0,
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": hi - lo,
                "file_size_in_bytes": os.path.getsize(path),
                # full stats block, like a Java writer:
                "column_sizes": [{"key": 1, "value": 400}],
                "value_counts": [{"key": 1, "value": hi - lo}],
                "null_value_counts": [{"key": 1, "value": 0}],
                "nan_value_counts": [],
                "lower_bounds": [{"key": 1, "value": _long_le(lo)}],
                "upper_bounds": [{"key": 1, "value": _long_le(hi - 1)}],
                "key_metadata": None,
                "split_offsets": [4],
                "equality_ids": None,
                "sort_order_id": 0,
            },
        }
        for path, lo, hi in files
    ]
    _GoldenAvro.write(manifest_path, GOLDEN_MANIFEST_ENTRY, entries, codec="deflate")

    mlist_path = os.path.join(meta_dir, "snap-4910234-1-golden.avro")
    _GoldenAvro.write(mlist_path, GOLDEN_MANIFEST_FILE, [{
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": 1,
        "min_sequence_number": 1,
        "added_snapshot_id": 4910234,
        "added_files_count": 2,
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": 100,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": [],
        "key_metadata": None,
    }])

    metadata = {
        "format-version": 2,
        "table-uuid": "0f8ed3b3-5ab6-4e6f-8951-6a2e3ed26c50",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": 1700000000000,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [{
            "type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "id", "required": True, "type": "long"},
                {"id": 2, "name": "cat", "required": False, "type": "string"},
                {"id": 3, "name": "v", "required": False, "type": "double"},
            ],
        }],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": 4910234,
        "snapshots": [{
            "snapshot-id": 4910234,
            "timestamp-ms": 1700000000000,
            "sequence-number": 1,
            "summary": {"operation": "append"},
            "manifest-list": mlist_path,
            "schema-id": 0,
        }],
        "snapshot-log": [
            {"snapshot-id": 4910234, "timestamp-ms": 1700000000000}
        ],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        json.dump(metadata, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")
    return root, 100


# ---------------------------------------------------------------------------
# reader direction
# ---------------------------------------------------------------------------


def test_reader_scans_golden_chain(spark, tmp_path):
    root, n = _author_golden_table(str(tmp_path / "golden"))
    t = IcebergTable(root)
    df = t.read(spark)
    assert df.count() == n
    got = {r["id"]: (r["cat"], r["v"]) for r in df.collect()}
    assert got[7] == ("c2", 10.5) and got[99] == ("c4", 148.5)


def test_reader_prunes_on_golden_bounds(spark, tmp_path):
    """The golden manifest's lower/upper bounds (Iceberg single-value
    serialization, authored independently) must drive file skipping."""
    root, _ = _author_golden_table(str(tmp_path / "goldenp"))
    t = IcebergTable(root)
    assert len(t.current_files()) == 2
    cand = t._candidate_files("id < 10")
    assert cand is not None and len(cand) == 1


def test_golden_codec_is_self_consistent(tmp_path):
    """Sanity for the harness itself: independent encode -> independent
    decode round-trips (so a reader pass is not two bugs cancelling)."""
    p = str(tmp_path / "rt.avro")
    recs = [{"status": 1, "snapshot_id": 5, "sequence_number": None,
             "file_sequence_number": 1,
             "data_file": {
                 "content": 0, "file_path": "x", "file_format": "PARQUET",
                 "partition": {}, "record_count": 3, "file_size_in_bytes": 9,
                 "column_sizes": None, "value_counts": None,
                 "null_value_counts": None, "nan_value_counts": None,
                 "lower_bounds": [{"key": 1, "value": b"\x01"}],
                 "upper_bounds": None, "key_metadata": None,
                 "split_offsets": None, "equality_ids": [1],
                 "sort_order_id": None,
             }}]
    _GoldenAvro.write(p, GOLDEN_MANIFEST_ENTRY, recs, codec="deflate")
    schema, back = _GoldenAvro.read(p)
    assert back == recs


# ---------------------------------------------------------------------------
# writer direction
# ---------------------------------------------------------------------------

REQUIRED_MANIFEST_FILE_FIELDS = [
    "manifest_path", "manifest_length", "partition_spec_id", "content",
    "sequence_number", "min_sequence_number", "added_snapshot_id",
    "added_files_count", "existing_files_count", "deleted_files_count",
    "added_rows_count", "existing_rows_count", "deleted_rows_count",
]

REQUIRED_DATA_FILE_FIELDS = [
    "content", "file_path", "file_format", "partition", "record_count",
    "file_size_in_bytes",
]


def test_our_writer_decodes_independently(spark, tmp_path):
    """Our writer's Avro + metadata, verified with the INDEPENDENT decoder
    only: spec-required fields present with consistent values."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "ours")
    df = spark.range(0, 40, 1, 2).select("id", (F.col("id") % 4).alias("g"))
    t = IcebergTable.create(root, df)

    v, meta = t._read_metadata()
    assert meta["format-version"] == 2
    snap = meta["snapshots"][-1]
    schema, mfiles = _GoldenAvro.read(snap["manifest-list"])
    assert mfiles, "manifest list decodes independently"
    by_name = {f["name"] for f in schema["fields"]}
    for req in REQUIRED_MANIFEST_FILE_FIELDS:
        assert req in by_name, f"manifest-list field {req} missing"
    total_rows = 0
    for mf in mfiles:
        assert os.path.getsize(mf["manifest_path"]) == mf["manifest_length"]
        eschema, entries = _GoldenAvro.read(mf["manifest_path"])
        dfschema = next(
            f["type"] for f in eschema["fields"] if f["name"] == "data_file"
        )
        df_names = {f["name"] for f in dfschema["fields"]}
        for req in REQUIRED_DATA_FILE_FIELDS:
            assert req in df_names, f"data_file field {req} missing"
        for e in entries:
            d = e["data_file"]
            assert os.path.exists(d["file_path"])
            assert d["file_size_in_bytes"] == os.path.getsize(d["file_path"])
            assert d["record_count"] == pq.ParquetFile(d["file_path"]).metadata.num_rows
            total_rows += d["record_count"]
    assert total_rows == 40
    # field-ids ride the schema (required for spec-conformant evolution)
    assert all("field-id" in f for f in schema["fields"])


def test_our_bounds_match_spec_serialization(spark, tmp_path):
    """Our writer's lower/upper bounds use the spec's single-value binary
    serialization (long = 8-byte little-endian) — decoded independently."""
    root = str(tmp_path / "bounds")
    df = spark.range(10, 20, 1, 1).selectExpr("id")
    t = IcebergTable.create(root, df)
    _v, meta = t._read_metadata()
    _s, mfiles = _GoldenAvro.read(meta["snapshots"][-1]["manifest-list"])
    _es, entries = _GoldenAvro.read(mfiles[0]["manifest_path"])
    d = entries[0]["data_file"]
    lower = {b["key"]: b["value"] for b in d["lower_bounds"]}
    upper = {b["key"]: b["value"] for b in d["upper_bounds"]}
    id_field = next(
        f for f in meta["schemas"][0]["fields"] if f["name"] == "id"
    )
    assert struct.unpack("<q", lower[id_field["id"]])[0] == 10
    assert struct.unpack("<q", upper[id_field["id"]])[0] == 19
