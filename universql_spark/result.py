"""Result contract: Arrow normalization + Snowflake-style column metadata.

The reference re-types every DuckDB Arrow result so Snowflake clients accept
it (protocol/utils.py:137-249): decimals become decimal128(38,0)-ish ints,
dates date32, timestamps a {epoch, fraction} struct, ARRAY columns JSON text,
and each column gets rowtype metadata (protocol/snowflake.py:158-179). This
module is the Spark twin: DataFrame/Arrow in, (arrow table, rowtype list)
out. The driver's oracle compare doesn't need the wire shapes, so the full
struct-timestamp encoding is opt-in (`wire=True`).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

# Arrow type -> Snowflake type name (reverse of protocol/utils.py:22-135)
_SNOWFLAKE_TYPE: list[tuple[Any, str]] = []


def _sf_type(t: pa.DataType) -> tuple[str, dict]:
    """-> (snowflake type name, extra metadata) for one arrow type."""
    if pa.types.is_boolean(t):
        return "BOOLEAN", {}
    if pa.types.is_integer(t):
        return "FIXED", {"precision": 38, "scale": 0}
    if pa.types.is_decimal(t):
        return "FIXED", {"precision": t.precision, "scale": t.scale}
    if pa.types.is_floating(t):
        return "REAL", {}
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "TEXT", {"length": 16 * 1024 * 1024}
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BINARY", {"length": 8 * 1024 * 1024}
    if pa.types.is_date(t):
        return "DATE", {}
    if pa.types.is_timestamp(t):
        return ("TIMESTAMP_TZ" if t.tz else "TIMESTAMP_NTZ"), {"precision": 0, "scale": 9}
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "ARRAY", {}
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return "OBJECT", {}
    if pa.types.is_time(t):
        return "TIME", {"precision": 0, "scale": 9}
    return "TEXT", {}


def rowtype(table: pa.Table) -> list[dict]:
    """Snowflake-style rowtype metadata for a result (snowflake.py:158-179)."""
    out = []
    for field in table.schema:
        name, extra = _sf_type(field.type)
        out.append(
            {
                "name": field.name,
                "type": name.lower(),
                "nullable": field.nullable,
                "length": extra.get("length"),
                "precision": extra.get("precision"),
                "scale": extra.get("scale"),
            }
        )
    return out


def normalize(table: pa.Table, wire: bool = False) -> pa.Table:
    """Canonical client-facing arrow table.

    Always: ARRAY/OBJECT columns -> JSON text (the reference serializes list
    columns via to_json, protocol/utils.py:231-240); large_* downcast.
    wire=True additionally packs timestamps into Snowflake's
    {epoch:int64, fraction:int32} struct (protocol/utils.py:173-199).
    """
    import json

    cols: list[pa.ChunkedArray | pa.Array] = []
    fields: list[pa.Field] = []
    for i, field in enumerate(table.schema):
        col = table.column(i)
        t = field.type
        if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_struct(t) or pa.types.is_map(t):
            data = [None if v is None else json.dumps(v, default=str) for v in col.to_pylist()]
            col, t = pa.array(data, type=pa.utf8()), pa.utf8()
        elif pa.types.is_large_string(t):
            col, t = col.cast(pa.utf8()), pa.utf8()
        elif wire and pa.types.is_timestamp(t):
            epochs, fracs = [], []
            for v in col.to_pylist():
                if v is None:
                    epochs.append(None)
                    fracs.append(None)
                else:
                    epochs.append(int(v.timestamp()))
                    fracs.append(v.microsecond * 1000)
            t = pa.struct([pa.field("epoch", pa.int64()), pa.field("fraction", pa.int32())])
            col = pa.StructArray.from_arrays(
                [pa.array(epochs, pa.int64()), pa.array(fracs, pa.int32())],
                fields=list(t),
            )
        cols.append(col)
        fields.append(pa.field(field.name, t, field.nullable))
    return pa.table(cols, schema=pa.schema(fields))


def json_rowset(table: pa.Table) -> list[list]:
    """Snowflake JSON result-format rowset (VERDICT r8 #8).

    Older clients and every multi-statement PARENT response use
    queryResultFormat=json: `rowset` is a list of rows whose cells are
    all strings (or null), decoded client-side by rowtype — encodings per
    the public snowflake-connector-python converters: FIXED/REAL decimal
    text, BOOLEAN '1'/'0', DATE epoch-days text, TIMESTAMP_*
    'seconds.nanoseconds' text, BINARY hex, everything else raw text."""
    import datetime as _dt

    rt = rowtype(table)
    cols: list[list] = []
    for i, field in enumerate(table.schema):
        t = rt[i]["type"]
        enc: list = []
        for v in table.column(i).to_pylist():
            if v is None:
                enc.append(None)
            elif t == "boolean":
                enc.append("1" if v else "0")
            elif t == "date":
                enc.append(str((v - _dt.date(1970, 1, 1)).days))
            elif t.startswith("timestamp"):
                if isinstance(v, _dt.datetime):
                    if v.tzinfo is not None:
                        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                    delta = v - _dt.datetime(1970, 1, 1)
                    micros = delta.days * 86_400_000_000 + delta.seconds * 1_000_000 + delta.microseconds
                    # Sign and magnitude separately: divmod on negative micros
                    # folds pre-1970 instants the wrong way (-0.999999 s would
                    # encode as '-1.000001000', which decimal-parses as
                    # -1.000001 s). '-0.999999000' is the correct decimal text.
                    sign = "-" if micros < 0 else ""
                    sec, frac = divmod(abs(micros), 1_000_000)
                    tok = f"{sign}{sec}.{frac * 1000:09d}"
                    if t == "timestamp_tz":
                        # The connector's JSON TIMESTAMP_TZ converter does
                        # encoded_value.split() expecting 'epoch offset' where
                        # offset = tz minutes + 1440; values are UTC-normalized
                        # above, so the offset token is always 1440.
                        tok = f"{tok} 1440"
                    enc.append(tok)
                else:
                    enc.append(str(v))
            elif t == "binary":
                enc.append(v.hex() if isinstance(v, (bytes, bytearray)) else str(v))
            else:
                enc.append(str(v))
        cols.append(enc)
    return [list(row) for row in zip(*cols)] if cols else []
