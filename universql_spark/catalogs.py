"""External Iceberg catalog read path (Polaris/REST seam).

The reference resolves tables through catalogs: Snowflake's
SYSTEM$GET_ICEBERG_TABLE_INFORMATION (`warehouse/snowflake.py:97-111`) or a
Polaris/REST catalog via PyIceberg (`catalog/iceberg.py:41-52`), then scans
the returned metadata location. This module is that seam re-expressed for
our pure-Python Iceberg layer:

- :class:`RestCatalogClient` speaks the read side of the Iceberg REST
  catalog protocol (`GET /v1/config`, `GET /v1/namespaces/{ns}/tables/{t}`)
  with stdlib urllib — the subset Polaris serves for scan planning.
- :class:`CatalogIcebergTable` is an :class:`IcebergTable` whose CURRENT
  metadata comes from an injected lookup callable instead of the local
  version-hint chain — any catalog (REST, a dict, a Snowflake response)
  plugs in as `lambda: metadata_dict`. Reads, scan planning, and manifest
  file-skipping all work unchanged; commits are refused (an external
  catalog owns the commit protocol).
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable

from universql_spark.iceberg_format import IcebergTable


class RestCatalogClient:
    """Minimal Iceberg REST catalog client: the read path plus table
    REGISTRATION (the write-back the reference performs after creating a
    table locally — `warehouse/snowflake.py:73-88` registers the metadata
    location back into Snowflake so both engines resolve the same table)."""

    def __init__(self, uri: str, token: str | None = None, timeout: float = 10.0):
        self.uri = uri.rstrip("/")
        self.token = token
        self.timeout = timeout

    def _request(self, path: str, body: dict | None = None) -> dict:
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(f"{self.uri}{path}", data=data)
        if body is not None:
            req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read().decode())

    def _get(self, path: str) -> dict:
        return self._request(path)

    def config(self) -> dict:
        return self._get("/v1/config")

    def load_table(self, namespace: str, table: str) -> dict:
        """LoadTableResponse: {"metadata-location": ..., "metadata": {...}}."""
        return self._get(f"/v1/namespaces/{namespace}/tables/{table}")

    def table_metadata(self, namespace: str, table: str) -> dict:
        return self.load_table(namespace, table)["metadata"]

    def register_table(
        self, namespace: str, table: str, metadata_location: str
    ) -> dict:
        """Iceberg REST `POST /v1/namespaces/{ns}/register`
        (RegisterTableRequest): point the catalog at an existing
        metadata.json. This is write-back registration, NOT a commit — the
        metadata file must already be durable; the catalog only records its
        location, exactly the reference's post-CTAS sync."""
        return self._request(
            f"/v1/namespaces/{namespace}/register",
            {"name": table, "metadata-location": metadata_location},
        )


class CatalogIcebergTable(IcebergTable):
    """IcebergTable over externally-served metadata (read-only).

    `lookup()` returns the CURRENT Iceberg table metadata (the `metadata`
    body of a REST LoadTableResponse). Every metadata read re-invokes it, so
    a refreshed catalog entry is picked up on the next query — the same
    refresh contract as PyIceberg's `Table.refresh()`.
    """

    def __init__(self, lookup: Callable[[], dict], root: str = ""):
        super().__init__(root)
        self._lookup = lookup

    @classmethod
    def from_rest(
        cls, uri: str, namespace: str, table: str, token: str | None = None
    ) -> "CatalogIcebergTable":
        client = RestCatalogClient(uri, token=token)
        return cls(lambda: client.table_metadata(namespace, table))

    def current_version(self) -> int:  # not hint-file based here
        return int(self._lookup().get("last-sequence-number", 0))

    def _read_metadata(self) -> tuple[int, dict]:
        meta = self._lookup()
        return int(meta.get("last-sequence-number", 0)), meta

    def _commit(self, d: dict) -> bool:
        raise NotImplementedError(
            "external-catalog tables are read-only here: the catalog owns the "
            "commit protocol (Polaris updateTable / Snowflake DML)"
        )

    def _cas_write_version(self, base_v: int, meta: dict) -> bool:
        raise NotImplementedError("external-catalog tables are read-only")

    def _write_files(self, df) -> list[str]:
        # refuse BEFORE any data lands: with the commit path closed, files
        # written first would be orphans in whatever directory `root`
        # resolves to (an empty root means the process CWD)
        raise NotImplementedError("external-catalog tables are read-only")
