"""Polaris/REST-catalog read seam: scan planning through externally-served
Iceberg metadata (VERDICT r2 'Next round' #9).

A fake in-process REST server (stdlib http.server) serves the Iceberg REST
catalog read endpoints over the metadata of a REAL local IcebergTable — the
same LoadTableResponse shape Polaris returns (reference consumes it via
PyIceberg, catalog/iceberg.py:41-52). The test proves the full chain: REST
lookup -> metadata -> manifest-list -> manifests -> parquet scan, including
manifest-bound file skipping, with zero filesystem metadata access."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from universql_spark.catalogs import CatalogIcebergTable, RestCatalogClient
from universql_spark.iceberg_format import IcebergTable


@pytest.fixture(scope="module")
def served_table(spark, tmp_path_factory):
    """(uri, IcebergTable): a real clustered Iceberg table + a fake REST
    catalog serving its CURRENT metadata.json body."""
    root = str(tmp_path_factory.mktemp("rest") / "t")
    # 4 range slices -> 4 data files with disjoint id bounds (the manifest
    # records per-file column bounds, so id predicates skip whole files)
    df = spark.range(0, 100, 1, 4).select(
        "id", (F.col("id") % 10).alias("g"), (F.col("id") * 1.5).alias("v")
    )
    t = IcebergTable.create(root, df)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.path == "/v1/config":
                body = {"defaults": {}, "overrides": {}}
            elif self.path == "/v1/namespaces/ns/tables/t":
                _v, meta = t._read_metadata()
                body = {"metadata-location": t._version_path(_v), "metadata": meta}
            else:
                self.send_response(404)
                self.end_headers()
                return
            raw = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def log_message(self, *a):  # silence
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", t
    srv.shutdown()


def test_rest_client_load_table(served_table):
    uri, t = served_table
    client = RestCatalogClient(uri)
    assert client.config() == {"defaults": {}, "overrides": {}}
    resp = client.load_table("ns", "t")
    assert resp["metadata-location"].endswith(".metadata.json")
    assert "snapshots" in resp["metadata"]


def test_catalog_table_scan_and_pruning(spark, served_table):
    uri, local = served_table
    ext = CatalogIcebergTable.from_rest(uri, "ns", "t")
    # full scan through REST-served metadata matches the local table
    assert ext.read(spark).count() == 100
    assert sorted(ext.current_files()) == sorted(local.current_files())
    # manifest-bound file skipping works through the seam: an id-range
    # predicate on the clustered column prunes to a file subset
    cand = ext._candidate_files("id < 10")
    assert cand is not None and 0 < len(cand) < len(ext.current_files())


def test_catalog_table_sees_catalog_refresh(spark, served_table):
    """A commit through the OWNING side is visible on the next lookup —
    PyIceberg's refresh contract, no caching staleness."""
    uri, local = served_table
    ext = CatalogIcebergTable.from_rest(uri, "ns", "t")
    before = ext.read(spark).count()
    local.append(
        spark.range(1000, 1010).select(
            "id", (F.col("id") % 10).alias("g"), (F.col("id") * 1.5).alias("v")
        )
    )
    assert ext.read(spark).count() == before + 10


def test_catalog_table_refuses_writes(spark, served_table):
    uri, _ = served_table
    ext = CatalogIcebergTable.from_rest(uri, "ns", "t")
    with pytest.raises(NotImplementedError):
        ext.append(spark.range(3).select("id", F.lit(1).alias("g"), F.lit(1.0).alias("v")))


def test_engine_registers_external_iceberg(spark, served_table):
    from universql_spark.engine import Engine

    uri, _ = served_table
    eng = Engine(spark=spark)
    eng.register_external_iceberg("ext_t", uri, "ns", "t")
    out = eng.execute("SELECT COUNT(*) AS c, CAST(SUM(g) AS BIGINT) AS sg FROM ext_t WHERE id < 50")
    row = out.to_pylist()[0]
    assert row["c"] == 50 and row["sg"] == sum(i % 10 for i in range(50))


@pytest.fixture(scope="module")
def writeback_server():
    """A fake REST catalog with the REGISTER endpoint: POST
    /v1/namespaces/{ns}/register records {name: metadata-location}; GET
    /v1/namespaces/{ns}/tables/{t} then serves the registered metadata
    straight from that location (what Polaris does after registration)."""
    registered: dict[str, str] = {}

    class Handler(BaseHTTPRequestHandler):
        def _send(self, body: dict, code: int = 200):
            raw = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def do_POST(self):  # noqa: N802
            if self.path == "/v1/namespaces/ns/register":
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n).decode())
                registered[req["name"]] = req["metadata-location"]
                self._send({"metadata-location": req["metadata-location"]})
            else:
                self.send_response(404)
                self.end_headers()

        def do_GET(self):  # noqa: N802
            if self.path == "/v1/config":
                self._send({"defaults": {}, "overrides": {}})
                return
            parts = self.path.split("/")
            if len(parts) == 6 and parts[1:4] == ["v1", "namespaces", "ns"] and parts[4] == "tables":
                loc = registered.get(parts[5])
                if loc:
                    with open(loc) as f:
                        self._send({"metadata-location": loc, "metadata": json.load(f)})
                    return
            self.send_response(404)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", registered
    srv.shutdown()


def test_catalog_writeback_roundtrip(spark, writeback_server, tmp_path):
    """VERDICT r3 'Next round' #4: a table created by the engine appears in
    the external catalog and round-trips back through CatalogIcebergTable —
    the reference's create-then-register flow (warehouse/snowflake.py:73-88)
    over the REST register endpoint."""
    import os

    from universql_spark.engine import Engine

    uri, registered = writeback_server
    eng = Engine(spark=spark)
    eng.enable_rest_catalog_sync(uri, "ns")
    spark.range(25).selectExpr("id", "concat('N', id) AS nm").createOrReplaceTempView(
        "wb_src"
    )
    eng.execute("CREATE OR REPLACE ICEBERG TABLE wb_t AS SELECT id, nm FROM wb_src")
    assert "wb_t" in registered
    assert os.path.exists(registered["wb_t"])  # durable metadata, not a temp
    # round-trip: a SECOND engine resolves the table via the catalog alone
    ext = CatalogIcebergTable.from_rest(uri, "ns", "wb_t")
    assert ext.read(spark).count() == 25
    # a local commit + re-register refreshes what the catalog serves
    t = eng.snap_tables["wb_t"]
    t.append(spark.createDataFrame([(99, "X")], schema=t.read(spark).schema))
    eng.catalog_sync("wb_t", t._version_path(t.current_version()))
    assert ext.read(spark).count() == 26
