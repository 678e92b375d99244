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


# ---------------------------------------------------------------------------
# optimistic COMMIT protocol (VERDICT r4 'Next round' #5)
# ---------------------------------------------------------------------------


def _apply_updates(meta: dict, updates: list[dict]) -> dict:
    """Server-side TableUpdate application — the mini-Polaris. Mirrors the
    Iceberg REST spec's action semantics for the actions our client emits."""
    import copy as _copy
    import time as _time

    m = _copy.deepcopy(meta)
    for u in updates:
        a = u["action"]
        if a == "add-snapshot":
            m.setdefault("snapshots", []).append(u["snapshot"])
            m["last-sequence-number"] = max(
                int(m.get("last-sequence-number", 0)),
                int(u["snapshot"].get("sequence-number", 0)),
            )
            m.setdefault("snapshot-log", []).append(
                {
                    "timestamp-ms": u["snapshot"].get("timestamp-ms", 0),
                    "snapshot-id": u["snapshot"]["snapshot-id"],
                }
            )
        elif a == "remove-snapshots":
            gone = set(u["snapshot-ids"])
            m["snapshots"] = [
                s for s in m.get("snapshots", []) if s["snapshot-id"] not in gone
            ]
        elif a == "add-schema":
            m.setdefault("schemas", []).append(u["schema"])
        elif a == "set-current-schema":
            m["current-schema-id"] = u["schema-id"]
        elif a == "set-snapshot-ref":
            if u["ref-name"] == "main":
                m["current-snapshot-id"] = u["snapshot-id"]
            m.setdefault("refs", {})[u["ref-name"]] = {
                "type": u.get("type", "branch"),
                "snapshot-id": u["snapshot-id"],
            }
        elif a == "remove-snapshot-ref":
            m.get("refs", {}).pop(u["ref-name"], None)
        elif a == "set-properties":
            m.setdefault("properties", {}).update(u["updates"])
        elif a == "remove-properties":
            for k in u["removals"]:
                m.get("properties", {}).pop(k, None)
        else:  # unknown action: refuse loudly, never drop silently
            raise ValueError(f"unsupported update action {a}")
    m["last-updated-ms"] = int(_time.time() * 1000)
    return m


@pytest.fixture()
def commit_server(spark, tmp_path):
    """A fake REST catalog that OWNS a table's metadata and arbitrates
    commits: GET serves the current document; POST to the table path is the
    CommitTableRequest endpoint — requirements checked against server state
    (mismatch -> HTTP 409, the CommitFailedException wire form), updates
    applied atomically under a lock."""
    root = str(tmp_path / "ct")
    df = spark.range(0, 20, 1, 2).select("id", (F.col("id") % 3).alias("g"))
    local = IcebergTable.create(root, df)
    _v, meta0 = local._read_metadata()
    state = {"meta": meta0, "commits": 0, "rejects": 0}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, body: dict, code: int = 200):
            raw = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def do_GET(self):  # noqa: N802
            if self.path == "/v1/namespaces/ns/tables/ct":
                with lock:
                    self._send({"metadata-location": "srv://ct", "metadata": state["meta"]})
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):  # noqa: N802
            if self.path != "/v1/namespaces/ns/tables/ct":
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n).decode())
            with lock:
                cur = state["meta"]
                for r in req.get("requirements", []):
                    if r["type"] == "assert-ref-snapshot-id" and r["ref"] == "main":
                        if cur.get("current-snapshot-id") != r.get("snapshot-id"):
                            state["rejects"] += 1
                            self._send(
                                {"error": {"message": "Requirement failed: branch main "
                                           "has changed", "type": "CommitFailedException"}},
                                code=409,
                            )
                            return
                    else:
                        self._send({"error": {"message": f"unknown requirement {r}"}}, 400)
                        return
                try:
                    state["meta"] = _apply_updates(cur, req.get("updates", []))
                except ValueError as e:
                    self._send({"error": {"message": str(e)}}, 400)
                    return
                state["commits"] += 1
                self._send({"metadata-location": "srv://ct", "metadata": state["meta"]})

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", state, local
    srv.shutdown()


def test_catalog_commit_insert_through_rest(spark, commit_server):
    """INSERT into a catalog-managed table commits THROUGH the REST
    protocol: data files + manifests land in the table's storage location,
    the metadata swap is arbitrated by the catalog, and both the writer and
    an independent reader see the new rows via the catalog alone."""
    uri, state, _local = commit_server
    ext = CatalogIcebergTable.from_rest(uri, "ns", "ct", writable=True)
    before = ext.read(spark).count()
    ext.append(spark.range(100, 105).select("id", (F.col("id") % 3).alias("g")))
    assert state["commits"] == 1
    assert ext.read(spark).count() == before + 5
    # an independent read-only attach resolves the same state via the catalog
    ro = CatalogIcebergTable.from_rest(uri, "ns", "ct")
    assert ro.read(spark).count() == before + 5
    # the catalog's document now carries the new snapshot + main ref
    snaps = state["meta"]["snapshots"]
    assert state["meta"]["current-snapshot-id"] == snaps[-1]["snapshot-id"]


def test_catalog_commit_stale_rejected_then_rebased(spark, commit_server):
    """The optimistic-concurrency contract over REST: a commit built on a
    stale base is REJECTED with 409 (commit_table returns False); the
    engine-level retry loop then re-reads, rebases, and lands the append —
    no lost update on either side."""
    uri, state, _local = commit_server
    a = CatalogIcebergTable.from_rest(uri, "ns", "ct", writable=True)
    b = CatalogIcebergTable.from_rest(uri, "ns", "ct", writable=True)
    base = a._read_metadata()[1]  # A reads its commit base...
    stale_base = json.loads(json.dumps(base))
    # ...B commits first
    b.append(spark.range(200, 203).select("id", (F.col("id") % 3).alias("g")))
    # a RAW stale commit (no retry loop) is rejected by the requirement check
    client = RestCatalogClient(uri)
    fake_new = json.loads(json.dumps(stale_base))
    fake_new["current-snapshot-id"] = 999999
    fake_new.setdefault("snapshots", []).append(
        {"snapshot-id": 999999, "sequence-number": 99, "timestamp-ms": 0,
         "manifest-list": "/nonexistent", "summary": {"operation": "append"},
         "schema-id": stale_base.get("current-schema-id", 0)}
    )
    assert client.commit_table("ns", "ct", stale_base, fake_new) is False
    # the full append path on A retries internally: re-read + rebase -> lands
    a.append(spark.range(300, 302).select("id", (F.col("id") % 3).alias("g")))
    ids = {r.id for r in a.read(spark).collect()}
    assert {200, 201, 202, 300, 301}.issubset(ids)
    assert state["commits"] == 2  # B's + A's rebased one (stale POST rejected)


def test_catalog_concurrent_committers(spark, commit_server):
    """Two writers against ONE catalog under real contention (VERDICT r5
    #7). Part 1 is deterministic: writer B commits in the window between
    A's base read and A's POST (injected via A's committer seam), so the
    server MUST 409 A's first attempt and A's Iceberg-spec retry loop must
    rebase and land it. Part 2 is genuinely concurrent: both writers
    barrier-start interleaved appends; every batch's rows land and the
    server records one commit per append."""
    uri, state, _local = commit_server
    a = CatalogIcebergTable.from_rest(uri, "ns", "ct", writable=True)
    b = CatalogIcebergTable.from_rest(uri, "ns", "ct", writable=True)

    # -- part 1: forced stale window -----------------------------------------
    real_committer, fired = a._committer, []

    def racing_committer(base, new):
        if not fired:  # B lands a commit between A's read and A's POST
            fired.append(1)
            b.append(spark.range(400, 403).select("id", (F.col("id") % 3).alias("g")))
        return real_committer(base, new)

    a._committer = racing_committer
    rejects0, commits0 = state["rejects"], state["commits"]
    a.append(spark.range(410, 412).select("id", (F.col("id") % 3).alias("g")))
    a._committer = real_committer
    assert state["rejects"] == rejects0 + 1  # A's first POST was stale
    assert state["commits"] == commits0 + 2  # B's + A's rebased commit
    ids = {r.id for r in a.read(spark).collect()}
    assert {400, 401, 402, 410, 411}.issubset(ids)

    # -- part 2: free-running concurrency ------------------------------------
    commits1 = state["commits"]
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def writer(tbl, lo):
        try:
            barrier.wait(timeout=30)
            for i in range(3):
                base = lo + 10 * i
                tbl.append(
                    spark.range(base, base + 2).select("id", (F.col("id") % 3).alias("g"))
                )
        except Exception as e:  # noqa: BLE001 - surfaced below
            errors.append(e)

    ta = threading.Thread(target=writer, args=(a, 1000))
    tb = threading.Thread(target=writer, args=(b, 2000))
    ta.start(), tb.start()
    ta.join(120), tb.join(120)
    assert not errors, errors
    assert state["commits"] == commits1 + 6  # every append landed exactly once
    ids = {r.id for r in a.read(spark).collect()}
    expect = {lo + 10 * i + d for lo in (1000, 2000) for i in range(3) for d in (0, 1)}
    assert expect.issubset(ids)


def test_engine_dml_into_catalog_table(spark, commit_server):
    """Engine-level: INSERT INTO / DELETE against a writable catalog table
    route through the REST commit protocol."""
    from universql_spark.engine import Engine

    uri, state, _local = commit_server
    eng = Engine(spark=spark)
    eng.register_external_iceberg("cat_t", uri, "ns", "ct", writable=True)
    n0 = eng.execute("SELECT COUNT(*) AS c FROM cat_t").to_pylist()[0]["c"]
    eng.execute("INSERT INTO cat_t SELECT 501 AS id, 1 AS g")
    assert eng.execute("SELECT COUNT(*) AS c FROM cat_t").to_pylist()[0]["c"] == n0 + 1
    eng.execute("DELETE FROM cat_t WHERE id = 501")
    assert eng.execute("SELECT COUNT(*) AS c FROM cat_t").to_pylist()[0]["c"] == n0
    assert state["commits"] >= 2


def test_metadata_updates_diff_actions():
    """metadata_updates derives exactly the TableUpdate actions for the
    operations the engine emits — and nothing for an identical document."""
    from universql_spark.catalogs import metadata_updates

    base = {
        "current-snapshot-id": 1,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "fields": []}],
        "snapshots": [{"snapshot-id": 1, "sequence-number": 1}],
        "properties": {"a": "1", "b": "2"},
        "refs": {"main": {"type": "branch", "snapshot-id": 1}},
    }
    assert metadata_updates(base, json.loads(json.dumps(base))) == []

    new = json.loads(json.dumps(base))
    new["snapshots"].append({"snapshot-id": 2, "sequence-number": 2})
    new["current-snapshot-id"] = 2
    new["schemas"].append({"schema-id": 1, "fields": [{"id": 1}]})
    new["current-schema-id"] = 1
    new["properties"] = {"a": "1", "c": "3"}  # b removed, c added
    new["refs"]["audit"] = {"type": "tag", "snapshot-id": 2}
    acts = {u["action"] for u in metadata_updates(base, new)}
    assert acts == {
        "add-snapshot", "set-snapshot-ref", "add-schema", "set-current-schema",
        "set-properties", "remove-properties",
    }
    by_action = {u["action"]: u for u in metadata_updates(base, new)}
    assert by_action["add-snapshot"]["snapshot"]["snapshot-id"] == 2
    assert by_action["set-properties"]["updates"] == {"c": "3"}
    assert by_action["remove-properties"]["removals"] == ["b"]
    # snapshot expiry -> remove-snapshots
    exp = json.loads(json.dumps(base))
    exp["snapshots"] = []
    exp["current-snapshot-id"] = None
    ups = metadata_updates(base, exp)
    assert {"action": "remove-snapshots", "snapshot-ids": [1]} in ups
