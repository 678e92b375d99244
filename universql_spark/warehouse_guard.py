"""Cross-process warehouse-location reclamation guard (ADVICE r7).

A Spark in-memory catalog dies with its process, but managed-table
directories under ``spark.sql.warehouse.dir`` survive. Two situations then
look identical to a later writer (Spark raises LOCATION_ALREADY_EXISTS for
both):

1. a true ORPHAN — the creating process crashed mid-swap or was killed, and
   nobody owns the files any more;
2. another LIVE engine process sharing the warehouse dir owns the table
   right now.

Reclaiming (rmtree + retry) is crash recovery for (1) and silent data loss
for (2) — the r7 advice repro: a second engine process's DML could delete a
first process's live table. The guard distinguishes the two with a liveness
registry: every engine process touches ``{warehouse}/_live_pids/{pid}`` on
first use (removed atexit), and :func:`reclaim_orphan` proceeds only when no
OTHER registered pid is still alive. Pid files of crashed processes are
pruned via ``os.kill(pid, 0)``, so a kill -9'd engine never blocks recovery
for longer than the next liveness scan.

The reference process model (one duckdb per universql process, per-process
``~/.universql`` state) never shares mutable storage between processes, so
it has no analogous hazard; this guard is the Spark-warehouse equivalent of
its per-session isolation.
"""

from __future__ import annotations

import atexit
import os
import shutil
from urllib.parse import urlparse

#: warehouse paths this process has already registered under
_registered: set[str] = set()

LIVE_DIR = "_live_pids"


def _warehouse_path(spark) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    return urlparse(wh).path or wh


def _unlink_quiet(path: str) -> None:
    try:
        os.unlink(path)
    except OSError:
        pass


def register_process(spark) -> None:
    """Idempotently record this process as live in the session's warehouse."""
    wh = _warehouse_path(spark)
    if not wh or wh in _registered:
        return
    d = os.path.join(wh, LIVE_DIR)
    marker = os.path.join(d, str(os.getpid()))
    try:
        os.makedirs(d, exist_ok=True)
        with open(marker, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        return  # read-only warehouse: guard degrades to always-refuse
    _registered.add(wh)
    atexit.register(_unlink_quiet, marker)


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, other user
    return True


def other_live_engines(spark) -> list[int]:
    """Pids (not ours) registered in this warehouse whose process is alive.
    Dead pids' marker files are pruned as a side effect."""
    d = os.path.join(_warehouse_path(spark), LIVE_DIR)
    try:
        names = os.listdir(d)
    except OSError:
        return []
    me, out = os.getpid(), []
    for n in names:
        try:
            pid = int(n)
        except ValueError:
            continue
        if pid == me:
            continue
        if _pid_alive(pid):
            out.append(pid)
        else:
            _unlink_quiet(os.path.join(d, n))
    return out


def reclaim_orphan(spark, location: str, owned: bool = False) -> bool:
    """Delete an apparently-orphaned managed-table location. Returns True
    when the location was reclaimed (caller may retry its write), False
    when another live process might own it (caller must surface the
    original error).

    ``owned=True`` — the caller holds REPLACE semantics over the name (a
    CREATE OR REPLACE, or the DML shadow of a table in this process's own
    catalog): reclamation proceeds even with other live engines, because
    replacing the name's contents is exactly what the statement requests;
    a shared real catalog would do the same. ``owned=False`` (errorifexists
    creates) keeps the conservative rule: reclaim only when this is the
    sole live engine in the warehouse — another live process may own that
    location as a table its catalog knows and ours doesn't."""
    register_process(spark)
    if not owned and other_live_engines(spark):
        return False
    loc = urlparse(location).path or location
    shutil.rmtree(loc, ignore_errors=True)
    return True
