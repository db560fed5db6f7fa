"""REST pointer-service scale probe WITH persistence (r9 verdict #4).

The r9 probe ran persistence OFF; the r9 `_persist` rewrote the whole
table map per mutation (O(#tables) per pointer swap).  r10 replaced it
with an append-only journal (one fsync'd line per mutation) + snapshot
compaction.  This probe documents:

1. register throughput at 10^4 tables, persistence ON
2. CAS commit latency at 10^2 vs 10^4 registered tables (must be flat
   in #tables — the journal append is O(1))
3. an 8-thread hot-table CAS storm under persistence: linearizable
   (final version == landed commits + 1... i.e. base+landed)
4. restart: snapshot+journal replay reproduces the exact pointer map;
   compaction on stop folds the journal and a second restart agrees

Run: python tools/rest_persist_probe.py
"""

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_iceberg_spark.catalog_rest import (  # noqa: E402
    RestCatalogServer, _call)

root = tempfile.mkdtemp(prefix="rest_probe_")
state = os.path.join(root, "catalog-state.json")
srv = RestCatalogServer(state_path=state).start()
url = srv.url

N = 10_000


def register(name, version=1):
    _call(f"{url}/v1/namespaces/db/tables", method="POST",
          body={"name": name, "location": f"/wh/db/{name}",
                "version": version, "metadata_file": f"v{version}.json"})


def cas(name, base, new):
    _call(f"{url}/v1/namespaces/db/tables/{name}", method="POST",
          body={"base-version": base, "version": new,
                "location": f"/wh/db/{name}", "metadata_file": f"v{new}.json"})


def commit_latency(name, n=200):
    row = _call(f"{url}/v1/namespaces/db/tables/{name}")
    v = int(row["version"])
    t0 = time.perf_counter()
    for i in range(n):
        cas(name, v + i, v + i + 1)
    return (time.perf_counter() - t0) / n * 1000  # ms


# 1. register 10^4 tables with persistence on
t0 = time.perf_counter()
for i in range(N):
    register(f"t{i:05d}")
reg_rate = N / (time.perf_counter() - t0)
print(f"register {N} tables, persistence ON: {reg_rate:,.0f} tables/s")

# 2. CAS latency flat in #tables: measure on a small fresh server vs here
lat_10k = commit_latency("t00000")
srv_small = RestCatalogServer(
    state_path=os.path.join(root, "small.json")).start()
for i in range(100):
    _call(f"{srv_small.url}/v1/namespaces/db/tables", method="POST",
          body={"name": f"s{i}", "location": f"/wh/db/s{i}",
                "version": 1, "metadata_file": "v1.json"})
row = _call(f"{srv_small.url}/v1/namespaces/db/tables/s0")
t0 = time.perf_counter()
for i in range(200):
    _call(f"{srv_small.url}/v1/namespaces/db/tables/s0", method="POST",
          body={"base-version": 1 + i, "version": 2 + i,
                "location": "/wh/db/s0", "metadata_file": f"v{2+i}.json"})
lat_100 = (time.perf_counter() - t0) / 200 * 1000
srv_small.stop()
print(f"CAS latency: {lat_100:.2f} ms @ 100 tables, "
      f"{lat_10k:.2f} ms @ {N:,} tables "
      f"(ratio {lat_10k / lat_100:.2f} — flat = journal is O(1))")

# 3. CAS storm under persistence
landed = [0] * 8
conflicts = [0] * 8
row = _call(f"{url}/v1/namespaces/db/tables/t00001")
base_v = int(row["version"])


def stormer(i):
    from incubator_iceberg_spark.catalog_rest import RestError
    for _ in range(200):
        r = _call(f"{url}/v1/namespaces/db/tables/t00001")
        v = int(r["version"])
        try:
            cas("t00001", v, v + 1)
            landed[i] += 1
        except RestError as e:
            if e.code == 409:
                conflicts[i] += 1
            else:
                raise


t0 = time.perf_counter()
threads = [threading.Thread(target=stormer, args=(i,)) for i in range(8)]
for th in threads:
    th.start()
for th in threads:
    th.join()
storm_s = time.perf_counter() - t0
row = _call(f"{url}/v1/namespaces/db/tables/t00001")
final_v = int(row["version"])
total_landed = sum(landed)
assert final_v == base_v + total_landed, (final_v, base_v, total_landed)
print(f"CAS storm (8 threads, persistence ON): {total_landed} landed + "
      f"{sum(conflicts)} conflicts in {storm_s:.1f}s "
      f"({(total_landed + sum(conflicts)) / storm_s:,.0f} attempts/s); "
      f"final version == base+landed (linearizable)")

# 4. restart: journal replay reproduces the map; compaction agrees
with srv.state.lock:
    snapshot_mem = {k: dict(v) for k, v in srv.state.tables.items()}
jlines = srv.state._journal_lines
srv.stop()  # compacts
srv2 = RestCatalogServer(state_path=state).start()
with srv2.state.lock:
    after = {k: dict(v) for k, v in srv2.state.tables.items()}
assert after == snapshot_mem, "restart lost or corrupted pointers"
assert srv2.state._journal_lines == 0, "compaction did not fold journal"
srv2.stop()
jsz = os.path.getsize(state)
print(f"restart: {len(after):,} pointers intact after compaction "
      f"(journal had {jlines:,} lines pre-compact; snapshot "
      f"{jsz / 1e6:.1f} MB)")
shutil.rmtree(root, ignore_errors=True)
print("OK")
