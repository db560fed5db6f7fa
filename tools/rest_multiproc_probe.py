"""Multi-process REST catalog probe (r10 verdict #4).

The in-repo fault fuzz (tests/test_fuzz_rest_faults.py) runs the
ThreadingHTTPServer in-process; real deployments have the service in
its OWN process and clients retrying across a real socket.  This probe
runs that shape end-to-end:

  1. the pointer service runs in a SUBPROCESS (journal-persisted);
  2. N client PROCESSES storm it over real sockets with a mixed
     create / CAS-commit / rename / drop workload, logging every op
     ONLY after the server acked it (the server fsyncs the journal
     line before responding, so acked == durable);
  3. mid-storm the server is killed with SIGKILL (no shutdown hook,
     no compaction);
  4. a restarted server must replay the journal to a state where:
       - NO ACKED OP IS LOST: every chain table's pointer version is
         >= the max version any client saw acked (and <= the max
         attempted, bounding phantom writes to the one in-flight op);
       - the acked CAS swaps per table form a LINEARIZABLE chain:
         unique bases, new == base + 1 (two clients can never ack the
         same base);
       - per-client private churn sequences (create -> rename -> drop
         cycles) replay to the observed server state, modulo the one
         final op whose response the kill may have swallowed;
       - VERSION CONTINUITY holds: a stale CAS 409s, a fresh CAS lands;
  5. a second SIGKILL + two further restarts must replay to
     IDENTICAL state (idempotent replay).

Run:  python tools/rest_multiproc_probe.py [--clients 6] [--secs 4]
Internal modes (spawned by the orchestrator):
      --serve <state_path> <url_file>
      --client <url> <log_path> <client_id> <seed> <stop_flag>

Reference shape: core/src/test/java/org/apache/iceberg/rest/* drives
the RESTCatalogAdapter in-process; the cross-process kill -9 storm is
the deployment-shaped extension of the same commit protocol.
"""

from __future__ import annotations

import json
import os
import random
import signal
import subprocess
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN_TABLES = [f"chain.t{i}" for i in range(4)]


# ---------------------------------------------------------------------------
# --serve: the catalog service in its own process
# ---------------------------------------------------------------------------

def serve(state_path: str, url_file: str) -> None:
    from incubator_iceberg_spark.catalog_rest import RestCatalogServer
    srv = RestCatalogServer(state_path=state_path).start()
    tmp = url_file + ".tmp"
    with open(tmp, "w") as f:
        f.write(srv.url)
    os.replace(tmp, url_file)  # atomic: the parent never reads a torn URL
    while True:  # killed with SIGKILL by the orchestrator
        time.sleep(3600)


# ---------------------------------------------------------------------------
# --client: one storm worker over a real socket
# ---------------------------------------------------------------------------

def client(url: str, log_path: str, cid: int, seed: int,
           stop_flag: str) -> None:
    from incubator_iceberg_spark.catalog_rest import RestError, _call
    rng = random.Random(seed)
    log = open(log_path, "w")

    def record(entry: dict) -> None:
        log.write(json.dumps(entry) + "\n")
        log.flush()

    def table_url(name: str) -> str:
        ns, tbl = name.rsplit(".", 1)
        return f"{url}/v1/namespaces/{ns}/tables/{tbl}"

    churn_ns = f"c{cid}"
    churn_seq = 0
    dead = 0
    while not os.path.exists(stop_flag):
        kind = rng.random()
        try:
            if kind < 0.55:
                # CAS swap storm on a shared chain table
                name = rng.choice(CHAIN_TABLES)
                row = _call(table_url(name))
                base = int(row["version"])
                new = base + 1
                record({"op": "attempt_swap", "table": name, "new": new})
                _call(table_url(name), method="POST",
                      body={"base-version": base, "version": new,
                            "location": row["location"],
                            "metadata_file": f"v{new}-{cid}.metadata.json"})
                record({"op": "swap", "table": name, "base": base,
                        "new": new})
            elif kind < 0.75:
                # private churn: create
                churn_seq += 1
                name = f"{churn_ns}.x{rng.randint(0, 3)}"
                record({"op": "attempt", "kind": "create", "name": name})
                _call(f"{url}/v1/namespaces/{churn_ns}/tables",
                      method="POST",
                      body={"name": name.rsplit(".", 1)[1],
                            "location": f"/wh/{name}", "version": 1,
                            "metadata_file": "v1-x.metadata.json"})
                record({"op": "create", "name": name,
                        "location": f"/wh/{name}"})
            elif kind < 0.9:
                # private churn: rename within the client's namespace
                src = f"{churn_ns}.x{rng.randint(0, 3)}"
                dst = f"{churn_ns}.y{rng.randint(0, 3)}"
                record({"op": "attempt", "kind": "rename", "src": src,
                        "dst": dst})
                _call(f"{url}/v1/tables/rename", method="POST",
                      body={"source": src, "destination": dst})
                record({"op": "rename", "src": src, "dst": dst})
            else:
                # private churn: drop
                pool = [f"{churn_ns}.x{rng.randint(0, 3)}",
                        f"{churn_ns}.y{rng.randint(0, 3)}"]
                name = rng.choice(pool)
                record({"op": "attempt", "kind": "drop", "name": name})
                _call(table_url(name), method="DELETE")
                record({"op": "drop", "name": name})
            dead = 0
        except RestError as e:
            # 409 (lost CAS / exists) and 404 (raced away) are protocol
            # outcomes, not failures — the server is alive
            record({"op": "rejected", "code": e.code})
            dead = 0
        except Exception as e:
            # transport failure: the server is (being) killed.  The
            # LAST attempted op may have landed without an ack — the
            # orchestrator accounts for exactly one such op.
            record({"op": "transport_error", "err": str(e)[:80]})
            dead += 1
            if dead >= 3:
                break
            time.sleep(0.05)
    log.close()


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

def _spawn_server(state_path: str, workdir: str) -> tuple:
    url_file = os.path.join(workdir, f"url-{uuid.uuid4().hex}.txt")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--serve", state_path,
         url_file],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.time() + 30
    while not os.path.exists(url_file):
        if proc.poll() is not None:
            raise RuntimeError("server subprocess died on startup")
        if time.time() > deadline:
            proc.kill()
            raise RuntimeError("server subprocess never published its URL")
        time.sleep(0.02)
    with open(url_file) as f:
        return proc, f.read().strip()


def _dump_state(url: str) -> dict:
    """Full table map via the REST surface (list + per-table load)."""
    from incubator_iceberg_spark.catalog_rest import _call
    idents = _call(f"{url}/v1/namespaces//tables")["identifiers"]
    out = {}
    for ident in idents:
        name = ".".join(ident["namespace"]) + "." + ident["name"]
        ns, tbl = name.rsplit(".", 1)
        out[name] = _call(f"{url}/v1/namespaces/{ns}/tables/{tbl}")
    return out


def _apply_acked(model: dict, ev: dict) -> None:
    """Apply an ACKED churn op.  Acked == fsync-durable (the server
    journals before responding), so every acked op MUST survive replay
    — there is no 'maybe an acked op is missing' case."""
    if ev["op"] == "create":
        model[ev["name"]] = ev["location"]
    elif ev["op"] == "rename":
        if ev["src"] in model:
            model[ev["dst"]] = model.pop(ev["src"])
    elif ev["op"] == "drop":
        model.pop(ev["name"], None)


def _apply_maybe(model: dict, ev: dict) -> None:
    """Apply an op whose ack a transport error swallowed, under the
    SERVER's guards: create 409s if the name exists, rename 409s/404s
    unless src exists and dst doesn't, drop 404s if absent.  A guarded
    no-op models the request having been REJECTED (or never processed)
    before the break."""
    k = ev["kind"]
    if k == "create" and ev["name"] not in model:
        model[ev["name"]] = f"/wh/{ev['name']}"
    elif k == "rename" and ev["src"] in model and ev["dst"] not in model:
        model[ev["dst"]] = model.pop(ev["src"])
    elif k == "drop":
        model.pop(ev["name"], None)


def _churn_models(seq: list, cap: int = 8) -> list:
    """All states a client's namespace can legally be in: acked ops
    applied unconditionally IN ORDER; each 'maybe' (an attempt whose
    response a transport error swallowed — landed or not, at its
    position in the sequence) branches the model.  With k maybes that
    is 2^k candidates; k > cap means the run was too faulty to verify
    deterministically, so fail loudly rather than over-accept."""
    n_maybes = sum(1 for kind, _ in seq if kind == "maybe")
    assert n_maybes <= cap, \
        f"{n_maybes} unacknowledged in-flight ops — probe inconclusive"
    models = [{}]
    for kind, ev in seq:
        if kind == "acked":
            for m in models:
                _apply_acked(m, ev)
        else:
            branched = []
            for m in models:
                skip = dict(m)
                _apply_maybe(m, ev)
                branched.append(skip)
            models.extend(branched)
    # dedupe
    out, seen = [], set()
    for m in models:
        key = tuple(sorted(m.items()))
        if key not in seen:
            seen.add(key)
            out.append(m)
    return out


def run_probe(n_clients: int = 6, storm_secs: float = 4.0,
              workdir: str | None = None, verbose: bool = True) -> dict:
    from incubator_iceberg_spark.catalog_rest import RestError, _call
    workdir = workdir or tempfile.mkdtemp(prefix="rest_mp_probe_")
    state_path = os.path.join(workdir, "cat.json")
    metrics: dict = {"n_clients": n_clients, "storm_secs": storm_secs}

    def say(msg):
        if verbose:
            print(msg, flush=True)

    # phase 1: server up, chain tables registered
    srv, url = _spawn_server(state_path, workdir)
    for name in CHAIN_TABLES:
        ns, tbl = name.rsplit(".", 1)
        _call(f"{url}/v1/namespaces/{ns}/tables", method="POST",
              body={"name": tbl, "location": f"/wh/{name}", "version": 1,
                    "metadata_file": "v1-seed.metadata.json"})
    stop_flag = os.path.join(workdir, "stop")
    logs = [os.path.join(workdir, f"client-{i}.jsonl")
            for i in range(n_clients)]
    t0 = time.time()
    clients = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--client", url,
         logs[i], str(i), str(1000 + i), stop_flag],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for i in range(n_clients)]

    # phase 2: let the storm run, then SIGKILL the server mid-flight
    time.sleep(storm_secs)
    os.kill(srv.pid, signal.SIGKILL)
    srv.wait()
    kill_t = time.time()
    say(f"server SIGKILLed after {kill_t - t0:.1f}s of storm")
    open(stop_flag, "w").close()
    for c in clients:
        try:
            c.wait(timeout=30)
        except subprocess.TimeoutExpired:
            # a wedged client is a probe-harness problem, not an
            # invariant violation: kill it and keep the acked prefix of
            # its log (every line is flushed post-ack)
            c.kill()
            c.wait()

    # parse client logs
    acked_swaps: dict = {n: [] for n in CHAIN_TABLES}
    attempted_max: dict = {n: 1 for n in CHAIN_TABLES}
    churn_seqs: dict = {}  # client -> ordered [("acked", ev)|("maybe", ev)]
    n_acked = n_rejected = 0
    for i, lp in enumerate(logs):
        churn_seqs[i] = []
        pending = None  # churn attempt awaiting its ack/reject
        with open(lp) as f:
            for line in f:
                ev = json.loads(line)
                if ev["op"] == "swap":
                    acked_swaps[ev["table"]].append((ev["base"], ev["new"]))
                    n_acked += 1
                elif ev["op"] == "attempt_swap":
                    attempted_max[ev["table"]] = max(
                        attempted_max[ev["table"]], ev["new"])
                    pending = None
                elif ev["op"] == "attempt":
                    pending = ev
                elif ev["op"] in ("create", "rename", "drop"):
                    churn_seqs[i].append(("acked", ev))
                    n_acked += 1
                    pending = None
                elif ev["op"] == "rejected":
                    n_rejected += 1
                    pending = None
                elif ev["op"] == "transport_error":
                    # a request in flight at a transport error may have
                    # been journaled before the connection broke (the
                    # kill cuts the response; a transient mid-storm
                    # break is the same ambiguity) — it is a MAYBE at
                    # exactly this position in the client's sequence
                    if pending is not None:
                        churn_seqs[i].append(("maybe", pending))
                    pending = None
    metrics["acked_ops"] = n_acked
    metrics["rejected_ops"] = n_rejected
    metrics["acked_ops_per_sec"] = round(n_acked / max(kill_t - t0, 1e-9), 1)
    assert n_acked > 0, "storm never landed an op — probe inconclusive"

    # linearizability of the acked CAS chain (per table): unique bases,
    # new == base + 1.  Two clients acking the same base would mean the
    # server double-committed one version slot.
    for name, swaps in acked_swaps.items():
        bases = [b for b, _ in swaps]
        assert len(bases) == len(set(bases)), \
            f"{name}: two acked swaps share a base — CAS not linearizable"
        assert all(n == b + 1 for b, n in swaps), f"{name}: non-dense swap"

    # phase 3: restart -> replay invariants
    t_r = time.time()
    srv2, url2 = _spawn_server(state_path, workdir)
    metrics["replay_restart_sec"] = round(time.time() - t_r, 3)
    state = _dump_state(url2)
    for name in CHAIN_TABLES:
        got = int(state[name]["version"])
        max_acked = max([n for _, n in acked_swaps[name]], default=1)
        assert got >= max_acked, \
            f"{name}: replayed v{got} < max ACKED v{max_acked} — " \
            f"an fsynced journal line was lost"
        assert got <= attempted_max[name], \
            f"{name}: replayed v{got} > max attempted " \
            f"v{attempted_max[name]} — phantom commit"
    metrics["chain_versions"] = {
        n: int(state[n]["version"]) for n in CHAIN_TABLES}
    metrics["max_acked"] = {
        n: max([v for _, v in acked_swaps[n]], default=1)
        for n in CHAIN_TABLES}

    # per-client churn: server state must equal SOME legal model —
    # acked ops applied in order, each transport-swallowed in-flight op
    # either landed (under server guards, at its position) or not.  A
    # state matching NO model means an acked op was lost or a phantom
    # op appeared — the journal-durability bugs this probe exists for.
    n_inflight_landed = 0
    for i, seq in churn_seqs.items():
        pfx = f"c{i}."
        got = {n: r["location"] for n, r in state.items()
               if n.startswith(pfx)}
        models = _churn_models(seq)
        all_skipped = {}
        for kind, ev in seq:
            if kind == "acked":
                _apply_acked(all_skipped, ev)
        assert any(got == m for m in models), \
            f"client {i} churn mismatch:\n  server={got}\n  " \
            f"{len(models)} legal models, e.g. acked-only=" \
            f"{all_skipped}\n  seq tail={seq[-6:]}"
        if got != all_skipped:
            n_inflight_landed += 1
    metrics["inflight_landed_unacked"] = n_inflight_landed

    # version continuity across the crash: stale CAS 409s, fresh lands
    for name in CHAIN_TABLES:
        ns, tbl = name.rsplit(".", 1)
        turl = f"{url2}/v1/namespaces/{ns}/tables/{tbl}"
        cur = int(_call(turl)["version"])
        try:
            _call(turl, method="POST",
                  body={"base-version": cur - 1, "version": cur,
                        "location": f"/wh/{name}",
                        "metadata_file": "vX.metadata.json"})
            raise AssertionError(f"{name}: stale CAS accepted post-replay")
        except RestError as e:
            assert e.code == 409, e
        _call(turl, method="POST",
              body={"base-version": cur, "version": cur + 1,
                    "location": f"/wh/{name}",
                    "metadata_file": f"v{cur + 1}-cont.metadata.json"})
        assert int(_call(turl)["version"]) == cur + 1

    # phase 4: second SIGKILL; two further restarts replay IDENTICALLY
    os.kill(srv2.pid, signal.SIGKILL)
    srv2.wait()
    srv3, url3 = _spawn_server(state_path, workdir)
    dump_a = _dump_state(url3)
    os.kill(srv3.pid, signal.SIGKILL)
    srv3.wait()
    srv4, url4 = _spawn_server(state_path, workdir)
    dump_b = _dump_state(url4)
    assert dump_a == dump_b, "consecutive replays disagree"
    metrics["tables_after"] = len(dump_a)
    os.kill(srv4.pid, signal.SIGKILL)
    srv4.wait()
    say(json.dumps(metrics, indent=2))
    return metrics


def main(argv: list) -> int:
    if len(argv) >= 2 and argv[1] == "--serve":
        serve(argv[2], argv[3])
        return 0
    if len(argv) >= 2 and argv[1] == "--client":
        client(argv[2], argv[3], int(argv[4]), int(argv[5]), argv[6])
        return 0
    n_clients, secs = 6, 4.0
    if "--clients" in argv:
        n_clients = int(argv[argv.index("--clients") + 1])
    if "--secs" in argv:
        secs = float(argv[argv.index("--secs") + 1])
    run_probe(n_clients=n_clients, storm_secs=secs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
