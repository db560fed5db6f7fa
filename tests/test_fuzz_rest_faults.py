"""REST commit-triage fuzz gate: random transport-fault injection
across concurrent committers (catalog_rest.py:365-470's landed /
provably-lost / unknown triage — the subtlest catalog logic, r9 verdict
item #7).

Fault classes injected at the _call layer, per-POST, seeded:
- drop_request    — ConnectionRefusedError BEFORE send (provably never
                    reached the server)
- drop_response   — the server processed the swap; the response is lost
- delay_land      — client times out; the POST is still in flight and
                    lands (or 409s) ~0.25 s later
- drop_response_blind — response lost AND the triage re-read GET fails
                    (service unreadable at decision time)

Invariants asserted after every batch of concurrent committers (and
after all in-flight delayed swaps drain):
1. NO LOST COMMITS — every committer that reported success finds its
   unique token in the final property log exactly once.
2. NO DOUBLE-APPLIES — the log holds no duplicate tokens, and the final
   pointer version equals 1 + len(log) (every CAS moved the version by
   exactly one: linearizable).
3. UNKNOWN IS GENUINELY UNDECIDABLE — a CommitStateUnknownError is only
   ever raised when the last injected fault on that thread left the
   POST possibly in flight or the service unreadable (drop_response /
   delay_land / drop_response_blind), NEVER for a provable pre-send
   failure (drop_request must always resolve to retry-and-land).
4. PROGRESS — with a bounded fault budget per committer, every
   committer terminates as landed or unknown (never wedged/gave up).

Commits are pure metadata mutations (a token appended to a table
property) so hundreds of iterations run without Spark jobs.

Tunables: SPARK_GRAFT_REST_FUZZ_BATCHES (default 14),
SPARK_GRAFT_FUZZ_SEED.
"""

import json
import os
import random
import threading
import time

import pytest

from incubator_iceberg_spark import catalog_rest as CR
from incubator_iceberg_spark.catalog_rest import (CommitStateUnknownError,
                                                  RestCatalogServer,
                                                  RestTableOperations)
from incubator_iceberg_spark.metadata import (CommitFailedException,
                                              TableMetadata,
                                              run_with_retries)
from incubator_iceberg_spark.partitioning import PartitionSpec
from incubator_iceberg_spark.schema import Schema

N_BATCHES = int(os.environ.get("SPARK_GRAFT_REST_FUZZ_BATCHES", "14"))
N_WORKERS = 8
_SEED_OVERRIDE = os.environ.get("SPARK_GRAFT_FUZZ_SEED")
_SEEDS = [int(_SEED_OVERRIDE)] if _SEED_OVERRIDE else [20260816, 424242]

UNDECIDABLE = {"drop_response", "delay_land", "drop_response_blind"}
FAULTS = ["drop_request", "drop_response", "delay_land",
          "drop_response_blind"]


class _Injector:
    """Thread-aware fault injector wrapping catalog_rest._call.  Each
    worker thread gets a bounded fault budget; injections are recorded
    per thread so the test can check what the LAST fault before an
    outcome was."""

    def __init__(self, real, rng, p_fault=0.45, budget=2):
        self.real = real
        self.rng = rng
        self.p_fault = p_fault
        self.budget = budget
        self.lock = threading.Lock()
        self.local = threading.local()
        self.faults_by_thread: dict = {}
        self.timers: list = []

    def _record(self, fault):
        name = threading.current_thread().name
        self.faults_by_thread.setdefault(name, []).append(fault)

    def __call__(self, url, method="GET", body=None, token=None,
                 timeout=10.0):
        loc = self.local
        if getattr(loc, "blind_next_get", False) and method == "GET":
            loc.blind_next_get = False
            raise TimeoutError("injected: triage re-read lost")
        if method == "POST":
            with self.lock:
                used = getattr(loc, "used", 0)
                fault = None
                if used < self.budget and self.rng.random() < self.p_fault:
                    fault = self.rng.choice(FAULTS)
                    loc.used = used + 1
                    self._record(fault)
            if fault == "drop_request":
                raise ConnectionRefusedError("injected: connect refused")
            if fault == "drop_response":
                self.real(url, method=method, body=body, token=token,
                          timeout=timeout)
                raise OSError("injected: response lost")
            if fault == "drop_response_blind":
                self.real(url, method=method, body=body, token=token,
                          timeout=timeout)
                loc.blind_next_get = True
                raise OSError("injected: response lost, service dark")
            if fault == "delay_land":
                def _late():
                    try:
                        self.real(url, method=method, body=body,
                                  token=token, timeout=timeout)
                    except Exception:
                        pass  # 409 = a concurrent commit took the slot
                t = threading.Timer(0.25, _late)
                t.start()
                with self.lock:
                    self.timers.append(t)
                raise TimeoutError("injected: client timeout, in flight")
        return self.real(url, method=method, body=body, token=token,
                         timeout=timeout)


def _log_tokens(md: TableMetadata) -> list:
    raw = (md.properties or {}).get("log", "")
    return [t for t in raw.split(",") if t]


@pytest.mark.parametrize("seed", _SEEDS)
def test_rest_fault_fuzz_linearizable(tmp_path, seed, monkeypatch):
    rng = random.Random(seed)
    srv = RestCatalogServer().start()
    try:
        loc = str(tmp_path / "wh" / "db" / "t")
        ops0 = RestTableOperations(srv.url, "db.t", loc)
        from incubator_iceberg_spark.schema import LongType, NestedField
        sch = Schema([NestedField(1, "k", LongType(), False)])
        md0 = TableMetadata.new(loc, sch, PartitionSpec.unpartitioned(sch),
                                {"log": ""})
        ops0.commit(None, md0)

        inj = _Injector(CR._call, rng)
        monkeypatch.setattr(CR, "_call", inj)

        outcomes: dict = {}  # token -> "landed" | "unknown"
        for batch in range(N_BATCHES):
            def worker(i, batch=batch):
                token = f"b{batch}w{i}"
                tname = threading.current_thread().name
                ops = RestTableOperations(srv.url, "db.t", loc)

                def apply(base):
                    assert base is not None
                    base.properties = dict(base.properties or {})
                    base.properties["log"] = (
                        base.properties.get("log", "") + "," + token)
                    return base

                try:
                    run_with_retries(ops, apply, retries=10)
                    outcomes[token] = ("landed", tname)
                except CommitStateUnknownError:
                    outcomes[token] = ("unknown", tname)

            threads = [threading.Thread(target=worker, args=(i,),
                                        name=f"fz-{seed}-{batch}-{i}")
                       for i in range(N_WORKERS)]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=60)
                assert not th.is_alive(), "committer wedged"

        # drain every in-flight delayed swap before the final read
        for t in inj.timers:
            t.join(timeout=5)
        time.sleep(0.1)
        monkeypatch.setattr(CR, "_call", inj.real)

        final = RestTableOperations(srv.url, "db.t", loc).refresh()
        tokens = _log_tokens(final)

        # (4) progress: every committer terminated with a verdict
        assert len(outcomes) == N_BATCHES * N_WORKERS

        # (2) no double-applies + linearizable version chain
        assert len(tokens) == len(set(tokens)), "double-applied commit"
        assert final._version == 1 + len(tokens), \
            (final._version, len(tokens))

        # (1) no lost commits
        landed_set = set(tokens)
        for token, (verdict, tname) in outcomes.items():
            if verdict == "landed":
                assert token in landed_set, f"lost commit {token}"
            else:
                # (3) unknown must be genuinely undecidable at injection
                # time: the last fault on that thread left the POST
                # possibly in flight or the service unreadable
                hist = inj.faults_by_thread.get(tname, [])
                assert hist and hist[-1] in UNDECIDABLE, \
                    f"{token}: unknown after decidable fault {hist[-1:]}"

        # unknowns may or may not have landed — but never twice (covered
        # by the duplicate check) and at least SOME faults were injected
        n_faults = sum(len(v) for v in inj.faults_by_thread.values())
        assert n_faults >= N_BATCHES, n_faults
    finally:
        srv.stop()
