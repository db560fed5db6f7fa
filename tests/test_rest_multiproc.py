"""Cross-process REST catalog crash-replay invariant (r10 verdict #4).

The in-process fault fuzz (test_fuzz_rest_faults.py) exercises the
commit protocol against an in-process ThreadingHTTPServer; this test
runs the DEPLOYMENT shape — the pointer service in its own OS process,
client PROCESSES storming it over real sockets, SIGKILL mid-storm —
and asserts the journal-replay invariants end to end:

  - no acked op is lost (acked == fsynced == durable);
  - the acked CAS swaps form a linearizable chain (unique bases,
    new == base + 1);
  - per-client churn replays to the observed state modulo at most ONE
    landed-but-unacked in-flight op;
  - stale CAS 409s and a fresh CAS lands post-replay (continuity);
  - consecutive kill+restart cycles replay to identical state.

All assertions live in tools/rest_multiproc_probe.run_probe; this test
pins the invariant suite into CI with a short storm.

Reference shape: core/src/test/java/org/apache/iceberg/rest/
TestRESTCatalog drives the adapter in-process; the cross-process
kill -9 storm is the deployment-shaped extension of the same protocol.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.slow
def test_multiproc_crash_replay_invariants(tmp_path):
    from rest_multiproc_probe import run_probe

    m = run_probe(n_clients=4, storm_secs=2.0,
                  workdir=str(tmp_path), verbose=False)
    # the probe's asserts are the invariants; sanity-check the storm
    # actually exercised them
    assert m["acked_ops"] > 50
    assert m["tables_after"] >= 4  # the four chain tables survive
    # every chain table replayed to at least its max acked version
    for name, got in m["chain_versions"].items():
        assert got >= m["max_acked"][name]
