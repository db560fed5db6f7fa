"""Ad-hoc per-query timing: median-of-3 of named queries() rows at a
given sf dir — the A/B harness for per-commit fixed-cost work (r10).

Usage: python tools/time_queries.py q1 q2 ... [--sf /root/testdata/sf0.1]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf = "/root/testdata/sf0.1"
if "--sf" in sys.argv:
    sf = sys.argv[sys.argv.index("--sf") + 1]
# option VALUES are not query names (qs['/tmp/...'] KeyError otherwise)
names = [a for a in sys.argv[1:] if not a.startswith("--") and a != sf]

load = os.getloadavg()[0]
print(f"loadavg {load:.2f}")

import __spark_entry__ as E  # noqa: E402
from incubator_iceberg_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="time-queries")
E._prep(spark)
E._ensure_warehouse(spark, sf)
spark.range(100).mapInPandas(lambda it: it, "id long").count()
qs = E.queries()
for n in names:
    runs = []
    for _ in range(3):
        t0 = time.time()
        qs[n](spark, sf).count()
        runs.append(time.time() - t0)
    med = sorted(runs)[1]
    print(f"{n:28s} median {med:7.3f}s  runs "
          + " ".join(f"{r:.2f}" for r in runs))
spark.stop()
