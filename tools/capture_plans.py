"""Capture .explain("formatted") output for named queries() rows into
plans/<tag_dir>/<name>_<tag>.txt (r11 optimization-round evidence).

Usage:
  python tools/capture_plans.py --tag before --dir plans/r11 q6_forecast_revenue ...
  [--sf /root/testdata/sf0.1]

The query function runs (building its scratch tables) and the RETURNED
DataFrame's formatted physical plan is written out.  Note for composition
rows (maintenance loops, streaming sinks): the captured plan covers the
returned scan, not the side-effecting jobs — the interesting evidence for
those lives in the per-phase job timings recorded in OPTIMIZATION_r11.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

argv = sys.argv[1:]
skip = {argv.index(f) + 1 for f in ("--sf", "--tag", "--dir") if f in argv}
args = [a for i, a in enumerate(argv)
        if not a.startswith("--") and i not in skip]
sf = "/root/testdata/sf0.1"
tag = "before"
out_dir = "plans/r11"
if "--sf" in sys.argv:
    sf = sys.argv[sys.argv.index("--sf") + 1]
if "--tag" in sys.argv:
    tag = sys.argv[sys.argv.index("--tag") + 1]
if "--dir" in sys.argv:
    out_dir = sys.argv[sys.argv.index("--dir") + 1]

import __spark_entry__ as E  # noqa: E402
from incubator_iceberg_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="capture-plans")
E._prep(spark)
E._ensure_warehouse(spark, sf)
qs = E.queries()
os.makedirs(out_dir, exist_ok=True)

for name in args:
    df = qs[name](spark, sf)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    txt = df._jdf.queryExecution().explainString(mode)
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(txt)
    print(f"wrote {path} ({len(txt)} bytes)")
spark.stop()
