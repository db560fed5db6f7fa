"""Distributed manifest WRITE (the 100 TB commit path): huge commits fan
manifest writing out as a Spark job; result must be byte-equivalent in
content to the driver-side path."""

from datetime import datetime, timezone

import pytest

from incubator_iceberg_spark import manifests as MF
from incubator_iceberg_spark import snapshots as SN
from incubator_iceberg_spark.schema import Schema


def _synthetic_entries(n):
    out = []
    for i in range(n):
        out.append({
            "file_path": f"/fake/data/f{i:06d}.parquet",
            "record_count": 100 + i,
            "file_size_bytes": 4096,
            "value_counts": {"id": 100 + i, "ts": 100 + i},
            "null_counts": {"id": 0, "ts": 0},
            "nan_counts": None,
            "lower_bounds": {"id": i * 100,
                             "ts": datetime(2020, 1, 1 + i % 28, tzinfo=timezone.utc)},
            "upper_bounds": {"id": i * 100 + 99,
                             "ts": datetime(2021, 1, 1 + i % 28, tzinfo=timezone.utc)},
            "partition": {"bucket": i % 7},
        })
    return out


@pytest.fixture()
def table(warehouse, spark):
    schema = Schema.from_spark(
        spark.createDataFrame([], "id long, ts timestamp, bucket int").schema)
    return warehouse.create_table("db.distman", schema,
                                  partition_by=["identity(bucket)"])


def test_distributed_manifest_write_matches_driver_path(table, spark, monkeypatch):
    entries = _synthetic_entries(211)
    # driver path first (threshold above n)
    md1 = SN.apply_append(table.metadata, [dict(e) for e in entries])
    driver_rows = MF.read_manifest_list_arrow(
        md1.current_snapshot().manifest_list).to_pylist()

    # distributed path (threshold forced below n)
    monkeypatch.setattr(SN, "DISTRIBUTED_MANIFEST_THRESHOLD", 50)
    md2 = SN.apply_append(table.metadata, [dict(e) for e in entries])
    dist_rows = MF.read_manifest_list_arrow(
        md2.current_snapshot().manifest_list).to_pylist()

    assert len(driver_rows) == 1
    assert len(dist_rows) > 1  # actually fanned out
    # identical entry content (order-insensitive), same totals
    def read_all(rows):
        es = []
        for r in rows:
            es.extend(MF.read_manifest_arrow(r["manifest_path"]).to_pylist())
        return es

    d, x = read_all(driver_rows), read_all(dist_rows)
    assert len(d) == len(x) == len(entries)
    key = lambda e: e["file_path"]
    for a, b in zip(sorted(d, key=key), sorted(x, key=key)):
        a.pop("snapshot_id"), b.pop("snapshot_id")  # differs per commit
        assert a == b
    # per-manifest partition summaries present and consistent with content
    for r in dist_rows:
        s = r["partitions"]["bucket"]
        vals = [e["partition"]["bucket"]
                for e in MF.read_manifest_arrow(r["manifest_path"]).to_pylist()]
        assert s["lower"] == min(vals) and s["upper"] == max(vals)
    # entries were range-clustered by partition → most manifests span few buckets
    spans = [r["partitions"]["bucket"]["upper"] - r["partitions"]["bucket"]["lower"]
             for r in dist_rows]
    assert min(spans) < 6  # at least some manifests are tightly clustered


def test_distributed_threshold_via_append(table, spark, monkeypatch):
    """End-to-end: append_files over the threshold plans + scans fine."""
    monkeypatch.setattr(SN, "DISTRIBUTED_MANIFEST_THRESHOLD", 50)
    table.metadata = SN.append_files(table.ops, _synthetic_entries(120))
    files = table.new_scan().plan_files()
    assert len(files) == 120
    # partition pruning over the distributed manifests still works
    pruned = table.new_scan().filter("bucket = 3").plan_files()
    assert 0 < len(pruned) < 120


@pytest.fixture()
def df_plan_path(monkeypatch):
    """Force the DataFrame planning path AND prove the driver-side
    path-collect reader is never used: at metadata scale the
    manifest-path list must stay executor-side (SURVEY §3.1)."""
    from incubator_iceberg_spark import scan as SC

    monkeypatch.setattr(SC, "LOCAL_PLAN_MAX_BYTES", -1)

    def _boom(*a, **k):
        raise AssertionError("driver-side manifest-path collect used")

    monkeypatch.setattr(MF, "read_entries_df", _boom)


def _mk_rows(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id", "concat('v', id) as v", "cast(id % 7 as int) as bucket")


def test_distributed_entry_read_matches_local(table2, spark, df_plan_path):
    """plan_entries_df decodes manifests inside executor tasks; results
    must match the local planning path exactly, pruning included."""
    exp_all, exp_pruned = table2.pop("expected")
    t = table2["t"]
    files = t.new_scan().plan_files()
    assert sorted(files) == sorted(exp_all)
    pruned = t.new_scan().filter("bucket = 3").plan_files()
    assert sorted(pruned) == sorted(exp_pruned)


@pytest.fixture()
def table2(warehouse, spark):
    schema = Schema.from_spark(
        spark.createDataFrame([], "id long, v string, bucket int").schema)
    t = warehouse.create_table("db.distread", schema,
                               partition_by=["identity(bucket)"])
    t.append(_mk_rows(spark, 0, 500))
    t.append(_mk_rows(spark, 500, 900))
    # expected results computed on the LOCAL path before any monkeypatch
    exp_all = t.new_scan().plan_files()
    exp_pruned = t.new_scan().filter("bucket = 3").plan_files()
    return {"t": t, "expected": (exp_all, exp_pruned)}


def test_distributed_read_applies_mor_deletes_no_isin(warehouse, spark,
                                                      df_plan_path):
    """MoR delete entries are re-selected with the content!=DATA predicate
    (O(1) plan size), never an isin(<every delete path>) literal list —
    at heavy delete debt that list is a driver-side plan bomb."""
    from incubator_iceberg_spark import scan as SC

    schema = Schema.from_spark(
        spark.createDataFrame([], "id long, v string, bucket int").schema)
    t = warehouse.create_table("db.distmor", schema,
                               partition_by=["identity(bucket)"])
    t.append(_mk_rows(spark, 0, 1000))
    t.delete_where("id % 10 = 0", mode="merge-on-read")
    t.delete_where("id = 777", mode="merge-on-read")

    data, dels = t.new_scan()._plan_split()
    assert len(dels) >= 2  # delete entries surfaced through the DF path
    got = sorted(r.id for r in t.new_scan().to_df().collect())
    assert len(got) == 1000 - 100 - 1
    assert 777 not in got and 0 not in got and 33 in got
    # the fix itself: no isin over file paths anywhere in _plan_split
    import inspect

    src = inspect.getsource(SC.TableScan._plan_split)
    assert ".isin(del_paths)" not in src


def test_real_threshold_path_30k_entries(table, spark):
    """Exercise the production threshold (no monkeypatch): a 30k-entry
    commit fans out and plans back correctly."""
    entries = _synthetic_entries(30_000)
    table.metadata = SN.append_files(table.ops, entries)
    rows = MF.read_manifest_list_arrow(
        table.metadata.current_snapshot().manifest_list).to_pylist()
    assert len(rows) == 2  # 30k / 20k-per-manifest
    assert sum(r["added_files_count"] for r in rows) == 30_000
    files = table.new_scan().plan_files()
    assert len(files) == 30_000
    pruned = table.new_scan().filter("bucket = 3").plan_files()
    assert len(pruned) < 6000
