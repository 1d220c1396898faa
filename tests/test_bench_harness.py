"""bench.py harness safety contracts (round-7 ADVICE + VERDICT task 3).

These are pure-function tests — no SparkSession — pinning:
- the stale-scratch sweep deletes ONLY Spark-scratch-named entries,
  resolves its base through the same helper get_spark uses, and keys
  staleness off the tree's max mtime (a live session writing into
  nested hash-bucket subdirs must not be swept);
- the 200M-anchor session history attaches each session's disk probe;
- the vs_prev normalizer carries the disk-probe pair and flags >3x
  drift so a machine-wide disk throttle is not read as a regression.
"""

from __future__ import annotations

import importlib
import os
import time


def _bench(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(tmp_path))
    import bench

    return importlib.reload(bench)


_UUID = "12345678-1234-1234-1234-123456789abc"


def _age(path: str, seconds_ago: float) -> None:
    t = time.time() - seconds_ago
    os.utime(path, (t, t))


def test_sweep_only_matches_spark_scratch_naming(monkeypatch, tmp_path):
    bench = _bench(monkeypatch, tmp_path)
    stale = tmp_path / f"blockmgr-{_UUID}"
    stale.mkdir()
    # prefix alone must NOT match: the /tmp fallback base holds
    # spark-graft-warehouse, which an unfiltered sweep would delete
    bystanders = [tmp_path / "spark-graft-warehouse", tmp_path / "data", tmp_path / "spark-notauuid"]
    for b in bystanders:
        b.mkdir()
    for p in [stale, *bystanders]:
        _age(str(p), 7 * 3600)
    bench._sweep_stale_local_dirs()
    assert not stale.exists()
    assert all(b.exists() for b in bystanders)


def test_sweep_keeps_live_tree_with_fresh_nested_child(monkeypatch, tmp_path):
    """Spark writes shuffle blocks into nested hash-bucket subdirs, so
    the TOP directory's mtime goes stale on a legitimately live >6h
    session — staleness must key off the tree's max mtime."""
    bench = _bench(monkeypatch, tmp_path)
    live = tmp_path / f"spark-{_UUID}"
    bucket = live / "0b"
    bucket.mkdir(parents=True)
    fresh = bucket / "shuffle_0_0_0.data"
    fresh.write_text("x")
    _age(str(live), 7 * 3600)
    _age(str(bucket), 7 * 3600)
    # fresh file keeps its current mtime
    bench._sweep_stale_local_dirs()
    assert fresh.exists()


def test_sweep_base_resolution_is_shared_with_session(monkeypatch, tmp_path):
    """The sweep must target the SAME directory get_spark configures —
    one helper, no drift (round-7 ADVICE)."""
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(tmp_path))
    from hadoop_3_3_6_spark.session import spark_local_dir

    assert spark_local_dir() == str(tmp_path)
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR")
    resolved = spark_local_dir()
    assert resolved == ("/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp")


def test_terasort_sessions_attach_disk_probe(monkeypatch, tmp_path):
    bench = _bench(monkeypatch, tmp_path)
    sessions = bench._terasort_200m_sessions(100.0, 250.0)
    assert sessions[-1] == {
        "src": "this_session",
        "sec": 100.0,
        "gb_per_node_min": 12.0,
        "disk_probe_mb_s": 250.0,
    }
    # committed snapshots ride along with their own probes (or None
    # for pre-probe rounds)
    assert all({"src", "sec", "gb_per_node_min", "disk_probe_mb_s"} <= set(s) for s in sessions)


def test_vs_prev_carries_disk_probe_pair_and_drift(monkeypatch, tmp_path):
    bench = _bench(monkeypatch, tmp_path)
    _, prev = bench._load_prev_snapshot()
    if prev is None or prev.get("action") != "noop_write":
        import pytest

        pytest.skip("no committed noop_write snapshot")
    prev_disk = prev.get("anchors", {}).get("disk_probe_mb_s")
    out = bench._vs_prev_normalized({"q1_pricing_summary": 1.0}, 0.2, disk_probe=400.0)
    assert out["disk_probe_mb_s"] == 400.0
    assert out["prev_disk_probe_mb_s"] == prev_disk
    if prev_disk:
        assert out["disk_drift"] == (not (1 / 3 <= 400.0 / prev_disk <= 3))
