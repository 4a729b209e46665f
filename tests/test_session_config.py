"""Execution-profile knobs in session.py resolve from the env as
documented: shuffle partitions default to ~cores and override upward
via SPARK_GRAFT_SHUFFLE (the cluster-like profile BASELINE.md's
high-partition oracle run executes under)."""

from __future__ import annotations

from grader_etl_spark.session import _shuffle_partitions


def test_shuffle_partitions_default_tracks_cpus(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE", raising=False)
    assert _shuffle_partitions(32) == 32
    assert _shuffle_partitions(4) == 8  # floor of 8 for tiny boxes


def test_shuffle_partitions_env_override_upward(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "2048")
    assert _shuffle_partitions(32) == 2048


def test_shuffle_partitions_bad_env_falls_back(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "lots")
    assert _shuffle_partitions(32) == 32
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "0")
    assert _shuffle_partitions(32) == 32
