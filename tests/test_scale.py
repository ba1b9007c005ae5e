"""Cluster-size-aware parallelism defaults (functions/scale.py)."""

import ray

from norsk_historisk_avis_ocr_ray.functions import scale


def test_cluster_cpus_live_session(ray_session):
    # conftest session is 4 CPUs
    assert scale.cluster_cpus() == int(ray.cluster_resources()["CPU"])


def test_defaults_reproduce_single_vm_tuning(monkeypatch):
    # The helpers exist to REPLACE constants tuned at 32 CPUs — the derived
    # values must be identical there (bench unchanged).
    monkeypatch.setattr(scale, "cluster_cpus", lambda: 32)
    assert scale.read_blocks() == 16
    assert scale.join_partitions() == 4
    assert scale.join_partitions(0.25) == 8
    assert scale.read_blocks(0.25) == 8


def test_scales_linearly_with_cluster(monkeypatch):
    monkeypatch.setattr(scale, "cluster_cpus", lambda: 8192)  # 256 × 32
    assert scale.read_blocks() == 4096
    assert scale.join_partitions() == 1024


def test_floor_and_cap(monkeypatch):
    monkeypatch.setattr(scale, "cluster_cpus", lambda: 2)
    assert scale.read_blocks() == 4          # floor
    assert scale.join_partitions() == 2      # floor
    monkeypatch.setattr(scale, "cluster_cpus", lambda: 100_000)
    assert scale.read_blocks(cap=512) == 512
