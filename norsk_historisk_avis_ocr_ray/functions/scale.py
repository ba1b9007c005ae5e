"""Cluster-size-aware parallelism defaults.

Every ``override_num_blocks=`` / ``num_partitions=`` in this repo used to be
a constant tuned on the 32-CPU test VM (16 read blocks, 4 join partitions).
Those constants are correct for one node but wrong for a 256-node cluster:
a 4-partition join on 8192 CPUs leaves 8188 of them idle through the
shuffle. These helpers derive the same values from
``ray.cluster_resources()`` — calibrated so the single-VM numbers are
unchanged (32 CPUs × 0.5 = 16 blocks, 32 × 0.125 = 4 join partitions) while
a real cluster scales them linearly with CPU count.

The CPU count is read lazily at call time (operators run after the driver's
``ray.init``); when Ray is not initialised (pure-unit-test imports) a
conservative 8-CPU fallback applies.
"""

from __future__ import annotations

import ray

_FALLBACK_CPUS = 8


def cluster_cpus() -> int:
    """Total CPUs visible to the current Ray session (fallback 8)."""
    if not ray.is_initialized():
        return _FALLBACK_CPUS
    try:
        return max(1, int(ray.cluster_resources().get("CPU", _FALLBACK_CPUS)))
    except Exception:  # pragma: no cover - cluster_resources races on shutdown
        return _FALLBACK_CPUS


def _scaled(per_cpu: float, floor: int, cap: int | None) -> int:
    n = max(floor, int(cluster_cpus() * per_cpu))
    return min(n, cap) if cap is not None else n


def read_blocks(per_cpu: float = 0.5, floor: int = 4,
                cap: int | None = None) -> int:
    """Block count for ``override_num_blocks`` on a read.

    Splits the read itself at row-range granularity so a single-file input
    doesn't arrive as ONE block and serialize the stage behind it — free,
    unlike a repartition() all-to-all. Default 0.5 blocks/CPU reproduces the
    tuned single-VM value (16 at 32 CPUs) and gives a 256-node cluster
    enough read tasks to keep every core busy.
    """
    return _scaled(per_cpu, floor, cap)


def join_partitions(per_cpu: float = 0.125, floor: int = 2,
                    cap: int | None = None) -> int:
    """``num_partitions`` for ``Dataset.join``.

    Each partition is one aggregator actor; too many on one node thrashes
    (hash-shuffle aggregators cost ~0.25 s each to start), too few on a
    cluster serializes the build side. 0.125/CPU reproduces the tuned
    single-VM value (4 at 32 CPUs) and scales to 1024 partitions at 8192
    CPUs.
    """
    return _scaled(per_cpu, floor, cap)
