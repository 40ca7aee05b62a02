"""Cluster-aware stage sizing.

Pool sizes are resolved at pipeline-build time from the live cluster so the
same code saturates a 4-CPU test fixture, a 32-CPU bench node, or a 256-node
cluster. Rules:

- upper bounds scale with total CPUs minus a reserve for the read/write
  stages (a pool that books every CPU starves the reads and deadlocks the
  streaming executor),
- lower bound 1 actor and autoscaling ``(1, N)`` everywhere, so small
  sessions degrade to fewer actors instead of deadlocking.
"""

from __future__ import annotations


def cluster_cpus() -> int:
    import ray
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 8))
    return 8


def pool_size(frac: float = 1.0, reserve: int = 2, lo: int = 2,
              hi: int = 256) -> int:
    """Max actors for a pool that should use ``frac`` of the non-reserved
    CPUs."""
    return max(lo, min(hi, int((cluster_cpus() - reserve) * frac)))


_WORKER_STATE: dict = {}


def worker_state(key, factory):
    """Once-per-WORKER-PROCESS state for task-dispatched ``map_batches``
    functions (the warm-worker alternative to an actor pool, for stages
    whose state is cheap to build — compiled regexes, small broadcast
    tables). Ray reuses worker processes across tasks and executions, so
    the factory runs once per process per key and every later task on that
    worker hits the cache; a per-execution actor pool pays ~2-3 s of
    creation (measured) that this path never does. Use a REAL actor pool
    when the state is heavy (multi-GB encoder weights) or needs placement
    (``num_gpus``). ``key`` must capture everything the factory reads.
    Bounded (FIFO, 32 entries) so long-lived workers that see many
    distinct keys — e.g. a fresh broadcast ref every job — don't grow
    without limit."""
    st = _WORKER_STATE.get(key)
    if st is None:
        while len(_WORKER_STATE) >= 32:
            _WORKER_STATE.pop(next(iter(_WORKER_STATE)))
        st = _WORKER_STATE.setdefault(key, factory())
    return st


def fixed_pool_size(lo: int = 1, hi: int = 256) -> int:
    """FIXED actor count for a solo hot-path pool: 3/4 of the node, the rest
    left to the read/write task stages.

    Autoscaling ``(1, N)`` pools ramp from one actor under queue pressure —
    on jobs of tens of seconds the ramp halves effective parallelism
    (measured 18.8 s → 7.8 s switching the flagship pool to fixed). Fixed
    pools are safe ONLY when a single pool runs at a time (the fused
    flagship stage); concurrent-pool pipelines must keep autoscaling or
    they deadlock the reads."""
    cpus = cluster_cpus()
    return max(lo, min(hi, cpus - max(2, cpus // 4)))
