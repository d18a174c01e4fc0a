"""Session-derived sizing for actor pools and shuffle bucket counts.

Round-1 finding (BENCH/BASELINE.md): FIXED actor pools beat autoscaling
for short stages, but a fixed pool must stay strictly below the session
CPU count or upstream tasks starve (deadlock). Round-1 shipped literal
``concurrency=2`` on broadcast stages — correct in the 4-CPU test session
but a bottleneck at 32 CPUs and on a 4N-node cluster. Every pool size and
default bucket count now derives from the live session:

- ``pool_size(frac)``: ``clamp(cpus * frac, min=2, max=cpus - 2)`` — the
  ``cpus - 2`` ceiling keeps task slots free for upstream reads (the
  deadlock guard); the default quarter-of-session fraction keeps several
  concurrent stages from oversubscribing.
- ``default_buckets()``: ``2 x cpus`` (floor 16) shuffle buckets — enough
  buckets that every core gets work in the reduce, few enough that
  per-bucket Python overhead stays negligible. On a real cluster CPU
  count is cluster-wide, so both knobs grow with nodes automatically.
"""

from __future__ import annotations

import os

import ray


def session_cpus() -> int:
    """CPU count of the live Ray session (cluster-wide), or the host's."""
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 4))
    return os.cpu_count() or 4


def pool_size(frac: float = 0.25, *, min_size: int = 2) -> int:
    """Fixed actor-pool size derived from the session (see module doc)."""
    cpus = session_cpus()
    return max(min_size, min(cpus - 2, int(cpus * frac)))


def default_buckets(*, min_buckets: int = 16) -> int:
    """Shuffle bucket count derived from the session (see module doc)."""
    return max(min_buckets, session_cpus() * 2)


def read_blocks_for_bytes(nbytes: int, *, per_block: int = 4 << 20) -> int | None:
    """Read-parallelism override for SMALL inputs, ``None`` (Ray's own
    sizing) for big ones.

    Why: Ray's sort-based shuffle creates one reduce partition PER INPUT
    BLOCK, and its default read parallelism (~2x CPUs) hands a 3 MB table
    64 near-empty blocks — so every downstream groupby/join pays ~128
    reduce tasks to move a few thousand rows (measured: the q7 join chain
    drops 4.2 s -> 0.4 s at sf0.1 when the reads emit byte-proportional
    block counts). One block per ~4 MB on disk until that meets Ray's
    default parallelism, then defer to Ray — at 100 TB this override never
    engages."""
    want = max(1, -(-nbytes // per_block))
    return None if want >= default_buckets() else want


def buckets_for_input(ds, *, target_bytes: int = 1 << 30, min_buckets: int | None = None) -> int:
    """Shuffle/partition count derived from the INPUT size: one bucket per
    ~``target_bytes`` of data (default 1 GiB — a reduce task's comfortable
    heap share), floored at ``default_buckets()`` so every core gets work.
    ``ds.size_bytes()`` on a fresh read comes from file metadata (no
    execution); at 100 TB this yields ~100k buckets instead of a fixed 64
    — the knob the round-1 docstrings promised but never computed."""
    try:
        nbytes = ds.size_bytes() or 0
    except Exception:
        nbytes = 0
    floor = min_buckets if min_buckets is not None else default_buckets()
    return max(floor, int(nbytes // target_bytes) + (1 if nbytes % target_bytes else 0))
