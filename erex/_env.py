"""Worker-side import bootstrap.

The driver contract imports this repo by file path after ray.init(),
so Ray worker processes do NOT automatically have the repo on their
sys.path — UDFs that reference erex.* would fail to deserialize (and
the streaming executor retries forever, which presents as a hang).
Every map_batches/map_groups call site passes ``remote_args()`` so the
stage's workers start with PYTHONPATH pointing at the repo. No-op cost
when the path is already importable site-wide.
"""

from __future__ import annotations

import os

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def remote_args() -> dict:
    # Workers inherit the driver's cwd and PYTHONPATH in local mode; only
    # ship a dedicated runtime_env (which costs a per-stage worker pool
    # spin-up) when the repo would NOT be importable there already.
    if os.getcwd() == REPO_DIR or REPO_DIR in \
            os.environ.get("PYTHONPATH", "").split(":"):
        return {}
    existing = os.environ.get("PYTHONPATH", "")
    path = REPO_DIR + (":" + existing if existing else "")
    return {"runtime_env": {"env_vars": {"PYTHONPATH": path}}}


def stable_shard64(s: str, n_shards: int = 64) -> int:
    """Canonical md5-derived string shard key (0..n_shards-1; the
    name keeps the historical default). Python's hash() is per-process
    salted and must never be a shuffle key; new operator families
    should use this ONE definition (dedup.py predates it with
    equivalent local variants kept for shard-layout stability).  Size
    n_shards with default_shard_count()."""
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % n_shards


def default_shard_count(est_rows: int | None = None, *,
                        rows_per_shard: int = 1_000_000,
                        lo: int = 16, hi: int = 65_536) -> int:
    """Shard count for the shard-then-local-combine reductions (the
    pattern that replaces Ray's per-key groupby().aggregate(), whose
    ~1.5 ms/group cost is pathological for million-key tables).  Each
    shard group materializes as ONE pandas frame inside one worker, so
    the count must grow with BOTH the cluster (keep every core busy —
    2 x CPUs) and the data (keep ~rows_per_shard rows per shard so
    1/N of a 100x corpus still fits a worker's heap).  est_rows is a
    cheap upper-bound estimate (parquet metadata row count x expected
    fan-out); pass None when no estimate is available and only the
    cluster term applies.  Returns a power of two so call sites can
    mask (& (n-1)) as well as mod; outputs of every caller are
    shard-count-invariant (per-key reductions over disjoint key sets),
    proven by the block-size-invariance tests."""
    import ray as _ray
    ncpu = int(_ray.cluster_resources().get("CPU", 4)) \
        if _ray.is_initialized() else 4
    n = max(lo, 2 * ncpu)
    if est_rows:
        n = max(n, -(-int(est_rows) // rows_per_shard))
    return min(hi, 1 << (int(n) - 1).bit_length())


def pool_size(frac: float = 0.5, lo: int = 2, hi: int = 64) -> tuple:
    """Actor-pool concurrency sized to the cluster: (min, max) workers
    proportional to total CPUs so a stage neither starves a big cluster
    (a fixed pool of 2 on 32 cores) nor oversubscribes a small one."""
    import ray as _ray
    ncpu = int(_ray.cluster_resources().get("CPU", 4)) \
        if _ray.is_initialized() else 4
    top = max(lo, min(hi, int(ncpu * frac)))
    return (1, top)


def drop_schemaless_blocks(ds, empty_schema: dict = None):
    """Fix a Ray Data seam: a sort-based groupby().aggregate() whose
    key space is smaller than its partition count emits EMPTY blocks
    with NO schema ("Operator produced a RefBundle with a different
    schema ... new schema: ."), and those blocks poison downstream
    pyarrow hash joins ("No match or multiple matches for key field").
    map_batches cannot repair them (the executor never routes
    zero-column blocks into a UDF) and their BlockMetadata carries
    schema=None either way, so the check runs as num_cpus=0 tasks that
    read each block where it lives (no block moves to the driver; the
    aggregate output is key-cardinality-scale). Materializes the
    dataset and rebuilds it from the non-empty blocks (pandas blocks
    are converted to Arrow in place so the rebuilt dataset is uniform).

    empty_schema ({col: pyarrow type}): when EVERY block is
    schema-less — a genuinely empty aggregate — the rebuilt dataset is
    one typed empty table so downstream joins still see the key
    columns; without it the original dataset is returned unchanged
    (best effort)."""
    import ray
    import ray.data as rd
    mat = ds.materialize()
    refs = [r for b in mat.iter_internal_ref_bundles()
            for r in b.block_refs]
    checked = ray.get([_block_check.remote(r) for r in refs])
    keep = [r if arrow else _block_to_arrow.remote(r)
            for r, (n, arrow) in zip(refs, checked) if n > 0]
    if len(keep) == len(refs):
        return mat
    if not keep:
        if empty_schema is None:
            return mat
        import pyarrow as pa
        return rd.from_arrow(pa.table({k: pa.array([], v)
                                       for k, v in empty_schema.items()}))
    return rd.from_arrow_refs(keep)


def _lazy_block_tasks():
    import ray

    @ray.remote(num_cpus=0)
    def block_check(block):
        n = getattr(block, "num_columns", None)   # pyarrow Table
        if n is not None:
            return (n, True)
        return (len(block.columns), False)        # pandas block

    @ray.remote(num_cpus=0)
    def block_to_arrow(block):
        import pyarrow as pa
        return pa.Table.from_pandas(block, preserve_index=False)

    return block_check, block_to_arrow


class _LazyRemote:
    """Deferred ray.remote registration (importing erex must not
    require ray at module-load time)."""

    _fns = None

    def __init__(self, idx: int):
        self.idx = idx

    def remote(self, *a):
        if _LazyRemote._fns is None:
            _LazyRemote._fns = _lazy_block_tasks()
        return _LazyRemote._fns[self.idx].remote(*a)


_block_check = _LazyRemote(0)
_block_to_arrow = _LazyRemote(1)


def default_join_partitions(lo: int = 2, hi: int = 64) -> int:
    """Hash-join partition count sized to the cluster: each partition
    is an aggregator actor, so more partitions than CPUs stalls small
    sessions; at scale this should track total cores. ONE definition
    for every Dataset.join call site."""
    import ray as _ray
    ncpu = int(_ray.cluster_resources().get("CPU", 4)) \
        if _ray.is_initialized() else 4
    return max(lo, min(hi, ncpu // 2))
