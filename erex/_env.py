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


def stable_shard64(s: str) -> int:
    """Canonical md5-derived string shard key (0..63). Python's hash()
    is per-process salted and must never be a shuffle key; new operator
    families should use this ONE definition (dedup.py predates it with
    equivalent local variants kept for shard-layout stability)."""
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 64


def pool_size(frac: float = 0.5, lo: int = 2, hi: int = 64) -> tuple:
    """Actor-pool concurrency sized to the cluster: (min, max) workers
    proportional to total CPUs so a stage neither starves a big cluster
    (a fixed pool of 2 on 32 cores) nor oversubscribes a small one."""
    import ray as _ray
    ncpu = int(_ray.cluster_resources().get("CPU", 4)) \
        if _ray.is_initialized() else 4
    top = max(lo, min(hi, int(ncpu * frac)))
    return (1, top)


def drop_schemaless_blocks(ds):
    """Fix a Ray Data seam: a sort-based groupby().aggregate() whose
    key space is smaller than its partition count emits EMPTY blocks
    with NO schema ("Operator produced a RefBundle with a different
    schema ... new schema: ."), and those blocks poison downstream
    pyarrow hash joins ("No match or multiple matches for key field").
    map_batches cannot repair them (the executor never routes
    zero-column blocks into a UDF) and their BlockMetadata carries
    schema=None either way, so the check runs as num_cpus=0 tasks that
    read each block's column count where it lives (no block moves to
    the driver; the aggregate output is key-cardinality-scale).
    Materializes the dataset and rebuilds it from the non-empty
    blocks."""
    import ray
    import ray.data as rd
    mat = ds.materialize()
    refs = [r for b in mat.iter_internal_ref_bundles()
            for r in b.block_refs]
    ncols = ray.get([_block_ncols.remote(r) for r in refs])
    keep = [r for r, n in zip(refs, ncols) if n > 0]
    if len(keep) == len(refs) or not keep:
        return mat
    return rd.from_arrow_refs(keep)


def _lazy_block_ncols():
    import ray

    @ray.remote(num_cpus=0)
    def block_ncols(block) -> int:
        n = getattr(block, "num_columns", None)   # pyarrow Table
        if n is not None:
            return n
        return len(block.columns)                 # pandas block

    return block_ncols


class _BlockNcols:
    """Deferred ray.remote registration (importing erex must not
    require an initialized/imported-at-module-load ray)."""

    _fn = None

    def remote(self, *a):
        if _BlockNcols._fn is None:
            _BlockNcols._fn = _lazy_block_ncols()
        return _BlockNcols._fn.remote(*a)


_block_ncols = _BlockNcols()
