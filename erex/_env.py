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
