"""Heavy-family soak: wall time per operator at an arbitrary sf dir.

    python tools/soak_heavy.py [sf_dir] [--num-cpus 32] [ops...]

Round-4 verdict next #6: run the heavy families at ~10x the driver
gate's scale (tools/make_sf_big.py writes /tmp/erex_sf1) and record
sf0.1 vs sf1 walls in BASELINE.md — no query should exceed 10x its
sf0.1 wall scaled by the data ratio.
"""
from __future__ import annotations

import json
import sys
import time

HEAVY = ["dedup_minhash", "dedup_components", "dup_span_mask",
         "dup_span_clean", "dup_shingle_fraction",
         "tfidf_top_terms_join", "copurchase_pagerank",
         "copurchase_triangles", "q5_local_supplier_volume",
         "heavy_hitter_ngrams"]


def main(argv) -> int:
    sf = argv[1] if len(argv) > 1 and not argv[1].startswith("-") \
        else "/root/testdata/sf0.1"
    ncpu = 32
    if "--num-cpus" in argv:
        ncpu = int(argv[argv.index("--num-cpus") + 1])
    ops = [a for a in argv[2:] if not a.startswith("-")
           and not a.isdigit()] or HEAVY

    import ray
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import importlib.util
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    spec = importlib.util.spec_from_file_location(
        "_soak_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    out = {}
    for op in ops:
        t0 = time.time()
        df = qs[op](sf)
        out[op] = {"sec": round(time.time() - t0, 2), "rows": len(df)}
        print(json.dumps({op: out[op]}), flush=True)
    print(json.dumps({"sf_dir": sf, "num_cpus": ncpu, "ops": out}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
