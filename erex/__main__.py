"""CLI entry points (the repo's `ray job submit`-able driver).

    python -m erex run      --corpus DIR --out DIR [--resumable] [--regroup]
    python -m erex triples  --corpus DIR --out DIR
    python -m erex timeml   --corpus DIR --out DIR
    python -m erex nodes    --corpus DIR --out DIR
    python -m erex gen      --n-docs N --seed S
    python -m erex eval     --corpus DIR

Owns its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init_ray(num_cpus=None):
    import ray
    if not ray.is_initialized():
        kw = dict(address="local", include_dashboard=False,
                  ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(**kw)
    try:
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass


def main(argv=None):
    ap = argparse.ArgumentParser(prog="erex")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add_common(p):
        p.add_argument("--corpus", required=True)
        p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("run", help="flagship extraction -> edge parquet")
    add_common(p)
    p.add_argument("--out", required=True)
    p.add_argument("--resumable", action="store_true")
    p.add_argument("--regroup", action="store_true")
    p.add_argument("--salt-threshold", type=int, default=None,
                   help="pair-block salting for giant documents")
    p.add_argument("--dense", action="store_true",
                   help="TimeBank-Dense 6-label classifier heads")

    p = sub.add_parser("triples", help="(subj, pred, obj) TSV-style sink")
    add_common(p)
    p.add_argument("--out", required=True)

    p = sub.add_parser("timeml", help="TimeML rendering sink")
    add_common(p)
    p.add_argument("--out", required=True)

    p = sub.add_parser("nodes", help="canonical node table")
    add_common(p)
    p.add_argument("--out", required=True)

    p = sub.add_parser("eval", help="per-label P/R/F1 vs candidate gold")
    add_common(p)

    p = sub.add_parser("gen", help="generate a synthetic TXP corpus")
    p.add_argument("--n-docs", type=int, required=True)
    p.add_argument("--seed", type=int, default=42)

    p = sub.add_parser("dataops", help="run a training-data operator "
                       "over an sf dir (op name from queries(); 'list' "
                       "prints all)")
    p.add_argument("op")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default=None,
                   help="write result parquet here instead of printing")
    p.add_argument("--stream", action="store_true",
                   help="stream to partitioned parquet via the op's "
                   "Dataset sink (never builds the result frame on "
                   "the driver; requires --out)")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("train", help="train the four liblinear models")
    p.add_argument("--n-docs", type=int, default=120)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--out-dir", required=True)

    args = ap.parse_args(argv)

    if args.cmd == "gen":
        from .corpus import corpus_parquet
        path = corpus_parquet(args.n_docs, args.seed)
        print(json.dumps({"corpus": path, "n_docs": args.n_docs}))
        return 0

    if args.cmd == "train":
        from .training import train_from_seeds
        stats = train_from_seeds(args.n_docs, args.seed, args.out_dir)
        print(json.dumps(stats))
        return 0

    if args.cmd == "dataops":
        import importlib.util
        import os
        from ._env import REPO_DIR
        spec = importlib.util.spec_from_file_location(
            "_erex_entry", os.path.join(REPO_DIR, "__ray_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        # registry construction needs no Ray session — validate the op
        # name (and serve `list`) before paying ray.init
        spec.loader.exec_module(mod)
        qs = mod.queries()
        if args.op == "list":
            print("\n".join(sorted(qs)))
            return 0
        if args.op not in qs:
            print(f"unknown op {args.op!r}; `dataops list` shows all",
                  file=sys.stderr)
            return 2
        if args.stream:
            sinks = mod.streaming_sinks()
            if not args.out:
                print("--stream requires --out", file=sys.stderr)
                return 2
            if args.op not in sinks:
                print(f"{args.op!r} has no streaming sink; available: "
                      + " ".join(sorted(sinks)), file=sys.stderr)
                return 2
            _init_ray(args.num_cpus)
            t0 = time.time()
            sinks[args.op](args.sf_dir, args.out)
            print(json.dumps({"op": args.op, "out": args.out,
                              "streamed": True,
                              "sec": round(time.time() - t0, 2)}))
            import ray
            ray.shutdown()
            return 0
        _init_ray(args.num_cpus)
        t0 = time.time()
        df = qs[args.op](args.sf_dir)
        out = {"op": args.op, "rows": len(df),
               "sec": round(time.time() - t0, 2)}
        if args.out:
            df.to_parquet(args.out, index=False)
            out["out"] = args.out
        print(json.dumps(out))
        import ray
        ray.shutdown()
        return 0

    _init_ray(getattr(args, "num_cpus", None))
    import ray
    from .pipeline import run_extraction, run_flagship_resumable, \
        write_edges
    t0 = time.time()
    try:
        if args.cmd == "run":
            from .extract import PipelineConfig
            cfg = PipelineConfig(dense=args.dense)
            if args.resumable:
                m = run_flagship_resumable(args.corpus, args.out,
                                           config=cfg)
                m["sec"] = round(time.time() - t0, 2)
                print(json.dumps(m))
            elif args.salt_threshold:
                from .pipeline import run_extraction_salted
                ds = run_extraction_salted(
                    args.corpus, config=cfg,
                    salt_threshold=args.salt_threshold)
                write_edges(ds, args.out)
            else:
                ds = run_extraction(args.corpus, config=cfg,
                                    regroup=args.regroup)
                write_edges(ds, args.out)
                print(json.dumps({"out": args.out,
                                  "sec": round(time.time() - t0, 2)}))
        elif args.cmd == "triples":
            from .sinks import write_triples_tsv
            write_triples_tsv(run_extraction(args.corpus), args.out)
            print(json.dumps({"out": args.out,
                              "sec": round(time.time() - t0, 2)}))
        elif args.cmd == "timeml":
            from ._env import remote_args
            from .timeml import timeml_batch
            ds = run_extraction(args.corpus).map_batches(
                timeml_batch, batch_format="pyarrow", **remote_args())
            ds.write_parquet(args.out)
            print(json.dumps({"out": args.out,
                              "sec": round(time.time() - t0, 2)}))
        elif args.cmd == "nodes":
            from .canonical import canonical_nodes
            canonical_nodes(run_extraction(args.corpus)) \
                .write_parquet(args.out)
            print(json.dumps({"out": args.out,
                              "sec": round(time.time() - t0, 2)}))
        elif args.cmd == "eval":
            from .evalx import confusion_counts, prf_from_confusion
            conf = confusion_counts(run_extraction(args.corpus))
            prf = prf_from_confusion(conf)
            print(prf.to_string(index=False))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
