"""Interchange source/sink coverage beyond parquet: line-delimited
JSON. The round-trip operator proves the JSONL read AND write paths
are lossless by aggregating a content checksum after the round-trip —
the DuckDB oracle computes the same aggregate from the original
parquet, so a hash-green row certifies both directions at once.

The Dataset shape holds at 100 TB (`write_json` emits one file per
block — the resumable partitioned-output layout — and `read_json`
streams them back block-per-file; nothing is driver-materialized),
but the STORAGE must be shared: on a multi-node cluster write tasks
land on each executing node's filesystem, so `out_dir` must point at
object storage / a shared mount, never a node-local path. The default
tempdir is therefore a single-node (test/CI) convenience only, and
cleanup of a caller-supplied `out_dir` is the caller's job.
"""

from __future__ import annotations

import hashlib
import shutil
import tempfile

import pandas as pd
import pyarrow as pa

import ray.data as rd

from .._env import remote_args


def _lang_checksum_partial(t: pa.Table, with_chars: bool) -> pa.Table:
    """Per-batch (lang -> count, [sum_chars,] sum of 32-bit md5 text
    checksums) partial — THE certify reduce shared by every
    round-trip/rewrite operator in this module, so the two sinks can
    never silently diverge."""
    langs = t.column("lang").to_pylist()
    texts = t.column("text").to_pylist()
    nch = t.column("n_chars").to_pylist() if with_chars \
        else [0] * len(langs)
    agg: dict = {}
    for lg, x, c in zip(langs, texts, nch):
        cs = int(hashlib.md5(x.encode()).hexdigest()[:8], 16)
        n, s, k = agg.get(lg, (0, 0, 0))
        agg[lg] = (n + 1, s + int(c), k + cs)
    cols = {"lang": pa.array(list(agg.keys()), pa.string()),
            "n_docs": pa.array([v[0] for v in agg.values()],
                               pa.int64())}
    if with_chars:
        cols["sum_chars"] = pa.array([v[1] for v in agg.values()],
                                     pa.int64())
    cols["checksum"] = pa.array([v[2] for v in agg.values()],
                                pa.int64())
    return pa.table(cols)


def documents_jsonl_stats(sf_dir: str,
                          out_dir: str | None = None) -> pd.DataFrame:
    """Write the documents table to sharded JSONL, read it back, and
    aggregate per language: row count, total chars, and the sum of a
    32-bit md5 text checksum (int64 — overflow-free at any corpus
    size the sum fits ~2^31 rows * 2^32; exact integer reduce). Equal
    output to the parquet-side oracle == the JSONL round-trip
    preserved every text byte, every lang tag, and every n_chars
    value. Returns (lang, n_docs, sum_chars, checksum), ordered by
    lang."""
    from ray.data.aggregate import Sum
    own_dir = out_dir is None
    if own_dir:
        out_dir = tempfile.mkdtemp(prefix="erex_jsonl_")
    try:
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "lang",
                                      "n_chars"])
        ds.write_json(out_dir)
        back = rd.read_json(out_dir)

        def partial(t: pa.Table) -> pa.Table:
            return _lang_checksum_partial(t, with_chars=True)

        res = (back.map_batches(partial, batch_format="pyarrow",
                                **remote_args())
               .groupby("lang")
               .aggregate(Sum("n_docs", alias_name="n_docs"),
                          Sum("sum_chars", alias_name="sum_chars"),
                          Sum("checksum", alias_name="checksum"))
               .to_pandas())
        return res.sort_values("lang").reset_index(drop=True)
    finally:
        if own_dir:
            shutil.rmtree(out_dir, ignore_errors=True)


def compact_parquet(sf_dir: str, out_dir: str | None = None,
                    target_blocks: int = 4) -> pd.DataFrame:
    """Small-file compaction — the maintenance operator every
    long-running lakehouse pipeline needs: read a (potentially
    many-small-files) parquet table, `repartition` to a bounded block
    count, and write back one file per block. The certify aggregate
    (per-lang counts + the same int64 md5 checksum reduce as the JSONL
    round-trip) is computed from the COMPACTED copy, so a hash-green
    row proves the rewrite was lossless. Same shared-storage caveat
    as documents_jsonl_stats. Returns (lang, n_docs, checksum, n_files)
    ordered by lang — n_files is the post-compaction file count, the
    compaction's own success metric."""
    import os

    from ray.data.aggregate import Sum
    own_dir = out_dir is None
    if own_dir:
        out_dir = tempfile.mkdtemp(prefix="erex_compact_")
    try:
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "lang"])
        ds.repartition(target_blocks).write_parquet(out_dir)
        n_files = sum(1 for f in os.listdir(out_dir)
                      if f.endswith(".parquet"))
        back = rd.read_parquet(out_dir)

        def partial(t: pa.Table) -> pa.Table:
            return _lang_checksum_partial(t, with_chars=False)

        out = (back.map_batches(partial, batch_format="pyarrow",
                                **remote_args())
               .groupby("lang")
               .aggregate(Sum("n_docs", alias_name="n_docs"),
                          Sum("checksum", alias_name="checksum"))
               .to_pandas())
        out["n_files"] = pd.Series([n_files] * len(out), dtype="int64")
        return out.sort_values("lang").reset_index(drop=True)
    finally:
        if own_dir:
            shutil.rmtree(out_dir, ignore_errors=True)
