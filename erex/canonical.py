"""Node canonicalization + graph materialization (A4 — the one true
corpus-wide shuffle).

The reference only dedups per document (Relation.equals ingest dedup,
TXPParser.java:413-415; HashSet 'extracted',
TimeBankDenseExperiments.java:1076). Corpus-scale KG construction adds:

- canonical NODES: mentions grouped by `(kind, canonical form)` — events
  by lemma surface, timexes by normalized TIMEX value — implemented as a
  pre-aggregated hash-partitioned groupby: each map_batches emits one
  partial row per key per batch (count, first-attrs), then a small
  groupby merges partials. This is the "pre-aggregate before the
  shuffle" pattern: the exchange moves one row per distinct key per
  block instead of one row per mention.
- canonical EDGES: `(subj_key, pred, obj_key)` counts across documents.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Min, Sum

from ._env import remote_args


def node_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregation of node mentions by canon key."""
    agg: dict = {}
    keys = batch.column("subj_key").to_pylist()
    kinds = batch.column("node_kind").to_pylist()
    surfaces = batch.column("surface").to_pylist()
    attrs = batch.column("attr").to_pylist()
    rkind = batch.column("kind").to_pylist()
    for k, nk, sf, at, rk in zip(keys, kinds, surfaces, attrs, rkind):
        if rk != "node":
            continue
        cur = agg.get(k)
        if cur is None:
            agg[k] = [nk, sf, at, 1]
        else:
            cur[3] += 1
    return pa.table({
        "node_key": pa.array(list(agg.keys()), pa.string()),
        "node_kind": pa.array([v[0] for v in agg.values()], pa.string()),
        "surface": pa.array([v[1] for v in agg.values()], pa.string()),
        "attr": pa.array([v[2] for v in agg.values()], pa.string()),
        "mentions": pa.array([v[3] for v in agg.values()], pa.int64()),
    })


def canonical_nodes(merged: "rd.Dataset") -> "rd.Dataset":
    """merged = output of pipeline.run_extraction (edge+node rows).
    Partial-aggregate inside map_batches, then one small groupby."""
    partials = merged.map_batches(node_partials, batch_format="pyarrow",
                                  **remote_args())
    return partials.groupby("node_key").aggregate(
        Sum("mentions", alias_name="mentions"),
        Min("node_kind", alias_name="node_kind"),
        Min("surface", alias_name="surface"),
        Min("attr", alias_name="attr"),
    )


def edge_partials(batch: pa.Table) -> pa.Table:
    agg: dict = {}
    cols = [batch.column(c).to_pylist()
            for c in ("kind", "subj_key", "pred", "obj_key", "consistent")]
    for rk, sk, pr, ok, cons in zip(*cols):
        if rk != "edge" or not cons:
            continue
        key = (sk, pr, ok)
        agg[key] = agg.get(key, 0) + 1
    return pa.table({
        "subj_key": pa.array([k[0] for k in agg], pa.string()),
        "pred": pa.array([k[1] for k in agg], pa.string()),
        "obj_key": pa.array([k[2] for k in agg], pa.string()),
        "n": pa.array(list(agg.values()), pa.int64()),
    })


def canonical_edges(merged: "rd.Dataset") -> "rd.Dataset":
    """Canonical (subj_key, pred, obj_key) edge table with support counts
    over consistent edges only."""
    partials = merged.map_batches(edge_partials, batch_format="pyarrow",
                                  **remote_args())
    return partials.groupby(["subj_key", "pred", "obj_key"]).aggregate(
        Sum("n", alias_name="support"))
