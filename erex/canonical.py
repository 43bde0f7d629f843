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


# --- fuzzy cross-document entity resolution ------------------------------

ER_THRESHOLD_MILLI = 600
ER_MAX_BLOCK = 10_000


def _er_norm(surface: str) -> str:
    # the ONE canonical lowercase tokenizer (see erex.ops.text) so ER
    # normalization can never drift from the dedup/text operators
    from .ops.text import LOWER_TOKEN_RE
    return " ".join(LOWER_TOKEN_RE.findall(surface.lower()))


def _char3(s: str) -> frozenset:
    if len(s) < 3:
        return frozenset((s,)) if s else frozenset()
    return frozenset(s[i:i + 3] for i in range(len(s) - 2))


def _er_cluster_block(keys: list, norms: list,
                      threshold_milli: int) -> list:
    """Union-find inside ONE block: all-pairs char-3-gram Jaccard.
    Blocks are prefix-bounded, so this quadratic stays local and
    small; the caller guards oversize blocks."""
    sets = [_char3(n) for n in norms]
    parent = list(range(len(keys)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            a, b = sets[i], sets[j]
            if not a or not b:
                continue
            inter = len(a & b)
            union = len(a | b)
            if 1000 * inter // union >= threshold_milli:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    roots = [find(i) for i in range(len(keys))]
    ent = {}
    for i, r in enumerate(roots):
        cur = ent.get(r)
        if cur is None or keys[i] < cur:
            ent[r] = keys[i]
    return [ent[r] for r in roots]


def entity_resolution(nodes: "rd.Dataset",
                      threshold_milli: int = ER_THRESHOLD_MILLI,
                      max_block: int = ER_MAX_BLOCK):
    """Fuzzy cross-document entity linking over the canonical node
    table: nodes of the same kind whose normalized surfaces are
    char-3-gram-Jaccard-similar link into one entity (entity_id = min
    node_key in the cluster). Classic blocking design for scale:

    - BLOCK by (node_kind, 2-char normalized prefix): similarity is
      only ever computed inside a block, so clusters never span
      blocks and labeling is block-local — NO global union-find, no
      iterative label exchange; every block resolves independently.
    - the only exchange is one fixed-width shard groupby (blocks
      hash-shard; a per-block groupby would hit Ray's tiny-group
      cost); each shard runs its blocks' in-block matching in bulk.
    - oversize blocks (> max_block nodes; degenerate prefixes at web
      scale) fall back LOUDLY-DOCUMENTED to exact-normalized-equality
      clustering instead of the quadratic match, bounding worst-case
      cost at O(max_block^2) per block.

    Recall trade (documented): near-dup surfaces disagreeing in their
    first two normalized chars land in different blocks and never
    link — the standard blocking-key compromise. Returns a pandas
    frame (node_key, entity_id) sorted by node_key."""
    import hashlib

    import pandas as pd

    from ._env import default_shard_count
    nsh = default_shard_count()

    def prep(t: pa.Table) -> pa.Table:
        keys = t.column("node_key").to_pylist()
        kinds = t.column("node_kind").to_pylist()
        surfs = t.column("surface").to_pylist()
        norms = [_er_norm(s) for s in surfs]
        blocks = [k + "|" + n[:2] for k, n in zip(kinds, norms)]
        shards = [int(hashlib.md5(b.encode()).hexdigest()[:4], 16) % nsh
                  for b in blocks]
        return pa.table({"node_key": pa.array(keys, pa.string()),
                         "norm": pa.array(norms, pa.string()),
                         "block": pa.array(blocks, pa.string()),
                         "bshard": pa.array(shards, pa.int32())})

    def resolve_shard(g: "pd.DataFrame") -> "pd.DataFrame":
        out_keys, out_ents = [], []
        for _b, sub in g.groupby("block", sort=False):
            keys = sub["node_key"].tolist()
            norms = sub["norm"].tolist()
            if len(keys) > max_block:
                ents = {}
                for k, n in zip(keys, norms):
                    cur = ents.get(n)
                    if cur is None or k < cur:
                        ents[n] = k
                out_keys.extend(keys)
                out_ents.extend(ents[n] for n in norms)
            else:
                out_keys.extend(keys)
                out_ents.extend(_er_cluster_block(keys, norms,
                                                  threshold_milli))
        return pd.DataFrame({"node_key": out_keys,
                             "entity_id": out_ents})

    out = (nodes.map_batches(prep, batch_format="pyarrow",
                             **remote_args())
           .groupby("bshard")
           .map_groups(resolve_shard, batch_format="pandas",
                       **remote_args()))
    df = out.to_pandas()
    return df.sort_values("node_key").reset_index(drop=True)
