"""Ray Data pipeline wiring (SURVEY.md §3 canonical flagship shape).

    read_parquet(corpus)                                   # prune to `content`+keys
      -> map_batches(extract_pairs_batch)                  # stage 1, stateless tasks:
           parse TXP + mention model + rule sieves + pair features;
           emits PAIR and NODE rows keyed by doc_sha = sha256(content)
      -> map_batches(LinearScorer, concurrency=N)          # stage 2, actor pool:
           liblinear weight matrices loaded once per actor, one matmul
           per (class x batch) — vectorizes the reference's per-instance
           predict loop (EventEventRelationClassifier.java:296-310)
      -> groupby("doc_sha").map_groups(merge_group)        # stage 3, doc-local:
           anchor reasoning R4 + CLINK post-edit R6 + timegraph closure R7
      -> edges / nodes (canonicalization shuffle in erex.canonical)

Scale notes (100 TB design):
- stage 1 reads only the columns it needs; feature rows (not documents)
  are the unit that flows between stages, so a long document's quadratic
  pair fan-out rebalances across blocks instead of pinning one worker
  (the skew-salting strategy of SURVEY.md §4 — the pair explosion IS the
  salt);
- the only all-to-all exchanges are groupby(doc_sha) for the doc-local
  merge and groupby(canon_key) for node canonicalization;
- no driver-side materialization: every stage is batch-in/batch-out and
  the sinks are write_parquet.
"""

from __future__ import annotations

import functools
import hashlib
import json
import os

import numpy as np
import pyarrow as pa

import ray.data as rd

from ._env import remote_args
from .extract import (DENSE_FEAT_DIM, FEAT_DIM, PAIR_CAUSAL, PAIR_DCT,
                      PAIR_EE, PAIR_ET,
                      DEFAULT_CONFIG, PipelineConfig, attach_gold_tlink,
                      enumerate_pairs, get_models, merge_document,
                      process_pair, stage1_document)

# coarse shard for the doc-regrouping shuffle: grouping by doc_shard
# instead of doc_sha keeps the same doc-locality guarantee (a shard is a
# superset of whole documents) while avoiding per-tiny-group task
# overhead (thousands of map_groups calls); the merge loops over the
# documents inside one shard locally.
N_DOC_SHARDS = 256

# unified row schema flowing between the stages (nullable everywhere)
STAGE_SCHEMA = pa.schema([
    ("doc_sha", pa.string()),
    ("doc_rows", pa.int32()),         # rows stage 1 emitted for this doc —
                                      # the fused merge's completeness guard
    ("doc_shard", pa.int32()),
    ("salt_block", pa.int32()),       # salted path: pair-slice index
    ("content", pa.string()),         # salted path: doc text re-shipped
    ("doc_path", pa.string()),
    ("kind", pa.string()),            # 'pair' | 'node'
    ("src", pa.string()),
    ("tgt", pa.string()),
    ("pair_class", pa.string()),
    ("rule_label", pa.string()),
    ("cls_label", pa.string()),
    ("gold", pa.string()),
    ("gold_tlink", pa.string()),      # causal pairs: TXP gold TLINK type
                                      # (standalone CauseRelPro one-hot)
    ("feats", pa.list_(pa.float32())),
    ("src_kind", pa.string()),
    ("tgt_kind", pa.string()),
    ("src_form", pa.string()),        # canonical form of the src mention
    ("tgt_form", pa.string()),
    ("surface", pa.string()),         # node rows
    ("attr", pa.string()),
])

EDGE_SCHEMA = pa.schema([
    ("doc_sha", pa.string()),
    ("doc_path", pa.string()),
    ("kind", pa.string()),            # 'edge' | 'node'
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("pair_class", pa.string()),
    ("stage", pa.string()),
    ("consistent", pa.bool_()),
    ("gold", pa.string()),
    ("subj_key", pa.string()),
    ("obj_key", pa.string()),
    ("surface", pa.string()),
    ("attr", pa.string()),
    ("node_kind", pa.string()),
])


def _canon_form(kind: str, surface: str) -> str:
    """Canonical form for the node-canonicalization shuffle: events
    canonicalize by lemma surface, timexes by normalized value (A4)."""
    return f"{kind}|{surface}"


@functools.lru_cache(maxsize=1 << 16)
def _canon_key(form: str) -> str:
    """Canonical forms repeat heavily (lemma/value vocabulary is small
    relative to edge count) — memoized per worker process."""
    return hashlib.sha1(form.encode()).hexdigest()[:16]


def _corpus_rows(path: str):
    import pyarrow.parquet as _pq
    if os.path.isdir(path):
        return sum(_pq.read_metadata(os.path.join(path, f)).num_rows
                   for f in os.listdir(path) if f.endswith(".parquet"))
    return _pq.read_metadata(path).num_rows


def pick_docs_per_block(rows: int) -> int:
    """Batch sizing: big batches amortize per-task overhead (measured:
    128-doc batches raise 4->16 CPU scaling efficiency from 0.72 to
    0.94), but small corpora still need >= ~4 tasks per CPU."""
    import ray as _ray
    ncpu = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    return int(min(256, max(16, rows // (4 * ncpu) or 16)))


def read_corpus(path: str, docs_per_block: int = None) -> "rd.Dataset":
    """Prune at the read: only the key columns + content leave storage.
    Block count is forced to ~docs_per_block documents per block so task
    parallelism tracks the corpus size instead of parquet row-group
    layout (observed: a single file read as 18 blocks capped the whole
    fused pipeline at 18 tasks)."""
    try:
        rows = _corpus_rows(path)
        if docs_per_block is None:
            docs_per_block = pick_docs_per_block(rows)
        n_blocks = max(1, min(4096, rows // docs_per_block))
    except Exception:
        n_blocks = None
    return rd.read_parquet(path, columns=["repo", "path", "commit", "lang",
                                          "content"],
                           override_num_blocks=n_blocks)


def extract_pairs_batch(batch: pa.Table,
                        config: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Stage 1: per-document parse + rules + features. Pure function of
    the batch; all state is module-level dictionaries."""
    cols = {name: [] for name in STAGE_SCHEMA.names}
    contents = batch.column("content").to_pylist()
    paths = batch.column("path").to_pylist()
    # column-wise assembly (list comprehensions per field) — the former
    # per-row kwargs emit scanned all 20 schema names per row and was
    # ~16% of stage-1 CPU
    c_sha, c_shard, c_path = cols["doc_sha"], cols["doc_shard"], \
        cols["doc_path"]
    c_kind, c_src, c_tgt = cols["kind"], cols["src"], cols["tgt"]
    c_pc, c_rule, c_gold = cols["pair_class"], cols["rule_label"], \
        cols["gold"]
    c_gtl, c_feats = cols["gold_tlink"], cols["feats"]
    c_sk, c_tk = cols["src_kind"], cols["tgt_kind"]
    c_sf, c_tf = cols["src_form"], cols["tgt_form"]
    c_surface, c_attr = cols["surface"], cols["attr"]
    c_docrows = cols["doc_rows"]
    Q = ("?", "?")
    QT = ("TIMEX", "?")
    for content, dpath in zip(contents, paths):
        doc_sha = hashlib.sha256(content.encode()).hexdigest()
        shard = int(doc_sha[:4], 16) % N_DOC_SHARDS
        s1 = stage1_document(content, name=dpath, config=config)
        forms = {n["mention_id"]: (n["kind"], n["surface"])
                 for n in s1["nodes"]}
        ps = s1["pairs"]
        tts = list(s1["ttlinks"].items())
        nds = s1["nodes"]
        np_, nt, nn = len(ps), len(tts), len(nds)
        n_rows = np_ + nt + nn
        sforms = [forms.get(p["src"], Q) for p in ps]
        tforms = [forms.get(p["tgt"], Q) for p in ps]
        c_src += [p["src"] for p in ps]
        c_tgt += [p["tgt"] for p in ps]
        c_pc += [p["pair_class"] for p in ps]
        c_rule += [p["rule_label"] for p in ps]
        c_gold += [p["gold"] for p in ps]
        c_gtl += [p.get("gold_tlink") for p in ps]
        c_feats += [p["feats"] for p in ps]
        c_sk += [k for k, _ in sforms]
        c_tk += [k for k, _ in tforms]
        c_sf += ["%s|%s" % f for f in sforms]
        c_tf += ["%s|%s" % f for f in tforms]
        sforms = [forms.get(s, QT) for (s, _t), _ in tts]
        tforms = [forms.get(t, QT) for (_s, t), _ in tts]
        c_src += [s for (s, _t), _ in tts]
        c_tgt += [t for (_s, t), _ in tts]
        c_pc += ["tt"] * nt
        c_rule += [rel for _, rel in tts]
        c_gold += ["NONE"] * nt
        c_gtl += [None] * nt
        c_feats += [None] * nt
        c_sk += [k for k, _ in sforms]
        c_tk += [k for k, _ in tforms]
        c_sf += ["%s|%s" % f for f in sforms]
        c_tf += ["%s|%s" % f for f in tforms]
        c_src += [n["mention_id"] for n in nds]
        c_tgt += [None] * nn
        c_pc += [None] * nn
        c_rule += [None] * nn
        c_gold += [None] * nn
        c_gtl += [None] * nn
        c_feats += [None] * nn
        c_sk += [n["kind"] for n in nds]
        c_tk += [None] * nn
        c_sf += ["%s|%s" % (n["kind"], n["surface"]) for n in nds]
        c_tf += [None] * nn
        c_kind += ["pair"] * (np_ + nt) + ["node"] * nn
        c_surface += [None] * (np_ + nt) + [n["surface"] for n in nds]
        c_attr += [None] * (np_ + nt) + [n["attr"] for n in nds]
        c_sha += [doc_sha] * n_rows
        c_shard += [shard] * n_rows
        c_path += [dpath] * n_rows
        # stamp every row of this document with the doc's total row
        # count — the fused merge's completeness guard
        c_docrows += [n_rows] * n_rows
    n_total = len(c_sha)
    cols["cls_label"] = [None] * n_total
    cols["salt_block"] = [None] * n_total
    cols["content"] = [None] * n_total
    return _stage_table(cols)


def _stage_table(cols: dict) -> pa.Table:
    """Build the stage table; feats become one flat float32 buffer +
    offsets (no Python float lists in the hot path)."""
    feat_vals = cols.pop("feats")
    arrays = []
    for name in STAGE_SCHEMA.names:
        if name == "feats":
            offsets = np.zeros(len(feat_vals) + 1, dtype=np.int32)
            mask = np.zeros(len(feat_vals), dtype=bool)
            chunks = []
            for i, f in enumerate(feat_vals):
                if f is None:
                    mask[i] = True
                    offsets[i + 1] = offsets[i]
                else:
                    chunks.append(np.asarray(f, dtype=np.float32))
                    offsets[i + 1] = offsets[i] + len(f)
            flat = np.concatenate(chunks) if chunks else \
                np.empty(0, dtype=np.float32)
            arrays.append(pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(flat),
                mask=pa.array(mask)))
        else:
            arrays.append(pa.array(cols[name],
                                   STAGE_SCHEMA.field(name).type))
    return pa.Table.from_arrays(arrays, schema=STAGE_SCHEMA)


def extract_salted_batch(batch: pa.Table, salt_threshold: int,
                         config: PipelineConfig = DEFAULT_CONFIG
                         ) -> pa.Table:
    """Salted stage 1 (the explicit long-document skew mechanism):
    documents whose candidate-pair count exceeds `salt_threshold` emit
    one lightweight SALT row per pair-block (doc text + slice index)
    instead of inline features; tt/node rows still come from here. A
    shuffle repartition then spreads the salt rows, expand_salt_batch
    computes each slice's rules+features in whatever task got it, and
    the merge runs via the regroup path (salted rows break the
    doc-contiguity invariant by design)."""
    cols = {name: [] for name in STAGE_SCHEMA.names}

    def emit(**kw):
        for name in STAGE_SCHEMA.names:
            cols[name].append(kw.get(name))

    from .extract import tt_rule_grid
    from .txp import parse_txp
    for content, dpath in zip(batch.column("content").to_pylist(),
                              batch.column("path").to_pylist()):
        doc_sha = hashlib.sha256(content.encode()).hexdigest()
        shard = int(doc_sha[:4], 16) % N_DOC_SHARDS
        doc = parse_txp(content, name=dpath)
        ttlinks = tt_rule_grid(doc, config.identity_rel)
        cands = enumerate_pairs(doc, config)
        forms = {}
        for e in doc.entities.values():
            if e.is_event:
                forms[e.eid] = ("EVENT", doc.entity_token_attr(e, "lemma"))
            else:
                forms[e.eid] = ("TIMEX", e.value)
        if len(cands) <= salt_threshold:
            ps = [p for cand in cands
                  if (p := process_pair(doc, *cand, config=config))
                  is not None]
            attach_gold_tlink(doc, ps, config)
            for p in ps:
                sk, sf = forms.get(p["src"], ("?", "?"))
                tk, tf = forms.get(p["tgt"], ("?", "?"))
                emit(doc_sha=doc_sha, doc_shard=shard, doc_path=dpath,
                     kind="pair", src=p["src"], tgt=p["tgt"],
                     pair_class=p["pair_class"],
                     rule_label=p["rule_label"], gold=p["gold"],
                     gold_tlink=p.get("gold_tlink"),
                     feats=p["feats"], src_kind=sk, tgt_kind=tk,
                     src_form=_canon_form(sk, sf),
                     tgt_form=_canon_form(tk, tf))
        else:
            n_blocks = (len(cands) + salt_threshold - 1) // salt_threshold
            for b in range(n_blocks):
                # doc_rows=-1 marks "split by design": these rows are
                # only mergeable via the regroup shuffle, and the fused
                # merge_batch rejects them outright (not just when a
                # count happens to mismatch).
                emit(doc_sha=doc_sha, doc_shard=shard, doc_path=dpath,
                     kind="salt", salt_block=b, content=content,
                     doc_rows=-1)
        for (src, tgt), rel in ttlinks.items():
            sk, sf = forms.get(src, ("TIMEX", "?"))
            tk, tf = forms.get(tgt, ("TIMEX", "?"))
            emit(doc_sha=doc_sha, doc_shard=shard, doc_path=dpath,
                 kind="pair", src=src, tgt=tgt, pair_class="tt",
                 rule_label=rel, gold="NONE", src_kind=sk, tgt_kind=tk,
                 src_form=_canon_form(sk, sf), tgt_form=_canon_form(tk, tf))
        for e in doc.entities.values():
            kind, surface = forms[e.eid]
            attr = e.ev_class if e.is_event else e.ttype
            emit(doc_sha=doc_sha, doc_shard=shard, doc_path=dpath,
                 kind="node", src=e.eid, src_kind=kind, surface=surface,
                 attr=attr, src_form=_canon_form(kind, surface))
    return _stage_table(cols)


def expand_salt_batch(batch: pa.Table, salt_threshold: int,
                      config: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Expansion stage of the salted path: re-parse each SALT row's doc
    (parse is linear and cheap; the quadratic feature work is what the
    salt spreads) and process only its pair slice. Non-salt rows pass
    through unchanged."""
    kinds = batch.column("kind").to_pylist()
    if "salt" not in kinds:
        return batch
    from .txp import parse_txp
    keep = pa.array([k != "salt" for k in kinds])
    passthrough = batch.filter(keep)
    cols = {name: [] for name in STAGE_SCHEMA.names}

    def emit(**kw):
        for name in STAGE_SCHEMA.names:
            cols[name].append(kw.get(name))

    doc_cache: dict = {}
    for r in batch.filter(pa.array([k == "salt" for k in kinds])).to_pylist():
        key = r["doc_sha"]
        if key not in doc_cache:
            doc = parse_txp(r["content"], name=r["doc_path"])
            doc_cache[key] = (doc, enumerate_pairs(doc, config))
        doc, cands = doc_cache[key]
        lo = r["salt_block"] * salt_threshold
        hi = min(len(cands), lo + salt_threshold)
        forms = {}
        ps = [p for cand in cands[lo:hi]
              if (p := process_pair(doc, *cand, config=config)) is not None]
        attach_gold_tlink(doc, ps, config)
        for p in ps:
            for eid in (p["src"], p["tgt"]):
                if eid not in forms:
                    e = doc.entities[eid]
                    forms[eid] = ("EVENT", doc.entity_token_attr(e, "lemma"))                         if e.is_event else ("TIMEX", e.value)
            sk, sf = forms[p["src"]]
            tk, tf = forms[p["tgt"]]
            emit(doc_sha=r["doc_sha"], doc_shard=r["doc_shard"],
                 doc_path=r["doc_path"], kind="pair", doc_rows=-1,
                 src=p["src"],
                 tgt=p["tgt"], pair_class=p["pair_class"],
                 rule_label=p["rule_label"], gold=p["gold"],
                 gold_tlink=p.get("gold_tlink"),
                 feats=p["feats"], src_kind=sk, tgt_kind=tk,
                 src_form=_canon_form(sk, sf), tgt_form=_canon_form(tk, tf))
    return pa.concat_tables([passthrough, _stage_table(cols)])


def run_extraction_salted(corpus_path: str,
                          config: PipelineConfig = DEFAULT_CONFIG,
                          salt_threshold: int = 2000,
                          repartition_blocks: int = None) -> "rd.Dataset":
    """Skew-managed variant of run_extraction: pair-block salting for
    documents above `salt_threshold` candidates, an EXPLICIT shuffle
    repartition spreading the salted blocks across tasks, feature
    expansion, scoring, and the groupby(doc_shard) merge (required —
    salting breaks doc-contiguity). Same output as run_extraction,
    proven by tests; costs one extra all-to-all exchange, which is the
    price of balancing a pathological document."""
    ds = read_corpus(corpus_path)
    ds = ds.map_batches(
        lambda b: extract_salted_batch(b, salt_threshold, config),
        batch_format="pyarrow", **remote_args())
    if repartition_blocks is None:
        import ray as _ray
        ncpu = int(_ray.cluster_resources().get("CPU", 8))             if _ray.is_initialized() else 8
        repartition_blocks = 4 * ncpu
    ds = ds.repartition(repartition_blocks, shuffle=True)
    ds = ds.map_batches(
        lambda b: expand_salt_batch(b, salt_threshold, config),
        batch_format="pyarrow", **remote_args())
    score_fn = functools.partial(_score_batch_task, dense=config.dense,
                                 model_set=config.model_set)
    ds = ds.map_batches(score_fn, batch_format="pyarrow", **remote_args())
    ds = ds.groupby("doc_shard").map_groups(
        lambda g: _dict_encode(merge_shard(g, config)),
        batch_format="pyarrow", **remote_args())
    return ds


class LinearScorer:
    """Stage 2: the four weight matrices are loaded ONCE per actor (or
    once per worker process in task mode via the lru_cache), each batch
    costs one matmul per pair class.

    Two compute modes (run_extraction(scorer_mode=...)):
    - "tasks" (default): plain tasks + module-level model cache. The
      models are ~100 KB, so per-worker load cost is negligible and
      tasks avoid actor-pool spin-up latency (measured ~2-4 s per run
      at 32 CPUs) and fuse with the surrounding stages.
    - "actors": a classic actor pool — the right shape once the stage
      state is heavy (real model weights, embedding tables); kept
      first-class and tested."""

    def __init__(self, model_dir: str = None, dense: bool = False,
                 model_set: str = "reference"):
        self.models = get_models(model_dir, dense, model_set)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        kind = batch.column("kind").combine_chunks().to_numpy(
            zero_copy_only=False)
        pclass = batch.column("pair_class").fill_null("").combine_chunks()\
            .to_numpy(zero_copy_only=False)
        rule = batch.column("rule_label").fill_null("").combine_chunks()\
            .to_numpy(zero_copy_only=False)
        cls_label = np.full(n, None, dtype=object)
        feats = batch.column("feats").combine_chunks()
        for pc in (PAIR_DCT, PAIR_ET, PAIR_EE):
            idx = np.where((kind == "pair") & (pclass == pc)
                           & (rule == "O"))[0]
            if idx.size == 0:
                continue
            sub = feats.take(pa.array(idx))
            dims = DENSE_FEAT_DIM if self.models.dense else FEAT_DIM
            X = np.asarray(sub.flatten(), dtype=np.float32).reshape(
                idx.size, dims[pc])
            labels = self.models.for_class(pc).predict_labels(
                X, self.models.temporal_vocab)
            cls_label[idx] = labels
        i = batch.schema.get_field_index("cls_label")
        batch = batch.set_column(i, "cls_label", pa.array(cls_label,
                                                          pa.string()))
        # shrink the downstream payload: temporal features are consumed
        # here; only causal rows still need theirs at the merge stage.
        # Null-out via an Arrow take (no Python list round-trip).
        keep = (pclass == PAIR_CAUSAL)
        take_idx = pa.array(np.where(keep, np.arange(n), None),
                            pa.int64())
        feats_out = feats.take(take_idx)
        j = batch.schema.get_field_index("feats")
        return batch.set_column(j, "feats", feats_out)


def merge_batch(batch: pa.Table,
                config: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Stage 3 without a shuffle: stage 1 emits each document's rows
    contiguously into one output batch and operator fusion preserves
    batch boundaries, so every batch reaching this stage contains only
    WHOLE documents — the merge can run as a plain map_batches. Use
    `regroup=True` in run_extraction when that invariant is broken
    (e.g. pair-level salting of giant documents), which routes through
    groupby(doc_shard) instead.

    The invariant is GUARDED, not assumed: stage 1 stamps every row
    with its document's total row count (doc_rows), and any document
    arriving here with fewer rows than stamped raises instead of being
    silently merged as a half-document (wrong anchor maps / closure)."""
    counts: dict = {}
    for sha in batch.column("doc_sha").to_pylist():
        counts[sha] = counts.get(sha, 0) + 1
    shas = batch.column("doc_sha").to_pylist()
    expected = batch.column("doc_rows").to_pylist()
    if any(e == -1 for e in expected):
        raise RuntimeError(
            "fused merge received salted rows (doc_rows=-1): the salted "
            "topology splits documents by design, so its output is only "
            "mergeable through the groupby(doc_shard) regroup shuffle "
            "(run_extraction_salted does this; or run_extraction(..., "
            "regroup=True)).")
    bad = {}
    for sha, exp in zip(shas, expected):
        if exp is not None and counts[sha] != exp:
            bad[sha] = (counts[sha], exp)
    if bad:
        sha, (got, exp) = next(iter(bad.items()))
        raise RuntimeError(
            f"fused merge received a split document: doc {sha[:12]} has "
            f"{got} of {exp} stage-1 rows in this batch ({len(bad)} "
            "affected doc(s)). The execution plan re-chunked between the "
            "fused stages; rerun with run_extraction(..., regroup=True) "
            "to route the merge through the explicit groupby(doc_shard) "
            "shuffle.")
    return merge_shard(batch, config)


def _decode_pylist(col: "pa.ChunkedArray") -> list:
    """ChunkedArray -> Python list, decoding through a dictionary when
    the column is low-cardinality (every _MERGE_COLS string column is:
    labels, entity ids, forms — measured 6-8x faster than to_pylist,
    which allocates a fresh str per row; the dictionary path re-uses
    one str object per distinct value)."""
    arr = col.combine_chunks()
    if not pa.types.is_string(arr.type) or len(arr) < 2048:
        return arr.to_pylist()
    d = arr.dictionary_encode()
    vals = d.dictionary.to_pylist()
    if len(vals) * 8 > len(arr):        # high cardinality: no win
        return arr.to_pylist()
    vals.append(None)                   # null sentinel slot
    idx = d.indices.fill_null(len(vals) - 1).to_numpy()
    return [vals[i] for i in idx]


def merge_shard(shard: pa.Table,
                config: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Stage 3 task: one shard's rows -> final edge + node rows for every
    document in the shard (documents are processed independently).

    Columnar row assembly: scalar columns convert once per batch and the
    feats list column stays a zero-copy numpy view sliced per row —
    Table.to_pylist() materialized every feature float as a Python
    object (~40% of merge wall-time)."""
    cols = {n: _decode_pylist(shard.column(n)) for n in _MERGE_COLS}
    feats = shard.column("feats").combine_chunks()
    flat = np.asarray(feats.values, dtype=np.float32)
    offs = np.asarray(feats.offsets)
    valid = np.asarray(feats.is_valid())
    by_doc: dict = {}
    for i, sha in enumerate(cols["doc_sha"]):
        lst = by_doc.get(sha)
        if lst is None:
            by_doc[sha] = lst = []
        lst.append(i)
    out_tables = [_merge_doc_columnar(cols, idxs, flat, offs, valid, config)
                  for idxs in by_doc.values()]
    return pa.concat_tables(out_tables)


# the only stage-schema columns the merge actually consumes; skipping
# the rest (content, doc_rows, doc_shard, salt_block) avoids
# materializing them as Python objects
_MERGE_COLS = ("doc_sha", "doc_path", "kind", "src", "tgt", "pair_class",
               "rule_label", "cls_label", "gold", "gold_tlink",
               "src_form", "tgt_form", "surface", "attr", "src_kind")


def _merge_doc_columnar(cols: dict, idxs: list, flat, offs, valid,
                        config: PipelineConfig) -> pa.Table:
    """One document's merge from columnar inputs: per-pair dicts are
    built only for the rows merge_document needs, and the output table
    is assembled column-by-column (list comprehensions) instead of a
    per-row kwargs emit — both measured hot spots of the fused merge."""
    models = get_models(dense=config.dense, model_set=config.model_set)
    i0 = idxs[0]
    doc_sha = cols["doc_sha"][i0]
    doc_path = cols["doc_path"][i0]
    kind = cols["kind"]
    src = cols["src"]
    tgt = cols["tgt"]
    pclass = cols["pair_class"]
    rule = cols["rule_label"]
    cls_l = cols["cls_label"]
    gold_c = cols["gold"]
    gold_t = cols["gold_tlink"]
    sform = cols["src_form"]
    tform = cols["tgt_form"]
    forms: dict = {}
    pairs, ttlinks, node_idx = [], {}, []
    for i in idxs:
        if kind[i] == "node":
            node_idx.append(i)
            forms[src[i]] = sform[i]
            continue
        forms[src[i]] = sform[i]
        forms[tgt[i]] = tform[i]
        if pclass[i] == "tt":
            ttlinks[(src[i], tgt[i])] = rule[i]
        else:
            pairs.append({
                "src": src[i], "tgt": tgt[i], "pair_class": pclass[i],
                "rule_label": rule[i], "cls_label": cls_l[i],
                "gold": gold_c[i], "gold_tlink": gold_t[i],
                "feats": flat[offs[i]:offs[i + 1]] if valid[i] else None})
    triples = merge_document(pairs, ttlinks, models, config)
    ne, nn = len(triples), len(node_idx)
    n = ne + nn
    none_e = [None] * ne
    none_n = [None] * nn
    out = {
        "doc_sha": [doc_sha] * n,
        "doc_path": [doc_path] * n,
        "kind": ["edge"] * ne + ["node"] * nn,
        "subj": [t["src"] for t in triples] + [src[i] for i in node_idx],
        "pred": [t["label"] for t in triples] + none_n,
        "obj": [t["tgt"] for t in triples] + none_n,
        "pair_class": [t["pair_class"] for t in triples] + none_n,
        "stage": [t["stage"] for t in triples] + none_n,
        "consistent": [t["consistent"] for t in triples] + none_n,
        "gold": [t["gold"] for t in triples] + none_n,
        "subj_key": [_canon_key(forms.get(t["src"], t["src"]))
                     for t in triples]
                    + [_canon_key(sform[i]) for i in node_idx],
        "obj_key": [_canon_key(forms.get(t["tgt"], t["tgt"]))
                    for t in triples] + none_n,
        "surface": none_e + [cols["surface"][i] for i in node_idx],
        "attr": none_e + [cols["attr"][i] for i in node_idx],
        "node_kind": none_e + [cols["src_kind"][i] for i in node_idx],
    }
    return pa.Table.from_pydict(out, schema=EDGE_SCHEMA)


def merge_group(group: pa.Table,
                config: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Stage 3 for a single document's rows (kept for tests/oracle)."""
    return merge_group_rows(group.to_pylist(), config)


def merge_group_rows(rows: list,
                     config: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """One document's stage-2 rows -> final edge + node rows. Models for
    the causal head come from the module-level cache (tiny, loaded once
    per worker process)."""
    models = get_models(dense=config.dense, model_set=config.model_set)
    doc_sha = rows[0]["doc_sha"]
    doc_path = rows[0]["doc_path"]
    forms: dict = {}
    pairs, ttlinks, nodes = [], {}, []
    for r in rows:
        if r["kind"] == "node":
            nodes.append(r)
            forms[r["src"]] = r["src_form"]
            continue
        forms[r["src"]] = r["src_form"]
        forms[r["tgt"]] = r["tgt_form"]
        if r["pair_class"] == "tt":
            ttlinks[(r["src"], r["tgt"])] = r["rule_label"]
        else:
            pairs.append({"src": r["src"], "tgt": r["tgt"],
                          "pair_class": r["pair_class"],
                          "rule_label": r["rule_label"],
                          "cls_label": r["cls_label"],
                          "gold": r["gold"], "gold_tlink": r["gold_tlink"],
                          "feats": r["feats"]})
    triples = merge_document(pairs, ttlinks, models, config)
    out = {name: [] for name in EDGE_SCHEMA.names}

    def emit(**kw):
        for name in EDGE_SCHEMA.names:
            out[name].append(kw.get(name))

    for t in triples:
        emit(doc_sha=doc_sha, doc_path=doc_path, kind="edge",
             subj=t["src"], pred=t["label"], obj=t["tgt"],
             pair_class=t["pair_class"], stage=t["stage"],
             consistent=t["consistent"], gold=t["gold"],
             subj_key=_canon_key(forms.get(t["src"], t["src"])),
             obj_key=_canon_key(forms.get(t["tgt"], t["tgt"])))
    for nd in nodes:
        emit(doc_sha=doc_sha, doc_path=doc_path, kind="node",
             subj=nd["src"], subj_key=_canon_key(nd["src_form"]),
             surface=nd["surface"], attr=nd["attr"],
             node_kind=nd["src_kind"])
    return pa.Table.from_pydict(out, schema=EDGE_SCHEMA)


# low-cardinality columns dictionary-encoded in the final output blocks:
# halves the bytes written to the object store / parquet (the dominant
# distributed overhead once compute is optimized)
_DICT_COLS = ("doc_sha", "doc_path", "kind", "pred", "pair_class", "stage",
              "gold", "node_kind")


def _dict_encode(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    for name in _DICT_COLS:
        i = t.schema.get_field_index(name)
        if i >= 0 and not pa.types.is_dictionary(t.schema.field(i).type):
            t = t.set_column(i, name,
                             pc.dictionary_encode(t.column(i).combine_chunks()))
    return t


def _score_batch_task(batch: pa.Table, dense: bool = False,
                      model_set: str = "reference") -> pa.Table:
    """Task-mode scorer: model matrices come from the per-process
    lru_cache (loaded once per Ray worker)."""
    return LinearScorer(dense=dense, model_set=model_set)(batch)


def run_extraction(corpus_path: str,
                   config: PipelineConfig = DEFAULT_CONFIG,
                   scorer_concurrency=None,
                   parse_batch_size: int = None,
                   regroup: bool = False,
                   scorer_mode: str = "tasks",
                   _inject_rechunk: int = 0) -> "rd.Dataset":
    """The flagship dataset: corpus parquet -> final edge/node rows.
    Lazy — callers consume via write/aggregate/iter.

    regroup=False (default): the per-document merge runs fused on the
    doc-complete batches (no shuffle). regroup=True: an explicit
    groupby(doc_shard) re-groups rows first — required only when an
    upstream stage may split a document across batches.

    _inject_rechunk (TEST-ONLY): repartition between the scorer and the
    merge, simulating an execution plan that re-chunks between the
    fused stages (what a Ray version behavior change could do); used to
    prove the guard + run_extraction_auto fallback end-to-end."""
    if parse_batch_size is None:
        try:
            parse_batch_size = pick_docs_per_block(_corpus_rows(corpus_path))
        except Exception:
            parse_batch_size = 64
    ds = read_corpus(corpus_path, docs_per_block=parse_batch_size)
    ds = ds.map_batches(lambda b: extract_pairs_batch(b, config),
                        batch_format="pyarrow",
                        batch_size=parse_batch_size, **remote_args())
    # NOTE: no batch_size on the scorer — this operator fuses with the
    # parse stage, and a large row-count batch_size would coalesce the
    # whole input into one task (observed: 1 task for the full corpus).
    # Under fusion the scorer receives the parse stage's output batches
    # (pairs of ~batch_size documents) directly.
    if scorer_mode == "actors":
        if scorer_concurrency is None:
            import ray as _ray
            ncpu = int(_ray.cluster_resources().get("CPU", 8)) \
                if _ray.is_initialized() else 8
            scorer_concurrency = (1, max(2, ncpu))
        ds = ds.map_batches(LinearScorer, batch_format="pyarrow",
                            fn_constructor_kwargs={
                                "dense": config.dense,
                                "model_set": config.model_set},
                            concurrency=scorer_concurrency,
                            **remote_args())
    else:
        score_fn = functools.partial(_score_batch_task, dense=config.dense,
                                     model_set=config.model_set)
        ds = ds.map_batches(score_fn, batch_format="pyarrow",
                            **remote_args())
    if _inject_rechunk:
        ds = ds.repartition(_inject_rechunk)
    if regroup:
        ds = ds.groupby("doc_shard").map_groups(
            lambda g: _dict_encode(merge_shard(g, config)),
            batch_format="pyarrow", **remote_args())
    else:
        ds = ds.map_batches(lambda b: _dict_encode(merge_batch(b, config)),
                            batch_format="pyarrow", **remote_args())
    return ds


_SPLIT_GUARD_MARKERS = ("fused merge received a split document",
                        "fused merge received salted rows")


def _is_split_guard_error(e: BaseException) -> bool:
    return any(m in str(e) for m in _SPLIT_GUARD_MARKERS)


def run_extraction_auto(corpus_path: str,
                        config: PipelineConfig = DEFAULT_CONFIG,
                        consume=None, **kw):
    """Fused-merge flagship with AUTOMATIC regroup fallback: build the
    no-shuffle plan, trigger execution via `consume`; if the
    split-document guard trips (the execution plan re-chunked between
    the fused stages — e.g. a Ray version behavior change), rebuild the
    pipeline through the explicit groupby(doc_shard) regroup and
    consume again. No user intervention, exact same output (tested via
    the _inject_rechunk hook).

    consume: callable(Dataset) -> result that triggers execution
    (write_parquet, to_pandas, materialize); it must be restartable —
    a partitioned parquet sink should clear its output dir first.
    Defaults to Dataset.materialize() (the output edge/node table is
    far smaller than the input corpus, and execution has to be
    observed here for the guard to be catchable)."""
    kw.pop("regroup", None)
    if consume is None:
        def consume(ds):
            return ds.materialize()
    try:
        return consume(run_extraction(corpus_path, config,
                                      regroup=False, **kw))
    except Exception as e:          # ray wraps the guard RuntimeError
        if not _is_split_guard_error(e):
            raise
        return consume(run_extraction(corpus_path, config,
                                      regroup=True, **kw))


def edges_only(ds: "rd.Dataset") -> "rd.Dataset":
    return ds.filter(expr="kind == 'edge'")


# ---------------------------------------------------------------------------
# resumable partitioned output (SURVEY.md §4 checkpoint/resume)
# ---------------------------------------------------------------------------
def write_edges(ds: "rd.Dataset", out_dir: str, n_buckets: int = 64) -> None:
    """Partitioned parquet layout `bucket=XX/` (hash(doc_sha) % B) so a
    rerun can skip or re-do individual buckets; never one giant file."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        shas = batch.column("doc_sha").to_pylist()
        buckets = [int(s[:8], 16) % n_buckets for s in shas]
        return batch.append_column("bucket", pa.array(buckets, pa.int32()))
    ds.map_batches(add_bucket, batch_format="pyarrow",
                   **remote_args()).write_parquet(
        out_dir, partition_cols=["bucket"])


def run_flagship_resumable(corpus_path: str, out_dir: str,
                           config: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """Fragment-level checkpointing: each input parquet fragment is an
    atomic unit of work with a manifest entry `_manifest/<sha>.json`;
    a rerun anti-joins the manifest and processes only missing
    fragments. Returns run metrics."""
    import pyarrow.dataset as pads
    man_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(man_dir, exist_ok=True)
    frags = (sorted(f.path for f in pads.dataset(corpus_path).get_fragments())
             if os.path.isdir(corpus_path) else [corpus_path])
    done = {f[:-5] for f in os.listdir(man_dir) if f.endswith(".json")}
    metrics = {"fragments_total": len(frags), "fragments_skipped": 0,
               "rows_written": 0}
    for frag in frags:
        frag_id = hashlib.sha1(frag.encode()).hexdigest()[:16]
        if frag_id in done:
            metrics["fragments_skipped"] += 1
            continue
        ds = run_extraction(frag, config)
        part_dir = os.path.join(out_dir, f"frag={frag_id}")
        # a crash between write_parquet and the manifest marker leaves
        # stale files; a rerun would add new uniquely-named files beside
        # them and readers would see duplicated rows — clear first
        if os.path.isdir(part_dir):
            import shutil
            shutil.rmtree(part_dir)
        ds.write_parquet(part_dir)
        # per-partition metrics from the written files' parquet footers
        # (no recompute): row count = the partition's lineage record
        import pyarrow.parquet as pq
        rows = sum(pq.read_metadata(os.path.join(part_dir, f)).num_rows
                   for f in os.listdir(part_dir)
                   if f.endswith(".parquet"))
        metrics["rows_written"] += rows
        # manifest written only after a successful write (atomic rename)
        meta = {"fragment": frag, "frag_id": frag_id, "rows": rows}
        tmp = os.path.join(man_dir, frag_id + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(man_dir, frag_id + ".json"))
    return metrics


def read_lineage(out_dir: str) -> "list[dict]":
    """The run's per-partition lineage: one manifest record per
    completed fragment (fragment path, frag_id, rows written).
    Manifests written before the rows field existed are backfilled
    lazily from the partition's parquet footers (reruns skip
    completed fragments, so old records are a supported state)."""
    import pyarrow.parquet as pq
    man_dir = os.path.join(out_dir, "_manifest")
    out = []
    for f in sorted(os.listdir(man_dir)):
        if not f.endswith(".json"):
            continue
        with open(os.path.join(man_dir, f)) as fh:
            rec = json.load(fh)
        if "rows" not in rec:
            part_dir = os.path.join(out_dir, "frag=" + rec["frag_id"])
            rec["rows"] = sum(
                pq.read_metadata(os.path.join(part_dir, p)).num_rows
                for p in os.listdir(part_dir)
                if p.endswith(".parquet")) \
                if os.path.isdir(part_dir) else 0
        out.append(rec)
    return out
