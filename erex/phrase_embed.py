"""F14: phrase-embedding features (experiment-only; documented seam).

Re-derives PairFeatureVector.addPhraseFeatureToVector
(/root/reference/src/model/feature/PairFeatureVector.java:3378-3445) and
getWholeChunkToken (:284-314).  The reference obtains its vectors from a
word2vec HTTP service at a hard-coded private address
(getPhraseEmbedding, :3448-3480) that no longer exists and whose model
file never shipped — exact parity is impossible by construction.  The
EMBEDDING FUNCTION is therefore a seam: `phrase_embedding` is a
deterministic md5-seeded unit vector of fixed dimension, and a real
word2vec / sentence-encoder drop-in replaces ONE function without
touching the feature assembly (the same pattern as the multimodal codec
seam in ops/multimodal.py).  Everything around the seam is the
reference's behavior:

- tempMarkerTextPhrase embeds getTemporalMarkerFeature's text — the
  connective-first-then-signal marker (:1758-1774), with event-timex
  pairs degenerating to the "O" marker for DCT/empty/cross-sentence;
- a marker text of "O" still contributes a vector-sized block, but
  zero-filled (:3393-3406 — note the reference still calls the service
  for "O"; the block width is the service dim either way);
- causMarkerTextPhrase embeds getCausalMarkerFeature's text
  (signal-then-verb, :1776-1783) with the same zero-fill rule;
- tokenChunk embeds the WHOLE-CHUNK text of both entities back-to-back
  with NO zero branch (:3428-3441);
- getWholeChunkToken walks the B-/I- chunk run around the entity's
  start token, collecting only tokens whose phrase type matches, and
  falls back to the entity's own (deduped, space-joined) token text
  when the start token carries no chunk tag; DCT/empty timexes yield
  "O" (:284-314).  The reference's unguarded walk past the token array
  would throw at document edges; we stop at the boundary (documented
  divergence — reachable only on malformed final sentences).
"""

from __future__ import annotations

import hashlib

import numpy as np

from .doc import Doc, Entity
from .features import (Marker, causal_signal_pair, causal_verb_pair,
                       connective_marker_pair, temporal_signal_pair)

PHRASE_EMBED_DIM = 32


def phrase_embedding(phrase: str, dim: int = PHRASE_EMBED_DIM,
                     cache: dict = None) -> np.ndarray:
    """Deterministic stand-in for the reference's word2vec service: an
    md5-seeded standard-normal vector, L2-normalized.  Stable across
    processes and platforms; swap this function for a real encoder.
    `cache` memoizes per (phrase, dim) — marker vocabulary is tiny,
    so an actor-held dict removes nearly every RandomState draw."""
    if cache is not None:
        hit = cache.get((phrase, dim))
        if hit is not None:
            return hit
    seed = int.from_bytes(
        hashlib.md5(phrase.encode("utf-8")).digest()[:4], "big")
    v = np.random.RandomState(seed).normal(size=dim)
    n = np.linalg.norm(v)
    v = v / n if n else v
    if cache is not None:
        cache[(phrase, dim)] = v
    return v


def temporal_marker_feature(doc: Doc, e1: Entity, e2: Entity,
                            pair_class: str) -> Marker:
    """getTemporalMarkerFeature (:1758-1774)."""
    if pair_class in ("et", "dct") and (
            (e2.is_timex and (e2.is_dct or e2.is_empty))
            or not doc.same_sentence(e1, e2)):
        return Marker()        # event-timex degenerate cases (:1762-1764)
    m = connective_marker_pair(doc, e1, e2, "Temporal")
    if m.text == "O":
        m = temporal_signal_pair(doc, e1, e2)
    return m


def causal_marker_feature(doc: Doc, e1: Entity, e2: Entity) -> Marker:
    """getCausalMarkerFeature (:1776-1783): signal first, verb second
    (the connective branch is commented out in the reference)."""
    m = causal_signal_pair(doc, e1, e2)
    if m.text == "O":
        m = causal_verb_pair(doc, e1, e2)
    return m


def whole_chunk_token(doc: Doc, e: Entity) -> str:
    """getWholeChunkToken (:284-314)."""
    if e.is_timex:
        if e.is_dct or e.is_empty:
            return "O"
        return doc.entity_token_attr(e, "text")
    tok = doc.tokens[e.start_tok]
    chunk = tok.chunk
    if not ("B-" in chunk or "I-" in chunk):
        # the untagged else-branch adds ONLY the start token's text
        # (:338-340), not the entity's full deduped span — multi-token
        # events whose start token carries no chunk tag embed just that
        # token (the timex branch above keeps entity_token_attr)
        return tok.text
    phrase = chunk[2:]
    parts = [tok.text]
    n = len(doc.token_arr)

    def _at(i):
        return doc.tokens[doc.token_arr[i]] if 0 <= i < n else None

    i = tok.index + 1
    nxt = _at(i)
    while nxt is not None and "I-" in nxt.chunk:
        if nxt.chunk[2:] == phrase:
            parts.append(nxt.text)
        i += 1
        nxt = _at(i)
    if "I-" in chunk:
        # also walk backwards to the run's B- head (:321-336)
        i = tok.index - 1
        prev = _at(i)
        while prev is not None and "I-" in prev.chunk:
            if prev.chunk[2:] == phrase:
                parts.insert(0, prev.text)
            i -= 1
            prev = _at(i)
        if prev is not None and "B-" in prev.chunk \
                and prev.chunk[2:] == phrase:
            parts.insert(0, prev.text)
    return " ".join(parts)


def phrase_feature_block(doc: Doc, e1: Entity, e2: Entity,
                         feature: str, pair_class: str = "ee",
                         dim: int = PHRASE_EMBED_DIM,
                         cache: dict = None):
    """-> (names, float32 vector) for one of the three FeatureName
    cases of addPhraseFeatureToVector."""
    if feature == "tempMarkerTextPhrase":
        m = temporal_marker_feature(doc, e1, e2, pair_class)
        vec = (np.zeros(dim) if m.text == "O"
               else phrase_embedding(m.text, dim, cache))
        names = ["tempmark_embed_%d" % i for i in range(dim)]
    elif feature == "causMarkerTextPhrase":
        m = causal_marker_feature(doc, e1, e2)
        vec = (np.zeros(dim) if m.text == "O"
               else phrase_embedding(m.text, dim, cache))
        names = ["causmark_embed_%d" % i for i in range(dim)]
    elif feature == "tokenChunk":
        # no zero branch: even "O" chunks are embedded (:3428-3441)
        vec = np.concatenate([
            phrase_embedding(whole_chunk_token(doc, e1), dim, cache),
            phrase_embedding(whole_chunk_token(doc, e2), dim,
                             cache)])
        names = ["tokenchunk_embed_%d" % i for i in range(2 * dim)]
    else:
        raise ValueError("unknown phrase feature: %r" % feature)
    return names, vec.astype(np.float32)


class PhraseFeatureStage:
    """Actor-pool map_batches stage: append phrase-embedding columns to
    pair rows.  The (tiny) per-phrase embedding cache lives per actor;
    at scale a real encoder would batch its forward pass here — the
    Ray-side shape (callable class, __init__-once state, columnar
    output) is the part this stage makes real."""

    def __init__(self, features=("tempMarkerTextPhrase",
                                 "causMarkerTextPhrase", "tokenChunk"),
                 dim: int = PHRASE_EMBED_DIM):
        self.features = tuple(features)
        self.dim = dim
        self._cache: dict = {}

    def __call__(self, batch):
        import pyarrow as pa
        from .txp import parse_txp
        rows = batch.to_pylist()
        docs: dict = {}
        out_cols: dict = {}
        width = {f: (2 * self.dim if f == "tokenChunk" else self.dim)
                 for f in self.features}
        blocks = {f: np.zeros((len(rows), width[f]), dtype=np.float32)
                  for f in self.features}
        for ri, r in enumerate(rows):
            d = docs.get(r["doc_path"])
            if d is None:
                d = docs[r["doc_path"]] = parse_txp(
                    r["content"], name=r["doc_path"])
            e1, e2 = d.entities[r["subj"]], d.entities[r["obj"]]
            for f in self.features:
                _names, vec = phrase_feature_block(
                    d, e1, e2, f, r.get("pair_class", "ee"), self.dim,
                    cache=self._cache)
                blocks[f][ri] = vec
        for f in self.features:
            for j in range(width[f]):
                pref = {"tempMarkerTextPhrase": "tempmark_embed_",
                        "causMarkerTextPhrase": "causmark_embed_",
                        "tokenChunk": "tokenchunk_embed_"}[f]
                out_cols[pref + str(j)] = pa.array(blocks[f][:, j])
        keep = {c: batch.column(c) for c in batch.column_names
                if c != "content"}
        return pa.table({**keep, **out_cols})
