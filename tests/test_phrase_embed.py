"""F14 phrase-embedding features (erex/phrase_embed.py).

Reference: PairFeatureVector.addPhraseFeatureToVector (:3378-3445) +
getWholeChunkToken (:284-314). The embedding function itself is a
documented seam (the reference's word2vec HTTP service is gone); these
tests pin the behavior AROUND the seam."""

import numpy as np
import pyarrow as pa

from erex.corpus import generate_txp
from erex.phrase_embed import (PHRASE_EMBED_DIM, PhraseFeatureStage,
                               phrase_embedding, phrase_feature_block,
                               whole_chunk_token)
from erex.txp import parse_txp, parse_txp_lines


def test_embedding_deterministic_unit_norm():
    a = phrase_embedding("because of")
    assert a.shape == (PHRASE_EMBED_DIM,)
    assert np.allclose(a, phrase_embedding("because of"))
    assert abs(np.linalg.norm(a) - 1.0) < 1e-9
    assert not np.allclose(a, phrase_embedding("because"))


def _mk_doc(rows):
    """rows = [(token, sent, chunk, ev_id, ev_class)] -> Doc via the
    in-memory lines API (fields: DEFAULT_FIELDS order)."""
    lines = []
    for i, (tok, sent, chunk, ev, cls) in enumerate(rows):
        cols = ["O"] * 21
        cols[0], cols[1], cols[2] = tok, "t%d" % (i + 1), str(sent)
        cols[12] = chunk
        cols[11], cols[10] = ev, cls
        lines.append("\t".join(cols))
    lines.append("")
    return parse_txp_lines(lines)


def test_whole_chunk_token_b_walk():
    # entity on the B- token: collect the forward I- run of same phrase
    d = _mk_doc([("the", 1, "B-NP", "O", "O"),
                 ("quick", 1, "I-NP", "O", "O"),
                 ("fall", 1, "B-VP", "e1", "OCCURRENCE"),
                 ("apart", 1, "I-VP", "e1", "OCCURRENCE"),
                 ("now", 1, "I-NP", "O", "O"),  # wrong phrase: skipped
                 (".", 1, "O", "O", "O")])
    e1 = d.entities["e1"]
    assert whole_chunk_token(d, e1) == "fall apart"


def test_whole_chunk_token_i_walk_back_to_head():
    # entity on an I- token: walk forward AND backward to the B- head
    d = _mk_doc([("has", 1, "B-VP", "O", "O"),
                 ("been", 1, "I-VP", "O", "O"),
                 ("falling", 1, "I-VP", "e1", "OCCURRENCE"),
                 ("apart", 1, "I-VP", "O", "O"),
                 (".", 1, "O", "O", "O")])
    assert whole_chunk_token(d, d.entities["e1"]) == \
        "has been falling apart"


def test_whole_chunk_token_fallbacks():
    d = _mk_doc([("went", 1, "O", "e1", "OCCURRENCE"),
                 (".", 1, "O", "O", "O")])
    assert whole_chunk_token(d, d.entities["e1"]) == "went"
    # DCT yields "O"
    full = parse_txp(generate_txp(3), name="d3")
    assert whole_chunk_token(full, full.dct) == "O"


def test_whole_chunk_token_untagged_multitoken_uses_start_token():
    """The no-chunk-tag else-branch adds ONLY the start token's text
    (getWholeChunkToken :338-340), not the entity's full span — a
    multi-token event with an untagged start token embeds just that
    token."""
    rows = [("fall", 1, "O", "e1", "OCCURRENCE"),
            ("apart", 1, "O", "e1", "OCCURRENCE"),
            (".", 1, "O", "O", "O")]
    lines = []
    for i, (tok, sent, chunk, ev, cls) in enumerate(rows):
        cols = ["O"] * 21
        cols[0], cols[1], cols[2] = tok, "t%d" % (i + 1), str(sent)
        cols[12] = chunk
        cols[11], cols[10] = ev, cls
        lines.append("\t".join(cols))
    lines.append("")
    d = parse_txp_lines(lines)
    e1 = d.entities["e1"]
    assert e1.start_tok != e1.end_tok          # genuinely multi-token
    assert whole_chunk_token(d, e1) == "fall"


def test_zero_fill_quirk_markers_but_not_tokenchunk():
    """An 'O' marker still contributes a zero block of embed-dim width
    (:3393-3406); tokenChunk has no zero branch (:3428-3441)."""
    d = parse_txp(generate_txp(123), name="d")
    evs = [e for e in d.entities.values() if e.is_event]
    e1, e2 = evs[0], evs[1]
    names, vec = phrase_feature_block(d, e1, e2, "tempMarkerTextPhrase")
    assert len(names) == PHRASE_EMBED_DIM == vec.size
    names, vec = phrase_feature_block(d, e1, e2, "tokenChunk")
    assert len(names) == 2 * PHRASE_EMBED_DIM
    assert np.abs(vec).sum() > 0          # always embedded
    assert names[0] == "tokenchunk_embed_0"


def test_marker_embeds_when_signal_present():
    """A pair with a real temporal signal between them gets a nonzero
    tempmark block equal to the embedding of the marker text."""
    found = False
    for seed in range(40):
        d = parse_txp(generate_txp(seed), name="d%d" % seed)
        evs = [e for e in d.entities.values() if e.is_event]
        for i in range(len(evs)):
            for j in range(i + 1, len(evs)):
                _n, vec = phrase_feature_block(
                    d, evs[i], evs[j], "tempMarkerTextPhrase")
                if np.abs(vec).sum() > 0:
                    found = True
                    assert abs(np.linalg.norm(vec) - 1.0) < 1e-6
                    break
            if found:
                break
        if found:
            break
    assert found, "no synthetic pair with a temporal marker in 40 seeds"


def test_stage_appends_columns_drops_content():
    txp = generate_txp(123)
    d = parse_txp(txp, name="doc")
    evs = [e for e in d.entities.values() if e.is_event]
    batch = pa.table({
        "doc_path": ["doc"], "content": [txp],
        "subj": [evs[0].eid], "obj": [evs[1].eid],
        "pair_class": ["ee"],
    })
    out = PhraseFeatureStage()(batch)
    assert out.num_rows == 1
    assert "content" not in out.column_names
    got = set(out.column_names)
    for pref, width in (("tempmark_embed_", PHRASE_EMBED_DIM),
                        ("causmark_embed_", PHRASE_EMBED_DIM),
                        ("tokenchunk_embed_", 2 * PHRASE_EMBED_DIM)):
        assert {pref + str(i) for i in range(width)} <= got
