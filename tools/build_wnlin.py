#!/usr/bin/env python3
"""Build the vendored wnlin lexical database (erex/resources/wnlin/).

The sandbox has no ws4j jar and no WordNet distribution, so the real
NictWordNet data cannot be vendored.  Instead we ship a compact,
deterministic WordNet-SHAPED lexical database — hand-authored hypernym
taxonomy over the engine's working vocabulary (synthetic-corpus lemmas +
the reference example documents' event lemmas), with SemCor-style
information content computed from corpus frequencies — and run the REAL
ws4j Lin algorithm over it on both sides of the parity boundary
(erex/wnlin.py and tools/javaref/stubs/.../Lin.java read these same
files).  The algorithm is faithful (max over noun-noun/verb-verb synset
pairs of 2*IC(lcs)/(IC(s1)+IC(s2)), identical-synset -> 1.0, OOV -> 0);
only the data is synthetic, which the sandbox makes unavoidable.

Output (TSV, parsed identically by Python float() and Java
Double.parseDouble — all downstream arithmetic is IEEE-754 exact ops,
so scores are bit-identical across runtimes):
    synsets.tsv: synset_id \t pos \t parent_id \t ic
    words.tsv:   lemma \t pos \t synset_id[,synset_id...]

IC: count(synset) = 1 + corpus occurrences of each member lemma (every
occurrence credits every synset containing the lemma, as
WordNet::Similarity does for sense-untagged counts), cumulated up the
tree; ic = -ln(cum / cum(pos_root)); virtual per-POS roots get ic 0.
Frequency corpus: generate_txp(0..199) + the two reference example TXP
documents (the same corpus the javaref goldens are pinned on).
"""
import collections
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "erex", "resources", "wnlin")

# ---------------------------------------------------------------------------
# Taxonomy: synset -> (parent, [member lemmas]).  POS is the id prefix.
# Hypernym chains follow real-WordNet structure for the covered
# vocabulary (e.g. rise/surge under increase under change; say/claim
# under state under communicate), compressed to the working vocabulary.
# ---------------------------------------------------------------------------
VERBS = {
    "v.root": (None, []),
    # --- change ---
    "v.change": ("v.root", ["change", "become"]),
    "v.increase": ("v.change", ["increase", "grow", "boost"]),
    "v.rise": ("v.increase", ["rise", "surge"]),
    "v.decrease": ("v.change", ["cut", "trim", "ease", "slow",
                                "discount"]),
    "v.fall": ("v.decrease", ["fall", "drop", "slip", "plunge"]),
    "v.begin": ("v.change", ["begin", "start", "commence", "launch"]),
    "v.end": ("v.change", ["stop", "cease", "finish", "close"]),
    "v.continue": ("v.change", ["continue", "remain", "keep"]),
    "v.open": ("v.change", ["open"]),
    "v.expand": ("v.change", ["expand"]),
    # --- communication ---
    "v.communicate": ("v.root", []),
    "v.inform": ("v.communicate", ["report", "announce", "warn", "note",
                                   "document"]),
    "v.state": ("v.communicate", ["say", "state", "claim", "insist",
                                  "add", "voice", "quote", "characterize",
                                  "denounce", "downplay"]),
    "v.explain": ("v.communicate", ["account"]),
    "v.ask": ("v.communicate", ["ask"]),
    "v.refuse": ("v.communicate", ["refuse"]),
    "v.call": ("v.communicate", ["call"]),
    "v.agree": ("v.communicate", ["agree", "accord"]),
    "v.approve": ("v.agree", ["approve", "sign"]),
    # --- cognition ---
    "v.think": ("v.root", ["mean"]),
    "v.decide": ("v.think", ["decide"]),
    "v.expect": ("v.think", ["expect", "predict", "project"]),
    "v.intend": ("v.think", ["plan"]),
    "v.desire": ("v.think", ["want"]),
    "v.evaluate": ("v.think", ["price"]),
    # --- perception ---
    "v.perceive": ("v.root", ["see", "register"]),
    # --- motion ---
    "v.move": ("v.root", ["move"]),
    "v.travel": ("v.move", ["follow", "return", "reach"]),
    "v.send": ("v.move", ["send"]),
    "v.push.motion": ("v.move", ["push"]),
    "v.put": ("v.move", ["set"]),
    # --- possession ---
    "v.possess": ("v.root", ["have", "hold"]),
    "v.transfer": ("v.possess", ["sell", "offer", "cede"]),
    "v.acquire": ("v.possess", ["take", "get", "seize"]),
    # --- causation ---
    "v.cause": ("v.root", ["cause", "trigger"]),
    "v.induce": ("v.cause", ["force", "push", "drive", "persuade",
                             "prompt", "lead"]),
    # --- act / social ---
    "v.act": ("v.root", []),
    "v.interact": ("v.act", ["engage", "involve", "join"]),
    "v.attempt": ("v.act", ["try", "struggle"]),
    "v.use": ("v.act", ["apply"]),
    "v.allow": ("v.act", ["allow", "permit"]),
    "v.help": ("v.act", ["help", "support", "contribute"]),
    "v.connect": ("v.act", ["link", "match"]),
    "v.attack": ("v.act", ["raid"]),
    # --- stative ---
    "v.be": ("v.root", ["be", "lie"]),
}

NOUNS = {
    "n.root": (None, []),
    # --- groups / agents ---
    "n.group": ("n.root", ["company", "government", "market"]),
    "n.person": ("n.root", ["investor"]),
    # --- events ---
    "n.event": ("n.root", []),
    "n.conflict": ("n.event", ["war", "battle", "attack", "brawl",
                               "raid"]),
    "n.protest": ("n.event", ["protest", "strike", "rally"]),
    "n.storm": ("n.event", ["storm"]),
    "n.vote": ("n.event", ["election"]),
    # --- acts ---
    "n.act": ("n.root", ["action", "move", "passing"]),
    "n.transaction": ("n.act", ["sale", "deal", "merger",
                                "consolidation"]),
    "n.closure": ("n.act", ["closure"]),
    "n.entry": ("n.act", ["entry", "foray"]),
    "n.execution": ("n.act", ["execution"]),
    "n.inspection": ("n.act", ["inspection"]),
    "n.abuse": ("n.act", ["abuse", "repression"]),
    "n.competition": ("n.act", ["competition"]),
    "n.discounting": ("n.act", ["discounting", "discount"]),
    # --- communications ---
    "n.statement": ("n.root", ["announcement", "explanation",
                               "projection", "call", "lie"]),
    "n.plan": ("n.root", ["plan"]),
    # --- states ---
    "n.state": ("n.root", ["crisis", "trouble", "compliance",
                           "intensity", "fallout"]),
    # --- processes ---
    "n.process": ("n.root", ["growth", "decline", "slowing"]),
    # --- possessions ---
    "n.money": ("n.root", ["price", "profit"]),
}


def corpus_counts():
    """Lemma frequencies over the golden corpus (docs 0..199 + the two
    reference example documents, when readable)."""
    from erex.corpus import generate_txp
    from erex.txp import parse_txp
    freq = collections.Counter()
    for i in range(200):
        doc = parse_txp(generate_txp(i), name=f"doc_{i}")
        for t in doc.tokens.values():
            freq[t.lemma.lower()] += 1
    for p in ("/root/reference/data/example_TXP/wsj_1014.tml.txp",
              "/root/reference/data/example_TXP/bbc_20130322_721.tml.txp"):
        if os.path.exists(p):
            with open(p) as f:
                doc = parse_txp(f.read(), name=p)
            for t in doc.tokens.values():
                freq[t.lemma.lower()] += 1
    return freq


def main():
    freq = corpus_counts()
    taxonomy = {}
    taxonomy.update(VERBS)
    taxonomy.update(NOUNS)

    children = collections.defaultdict(list)
    for sid, (parent, _m) in taxonomy.items():
        if parent is not None:
            children[parent].append(sid)

    own = {sid: 1 + sum(freq.get(l, 0) for l in members)
           for sid, (_p, members) in taxonomy.items()}

    cum = {}

    def cumulate(sid):
        if sid not in cum:
            cum[sid] = own[sid] + sum(cumulate(c) for c in children[sid])
        return cum[sid]

    for root in ("v.root", "n.root"):
        cumulate(root)

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "synsets.tsv"), "w") as f:
        for sid in sorted(taxonomy):
            parent, _m = taxonomy[sid]
            pos = sid[0]
            root_cum = cum[pos + ".root"]
            ic = 0.0 if parent is None else -math.log(cum[sid] / root_cum)
            f.write(f"{sid}\t{pos}\t{parent or '-'}\t{ic!r}\n")

    words = collections.defaultdict(list)
    for sid in sorted(taxonomy):
        _p, members = taxonomy[sid]
        for lemma in members:
            words[(lemma, sid[0])].append(sid)
    with open(os.path.join(OUT, "words.tsv"), "w") as f:
        for (lemma, pos) in sorted(words):
            f.write(f"{lemma}\t{pos}\t{','.join(words[(lemma, pos)])}\n")

    n_lemmas = len({l for (l, _p) in words})
    print(f"wrote {OUT}: {len(taxonomy)} synsets, "
          f"{len(words)} (lemma,pos) entries, {n_lemmas} lemmas")


if __name__ == "__main__":
    main()
