"""WordNet Lin similarity over the vendored wnlin lexical database.

Implements the REAL ws4j Lin algorithm — the semantics of
``new Lin(new NictWordNet()).calcRelatednessOfWords(lemma1, lemma2)``
as called by the reference (EventEventFeatureVector.java:46-50):

* max over the POS pairs noun-noun and verb-verb of the max over all
  synset pairs (RelatednessCalculator.calcRelatednessOfWords);
* per synset pair: identical synset -> 1.0 (Lin's ``max``); otherwise
  2*IC(lcs) / (IC(s1)+IC(s2)) with the LCS chosen by highest IC among
  common subsumers (ICFinder.getLCSbyIC), 0 when either IC is 0;
* no concepts / no overlap -> 0.0 (Lin's ``min``).

The ws4j jar ships WordNet-derived data that does not exist in this
sandbox, so the database here is the vendored erex/resources/wnlin/
taxonomy (see tools/build_wnlin.py for provenance and the IC model).
The compiled-reference stub (tools/javaref/stubs/edu/cmu/lti/...)
reads the SAME files and runs the SAME algorithm, so parity goldens
exercise a genuinely shared Lin, not a cancelled-out constant.

Float parity note: ICs are stored as ``repr(float)`` decimals, parsed
by Python ``float()`` and Java ``Double.parseDouble`` to identical
bits; all downstream arithmetic (2*ic, add, divide, compares) is
IEEE-754 exact-rounded, so scores are bit-identical across runtimes.
"""
from __future__ import annotations

import os
from functools import lru_cache

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "resources", "wnlin")


@lru_cache(maxsize=1)
def _db():
    parent = {}
    ic = {}
    with open(os.path.join(_DIR, "synsets.tsv")) as f:
        for line in f:
            sid, _pos, par, ic_s = line.rstrip("\n").split("\t")
            parent[sid] = None if par == "-" else par
            ic[sid] = float(ic_s)
    words = {}
    with open(os.path.join(_DIR, "words.tsv")) as f:
        for line in f:
            lemma, pos, sids = line.rstrip("\n").split("\t")
            words[(lemma, pos)] = tuple(sids.split(","))
    ancestors = {}
    for sid in parent:
        chain = []
        s = sid
        while s is not None:
            chain.append(s)
            s = parent[s]
        ancestors[sid] = tuple(chain)
    return words, ancestors, ic


@lru_cache(maxsize=65536)
def lin(lemma1: str, lemma2: str) -> float:
    """ws4j ``Lin(NictWordNet).calcRelatednessOfWords`` over the
    vendored database.  Returns 0.0 for out-of-vocabulary lemmas."""
    words, ancestors, ic = _db()
    w1 = lemma1.lower()
    w2 = lemma2.lower()
    best = -1.0
    for pos in ("n", "v"):
        for s1 in words.get((w1, pos), ()):
            anc1 = set(ancestors[s1])
            ic1 = ic[s1]
            for s2 in words.get((w2, pos), ()):
                if s1 == s2:
                    score = 1.0
                else:
                    ic2 = ic[s2]
                    if ic1 > 0.0 and ic2 > 0.0:
                        lcs_ic = max((ic[a] for a in ancestors[s2]
                                      if a in anc1), default=None)
                        score = (0.0 if lcs_ic is None
                                 else 2.0 * lcs_ic / (ic1 + ic2))
                    else:
                        score = 0.0
                if score > best:
                    best = score
    return best if best != -1.0 else 0.0
