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

The point relation lattice is {LT, EQ, GT} + unknown, closed under
composition with an incremental Floyd-Warshall step per accepted
constraint: O(P^2) per link with P = 2 x intervals in the document —
document-local by construction, run inside groupby(doc).map_groups.
"""

from __future__ import annotations

LT, EQ, GT = "<", "=", ">"

# label -> list of (p1_end, relation, p2_end); 0 = start, 1 = end
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

_INV = {LT: GT, EQ: EQ, GT: LT}


def _compose(a: str, b: str):
    if a == EQ:
        return b
    if b == EQ:
        return a
    if a == b:
        return a
    return None  # unknown


class TimeGraph:
    """Incremental point-algebra closure over interval ids."""

    def __init__(self):
        self.rel: dict = {}          # point -> {point: rel}
        self.final: list = []        # accepted (src, tgt, label)
        self.violated: list = []     # rejected (src, tgt, label)
        self.redundant: list = []    # accepted but already entailed

    # -- point bookkeeping --------------------------------------------
    def _ensure(self, x: str):
        s, e = (x, 0), (x, 1)
        if s not in self.rel:
            self.rel[s] = {}
            self.rel[e] = {}
            self._commit(s, LT, e)

    def _get(self, p, q):
        return self.rel.get(p, {}).get(q)

    def _commit(self, p, r, q):
        """Set rel(p,q)=r (pre-checked consistent) and propagate."""
        assert self._commit_checked([(p, r, q)])

    def _commit_checked(self, triples) -> bool:
        """Transactionally add constraints with propagation; returns False
        and rolls back when any derived relation contradicts the closure
        (a contradiction can surface transitively, not only on the
        directly-asserted pair)."""
        touched = []          # (a, b, prev) for rollback
        updates = list(triples)
        ok = True
        while updates:
            a, rr, b = updates.pop()
            cur = self._get(a, b)
            if cur == rr:
                continue
            if cur is not None:
                ok = False
                break
            touched.append((a, b, None))
            touched.append((b, a, None))
            self.rel.setdefault(a, {})[b] = rr
            self.rel.setdefault(b, {})[a] = _INV[rr]
            for c, rc in list(self.rel[b].items()):
                if c == a:
                    continue
                comp = _compose(rr, rc)
                if comp is not None and self._get(a, c) != comp:
                    updates.append((a, comp, c))
            for c, rc in list(self.rel[a].items()):
                if c == b:
                    continue
                comp = _compose(_INV[rc], rr)
                if comp is not None and self._get(c, b) != comp:
                    updates.append((c, comp, b))
        if not ok:
            for a, b, prev in reversed(touched):
                if prev is None:
                    self.rel[a].pop(b, None)
                else:
                    self.rel[a][b] = prev
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
        self._ensure(src)
        self._ensure(tgt)
        pts = lambda side, end: ((src, end) if side == 0 else (tgt, end))
        triples = [(pts(a[0], a[1]), r, pts(b[0], b[1])) for a, r, b in cons]
        if all(self._get(p, q) == r for p, r, q in triples):
            self.redundant.append((src, tgt, label))
            self.final.append((src, tgt, label))
            return True
        if not self._commit_checked(triples):
            self.violated.append((src, tgt, label))
            return False
        self.final.append((src, tgt, label))
        return True

    def infer(self, x: str, y: str):
        """Entailed TLINK label for (x, y), or None. Checked in a fixed
        specific-to-general order so e.g. BEGINS wins over its INCLUDES
        superset relations."""
        if (x, 0) not in self.rel or (y, 0) not in self.rel:
            return None
        for label in ("IDENTITY", "SIMULTANEOUS", "IBEFORE", "IAFTER",
                      "BEGINS", "BEGUN_BY", "ENDS", "ENDED_BY", "BEFORE",
                      "AFTER", "INCLUDES", "IS_INCLUDED"):
            cons = _CONSTRAINTS[label]
            ok = True
            for (s1, e1), r, (s2, e2) in cons:
                p = (x, e1) if s1 == 0 else (y, e1)
                q = (x, e2) if s2 == 0 else (y, e2)
                if self._get(p, q) != r:
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
