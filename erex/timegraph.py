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

Representation: a dense point-relation matrix (list of bytearrays) over
{unknown, <, =, >} kept transitively closed with an incremental
worklist. Matrices are tiny (P = 2 x intervals per document, typically
< 40 points), so plain byte operations beat numpy's per-call overhead
by a wide margin here. Document-local by construction; runs inside the
per-document merge."""

from __future__ import annotations

UNK, LT, EQ, GT = 0, 1, 2, 3

# flat composition table: COMP4[a*4+b] = relation(a->c) given a->b, b->c
COMP4 = bytearray(16)
for _b in range(4):
    COMP4[EQ * 4 + _b] = _b
    COMP4[_b * 4 + EQ] = _b
COMP4[LT * 4 + LT] = LT
COMP4[GT * 4 + GT] = GT
# LT∘GT and GT∘LT stay unknown

_INV = (UNK, GT, EQ, LT)

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

    def __init__(self):
        self._idx: dict = {}         # interval id -> start point index
        self._n = 0
        self.M: list = []            # list of bytearrays, row-major
        self.MT: list = []           # transposed mirror (column scans)
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
        for row in self.M:
            row.extend(b"\x00\x00")
        for row in self.MT:
            row.extend(b"\x00\x00")
        self.M.append(bytearray(self._n))
        self.M.append(bytearray(self._n))
        self.MT.append(bytearray(self._n))
        self.MT.append(bytearray(self._n))
        self._idx[x] = s
        self.M[s][s + 1] = LT
        self.M[s + 1][s] = GT
        self.MT[s + 1][s] = LT
        self.MT[s][s + 1] = GT
        return s

    def _commit_checked(self, triples) -> bool:
        """Transactionally add (p, rel, q) point constraints with
        worklist propagation; rolls back and returns False on any
        contradiction (which can surface transitively).

        Both derivation scans run over ROWS via enumerate (the second
        over the transposed mirror MT) — iterating a bytearray directly
        is ~2x faster than an index loop, and column access through MT
        avoids the per-cell list+bytearray double indexing."""
        M = self.M
        MT = self.MT
        comp = COMP4
        touched = []                       # (a, b) cells set, for rollback
        updates = list(triples)
        ok = True
        while updates:
            a, r, b = updates.pop()
            row_a = M[a]
            cur = row_a[b]
            if cur == r:
                continue
            if cur != UNK:
                ok = False
                break
            inv = _INV[r]
            row_a[b] = r
            M[b][a] = inv
            MT[b][a] = r
            MT[a][b] = inv
            touched.append((a, b))
            # derive (a, comp(r, M[b,c]), c) for all known M[b,c]
            row_b = M[b]
            r4 = r * 4
            for c, rc in enumerate(row_b):
                if rc and c != a:
                    rr = comp[r4 + rc]
                    if rr and row_a[c] != rr:
                        updates.append((a, rr, c))
            # derive (c, comp(M[c,a], r), b) for all known M[c,a];
            # M[c][a] over all c is column a = MT[a]
            col_a = MT[a]
            col_b = MT[b]
            for c, rc in enumerate(col_a):
                if rc and c != b:
                    rr = comp[rc * 4 + r]
                    if rr and col_b[c] != rr:
                        updates.append((c, rr, b))
        if not ok:
            for a, b in reversed(touched):
                M[a][b] = UNK
                M[b][a] = UNK
                MT[b][a] = UNK
                MT[a][b] = UNK
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
        if all(self.M[p][q] == r for p, r, q in triples):
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
                if self.M[p][q] != r:
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
