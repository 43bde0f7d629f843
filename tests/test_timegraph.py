from hypothesis import given, settings
from hypothesis import strategies as st

from erex.timegraph import _CONSTRAINTS, EQ, GT, LT, UNK, TimeGraph, \
    closure_filter


def test_transitive_conflict_detected():
    tg = TimeGraph()
    assert tg.add("A", "B", "BEFORE")
    assert tg.add("B", "C", "BEFORE")
    assert not tg.add("C", "A", "BEFORE")  # cycle
    assert ("C", "A", "BEFORE") in tg.violated
    assert len(tg.final) == 2


def test_rule_first_priority():
    # the first-inserted (rule) link wins; the conflicting later link
    # (classifier) is the one dropped
    final, violated = closure_filter([
        ("A", "B", "BEFORE"),       # rule
        ("B", "A", "BEFORE"),       # classifier, conflicts
    ])
    assert final == [("A", "B", "BEFORE")]
    assert violated == [("B", "A", "BEFORE")]


def test_inverse_consistent():
    tg = TimeGraph()
    assert tg.add("A", "B", "BEFORE")
    assert tg.add("B", "A", "AFTER")      # same info, consistent
    assert tg.add("A", "B", "BEFORE")     # redundant re-add ok
    assert not tg.violated


def test_simultaneous_merging():
    tg = TimeGraph()
    assert tg.add("A", "B", "SIMULTANEOUS")
    assert tg.add("B", "C", "BEFORE")
    assert not tg.add("C", "A", "BEFORE")
    assert tg.infer("A", "C") == "BEFORE"


def test_includes_semantics():
    tg = TimeGraph()
    assert tg.add("A", "B", "INCLUDES")
    assert tg.add("B", "C", "INCLUDES")
    assert tg.infer("A", "C") == "INCLUDES"
    assert tg.infer("C", "A") == "IS_INCLUDED"
    # something entirely inside A cannot be BEFORE A
    assert not tg.add("C", "A", "BEFORE")


def test_begins_ends():
    tg = TimeGraph()
    assert tg.add("A", "B", "BEGINS")
    assert tg.infer("A", "B") == "BEGINS"
    assert tg.infer("B", "A") == "BEGUN_BY"
    tg2 = TimeGraph()
    assert tg2.add("A", "B", "ENDS")
    assert tg2.infer("B", "A") == "ENDED_BY"


def test_ibefore_chain():
    tg = TimeGraph()
    assert tg.add("A", "B", "IBEFORE")
    assert tg.add("B", "C", "BEFORE")
    assert tg.infer("A", "C") == "BEFORE"
    assert not tg.add("C", "B", "IBEFORE")  # C before B contradiction


def test_during_treated_as_simultaneous():
    tg = TimeGraph()
    assert tg.add("A", "B", "DURING")
    assert tg.infer("A", "B") == "SIMULTANEOUS"


def test_non_tlink_labels_pass_through():
    tg = TimeGraph()
    assert tg.add("A", "B", "NONE")
    assert tg.add("A", "B", "VAGUE")
    assert len(tg.final) == 2
    assert tg.infer("A", "B") is None


def test_closure_idempotent():
    links = [("A", "B", "BEFORE"), ("B", "C", "INCLUDES"),
             ("C", "D", "BEFORE"), ("A", "D", "BEFORE")]
    final1, v1 = closure_filter(links)
    final2, v2 = closure_filter(final1)
    assert final2 == final1
    assert not v2


# -- differential oracle: the original dense point-matrix closure -----------
# The production TimeGraph is integer-bitset based; this is the byte-matrix
# worklist implementation it replaced, kept verbatim as a semantics oracle.

_COMP4 = bytearray(16)
for _b in range(4):
    _COMP4[EQ * 4 + _b] = _b
    _COMP4[_b * 4 + EQ] = _b
_COMP4[LT * 4 + LT] = LT
_COMP4[GT * 4 + GT] = GT
_INV = (UNK, GT, EQ, LT)


class _MatrixTimeGraph:
    def __init__(self):
        self._idx = {}
        self._n = 0
        self.M = []
        self.final = []
        self.violated = []
        self.redundant = []

    def _ensure(self, x):
        s = self._idx.get(x)
        if s is not None:
            return s
        s = self._n
        self._n += 2
        for row in self.M:
            row.extend(b"\x00\x00")
        self.M.append(bytearray(self._n))
        self.M.append(bytearray(self._n))
        self._idx[x] = s
        self.M[s][s + 1] = LT
        self.M[s + 1][s] = GT
        return s

    def _commit_checked(self, triples):
        M = self.M
        comp = _COMP4
        touched = []
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
            row_a[b] = r
            M[b][a] = _INV[r]
            touched.append((a, b))
            row_b = M[b]
            r4 = r * 4
            for c, rc in enumerate(row_b):
                if rc and c != a:
                    rr = comp[r4 + rc]
                    if rr and row_a[c] != rr:
                        updates.append((a, rr, c))
            for c in range(self._n):
                rc = M[c][a]
                if rc and c != b:
                    rr = comp[rc * 4 + r]
                    if rr and M[c][b] != rr:
                        updates.append((c, rr, b))
        if not ok:
            for a, b in reversed(touched):
                M[a][b] = UNK
                M[b][a] = UNK
            return False
        return True

    def add(self, src, tgt, label):
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

    def rel(self, p, q):
        return self.M[p][q]


_LABELS = sorted(_CONSTRAINTS) + ["NONE", "VAGUE"]
_IVS = ["A", "B", "C", "D", "E", "F", "G"]


@settings(max_examples=400, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(_IVS), st.sampled_from(_IVS),
                          st.sampled_from(_LABELS)),
                min_size=1, max_size=40))
def test_bitset_matches_matrix_oracle(links):
    links = [(a, b, l) for a, b, l in links if a != b]
    tg = TimeGraph()
    mx = _MatrixTimeGraph()
    for a, b, l in links:
        assert tg.add(a, b, l) == mx.add(a, b, l), (a, b, l)
    assert tg.final == mx.final
    assert tg.violated == mx.violated
    assert tg.redundant == mx.redundant
    # the closed point relations agree cell-for-cell
    assert tg._idx == mx._idx
    for p in range(tg._n):
        for q in range(tg._n):
            if p != q:
                assert tg._rel(p, q) == mx.rel(p, q), (p, q)
