"""Pin the closure-aware evaluation metric (A3) against the ACTUAL
TempEval-3 evaluation tool.

tests/golden/te3_eval.json is produced by tools/te3_golden.py, which
runs the reference's own python-2.7 evaluator
(/root/reference/tools/TempEval3-evaluation-tool/evaluation-relations/
temporal_evaluation.py) on the tool's easy_checking/WSJ.tml fixture
pair plus structural cases (redundant / violated / reversed /
DURING-normalized links) and four bulk TimeBank documents with
deterministic perturbations, in BOTH scoring modes.  This test asserts
erex.evalx.reduced_prf_doc reproduces every recorded P/R — no py2
interpreter needed at test time."""
import json
import os

import pytest

from erex.evalx import reduced_prf_doc

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "te3_eval.json")

with open(GOLDEN) as f:
    _DATA = json.load(f)


def test_all_recorded_cases_agree_with_tool():
    # regenerating the golden must never silently bake in a divergence
    assert _DATA["n_disagree"] == 0


@pytest.mark.parametrize(
    "case", _DATA["cases"], ids=[c["name"] for c in _DATA["cases"]])
def test_reduced_prf_matches_te3_tool(case):
    gold = [tuple(t) for t in case["gold"]]
    sysl = [tuple(t) for t in case["system"]]
    for method, flag in (("default", False), ("implicit_in_recall", True)):
        exp = case["expected"][method]
        res = reduced_prf_doc(sysl, gold, implicit_in_recall=flag)
        p = res["p_hit"] / res["n_sys"] if res["n_sys"] else 0.0
        r = res["r_hit"] / res["n_gold"] if res["n_gold"] else 0.0
        assert p == pytest.approx(exp["p"], abs=5e-5), (case["name"],
                                                        method)
        assert r == pytest.approx(exp["r"], abs=5e-5), (case["name"],
                                                        method)


def test_reduced_denominators():
    """The round-4 verdict's exact deviation: an entailed (redundant)
    system link must NOT count in the precision denominator, while a
    closure-violating one must."""
    gold = [("a", "b", "BEFORE"), ("b", "c", "BEFORE")]
    sysl = [("a", "b", "BEFORE"), ("b", "c", "BEFORE"),
            ("a", "c", "BEFORE"),          # entailed -> dropped
            ("c", "a", "BEFORE")]          # violated -> kept, unmatched
    res = reduced_prf_doc(sysl, gold)
    assert res["n_sys"] == 3
    assert res["p_hit"] == 2
    assert res["n_gold"] == 2 and res["r_hit"] == 2
