from erex.timegraph import TimeGraph, closure_filter


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
