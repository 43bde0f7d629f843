from erex.labels import (TLINK_LABELS, collapse_label, inverse_clink,
                         inverse_tlink, tlink_label_num)


def test_inverse_pairs():
    assert inverse_tlink("BEFORE") == "AFTER"
    assert inverse_tlink("AFTER") == "BEFORE"
    assert inverse_tlink("INCLUDES") == "IS_INCLUDED"
    assert inverse_tlink("DURING") == "DURING_INV"
    assert inverse_tlink("IBEFORE") == "IAFTER"
    assert inverse_tlink("BEGINS") == "BEGUN_BY"
    assert inverse_tlink("ENDS") == "ENDED_BY"
    # labels outside the even/odd array return unchanged
    # (TemporalRelation.java:54-56)
    assert inverse_tlink("IDENTITY") == "IDENTITY"
    assert inverse_tlink("SIMULTANEOUS") == "SIMULTANEOUS"
    assert inverse_tlink("NONE") == "NONE"


def test_inverse_involution():
    for lbl in TLINK_LABELS:
        assert inverse_tlink(inverse_tlink(lbl)) == lbl


def test_clink_inverse():
    assert inverse_clink("CLINK") == "CLINK-R"
    assert inverse_clink("CLINK-R") == "CLINK"
    assert inverse_clink("anything") == "NONE"


def test_label_nums_one_based():
    assert tlink_label_num("BEFORE") == 1
    assert tlink_label_num("ENDED_BY") == 14
    assert tlink_label_num("END") == 13  # END normalized to ENDS
    assert tlink_label_num("bogus") == 0


def test_collapse():
    assert collapse_label("DURING") == "SIMULTANEOUS"
    assert collapse_label("IBEFORE") == "BEFORE"
    assert collapse_label("BEFORE") == "BEFORE"
