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


def test_collapse_variant_maps_match_reference():
    """Spot-pin each variant against the Java if/else chains
    (PairFeatureVector.java:3208-3490, liblinear path)."""
    from erex.labels import collapse_label_variant as cv
    # base (labelCollapsed)
    assert cv("DURING") == "SIMULTANEOUS"
    assert cv("IBEFORE") == "BEFORE"
    assert cv("BEGINS") == "BEGINS"
    # variant 1: BEGINS->BEFORE, ENDS->AFTER, DURING->IS_INCLUDED
    assert cv("BEGINS", "1") == "BEFORE"
    assert cv("ENDS", "1") == "AFTER"
    assert cv("DURING", "1") == "IS_INCLUDED"
    assert cv("DURING_INV", "1") == "INCLUDES"
    # variant 2: BEGINS/ENDS -> IS_INCLUDED, BEGUN_BY/ENDED_BY -> INCLUDES
    assert cv("BEGINS", "2") == "IS_INCLUDED"
    assert cv("ENDED_BY", "2") == "INCLUDES"
    # variant 3 keeps DURING/DURING_INV, folds BEGINS/ENDS into them
    assert cv("BEGINS", "3") == "DURING"
    assert cv("BEGUN_BY", "3") == "DURING_INV"
    assert cv("DURING", "3") == "DURING"
    # variant 4 folds everything durative into DURING, IS_INCLUDED->INCLUDES
    assert cv("IS_INCLUDED", "4") == "INCLUDES"
    assert cv("ENDED_BY", "4") == "DURING"
    # variant 5: BEGINS/ENDS->IS_INCLUDED, BEGUN_BY/ENDED_BY->INCLUDES,
    # DURING stays DURING
    assert cv("DURING", "5") == "DURING"
    assert cv("BEGUN_BY", "5") == "INCLUDES"
    # variant 6 drops durative labels to NONE
    assert cv("DURING", "6") == "NONE"
    assert cv("BEGINS", "6") == "NONE"
    assert cv("IBEFORE", "6") == "BEFORE"
    # 01: inverse-folding (BEGUN_BY->BEGINS, ENDED_BY->ENDS,
    # DURING_INV->DURING, IS_INCLUDED->INCLUDES)
    assert cv("BEGUN_BY", "01") == "BEGINS"
    assert cv("ENDED_BY", "01") == "ENDS"
    assert cv("DURING_INV", "01") == "DURING"
    # 02 vs 03: only IS_INCLUDED handling differs
    assert cv("IS_INCLUDED", "02") == "INCLUDES"
    assert cv("IS_INCLUDED", "03") == "IS_INCLUDED"
    assert cv("BEGUN_BY", "02") == "DURING_INV"
    # binary
    assert cv("NONE", "binary") == "0"
    assert cv("BEFORE", "binary") == "1"
    # END normalization in the numbered variants
    assert cv("END", "4") == "ENDS"
    assert cv("END", "01") == "END"    # 01-03 have no END branch
