"""Rule-sieve unit tests on hand-built TXP micro-documents."""

from erex.deppath import ee_dependency_path, et_dependency_path
from erex.rules.event_event import (event_causality_rule, causality_link,
                                    event_event_rule, anchor_reasoning)
from erex.rules.event_timex import event_timex_rule
from erex.txp import DEFAULT_FIELDS, parse_txp_lines


def row(**kw):
    d = {f: "O" for f in DEFAULT_FIELDS}
    d.update(kw)
    return "\t".join(d[f] for f in DEFAULT_FIELDS)


def tok(text, tid, sid, pos, lemma=None, **kw):
    return row(token=text, token_id=tid, sent_id=str(sid), pos=pos,
               lemma=lemma or text.lower(), **kw)


DCT = row(token="DCT_1989-10-26", tmx_id="tmx0", tmx_type="B-DATE",
          tmx_value="1989-10-26")


def make_doc(lines):
    return parse_txp_lines([DCT] + lines)


def pp_doc():
    """'The company increased in March .' TMP-PMOD structure."""
    return make_doc([
        tok("The", "t1", 1, "AT0"),
        tok("company", "t2", 1, "NN1", chunk="I-NP"),
        tok("increased", "t3", 1, "VVD", "increase",
            deps="t1:SBJ||t4:TMP||t6:P", ev_class="OCCURRENCE", ev_id="e1",
            chunk="B-VP", main_verb="mainVb", tense_aspect_pol="PAST+NONE+pos",
            tlink="e1:tmx1:NONE"),
        tok("in", "t4", 1, "PRP", deps="t5:PMOD", chunk="B-PP"),
        tok("March", "t5", 1, "NP0", "march", tmx_id="tmx1",
            tmx_type="B-DATE", tmx_value="1989-03"),
        tok(".", "t6", 1, "PUN"),
    ])


def test_et_dep_path_and_rule_in_date():
    doc = pp_doc()
    e1, tmx = doc.entities["e1"], doc.entities["tmx1"]
    assert et_dependency_path(doc, e1, tmx) == "TMP-PMOD"
    assert event_timex_rule(doc, e1, tmx, "TMP-PMOD") == "IS_INCLUDED"


def et_with_prep(prep, ttype, value, pol="pos"):
    doc = make_doc([
        tok("The", "t1", 1, "AT0"),
        tok("company", "t2", 1, "NN1"),
        tok("increased", "t3", 1, "VVD", "increase",
            deps="t1:SBJ||t4:TMP||t6:P", ev_class="OCCURRENCE", ev_id="e1",
            chunk="B-VP", tense_aspect_pol="PAST+NONE+" + pol),
        tok(prep, "t4", 1, "PRP", deps="t5:PMOD", chunk="B-PP"),
        tok("March", "t5", 1, "NP0", "march", tmx_id="tmx1",
            tmx_type="B-" + ttype, tmx_value=value),
        tok(".", "t6", 1, "PUN"),
    ])
    e1, tmx = doc.entities["e1"], doc.entities["tmx1"]
    return event_timex_rule(doc, e1, tmx, et_dependency_path(doc, e1, tmx))


def test_et_preposition_branches():
    # EventTimexRelationRule.java:106-138
    assert et_with_prep("during", "DURATION", "P3D") == "DURING"
    assert et_with_prep("for", "DURATION", "P3D") == "DURING"
    assert et_with_prep("within", "DURATION", "P3D") == "IS_INCLUDED"
    assert et_with_prep("in", "DATE", "1989-03") == "IS_INCLUDED"
    assert et_with_prep("on", "DATE", "1989-03-01") == "IS_INCLUDED"
    assert et_with_prep("after", "DATE", "1989-03") == "AFTER"
    assert et_with_prep("before", "DATE", "1989-03") == "BEFORE"
    assert et_with_prep("from", "DATE", "1989-03") == "BEGUN_BY"
    assert et_with_prep("since", "DATE", "1989-03") == "BEGUN_BY"
    # until needs polarity 'POS' (upper) which TXP never yields ->
    # falls through to the default IS_INCLUDED (reference quirk)
    assert et_with_prep("until", "DATE", "1989-03") == "IS_INCLUDED"
    assert et_with_prep("until", "DATE", "1989-03", pol="POS") == "ENDED_BY"


def test_et_measure_rel_optin():
    # EventTimexRelationRule.java:35-37: with measureRel set, DURATION
    # timexes get MEASURE unconditionally, overriding every rule branch;
    # the reference's 5-arg ctor sets the flag only after the 4-arg ctor
    # has read it, so it is an opt-in here and defaults off.
    doc = make_doc([
        tok("The", "t1", 1, "AT0"),
        tok("company", "t2", 1, "NN1"),
        tok("increased", "t3", 1, "VVD", "increase",
            deps="t1:SBJ||t4:TMP||t6:P", ev_class="OCCURRENCE", ev_id="e1",
            chunk="B-VP", tense_aspect_pol="PAST+NONE+pos"),
        tok("during", "t4", 1, "PRP", deps="t5:PMOD", chunk="B-PP"),
        tok("March", "t5", 1, "NP0", "march", tmx_id="tmx1",
            tmx_type="B-DURATION", tmx_value="P3D"),
        tok(".", "t6", 1, "PUN"),
    ])
    e1, tmx = doc.entities["e1"], doc.entities["tmx1"]
    dep = et_dependency_path(doc, e1, tmx)
    assert event_timex_rule(doc, e1, tmx, dep) == "DURING"
    assert event_timex_rule(doc, e1, tmx, dep, measure_rel=True) == "MEASURE"
    # fires even when the base rule yields 'O' (no TMP dep path)
    assert event_timex_rule(doc, e1, tmx, "SBJ", measure_rel=True) == "MEASURE"
    # non-DURATION timexes are untouched by the flag
    doc2 = pp_doc()
    e1b, tmxb = doc2.entities["e1"], doc2.entities["tmx1"]
    assert event_timex_rule(doc2, e1b, tmxb, "TMP-PMOD",
                            measure_rel=True) == "IS_INCLUDED"


def test_measure_config_and_vocab():
    from erex.extract import DEFAULT_CONFIG, PipelineConfig
    from erex.labels import (TLINK_LABELS, TLINK_TYPES_FULL, inverse_tlink,
                             tlink_label_num)
    assert DEFAULT_CONFIG.measure_rel is False
    assert PipelineConfig(measure_rel=True).measure_rel
    # EntityEnum.java:9-16 full vocabulary; MEASURE is outside the
    # 14-label classifier array -> self-inverse, label number 0
    assert TLINK_TYPES_FULL == TLINK_LABELS + ("MEASURE",)
    assert inverse_tlink("MEASURE") == "MEASURE"
    assert tlink_label_num("MEASURE") == 0


def test_measure_end_to_end_extraction():
    from erex.extract import PipelineConfig, extract_document
    lines = [DCT] + [
        tok("The", "t1", 1, "AT0"),
        tok("company", "t2", 1, "NN1"),
        tok("increased", "t3", 1, "VVD", "increase",
            deps="t1:SBJ||t4:TMP||t6:P", ev_class="OCCURRENCE", ev_id="e1",
            chunk="B-VP", tense_aspect_pol="PAST+NONE+pos",
            tlink="e1:tmx1:NONE"),
        tok("during", "t4", 1, "PRP", deps="t5:PMOD", chunk="B-PP"),
        tok("March", "t5", 1, "NP0", "march", tmx_id="tmx1",
            tmx_type="B-DURATION", tmx_value="P3D"),
        tok(".", "t6", 1, "PUN"),
    ]
    content = "\n".join(["# h"] * 4 + lines)
    base = {(t["src"], t["tgt"]): t for t in
            extract_document(content)["triples"]}
    meas = {(t["src"], t["tgt"]): t for t in
            extract_document(content,
                             config=PipelineConfig(measure_rel=True))
            ["triples"]}
    assert base[("e1", "tmx1")]["label"] == "DURING"
    assert meas[("e1", "tmx1")]["label"] == "MEASURE"
    assert meas[("e1", "tmx1")]["stage"] == "rule"
    # MEASURE has no point-algebra constraints: the closure keeps it
    # final without touching the timegraph
    assert meas[("e1", "tmx1")]["consistent"] is True


def test_et_dct_tense_rules():
    doc = make_doc([
        tok("The", "t1", 1, "AT0"),
        tok("company", "t2", 1, "NN1"),
        tok("will", "t3", 1, "VM0", deps="t4:VC",
            tense_aspect_pol="FUTURE+NONE+pos"),
        tok("expand", "t4", 1, "VVB", ev_class="OCCURRENCE", ev_id="e1",
            chunk="B-VP", tense_aspect_pol="FUTURE+NONE+pos",
            tlink="e1:tmx0:NONE"),
        tok(".", "t5", 1, "PUN"),
    ])
    assert event_timex_rule(doc, doc.entities["e1"], doc.entities["tmx0"],
                            "O") == "AFTER"


def reporting_doc(gov_tense, dep_tense, dep_aspect):
    return make_doc([
        tok("The", "t1", 1, "AT0"),
        tok("company", "t2", 1, "NN1"),
        tok("says", "t3", 1, "VVZ", "say", deps="t1:SBJ||t4:OBJ||t8:P",
            ev_class="REPORTING", ev_id="e1", chunk="B-VP",
            main_verb="mainVb",
            tense_aspect_pol="%s+NONE+pos" % gov_tense),
        tok("that", "t4", 1, "CJT", deps="t7:SUB", chunk="B-SBAR"),
        tok("the", "t5", 1, "AT0"),
        tok("market", "t6", 1, "NN1"),
        tok("fell", "t7", 1, "VVD", "fall", deps="t6:SBJ",
            ev_class="OCCURRENCE", ev_id="e2", chunk="B-VP",
            tense_aspect_pol="%s+%s+pos" % (dep_tense, dep_aspect)),
        tok(".", "t8", 1, "PUN"),
    ])


def test_ee_reporting_rules():
    doc = reporting_doc("PRESENT", "PAST", "NONE")
    e1, e2 = doc.entities["e1"], doc.entities["e2"]
    assert ee_dependency_path(doc, e1, e2) == "OBJ-SUB"
    assert event_event_rule(doc, e1, e2, "OBJ-SUB") == "AFTER"
    doc = reporting_doc("PRESENT", "FUTURE", "NONE")
    assert event_event_rule(doc, doc.entities["e1"], doc.entities["e2"],
                            "OBJ-SUB") == "BEFORE"
    doc = reporting_doc("PAST", "PAST", "PROGRESSIVE")
    assert event_event_rule(doc, doc.entities["e1"], doc.entities["e2"],
                            "OBJ-SUB") == "IS_INCLUDED"


def aspectual_doc(av, aspect="NONE"):
    return make_doc([
        tok("The", "t1", 1, "AT0"),
        tok("company", "t2", 1, "NN1"),
        tok(av, "t3", 1, "VVD", av, deps="t1:SBJ||t4:OPRD||t6:P",
            ev_class="ASPECTUAL", ev_id="e1", chunk="B-VP",
            tense_aspect_pol="PAST+%s+pos" % aspect),
        tok("to", "t4", 1, "TO0", deps="t5:IM", chunk="I-VP"),
        tok("expand", "t5", 1, "VVB", ev_class="OCCURRENCE", ev_id="e2",
            chunk="I-VP", tense_aspect_pol="INFINITIVE+NONE+pos"),
        tok(".", "t6", 1, "PUN"),
    ])


def test_ee_aspectual_rules():
    for av, expect in (("begin", "BEGINS"), ("stop", "ENDS"),
                       ("continue", "INCLUDES"),
                       ("remain", "SIMULTANEOUS"),  # DURING_INV -> tweak
                       ("plan", "BEFORE")):
        doc = aspectual_doc(av)
        e1, e2 = doc.entities["e1"], doc.entities["e2"]
        assert ee_dependency_path(doc, e1, e2) == "OPRD-IM"
        assert event_event_rule(doc, e1, e2, "OPRD-IM") == expect
    doc = aspectual_doc("plan", "PERFECTIVE_PROGRESSIVE")
    assert event_event_rule(doc, doc.entities["e1"], doc.entities["e2"],
                            "OPRD-IM") == "SIMULTANEOUS"


def test_ee_reichenbach():
    doc = make_doc([
        tok("The", "t1", 1, "AT0"),
        tok("market", "t2", 1, "NN1"),
        tok("fell", "t3", 1, "VVD", "fall", deps="t2:SBJ",
            ev_class="OCCURRENCE", ev_id="e1", chunk="B-VP",
            tense_aspect_pol="PAST+NONE+pos"),
        tok(";", "t4", 1, "PUN"),
        tok("investors", "t5", 1, "NN2", "investor"),
        tok("had", "t6", 1, "VHD", "have", deps="t5:SBJ||t7:VC",
            tense_aspect_pol="PAST+PERFECTIVE+pos"),
        tok("sold", "t7", 1, "VVN", "sell", ev_class="OCCURRENCE",
            ev_id="e2", chunk="B-VP",
            tense_aspect_pol="PAST+PERFECTIVE+pos"),
        tok(".", "t8", 1, "PUN"),
    ])
    assert event_event_rule(doc, doc.entities["e1"], doc.entities["e2"],
                            "O") == "AFTER"


def test_anchor_reasoning():
    # e1 anchored in tmx1, e2 anchored in tmx2, tmx1 BEFORE tmx2
    tt = {("tmx1", "tmx2"): "BEFORE", ("tmx2", "tmx1"): "AFTER"}
    assert anchor_reasoning("e1", "e2", {"e1": "tmx1", "e2": "tmx2"},
                            {}, {}, tt) == "BEFORE"
    # e1 before tmx1, e2 anchored in tmx2, tmx1 BEFORE tmx2 -> BEFORE
    assert anchor_reasoning("e1", "e2", {"e2": "tmx2"}, {"e1": "tmx1"},
                            {}, tt) == "BEFORE"
    # but only when the tt relation is BEFORE
    tt2 = {("tmx1", "tmx2"): "INCLUDES"}
    assert anchor_reasoning("e1", "e2", {"e2": "tmx2"}, {"e1": "tmx1"},
                            {}, tt2) == "O"


def test_causality_rule_table():
    # EventEventRelationRule.java:93-282 dispatch
    assert event_causality_rule(True, "cause", "CAUSE", "SBJ", "OBJ") == "CAUSE"
    assert causality_link("CAUSE") == "CLINK"
    assert event_causality_rule(True, "cause", "CAUSE", "SBJ",
                                "LGS-PMOD") == "CAUSE-R"
    assert causality_link("CAUSE-R") == "CLINK-R"
    assert event_causality_rule(True, "force", "CAUSE", "SBJ",
                                "OPRD-IM") == "CAUSE"
    assert event_causality_rule(True, "make", "CAUSE-AMBIGUOUS", "SBJ",
                                "OPRD-SUB-IM") == "CAUSE"
    assert event_causality_rule(True, "prevent", "PREVENT", "SBJ",
                                "OBJ") == "PREVENT"
    assert event_causality_rule(True, "prevent", "PREVENT", "SBJ",
                                "LGS-PMOD") == "PREVENT-R"
    assert event_causality_rule(True, "ensure", "ENABLE", "SBJ",
                                "OBJ") == "ENABLE"
    assert event_causality_rule(True, "allow", "ENABLE", "SBJ",
                                "OBJ") == "NONE"   # basic only for ensure/guarantee
    assert event_causality_rule(True, "lead-to", "LINK", "SBJ",
                                "ADV-PMOD") == "LINK"
    assert event_causality_rule(True, "affect", "AFFECT", "SBJ",
                                "OBJ") == "AFFECT"
    assert event_causality_rule(False, "cause", "CAUSE", "SBJ", "OBJ") == "O"
    assert event_causality_rule(True, "x", "O", "SBJ", "OBJ") == "O"
    # reference quirk: the caller only tests rule != "O", so a failed
    # dep-pattern ("NONE") still yields CLINK (CauseRelPro.java:182-186)
    assert causality_link("NONE") == "CLINK"
    assert causality_link("O") == "O"


def test_causal_end_to_end_active_passive():
    from erex.features import causal_verb_pair
    doc = make_doc([
        tok("The", "t1", 1, "AT0"),
        tok("strike", "t2", 1, "NN1", ev_class="OCCURRENCE", ev_id="e1",
            chunk="I-NP"),
        tok("caused", "t3", 1, "VVD", "cause", deps="t2:SBJ||t5:OBJ||t6:P",
            chunk="B-VP", tense_aspect_pol="PAST+NONE+pos"),
        tok("the", "t4", 1, "AT0"),
        tok("closure", "t5", 1, "NN1", ev_class="OCCURRENCE", ev_id="e2",
            chunk="I-NP"),
        tok(".", "t6", 1, "PUN"),
    ])
    e1, e2 = doc.entities["e1"], doc.entities["e2"]
    m = causal_verb_pair(doc, e1, e2)
    assert m.cluster == "CAUSE"
    assert m.dep1 == "SBJ" and m.dep2 == "OBJ"
    assert causality_link(event_causality_rule(
        True, m.text, m.cluster, m.dep1, m.dep2)) == "CLINK"

    # full passive: the causal verb in a be-VC chain is SKIPPED by the
    # marker search (isMatePassiveVerb guard, PairFeatureVector.java:1738)
    # -> the pair falls through to the classifier
    docp = make_doc([
        tok("The", "t1", 1, "AT0"),
        tok("closure", "t2", 1, "NN1", ev_class="OCCURRENCE", ev_id="e1",
            chunk="I-NP"),
        tok("was", "t3", 1, "VBD", "be", deps="t2:SBJ||t4:VC||t8:P",
            chunk="B-VP", tense_aspect_pol="PAST+NONE+pos"),
        tok("caused", "t4", 1, "VVN", "cause", deps="t5:LGS", chunk="I-VP",
            tense_aspect_pol="PAST+NONE+pos"),
        tok("by", "t5", 1, "PRP", deps="t7:PMOD", chunk="B-PP"),
        tok("the", "t6", 1, "AT0"),
        tok("strike", "t7", 1, "NN1", ev_class="OCCURRENCE", ev_id="e2",
            chunk="I-NP"),
        tok(".", "t8", 1, "PUN"),
    ])
    m = causal_verb_pair(docp, docp.entities["e1"], docp.entities["e2"])
    assert m.cluster == "O"

    # reduced relative: 'The closure caused by the strike happened.' —
    # no be-VC, marker fires, dep2 = LGS-PMOD -> CLINK-R
    docr = make_doc([
        tok("The", "t1", 1, "AT0"),
        tok("closure", "t2", 1, "NN1", deps="t3:APPO",
            ev_class="OCCURRENCE", ev_id="e1", chunk="I-NP"),
        tok("caused", "t3", 1, "VVN", "cause", deps="t4:LGS", chunk="B-VP",
            tense_aspect_pol="PAST+NONE+pos"),
        tok("by", "t4", 1, "PRP", deps="t6:PMOD", chunk="B-PP"),
        tok("the", "t5", 1, "AT0"),
        tok("strike", "t6", 1, "NN1", ev_class="OCCURRENCE", ev_id="e2",
            chunk="I-NP"),
        tok("happened", "t7", 1, "VVD", "happen", deps="t2:SBJ||t8:P",
            chunk="B-VP", main_verb="mainVb",
            tense_aspect_pol="PAST+NONE+pos"),
        tok(".", "t8", 1, "PUN"),
    ])
    e1, e2 = docr.entities["e1"], docr.entities["e2"]
    m = causal_verb_pair(docr, e1, e2)
    assert m.cluster == "CAUSE"
    assert m.dep1 == "APPO" and m.dep2 == "LGS-PMOD"
    assert causality_link(event_causality_rule(
        True, m.text, m.cluster, m.dep1, m.dep2)) == "CLINK-R"


def test_connective_marker():
    """F8: discourse-connective marker search (the 'as' token in the
    wsj example carries connective=Temporal)."""
    from erex.features import connective_marker_pair
    doc = make_doc([
        tok("The", "t1", 1, "AT0"),
        tok("market", "t2", 1, "NN1"),
        tok("fell", "t3", 1, "VVD", "fall", deps="t2:SBJ||t4:ADV",
            ev_class="OCCURRENCE", ev_id="e1", chunk="B-VP",
            tense_aspect_pol="PAST+NONE+pos"),
        tok("as", "t4", 1, "PRP", deps="t7:SUB", chunk="B-SBAR",
            connective="Temporal"),
        tok("investors", "t5", 1, "NN2", "investor"),
        tok("panicked", "t6", 1, "VVD", "panic", deps="t5:SBJ",
            ev_class="OCCURRENCE", ev_id="e2", chunk="B-VP",
            tense_aspect_pol="PAST+NONE+pos"),
        tok(".", "t7", 1, "PUN"),
    ])
    m = connective_marker_pair(doc, doc.entities["e1"], doc.entities["e2"])
    assert m.text == "as"
    assert m.position == "BETWEEN"
    # no connective column -> no marker
    doc2 = pp_doc()
    m2 = connective_marker_pair(doc2, doc2.entities["e1"],
                                doc2.entities["tmx1"])
    assert m2.text == "O"


def test_timex_value_template_and_unescape():
    from erex.features import timex_value_template
    from erex.timeml import unescape_token
    assert timex_value_template("1989-10-26") == "NNNN-NN-NN"
    assert timex_value_template("P3D") == "PND"
    assert timex_value_template("PAST_REF") == "PAST_REF"
    assert unescape_token("-LRB-") == "("
    assert unescape_token("``quote''") == '"quote"'


def test_coref_flag_and_wnsim_determinism():
    from erex.features import is_coreference, wn_sim_bucket
    doc = make_doc([
        tok("The", "t1", 1, "AT0"),
        tok("sale", "t2", 1, "NN1", ev_class="OCCURRENCE", ev_id="e1",
            coref_event="e2:e9"),
        tok("and", "t3", 1, "CJC"),
        tok("deal", "t4", 1, "NN1", ev_class="OCCURRENCE", ev_id="e2"),
        tok("closed", "t5", 1, "VVD", "close", deps="t2:SBJ",
            ev_class="OCCURRENCE", ev_id="e3", chunk="B-VP",
            tense_aspect_pol="PAST+NONE+pos"),
        tok(".", "t6", 1, "PUN"),
    ])
    assert is_coreference(doc, doc.entities["e1"], doc.entities["e2"])
    assert not is_coreference(doc, doc.entities["e2"], doc.entities["e1"])
    # real ws4j Lin over the vendored wnlin DB, discretized per
    # getDiscreteDoubleWordSimilarity: identical word -> Lin 1.0 ->
    # bucket 0.75 (the reference's >1 branch never fires)
    assert wn_sim_bucket("sale", "sale") == 0.75
    assert wn_sim_bucket("sale", "deal") == wn_sim_bucket("deal", "sale")
    assert wn_sim_bucket("sale", "deal") in (0.0, 0.25, 0.75)
    assert wn_sim_bucket("zzz-oov", "sale") == 0.0


def test_resumable_reprocesses_missing_fragment(tmp_path):
    import os
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from erex.corpus import corpus_parquet
    from erex.pipeline import run_flagship_resumable
    corpus = corpus_parquet(40, seed=13)   # sharded dir, 1 fragment
    out = tmp_path / "edges"
    m1 = run_flagship_resumable(corpus, str(out))
    assert m1["fragments_skipped"] == 0
    man = os.path.join(str(out), "_manifest")
    victim = sorted(os.listdir(man))[0]
    os.remove(os.path.join(man, victim))
    m2 = run_flagship_resumable(corpus, str(out))
    # only the fragment whose manifest went missing is redone
    assert m2["fragments_skipped"] == m2["fragments_total"] - 1
