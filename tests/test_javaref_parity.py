"""Parity against the COMPILED REFERENCE SYSTEM's actual output.

The golden files under tests/golden/javaref/ are the stdout of the
reference's own TempRelPro / CauseRelPro test flows (shipped liblinear
models, real Java parser/features/rules), produced by
tools/javaref/Driver.java over 200 synthetic corpus docs and the two
reference example documents.  Regenerate with:

    tools/javaref/build.sh
    cd /root/reference && java -cp "/tmp/javaref_classes:lib/*" \
        javaref.Driver temprel <files...>

These tests assert EXACT set equality (P = R = 1.0) of the engine's
triples against the reference output — far above the P/R >= 0.95 target.
ws4j is stubbed identically on both sides (see tools/javaref/stubs and
erex/features.py wn_sim_bucket), so wnSim is consistent by construction.
"""

import collections
import os

import pytest

from erex.corpus import generate_txp
from erex.extract import PipelineConfig, extract_document

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden", "javaref")
EXAMPLE_DIR = "/root/reference/data/example_TXP"

# testModel flavor: rules + classifiers only — no anchor reasoning,
# closure or CLINK post-edit (TempRelPro.java:508-615); causal TLINK
# one-hot from the TXP gold annotation (CauseRelPro standalone).
CFG_T = PipelineConfig(anchor_reasoning=False, closure=False,
                       clink_postedit=False, causal=False)
CFG_C = PipelineConfig(anchor_reasoning=False, closure=False,
                       clink_postedit=False, causal=True,
                       causal_tlink_gold=True)


def _load_gold(*names):
    gold = collections.defaultdict(set)
    for name in names:
        with open(os.path.join(GOLD_DIR, name)) as f:
            for line in f:
                doc, s, t, l = line.rstrip("\n").split("\t")
                gold[doc].add((s, t, l))
    return gold


def _triples(content, name, cfg, causal_only=False):
    rows = extract_document(content, config=cfg, name=name)["triples"]
    if causal_only:
        rows = [r for r in rows if r["pair_class"] == "causal"]
    return {(r["src"], r["tgt"], r["label"]) for r in rows}


def test_synth_temprel_exact_parity():
    gold = _load_gold("synth_temprel.tsv")
    total = mismatched = 0
    for i in range(200):
        name = f"doc_{i}.txp"
        mine = _triples(generate_txp(i), name, CFG_T)
        total += len(gold[name])
        if mine != gold[name]:
            mismatched += 1
    assert total > 9000
    assert mismatched == 0


def test_synth_causal_exact_parity():
    gold = _load_gold("synth_causal.tsv")
    bad = []
    for i in range(200):
        name = f"doc_{i}.txp"
        mine = _triples(generate_txp(i), name, CFG_C, causal_only=True)
        if mine != gold[name]:
            bad.append(name)
    assert bad == []


@pytest.mark.parametrize("fn", ["bbc_20130322_721.tml.txp",
                                "wsj_1014.tml.txp"])
def test_example_doc_temprel_exact_parity(fn):
    if not os.path.exists(EXAMPLE_DIR):
        pytest.skip("reference example docs not available")
    gold = _load_gold("example_temprel.tsv")
    with open(os.path.join(EXAMPLE_DIR, fn)) as f:
        content = f.read()
    mine = _triples(content, fn, CFG_T)
    assert mine == gold[fn]
    assert len(mine) >= 70


def test_example_doc_causal_exact_parity():
    if not os.path.exists(EXAMPLE_DIR):
        pytest.skip("reference example docs not available")
    fn = "wsj_1014.tml.txp"
    gold = _load_gold("example_causal.tsv")
    with open(os.path.join(EXAMPLE_DIR, fn)) as f:
        content = f.read()
    mine = _triples(content, fn, CFG_C, causal_only=True)
    assert mine == gold[fn]
    assert len(mine) == 34


def test_feature_vector_parity():
    """Raw liblinear vectors equal the reference featurizer's CSV dump
    (Driver features mode) for every overlapping candidate pair."""
    import numpy as np
    from erex.extract import (PAIR_CAUSAL, PAIR_DCT, PAIR_EE, PAIR_ET,
                              stage1_document)
    from erex.features import CAUSAL_DIM
    from erex.labels import TLINK_LABELS

    gold = {}
    with open(os.path.join(GOLD_DIR, "synth_features_doc01.tsv")) as f:
        for line in f:
            doc, cat, e1, e2, csv = line.rstrip("\n").split("\t")
            gold[(doc, cat, e1, e2)] = [float(x) for x in csv.split(",")]

    catmap = {PAIR_DCT: "dct", PAIR_ET: "et", PAIR_EE: "ee",
              PAIR_CAUSAL: "caus"}
    checked = 0
    for i in (0, 1):
        name = f"doc_{i}.txp"
        s1 = stage1_document(generate_txp(i), name=name, config=CFG_C)
        from erex.extract import attach_gold_tlink  # noqa: F401
        for p in s1["pairs"]:
            if p["feats"] is None:
                continue
            key = (name, catmap[p["pair_class"]], p["src"], p["tgt"])
            if key not in gold:
                continue
            g = np.array(gold[key][:-1])        # drop trailing label col
            m = np.array(p["feats"], dtype=float)
            if key[1] == "caus":
                t = p.get("gold_tlink")
                if t in TLINK_LABELS:
                    m[CAUSAL_DIM - 14 + TLINK_LABELS.index(t)] = 1.0
            assert g.shape == m.shape, key
            assert (g == m).all(), (key, list((g != m).nonzero()[0] + 1))
            checked += 1
    assert checked >= 40


def _dense_rows(content, name):
    from erex.extract import DENSE_CONFIG
    rows = extract_document(content, config=DENSE_CONFIG, name=name)["triples"]
    return {(r["src"], r["tgt"], r["label"]) for r in rows
            if r["pair_class"] in ("dct", "et", "ee")}


def _load_dense_gold(fname):
    gold = collections.defaultdict(set)
    with open(os.path.join(GOLD_DIR, fname)) as f:
        for line in f:
            doc, _cat, s, t, _g, l = line.rstrip("\n").split("\t")
            gold[doc].add((s, t, l))
    return gold


def test_synth_dense_exact_parity():
    """ST4 dense heads vs the compiled reference running the shipped
    TimeBank-Dense flow (Driver dense mode; tbdense-{dct,et,ee}.model,
    predictDense labelDense decode, 167-dim E-DCT vectors, no rule
    sieve — TimeBankDenseExperiments.java:965-990,1286-1380)."""
    gold = _load_dense_gold("dense_synth.tsv")
    total = 0
    bad = []
    for i in range(200):
        name = f"doc_{i}.txp"
        mine = _dense_rows(generate_txp(i), name)
        total += len(gold[name])
        if mine != gold[name]:
            bad.append(name)
    assert total > 5000
    assert bad == []


@pytest.mark.parametrize("fn", ["bbc_20130322_721.tml.txp",
                                "wsj_1014.tml.txp"])
def test_example_doc_dense_exact_parity(fn):
    if not os.path.exists(EXAMPLE_DIR):
        pytest.skip("reference example docs not available")
    gold = _load_dense_gold("dense_example.tsv")
    with open(os.path.join(EXAMPLE_DIR, fn)) as f:
        content = f.read()
    mine = _dense_rows(content, fn)
    assert mine == gold[fn]
    assert len(mine) >= 50


def test_dense_dct_feature_vector_parity():
    """The 167-dim EventDctRelationClassifier vector, bit-identical to
    the reference featurizer's CSV dump (Driver densefeat mode)."""
    import numpy as np
    from erex.extract import DENSE_CONFIG, PAIR_DCT, stage1_document

    gold = {}
    with open(os.path.join(GOLD_DIR, "densefeat_synth.tsv")) as f:
        for line in f:
            doc, _cat, e1, e2, csv = line.rstrip("\n").split("\t")
            gold[(doc, e1, e2)] = [float(x) for x in csv.split(",")]

    checked = 0
    for i in (0, 1):
        name = f"doc_{i}.txp"
        s1 = stage1_document(generate_txp(i), name=name,
                             config=DENSE_CONFIG)
        for p in s1["pairs"]:
            if p["pair_class"] != PAIR_DCT or p["feats"] is None:
                continue
            key = (name, p["src"], p["tgt"])
            if key not in gold:
                continue
            g = np.array(gold[key][:-1])        # drop trailing label col
            m = np.array(p["feats"], dtype=float)
            assert g.shape == m.shape == (167,), key
            assert (g == m).all(), (key, list((g != m).nonzero()[0] + 1))
            checked += 1
    assert checked >= 15


@pytest.mark.parametrize("stem", ["bbc_20130322_721", "wsj_1014"])
def test_full_timeml_writer_parity(stem):
    """S5 full-document writer vs the reference's own writeTimeMLFile
    output (tools/javaref writetml mode): byte-equal reconstructed TEXT,
    identical MAKEINSTANCE set, identical TLINK sequence (lid order)."""
    import re
    if not os.path.exists(EXAMPLE_DIR):
        pytest.skip("reference example docs not available")
    from erex.timeml import render_timeml_document

    txp = open(os.path.join(EXAMPLE_DIR, stem + ".tml.txp")).read()
    tml = open(f"/root/reference/data/example_TML/{stem}.tml").read()
    gold = open(os.path.join(GOLD_DIR, "systml", stem + ".tml")).read()

    # build the tt/et/ee result lists in the reference's emission order
    # from the (already exactly parity-checked) engine triples
    rows = extract_document(txp, config=CFG_T, name=stem)["triples"]
    tt = [r for r in rows if r["pair_class"] == "tt"]
    # merge_document returns tt rows in closure-input order; the writer
    # emits in HashMap keySet order, carried per row as tt_seq
    tt.sort(key=lambda r: r["tt_seq"])

    def sel(pc, stage):
        rs = [r for r in rows
              if r["pair_class"] == pc and r["stage"] == stage]
        if stage == "rule":
            rs.reverse()    # undo the merge's rule-first prepend reversal
        return rs

    et = (sel("dct", "rule") + sel("et", "rule")
          + sel("dct", "classifier") + sel("et", "classifier"))
    ee = sel("ee", "rule") + sel("ee", "classifier")
    as3 = lambda rs: [(r["src"], r["tgt"], r["label"]) for r in rs]
    mine = render_timeml_document(txp, tml, as3(tt), as3(et), as3(ee))

    def text_block(s):
        return s[s.index("<TEXT>") + 6:s.index("</TEXT>")]

    def instances(s):
        out = set()
        for m in re.finditer(r"<MAKEINSTANCE\b[^>]*>", s):
            out.add(tuple(sorted(re.findall(r'(\w+)="([^"]*)"', m.group()))))
        return out

    def links(s):
        out = []
        for m in re.finditer(r"<TLINK\b[^>]*>", s):
            out.append(tuple(sorted(re.findall(r'(\w+)="([^"]*)"',
                                               m.group()))))
        return out

    assert text_block(mine).strip() == text_block(gold).strip()
    assert instances(mine) == instances(gold)
    assert links(mine) == links(gold)
    assert len(links(mine)) == len(tt) + len(et) + len(ee)


def test_javamap_matches_real_jvm_hashmap():
    """Property check of erex/javamap.py against a real JVM: random
    entity-id-shaped key sets of varying sizes must iterate in exactly
    java.util.HashMap's order."""
    import random
    import shutil
    import subprocess
    import tempfile

    from erex.javamap import java_hashmap_order

    javac, java = shutil.which("javac"), shutil.which("java")
    if not (javac and java):
        pytest.skip("JVM not available")
    src = os.path.join(os.path.dirname(__file__), "..", "tools",
                       "javaref", "driver", "javaref", "HashOrder.java")
    with tempfile.TemporaryDirectory() as td:
        subprocess.run([javac, "-d", td, src], check=True)
        rng = random.Random(7)
        groups = []
        for size in (1, 3, 11, 12, 13, 48, 49, 100, 193, 300):
            ks = []
            seen = set()
            while len(ks) < size:
                kind = rng.choice(["e%d", "tmx%d", "e%d\ttmx%d"])
                k = kind % tuple(rng.randrange(3000)
                                 for _ in range(kind.count("%d")))
                if k not in seen:
                    seen.add(k)
                    ks.append(k)
            groups.append(ks)

        # forced-collision groups exercising the treeify machinery:
        # bins with >=9 same-slot keys (tree bins at cap>=64, extra
        # resizes below), putTreeVal splicing, split + untreeify.
        from erex.javamap import _hash_signed
        by_slot = {}
        for i in range(40000):
            k = "e%d" % i
            by_slot.setdefault(_hash_signed(k) & 63, []).append(k)
        big = sorted(by_slot.values(), key=len, reverse=True)
        # (a) 12 colliding keys alone: treeifyBin forces resizes 16->64+
        groups.append(big[0][:12])
        # (b) collisions + filler at cap 64: a genuine tree bin, then
        # more same-slot inserts via putTreeVal
        groups.append(big[0][:14] + [k for g in big[5:25] for k in g[:2]])
        # (c) two tree bins at once + enough keys to force a resize
        # after treeification (split path, one side untreeifies)
        mixed = big[0][:11] + big[1][:11] + [k for g in big[10:40]
                                             for k in g[:1]]
        rng.shuffle(mixed)
        groups.append(mixed)
        # (d) interleaved inserts so tree bins grow node by node
        inter = []
        for pair in zip(big[0][:13], big[1][:13]):
            inter.extend(pair)
        groups.append(inter)
        stdin = "\n\n".join("\n".join(g) for g in groups) + "\n"
        res = subprocess.run([java, "-cp", td, "javaref.HashOrder"],
                             input=stdin, capture_output=True, text=True,
                             check=True)
        got = [g.split("\n") for g in res.stdout.strip("\n").split("\n\n")]
        assert len(got) == len(groups)
        for ks, jv in zip(groups, got):
            assert java_hashmap_order(ks) == jv, len(ks)


def test_javamap_remove_matches_real_jvm_hashmap():
    """Put-then-remove parity against a real JVM HashMap — the semantics
    the MLN leftover pass depends on (erex/mln.py): the table capacity
    reflects ALL inserted keys even after removals, and tree-bin
    removals go through removeTreeNode (RB delete, untreeify below the
    root-shape threshold, moveRootToFront)."""
    import random
    import shutil
    import subprocess
    import tempfile

    from erex.javamap import _JavaHashMap, _hash_signed

    javac, java = shutil.which("javac"), shutil.which("java")
    if not (javac and java):
        pytest.skip("JVM not available")
    src = os.path.join(os.path.dirname(__file__), "..", "tools",
                       "javaref", "driver", "javaref", "HashOrder.java")

    def replay(ops):
        m = _JavaHashMap()
        for op in ops:
            if op.startswith("-"):
                m.remove(op[1:])
            else:
                m.put(op)
        return m.keys()

    with tempfile.TemporaryDirectory() as td:
        subprocess.run([javac, "-d", td, src], check=True)
        rng = random.Random(42)
        groups = []
        # the MLN shape: N inserts past a resize threshold, then most
        # consumed — iteration must follow the grown table's capacity
        for n, n_rm in ((20, 15), (13, 12), (49, 30), (100, 96)):
            ks = ["e%d-t%d" % (rng.randrange(400), i) for i in range(n)]
            rm = rng.sample(ks, n_rm) + ["e9999-t9999"]  # missing-key no-op
            groups.append(ks + ["-" + k for k in rm])
        # interleaved puts and removes
        ops = []
        live = []
        for i in range(300):
            if live and rng.random() < 0.4:
                ops.append("-" + live.pop(rng.randrange(len(live))))
            else:
                k = "e%d" % rng.randrange(5000)
                if k not in live:
                    live.append(k)
                    ops.append(k)
        groups.append(ops)
        # tree-bin removals: >=11 same-slot keys treeify, then removals
        # exercise RB delete, root replacement, and the untreeify path
        by_slot = {}
        for i in range(40000):
            k = "e%d" % i
            by_slot.setdefault(_hash_signed(k) & 63, []).append(k)
        big = sorted(by_slot.values(), key=len, reverse=True)
        tree = big[0][:14]
        # (a) remove down to below the untreeify shape threshold
        groups.append(tree + ["-" + k for k in tree[:11]])
        # (b) remove a few (RB delete incl. the root), keep the tree
        groups.append(tree + ["-" + tree[0], "-" + tree[7], "-" + tree[13]])
        # (c) remove then re-insert via putTreeVal
        groups.append(tree + ["-" + tree[2], "-" + tree[5]] + big[1][:3]
                      + [tree[2]])
        # (d) two tree bins, removals from both interleaved with filler
        two = big[0][:12] + big[1][:12] + [g[0] for g in big[10:30]]
        rng.shuffle(two)
        rms = ["-" + k for k in big[0][2:8] + big[1][3:9]]
        groups.append(two + rms)
        stdin = "\n\n".join("\n".join(g) for g in groups) + "\n"
        res = subprocess.run([java, "-cp", td, "javaref.HashOrder"],
                             input=stdin, capture_output=True, text=True,
                             check=True)
        parts = res.stdout.strip("\n").split("\n\n")
        got = [g.split("\n") if g else [] for g in parts]
        assert len(got) == len(groups)
        for ops, jv in zip(groups, got):
            assert replay(ops) == jv, len(ops)


def test_adversarial_causal_markers():
    """Multi-signal causal-marker parity against the compiled reference.

    tests/golden/javaref/adv/*.txp (tools/adversarial_causal.py) put
    SEVERAL causal signals around one candidate pair, so the winning
    marker depends on getCausalSignal's exact bookkeeping: HashMap
    key order, the shared per-key counter i added to every distance,
    and the collision loop that bumps i.  The golden is the live
    system's `javaref.Driver causmark` stdout; the previous
    context-major/file-order implementation provably diverged on two
    adv3 pairs (it picked 'due to' BEFORE where Java picks 'hence')."""
    from erex.extract import causal_candidates
    from erex.features import causal_signal_pair
    from erex.txp import parse_txp

    gold = {}
    with open(os.path.join(GOLD_DIR, "causmark_adv.tsv")) as f:
        for line in f:
            doc, s, t, _rule, text, cluster, pos, d1, d2 = \
                line.rstrip("\n").split("\t")
            gold[(doc, s, t)] = (text, cluster, pos, d1, d2)
    assert len(gold) == 13
    seen = 0
    for name in ("adv0", "adv1", "adv2", "adv3"):
        path = os.path.join(GOLD_DIR, "adv", name + ".txp")
        doc = parse_txp(open(path).read(), name=name)
        cands = causal_candidates(doc)
        for (a, b) in cands:
            m = causal_signal_pair(doc, doc.entities[a], doc.entities[b])
            key = (name + ".txp", a, b)
            assert key in gold, "candidate set mismatch: %s" % (key,)
            assert gold[key] == (m.text, m.cluster, m.position,
                                 m.dep1, m.dep2), key
            seen += 1
    assert seen == 13


def test_adversarial_temporal_markers():
    """Multi-signal TEMPORAL-marker parity against the compiled
    reference (tools/adversarial_tempsig.py docs, `javaref.Driver
    tempmark` golden).  getTemporalSignal scans EVERY reverse-sorted
    key into one distance-keyed map with overwrite — the engine's
    previous first-match-wins scan diverged on tadv5 ('when' vs the
    nearer later key 'previously')."""
    from erex.features import temporal_signal_pair
    from erex.txp import parse_txp

    rows = [l.rstrip("\n").split("\t")
            for l in open(os.path.join(GOLD_DIR, "tempmark_adv.tsv"))]
    assert len(rows) == 7
    docs = {}
    for doc_name, _cat, a, b, text, cluster, pos, d1, d2 in rows:
        name = doc_name[:-4]
        if name not in docs:
            path = os.path.join(GOLD_DIR, "adv", name + ".txp")
            docs[name] = parse_txp(open(path).read(), name=name)
        doc = docs[name]
        m = temporal_signal_pair(doc, doc.entities[a], doc.entities[b])
        assert (text, cluster, pos, d1, d2) == \
            (m.text, m.cluster, m.position, m.dep1, m.dep2), (doc_name, a, b)


def test_adversarial_connective_markers():
    """Discourse-connective marker parity against the compiled
    reference (tools/adversarial_connective.py docs, `javaref.Driver
    connmark` golden).  Pins three quirks the engine previously got
    wrong: AFTER markers carry no dep paths, the temporal INSIDE
    marker's deps come from the BEGIN-window run, and the
    cross-sentence BEGIN-BETWEEN window starts at SENTENCE 1's start
    (cadv2/cadv3 found their markers only via that widened window)."""
    from erex.features import connective_marker_pair
    from erex.txp import parse_txp

    rows = [l.rstrip("\n").split("\t")
            for l in open(os.path.join(GOLD_DIR, "connmark_adv.tsv"))]
    assert len(rows) == 6
    docs = {}
    for f in rows:
        doc_name, _cat, a, b = f[0], f[1], f[2], f[3]
        name = doc_name[:-4]
        if name not in docs:
            path = os.path.join(GOLD_DIR, "adv", name + ".txp")
            docs[name] = parse_txp(open(path).read(), name=name)
        doc = docs[name]
        e1, e2 = doc.entities[a], doc.entities[b]
        mt = connective_marker_pair(doc, e1, e2, "Temporal")
        mc = connective_marker_pair(doc, e1, e2, "Contingency")
        assert tuple(f[4:8]) == (mt.text, mt.position, mt.dep1, mt.dep2), \
            (doc_name, a, b, "temporal")
        assert tuple(f[8:12]) == (mc.text, mc.position, mc.dep1, mc.dep2), \
            (doc_name, a, b, "causal")


def test_bulk_marker_parity_synthetic_corpus():
    """Marker-LEVEL parity over 50 synthetic corpus docs: 3,182 golden
    rows from the compiled reference's tempmark / causmark / connmark /
    entmark driver modes (pair temporal signal, pair causal signal,
    temporal+causal connectives, per-entity temporal signal).  Stronger
    than the triple-level goldens — a marker divergence that does not
    flip any classifier prediction would hide there but not here.
    Regenerate: write docs 0..49 via generate_txp to .txp files, run
    `javaref.Driver <mode>` over them (dct pairs are skipped by the
    connmark/entmark modes: the reference NPEs on the DCT's null
    sentence id)."""
    from erex.features import (causal_signal_pair, connective_marker_pair,
                               temporal_signal_pair,
                               temporal_signal_per_entity)
    from erex.txp import parse_txp

    docs = {}

    def get(name):
        if name not in docs:
            docs[name] = parse_txp(generate_txp(int(name[4:-4])),
                                   name=name)
        return docs[name]

    def check(fname, fn, ncols, has_cat=True):
        n = 0
        for line in open(os.path.join(GOLD_DIR, fname)):
            f = line.rstrip("\n").split("\t")
            a, b = (f[2], f[3]) if has_cat else (f[1], f[2])
            doc = get(f[0])
            got = fn(doc, doc.entities[a], doc.entities[b])
            assert tuple(f[4:4 + ncols]) == got[:ncols], (fname, f[0], a, b)
            n += 1
        return n

    as5 = lambda m: (m.text, m.cluster, m.position, m.dep1, m.dep2)

    def conn(d, e1, e2):
        mt = connective_marker_pair(d, e1, e2, "Temporal")
        mc = connective_marker_pair(d, e1, e2, "Contingency")
        return (mt.text, mt.position, mt.dep1, mt.dep2,
                mc.text, mc.position, mc.dep1, mc.dep2)

    n = check("tempmark_synth.tsv",
              lambda d, e1, e2: as5(temporal_signal_pair(d, e1, e2)), 5)
    n += check("causmark_synth.tsv",
               lambda d, e1, e2: as5(causal_signal_pair(d, e1, e2)), 5,
               has_cat=False)
    n += check("connmark_synth.tsv", conn, 8)
    n += check("entmark_synth.tsv",
               lambda d, e1, e2: as5(temporal_signal_per_entity(d, e2)), 5)
    # verbmark: Java's getVerbMarker cluster is null for verbs absent
    # from the verb list ("lead-to", "have") — normalized to the
    # engine's "O", the only admissible difference
    from erex.features import causal_verb_pair
    for line in open(os.path.join(GOLD_DIR, "verbmark_synth.tsv")):
        f = line.rstrip("\n").split("\t")
        doc = get(f[0])
        m = causal_verb_pair(doc, doc.entities[f[2]], doc.entities[f[3]])
        gold = tuple("O" if g == "null" else g for g in f[4:9])
        assert gold == as5(m), (f[0], f[2], f[3])
        n += 1
    assert n == 3643


def test_bulk_marker_parity_example_docs():
    """Marker-level parity over the REFERENCE'S OWN example documents
    (real newswire text): 1,490 golden rows across the five marker
    families. Real text caught two divergences the synthetic corpus
    never produced: presence is `contains(" key ")` over the UNPADDED
    context join — satisfied by ANY interior occurrence even when the
    last occurrence rides the window edge (tid/distance still resolve
    by raw lastIndexOf to that edge) — and the per-entity BEGIN branch
    resolves its tid forward but its distance REVERSED (the reference
    passes position "BETWEEN" to the distance call)."""
    from erex.features import (causal_signal_pair, causal_verb_pair,
                               connective_marker_pair,
                               temporal_signal_pair,
                               temporal_signal_per_entity)
    from erex.txp import parse_txp

    docs = {}

    def get(name):
        if name not in docs:
            docs[name] = parse_txp(
                open(os.path.join(EXAMPLE_DIR, name)).read(), name=name)
        return docs[name]

    as5 = lambda m: (m.text, m.cluster, m.position, m.dep1, m.dep2)

    def conn(d, e1, e2):
        mt = connective_marker_pair(d, e1, e2, "Temporal")
        mc = connective_marker_pair(d, e1, e2, "Contingency")
        return (mt.text, mt.position, mt.dep1, mt.dep2,
                mc.text, mc.position, mc.dep1, mc.dep2)

    def check(fname, fn, ncols, has_cat=True, nullify=False):
        n = 0
        for line in open(os.path.join(GOLD_DIR, fname)):
            f = line.rstrip("\n").split("\t")
            a, b = (f[2], f[3]) if has_cat else (f[1], f[2])
            doc = get(f[0])
            got = fn(doc, doc.entities[a], doc.entities[b])
            gold = tuple(f[4:4 + ncols])
            if nullify:
                gold = tuple("O" if g == "null" else g for g in gold)
            assert gold == got[:ncols], (fname, f[0], a, b)
            n += 1
        return n

    if not os.path.exists(EXAMPLE_DIR):
        pytest.skip("reference example docs not available")
    n = check("tempmark_example.tsv",
              lambda d, a, b: as5(temporal_signal_pair(d, a, b)), 5)
    n += check("causmark_example.tsv",
               lambda d, a, b: as5(causal_signal_pair(d, a, b)), 5,
               has_cat=False)
    n += check("connmark_example.tsv", conn, 8)
    n += check("entmark_example.tsv",
               lambda d, a, b: as5(temporal_signal_per_entity(d, b)), 5)
    n += check("verbmark_example.tsv",
               lambda d, a, b: as5(causal_verb_pair(d, a, b)), 5,
               nullify=True)
    assert n == 1490


# ---------------------------------------------------------------------------
# TaskC merge path (R4 anchor reasoning + R6 CLINK post-edit + O4
# rule-first closure-input ordering) vs the compiled reference
# (tools/javaref `Driver taskc`, TempEval3TaskC.java:439-556)
# ---------------------------------------------------------------------------
def _load_clinks(name_):
    """Replicates TempEval3TaskC.getCLINKs: both directions, inverse
    label for the flipped pair."""
    from erex.extract import inverse_clink
    clinks = collections.defaultdict(dict)
    with open(os.path.join(GOLD_DIR, name_)) as f:
        for line in f:
            fn, e1, e2, lbl = line.rstrip("\n").split("\t")
            clinks[fn][(e1, e2)] = lbl
            clinks[fn][(e2, e1)] = inverse_clink(lbl)
    return clinks


def _load_taskc_gold(name_):
    gold = collections.defaultdict(
        lambda: {"tt": [], "et": [], "ee": [], "graph": []})
    with open(os.path.join(GOLD_DIR, name_)) as f:
        for line in f:
            c = line.rstrip("\n").split("\t")
            if c[1] == "graph":
                gold[c[0]]["graph"].append((c[3], c[4], c[5]))
            else:
                gold[c[0]][c[1]].append((c[2], c[3], c[4], c[5]))
    return gold


def _assert_taskc_doc(content, name, gold, clinks):
    from erex.extract import taskc_sections
    mine = taskc_sections(content, name=name,
                          external_clinks=clinks.get(name))
    for sec in ("tt", "et", "ee"):
        assert sorted(mine[sec]) == sorted(gold[name][sec]), (name, sec)
    # the closure-input sequence is order-exact: rule-first prepends,
    # tt SIMULTANEOUS->IDENTITY relabel, HashMap keySet iteration
    assert mine["graph"] == gold[name]["graph"], (name, "graph order")


def test_taskc_merge_parity_examples():
    """Anchor-reasoning + CLINK-post-edit merge on the two reference
    example docs, with clinks from the reference's own causal output."""
    if not os.path.exists(EXAMPLE_DIR):
        pytest.skip("reference example docs not available")
    gold = _load_taskc_gold("taskc_example.tsv")
    clinks = _load_clinks("example_causal.tsv")
    for stem in ("wsj_1014", "bbc_20130322_721"):
        name = stem + ".tml.txp"
        with open(os.path.join(EXAMPLE_DIR, name)) as f:
            _assert_taskc_doc(f.read(), name, gold, clinks)


def test_taskc_merge_parity_synthetic_corpus():
    """200 synthetic docs: 9,362 closure-input rows in the reference's
    exact order plus set-equal tt/et/ee prediction sections."""
    gold = _load_taskc_gold("taskc_synth.tsv")
    clinks = _load_clinks("synth_causal.tsv")
    total = 0
    for i in range(200):
        name = f"doc_{i}.txp"
        _assert_taskc_doc(generate_txp(i), name, gold, clinks)
        total += len(gold[name]["graph"])
    assert total > 9000


# ---------------------------------------------------------------------------
# wnlin Lin similarity (F11/ST6) vs a live JVM running the shared stub
# ---------------------------------------------------------------------------
def test_wnlin_matches_real_jvm_bit_exact():
    """The engine's Lin (erex/wnlin.py) and the compiled-reference stub
    (tools/javaref/stubs/edu/cmu/lti/...) read the same vendored
    database and must produce BIT-identical doubles for every vocabulary
    pair (plus OOV and case probes) — the guarantee that makes the
    parity goldens exercise a genuinely shared wnSim."""
    import itertools
    import shutil
    import struct
    import subprocess
    import tempfile

    from erex.wnlin import _db, lin

    javac, java = shutil.which("javac"), shutil.which("java")
    if not (javac and java):
        pytest.skip("JVM not available")
    here = os.path.dirname(__file__)
    jroot = os.path.join(here, "..", "tools", "javaref")
    src = os.path.join(jroot, "driver", "javaref", "LinCheck.java")
    stubs = os.path.join(jroot, "stubs")
    wndir = os.path.join(here, "..", "erex", "resources", "wnlin")

    words, _anc, _ic = _db()
    vocab = sorted({w for (w, _p) in words})
    pairs = list(itertools.product(vocab, vocab))
    pairs += [("rise", "rise"), ("rise", "surge"), ("RISE", "Surge"),
              ("zzz-oov", "rise"), ("zzz-oov", "zzz-oov"),
              ("price-cutting", "cut")]
    with tempfile.TemporaryDirectory() as td:
        subprocess.run([javac, "-d", td, "-sourcepath", stubs, src],
                       check=True)
        stdin = "".join(f"{a}\t{b}\n" for a, b in pairs)
        res = subprocess.run(
            [java, f"-Derex.wnlin.dir={wndir}", "-cp", td,
             "javaref.LinCheck"],
            input=stdin, capture_output=True, text=True, check=True)
        got = res.stdout.split()
        assert len(got) == len(pairs)
        n_nonzero = 0
        for (a, b), jbits in zip(pairs, got):
            mine = struct.pack(">d", lin(a, b)).hex().lstrip("0") or "0"
            assert mine == jbits, (a, b)
            if jbits != "0":
                n_nonzero += 1
        # the check is vacuous if everything is OOV-zero
        assert n_nonzero > 1000
