"""J5: MLN-reasoner inferred-TLINK merge (experiment-only flow).

Re-derives the `tlinkFromInferredMLN` / `tlinkNonCandidateFromInferred`
branch of the TimeBank-Dense experiment driver
(/root/reference/src/task/TimeBankDenseExperiments.java:1233-1260 read,
:1286-1446 per-family override, :1418-1446 non-candidate leftovers).
The reference ships this flag OFF (main():979-982) and the external MLN
reasoner (alchemy/tuffy) is not part of the repo, so the reasoner-output
*file* is the interface: `prob<TAB>Pred(arg1, arg2, rel)` marginal rows,
the same ground-atom vocabulary our S9 evidence writer emits
(erex/sinks.py::mln_evidence_batch).

Replicated quirks (transcribed, all load-bearing):
- the literal string-transform parse chain (strip quotes, '(' -> tab,
  ')' removed, ', ' -> tab) and the prob > 0.5 gate (:1245-1252);
- event-DCT overrides take the inferred label RAW while event-timex and
  event-event overrides pass through getRelTypeCollapsed (:1301 vs
  :1318/:1373 — the DCT branch simply never collapses);
- consumed pairs are removed from the map via the keySet view, so the
  leftover pass only sees never-candidate pairs (:1302);
- leftovers iterate the java.util.HashMap keySet order (erex/javamap),
  are skipped when the REVERSED pair was already extracted, carry gold
  label VAGUE, a collapsed relation, and route tt / dct (target id
  ending in '0') / et / ee by id prefix (:1418-1446);
- the precisionOnly output filter drops rows whose final label is NONE
  (:1448-1460).
"""

from __future__ import annotations

from .javamap import java_hashmap_order_after_removals

# TimeBankDenseExperiments.getRelTypeCollapsed (:649-660)
_DENSE_COLLAPSE = {
    "BEGINS": "BEFORE", "BEGUN_BY": "AFTER", "ENDS": "AFTER",
    "ENDED_BY": "BEFORE", "IDENTITY": "SIMULTANEOUS",
    "DURING": "SIMULTANEOUS", "DURING_INV": "SIMULTANEOUS",
}


def collapse_dense(rel: str) -> str:
    return _DENSE_COLLAPSE.get(rel, rel)


def parse_inferred_mln(text: str, threshold: float = 0.5) -> dict:
    """Reasoner marginal rows -> {(src, tgt): rel}.  The transform chain
    is the reference's, applied literally (:1245-1252): quotes stripped,
    '(' becomes a tab, ')' dropped, ', ' becomes tabs; cols[0] must
    parse as the marginal probability."""
    out: dict = {}
    for line in text.splitlines():
        if not line.strip():
            continue
        rel = (line.replace('"', "").replace("(", "\t")
               .replace(")", "").replace(", ", "\t"))
        cols = rel.split("\t")
        if float(cols[0]) > threshold:   # parse failure raises, as Java does
            out[(cols[2], cols[3])] = cols[4]
    return out


def merge_inferred(rows: list, inferred: dict,
                   non_candidate_from_inferred: bool = True,
                   precision_only: bool = True) -> list:
    """Apply the inferred-TLINK override to classifier candidate rows.

    `rows` = [{pair_class: 'tt'|'dct'|'et'|'ee', subj, obj, gold, pred}]
    in candidate order.  Returns new rows (same order, overridden preds)
    plus leftover inferred-only rows appended per the reference's
    routing; `inferred` is consumed destructively (keySet removal)."""
    all_keys = ["%s-%s" % k for k in inferred]   # parse (insertion) order
    inferred = dict(inferred)
    out = []
    extracted = set()
    consumed = []
    for r in rows:
        r = dict(r)
        key = (r["subj"], r["obj"])
        if r["pair_class"] in ("dct", "et", "ee"):
            if key in inferred:
                label = inferred.pop(key)
                consumed.append("%s-%s" % key)
                # DCT keeps the raw inferred label (:1301); ET/EE collapse
                if r["pair_class"] != "dct":
                    label = collapse_dense(label)
                r["pred"] = label
                r["source"] = "mln"
            # only the classifier families feed `extracted` — TT rows
            # come from the timex-rule path and are never added
            # (:1316/:1336/:1415 vs the tt block at :1105-1125)
            extracted.add(key)
        out.append(r)

    if non_candidate_from_inferred:
        # replay the FULL put-then-remove history: the reference iterates
        # the ORIGINAL map after keySet removals, whose table capacity
        # reflects every inserted inferred pair (removals never shrink a
        # java.util.HashMap), so rebuilding from only the surviving keys
        # diverges once consumed pairs pushed the map past a resize
        order = java_hashmap_order_after_removals(all_keys, consumed)
        for skey in order:
            src, tgt = skey.split("-", 1)
            if (tgt, src) in extracted:
                continue
            rel = collapse_dense(inferred[(src, tgt)])
            if src.startswith("t") and tgt.startswith("t"):
                pc = "tt"
            elif src.startswith("e") and tgt.startswith("t"):
                pc = "dct" if tgt.endswith("0") else "et"
            elif src.startswith("e") and tgt.startswith("e"):
                pc = "ee"
            else:
                continue
            out.append({"pair_class": pc, "subj": src, "obj": tgt,
                        "gold": "VAGUE", "pred": rel, "source": "mln"})

    if precision_only:
        out = [r for r in out if r["pred"] != "NONE"]
    return out


def merge_batch(batch, inferred_by_doc: dict,
                doc_col: str = "doc_path"):
    """map_batches wrapper: per-doc inferred maps applied to edge rows
    (broadcast the small {doc: inferred} dict with ray.put and pass the
    resolved object here).  Rows from docs without an inferred map pass
    through unchanged."""
    import pyarrow as pa
    rows = batch.to_pylist()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r[doc_col], []).append(r)
    out_rows = []
    for doc, doc_rows in by_doc.items():
        inf = inferred_by_doc.get(doc)
        if inf:
            merged = merge_inferred(
                [dict(r, pair_class=r.get("pair_class", "ee")) for r in doc_rows],
                inf)
            for m in merged:
                m.setdefault(doc_col, doc)
            out_rows.extend(merged)
        else:
            out_rows.extend(doc_rows)
    # FIXED schema across batches: the per-batch union of row keys
    # would drop the merge-added columns for batches whose docs all
    # lack an inferred map (and all-None columns would infer pa.null),
    # breaking block concatenation in Ray Data
    _STR_COLS = ("pair_class", "subj", "obj", "gold", "pred", "source")
    cols = sorted(set(batch.column_names) | set(_STR_COLS))
    arrs = {}
    for c in cols:
        vals = [r.get(c) for r in out_rows]
        if c in _STR_COLS:
            arrs[c] = pa.array(vals, pa.string())
        elif c in batch.column_names:
            # keep the input column's type even when a batch leaves it
            # all-None (or empty)
            arrs[c] = pa.array(vals, batch.schema.field(c).type)
        else:
            arrs[c] = pa.array(vals)
    return pa.table(arrs)
