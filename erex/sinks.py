"""Secondary sinks (S6/S7) and training-matrix exports.

- triple TSV lines: the reference's productized output
  (`src \\t tgt \\t predLabel` accumulated per doc,
  /root/reference/src/relpro/TempRelPro.java:508-615);
- libsvm / CSV feature matrices (printLibSVMVectors / printCSVVectors,
  /root/reference/src/model/feature/PairFeatureVector.java:202-225):
  libsvm rows are `label idx:val ...` with 1-based feature indices and
  zeros skipped; CSV quotes commas/quotes like the reference's
  COMMA/QUOT escaping (X6).
"""

from __future__ import annotations

import pyarrow as pa


def triples_tsv_batch(batch: pa.Table) -> pa.Table:
    """Edge rows -> one TSV line per triple (doc-tagged)."""
    lines, shas = [], []
    for r in batch.to_pylist():
        if r["kind"] != "edge":
            continue
        lines.append("%s\t%s\t%s" % (r["subj"], r["obj"], r["pred"]))
        shas.append(r["doc_sha"])
    return pa.table({"doc_sha": pa.array(shas, pa.string()),
                     "line": pa.array(lines, pa.string())})


def write_triples_tsv(ds, out_dir: str) -> None:
    """The (subj, pred, obj) triple-stream sink as partitioned text-like
    parquet (one `line` column; stable within partition)."""
    from ._env import remote_args
    ds.map_batches(triples_tsv_batch, batch_format="pyarrow",
                   **remote_args()).write_parquet(out_dir)


def libsvm_line(label_num: int, vec) -> str:
    """1-based sparse libsvm row, zeros skipped
    (PairFeatureVector.java:214-225)."""
    parts = [str(label_num)]
    for i, v in enumerate(vec):
        if v != 0:
            parts.append("%d:%s" % (i + 1, ("%g" % float(v))))
    return " ".join(parts)


def csv_line(label: str, vec) -> str:
    """CSV row with the reference's COMMA/QUOT escaping (X6)."""
    cells = []
    for v in vec:
        s = str(v)
        s = s.replace('"', "QUOT").replace(",", "COMMA")
        cells.append(s)
    cells.append(label)
    return ",".join(cells)


# S9: MLN evidence ground atoms (RelTT/RelET/RelEE(e1, e2, REL) per doc,
# /root/reference/src/task/TimeBankDenseExperiments.java:1106-1199)
_MLN_PRED = {"tt": "RelTT", "dct": "RelET", "et": "RelET", "ee": "RelEE",
             "causal": "RelEE"}


def mln_evidence_batch(batch: pa.Table) -> pa.Table:
    """Edge rows -> MLN evidence atoms (doc_sha, atom)."""
    shas, atoms = [], []
    for r in batch.to_pylist():
        if r["kind"] != "edge":
            continue
        pred = _MLN_PRED.get(r["pair_class"], "RelEE")
        atoms.append("%s(%s, %s, %s)" % (pred, r["subj"], r["obj"],
                                         r["pred"]))
        shas.append(r["doc_sha"])
    return pa.table({"doc_sha": pa.array(shas, pa.string()),
                     "atom": pa.array(atoms, pa.string())})


# S8: Weka ARFF export (writeArffFile,
# /root/reference/src/model/classifier/PairClassifier.java:1901-1926)
def arff_document(name: str, feature_names, rows) -> str:
    """rows = [(vector, label)] -> one ARFF document string. Binary
    features are {0,1}, wnSim {0.0,0.25,0.75,1.0}, label the 14-TLINK
    vocabulary."""
    from .labels import TLINK_LABELS
    out = ["@relation " + name, ""]
    for s in feature_names:
        if s == "label":
            out.append("@attribute label {" + ", ".join(TLINK_LABELS) + "}")
        elif s == "wnSim":
            out.append("@attribute wnSim {0.0,0.25,0.75,1.0}")
        else:
            out.append("@attribute %s {0,1}" % s)
    out.append("")
    out.append("@data")
    for vec, label in rows:
        cells = []
        for s, v in zip(feature_names, vec):
            if s == "wnSim":
                cells.append(str(float(v)))
            else:
                cells.append(str(int(v)))
        cells.append(label)
        out.append(",".join(cells))
    return "\n".join(out)


def feature_matrix_batch(batch: pa.Table, fmt: str = "libsvm") -> pa.Table:
    """Pair rows (with feats) -> training-matrix lines; classifier-bound
    rows only. `fmt` = 'libsvm' | 'csv'."""
    from .labels import tlink_label_num, clink_label_num
    lines, classes = [], []
    for r in batch.to_pylist():
        if r["kind"] != "pair" or r["feats"] is None:
            continue
        gold = r["gold"] or "NONE"
        if r["pair_class"] == "causal":
            num = clink_label_num(gold)
        else:
            num = tlink_label_num(gold)
        if fmt == "libsvm":
            lines.append(libsvm_line(num, r["feats"]))
        else:
            lines.append(csv_line(gold, r["feats"]))
        classes.append(r["pair_class"])
    return pa.table({"pair_class": pa.array(classes, pa.string()),
                     "line": pa.array(lines, pa.string())})
