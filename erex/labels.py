"""Label vocabularies and label maps (closed enums).

Semantics re-derived from the reference (cited, not copied):
- TLINK 14-label set: /root/reference/src/model/feature/PairFeatureVector.java:77-79
- TimeBank-Dense collapsed 6-label set: PairFeatureVector.java:84-85
- CLINK 3-label set: PairFeatureVector.java:81-82
- inverse TLINK map (even/odd pairing over a 12-entry array, labels not in
  the array — IDENTITY, SIMULTANEOUS — are their own inverse):
  /root/reference/src/parser/entities/TemporalRelation.java:41-57
- inverse CLINK map: /root/reference/src/parser/entities/CausalRelation.java:22-26
- label numeric encoding is the 1-based index into the 14-label array:
  PairFeatureVector.java case `label` (temp_rel_type_list.indexOf(lbl)+1).
"""

from __future__ import annotations

TLINK_LABELS = (
    "BEFORE", "AFTER", "IBEFORE", "IAFTER", "IDENTITY", "SIMULTANEOUS",
    "INCLUDES", "IS_INCLUDED", "DURING", "DURING_INV", "BEGINS", "BEGUN_BY",
    "ENDS", "ENDED_BY",
)
TLINK_DENSE_LABELS = ("BEFORE", "AFTER", "SIMULTANEOUS", "INCLUDES",
                      "IS_INCLUDED", "VAGUE")
CLINK_LABELS = ("CLINK", "CLINK-R", "NONE")

# TemporalRelation.getInverseRelation: pairs at even/odd indices.
_INV_ARRAY = ("BEFORE", "AFTER", "INCLUDES", "IS_INCLUDED", "DURING",
              "DURING_INV", "IBEFORE", "IAFTER", "BEGINS", "BEGUN_BY",
              "ENDS", "ENDED_BY")

_INVERSE = {}
for _i, _r in enumerate(_INV_ARRAY):
    _INVERSE[_r] = _INV_ARRAY[_i + 1] if _i % 2 == 0 else _INV_ARRAY[_i - 1]


def inverse_tlink(rel: str) -> str:
    """BEFORE<->AFTER etc.; labels outside the array return unchanged."""
    return _INVERSE.get(rel, rel)


def inverse_clink(rel: str) -> str:
    if rel == "CLINK":
        return "CLINK-R"
    if rel == "CLINK-R":
        return "CLINK"
    return "NONE"


def tlink_label_num(label: str) -> int:
    """1-based index into TLINK_LABELS ('END' normalized to 'ENDS');
    0 for unknown labels (Java indexOf(-1)+1)."""
    if label == "END":
        label = "ENDS"
    try:
        return TLINK_LABELS.index(label) + 1
    except ValueError:
        return 0


def dense_label_num(label: str) -> int:
    """1-based index into the TimeBank-Dense 6-label set (labelDense,
    PairFeatureVector.java:3235-3238)."""
    try:
        return TLINK_DENSE_LABELS.index(label) + 1
    except ValueError:
        return 0


def clink_label_num(label: str) -> int:
    try:
        return CLINK_LABELS.index(label) + 1
    except ValueError:
        return 0


# Label collapse map used when training on collapsed labels
# (PairFeatureVector.java:2474+ `labelCollapsed`): DURING->SIMULTANEOUS,
# DURING_INV->SIMULTANEOUS, IBEFORE->BEFORE, IAFTER->AFTER.
COLLAPSE_MAP = {
    "DURING": "SIMULTANEOUS",
    "DURING_INV": "SIMULTANEOUS",
    "IBEFORE": "BEFORE",
    "IAFTER": "AFTER",
}


def collapse_label(label: str) -> str:
    return COLLAPSE_MAP.get(label, label)
