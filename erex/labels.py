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
# the full EntityEnum.TlinkType vocabulary (EntityEnum.java:9-16): the
# classifier one-hots above stay 14-label, but MEASURE exists as a rule
# label (EventTimexRelationRule.java:35-37, emitted only under the
# opt-in measure_rel config — see erex/rules/event_timex.py)
TLINK_TYPES_FULL = TLINK_LABELS + ("MEASURE",)
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


# M13 label-collapse VARIANTS (the TimeBank-Dense experiment label
# groupings), transcribed from the liblinear feature path
# addBinaryFeatureToVector, PairFeatureVector.java:3208-3490 (cases
# labelCollapsed1-6 and labelCollapsed01-03; the base labelCollapsed is
# COLLAPSE_MAP above, END normalization included).  Each map is an
# if/else-if chain in the reference, i.e. applied exactly once.
COLLAPSE_VARIANT_MAPS = {
    "": {"END": "ENDS", **COLLAPSE_MAP},
    "1": {"END": "ENDS", "IDENTITY": "SIMULTANEOUS",
          "DURING": "IS_INCLUDED", "DURING_INV": "INCLUDES",
          "IBEFORE": "BEFORE", "IAFTER": "AFTER", "BEGINS": "BEFORE",
          "BEGUN_BY": "AFTER", "ENDS": "AFTER", "ENDED_BY": "BEFORE"},
    "2": {"END": "ENDS", "IDENTITY": "SIMULTANEOUS",
          "DURING": "IS_INCLUDED", "DURING_INV": "INCLUDES",
          "IBEFORE": "BEFORE", "IAFTER": "AFTER", "BEGINS": "IS_INCLUDED",
          "BEGUN_BY": "INCLUDES", "ENDS": "IS_INCLUDED",
          "ENDED_BY": "INCLUDES"},
    "3": {"END": "ENDS", "IDENTITY": "SIMULTANEOUS",
          "IBEFORE": "BEFORE", "IAFTER": "AFTER", "BEGINS": "DURING",
          "BEGUN_BY": "DURING_INV", "ENDS": "DURING",
          "ENDED_BY": "DURING_INV"},
    "4": {"END": "ENDS", "IDENTITY": "SIMULTANEOUS",
          "IS_INCLUDED": "INCLUDES", "DURING": "DURING",
          "DURING_INV": "DURING", "IBEFORE": "BEFORE", "IAFTER": "AFTER",
          "BEGINS": "DURING", "BEGUN_BY": "DURING", "ENDS": "DURING",
          "ENDED_BY": "DURING"},
    "5": {"END": "ENDS", "IDENTITY": "SIMULTANEOUS", "DURING": "DURING",
          "DURING_INV": "DURING", "IBEFORE": "BEFORE", "IAFTER": "AFTER",
          "BEGINS": "IS_INCLUDED", "BEGUN_BY": "INCLUDES",
          "ENDS": "IS_INCLUDED", "ENDED_BY": "INCLUDES"},
    "6": {"END": "ENDS", "IDENTITY": "SIMULTANEOUS", "DURING": "NONE",
          "DURING_INV": "NONE", "IBEFORE": "BEFORE", "IAFTER": "AFTER",
          "BEGINS": "NONE", "BEGUN_BY": "NONE", "ENDS": "NONE",
          "ENDED_BY": "NONE"},
    "01": {"IDENTITY": "SIMULTANEOUS", "IS_INCLUDED": "INCLUDES",
           "IBEFORE": "BEFORE", "IAFTER": "AFTER", "BEGUN_BY": "BEGINS",
           "ENDED_BY": "ENDS", "DURING_INV": "DURING"},
    "02": {"IDENTITY": "SIMULTANEOUS", "IS_INCLUDED": "INCLUDES",
           "IBEFORE": "BEFORE", "IAFTER": "AFTER", "BEGINS": "DURING",
           "ENDS": "DURING", "DURING": "DURING", "BEGUN_BY": "DURING_INV",
           "ENDED_BY": "DURING_INV", "DURING_INV": "DURING_INV"},
    "03": {"IDENTITY": "SIMULTANEOUS", "IBEFORE": "BEFORE",
           "IAFTER": "AFTER", "BEGINS": "DURING", "ENDS": "DURING",
           "DURING": "DURING", "BEGUN_BY": "DURING_INV",
           "ENDED_BY": "DURING_INV", "DURING_INV": "DURING_INV"},
}


def collapse_label_variant(label: str, variant: str = "") -> str:
    """Apply one collapse-variant map (variant in '', '1'..'6',
    '01'..'03', 'binary')."""
    if variant == "binary":
        # case labelBinary: any non-NONE label -> "1", NONE -> "0"
        return "0" if label == "NONE" else "1"
    return COLLAPSE_VARIANT_MAPS[variant].get(label, label)
