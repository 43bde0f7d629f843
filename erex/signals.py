"""Signal dictionaries (stateful stages ST1/ST2 of SURVEY.md §2.4).

The reference re-loads its signal lists per file (TemporalSignalList
ctor called inside the per-file loop, TempRelPro.java:135-136); here they
are process-wide module-level caches: loaded once per Ray worker process
and shared by every batch the worker handles — the Ray-idiomatic
equivalent of per-actor state for small read-only dictionaries.

File format: ``surface-or-pattern<TAB>cluster`` (resources/*.tsv, our own
curation). Lookup semantics mirror the reference:
- temporal lists are searched longest-match-first via reverse-alphabetical
  key ordering (PairFeatureVector.java:1150-1155 "so that 'because of' <
  'because'");
- causal signal entries are regex patterns matched against space-padded
  lowercased context (CauseRelPro.java:61-95, getCausalSignal
  PairFeatureVector.java:1374+), tried in file order.
"""

from __future__ import annotations

import importlib.resources as _res
import re
from functools import lru_cache


def _load_tsv(name: str) -> list:
    txt = (_res.files("erex") / "resources" / name).read_text()
    out = []
    for line in txt.splitlines():
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) == 2:
            out.append((parts[0], parts[1]))
    return out


@lru_cache(maxsize=None)
def temporal_event_signals() -> dict:
    """surface -> cluster, insertion order = file order."""
    return dict(_load_tsv("temporal_signal_event.tsv"))


@lru_cache(maxsize=None)
def temporal_timex_signals() -> dict:
    return dict(_load_tsv("temporal_signal_timex.tsv"))


@lru_cache(maxsize=None)
def temporal_event_keys_sorted() -> tuple:
    """Reverse-alphabetical (longest-match-first) key order."""
    return tuple(sorted(temporal_event_signals(), reverse=True))


@lru_cache(maxsize=None)
def temporal_timex_keys_sorted() -> tuple:
    return tuple(sorted(temporal_timex_signals(), reverse=True))


@lru_cache(maxsize=None)
def temporal_event_keys_split() -> tuple:
    """((key, word-tuple), ...) in reverse-sorted order — precomputed
    so the hot marker scans skip per-call split()."""
    return tuple((k, tuple(k.split(" ")))
                 for k in temporal_event_keys_sorted())


@lru_cache(maxsize=None)
def temporal_timex_keys_split() -> tuple:
    return tuple((k, tuple(k.split(" ")))
                 for k in temporal_timex_keys_sorted())


@lru_cache(maxsize=None)
def temporal_event_key_tuples() -> frozenset:
    return frozenset(t for _k, t in temporal_event_keys_split())


@lru_cache(maxsize=None)
def temporal_timex_key_tuples() -> frozenset:
    return frozenset(t for _k, t in temporal_timex_keys_split())


def _load_signal_rows() -> list:
    """causal_signal.tsv rows (key, pattern, cluster) in file order."""
    txt = (_res.files("erex") / "resources" / "causal_signal.tsv").read_text()
    out = []
    for line in txt.splitlines():
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) == 3:
            out.append((parts[0], parts[1], parts[2]))
    return out


@lru_cache(maxsize=None)
def causal_signals() -> list:
    """[(compiled space-padded pattern, raw pattern, cluster)] in
    java.util.HashMap keySet() iteration order of the numeric keys —
    getCausalSignal walks ``signalList.keySet()`` raw (HashMap<String,
    String>, PairFeatureVector.java:1406/1468, no reverse sort unlike
    the temporal scans), and the per-key counter ``i`` it adds to each
    candidate's distance makes the winning marker order-dependent
    whenever several patterns match."""
    from .javamap import java_hashmap_order
    rows = {k: (pat, cluster) for k, pat, cluster in _load_signal_rows()}
    out = []
    for key in java_hashmap_order(rows):
        pat, cluster = rows[key]
        out.append((re.compile(" " + pat + " "), pat, cluster))
    return out


@lru_cache(maxsize=None)
def causal_signal_keys() -> tuple:
    """The numeric map keys of CausalSignalList.getList() — matched
    LITERALLY against sentence text by the candidate gate
    (CauseRelPro.isContainCausalSignal, CauseRelPro.java:61-74), a
    reference quirk: readSignalFile keys its maps by the first `|||`
    column, which is the line number."""
    return tuple(k for k, _p, _c in _load_signal_rows())


@lru_cache(maxsize=None)
def causal_signal_key_split() -> tuple:
    """(frozenset of single-word keys, tuple of multiword keys) for the
    gate's set-membership fast path (features._contains_key)."""
    ks = causal_signal_keys()
    return (frozenset(k for k in ks if " " not in k),
            tuple(k for k in ks if " " in k))


@lru_cache(maxsize=None)
def causal_verbs() -> dict:
    return dict(_load_tsv("causal_verb.tsv"))


@lru_cache(maxsize=None)
def causal_verb_key_split() -> tuple:
    vs = tuple(causal_verbs())
    return (frozenset(v for v in vs if " " not in v),
            tuple(v for v in vs if " " in v))


@lru_cache(maxsize=None)
def causal_verb_keys_sorted() -> tuple:
    return tuple(sorted(causal_verbs(), reverse=True))
