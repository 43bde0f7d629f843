"""In-memory per-document model + linguistic accessors.

The reference's ``Doc`` object graph (/root/reference/src/parser/entities/
Doc.java, Token.java, Sentence.java, Entity.java, Event.java, Timex.java)
re-expressed as light Python dataclasses. One Doc is always document-local:
it is built inside a ``map_batches`` call from one row's ``content`` and
never crosses documents, which is what keeps the whole engine
embarrassingly parallel by document.

Dependency/graph helpers re-derive the semantics of
/root/reference/src/model/feature/PairFeatureVector.java:458-670
(getMateModalVerb, getMateHeadVerb, isMatePassiveVerb, getMateVerbFrom*,
getMateCoordVerb, getMateSubject/ObjectFromVerb, generateDependencyPath,
simplifiedDependencyPath). ``token.deps`` maps *dependent* token id ->
relation, i.e. the owning token is the head (TXPParser.java:132-144).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

MODAL_VERBS = ("will", "can", "may", "shall", "should")


@dataclass(slots=True)
class Token:
    tid: str
    sent_id: str
    text: str
    lemma: str = "O"
    pos: str = "O"
    mainpos: str = "O"
    chunk: str = "O"
    tense: str = "O"
    aspect: str = "O"
    pol: str = "O"
    ner: str = "O"
    supersense: str = "O"
    conn: str = "O"
    main_verb: bool = False
    deps: Optional[dict] = None      # dependent tid -> dep relation
    index: int = -1
    timex_id: Optional[str] = None
    event_id: Optional[str] = None


@dataclass(slots=True)
class Sentence:
    sid: str
    start_tok: str
    end_tok: str
    index: int = -1
    entity_arr: list = field(default_factory=list)


@dataclass(slots=True)
class Entity:
    eid: str
    kind: str                 # "EVENT" | "TIMEX"
    start_tok: str = "O"
    end_tok: str = "O"
    sent_id: str = "O"
    index: int = -1
    # event attrs
    ev_class: str = "O"
    tense: str = "O"
    aspect: str = "O"
    pol: str = "O"
    coref: list = field(default_factory=list)
    # timex attrs
    ttype: str = "O"
    value: str = "O"
    is_dct: bool = False
    is_empty: bool = False

    @property
    def is_event(self) -> bool:
        return self.kind == "EVENT"

    @property
    def is_timex(self) -> bool:
        return self.kind == "TIMEX"


@dataclass(slots=True)
class Doc:
    name: str = "TEXT"
    tokens: dict = field(default_factory=dict)        # tid -> Token
    token_arr: list = field(default_factory=list)     # ordered tids
    sentences: dict = field(default_factory=dict)     # sid -> Sentence
    sentence_arr: list = field(default_factory=list)  # ordered sids
    entities: dict = field(default_factory=dict)      # eid -> Entity (insertion = doc order)
    dct: Optional[Entity] = None
    tlinks: list = field(default_factory=list)        # [(src, tgt, rel)] candidate pairs
    tlink_types: dict = field(default_factory=dict)   # (src, tgt) -> rel
    clinks: list = field(default_factory=list)        # [(src, tgt)] gold CLINKs
    sig_cache: dict = field(default_factory=dict)     # doc-local memo (markers etc.)

    # ------------------------------------------------------------------
    # token-span attribute accessors (PairFeatureVector.java:261-282)
    # ------------------------------------------------------------------
    def token_ids_between(self, start_tid: str, end_tid: str) -> list:
        i = self.tokens[start_tid].index
        j = self.tokens[end_tid].index
        return self.token_arr[i:j + 1]

    def entity_token_attr(self, e: Entity, attr: str) -> str:
        """Join an attribute over the entity span, deduping consecutive
        repeats; ' '-joined for token/lemma, '_'-joined otherwise. DCT and
        empty timexes yield 'O'."""
        if e.is_timex and (e.is_dct or e.is_empty):
            return "O"
        vals: list = []
        for tid in self.token_ids_between(e.start_tok, e.end_tok):
            v = getattr(self.tokens[tid], attr)
            if not vals or v != vals[-1]:
                vals.append(v)
        sep = " " if attr in ("text", "lemma") else "_"
        return sep.join(vals)

    def span_lower_text(self, start_tid: str, end_tid: str, attr: str = "text") -> str:
        return " ".join(getattr(self.tokens[t], attr).lower()
                        for t in self.token_ids_between(start_tid, end_tid))

    # ------------------------------------------------------------------
    # positional predicates (PairFeatureVector.java:363-431)
    # ------------------------------------------------------------------
    def _non_text_pair(self, e1: Entity, e2: Entity) -> bool:
        return any(e.is_timex and (e.is_dct or e.is_empty) for e in (e1, e2))

    def same_sentence(self, e1: Entity, e2: Entity) -> bool:
        if self._non_text_pair(e1, e2):
            return False
        return (self.sentences[e1.sent_id].index
                == self.sentences[e2.sent_id].index)

    def sentence_distance(self, e1: Entity, e2: Entity) -> int:
        if self._non_text_pair(e1, e2):
            return -1
        return abs(self.sentences[e1.sent_id].index
                   - self.sentences[e2.sent_id].index)

    def entity_distance(self, e1: Entity, e2: Entity) -> int:
        if self._non_text_pair(e1, e2):
            return -1
        if e1.sent_id == e2.sent_id:
            return abs(e1.index - e2.index) - 1
        return -1

    def entity_order(self, e1: Entity, e2: Entity) -> str:
        if self._non_text_pair(e1, e2):
            return "O"
        if e1.index < e2.index:
            return "BEFORE"
        if e1.index > e2.index:
            return "AFTER"
        return "O"

    # ------------------------------------------------------------------
    # MATE-dependency helpers (PairFeatureVector.java:458-670)
    # ------------------------------------------------------------------
    def _sent_token_ids(self, tid: str) -> list:
        s = self.sentences[self.tokens[tid].sent_id]
        return self.token_ids_between(s.start_tok, s.end_tok)

    def mate_modal_verb(self, tid: str) -> str:
        """Walk VC chains upwards; return the modal lemma if found."""
        sent = self._sent_token_ids(tid)
        tpos = {t: i for i, t in enumerate(sent)}
        for tok in sent:
            deps = self.tokens[tok].deps
            if tok != tid and deps and deps.get(tid) == "VC" \
                    and tpos[tok] < tpos[tid]:
                if self.tokens[tok].lemma in MODAL_VERBS:
                    return self.tokens[tok].lemma
                return self.mate_modal_verb(tok)
        return "O"

    def mate_head_verb(self, tid: str) -> str:
        sent = self._sent_token_ids(tid)
        tpos = {t: i for i, t in enumerate(sent)}
        for tok in sent:
            deps = self.tokens[tok].deps
            if tok != tid and deps and deps.get(tid) == "VC" \
                    and tpos[tok] < tpos[tid]:
                return self.mate_head_verb(tok)
        return tid

    def mate_passive_verb(self, tid: str) -> bool:
        for tok in self._sent_token_ids(tid):
            deps = self.tokens[tok].deps
            if tok != tid and deps and deps.get(tid) == "VC" \
                    and self.tokens[tok].lemma == "be":
                return True
        return False

    def _verb_governing(self, tid: str, rel: str) -> Optional[str]:
        for tok in self._sent_token_ids(tid):
            deps = self.tokens[tok].deps
            if tok != tid and deps and deps.get(tid) == rel:
                return tok
        return None

    def mate_verb_from_sbj_noun(self, tid: str) -> Optional[str]:
        return self._verb_governing(tid, "SBJ")

    def mate_verb_from_obj_noun(self, tid: str) -> Optional[str]:
        return self._verb_governing(tid, "OBJ")

    def mate_verb_from_adj(self, tid: str) -> Optional[str]:
        return self._verb_governing(tid, "PRD")

    def mate_coord_verb(self, tid: str) -> Optional[str]:
        head = self.mate_head_verb(tid)
        for tok in self._sent_token_ids(tid):
            deps = self.tokens[tok].deps
            if tok != head and deps:
                rel = deps.get(head)
                if rel == "COORD":
                    return tok
                if rel == "CONJ":
                    return self.mate_coord_verb(tok)
        return None

    def mate_subject_from_verb(self, tid: str) -> Optional[str]:
        head = self.mate_head_verb(tid)
        deps = self.tokens[head].deps
        if deps:
            for tok, rel in deps.items():
                if rel == "SBJ" and self.tokens[tok].lemma not in (
                        "that", "which", "``", "`", "''", "'"):
                    return tok
        # reference fallback checks NMOD/ADV governors of head
        for tok in self._sent_token_ids(tid):
            d = self.tokens[tok].deps
            if tok != head and d and tid in d and d.get(head) in ("NMOD", "ADV"):
                return tok
        cv = self.mate_coord_verb(head)
        if cv is not None:
            return self.mate_subject_from_verb(cv)
        return None

    def mate_object_from_verb(self, tid: str) -> Optional[str]:
        sent = self._sent_token_ids(tid)
        tpos = {t: i for i, t in enumerate(sent)}
        deps = self.tokens[tid].deps
        if deps:
            for tok, rel in deps.items():
                if rel == "OBJ" or (rel == "VC" and tok in tpos
                                    and tpos[tok] > tpos[tid]):
                    return tok
        return None

    def dependency_paths(self, gov_tid: str, targets, path: str = "",
                         _depth: int = 0) -> list:
        """DFS from gov over its dependents, accumulating '-REL' labels;
        stops at the first hits (reference collects into `paths` and takes
        paths[0]; we return all in DFS order). Depth-capped for safety —
        the reference recursion is unbounded on trees."""
        out: list = []
        if _depth > 40:
            return out
        deps = self.tokens[gov_tid].deps
        if not deps:
            return out
        tset = set(targets) if not isinstance(targets, set) else targets
        for key, rel in deps.items():
            if key in tset:
                out.append(path + "-" + rel)
            elif key in self.tokens:
                out.extend(self.dependency_paths(key, tset, path + "-" + rel,
                                                 _depth + 1))
        return out

    def first_dependency_path(self, gov_tid: str, targets) -> Optional[str]:
        paths = self.dependency_paths(gov_tid, targets)
        return paths[0] if paths else None


def reverse_path(path: str) -> str:
    """'OBJ-SUB' -> 'SUB-OBJ' (EventEventFeatureVector.java:102-110)."""
    return "-".join(reversed(path.split("-")))


def simplify_dep_path(path: str, *, strip_appo: bool = True) -> str:
    """simplifiedDependencyPath (PairFeatureVector.java:655-670); `path`
    includes the leading '-'. The variant without APPO-stripping is
    simplifiedDependencyPath2 (766-777)."""
    p = path
    if p != "-VC-OBJ":
        p = p.replace("-VC", "")
    p = p.replace("-COORD", "").replace("-CONJ", "")
    if not p.endswith("-NMOD") and not p.startswith("-NMOD-"):
        p = p.replace("-NMOD", "")
    if strip_appo:
        if not p.endswith("AMOD"):
            p = p.replace("-AMOD", "")
        if not p.startswith("-APPO-"):
            p = p.replace("-APPO-", "-")
    p = p.replace("-EXTR-", "-")
    p = p.replace("-PMOD-PMOD", "-PMOD")
    return p
