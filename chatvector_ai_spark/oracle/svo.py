"""Rule-based mention detection and OpenIE-style (subj, pred, obj) extraction.

The reference has no triple extractor — its LLM extension points
(/root/reference/backend/services/providers/base.py:124-172, query transforms
query_service.py:151-192) are replaced here by a deterministic grammar so
that expected triples are computable in closed form and the distributed
pipeline can be held to P/R >= 0.95 (designed to be 1.0) against this oracle.

Grammar, applied per sentence (same segmentation as the semantic chunker):
  mention    := maximal run of Capitalized tokens, optionally glued by
                lowercase connectors {of, the, and, for, de} that are
                *followed by* another Capitalized token
  predicate  := longest phrase from PREDICATES found outside any mention
  triple     := (last mention ending before predicate,
                 predicate,
                 first mention starting after predicate)
Offsets are absolute in the input text; conf is 1.0 (adjacent clause) or 0.8
when extra tokens intervene between mention and predicate.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from chatvector_ai_spark.oracle.chunkers import sentence_spans

# canonical predicate -> surface phrases (longest-match-first at use site)
PREDICATES: dict[str, tuple[str, ...]] = {
    "acquired": ("acquired",),
    "founded_by": ("was founded by",),
    "founded": ("founded",),
    "partnered_with": ("partnered with",),
    "invested_in": ("invested in",),
    "located_in": ("is located in", "is headquartered in"),
    "works_at": ("works at", "worked at"),
    "born_in": ("was born in",),
    "joined": ("joined",),
    "leads": ("leads",),
    "owns": ("owns",),
    "launched": ("launched",),
    "merged_with": ("merged with",),
    "collaborates_with": ("collaborates with",),
    "supplies": ("supplies",),
}

_PHRASE_TO_PRED: list[tuple[str, str]] = sorted(
    ((phrase, pred) for pred, phrases in PREDICATES.items() for phrase in phrases),
    key=lambda pair: -len(pair[0]),
)

_PRED_RE = re.compile(
    r"\b(?:" + "|".join(re.escape(p) for p, _ in _PHRASE_TO_PRED) + r")\b"
)
_PRED_LOOKUP = {p: pred for p, pred in _PHRASE_TO_PRED}

_CAP_TOKEN = r"[A-Z][A-Za-z0-9&\-]*"
_CONNECTOR = r"(?:of|the|and|for|de)"
_MENTION_RE = re.compile(
    rf"{_CAP_TOKEN}(?:\s+(?:{_CONNECTOR}\s+)?{_CAP_TOKEN})*"
)


@dataclass(frozen=True)
class Mention:
    surface: str
    start: int
    end: int


@dataclass(frozen=True)
class Triple:
    subj: str
    pred: str
    obj: str
    subj_start: int
    subj_end: int
    obj_start: int
    obj_end: int
    conf: float


def detect_mentions(text: str) -> list[Mention]:
    """Capitalized-run mentions with absolute offsets."""
    return [
        Mention(surface=m.group(0), start=m.start(), end=m.end())
        for m in _MENTION_RE.finditer(text or "")
    ]


def _sentence_triples(sentence: str, base: int) -> list[Triple]:
    mentions = detect_mentions(sentence)
    if len(mentions) < 2:
        return []
    out: list[Triple] = []
    for pm in _PRED_RE.finditer(sentence):
        # skip predicate hits inside a mention span (e.g. "Launched Inc")
        if any(m.start <= pm.start() < m.end for m in mentions):
            continue
        pred = _PRED_LOOKUP[pm.group(0)]
        subj = None
        for m in mentions:
            if m.end <= pm.start():
                subj = m
            else:
                break
        obj = next((m for m in mentions if m.start >= pm.end()), None)
        if subj is None or obj is None:
            continue
        gap_before = sentence[subj.end : pm.start()].strip()
        gap_after = sentence[pm.end() : obj.start].strip()
        conf = 1.0 if not gap_before and not gap_after else 0.8
        out.append(
            Triple(
                subj=subj.surface,
                pred=pred,
                obj=obj.surface,
                subj_start=base + subj.start,
                subj_end=base + subj.end,
                obj_start=base + obj.start,
                obj_end=base + obj.end,
                conf=conf,
            )
        )
    return out


def extract_triples(text: str) -> list[Triple]:
    """All triples in *text*, with offsets absolute in *text*."""
    if not text:
        return []
    out: list[Triple] = []
    for s, e in sentence_spans(text):
        out.extend(_sentence_triples(text[s:e], base=s))
    return out
