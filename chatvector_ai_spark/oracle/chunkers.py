"""Chunking strategies with exact character-offset parity.

Three strategies over a cleaned document string, matching the reference's
windowing semantics (/root/reference/backend/services/ingestion_pipeline.py):

- ``fixed``     — sliding character window of ``size`` chars stepping
                  ``size - overlap`` (the reference's deterministic fallback
                  splitter, :30-70; LangChain's recursive splitter is an
                  optional dependency there and not deterministic across
                  versions, so the fallback IS the contract we match).
- ``paragraph`` — blank-line blocks with markdown-heading tracking (:142-195);
                  blocks larger than ``size`` are window-split and their child
                  offsets rebased to absolute positions (:232-253, :381-434).
- ``semantic``  — regex sentence segmentation (:280-292) + greedy packing up
                  to ``size`` chars with a walk-back sentence overlap of at
                  least ``overlap`` chars (:437-559).

Every chunk carries ``start`` — the absolute character offset of the chunk in
the input string — so downstream span/offset joins are exact. All functions
are pure and deterministic; the Spark chunking UDF calls these same functions
per document within each Arrow batch, which is what makes per-row parity with
this oracle structural rather than aspirational.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from chatvector_ai_spark.config import CHUNK_OVERLAP, CHUNK_SIZE

HEADING_RE = re.compile(r"^\s{0,3}#{1,6}\s+(.+?)\s*$")
SENTENCE_RE = re.compile(r".+?(?:[.!?](?=\s+|$)|$)", re.DOTALL)


@dataclass(frozen=True)
class Chunk:
    text: str
    start: int
    heading: str | None = None

    @property
    def end(self) -> int:
        return self.start + len(self.text)


@dataclass(frozen=True)
class Block:
    """A blank-line-delimited paragraph block with its governing heading."""

    text: str
    start: int
    heading: str | None


def heading_of(line: str) -> str | None:
    m = HEADING_RE.match(line)
    return m.group(1).strip() if m else None


def _only_heading(block_text: str) -> bool:
    lines = [ln for ln in block_text.splitlines() if ln.strip()]
    return len(lines) == 1 and heading_of(lines[0]) is not None


def iter_blocks(text: str) -> list[Block]:
    """Split on blank lines; heading-only blocks annotate following blocks.

    Mirrors _iter_text_blocks (ingestion_pipeline.py:142-195): a markdown
    heading line flushes the current block, becomes the active heading, and
    starts a new block whose text includes the heading line; blocks whose
    only content is the heading are dropped (they are metadata, not chunks).
    """
    blocks: list[Block] = []
    heading: str | None = None
    parts: list[str] = []
    start: int | None = None
    cursor = 0

    def flush() -> None:
        nonlocal parts, start
        if start is not None:
            body = "".join(parts)
            if body.strip() and not _only_heading(body):
                blocks.append(Block(text=body, start=start, heading=heading))
        parts, start = [], None

    for line in text.splitlines(keepends=True):
        line_start = cursor
        cursor += len(line)
        h = heading_of(line.rstrip("\r\n"))
        if h is not None:
            flush()
            heading = h
            start = line_start
            parts = [line]
        elif not line.strip():
            flush()
        else:
            if start is None:
                start = line_start
            parts.append(line)
    flush()
    return blocks


def sentence_spans(text: str) -> list[tuple[int, int]]:
    """(start, end) spans of sentences, trimmed of surrounding whitespace.

    Regex-only variant of the reference's fallback segmentation
    (ingestion_pipeline.py:280-292) — deterministic, no model downloads.
    """
    spans: list[tuple[int, int]] = []
    for m in SENTENCE_RE.finditer(text):
        raw = m.group(0)
        if not raw.strip():
            continue
        lead = len(raw) - len(raw.lstrip())
        trail = len(raw) - len(raw.rstrip())
        s, e = m.start() + lead, m.end() - trail
        if s < e:
            spans.append((s, e))
    return spans


def _window_split(text: str, size: int, overlap: int, base: int, heading: str | None) -> list[Chunk]:
    """Sliding character window: [start, start+size), step size-overlap.

    Equivalent to the reference fallback splitter with add_start_index=True
    (ingestion_pipeline.py:30-70), with offsets rebased by ``base``
    (the _rebase_documents semantics, :232-253).
    """
    if not text:
        return []
    step = max(1, size - overlap)
    out: list[Chunk] = []
    pos = 0
    n = len(text)
    while pos < n:
        end = min(n, pos + size)
        out.append(Chunk(text=text[pos:end], start=base + pos, heading=heading))
        if end >= n:
            break
        pos += step
    return out


def chunk_fixed(text: str, size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP) -> list[Chunk]:
    return _window_split(text, size, overlap, base=0, heading=None)


def chunk_paragraph(text: str, size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP) -> list[Chunk]:
    if not text.strip():
        return []
    out: list[Chunk] = []
    for block in iter_blocks(text):
        if len(block.text) <= size:
            out.append(Chunk(text=block.text, start=block.start, heading=block.heading))
        else:
            out.extend(_window_split(block.text, size, overlap, base=block.start, heading=block.heading))
    return out


def _overlap_walkback(spans: list[tuple[int, int]], first_idx: int, last_idx: int, overlap: int) -> int:
    """Next chunk's first sentence index, walking back to cover >= overlap chars.

    Mirrors _next_start_index (ingestion_pipeline.py:449-465).
    """
    if overlap <= 0:
        return last_idx + 1
    idx = last_idx
    while idx > first_idx and spans[last_idx][1] - spans[idx][0] < overlap:
        idx -= 1
    return max(first_idx + 1, idx)


def chunk_semantic(text: str, size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP) -> list[Chunk]:
    if not text.strip():
        return []
    out: list[Chunk] = []
    for block in iter_blocks(text):
        spans = sentence_spans(block.text)
        if not spans:
            out.append(Chunk(text=block.text, start=block.start, heading=block.heading))
            continue
        i = 0
        while i < len(spans):
            s0, e0 = spans[i]
            if e0 - s0 > size:
                # Oversized single sentence: window-split it in place
                # (ingestion_pipeline.py:467-487).
                out.extend(
                    _window_split(block.text[s0:e0], size, overlap, base=block.start + s0, heading=block.heading)
                )
                i += 1
                continue
            last = i
            end_off = e0
            while last + 1 < len(spans) and spans[last + 1][1] - s0 <= size:
                last += 1
                end_off = spans[last][1]
            out.append(Chunk(text=block.text[s0:end_off], start=block.start + s0, heading=block.heading))
            if last >= len(spans) - 1:
                break
            i = _overlap_walkback(spans, i, last, overlap)
    return out


_STRATEGIES = {
    "fixed": chunk_fixed,
    "paragraph": chunk_paragraph,
    "semantic": chunk_semantic,
}


def chunk_text(
    text: str,
    strategy: str = "fixed",
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> list[Chunk]:
    """Dispatch by strategy name (build_chunking_strategy, :562-591)."""
    try:
        fn = _STRATEGIES[strategy.strip().lower()]
    except KeyError:
        raise ValueError(f"unknown chunking strategy: {strategy!r}") from None
    return fn(text, size, overlap)
