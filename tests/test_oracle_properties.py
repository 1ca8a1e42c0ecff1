"""Property-based tests (hypothesis) for the oracle layer.

The reference ships no property tests (SURVEY §5.1); these pin the
structural invariants the distributed pipeline leans on: chunkers cover the
input with exact offsets, normalization is idempotent, sentence spans
partition the text, extraction offsets point at the surfaces they claim.
"""

import re

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from chatvector_ai_spark.oracle.chunkers import (
    chunk_fixed,
    chunk_paragraph,
    chunk_semantic,
    sentence_spans,
)
from chatvector_ai_spark.oracle.hashembed import embed_text
from chatvector_ai_spark.oracle.svo import extract_triples
from chatvector_ai_spark.oracle.textnorm import normalize_text

TEXTS = st.lists(
    st.sampled_from(list("abcdefgh XYZ.!?#\n\t- •­ﬁ１") + ["  ", "\n\n", "word ", "# H\n"]),
    max_size=120,
).map("".join)


@settings(max_examples=200, deadline=None)
@given(TEXTS)
def test_normalize_is_idempotent(text):
    once = normalize_text(text)
    assert normalize_text(once) == once


@settings(max_examples=200, deadline=None)
@given(TEXTS)
def test_normalize_output_is_flat(text):
    out = normalize_text(text)
    assert "\n" not in out and "\r" not in out
    assert "  " not in out  # runs of spaces collapsed
    assert out == out.strip()


@settings(max_examples=200, deadline=None)
@given(TEXTS, st.integers(10, 50), st.integers(0, 9))
def test_fixed_chunks_cover_text_exactly(text, size, overlap):
    chunks = chunk_fixed(text, size=size, overlap=overlap)
    for c in chunks:
        assert text[c.start : c.start + len(c.text)] == c.text
        assert 0 < len(c.text) <= size
    if text:
        assert chunks, "non-empty text must produce chunks"
        # every character is inside at least one chunk
        step = size - overlap
        assert chunks[0].start == 0
        assert chunks[-1].end == len(text)
        for a, b in zip(chunks, chunks[1:]):
            assert b.start == a.start + step


@settings(max_examples=150, deadline=None)
@given(TEXTS, st.integers(20, 80), st.integers(0, 15))
def test_paragraph_and_semantic_offsets_are_exact(text, size, overlap):
    for fn in (chunk_paragraph, chunk_semantic):
        for c in fn(text, size=size, overlap=overlap):
            assert text[c.start : c.start + len(c.text)] == c.text
            assert c.text != ""


@settings(max_examples=200, deadline=None)
@given(TEXTS)
def test_sentence_spans_partition_text(text):
    spans = sentence_spans(text)
    for s, e in spans:
        assert 0 <= s < e <= len(text)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 <= s2  # ordered, non-overlapping


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.sampled_from(list("abc AB.") + ["Acme ", "Beta ", "acquired "]),
        max_size=60,
    ).map("".join)
)
def test_triple_offsets_point_at_surfaces(text):
    for t in extract_triples(text):
        assert text[t.subj_start : t.subj_end] == t.subj
        assert text[t.obj_start : t.obj_end] == t.obj
        assert t.conf in (0.8, 1.0)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=100), st.sampled_from([16, 64]))
def test_embedding_unit_norm_or_zero(text, dim):
    v = embed_text(text, dim=dim)
    assert len(v) == dim
    norm2 = sum(x * x for x in v)
    has_token = bool(re.findall(r"[a-z0-9]+", text.lower()))
    if has_token:
        assert abs(norm2 - 1.0) < 1e-3
    else:
        assert norm2 == 0.0


def test_embedding_full_cancellation_falls_back_to_unit_vector():
    """Signed hashes of distinct tokens can cancel to zero (Hypothesis-found
    at dim=16: 'W:x' -> 'w' and 'x' share a slot with opposite signs); the
    deterministic fallback slot must keep non-empty token streams at unit
    norm, identically in scalar and batch forms."""
    from chatvector_ai_spark.oracle.hashembed import embed_batch

    v = embed_text("W:x", dim=16)
    assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-3)
    batch = embed_batch(["W:x", "w x"], dim=16)
    assert [float(x) for x in batch[0]] == v
    assert embed_text("W:x", dim=16) == v  # deterministic
