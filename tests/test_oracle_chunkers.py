"""Golden chunker cases.

Expectations transcribed from the reference's own unit tests
(/root/reference/backend/tests/test_ingestion_pipeline.py:418-511) plus the
block/sentence scanners they exercise.
"""

from chatvector_ai_spark.oracle.chunkers import (
    chunk_fixed,
    chunk_paragraph,
    chunk_semantic,
    chunk_text,
    iter_blocks,
    sentence_spans,
)


# --- fixed ------------------------------------------------------------------

def test_fixed_window_offsets_and_step():
    text = "abcdefghij"  # 10 chars
    chunks = chunk_fixed(text, size=4, overlap=1)
    assert [(c.text, c.start) for c in chunks] == [
        ("abcd", 0),
        ("defg", 3),
        ("ghij", 6),
    ]


def test_fixed_single_chunk_when_short():
    chunks = chunk_fixed("short", size=100, overlap=10)
    assert [(c.text, c.start) for c in chunks] == [("short", 0)]


def test_fixed_empty():
    assert chunk_fixed("", size=10, overlap=2) == []


# --- blocks ------------------------------------------------------------------

def test_iter_blocks_headings_and_offsets():
    text = (
        "# Heading 1\n\n"
        "First paragraph lives here.\n\n"
        "Second paragraph is separate.\n\n"
        "# Heading 2\n\n"
        "Third paragraph belongs to the second heading."
    )
    blocks = iter_blocks(text)
    assert len(blocks) == 3
    assert blocks[0].text.startswith("First paragraph")
    assert blocks[0].heading == "Heading 1"
    assert blocks[0].start == text.index("First paragraph")
    assert blocks[1].heading == "Heading 1"
    assert blocks[1].start == text.index("Second paragraph")
    assert blocks[2].heading == "Heading 2"
    assert blocks[2].start == text.index("Third paragraph")


def test_iter_blocks_heading_attached_to_same_block_without_blank_line():
    text = "# Top\nbody line\n\nnext block"
    blocks = iter_blocks(text)
    # heading line starts the block and its text includes the heading line
    assert blocks[0].start == 0
    assert blocks[0].heading == "Top"
    assert "body line" in blocks[0].text
    assert blocks[1].text.startswith("next block")


# --- paragraph ----------------------------------------------------------------

def test_paragraph_chunking_tracks_headings():
    # test_ingestion_pipeline.py:418-447
    text = (
        "# Heading 1\n\n"
        "First paragraph lives here.\n\n"
        "Second paragraph is separate.\n\n"
        "# Heading 2\n\n"
        "Third paragraph belongs to the second heading."
    )
    docs = chunk_paragraph(text, size=60, overlap=8)
    assert len(docs) == 3
    assert all(len(d.text) <= 60 for d in docs)
    assert docs[0].text.startswith("First paragraph")
    assert docs[0].heading == "Heading 1"
    assert docs[0].start == text.index("First paragraph")
    assert docs[1].heading == "Heading 1"
    assert docs[1].start == text.index("Second paragraph")
    assert docs[2].heading == "Heading 2"
    assert docs[2].start == text.index("Third paragraph")


def test_paragraph_chunking_splits_large_blocks_rebased():
    # test_ingestion_pipeline.py:450-468
    long_paragraph = "A" * 55
    text = f"# Heading 1\n\n{long_paragraph}"
    docs = chunk_paragraph(text, size=20, overlap=5)
    assert len(docs) >= 3
    assert all(len(d.text) <= 20 for d in docs)
    assert all(d.heading == "Heading 1" for d in docs)
    assert docs[0].start == text.index(long_paragraph)
    assert [d.start for d in docs] == sorted(d.start for d in docs)


# --- sentences ------------------------------------------------------------------

def test_sentence_spans_trims_whitespace():
    text = "One. Two!  Three?"
    spans = sentence_spans(text)
    assert [text[s:e] for s, e in spans] == ["One.", "Two!", "Three?"]


def test_sentence_spans_handles_no_terminator():
    text = "no terminator here"
    spans = sentence_spans(text)
    assert [text[s:e] for s, e in spans] == [text]


# --- semantic --------------------------------------------------------------------

def test_semantic_groups_sentences_with_overlap():
    # test_ingestion_pipeline.py:471-490
    text = "# Topic\n\nSentence one. Sentence two. Sentence three."
    docs = chunk_semantic(text, size=30, overlap=15)
    assert len(docs) == 2
    assert docs[0].text == "Sentence one. Sentence two."
    assert docs[0].heading == "Topic"
    assert docs[0].start == text.index("Sentence one.")
    assert docs[1].text == "Sentence two. Sentence three."
    assert docs[1].start == text.index("Sentence two.")


def test_semantic_splits_oversized_sentence():
    # test_ingestion_pipeline.py:493-511
    long_sentence = f"{'A' * 45}."
    text = f"# Topic\n\n{long_sentence}"
    docs = chunk_semantic(text, size=20, overlap=5)
    assert len(docs) >= 3
    assert all(len(d.text) <= 20 for d in docs)
    assert all(d.heading == "Topic" for d in docs)
    assert docs[0].start == text.index(long_sentence)
    assert [d.start for d in docs] == sorted(d.start for d in docs)


def test_semantic_no_overlap_advances_past_chunk():
    text = "Aa bb. Cc dd. Ee ff."
    docs = chunk_semantic(text, size=14, overlap=0)
    assert docs[0].text == "Aa bb. Cc dd."
    assert docs[1].text == "Ee ff."


# --- dispatch ----------------------------------------------------------------------

def test_dispatch_rejects_unknown():
    import pytest

    with pytest.raises(ValueError):
        chunk_text("x", strategy="nope")


def test_dispatch_normalizes_name():
    assert chunk_text("hello", strategy=" Fixed ")[0].text == "hello"
