"""Golden cases for normalize_text.

Mirrors the rule coverage of
/root/reference/backend/tests/test_text_cleaning_service.py (ligatures, NBSP,
control chars, bullets, soft hyphen + hyphen-wrap rejoin, flatten, collapse)
against our from-scratch implementation.
"""

from chatvector_ai_spark.oracle.textnorm import normalize_text


def test_ligatures_nfkc():
    assert normalize_text("ﬁne ﬂow") == "fine flow"


def test_fullwidth_digits_nfkc():
    assert normalize_text("１２３") == "123"


def test_nbsp_becomes_space_and_collapses():
    assert normalize_text("a  b") == "a b"


def test_control_chars_removed_tab_kept_as_space():
    assert normalize_text("a\x00b\x01c\td") == "ab c d".replace("ab c", "abc")
    assert normalize_text("a\x00b") == "ab"
    assert normalize_text("a\tb") == "a b"


def test_bullets_removed():
    assert normalize_text("● item • two ▪ three") == "item two three"


def test_soft_hyphen_removed():
    assert normalize_text("co­operate") == "cooperate"


def test_hyphen_linewrap_rejoined():
    assert normalize_text("hyphen-\nated word") == "hyphenated word"


def test_hyphen_before_space_not_rejoined():
    # "-\n" followed by whitespace is a real dash, not a wrap artifact
    assert normalize_text("dash-\n next") == "dash- next"


def test_newlines_flattened():
    assert normalize_text("line one\nline two\r\nline three") == "line one line two line three"


def test_whitespace_runs_collapse_and_strip():
    assert normalize_text("  a   b\t\tc  ") == "a b c"


def test_empty_and_none_like():
    assert normalize_text("") == ""


def test_order_nfkc_before_collapse():
    # NBSP (kept by a naive [ \t]+ collapse) must be NFKC'd to a space first
    assert normalize_text("x   y") == "x y"
