"""Text normalization ("nuclear flatten").

Matches the 6-step cleaning order of the reference
(/root/reference/backend/services/text_cleaning_service.py:17-40) — the step
order is semantics-bearing, because e.g. NFKC turns NBSP into a plain space
*before* whitespace-run collapsing, and hyphen rejoin must see original
newlines before the flatten step destroys them.

Steps:
  1. NFKC unicode normalization (ligatures, fullwidth, NBSP→space, ...)
  2. drop non-printable control chars, keeping \\t \\n \\r
  3. drop bullet glyphs
  4. drop soft hyphens; rejoin hyphenated line-wraps ("-\\n" + nonspace)
  5. flatten remaining \\n and \\r to single spaces
  6. collapse runs of spaces/tabs to one space; strip ends
"""

from __future__ import annotations

import re
import unicodedata

_CONTROL_CHARS = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
_BULLET_GLYPHS = re.compile(r"[●•▪▸▹◦‣⁃◆◇■□▶▷]")
_HYPHEN_WRAP = re.compile(r"-\n(\S)")
_SPACE_RUNS = re.compile(r"[ \t]+")
_SOFT_HYPHEN = "\u00ad"


def normalize_text(text: str) -> str:
    """Normalize raw extracted text into a single clean prose string."""
    if not text:
        return text
    out = unicodedata.normalize("NFKC", text)
    out = _CONTROL_CHARS.sub("", out)
    out = _BULLET_GLYPHS.sub("", out)
    out = out.replace(_SOFT_HYPHEN, "")
    out = _HYPHEN_WRAP.sub(r"\1", out)
    out = out.replace("\n", " ").replace("\r", " ")
    out = _SPACE_RUNS.sub(" ", out)
    return out.strip()
