"""Deterministic hash embeddings.

The reference embeds text through external providers returning
``list[list[float]]`` with a per-model dimension
(/root/reference/backend/services/embedding_service.py:16-41,
providers/base.py:48-67). This engine needs a *pure* stand-in with the same
shape so the Spark pipeline, the single-node oracle, and the DuckDB side all
compute byte-identical vectors: signed feature hashing of word tokens into a
fixed-dimension float32 vector, L2-normalized.

embed(text):
  tokens  = lowercase [a-z0-9]+ matches
  for t in tokens: h = sha1(t); idx = h[:4] % dim; sign = +1 if h[4]&1 else -1
  if tokens and v == 0 (signed hashes fully cancelled): v[fallback(tokens)] = 1
  v = v / ||v||2   (empty/no-token text stays the zero vector)

The fallback slot is sha1(" ".join(tokens)) % dim, so non-empty token streams
always embed to a unit vector — two tokens sharing a slot with opposite signs
can otherwise cancel to zero (a real Hypothesis-found case at dim=16).
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache

import numpy as np

from chatvector_ai_spark.config import EMBEDDING_DIM

_TOKEN_RE = re.compile(r"[a-z0-9]+")


@lru_cache(maxsize=65536)
def _token_slot(token: str) -> tuple[int, float]:
    digest = hashlib.sha1(token.encode("utf-8")).digest()
    idx = int.from_bytes(digest[:4], "big")
    sign = 1.0 if digest[4] & 1 else -1.0
    return idx, sign


def tokenize(text: str) -> list[str]:
    """Lowercased alphanumeric tokens (reranker/similarity.py:11-19)."""
    return _TOKEN_RE.findall((text or "").lower())


def _fallback_slot(tokens: list[str], dim: int) -> int:
    digest = hashlib.sha1(" ".join(tokens).encode("utf-8")).digest()
    return int.from_bytes(digest[:4], "big") % dim


def embed_text(text: str, dim: int = EMBEDDING_DIM) -> list[float]:
    vec = np.zeros(dim, dtype=np.float64)
    tokens = tokenize(text)
    for tok in tokens:
        idx, sign = _token_slot(tok)
        vec[idx % dim] += sign
    norm = float(np.linalg.norm(vec))
    if norm > 0.0:
        vec /= norm
    elif tokens:
        vec[_fallback_slot(tokens, dim)] = 1.0
    return [float(x) for x in vec.astype(np.float32)]


def embed_batch(texts: list[str], dim: int = EMBEDDING_DIM) -> np.ndarray:
    """Vectorized batch form used by the pandas UDF (float32, shape [n, dim])."""
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, text in enumerate(texts):
        tokens = tokenize(text)
        for tok in tokens:
            idx, sign = _token_slot(tok)
            out[i, idx % dim] += sign
        if tokens and not out[i].any():
            out[i, _fallback_slot(tokens, dim)] = 1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out.astype(np.float32)


def cosine(a: list[float], b: list[float]) -> float:
    va, vb = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    na, nb = np.linalg.norm(va), np.linalg.norm(vb)
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(va.dot(vb) / (na * nb))
