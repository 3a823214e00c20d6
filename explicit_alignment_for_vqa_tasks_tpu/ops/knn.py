"""Exact cosine/IP k-nearest-neighbour search on TPU.

Replaces FAISS ``IndexFlatIP`` over L2-normalized vectors
(reference: src/in_context_example_selection/get_question_knn.py:65-83 and
get_image_knn_from_text_knn.py:57-95). IndexFlatIP on normalized vectors is
exact cosine top-k, so one big matmul + ``jax.lax.top_k`` reproduces FAISS
results bit-for-bit up to fp tie-breaking — and it rides the MXU.

Query batches are chunked so the (chunk x N) score matrix stays in HBM
comfortably; the database matrix can additionally be sharded over a mesh
data axis for multi-chip search.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_chunk(queries: jnp.ndarray, database: jnp.ndarray, k: int):
    scores = jnp.dot(queries, database.T,
                     preferred_element_type=jnp.float32)
    return jax.lax.top_k(scores, k)


def knn_search(
    queries: np.ndarray,       # (M, d)
    database: np.ndarray,      # (N, d)
    k: int,
    normalize: bool = True,
    query_chunk: int = 1024,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (similarities (M, k), indices (M, k)), sorted descending —
    the FAISS ``index.search`` contract."""
    db = jnp.asarray(database, dtype=jnp.float32)
    if normalize:
        db = l2_normalize(db)
    k = min(k, database.shape[0])
    sims_out, idx_out = [], []
    for start in range(0, queries.shape[0], query_chunk):
        q = jnp.asarray(queries[start:start + query_chunk],
                        dtype=jnp.float32)
        if normalize:
            q = l2_normalize(q)
        # pad the final chunk to the chunk size to avoid a recompile
        pad = 0
        if q.shape[0] < query_chunk and start > 0:
            pad = query_chunk - q.shape[0]
            q = jnp.pad(q, ((0, pad), (0, 0)))
        sims, idx = _topk_chunk(q, db, k)
        if pad:
            sims, idx = sims[:-pad], idx[:-pad]
        sims_out.append(np.asarray(sims))
        idx_out.append(np.asarray(idx))
    return np.concatenate(sims_out), np.concatenate(idx_out)


@functools.partial(jax.jit, static_argnames=("k",))
def _masked_topk(queries, candidates, mask, k):
    # queries (B, d), candidates (B, C, d), mask (B, C) bool
    scores = jnp.einsum("bd,bcd->bc", queries, candidates,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(mask, scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


def grouped_knn_search(
    queries: np.ndarray,        # (B, d) one query per group
    candidates: np.ndarray,     # (B, C, d) per-group candidate vectors
    candidate_mask: np.ndarray,  # (B, C) valid-candidate mask
    k: int,
    normalize: bool = True,
    batch_chunk: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-group exact top-k (replaces the reference's per-question FAISS
    index rebuild, get_image_knn_from_text_knn.py:57-95). Invalid slots
    get -inf similarity.

    NOTE: not on the production RICES path anymore — rices.py's stage 3
    was rewritten as one whole-database matmul + take_along_axis gather
    (faster at VQA2 scale). Kept as the supported API for gathered
    per-group candidate sets that do NOT share a database (unit-tested
    in tests/test_knn_rices.py)."""
    k = min(k, candidates.shape[1])
    # pad the candidate axis to a power of two so differently-sized groups
    # reuse a small closed set of compiled programs
    width = candidates.shape[1]
    padded_width = 1
    while padded_width < width:
        padded_width *= 2
    if padded_width != width:
        pad = padded_width - width
        candidates = np.pad(candidates, ((0, 0), (0, pad), (0, 0)))
        candidate_mask = np.pad(candidate_mask, ((0, 0), (0, pad)))
    sims_out, idx_out = [], []
    for start in range(0, queries.shape[0], batch_chunk):
        q = jnp.asarray(queries[start:start + batch_chunk], jnp.float32)
        c = jnp.asarray(candidates[start:start + batch_chunk], jnp.float32)
        m = jnp.asarray(candidate_mask[start:start + batch_chunk])
        if normalize:
            q = l2_normalize(q)
            c = l2_normalize(c)
        sims, idx = _masked_topk(q, c, m, k)
        sims_out.append(np.asarray(sims))
        idx_out.append(np.asarray(idx))
    return np.concatenate(sims_out), np.concatenate(idx_out)
