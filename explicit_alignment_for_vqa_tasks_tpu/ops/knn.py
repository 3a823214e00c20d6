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


@functools.lru_cache(maxsize=8)
def _make_sharded_topk(mesh, k: int, k_local: int, n_valid: int):
    """Build the jitted multi-chip top-k for a (mesh, k, shapes) combo.

    Database rows are sharded over the mesh's ``data`` axis; each device
    computes its local (M, N/ndev) score block and local top-k_local, then
    one small (M, k_local*ndev) all-gather feeds the final merge top-k.
    Candidate order is (shard, local rank), so float-equal scores resolve
    to the LOWEST global row index — identical tie-breaking to the
    single-device ``lax.top_k`` (and FAISS IndexFlatIP).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    ndev = mesh.shape["data"]

    def local(q, db_local):
        shard = jax.lax.axis_index("data")
        rows = db_local.shape[0]
        scores = jnp.dot(q, db_local.T, preferred_element_type=jnp.float32)
        gidx = shard * rows + jnp.arange(rows)
        scores = jnp.where(gidx[None, :] < n_valid, scores, -jnp.inf)
        s, li = jax.lax.top_k(scores, k_local)
        return s, li + shard * rows

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data", None)),
        out_specs=(P(None, "data"), P(None, "data")),
    )

    @jax.jit
    def search(q, db_sharded):
        cand_s, cand_i = sharded(q, db_sharded)   # (M, k_local*ndev)
        s, pos = jax.lax.top_k(cand_s, k)
        return s, jnp.take_along_axis(cand_i, pos, axis=1)

    del ndev
    return search


def _shard_database(mesh, db: jnp.ndarray):
    """Pad the row axis to a data-axis multiple and place it sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndev = mesh.shape["data"]
    n = db.shape[0]
    rows = -(-n // ndev) * ndev
    if rows != n:
        db = jnp.pad(db, ((0, rows - n), (0, 0)))
    return jax.device_put(db, NamedSharding(mesh, P("data", None)))


def knn_search(
    queries: np.ndarray,       # (M, d)
    database: np.ndarray,      # (N, d)
    k: int,
    normalize: bool = True,
    query_chunk: int = 1024,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (similarities (M, k), indices (M, k)), sorted descending —
    the FAISS ``index.search`` contract.

    With ``mesh`` (a jax Mesh with a ``data`` axis of size > 1) the
    database rows are sharded across chips and each chunk's search runs
    as local matmul+top-k per shard + one k-wide merge — the multi-chip
    twin of the reference's FAISS-GPU stage
    (reference: src/in_context_example_selection/get_question_knn.py:65-83).
    Neighbour indices equal the single-device path (lowest-index
    tie-breaking preserved); similarities may differ by matmul-tiling
    rounding (tests/test_knn_rices.py::TestMultiChipKnn)."""
    db = jnp.asarray(database, dtype=jnp.float32)
    if normalize:
        db = l2_normalize(db)
    k = min(k, database.shape[0])
    use_mesh = mesh is not None and dict(mesh.shape).get("data", 1) > 1
    if use_mesh:
        n_valid = db.shape[0]
        db = _shard_database(mesh, db)
        rows_per = db.shape[0] // mesh.shape["data"]
        search_fn = _make_sharded_topk(
            mesh, k, min(k, rows_per), n_valid
        )
        sims_out, idx_out = [], []
        for start in range(0, queries.shape[0], query_chunk):
            q = jnp.asarray(queries[start:start + query_chunk],
                            dtype=jnp.float32)
            if normalize:
                q = l2_normalize(q)
            pad = 0
            if q.shape[0] < query_chunk and start > 0:
                pad = query_chunk - q.shape[0]
                q = jnp.pad(q, ((0, pad), (0, 0)))
            sims, idx = search_fn(q, db)
            if pad:
                sims, idx = sims[:-pad], idx[:-pad]
            sims_out.append(np.asarray(sims))
            idx_out.append(np.asarray(idx))
        return np.concatenate(sims_out), np.concatenate(idx_out)
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
