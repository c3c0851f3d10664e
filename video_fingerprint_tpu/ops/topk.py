"""On-TPU cosine-similarity top-k — the FAISS `IndexFlatIP` replacement (C27).

The reference searches duplicates with either a full `np.dot` all-pairs matrix
(fingerprint.py:493) or FAISS IndexFlatIP with k=min(20,n) (fingerprint.py:
515-548). Here both become device matmuls:

  - `topk_cosine`: single-chip, query-tiled E @ Eᵀ + `lax.top_k`. Query tiling
    (lax.map over static-size blocks) bounds the similarity matrix to
    (block, N) so a 100k-corpus scan never materializes N².
  - `sharded_topk_cosine`: corpus- AND query-sharded over a 1-D mesh via a
    shard_map ring. Each chip holds an (N/d, D) shard that serves as both its
    query rows and a corpus tile; corpus tiles rotate around the ring via
    `ppermute` (d steps), and each chip folds every tile into a running
    per-row top-k. Per-device memory is O(N/d·(D+k)) — nothing is ever
    replicated — so the design scales to corpora far past one chip's HBM;
    communication is the corpus matrix once around the ring (O(N·D) bytes
    total, O(N/d·D) resident). Compiled programs are cached per
    (mesh, shapes, k), so repeated searches don't re-trace.

Self-matches are NOT excluded (FAISS also returns them); the greedy grouping
host-side handles that, exactly like the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array

_NEG = jnp.float32(-jnp.inf)


def _pad_rows(x: Array, multiple: int) -> Tuple[Array, int]:
    n = x.shape[0]
    padded = ((n + multiple - 1) // multiple) * multiple
    if padded != n:
        x = jnp.pad(x, ((0, padded - n), (0, 0)))
    return x, padded


@partial(jax.jit, static_argnames=("k", "query_block"))
def topk_search(queries: Array, corpus: Array, k: int, query_block: int = 1024):
    """Inner-product k-NN: (M, D) queries x (N, D) corpus ->
    (scores (M, k), indices (M, k))."""
    m = queries.shape[0]
    corpus = corpus.astype(jnp.float32)
    q, m_pad = _pad_rows(queries.astype(jnp.float32), query_block)
    q_blocks = q.reshape(m_pad // query_block, query_block, -1)

    def block_topk(qb):
        # HIGHEST: true-f32 matmul. Duplicate thresholds sit at 0.95-0.99;
        # default (bf16-ish) matmul precision injects ~1e-3 noise there.
        sims = jnp.dot(qb, corpus.T, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        return jax.lax.top_k(sims, k)

    scores, idx = jax.lax.map(block_topk, q_blocks)
    return scores.reshape(m_pad, k)[:m], idx.reshape(m_pad, k)[:m]


def topk_cosine(embeddings: Array, k: int, query_block: int = 1024):
    """Self-search: (N, D) embeddings -> (scores (N, k), indices (N, k))."""
    return topk_search(embeddings, embeddings, k, query_block=query_block)


_RING_CACHE: dict = {}


def _ring_topk(mesh: Mesh, axis_name: str, n_pad: int, dim: int,
               kk: int, local_k: int, query_block: int):
    """Build (or fetch) the compiled ring-top-k program for these shapes."""
    key = (mesh, axis_name, n_pad, dim, kk, local_k, query_block)
    if key in _RING_CACHE:
        return _RING_CACHE[key]

    d = mesh.shape[axis_name]
    shard_rows = n_pad // d
    perm = [(i, (i + 1) % d) for i in range(d)]

    def local_fn(shard, n_valid):
        # shard: (shard_rows, D) — this device's query rows AND the corpus
        # tile it contributes to the ring. n_valid: () replicated.
        my = jax.lax.axis_index(axis_name)
        q_blocks = shard.reshape(shard_rows // query_block, query_block, dim)

        def step(t, carry):
            scores, idx, tile = carry
            # after t rotations (i -> i+1) this device holds the tile that
            # started on device (my - t) mod d.
            offset = ((my - t) % d) * shard_rows
            col_idx = offset + jnp.arange(shard_rows, dtype=jnp.int32)
            col_valid = col_idx < n_valid

            def block_fn(qb):
                sims = jnp.dot(
                    qb, tile.T,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                sims = jnp.where(col_valid[None, :], sims, _NEG)
                s, j = jax.lax.top_k(sims, local_k)
                return s, col_idx[j]

            s_new, i_new = jax.lax.map(block_fn, q_blocks)
            s_cat = jnp.concatenate(
                [scores, s_new.reshape(shard_rows, local_k)], axis=1
            )
            i_cat = jnp.concatenate(
                [idx, i_new.reshape(shard_rows, local_k)], axis=1
            )
            s_top, pos = jax.lax.top_k(s_cat, kk)
            i_top = jnp.take_along_axis(i_cat, pos, axis=1)
            tile = jax.lax.ppermute(tile, axis_name, perm)
            return (s_top, i_top, tile)

        init = (
            jnp.full((shard_rows, kk), _NEG, jnp.float32),
            jnp.zeros((shard_rows, kk), jnp.int32),
            shard,
        )
        scores, idx, _ = jax.lax.fori_loop(0, d, step, init)
        return scores, idx

    from jax import shard_map

    fn = jax.jit(shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=(P(axis_name, None), P(axis_name, None)),
        check_vma=False,
    ))
    _RING_CACHE[key] = fn
    return fn


def sharded_topk_cosine(
    embeddings: Array,
    k: int,
    mesh: Optional[Mesh] = None,
    axis_name: str = "corpus",
    query_block: int = 1024,
):
    """Ring-sharded top-k over a device mesh (BASELINE config #5).

    Queries and corpus are the same (N, D) matrix, sharded over the mesh;
    corpus tiles rotate around the ring while each device maintains a running
    top-k for its own query rows. Padded rows are masked to -inf so they can
    never enter a top-k. Returns (scores (N,k), indices (N,k)) in global
    corpus coordinates.
    """
    if mesh is None:
        from video_fingerprint_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name)
    d = mesh.shape[axis_name]
    n, dim = embeddings.shape
    # clamp the query tile so tiny corpora don't pad to d*query_block rows
    per_shard = (n + d - 1) // d
    query_block = min(query_block, ((per_shard + 7) // 8) * 8)
    corpus, n_pad = _pad_rows(embeddings.astype(jnp.float32), d * query_block)
    shard_rows = n_pad // d

    local_k = min(k, shard_rows)
    kk = min(k, d * local_k)
    fn = _ring_topk(mesh, axis_name, n_pad, dim, kk, local_k, query_block)
    scores, idx = fn(corpus, jnp.asarray(n, jnp.int32))
    return scores[:n], idx[:n]
