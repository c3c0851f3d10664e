"""On-TPU cosine-similarity top-k — the FAISS `IndexFlatIP` replacement (C27).

The reference searches duplicates with either a full `np.dot` all-pairs matrix
(fingerprint.py:493) or FAISS IndexFlatIP with k=min(20,n) (fingerprint.py:
515-548). Here both become device matmuls:

  - `topk_cosine`: single-chip, query-tiled E @ Eᵀ + `lax.top_k`. Query tiling
    (lax.map over static-size blocks) bounds the similarity matrix to
    (block, N) so a 100k-corpus scan never materializes N².
  - `sharded_topk_cosine`: corpus-sharded over a 1-D mesh via shard_map. Each
    chip holds an (N/d, D) shard, computes all-queries x shard similarities,
    takes a local top-k, then the (N, d·k) candidate sets are all-gathered
    over ICI and reduced with a global top-k. Communication is O(N·d·k),
    never O(N²).

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


def sharded_topk_cosine(
    embeddings: Array,
    k: int,
    mesh: Optional[Mesh] = None,
    axis_name: str = "corpus",
    query_block: int = 1024,
):
    """Corpus-sharded top-k over a device mesh (BASELINE config #5).

    Each device owns an equal corpus shard; padded rows are masked to -inf so
    they can never enter a top-k. Returns (scores (N,k), indices (N,k)) in
    global corpus coordinates.
    """
    if mesh is None:
        from video_fingerprint_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name)
    d = mesh.shape[axis_name]
    n, dim = embeddings.shape
    corpus, n_pad = _pad_rows(embeddings.astype(jnp.float32), d * query_block)
    shard_rows = n_pad // d
    row_valid = (jnp.arange(n_pad) < n).astype(jnp.float32)

    local_k = min(k, shard_rows)

    def local_topk(corpus_shard, valid_shard, queries):
        # corpus_shard: (shard_rows, D); queries: (n_pad, D) replicated.
        my = jax.lax.axis_index(axis_name)
        offset = my * shard_rows

        def block_fn(q):
            sims = jnp.dot(q, corpus_shard.T, precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
            sims = jnp.where(valid_shard[None, :] > 0, sims, _NEG)
            s, i = jax.lax.top_k(sims, local_k)
            return s, i + offset

        qb = queries.reshape(-1, query_block, dim)
        s, i = jax.lax.map(block_fn, qb)
        s = s.reshape(n_pad, local_k)
        i = i.reshape(n_pad, local_k)
        # gather all shards' candidates over ICI: (n_pad, d*local_k)
        s_all = jax.lax.all_gather(s, axis_name, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, axis_name, axis=1, tiled=True)
        return s_all, i_all

    from jax import shard_map

    fn = shard_map(
        local_topk,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    corpus_sharded = corpus  # (n_pad, D), rows split across devices by in_spec
    s_all, i_all = jax.jit(fn)(corpus_sharded, row_valid, corpus)

    kk = min(k, s_all.shape[1])
    s_top, pos = jax.lax.top_k(s_all, kk)
    i_top = jnp.take_along_axis(i_all, pos, axis=1)
    return s_top[:n], i_top[:n]
