"""On-TPU cosine-similarity top-k — the FAISS `IndexFlatIP` replacement (C27).

The reference searches duplicates with either a full `np.dot` all-pairs matrix
(fingerprint.py:493) or FAISS IndexFlatIP with k=min(20,n) (fingerprint.py:
515-548). Here both become device matmuls:

  - `topk_cosine` / `topk_search`: single-chip, query-tiled E @ Eᵀ. Query
    tiling (lax.map over static-size blocks) bounds the similarity matrix to
    (block, N) so a 100k-corpus scan never materializes N². Selection is
    either exact `lax.top_k` or — the TPU default — `lax.approx_max_k`
    (the TPU PartialReduce unit, measured at the matmul+max floor) plus a
    per-row exactness CERTIFICATE and an exact repair pass for the rows that
    fail it, so results keep exact semantics at approx speed (measured 5.4x
    the full-sort rate at 100k x 256; tools/exp_topk_blocked.py /
    exp_topk_cert.py).
  - `sharded_topk_search`: corpus-sharded query-vs-corpus k-NN (queries
    replicated, shards searched locally, candidates all-gathered and
    merged) — the `--against` workload at corpora past one chip's HBM.
  - `sharded_topk_cosine`: corpus- AND query-sharded over a 1-D mesh via a
    shard_map ring. Each chip holds an (N/d, D) shard that serves as both its
    query rows and a corpus tile; corpus tiles rotate around the ring via
    `ppermute` (d steps), and each chip folds every tile into a running
    per-row top-k. Per-device memory is O(N/d·(D+k)) — nothing is ever
    replicated — so the design scales to corpora far past one chip's HBM;
    communication is the corpus matrix once around the ring (O(N·D) bytes
    total, O(N/d·D) resident). Compiled programs are cached per
    (mesh, shapes, k), so repeated searches don't re-trace.

  Both sharded paths support the same certified-approx selection as the
  single-chip search (`method="certified"`, the TPU auto default once the
  PER-SHARD sort width passes the 16k knee): each tile/shard runs
  approx_max_k + the per-row exactness certificate, a row is certified iff
  every tile it met certified it, and the failing rows are repaired by an
  exact corpus-sharded pass — so multi-chip results keep exact (or, with
  `exact_above`, grouping-complete) semantics at approx speed.

  Thresholded searches additionally get `method="certified-bf16"` (the TPU
  auto default when `exact_above` is set): the dominant sims matmul drops
  from Precision.HIGH (3 MXU passes) to a single bf16 pass, the threshold
  certificate widens by the rigorous bf16 dot-product error bound
  (_BF16_DOT_EPS) so candidate-completeness survives the noise, and the k
  returned candidates are re-scored at HIGH (O(M*k*D) — trivial) so
  reported scores keep the <=2e-5 contract. All three paths support it;
  measured uplift in BASELINE.md round 4.

Self-matches are NOT excluded (FAISS also returns them); the greedy grouping
host-side handles that, exactly like the reference.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array

_NEG = jnp.float32(-jnp.inf)


def _bucket_rows(n: int, floor: int = 1024) -> int:
    """Round n up to a bounded bucket set (1/16-octave granularity, <=~6%
    padding waste at scale): searches compile per padded shape, and a
    growing corpus must not pay a fresh multi-minute XLA compile per scan."""
    if n <= floor:
        return floor
    g = max(floor // 16, 1 << (int(np.floor(np.log2(n))) - 4))
    return -(-n // g) * g


def _pad_rows(x: Array, multiple: int) -> Tuple[Array, int]:
    n = x.shape[0]
    padded = ((n + multiple - 1) // multiple) * multiple
    if padded != n:
        x = jnp.pad(x, ((0, padded - n), (0, 0)))
    return x, padded


# Full-width lax.top_k crashes the TPU worker on very wide rows: reproduced
# 3x at 1M-wide (even with 256-row query blocks) while the 100k production
# bucket is long-proven. Rows wider than this are selected per column-chunk
# and merged (_wide_topk) — 131072 keeps every proven-good shape on the
# single full-width top_k it always compiled to. Env-overridable
# (VFP_WIDE_TOPK_CHUNK) because the safe width is a property of THIS
# deployment's TPU runtime, not of the algorithm — see the recalibration
# note in docs/DESIGN.md. Resolved at trace time (_wide_chunk), so set it
# before the first search of a given shape.
_WIDE_TOPK_CHUNK = 131072


def _wide_chunk() -> int:
    return int(os.environ.get("VFP_WIDE_TOPK_CHUNK", _WIDE_TOPK_CHUNK))

# Per-DISPATCH work budget (query_rows x corpus_rows cells) per method.
# The axon TPU worker kills executions that run too long ("TPU worker
# process crashed or restarted", kernel-fault wording): isolated on chip at
# 1M x 256 — the same program is fine at 64k queries (5.2 s), fine as 15
# separate 65k-query dispatches (~5 s each), and fine as certified (26.4 s),
# but dies as ONE ~78 s exact dispatch regardless of query_block (1024 or
# 256) or top_k width (full or column-chunked), so the discriminator is
# dispatch DURATION, not shape or memory (tools/exp_wide_topk.py).
# topk_search slabs queries so each dispatch stays ~10-15 s at the rates
# measured at 1M width (exact ~1.3e10 cells/s; certified ~3.8e10;
# certified-bf16 ~1e11). Every proven config (100k all methods = 1e10
# cells) stays single-dispatch.
_DISPATCH_CELLS = {
    "exact": 2 * 10**11,
    "certified": 5 * 10**11,
    "certified-bf16": 10**12,
}


def _dispatch_budget(method: str) -> float:
    """Per-dispatch cell budget, env-overridable: the defaults encode THIS
    axon worker's ~30-80 s execution-kill threshold at measured 1M-width
    rates; a production v5e with no watchdog should raise them (or set
    VFP_DISPATCH_CELLS=inf to disable slabbing entirely), a slower part
    should lower them. Per-method VFP_DISPATCH_CELLS_EXACT /
    _CERTIFIED / _CERTIFIED_BF16 wins over the global VFP_DISPATCH_CELLS.
    Recalibration recipe in docs/DESIGN.md."""
    v = os.environ.get(
        "VFP_DISPATCH_CELLS_" + method.replace("-", "_").upper()
    ) or os.environ.get("VFP_DISPATCH_CELLS")
    return float(v) if v else float(_DISPATCH_CELLS[method])


def _wide_topk(sims: Array, k: int, chunk: Optional[int] = None):
    """`lax.top_k` over the last axis, structurally safe at any row width.

    Rows wider than `chunk` columns are split into static column chunks,
    top-k'd per chunk, and the (rows, sum_kk) candidates merged by one small
    top_k. Bit-equal to the full-width op INCLUDING the tie rule: both
    return the k largest by (score desc, index asc) — per-chunk top_k keeps
    ties in ascending-index order and the concatenation is in chunk order,
    so the merge's earliest-position tie-break selects the lowest global
    indices. Tested against full-width on tie-heavy inputs
    (tests/test_topk.py)."""
    if chunk is None:
        chunk = _wide_chunk()
    n = sims.shape[-1]
    if n <= chunk:
        return jax.lax.top_k(sims, k)
    ss, ii = [], []
    for s0 in range(0, n, chunk):
        width = min(chunk, n - s0)
        sc, ic = jax.lax.top_k(
            jax.lax.slice_in_dim(sims, s0, s0 + width, axis=-1),
            min(k, width))
        ss.append(sc)
        ii.append(ic + s0)
    s_all = jnp.concatenate(ss, axis=-1)
    i_all = jnp.concatenate(ii, axis=-1)
    s_top, pos = jax.lax.top_k(s_all, k)
    return s_top, jnp.take_along_axis(i_all, pos, axis=-1)


# Matmul precision for similarity math. HIGH = bf16x3 emulated f32 (3 MXU
# passes vs HIGHEST's 6): tracks HIGHEST to <=2e-5 on unit-norm 256-d
# embeddings at the 100k production shape while DEFAULT's single bf16 pass
# injects ~1.6e-3 — too coarse next to the 0.95-0.99 duplicate thresholds.
# Measured (tools/exp_topk_precision.py, 100k x 256 on v5e): HIGHEST 105.6k,
# HIGH 115.4k, DEFAULT 117.2k q/s — HIGH buys +9% at zero top-k index
# disagreement; the search is top_k-bound, not matmul-bound, which is what
# the certified-approx path below exploits.
_SIM_PRECISION = jax.lax.Precision.HIGH

# Rigorous error bound for the single-pass bf16 sims pipeline against the
# true f32 inner product of UNIT-NORM vectors: bf16-rounded inputs with f32
# accumulation (Precision.DEFAULT on TPU), the RESULT then stored as bf16.
# Round-to-nearest bf16 (8-bit significand incl. the implicit bit) gives
# |dx_i| <= |x_i|*2^-8 per element, so
#   |x.y - xq.yq| <= |dx.y| + |x.dy| + |dx.dy|
#                 <= 2*2^-8 + 2^-16            (Cauchy-Schwarz, ||x||=||y||=1)
# plus f32 accumulation error over D<=1024 terms (< 1e-5) plus the bf16
# rounding of the stored value (<= |sim|*2^-9 <= 2^-9 for |sim| <= ~1):
# total <= 0.0079 + 0.002 = 0.0099. 0.0105 covers it with slack; validated
# empirically in tests/test_topk.py against explicit bf16 rounding of both
# inputs AND output. The certified-bf16 path widens its threshold
# certificate by this margin so completeness survives the cheap first pass;
# sims is MATERIALIZED in bf16 because the certificate count is a second
# consumer that defeats XLA's matmul+reduce fusion — halving the forced
# HBM round-trip was measured +37% on the first stage at 100k x 256
# (tools/exp_topk_bf16sims.py; single-consumer variants fuse fully and are
# dtype-insensitive).
_BF16_DOT_EPS = 0.0105

# Error bound for the bf16-RESIDENT pipeline against its truth — the TRUE
# COSINE of the stored vectors (see _row_rnorm: bf16 storage stores
# directions; sims are rescaled by exact f32 row norms). The inputs are
# already exactly representable, so _BF16_DOT_EPS's input-rounding term
# vanishes; what remains is f32 accumulation over D<=1024 terms (< 1e-5),
# the rsqrt/scale f32 roundings (~2^-22), and — lowp only — the bf16
# rounding of the stored COSINE value (<= 2^-9 = 0.00195 for |cos| <= 1):
# total <= 0.0021. 0.003 covers it with slack; validated empirically in
# tests/test_topk.py. The residual storage trade a USER sees: the stored
# direction differs from the f32 direction by an angle <= ~2^-9·sqrt(2),
# so true cosines move by <= ~0.002 ON NON-IDENTICAL pairs — and identical
# stored rows still score exactly 1.0 (self-search self-matches,
# byte-identical duplicates), so exact-duplicate thresholds keep working.
_BF16_STORE_EPS = 0.003


def _compute_cast(x: Array) -> Array:
    """Dtype policy for the resident similarity operands: bf16 STORAGE stays
    bf16 — upcasting a multi-M-row corpus full-width would materialize the
    f32 copy the storage mode exists to avoid (and jnp.dot's type promotion
    does exactly that if only one operand is bf16) — everything else
    becomes f32."""
    return x if x.dtype == jnp.bfloat16 else x.astype(jnp.float32)


def _dot_precision(dtype, precision):
    """HIGH/HIGHEST request the bf16x3/x6 f32 emulation, which only applies
    to f32 operands; with bf16-resident operands the matmul is the single
    native bf16 pass regardless, so request DEFAULT explicitly."""
    return jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16 else precision


def _row_rnorm(x: Array) -> Array:
    """1/||row|| as f32, computed WITHOUT materializing an upcast copy (the
    einsum reads bf16 directly, products are exact, accumulation is f32).
    Zero rows (corpus padding) map to 0 so scaled sims stay finite there
    (they are masked to -inf downstream anyway).

    Why this exists: bf16 quantization makes stored rows non-unit
    (||q(x)|| = 1 ± ~2^-9·sqrt(2) per the rounding bound), so RAW inner
    products against a bf16-resident corpus sit ~0.4% below the true
    cosine — enough to break exact-duplicate detection at thresholds
    >= 0.999. bf16 storage therefore stores DIRECTIONS: every search path
    rescales sims by these exact f32 reciprocal norms, so reported scores
    are true cosines of the stored vectors (self-search self-matches score
    exactly 1.0, and byte-identical duplicates group at any threshold)."""
    norm2 = jnp.einsum("nd,nd->n", x, x,
                       preferred_element_type=jnp.float32)
    return jnp.where(norm2 > 0, jax.lax.rsqrt(norm2), 0.0)


@partial(jax.jit, static_argnames=("k", "query_block", "precision"))
def _exact_search(queries: Array, corpus: Array, n_valid: Array, k: int,
                  query_block: int = 1024, precision=_SIM_PRECISION):
    """Single-stage exact k-NN: query-tiled matmul + lax.top_k (column-
    chunked above _WIDE_TOPK_CHUNK — full-width crashes the TPU worker at
    1M-wide rows). Corpus rows at index >= n_valid are padding, -inf.

    A bf16 corpus stays resident in bf16 (queries are cast to match so the
    dot is homogeneous — see _compute_cast); sims accumulate in f32, which
    is exact for bf16 products (8-bit significands), and are rescaled by
    exact f32 row norms (_row_rnorm), so results are the exact top-k of
    TRUE COSINES of the stored vectors."""
    m = queries.shape[0]
    corpus = _compute_cast(corpus)
    resident_bf16 = corpus.dtype == jnp.bfloat16
    precision = _dot_precision(corpus.dtype, precision)
    col_valid = jnp.arange(corpus.shape[0]) < n_valid
    q, m_pad = _pad_rows(queries.astype(corpus.dtype), query_block)
    q_blocks = q.reshape(m_pad // query_block, query_block, -1)
    rnorm = _row_rnorm(corpus) if resident_bf16 else None

    def block_topk(qb):
        sims = jnp.dot(qb, corpus.T, precision=precision,
                       preferred_element_type=jnp.float32)
        if resident_bf16:  # cosine domain; fused into the matmul epilogue
            sims = sims * rnorm[None, :] * _row_rnorm(qb)[:, None]
        sims = jnp.where(col_valid[None, :], sims, _NEG)
        return _wide_topk(sims, k)

    scores, idx = jax.lax.map(block_topk, q_blocks)
    return scores.reshape(m_pad, k)[:m], idx.reshape(m_pad, k)[:m]


@partial(jax.jit,
         static_argnames=("k", "query_block", "recall", "thr", "precision",
                          "lowp"))
def _certified_search(queries: Array, corpus: Array, n_valid: Array, k: int,
                      query_block: int, recall: float,
                      thr: Optional[float], precision=_SIM_PRECISION,
                      lowp: bool = False):
    """approx_max_k (TPU PartialReduce) + a per-row exactness certificate
    computed from the same sims tensor. Returns (scores, idx, ok); rows with
    ok=False must be repaired by an exact pass (see topk_search).

    Strict certificate (thr=None): with s_k = k-th returned score,
    count(sims > s_k) == count(returned > s_k) proves the returned score
    multiset IS the exact top-k — every element strictly above s_k is
    accounted for and the remainder are ties at s_k (returned scores are
    actual sims elements, so equality of strictly-above counts implies set
    equality there).

    Threshold certificate (thr set): proves the returned candidates contain
    EVERY corpus item with sim >= thr (all that duplicate grouping at
    threshold thr can ever use, fingerprint.py:515-548), via
    count(sims >= thr) == count(returned >= thr); rows with k or more
    above-threshold neighbours additionally require the strict certificate
    (their candidate list is truncated, so it must be the true top-k).

    lowp (requires thr): the sims matmul — the dominant cost once selection
    runs at the approx floor — drops to Precision.DEFAULT (ONE bf16 MXU pass
    instead of HIGH's three) and the threshold certificate widens to
    thr - _BF16_DOT_EPS, so any item whose TRUE similarity reaches thr still
    clears the noisy count. Rows with >= k neighbours above the widened
    threshold fail (a strict certificate is unverifiable from noisy scores).
    Callers must re-score the returned candidates at HIGH
    (`_rescore_topk`) so reported scores keep the 2e-5 contract.
    """
    m = queries.shape[0]
    corpus = _compute_cast(corpus)
    resident_bf16 = corpus.dtype == jnp.bfloat16
    col_valid = jnp.arange(corpus.shape[0]) < n_valid
    q, m_pad = _pad_rows(queries.astype(corpus.dtype), query_block)
    q_blocks = q.reshape(m_pad // query_block, query_block, -1)
    if lowp and thr is None:
        raise ValueError("lowp first pass requires a threshold certificate")
    sim_precision = (jax.lax.Precision.DEFAULT if lowp
                     else _dot_precision(corpus.dtype, precision))
    # bf16-resident inputs are exactly representable, so the lowp
    # certificate only needs the accumulation + cosine-rescale + storage
    # margin (see _BF16_STORE_EPS) — fewer rows trip the
    # >=k-above-threshold repair rule
    eps = _BF16_STORE_EPS if resident_bf16 else _BF16_DOT_EPS
    rnorm = _row_rnorm(corpus) if resident_bf16 else None

    def block_fn(qb):
        # lowp materializes sims in bf16: the count below is a second
        # consumer, so XLA cannot keep sims fused into the matmul — it gets
        # written to and re-read from HBM, and halving those bytes is worth
        # more than the storage rounding costs in certificate width
        # (measured in tools/exp_topk_bf16sims.py).
        if resident_bf16:
            # cosine domain: accumulate f32, rescale by exact norms in the
            # matmul epilogue, THEN store bf16 (lowp) — the stored value is
            # the bf16 rounding of the true cosine, which is exactly what
            # _BF16_STORE_EPS bounds
            sims = jnp.dot(qb, corpus.T, precision=sim_precision,
                           preferred_element_type=jnp.float32)
            sims = sims * rnorm[None, :] * _row_rnorm(qb)[:, None]
            if lowp:
                sims = sims.astype(jnp.bfloat16)
        else:
            sims = jnp.dot(qb, corpus.T, precision=sim_precision,
                           preferred_element_type=(jnp.bfloat16 if lowp
                                                   else jnp.float32))
        sims = jnp.where(col_valid[None, :], sims,
                         jnp.asarray(_NEG, sims.dtype))
        if lowp or corpus.dtype == jnp.bfloat16:
            # Force ONE materialization of the sims: with two consumers XLA
            # may recompute the matmul for one of them at a different
            # effective precision (or accumulation order), and the
            # certificate's count equality is only sound if selection and
            # count see the SAME values (a boundary item rounding up in one
            # domain can mask a genuine miss — observed on chip at 100k
            # before this barrier). Also applied to bf16-RESIDENT strict
            # searches, whose f32-accumulated sims are recomputation-order
            # sensitive the same way. Cost ~0: the count consumer defeats
            # matmul+reduce fusion regardless (tools/exp_topk_bf16sims.py).
            sims = jax.lax.optimization_barrier(sims)
        # selection + certificate shared with the sharded paths (one
        # implementation to keep the on-chip-proven soundness rules — the
        # barrier above, the bf16-grid comparison — from diverging)
        s, i, ok = _tile_topk(sims, k,
                              "certified-bf16" if lowp else "certified",
                              recall, thr, eps=eps)
        return s.astype(jnp.float32), i, ok

    scores, idx, ok = jax.lax.map(block_fn, q_blocks)
    return (scores.reshape(m_pad, k)[:m], idx.reshape(m_pad, k)[:m],
            ok.reshape(m_pad)[:m])


@partial(jax.jit, static_argnames=("block", "precision"))
def _rescore_topk(queries: Array, corpus: Array, scores: Array, idx: Array,
                  block: int = 8192, precision=_SIM_PRECISION):
    """Re-score (M, k) returned candidates at HIGH precision and re-sort each
    row. The gather+einsum is O(M*k*D) — trivial next to the O(M*N*D) search
    — and restores the <=2e-5 score contract after a bf16 first pass.
    Slots holding -inf (corpus padding / k > n) stay -inf."""
    m, k = idx.shape
    corpus = _compute_cast(corpus)
    resident_bf16 = corpus.dtype == jnp.bfloat16
    if resident_bf16:
        # Quantize queries to the corpus dtype BEFORE the f32 upcast, so the
        # rescored scores live in the same cos(q(query), stored) domain as
        # the selection certificate (_certified_search casts queries at line
        # ~289) and the exact repairs (_exact_rows_fix). An f32-query rescore
        # would shift boundary scores by up to the query-quantization term
        # (~2^-9*sqrt(2) ~ 0.003), which _BF16_STORE_EPS does not budget:
        # an item could then report >= thr without the certificate ever
        # having guaranteed its completeness, and repaired vs rescored rows
        # would mix two score domains in one result matrix (ADVICE r4 #1).
        queries = queries.astype(jnp.bfloat16)
    q, m_pad = _pad_rows(queries.astype(jnp.float32), block)
    if m_pad != m:
        idx = jnp.pad(idx, ((0, m_pad - m), (0, 0)))
        scores = jnp.pad(scores, ((0, m_pad - m), (0, 0)),
                         constant_values=_NEG)

    def block_fn(args):
        qb, ib, sb = args
        # gather first, THEN upcast: only (block, k, D) candidate rows ever
        # become f32, never the full bf16-resident corpus
        cand = jnp.take(corpus, ib, axis=0, mode="clip").astype(jnp.float32)
        hi = jnp.einsum("md,mkd->mk", qb, cand, precision=precision,
                        preferred_element_type=jnp.float32)
        if resident_bf16:
            # cosine domain (see _row_rnorm): renormalize the gathered
            # candidate rows and the query rows with exact f32 norms
            cn2 = jnp.sum(cand * cand, axis=-1)
            crn = jnp.where(cn2 > 0, jax.lax.rsqrt(cn2), 0.0)
            hi = hi * crn * _row_rnorm(qb)[:, None]
        hi = jnp.where(jnp.isneginf(sb), _NEG, hi)
        s_sorted, pos = jax.lax.top_k(hi, k)
        return s_sorted, jnp.take_along_axis(ib, pos, axis=1)

    nb = m_pad // block
    s2, i2 = jax.lax.map(block_fn, (q.reshape(nb, block, -1),
                                    idx.reshape(nb, block, k),
                                    scores.reshape(nb, block, k)))
    return s2.reshape(m_pad, k)[:m], i2.reshape(m_pad, k)[:m]


@partial(jax.jit, static_argnames=("k", "precision"))
def _exact_rows_fix(queries: Array, corpus: Array, n_valid: Array,
                    rows: Array, k: int, precision=_SIM_PRECISION):
    """Exact top-k for a fixed-size batch of gathered query rows. `rows` may
    contain out-of-range pad entries (clamped by take; dropped at scatter);
    corpus rows at index >= n_valid are padding, masked to -inf."""
    corpus = _compute_cast(corpus)
    # gather the few repair rows FIRST, then cast to the corpus dtype — a
    # full-width queries.astype would copy the whole matrix
    qb = jnp.take(queries, rows, axis=0, mode="clip").astype(corpus.dtype)
    sims = jnp.dot(qb, corpus.T,
                   precision=_dot_precision(corpus.dtype, precision),
                   preferred_element_type=jnp.float32)
    if corpus.dtype == jnp.bfloat16:  # cosine domain; see _row_rnorm
        sims = sims * _row_rnorm(corpus)[None, :] * _row_rnorm(qb)[:, None]
    sims = jnp.where(jnp.arange(corpus.shape[0])[None, :] < n_valid,
                     sims, _NEG)
    return _wide_topk(sims, k)


@jax.jit
def _scatter_fix(scores: Array, idx: Array, rows: Array,
                 fix_s: Array, fix_i: Array):
    return (scores.at[rows].set(fix_s, mode="drop"),
            idx.at[rows].set(fix_i, mode="drop"))


def stage_padded_corpus(corpus, device=None, dtype=None):
    """Pad the corpus to its search bucket ONCE on host and place it on the
    device. Returns (device_array, n_true); pass both to `topk_search`
    (corpus=device_array, n_valid=n_true) so repeated searches against a
    static corpus skip the per-call O(N·D) pad copy (ADVICE r3 low:
    FingerprintIndex --against workloads re-searched a cached corpus but
    paid jnp.concatenate each time).

    dtype="bf16" (or jnp.bfloat16) quantizes ON HOST before the transfer —
    half the HBM residency AND half the host→device bytes, doubling the
    corpus size one chip can serve (a 16 GB v5e holds ~8M×256 clips in
    bf16 plus working set vs ~4M in f32). bf16 storage stores DIRECTIONS:
    every search rescales by exact f32 row norms (_row_rnorm), so all
    methods keep their exact/complete contracts over the TRUE COSINES of
    the stored vectors — identical stored rows score exactly 1.0 (exact-
    duplicate detection survives any threshold), and non-identical cosines
    move by <= ~0.002 vs f32 storage (FAISS's SQfp16 offers the same trade
    with no stated bound)."""
    import jax

    if dtype in ("bf16", "bfloat16", jnp.bfloat16):
        import ml_dtypes

        corpus = np.asarray(corpus).astype(ml_dtypes.bfloat16)
    else:
        corpus = np.asarray(corpus, np.float32)
    n = corpus.shape[0]
    n_pad = _bucket_rows(n)
    if n_pad != n:
        corpus = np.pad(corpus, ((0, n_pad - n), (0, 0)))
    arr = jax.device_put(corpus, device) if device is not None else (
        jnp.asarray(corpus))
    return arr, n


def topk_search(queries: Array, corpus: Array, k: int, query_block: int = 1024,
                precision=_SIM_PRECISION, method: str = "auto",
                exact_above: Optional[float] = None,
                recall_target: Optional[float] = None,
                n_valid: Optional[int] = None):
    """Inner-product k-NN: (M, D) queries x (N, D) corpus ->
    (scores (M, k), indices (M, k)).

    method:
      - "exact": single-stage lax.top_k over the corpus width (column-
        chunked + merged above _WIDE_TOPK_CHUNK, where the full-width op
        crashes the TPU worker; bit-equal either way).
      - "certified": lax.approx_max_k + per-row exactness certificate; rows
        failing it are gathered and repaired by fixed-shape exact passes, so
        the RESULT is exact (strictly: the top-k score multiset per row, or —
        when `exact_above` is set — candidate-complete above that threshold,
        which is everything duplicate grouping consumes). Measured at the
        100k production shape (tools/exp_topk_cert.py /
        exp_topk_production.py, v5e): the exact search is top_k-bound
        (matmul+max floor 0.147s vs 0.857s total), approx runs at the floor
        (0.165s), and the certified end-to-end path holds 211.6k q/s strict
        / 343.6k q/s thresholded vs 116.7k exact — 1.8x / 2.9x with verified
        bit-equal (strict) or grouping-complete (thresholded) results.
      - "auto": "certified" on TPU backends when the corpus is large enough
        for the sort cost to dominate; "exact" otherwise (CPU approx_max_k
        is slower than its top_k, measured 22x at n=4k).

      - "certified-bf16": the certified threshold path with the dominant
        sims matmul at Precision.DEFAULT (ONE bf16 MXU pass vs HIGH's
        three); the certificate widens by the rigorous bf16 dot bound
        (_BF16_DOT_EPS) so candidate-completeness above `exact_above`
        survives the noise, and the k returned candidates are re-scored at
        HIGH (O(M*k*D), trivial) so reported scores keep the <=2e-5
        contract. Requires `exact_above`. The TPU auto default for
        thresholded searches (measured uplift vs certified-HIGH recorded in
        BASELINE.md round 4 / docs/ROUND4_NOTES.md).

    exact_above: duplicate threshold for the relaxed certificate (scanner
    passes its similarity_threshold). recall_target: approx_max_k target for
    the first pass; None picks the measured-best per certificate — 0.99
    strict (0.95 fails the strict cert on 42% of rows; 0.999 makes the
    approx op itself slower than exact), 0.95 thresholded (its cert almost
    never fails, so the cheapest first pass wins).
    """
    if recall_target is None:
        recall_target = 0.99 if exact_above is None else 0.95
    n = corpus.shape[0] if n_valid is None else int(n_valid)
    if method == "auto":
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        if on_tpu and n >= 16384 and k < n:
            method = "certified" if exact_above is None else "certified-bf16"
        else:
            method = "exact"
    lowp = method == "certified-bf16"
    if lowp:
        if exact_above is None:
            raise ValueError(
                "method='certified-bf16' needs exact_above: the widened "
                "certificate is threshold-only (strict exactness cannot be "
                "certified from single-pass bf16 scores)")
        method = "certified"
    # bucketed corpus with an exact -inf validity mask: every search
    # compiles per bucket (<=16 per octave, <=~6% pad waste), not per corpus
    # size — a growing library would otherwise trigger a fresh XLA compile
    # on every scan. Results are bit-identical to the unpadded search (pad
    # columns can never enter a top-k or a certificate count). Callers with
    # a static corpus pass a `stage_padded_corpus` result via n_valid to
    # skip this per-call pad copy.
    n_pad = _bucket_rows(n)
    if n_valid is not None:
        if corpus.shape[0] != n_pad:
            raise ValueError(
                f"pre-padded corpus must have _bucket_rows({n})={n_pad} "
                f"rows (use stage_padded_corpus), got {corpus.shape[0]}")
    elif n_pad != n:
        cdt = (jnp.bfloat16 if getattr(corpus, "dtype", None) == jnp.bfloat16
               else jnp.float32)
        corpus = jnp.concatenate(
            [jnp.asarray(corpus, cdt),
             jnp.zeros((n_pad - n, corpus.shape[1]), cdt)]
        )
    n_valid = jnp.asarray(n, jnp.int32)
    if method not in ("exact", "certified"):
        raise ValueError(f"unknown top-k method {method!r}")

    # Cap one query tile's sims block at ~4 GB so multi-M corpora cannot
    # OOM with the default query_block (1024 x 4M-pad f32 would be 16+ GB
    # of per-tile intermediates on a 16 GB chip). Every measured config is
    # preserved: 1M f32 keeps qb=1024 (4.06 GB), 1M bf16 keeps 1024
    # (2 GB), 4M drops to the 256 the scale run used.
    bytes_per = 2 if lowp else 4
    max_qb = max(256, (4 << 30) // (n_pad * bytes_per) // 256 * 256)
    query_block = min(query_block, max_qb)

    # Slab the queries so no single dispatch exceeds the per-method work
    # budget (_DISPATCH_CELLS): the axon worker kills long-running
    # executions, and one exact 1M-self-search dispatch (~78 s) dies where
    # the same work as ~5-15 s dispatches completes. Results are invariant
    # to slabbing (indices are corpus-side; each slab repairs its own rows).
    m = queries.shape[0]
    budget = _dispatch_budget("certified-bf16" if lowp else method)
    if m * n_pad > budget:
        slab = max(query_block,
                   int(budget // n_pad) // query_block * query_block)
        parts = [
            _search_padded(queries[lo:lo + slab], corpus, n_valid, k,
                           query_block, precision, method, lowp,
                           recall_target, exact_above)
            for lo in range(0, m, slab)
        ]
        return (jnp.concatenate([p[0] for p in parts]),
                jnp.concatenate([p[1] for p in parts]))
    return _search_padded(queries, corpus, n_valid, k, query_block,
                          precision, method, lowp, recall_target,
                          exact_above)


def _search_padded(queries: Array, corpus: Array, n_valid: Array, k: int,
                   query_block: int, precision, method: str, lowp: bool,
                   recall_target: float, exact_above: Optional[float]):
    """One dispatch-group of topk_search over a pre-padded corpus: the
    exact or certified first stage plus (certified) rescore and repair."""
    if method == "exact":
        return _exact_search(queries, corpus, n_valid, k,
                             query_block=query_block, precision=precision)

    scores, idx, ok = _certified_search(
        queries, corpus, n_valid, k, query_block, recall_target, exact_above,
        precision=precision, lowp=lowp,
    )
    if lowp:
        # restore HIGH-precision reported scores before repairs land, so the
        # exact-repair rows keep their bit-exact top_k output untouched.
        scores, idx = _rescore_topk(queries, corpus, scores, idx,
                                    precision=precision)
    bad = np.flatnonzero(~np.asarray(ok))
    if bad.size:
        m = queries.shape[0]
        fix_block = min(query_block, ((bad.size + 127) // 128) * 128)
        for start in range(0, bad.size, fix_block):
            chunk = bad[start:start + fix_block]
            rows = np.full((fix_block,), m, np.int32)  # m = dropped pad
            rows[: chunk.size] = chunk
            rows_dev = jnp.asarray(rows)
            fix_s, fix_i = _exact_rows_fix(queries, corpus, n_valid, rows_dev,
                                           k, precision=precision)
            scores, idx = _scatter_fix(scores, idx, rows_dev, fix_s, fix_i)
    return scores, idx


def topk_cosine(embeddings: Array, k: int, query_block: int = 1024,
                precision=_SIM_PRECISION, method: str = "auto",
                exact_above: Optional[float] = None,
                recall_target: Optional[float] = None):
    """Self-search: (N, D) embeddings -> (scores (N, k), indices (N, k))."""
    return topk_search(embeddings, embeddings, k, query_block=query_block,
                       precision=precision, method=method,
                       exact_above=exact_above, recall_target=recall_target)


_RING_CACHE: dict = {}


def _tile_topk(sims: Array, local_k: int, method: str, recall: float,
               thr: Optional[float], eps: float = _BF16_DOT_EPS):
    """Per-tile candidate selection shared by both sharded paths: exact
    lax.top_k, or approx_max_k (TPU PartialReduce) + the same per-row
    exactness certificate as `_certified_search`. Returns (s, j, ok); a row
    with ok=True has candidates that are PROVABLY its exact local
    top-local_k (strict) or complete above `thr` (thresholded) for THIS
    tile — so the AND over tiles certifies the merged global result.

    method='certified-bf16' (caller computed `sims` at Precision.DEFAULT):
    the threshold certificate widens by _BF16_DOT_EPS so true-similarity
    >= thr items still clear the noisy count, and the strict fallback is
    dropped (unverifiable from noisy scores — those rows go to exact
    repair). The caller must re-score the candidates at HIGH against its
    resident tile before merging."""
    if method == "exact":
        s, j = _wide_topk(sims, local_k)
        return s, j, jnp.ones(sims.shape[:1], bool)
    s, j = jax.lax.approx_max_k(sims, local_k, recall_target=recall)
    if method == "certified-bf16":
        # eps: _BF16_DOT_EPS for f32 inputs rounded by the bf16 matmul;
        # the tighter _BF16_STORE_EPS when the operands are bf16-RESIDENT
        # (already exactly representable — no input-rounding term)
        thr_eff = thr - eps
        # NB comparison dtype: a weakly-typed Python float compares in the
        # ARRAY's dtype, so `>= thr_eff` rounds thr_eff to bf16. Sound
        # because sims values lie ON the bf16 grid: no grid point falls
        # strictly between thr_eff and round-to-nearest(thr_eff), so
        # {x_grid >= round(t)} == {x_grid >= t} — the rounded comparison
        # selects exactly the same set. The argument needs grid-valued
        # operands: reusing this pattern where the compared values are NOT
        # bf16 (or casting sims to f32 first) would silently narrow the
        # widened certificate below the proven _BF16_DOT_EPS bound. s
        # elements are exact copies of sims elements (the caller's
        # barrier'd buffer), so both counts see identical values.
        n_thr = jnp.sum(sims >= thr_eff, axis=1)
        ok = (n_thr == jnp.sum(s >= thr_eff, axis=1)) & (n_thr < local_k)
        return s, j, ok
    s_k = s[:, local_k - 1]
    strict = (jnp.sum(sims > s_k[:, None], axis=1)
              == jnp.sum(s > s_k[:, None], axis=1))
    if thr is None:
        ok = strict
    else:
        n_thr = jnp.sum(sims >= thr, axis=1)
        ok = ((n_thr == jnp.sum(s >= thr, axis=1))
              & ((n_thr < local_k) | strict))
    return s, j, ok


def _ring_topk(mesh: Mesh, axis_name: str, n_pad: int, dim: int,
               kk: int, local_k: int, query_block: int,
               precision=jax.lax.Precision.HIGH, method: str = "exact",
               recall: float = 0.95, thr: Optional[float] = None):
    """Build (or fetch) the compiled ring-top-k program for these shapes."""
    key = (mesh, axis_name, n_pad, dim, kk, local_k, query_block, precision,
           method, recall, thr)
    if key in _RING_CACHE:
        return _RING_CACHE[key]

    d = mesh.shape[axis_name]
    shard_rows = n_pad // d
    perm = [(i, (i + 1) % d) for i in range(d)]
    lowp = method == "certified-bf16"

    def local_fn(shard, n_valid):
        # shard: (shard_rows, D) — this device's query rows AND the corpus
        # tile it contributes to the ring. n_valid: () replicated.
        # dtype-dependent choices happen at TRACE time from the shard (jit
        # retraces on dtype change, so the shape-keyed _RING_CACHE stays
        # correct across f32/bf16-resident corpora).
        resident_bf16 = shard.dtype == jnp.bfloat16
        sim_precision = (jax.lax.Precision.DEFAULT if lowp
                         else _dot_precision(shard.dtype, precision))
        eps = _BF16_STORE_EPS if resident_bf16 else _BF16_DOT_EPS
        my = jax.lax.axis_index(axis_name)
        q_blocks = shard.reshape(shard_rows // query_block, query_block, dim)

        def tile_topk(t, tile):
            # after t rotations (i -> i+1) this device holds the tile that
            # started on device (my - t) mod d.
            offset = ((my - t) % d) * shard_rows
            col_idx = offset + jnp.arange(shard_rows, dtype=jnp.int32)
            col_valid = col_idx < n_valid

            tile_rnorm = _row_rnorm(tile) if resident_bf16 else None

            def block_fn(qb):
                # lowp: bf16-materialized sims (the per-tile certificate
                # count defeats matmul+reduce fusion; see _certified_search);
                # bf16-resident tiles rescale to the cosine domain with
                # exact f32 norms BEFORE any bf16 storage (see _row_rnorm)
                if resident_bf16:
                    sims = jnp.dot(qb, tile.T, precision=sim_precision,
                                   preferred_element_type=jnp.float32)
                    sims = (sims * tile_rnorm[None, :]
                            * _row_rnorm(qb)[:, None])
                    if lowp:
                        sims = sims.astype(jnp.bfloat16)
                else:
                    sims = jnp.dot(
                        qb, tile.T,
                        precision=sim_precision,
                        preferred_element_type=(jnp.bfloat16 if lowp
                                                else jnp.float32),
                    )
                sims = jnp.where(col_valid[None, :], sims,
                                 jnp.asarray(_NEG, sims.dtype))
                if lowp or resident_bf16:
                    # single materialization; see _certified_search
                    sims = jax.lax.optimization_barrier(sims)
                s, j, row_ok = _tile_topk(sims, local_k, method, recall,
                                          thr, eps=eps)
                if lowp:
                    # re-score the local_k candidates at HIGH against the
                    # RESIDENT tile (local gather upcast AFTER the take —
                    # only (block, local_k, D) rows ever become f32) so
                    # the ring merges and reports HIGH-contract scores.
                    cand = jnp.take(tile, j, axis=0,
                                    mode="clip").astype(jnp.float32)
                    hi = jnp.einsum("md,mkd->mk", qb.astype(jnp.float32),
                                    cand, precision=precision,
                                    preferred_element_type=jnp.float32)
                    if resident_bf16:  # cosine domain in the merge too
                        cn2 = jnp.sum(cand * cand, axis=-1)
                        crn = jnp.where(cn2 > 0, jax.lax.rsqrt(cn2), 0.0)
                        hi = hi * crn * _row_rnorm(qb)[:, None]
                    s = jnp.where(jnp.isneginf(s), _NEG, hi)
                return s, col_idx[j], row_ok

            s, i, ok = jax.lax.map(block_fn, q_blocks)
            return (s.reshape(shard_rows, local_k),
                    i.reshape(shard_rows, local_k),
                    ok.reshape(shard_rows))

        # step 0 unrolled: seed the running top-k from the resident tile
        # instead of merging against a -inf carry — that merge is a pure
        # (shard_rows, kk+local_k) top_k pass of overhead, and at d=1 it
        # was the whole gap between the ring and single-chip rates.
        s0, i0, ok0 = tile_topk(0, shard)
        if kk > local_k:  # k > shard_rows: widen the carry with -inf slots
            s0 = jnp.pad(s0, ((0, 0), (0, kk - local_k)),
                         constant_values=_NEG)
            i0 = jnp.pad(i0, ((0, 0), (0, kk - local_k)))
        if d == 1:
            if lowp:  # rescored rows are not sorted; d>1 merges sort anyway
                s0, pos = jax.lax.top_k(s0, kk)
                i0 = jnp.take_along_axis(i0, pos, axis=1)
            return s0, i0, ok0

        def step(t, carry):
            scores, idx, ok, tile = carry
            s_new, i_new, ok_new = tile_topk(t, tile)
            s_cat = jnp.concatenate([scores, s_new], axis=1)
            i_cat = jnp.concatenate([idx, i_new], axis=1)
            s_top, pos = jax.lax.top_k(s_cat, kk)
            i_top = jnp.take_along_axis(i_cat, pos, axis=1)
            tile = jax.lax.ppermute(tile, axis_name, perm)
            return (s_top, i_top, ok & ok_new, tile)

        init = (s0, i0, ok0, jax.lax.ppermute(shard, axis_name, perm))
        scores, idx, ok, _ = jax.lax.fori_loop(1, d, step, init)
        return scores, idx, ok

    from jax import shard_map

    fn = jax.jit(shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=(P(axis_name, None), P(axis_name, None), P(axis_name)),
        check_vma=False,
    ))
    _RING_CACHE[key] = fn
    return fn


def _replicate_for_host(mesh: Mesh, *arrays):
    """Re-layout sharded outputs to fully-replicated under a MULTI-PROCESS
    mesh: the host-side logic that follows (np.asarray of the certificate
    vector, fancy-indexed repair scatters, returning results every host can
    read) requires fully-addressable arrays, and a P('corpus')-sharded
    global array spans non-addressable devices on every other host. One
    all-gather over DCN; no-op (returns inputs) in a single process."""
    if jax.process_count() == 1:
        return arrays if len(arrays) > 1 else arrays[0]
    out = _replicate_jit(mesh, len(arrays))(*arrays)
    return out if len(arrays) > 1 else out[0]


@lru_cache(maxsize=None)
def _replicate_jit(mesh: Mesh, n_arrays: int):
    """One cached jitted identity per (mesh, arity): a fresh jax.jit(lambda)
    per call would defeat the function-identity jit cache and re-trace the
    all-gather on every search of a repeated-search workload."""
    from jax.sharding import NamedSharding

    repl = NamedSharding(mesh, P())
    return jax.jit(lambda *xs: xs,
                   out_shardings=tuple(repl for _ in range(n_arrays)))


def _resolve_sharded_method(method: str, shard_rows: int, local_k: int,
                            exact_above, recall_target):
    """Shared auto rule: certified when the PER-SHARD sort width is large
    enough for the sort to dominate (same 16k knee as topk_search — the
    certificate trick only pays when lax.top_k over the tile is the
    bottleneck) and we're on a TPU backend."""
    if recall_target is None:
        recall_target = 0.99 if exact_above is None else 0.95
    if method == "auto":
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        if on_tpu and shard_rows >= 16384 and local_k < shard_rows:
            method = "certified" if exact_above is None else "certified-bf16"
        else:
            method = "exact"
    if method == "certified-bf16" and exact_above is None:
        raise ValueError(
            "method='certified-bf16' needs exact_above: the widened "
            "certificate is threshold-only")
    if method not in ("exact", "certified", "certified-bf16"):
        raise ValueError(f"unknown top-k method {method!r}")
    return method, recall_target


def sharded_topk_cosine(
    embeddings: Array,
    k: int,
    mesh: Optional[Mesh] = None,
    axis_name: str = "corpus",
    query_block: int = 1024,
    precision=jax.lax.Precision.HIGH,
    method: str = "auto",
    exact_above: Optional[float] = None,
    recall_target: Optional[float] = None,
):
    """Ring-sharded top-k over a device mesh (BASELINE config #5).

    Queries and corpus are the same (N, D) matrix, sharded over the mesh;
    corpus tiles rotate around the ring while each device maintains a running
    top-k for its own query rows. Padded rows are masked to -inf so they can
    never enter a top-k. Returns (scores (N,k), indices (N,k)) in global
    corpus coordinates.

    method="certified" (the TPU auto default at scale) runs each ring step's
    tile selection as approx_max_k + the per-(row, tile) exactness
    certificate from `topk_search`; a row is certified iff EVERY tile it met
    was certified, and the few failing rows are repaired by an exact
    corpus-sharded pass over the already-resident ring corpus — results stay
    exact (strict) / grouping-complete (`exact_above` set) at approx speed,
    now on the multi-chip path too. Reference workload:
    fingerprint.py:515-548.

    Dispatch duration: the ring is ONE program of N^2/d cells per device
    (the axon worker kills executions past ~1 min — see _DISPATCH_CELLS).
    It is not query-slabbed like `topk_search`: scale past ~1-2M rows per
    certified-bf16 device-dispatch by adding devices (duration shrinks
    ~d^2: 1/d queries x the same rotating tiles), or slab on the caller
    side via `sharded_topk_search` over a `stage_sharded_corpus` result.
    """
    if mesh is None:
        from video_fingerprint_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name)
    d = mesh.shape[axis_name]
    n, dim = embeddings.shape
    # clamp the query tile so tiny corpora don't pad to d*query_block rows
    per_shard = (n + d - 1) // d
    query_block = min(query_block, ((per_shard + 7) // 8) * 8)
    corpus, n_pad = _pad_rows(_compute_cast(embeddings), d * query_block)
    if not (hasattr(corpus, "sharding")
            and getattr(corpus.sharding, "mesh", None) == mesh):
        # Stage the padded corpus row-sharded ONCE, up front: the ring
        # program needs it in this layout anyway, and the repair branch
        # below re-feeds it (its device_put is then a true no-op instead of
        # an O(N·D) reshard copy per repaired search).
        from jax.sharding import NamedSharding

        sh = NamedSharding(mesh, P(axis_name, None))
        if jax.process_count() > 1:
            # cross-process placement needs the host value (a local
            # committed array cannot be auto-resharded onto a global mesh)
            corpus = jax.device_put(np.asarray(corpus), sh)
        else:
            corpus = jax.device_put(corpus, sh)  # device-to-device
    shard_rows = n_pad // d

    local_k = min(k, shard_rows)
    kk = min(k, d * local_k)
    method, recall_target = _resolve_sharded_method(
        method, shard_rows, local_k, exact_above, recall_target)
    fn = _ring_topk(mesh, axis_name, n_pad, dim, kk, local_k, query_block,
                    precision, method=method, recall=recall_target,
                    thr=exact_above)
    scores, idx, ok = fn(corpus, jnp.asarray(n, jnp.int32))
    scores, idx, ok = _replicate_for_host(mesh, scores, idx, ok)
    scores, idx = scores[:n], idx[:n]
    if method in ("certified", "certified-bf16"):
        bad = np.flatnonzero(~np.asarray(ok)[:n])
        if bad.size:
            # exact repair against the ring's own padded corpus, row-sharded
            # in place (device_put with the matching sharding is a no-op for
            # the already-placed output-committed array).
            from jax.sharding import NamedSharding

            staged = (jax.device_put(
                corpus, NamedSharding(mesh, P(axis_name, None))), n)
            fix_s, fix_i = sharded_topk_search(
                np.asarray(embeddings, np.float32)[bad], staged, kk,
                mesh=mesh, axis_name=axis_name, query_block=query_block,
                precision=precision, method="exact")
            scores = scores.at[bad].set(fix_s)
            idx = idx.at[bad].set(fix_i)
    return scores, idx


_SHARDED_SEARCH_CACHE: dict = {}


def stage_sharded_corpus(corpus, mesh: Mesh, axis_name: str = "corpus",
                         dtype=None):
    """Pad the corpus on HOST and place it row-sharded over the mesh — the
    full matrix is never materialized on a single device, so per-device
    memory really is O(N/d·D). Returns (device_array, n_true); pass the
    tuple to `sharded_topk_search` to reuse the staged corpus across
    searches. dtype="bf16" quantizes on host first — half the per-device
    residency and transfer; see stage_padded_corpus for the contract."""
    from jax.sharding import NamedSharding

    d = mesh.shape[axis_name]
    if dtype in ("bf16", "bfloat16", jnp.bfloat16):
        import ml_dtypes

        corpus = np.asarray(corpus).astype(ml_dtypes.bfloat16)
    else:
        corpus = np.asarray(corpus, np.float32)
    n = corpus.shape[0]
    # bucket rows like topk_search so index growth reuses compiled shapes
    per_shard = max(8, ((-(-_bucket_rows(n) // d) + 7) // 8) * 8)
    n_pad = d * per_shard
    if n_pad != n:
        corpus = np.pad(corpus, ((0, n_pad - n), (0, 0)))
    placed = jax.device_put(corpus, NamedSharding(mesh, P(axis_name, None)))
    return placed, n


def sharded_topk_search(
    queries: Array,
    corpus: Array,
    k: int,
    mesh: Optional[Mesh] = None,
    axis_name: str = "corpus",
    query_block: int = 1024,
    precision=jax.lax.Precision.HIGH,
    method: str = "auto",
    exact_above: Optional[float] = None,
    recall_target: Optional[float] = None,
):
    """Corpus-sharded query-vs-corpus k-NN (the `--against` /
    `FingerprintIndex.search` workload past one chip's HBM; complements
    `sharded_topk_cosine`, which handles the self-search dedup case).

    The (N, D) corpus shards over the mesh axis; the (M, D) queries
    replicate. Each device computes its query-tiled local top-k with GLOBAL
    column ids (shard offset from `axis_index`), the per-device candidate
    lists concatenate along the sharded output axis — an all-gather of
    O(M·k_local·d) scores+ids, never the corpus — and one final `lax.top_k`
    merges. Per-device memory O(N/d·D + M·k). Returns
    (scores (M, k), indices (M, k)) in corpus coordinates, identical to
    `topk_search(method="exact")`. Reference workload:
    fingerprint.py:515-548 (FAISS query path).

    method="certified" (the TPU auto default once the per-shard width passes
    the sort knee) replaces each shard's lax.top_k with approx_max_k + the
    per-row exactness certificate from `topk_search`; a row is certified iff
    every shard certified it, and failing rows are repaired by an exact pass
    over the SAME staged corpus — results stay exact (or, with
    `exact_above`, grouping-complete above that threshold) at approx speed.

    `corpus` may be an (N, D) host array (staged row-sharded via
    `stage_sharded_corpus` — the full matrix never lands on one device) or
    the (device_array, n) tuple that function returns, so repeated searches
    against a static corpus skip re-staging.
    """
    if mesh is None:
        from video_fingerprint_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name)
    d = mesh.shape[axis_name]
    m = queries.shape[0]
    if m == 0:
        return (np.zeros((0, k), np.float32), np.zeros((0, k), np.int32))
    if isinstance(corpus, tuple):
        corpus_pad, n = corpus  # prepared by stage_sharded_corpus
    else:
        corpus_pad, n = stage_sharded_corpus(corpus, mesh, axis_name)
    n_pad = corpus_pad.shape[0]
    dim = corpus_pad.shape[1]
    shard_rows = n_pad // d
    # pow2 bucket: query counts vary scan-to-scan, and every distinct padded
    # shape is a fresh (minutes-long, on the dev tunnel) XLA compile — this
    # bounds the shape set to {8, 16, ..., query_block}.
    q_block = min(query_block,
                  int(2 ** np.ceil(np.log2(max(m, 8)))))
    # queries follow the corpus storage dtype: a mixed bf16xf32 dot would
    # promote — and materialize — the full shard in f32 (see _compute_cast)
    q_dt = (jnp.bfloat16 if corpus_pad.dtype == jnp.bfloat16
            else jnp.float32)
    q_pad, m_pad = _pad_rows(jnp.asarray(queries, q_dt), q_block)
    if jax.process_count() > 1:
        # multi-process: queries must be a replicated GLOBAL array (the
        # local jnp.asarray commit cannot be auto-resharded across hosts)
        from jax.sharding import NamedSharding

        q_pad = jax.device_put(np.asarray(q_pad), NamedSharding(mesh, P()))
    local_k = min(k, shard_rows)
    method, recall_target = _resolve_sharded_method(
        method, shard_rows, local_k, exact_above, recall_target)

    key = (mesh, axis_name, m_pad, n_pad, dim, k, local_k, q_block, precision,
           method, recall_target, exact_above)
    fn = _SHARDED_SEARCH_CACHE.get(key)
    if fn is None:
        lowp = method == "certified-bf16"

        def local_fn(q, shard, n_valid):
            # dtype-dependent choices are made at TRACE time from the shard
            # (jit retraces on dtype change, so the shape-keyed fn cache
            # stays correct across f32/bf16-resident corpora)
            resident_bf16 = shard.dtype == jnp.bfloat16
            sim_precision = (jax.lax.Precision.DEFAULT if lowp
                             else _dot_precision(shard.dtype, precision))
            eps = _BF16_STORE_EPS if resident_bf16 else _BF16_DOT_EPS
            my = jax.lax.axis_index(axis_name)
            offset = my * shard_rows
            col_idx = offset + jnp.arange(shard_rows, dtype=jnp.int32)
            col_valid = col_idx < n_valid
            q_blocks = q.reshape(m_pad // q_block, q_block, dim)
            rnorm = _row_rnorm(shard) if resident_bf16 else None

            def block_fn(qb):
                # lowp: bf16-materialized sims (see _certified_search);
                # bf16-resident shards rescale to the cosine domain with
                # exact f32 norms BEFORE any bf16 storage (see _row_rnorm)
                if resident_bf16:
                    sims = jnp.dot(qb, shard.T, precision=sim_precision,
                                   preferred_element_type=jnp.float32)
                    sims = sims * rnorm[None, :] * _row_rnorm(qb)[:, None]
                    if lowp:
                        sims = sims.astype(jnp.bfloat16)
                else:
                    sims = jnp.dot(qb, shard.T, precision=sim_precision,
                                   preferred_element_type=(
                                       jnp.bfloat16 if lowp
                                       else jnp.float32))
                sims = jnp.where(col_valid[None, :], sims,
                                 jnp.asarray(_NEG, sims.dtype))
                if lowp or resident_bf16:
                    # single materialization; see _certified_search
                    sims = jax.lax.optimization_barrier(sims)
                s, j, row_ok = _tile_topk(sims, local_k, method,
                                          recall_target, exact_above,
                                          eps=eps)
                if lowp:
                    # HIGH rescore against the resident shard (local gather
                    # upcast AFTER the take — only (q_block, k, D) rows ever
                    # become f32) so the global merge sees HIGH-contract
                    # scores.
                    cand = jnp.take(shard, j, axis=0,
                                    mode="clip").astype(jnp.float32)
                    hi = jnp.einsum("md,mkd->mk", qb.astype(jnp.float32),
                                    cand, precision=precision,
                                    preferred_element_type=jnp.float32)
                    if resident_bf16:  # cosine domain in the merge too
                        cn2 = jnp.sum(cand * cand, axis=-1)
                        crn = jnp.where(cn2 > 0, jax.lax.rsqrt(cn2), 0.0)
                        hi = hi * crn * _row_rnorm(qb)[:, None]
                    s = jnp.where(jnp.isneginf(s), _NEG, hi)
                return s, col_idx[j], row_ok

            s, i, ok = jax.lax.map(block_fn, q_blocks)
            return (s.reshape(m_pad, local_k), i.reshape(m_pad, local_k),
                    ok.reshape(m_pad, 1))

        from jax import shard_map

        inner = jax.jit(shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(axis_name, None), P()),
            out_specs=(P(None, axis_name), P(None, axis_name),
                       P(None, axis_name)),
            check_vma=False,
        ))

        def fn(q, c, n_valid):
            s_all, i_all, ok_all = inner(q, c, n_valid)  # (m_pad, d*local_k)
            s_top, pos = jax.lax.top_k(s_all, min(k, d * local_k))
            return (s_top, jnp.take_along_axis(i_all, pos, axis=1),
                    ok_all.all(axis=1))

        _SHARDED_SEARCH_CACHE[key] = fn
    scores, idx, ok = fn(q_pad, corpus_pad, jnp.asarray(n, jnp.int32))
    scores, idx, ok = _replicate_for_host(mesh, scores, idx, ok)
    scores, idx = scores[:m], idx[:m]
    if method in ("certified", "certified-bf16"):
        bad = np.flatnonzero(~np.asarray(ok)[:m])
        if bad.size:
            fix_s, fix_i = sharded_topk_search(
                np.asarray(queries, np.float32)[bad], (corpus_pad, n),
                k, mesh=mesh, axis_name=axis_name, query_block=query_block,
                precision=precision, method="exact")
            scores = scores.at[bad].set(fix_s)
            idx = idx.at[bad].set(fix_i)
    return scores, idx
