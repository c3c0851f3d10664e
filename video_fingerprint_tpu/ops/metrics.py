"""Validation metrics (C20) as static-shape jnp — no sklearn, no host loops.

Reference behaviours reproduced:
  - discrimination metrics: intra/inter similarity mean/std, separation gap,
    precision/recall/F1/FPR at thresholds (train.py:286-358);
  - AUC-ROC: exact tie-corrected Mann-Whitney statistic (equivalent to
    sklearn.roc_auc_score's trapezoidal value) computed from masked weights —
    boolean fancy-indexing would produce dynamic shapes, so everything is a
    masked reduction;
  - retrieval: R@{1,5,10} and mAP from all-pairs similarities
    (train.py:439-481).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from video_fingerprint_tpu.ops.topk import _wide_topk

Array = jax.Array


def _pairwise_sims(embeddings: Array) -> Array:
    e = embeddings.astype(jnp.float32)
    return jnp.dot(e, e.T, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def weighted_auc(scores: Array, w_pos: Array, w_neg: Array) -> Array:
    """AUC = P(pos>neg) + 0.5 P(pos==neg) over weighted samples.

    scores: (M,) values; w_pos/w_neg: (M,) nonnegative weights. Static shapes:
    sort once, cumulative negative weight below/at each value via searchsorted.
    """
    order = jnp.argsort(scores)
    s_sorted = scores[order]
    wneg_sorted = w_neg[order]
    cum_neg = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(wneg_sorted)])
    lo = jnp.searchsorted(s_sorted, scores, side="left")
    hi = jnp.searchsorted(s_sorted, scores, side="right")
    neg_below = cum_neg[lo]
    neg_equal = cum_neg[hi] - cum_neg[lo]
    n_pos = jnp.sum(w_pos)
    n_neg = jnp.sum(w_neg)
    num = jnp.sum(w_pos * (neg_below + 0.5 * neg_equal))
    return jnp.where((n_pos > 0) & (n_neg > 0), num / (n_pos * n_neg), 0.5)


@partial(jax.jit, static_argnames=("thresholds",))
def discrimination_metrics(
    embeddings: Array,
    video_ids: Array,
    thresholds: Sequence[float] = (0.7, 0.8, 0.85, 0.9),
) -> Dict[str, Array]:
    sims = _pairwise_sims(embeddings)
    n = embeddings.shape[0]
    same = video_ids[:, None] == video_ids[None, :]
    eye = jnp.eye(n, dtype=bool)
    intra = (same & ~eye).astype(jnp.float32)
    inter = (~same & ~eye).astype(jnp.float32)

    n_intra = jnp.sum(intra)
    n_inter = jnp.sum(inter)

    def masked_mean_std(w):
        cnt = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(sims * w) / cnt
        var = jnp.sum(jnp.square(sims - mean) * w) / cnt
        return mean, jnp.sqrt(jnp.maximum(var, 0.0))

    intra_mean, intra_std = masked_mean_std(intra)
    inter_mean, inter_std = masked_mean_std(inter)

    metrics: Dict[str, Array] = {
        "intra_sim_mean": jnp.where(n_intra > 0, intra_mean, 0.0),
        "intra_sim_std": jnp.where(n_intra > 0, intra_std, 0.0),
        "inter_sim_mean": jnp.where(n_inter > 0, inter_mean, 0.0),
        "inter_sim_std": jnp.where(n_inter > 0, inter_std, 0.0),
    }
    metrics["separation_gap"] = jnp.where(
        (n_intra > 0) & (n_inter > 0), intra_mean - inter_mean, 0.0
    )

    for t in thresholds:
        hit = (sims >= t).astype(jnp.float32)
        tp = jnp.sum(hit * intra)
        fp = jnp.sum(hit * inter)
        fn = jnp.sum((1 - hit) * intra)
        tn = jnp.sum((1 - hit) * inter)
        precision = jnp.where(tp + fp > 0, tp / jnp.maximum(tp + fp, 1.0), 0.0)
        recall = jnp.where(tp + fn > 0, tp / jnp.maximum(tp + fn, 1.0), 0.0)
        f1 = jnp.where(
            precision + recall > 0,
            2 * precision * recall / jnp.maximum(precision + recall, 1e-12),
            0.0,
        )
        metrics[f"precision@{t:.2f}"] = precision
        metrics[f"recall@{t:.2f}"] = recall
        metrics[f"f1@{t:.2f}"] = f1
        metrics[f"fpr@{t:.2f}"] = jnp.where(
            fp + tn > 0, fp / jnp.maximum(fp + tn, 1.0), 0.0
        )

    metrics["auc_roc"] = weighted_auc(
        sims.reshape(-1), intra.reshape(-1), inter.reshape(-1)
    )
    return metrics


@partial(jax.jit, static_argnames=("thresholds", "kmax", "pmax"))
def _metrics_block(
    emb_block: Array,       # (b, D) this block's rows
    ids_block: Array,       # (b,)
    row_valid: Array,       # (b,) bool — False for wraparound pad rows
    embeddings: Array,      # (N, D) full corpus
    video_ids: Array,       # (N,)
    sorted_intra,           # _count_tables(...) of the ascending intra sims
    row_offset: Array,      # scalar: global index of this block's first row
    thresholds,
    kmax: int,
    pmax: int = 0,          # max positives/row (incl. self); 0 = argsort mAP
) -> Dict[str, Array]:
    """One row block of the streaming metrics: every pairwise statistic this
    block's rows contribute, with O(b*N) memory."""
    b = emb_block.shape[0]
    n = embeddings.shape[0]
    sims = jnp.dot(
        emb_block.astype(jnp.float32), embeddings.astype(jnp.float32).T,
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    cols = jnp.arange(n)[None, :]
    eye = cols == (row_offset + jnp.arange(b))[:, None]
    same = ids_block[:, None] == video_ids[None, :]
    valid = row_valid[:, None]
    intra = (same & ~eye & valid).astype(jnp.float32)
    inter = (~same & ~eye & valid).astype(jnp.float32)

    out: Dict[str, Array] = {
        "n_intra": jnp.sum(intra), "n_inter": jnp.sum(inter),
        "intra_sum": jnp.sum(sims * intra),
        "intra_sumsq": jnp.sum(jnp.square(sims) * intra),
        "inter_sum": jnp.sum(sims * inter),
        "inter_sumsq": jnp.sum(jnp.square(sims) * inter),
    }
    for t in thresholds:
        hit = (sims >= t).astype(jnp.float32)
        out[f"tp@{t}"] = jnp.sum(hit * intra)
        out[f"fp@{t}"] = jnp.sum(hit * inter)
        out[f"fn@{t}"] = jnp.sum((1 - hit) * intra)
        out[f"tn@{t}"] = jnp.sum((1 - hit) * inter)

    # retrieval: the block holds its FULL rows, so R@k and the reference-mAP
    # (self at -inf yet still a positive, see retrieval_metrics) are exact.
    sims_noself = jnp.where(eye, -jnp.inf, sims)
    # _wide_topk: the streaming block is (b, N)-wide — full-width lax.top_k
    # crashes the TPU worker at ~1M-wide rows (ops/topk.py postmortem)
    _, top_idx = _wide_topk(sims_noself, kmax)
    top_same = jnp.take_along_axis(same & ~eye, top_idx, axis=1)
    rv = row_valid.astype(jnp.float32)
    for k in range(1, kmax + 1):
        out[f"rhits@{k}"] = jnp.sum(
            jnp.any(top_same[:, :k], axis=1).astype(jnp.float32) * rv
        )
    row_pos = jnp.sum(same.astype(jnp.float32), axis=1)
    if pmax == 0:
        # full argsort mAP — exact for ANY group structure, but a TPU sort
        # over (b, N) costs ~seconds per block at N=100k. Kept as the
        # fallback for pathological corpora (a group spanning >pmax rows).
        order = jnp.argsort(-sims_noself, axis=1)
        pos_sorted = jnp.take_along_axis(same, order, axis=1).astype(jnp.float32)
        ranks = jnp.arange(1, n + 1, dtype=jnp.float32)[None, :]
        cum_pos = jnp.cumsum(pos_sorted, axis=1)
        ap = (jnp.sum((cum_pos / ranks) * pos_sorted, axis=1)
              / jnp.maximum(row_pos, 1.0))
    else:
        # count-based mAP: positives are sparse (<= pmax per row), and a
        # positive's rank in the stable descending sort is a pair of masked
        # reductions — no (b, N) sort at all. Position of column j in
        # jnp.argsort(-sims_noself) (stable => ties break by ascending
        # column index): count(s > s_j) + count(s == s_j & col < j).
        pos_val, pos_idx = _wide_topk(same.astype(jnp.float32), pmax)
        p_valid = pos_val > 0.5                      # (b, pmax) real positive?
        s_pos = jnp.take_along_axis(sims_noself, pos_idx, axis=1)
        gt = jnp.sum(sims_noself[:, None, :] > s_pos[:, :, None], axis=-1)
        eq_lo = jnp.sum(
            (sims_noself[:, None, :] == s_pos[:, :, None])
            & (cols[:, None, :] < pos_idx[:, :, None]),
            axis=-1,
        )
        position = gt + eq_lo                        # (b, pmax) 0-based
        # precision at j's rank = #positives ranked at or above j / rank_j
        at_or_above = jnp.sum(
            p_valid[:, None, :] & (position[:, :, None] >= position[:, None, :]),
            axis=-1,
        )
        terms = jnp.where(
            p_valid, at_or_above / (position + 1.0).astype(jnp.float32), 0.0
        )
        ap = jnp.sum(terms, axis=1) / jnp.maximum(row_pos, 1.0)
    out["ap_sum"] = jnp.sum(ap * rv)
    out["n_rows"] = jnp.sum(rv)

    # AUC rank-sum: for every inter sim v of this block, count intra sims
    # strictly above (P - count_le) and tied (count_le - count_lt) against
    # the presorted intra values. NOT jnp.searchsorted: its binary search is
    # ~19 dependent single-float gathers per key, measured 1.38 s/block at
    # (256, 20k) on v5e — the "no tiny gathers" rule again. _sorted_count
    # replaces it with broadcast compares + two WIDE contiguous row gathers.
    seg_rows, pivot_rows, supers, p_true = sorted_intra
    v = sims.reshape(-1)
    mask = inter.reshape(-1)
    # chunk the keys: the row gathers materialize (chunk, 128) intermediates,
    # which at a 100k corpus block (25.6M keys) would otherwise be ~13 GB.
    ch = min(131072, v.shape[0])
    pad = (-v.shape[0]) % ch
    v = jnp.pad(v, (0, pad))
    mask = jnp.pad(mask, (0, pad))

    def _chunk(args):
        vv, mm = args
        cle = _sorted_count(seg_rows, pivot_rows, supers, vv, strict=False)
        clt = _sorted_count(seg_rows, pivot_rows, supers, vv, strict=True)
        return jnp.sum(
            ((p_true - cle).astype(jnp.float32)
             + 0.5 * (cle - clt).astype(jnp.float32)) * mm
        )

    out["auc_num"] = jnp.sum(
        jax.lax.map(_chunk, (v.reshape(-1, ch), mask.reshape(-1, ch)))
    )
    return out


def _sorted_count(seg_rows: Array, pivot_rows: Array, supers: Array,
                  v: Array, strict: bool) -> Array:
    """count(vals <= v) (or < v when strict) per key against a sorted array,
    gather-free in the pathological sense: data-dependent indexing happens
    only as TWO contiguous row gathers (fan- and seg-wide — full VPU lanes),
    never as a per-key binary search.

    Tables (built by _count_tables): the sorted values padded with +inf and
    reshaped to (K1, seg) `seg_rows`; their per-segment minima padded and
    reshaped to (K0, fan) `pivot_rows`; those rows' minima `supers` (K0,).
    Correctness: with c1 = count(pivots cmp v), every element before segment
    c1-1 is <= its pivot (cmp v), every element from segment c1 on is >= the
    first non-matching pivot (not cmp v), so only segment c1-1 needs exact
    compares. +inf padding never satisfies cmp for finite v; keys at +inf
    return padded counts and must be masked by the caller."""
    cmp = (lambda t, x: t < x) if strict else (lambda t, x: t <= x)
    k0, fan = pivot_rows.shape
    k1, seg = seg_rows.shape

    c0 = jnp.sum(cmp(supers[None, :], v[:, None]), axis=1)
    j0 = jnp.clip(c0 - 1, 0, k0 - 1)
    rows0 = jnp.take(pivot_rows, j0, axis=0)              # (m, fan)
    c1 = jnp.where(c0 == 0, 0,
                   j0 * fan + jnp.sum(cmp(rows0, v[:, None]), axis=1))
    j1 = jnp.clip(c1 - 1, 0, k1 - 1)
    rows1 = jnp.take(seg_rows, j1, axis=0)                # (m, seg)
    cseg = jnp.sum(cmp(rows1, v[:, None]), axis=1)
    return jnp.where(c1 == 0, 0, (c1 - 1) * seg + cseg)


def _count_tables(sorted_vals: np.ndarray, seg: int = 128, fan: int = 128):
    """Device tables for _sorted_count. Shapes are padded to powers of two
    so different corpus sizes reuse compiled programs."""
    p = sorted_vals.shape[0]
    k1 = max(1, int(2 ** np.ceil(np.log2(max(1, -(-p // seg))))))
    padded = np.full((k1 * seg,), np.inf, np.float32)
    padded[:p] = sorted_vals
    seg_rows = padded.reshape(k1, seg)
    k0 = max(1, -(-k1 // fan))
    pivots = np.full((k0 * fan,), np.inf, np.float32)
    pivots[:k1] = seg_rows[:, 0]
    pivot_rows = pivots.reshape(k0, fan)
    supers = pivot_rows[:, 0].copy()
    return (jnp.asarray(seg_rows), jnp.asarray(pivot_rows),
            jnp.asarray(supers), p)


def _intra_pair_sims(embeddings: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """All ordered intra-pair similarities (i != j, same id), ascending,
    computed group-by-group — positives are sparse (a video contributes
    ~|group|^2 pairs and groups are tiny), so this is O(N * G^2) with no
    N x N anything. Padded entries are -inf (see _metrics_block)."""
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    boundaries = np.flatnonzero(np.diff(sorted_ids)) + 1
    groups = np.split(order, boundaries)
    vals = []
    for g in groups:
        if len(g) < 2:
            continue
        e = embeddings[g].astype(np.float32)
        s = e @ e.T
        vals.append(s[~np.eye(len(g), dtype=bool)])
    if not vals:
        return np.full((1,), -np.inf, np.float32)
    return np.sort(np.concatenate(vals)).astype(np.float32)


def streaming_validation_metrics(
    embeddings,
    video_ids,
    thresholds: Sequence[float] = (0.7, 0.8, 0.85, 0.9),
    k_values: Sequence[int] = (1, 5, 10),
    block_rows: int = 256,
) -> Dict[str, float]:
    """discrimination_metrics + retrieval_metrics with O(block_rows * N)
    device memory instead of the N x N similarity matrix (SURVEY.md §3.5:
    the reference materializes all-pairs, train.py:439-481, which is wrong at
    the 100k-corpus scale; VERDICT r2 #5). Every metric is EXACT, identical
    to the dense functions up to float summation order: R@k/mAP see full
    rows per block, moments/confusions are blocked sums, and AUC is the same
    tie-corrected Mann-Whitney statistic via rank-sums of inter sims against
    the sorted intra sims (positives are sparse: ~pair-count per video).
    Returns plain floats. One XLA program total (pad rows -> fixed block).

    mAP path selection: a positive's rank only needs masked comparison
    counts, not a sort (see _metrics_block pmax) — a (b, N) TPU argsort
    costs ~seconds per block at N=100k, turning the 100k validation into
    many minutes; the count-based path is exact for groups up to 256 rows
    (pmax, static per compile) and falls back to the argsort for corpora
    with a larger group."""
    embeddings = np.asarray(embeddings, np.float32)
    ids = np.asarray(video_ids)
    n = embeddings.shape[0]
    if n == 0:
        raise ValueError("streaming_validation_metrics needs >= 1 embedding")
    b = min(block_rows, n)
    sorted_intra = _count_tables(_intra_pair_sims(embeddings, ids))
    kmax = min(max(k_values), n - 1)
    # positives per row (incl. self) = the row's group size; pad to a bucket
    # so pmax doesn't recompile per corpus
    # unique+counts, NOT bincount: ids are dataset-provided and need not be
    # dense or non-negative (hash-derived ids would make bincount allocate
    # max(id)+1 counters or raise)
    group_max = int(np.unique(ids, return_counts=True)[1].max()) if n else 1
    pmax = 0 if group_max > 256 else min(
        n, int(2 ** int(np.ceil(np.log2(max(group_max, 4)))))
    )  # clamp to n: top_k over an n-wide axis cannot take k > n

    emb_dev = jnp.asarray(embeddings)
    ids_dev = jnp.asarray(ids)
    # keep every block's scalars ON DEVICE and fetch once at the end (each
    # tiny D2H through the dev tunnel costs ~15 ms; 30 keys x N/b blocks was
    # minutes of pure sync at N=100k) — but do the cross-block summation on
    # host in float64: counters reach ~1e10 at N=100k where f32 adds round
    # at ~6e-8 relative per block.
    block_outs = []
    for start in range(0, n, b):
        rows = np.arange(start, start + b)
        valid = rows < n
        rows = np.minimum(rows, n - 1)
        block_outs.append(_metrics_block(
            emb_dev[rows], ids_dev[rows], jnp.asarray(valid),
            emb_dev, ids_dev, sorted_intra, jnp.asarray(start),
            tuple(thresholds), kmax, pmax,
        ))
    stacked = jax.device_get({
        key: jnp.stack([o[key] for o in block_outs])
        for key in block_outs[0]
    })
    acc = {key: float(np.sum(np.asarray(v, np.float64)))
           for key, v in stacked.items()}

    n_intra, n_inter = acc["n_intra"], acc["n_inter"]

    def mean_std(total, total_sq, cnt):
        if cnt <= 0:
            return 0.0, 0.0
        mean = total / cnt
        var = max(total_sq / cnt - mean * mean, 0.0)
        return mean, var ** 0.5

    intra_mean, intra_std = mean_std(acc["intra_sum"], acc["intra_sumsq"], n_intra)
    inter_mean, inter_std = mean_std(acc["inter_sum"], acc["inter_sumsq"], n_inter)
    metrics: Dict[str, float] = {
        "intra_sim_mean": intra_mean, "intra_sim_std": intra_std,
        "inter_sim_mean": inter_mean, "inter_sim_std": inter_std,
        "separation_gap": (intra_mean - inter_mean)
        if (n_intra > 0 and n_inter > 0) else 0.0,
    }
    for t in thresholds:
        tp, fp = acc[f"tp@{t}"], acc[f"fp@{t}"]
        fn, tn = acc[f"fn@{t}"], acc[f"tn@{t}"]
        precision = tp / (tp + fp) if tp + fp > 0 else 0.0
        recall = tp / (tp + fn) if tp + fn > 0 else 0.0
        metrics[f"precision@{t:.2f}"] = precision
        metrics[f"recall@{t:.2f}"] = recall
        metrics[f"f1@{t:.2f}"] = (
            2 * precision * recall / (precision + recall)
            if precision + recall > 0 else 0.0
        )
        metrics[f"fpr@{t:.2f}"] = fp / (fp + tn) if fp + tn > 0 else 0.0
    metrics["auc_roc"] = (
        acc["auc_num"] / (n_intra * n_inter)
        if n_intra > 0 and n_inter > 0 else 0.5
    )
    for k in k_values:
        metrics[f"R@{k}"] = acc[f"rhits@{min(k, kmax)}"] / max(acc["n_rows"], 1.0)
    metrics["mAP"] = acc["ap_sum"] / max(acc["n_rows"], 1.0)
    return metrics


@partial(jax.jit, static_argnames=("k_values",))
def retrieval_metrics(
    embeddings: Array, video_ids: Array, k_values: Sequence[int] = (1, 5, 10)
) -> Dict[str, Array]:
    """R@k (any same-id in top-k, self excluded) and mAP (train.py:439-481).

    R@k for k > n_unique_videos - 1 is still computed here (static shapes);
    the host-side caller drops those keys like the reference does.
    """
    sims = _pairwise_sims(embeddings)
    n = embeddings.shape[0]
    eye = jnp.eye(n, dtype=bool)
    sims = jnp.where(eye, -jnp.inf, sims)
    same = (video_ids[:, None] == video_ids[None, :]) & ~eye

    metrics: Dict[str, Array] = {}
    kmax = min(max(k_values), n - 1)
    _, top_idx = jax.lax.top_k(sims, kmax)  # (n, kmax)
    top_same = jnp.take_along_axis(same, top_idx, axis=1)
    for k in k_values:
        kk = min(k, kmax)
        metrics[f"R@{k}"] = jnp.mean(jnp.any(top_same[:, :kk], axis=1).astype(jnp.float32))

    # mAP with the reference's exact semantics (train.py:466-479): self is
    # masked to -inf so it sorts last, but its id still matches, i.e. every
    # anchor has >= 1 "positive" (itself, at the worst rank) and the average
    # runs over ALL anchors. Reproduced as-is for metric comparability.
    order = jnp.argsort(-sims, axis=1)
    same_incl_self = video_ids[:, None] == video_ids[None, :]
    pos_sorted = jnp.take_along_axis(same_incl_self, order, axis=1).astype(jnp.float32)
    ranks = jnp.arange(1, n + 1, dtype=jnp.float32)[None, :]
    cum_pos = jnp.cumsum(pos_sorted, axis=1)
    precisions = cum_pos / ranks
    row_pos = jnp.sum(pos_sorted, axis=1)  # >= 1 always (self)
    ap = jnp.sum(precisions * pos_sorted, axis=1) / jnp.maximum(row_pos, 1.0)
    metrics["mAP"] = jnp.mean(ap)
    return metrics
