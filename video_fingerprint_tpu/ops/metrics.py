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


@partial(jax.jit, static_argnames=("thresholds", "kmax"))
def _metrics_block(
    emb_block: Array,       # (b, D) this block's rows
    ids_block: Array,       # (b,)
    row_valid: Array,       # (b,) bool — False for wraparound pad rows
    embeddings: Array,      # (N, D) full corpus
    video_ids: Array,       # (N,)
    sorted_intra: Array,    # (P,) ascending intra-pair sims, -inf padded
    row_offset: Array,      # scalar: global index of this block's first row
    thresholds,
    kmax: int,
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
    _, top_idx = jax.lax.top_k(sims_noself, kmax)
    top_same = jnp.take_along_axis(same & ~eye, top_idx, axis=1)
    rv = row_valid.astype(jnp.float32)
    for k in range(1, kmax + 1):
        out[f"rhits@{k}"] = jnp.sum(
            jnp.any(top_same[:, :k], axis=1).astype(jnp.float32) * rv
        )
    order = jnp.argsort(-sims_noself, axis=1)
    pos_sorted = jnp.take_along_axis(same, order, axis=1).astype(jnp.float32)
    ranks = jnp.arange(1, n + 1, dtype=jnp.float32)[None, :]
    cum_pos = jnp.cumsum(pos_sorted, axis=1)
    row_pos = jnp.sum(pos_sorted, axis=1)
    ap = jnp.sum((cum_pos / ranks) * pos_sorted, axis=1) / jnp.maximum(row_pos, 1.0)
    out["ap_sum"] = jnp.sum(ap * rv)
    out["n_rows"] = jnp.sum(rv)

    # AUC rank-sum: for every inter sim v of this block, count intra sims
    # above/equal via searchsorted into the presorted intra values. Masked
    # entries sit at +inf (above every real value -> zero contribution);
    # -inf intra pads are <= every finite v, cancelling in (P - right).
    v = jnp.where(inter > 0, sims, jnp.inf).reshape(-1)
    right = jnp.searchsorted(sorted_intra, v, side="right")
    left = jnp.searchsorted(sorted_intra, v, side="left")
    P = sorted_intra.shape[0]
    out["auc_num"] = jnp.sum(
        (P - right).astype(jnp.float32) + 0.5 * (right - left).astype(jnp.float32)
    )
    return out


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
    Returns plain floats. One XLA program total (pad rows -> fixed block)."""
    embeddings = np.asarray(embeddings, np.float32)
    ids = np.asarray(video_ids)
    n = embeddings.shape[0]
    b = min(block_rows, n)
    sorted_intra = jnp.asarray(_intra_pair_sims(embeddings, ids))
    kmax = min(max(k_values), n - 1)

    emb_dev = jnp.asarray(embeddings)
    ids_dev = jnp.asarray(ids)
    acc: Dict[str, float] = {}
    for start in range(0, n, b):
        rows = np.arange(start, start + b)
        valid = rows < n
        rows = np.minimum(rows, n - 1)
        out = _metrics_block(
            emb_dev[rows], ids_dev[rows], jnp.asarray(valid),
            emb_dev, ids_dev, sorted_intra, jnp.asarray(start),
            tuple(thresholds), kmax,
        )
        for key, val in out.items():
            acc[key] = acc.get(key, 0.0) + float(val)

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
