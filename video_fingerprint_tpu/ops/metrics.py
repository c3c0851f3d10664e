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
