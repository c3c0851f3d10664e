"""Contrastive + triplet losses as pure jnp functions over embeddings.

Semantics match the reference (value parity is tested against goldens from
tests/fixtures/loss_parity.npz) but the implementations are fully vectorized:
the reference's Python loop over the batch in `compute_triplet_loss`
(reference model.py:37-64) becomes masked matrix ops, which is what keeps the
whole train step inside one XLA program on TPU.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def pairwise_l2(embeddings: Array) -> Array:
    """All-pairs Euclidean distances, (B, D) -> (B, B).

    sqrt is guarded for autodiff at zero distance (identical embeddings occur
    when an extract equals its full video).
    """
    sq = jnp.sum(jnp.square(embeddings), axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (embeddings @ embeddings.T)
    return jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)


def triplet_loss(
    embeddings: Array, video_ids: Array, margin: float = 0.3
) -> tuple[Array, Array]:
    """Batch-hard triplet loss (reference model.py:8-71, vectorized).

    Per anchor: hardest (max-distance) positive and hardest (min-distance)
    negative; loss = relu(hp - hn + margin); the mean is taken over anchors
    whose loss is strictly positive (reference model.py:55-57, :66-69).

    Returns (loss, num_valid_triplets).
    """
    distances = pairwise_l2(embeddings)
    same = video_ids[:, None] == video_ids[None, :]
    eye = jnp.eye(embeddings.shape[0], dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same & ~eye

    has_pos = jnp.any(pos_mask, axis=1)
    has_neg = jnp.any(neg_mask, axis=1)

    big = jnp.asarray(jnp.finfo(distances.dtype).max, distances.dtype)
    hardest_pos = jnp.max(jnp.where(pos_mask, distances, -big), axis=1)
    hardest_neg = jnp.min(jnp.where(neg_mask, distances, big), axis=1)

    per_anchor = jnp.maximum(hardest_pos - hardest_neg + margin, 0.0)
    per_anchor = jnp.where(has_pos & has_neg, per_anchor, 0.0)
    valid = per_anchor > 0
    num_valid = jnp.sum(valid)
    loss = jnp.where(num_valid > 0, jnp.sum(per_anchor) / jnp.maximum(num_valid, 1), 0.0)
    return loss, num_valid


def _ce_diag(logits: Array) -> Array:
    """Cross-entropy with labels = arange(B) (diagonal positives)."""
    logz = jax.nn.logsumexp(logits, axis=1)
    diag = jnp.diagonal(logits)
    return jnp.mean(logz - diag)


def infonce_symmetric(emb_a: Array, emb_b: Array, temperature: Array) -> Array:
    """CE(A@Bᵀ/τ) + CE((A@Bᵀ/τ)ᵀ) — reference model.py:343-347."""
    logits = (emb_a @ emb_b.T) / temperature
    return _ce_diag(logits) + _ce_diag(logits.T)


def attention_contrastive_loss(
    emb_full_1: Array,
    emb_full_2: Array,
    emb_extract_1: Array,
    emb_extract_2: Array,
    temperature: Array,
    video_ids: Optional[Array] = None,
    use_triplet: bool = True,
    triplet_weight: float = 0.3,
    triplet_margin: float = 0.3,
) -> Dict[str, Array]:
    """Attention-model loss over precomputed embeddings (model.py:300-390).

    The reference forwards each random extract individually in a Python loop
    (model.py:325-341); here extraction happens in the (vectorized, masked)
    train step and this function only combines embeddings, so the whole thing
    lives in one pjit region.
    """
    loss_full = infonce_symmetric(emb_full_1, emb_full_2, temperature)
    # extract terms: one-directional CE each (model.py:349-353).
    loss_extract = _ce_diag((emb_extract_1 @ emb_full_1.T) / temperature) + _ce_diag(
        (emb_extract_2 @ emb_full_2.T) / temperature
    )
    loss_extract_cross = infonce_symmetric(emb_extract_1, emb_extract_2, temperature)

    total = loss_full + 0.5 * loss_extract + 0.3 * loss_extract_cross

    t_loss = jnp.asarray(0.0)
    n_triplets = jnp.asarray(0)
    if use_triplet and video_ids is not None:
        all_emb = jnp.concatenate(
            [emb_full_1, emb_full_2, emb_extract_1, emb_extract_2], axis=0
        )
        all_ids = jnp.concatenate([video_ids] * 4, axis=0)
        t_loss, n_triplets = triplet_loss(all_emb, all_ids, margin=triplet_margin)
        total = total + triplet_weight * t_loss

    return {
        "loss": total / (3.6 + triplet_weight),
        "loss_full": loss_full / 2,
        "loss_extract": loss_extract / 2,
        "loss_extract_cross": loss_extract_cross / 2,
        "loss_triplet": t_loss,
        "num_triplets": n_triplets,
        "temperature": temperature,
    }


def cnn3d_contrastive_loss(
    emb1: Array,
    emb2: Array,
    temperature: Array,
    video_ids: Optional[Array] = None,
    hard_negative_ratio: float = 0.3,
    use_triplet: bool = True,
    triplet_weight: float = 0.3,
    triplet_margin: float = 0.3,
) -> Dict[str, Array]:
    """3D-model loss: symmetric InfoNCE + hard-negative CE (model.py:514-582).

    `lax.top_k` is MXU/VPU-native on TPU; the index selection carries no
    gradient (matching the reference's no_grad index mining, model.py:541-548).
    """
    B = emb1.shape[0]
    logits = (emb1 @ emb2.T) / temperature
    loss_12 = _ce_diag(logits)
    loss_21 = _ce_diag(logits.T)

    eye = jnp.eye(B, dtype=bool)
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    neg_logits = jnp.where(eye, neg_inf, jax.lax.stop_gradient(logits))
    k = max(1, int(B * hard_negative_ratio))
    _, hard_idx = jax.lax.top_k(neg_logits, k)

    hard_logits = jnp.take_along_axis(logits, hard_idx, axis=1)
    pos_logits = jnp.diagonal(logits)[:, None]
    hard_all = jnp.concatenate([pos_logits, hard_logits], axis=1)
    hard_loss = jnp.mean(jax.nn.logsumexp(hard_all, axis=1) - hard_all[:, 0])

    total = (loss_12 + loss_21) / 2 + 0.5 * hard_loss

    t_loss = jnp.asarray(0.0)
    n_triplets = jnp.asarray(0)
    if use_triplet and video_ids is not None:
        all_emb = jnp.concatenate([emb1, emb2], axis=0)
        all_ids = jnp.concatenate([video_ids, video_ids], axis=0)
        t_loss, n_triplets = triplet_loss(all_emb, all_ids, margin=triplet_margin)
        total = total + triplet_weight * t_loss

    return {
        "loss": total,
        "loss_standard": (loss_12 + loss_21) / 2,
        "loss_hard": hard_loss,
        "loss_triplet": t_loss,
        "num_triplets": n_triplets,
        "temperature": temperature,
    }
