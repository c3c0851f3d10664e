"""The pjit train/eval steps — loss + grads + metrics in ONE XLA program.

TPU-first redesign of the reference hot loop (train.py:140-284):

  - The reference forwards each random extract individually in a Python loop
    (2B extra forward passes per step, model.py:323-341) and then runs two
    MORE no-grad forwards for the accuracy metric (train.py:235-241). Here
    extracts are a vectorized gather + per-frame mask, full1/full2 and
    ex1/ex2 are batched into two (2B, T) forwards, and accuracy reuses the
    loss-path embeddings — everything inside a single compiled step.
  - Data parallelism is GSPMD: the caller jits this step with the batch
    sharded over the 'data' mesh axis and params replicated; XLA inserts the
    grad all-reduce over ICI, and BatchNorm batch statistics are global
    automatically (sync-BN semantics, the closest match to the single-device
    reference).

Masking policy (SURVEY.md §7 hard parts): `mask_padding=True` (default)
excludes zero-padded frames from attention/pooling — the *correct* behaviour.
The reference lets padded frames attend and pool (collate pads with zeros,
dataset.py:507-524; no mask in model.py:272). Set mask_padding=False to
reproduce that exactly for same-bucket batches.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from video_fingerprint_tpu.ops.losses import (
    attention_contrastive_loss,
    cnn3d_contrastive_loss,
)

Array = jax.Array


def normalize_clip(x: Array) -> Array:
    """uint8 [0,255] -> f32 [0,1] on device; f32 passes through. Batches ship
    as uint8 so host->device transfers move 4x fewer bytes."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array  # int32 scalar


def init_train_state(model, tx, rng, example_batch_shape) -> TrainState:
    """tx may be None when the optimizer is built afterwards (it needs the
    param tree for the multi-LR labels); set opt_state via .replace then."""
    video = jnp.zeros(example_batch_shape, jnp.float32)
    variables = model.init(rng, video)
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params) if tx is not None else None,
        step=jnp.asarray(0, jnp.int32),
    )


def sample_extract_lengths(rng: Array, B: int, T: int, extract_ratio: float) -> Array:
    """One extract length per sample, shared by both extracts of the pair
    (reference model.py:326 draws extract_len once per sample)."""
    return jax.random.randint(rng, (B,), int(T * extract_ratio), T + 1)


def sample_extracts(
    rng: Array,
    video: Array,
    lengths: Array,
    true_lengths: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """Vectorized version of the reference's per-sample extract loop
    (model.py:325-341): shared per-sample length, independent start.
    Lengths/starts are sampled over the padded T as the reference does (it
    reads T from the padded batch, model.py:318) — but when `true_lengths`
    (real frame counts) are known, starts are clamped so every extract
    overlaps at least one real frame; otherwise a short clip in a large
    bucket could yield an all-padding extract and a degenerate embedding.

    Returns (extract (B,T,H,W,C) gathered from `start`, mask (B,T), idx (B,T)).
    """
    B, T = video.shape[0], video.shape[1]
    max_start = T - lengths  # >= 0
    if true_lengths is not None:
        max_start = jnp.minimum(max_start, jnp.maximum(true_lengths - 1, 0))
    u = jax.random.uniform(rng, (B,))
    starts = jnp.floor(u * (max_start + 1)).astype(jnp.int32)

    pos = jnp.arange(T)[None, :]  # (1, T)
    idx = jnp.minimum(starts[:, None] + pos, T - 1)  # (B, T)
    extract = jnp.take_along_axis(
        video, idx[:, :, None, None, None], axis=1
    )
    mask = pos < lengths[:, None]
    return extract, mask, idx


def make_loss_fn(
    model,
    model_type: str,
    extract_ratio: float = 0.5,
    triplet_weight: float = 0.3,
    triplet_margin: float = 0.3,
    use_triplet: bool = True,
    mask_padding: bool = True,
    remat: bool = False,
    device_augment: bool = False,
    reuse_extract_features: bool = False,
) -> Callable:
    """Build the train-mode loss: (params, batch_stats, batch, rng) ->
    (loss, (new_batch_stats, metrics)). Used by make_train_step under
    jax.grad; exposed separately so forward-only cost can be measured in
    isolation (tools/exp_train_roofline.py).

    batch: {'clip1','clip2': (B,T,H,W,C) f32, 'video_id': (B,) i32,
            'mask1','mask2': (B,T) bool (optional)}

    remat=True wraps each model forward in jax.checkpoint: activations are
    recomputed in the backward pass instead of stored, cutting peak HBM
    roughly by the conv stack's activation footprint (B*T frames) at the
    cost of one extra forward — the standard lever for scaling batch/frames
    per chip.

    device_augment=True runs the clip-level augmentations on device inside
    this compiled step (ops/device_augment.py) — the loader must then supply
    clips augmented only by the host-side subset (resize + JPEG recompress;
    data/dataset.py augment_mode="device"). Each clip of the pair draws its
    own params, like the host pipeline's two apply_augmentations calls.

    reuse_extract_features=True (attention only, opt-in) skips the extract
    forward's per-frame CNN: extracts are temporal subsequences of the SAME
    frames the full forward just encoded, and the spatial encoder is
    per-frame (context-independent) with no dropout — so the extract
    embeddings are computed by gathering rows of the full forward's
    (2B, T, spatial_dim) feature map and running only the temporal head.
    This removes ~half the step's CNN FLOPs (fwd AND bwd) and replaces the
    (B, T, H, W, C) pixel gather + its backward scatter with a
    (B, T, spatial_dim) one. The ONLY train-mode divergence from the
    two-pixel-forwards path is encoder BatchNorm batch statistics: extract
    frames are normalized with the full batch's statistics instead of the
    extract batch's own (the populations coincide; with extract_ratio=1.0
    the modes are exactly equal — tested), and the encoder's running stats
    see one update per step instead of two. Temporal-head semantics
    (dropout draws, BN, masking) are unchanged.
    """

    def _fwd_train(params, batch_stats, x, mask, d_rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True, mask=mask,
            rngs={"dropout": d_rng}, mutable=["batch_stats"],
        )

    def _fwd_train_3d(params, batch_stats, x, d_rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True,
            rngs={"dropout": d_rng}, mutable=["batch_stats"],
        )

    def _enc_train(params, batch_stats, x):
        # per-frame CNN only; no dropout in the spatial encoder.
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True, method="encode_frames", mutable=["batch_stats"],
        )

    def _head_train(params, batch_stats, feats, mask, d_rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            feats, train=True, mask=mask,
            rngs={"dropout": d_rng}, mutable=["batch_stats"],
            method="forward_from_features",
        )

    if remat:
        _fwd_train = jax.checkpoint(_fwd_train)
        _fwd_train_3d = jax.checkpoint(_fwd_train_3d)
        _enc_train = jax.checkpoint(_enc_train)
        _head_train = jax.checkpoint(_head_train)

    def loss_fn(params, batch_stats, batch, rng):
        d_rng, e_rng1, e_rng2 = jax.random.split(rng, 3)
        clip1 = normalize_clip(batch["clip1"])
        clip2 = normalize_clip(batch["clip2"])
        B = clip1.shape[0]
        m1 = batch.get("mask1") if mask_padding else None
        m2 = batch.get("mask2") if mask_padding else None
        if device_augment:
            from video_fingerprint_tpu.ops.device_augment import augment_clips

            a_rng1, a_rng2, d_rng = jax.random.split(d_rng, 3)
            # augment BEFORE extract sampling, like the reference (the
            # dataset augments the pair, compute_loss extracts from the
            # augmented clips). Padded frames are re-zeroed by the mask.
            clip1 = augment_clips(a_rng1, clip1, batch.get("mask1"))
            clip2 = augment_clips(a_rng2, clip2, batch.get("mask2"))

        if model_type == "attention":
            B_, T_ = clip1.shape[0], clip1.shape[1]
            k_len, e_rng1, e_rng2 = jax.random.split(e_rng1, 3)
            # one shared extract length per sample (model.py:326), starts
            # independent per side (model.py:329-330).
            lengths = sample_extract_lengths(k_len, B_, T_, extract_ratio)
            tl1 = jnp.sum(m1, axis=1) if m1 is not None else None
            tl2 = jnp.sum(m2, axis=1) if m2 is not None else None
            ex1, exm1, idx1 = sample_extracts(e_rng1, clip1, lengths, tl1)
            ex2, exm2, idx2 = sample_extracts(e_rng2, clip2, lengths, tl2)
            if m1 is not None:
                # extracted frame j came from original index idx[j]; it is
                # valid only if it was a real (non-padding) frame there.
                exm1 = exm1 & jnp.take_along_axis(m1, idx1, axis=1)
            if m2 is not None:
                exm2 = exm2 & jnp.take_along_axis(m2, idx2, axis=1)
            # Two batched forwards instead of 2 + 2B: [full1;full2], [ex1;ex2].
            fulls = jnp.concatenate([clip1, clip2], axis=0)
            fmask = None
            if m1 is not None and m2 is not None:
                fmask = jnp.concatenate([m1, m2], axis=0)
            exmask = jnp.concatenate([exm1, exm2], axis=0)
            if reuse_extract_features:
                # Encode every frame ONCE; the extract view gathers the
                # (2B, T, spatial_dim) feature rows instead of re-running
                # the CNN on gathered pixels (see make_train_step docstring).
                feats_full, mutated = _enc_train(params, batch_stats, fulls)
                emb_full, mutated = _head_train(
                    params, mutated["batch_stats"], feats_full, fmask,
                    jax.random.fold_in(d_rng, 0),
                )
                idxcat = jnp.concatenate([idx1, idx2], axis=0)
                feats_ex = jnp.take_along_axis(
                    feats_full, idxcat[:, :, None], axis=1
                )
                emb_ex, mutated = _head_train(
                    params, mutated["batch_stats"], feats_ex, exmask,
                    jax.random.fold_in(d_rng, 1),
                )
            else:
                emb_full, mutated = _fwd_train(
                    params, batch_stats, fulls, fmask,
                    jax.random.fold_in(d_rng, 0),
                )
                exs = jnp.concatenate([ex1, ex2], axis=0)
                emb_ex, mutated = _fwd_train(
                    params, mutated["batch_stats"], exs, exmask,
                    jax.random.fold_in(d_rng, 1),
                )
            out = attention_contrastive_loss(
                emb_full[:B], emb_full[B:], emb_ex[:B], emb_ex[B:],
                temperature=params["temperature"],
                video_ids=batch.get("video_id") if use_triplet else None,
                use_triplet=use_triplet,
                triplet_weight=triplet_weight,
                triplet_margin=triplet_margin,
            )
            emb1, emb2 = emb_full[:B], emb_full[B:]
        else:
            both = jnp.concatenate([clip1, clip2], axis=0)
            emb, mutated = _fwd_train_3d(params, batch_stats, both, d_rng)
            emb1, emb2 = emb[:B], emb[B:]
            out = cnn3d_contrastive_loss(
                emb1, emb2,
                temperature=params["temperature"],
                video_ids=batch.get("video_id") if use_triplet else None,
                use_triplet=use_triplet,
                triplet_weight=triplet_weight,
                triplet_margin=triplet_margin,
            )

        # accuracy from the loss-path embeddings (the reference pays 2 extra
        # no-grad forwards for this, train.py:235-241).
        logits = (emb1 @ emb2.T) / params["temperature"]
        acc = jnp.mean(
            (jnp.argmax(logits, axis=1) == jnp.arange(B)).astype(jnp.float32)
        )
        out["acc"] = acc
        return out["loss"], (mutated["batch_stats"], out)

    return loss_fn


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    model_type: str,
    extract_ratio: float = 0.5,
    triplet_weight: float = 0.3,
    triplet_margin: float = 0.3,
    use_triplet: bool = True,
    mask_padding: bool = True,
    remat: bool = False,
    device_augment: bool = False,
    reuse_extract_features: bool = False,
) -> Callable:
    """Build the fused train step: (state, batch, rng) -> (state, metrics).
    Loss semantics and all flags: see make_loss_fn."""
    loss_fn = make_loss_fn(
        model, model_type,
        extract_ratio=extract_ratio,
        triplet_weight=triplet_weight,
        triplet_margin=triplet_margin,
        use_triplet=use_triplet,
        mask_padding=mask_padding,
        remat=remat,
        device_augment=device_augment,
        reuse_extract_features=reuse_extract_features,
    )

    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array):
        rng = jax.random.fold_in(rng, state.step)
        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def make_eval_step(
    model, model_type: str, mask_padding: bool = True,
    reuse_extract_features: bool = True,
) -> Callable:
    """Validation step: loss (no triplet — reference passes no video_ids in
    validate, train.py:397-399) + embeddings + accuracy, one forward pair.

    reuse_extract_features (attention only, default ON) computes the extract
    embeddings from gathered rows of the full forward's per-frame feature
    map instead of re-running the CNN on gathered pixels. In eval mode this
    is EXACT — BN uses running stats and the encoder has no dropout, so a
    frame's features do not depend on which batch/view it appears in
    (equality vs the pixel path is tested) — and removes ~half the
    validation forward's CNN FLOPs. False reproduces the two-pixel-forwards
    path bit-for-bit."""

    def eval_step(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        clip1 = normalize_clip(batch["clip1"])
        clip2 = normalize_clip(batch["clip2"])
        B, T = clip1.shape[0], clip1.shape[1]
        fulls = jnp.concatenate([clip1, clip2], axis=0)

        if model_type == "attention":
            m1 = batch.get("mask1") if mask_padding else None
            m2 = batch.get("mask2") if mask_padding else None
            fmask = None
            if m1 is not None and m2 is not None:
                fmask = jnp.concatenate([m1, m2], axis=0)
            if reuse_extract_features:
                feats_full = model.apply(
                    variables, fulls, method="encode_frames"
                )
                emb = model.apply(
                    variables, feats_full, mask=fmask,
                    method="forward_from_features",
                )
            else:
                emb = model.apply(variables, fulls, mask=fmask)
            emb1, emb2 = emb[:B], emb[B:]

            k_len, e_rng1, e_rng2 = jax.random.split(rng, 3)
            # 0.5 is deliberate: the reference's validate calls
            # compute_loss(clip1, clip2) WITHOUT threading the configured
            # min_extract_ratio (train.py:397-399 vs :182-204), so eval
            # always uses compute_loss's 0.5 default regardless of config.
            lengths = sample_extract_lengths(k_len, B, T, 0.5)
            tl1 = jnp.sum(m1, axis=1) if m1 is not None else None
            tl2 = jnp.sum(m2, axis=1) if m2 is not None else None
            ex1, exm1, idx1 = sample_extracts(e_rng1, clip1, lengths, tl1)
            ex2, exm2, idx2 = sample_extracts(e_rng2, clip2, lengths, tl2)
            if m1 is not None:
                exm1 = exm1 & jnp.take_along_axis(m1, idx1, axis=1)
            if m2 is not None:
                exm2 = exm2 & jnp.take_along_axis(m2, idx2, axis=1)
            exmask = jnp.concatenate([exm1, exm2], axis=0)
            if reuse_extract_features:
                idxcat = jnp.concatenate([idx1, idx2], axis=0)
                feats_ex = jnp.take_along_axis(
                    feats_full, idxcat[:, :, None], axis=1
                )
                emb_ex = model.apply(
                    variables, feats_ex, mask=exmask,
                    method="forward_from_features",
                )
            else:
                exs = jnp.concatenate([ex1, ex2], axis=0)
                emb_ex = model.apply(variables, exs, mask=exmask)
            out = attention_contrastive_loss(
                emb1, emb2, emb_ex[:B], emb_ex[B:],
                temperature=params["temperature"], video_ids=None,
            )
        else:
            # the 3D model takes no mask (fixed clip_length windows)
            emb = model.apply(variables, fulls)
            emb1, emb2 = emb[:B], emb[B:]
            out = cnn3d_contrastive_loss(
                emb1, emb2, temperature=params["temperature"], video_ids=None,
            )

        logits = (emb1 @ emb2.T) / params["temperature"]
        out["acc"] = jnp.mean(
            (jnp.argmax(logits, axis=1) == jnp.arange(B)).astype(jnp.float32)
        )
        return out, emb1, emb2

    return eval_step
