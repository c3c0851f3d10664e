"""Attention-based video fingerprint model.

Reference parity target: `VideoFingerprintAttention` (reference model.py:182-298).
Differences, all deliberate and documented:
  - layout is (B, T, H, W, C) channels-last (TPU-native) instead of (B,T,C,H,W);
  - an optional per-frame validity `mask` (B, T) is threaded through attention
    and pooling. mask=None reproduces the reference exactly (the reference lets
    zero-padded frames attend and pollute pooling — model.py:256-270 has no
    mask; collate pads with zeros, dataset.py:507-524);
  - the whole forward is a single jit region (conv encoder + attention +
    pooling + projection + L2 norm) so XLA fuses the elementwise chain into the
    matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_fingerprint_tpu.models.layers import (
    SpatialEncoder,
    TemporalAttentionBlock,
    TemporalConvBlock,
    TorchDense,
    positional_encoding,
)


class VideoFingerprintAttention(nn.Module):
    """Video -> L2-normalized embedding via frame CNN + temporal attention."""

    spatial_dim: int = 128
    temporal_dim: int = 256
    embedding_dim: int = 256
    num_attention_blocks: int = 4
    num_heads: int = 8
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # Inference-only fused layout: BN folded into convs (models/fuse.py).
    # Weights must come from fuse_variables(). s2d additionally selects the
    # space-to-depth conv0 rewrite (fuse_variables(..., s2d=True) weights) —
    # exact but measured slower on v5e; kept as a documented layout variant.
    fused: bool = False
    s2d: bool = False

    def setup(self):
        self.spatial_encoder = SpatialEncoder(
            out_dim=self.spatial_dim, axis_name=self.axis_name, dtype=self.dtype,
            fuse_bn=self.fused, s2d=self.s2d,
        )
        self.temporal_projection = TorchDense(features=self.temporal_dim, dtype=self.dtype)
        self.temporal_conv_blocks = [
            TemporalConvBlock(
                dim=self.temporal_dim,
                kernel_sizes=(3, 5, 7, 11),
                axis_name=self.axis_name,
                dtype=self.dtype,
                fuse_bn=self.fused,
            )
            for _ in range(2)
        ]
        self.attention_blocks = [
            TemporalAttentionBlock(
                dim=self.temporal_dim, num_heads=self.num_heads, dtype=self.dtype
            )
            for _ in range(self.num_attention_blocks)
        ]
        # reference model.py:215-217: Conv1d(dim, dim, 1) + ReLU == pointwise Dense.
        self.temporal_pool = TorchDense(features=self.temporal_dim, dtype=self.dtype)
        self.final_projection_1 = TorchDense(features=self.temporal_dim, dtype=self.dtype)
        self.final_projection_2 = TorchDense(features=self.embedding_dim, dtype=self.dtype)
        self.final_dropout = nn.Dropout(rate=0.1)
        # learnable contrastive temperature, init 0.07 (reference model.py:226).
        self.temperature = self.param(
            "temperature", lambda key, shape: jnp.full(shape, 0.07, jnp.float32), (1,)
        )

    def encode_frames(self, frames: jax.Array, train: bool = False) -> jax.Array:
        """(B, T, H, W, C) -> (B, T, spatial_dim). Reference model.py:228-237.

        uint8 input is normalized to [0,1] *after* the (B,T)->(B*T) flatten:
        converting the 5-D tensor first makes XLA materialize it in one layout
        and relayout+reshape it in two more full-HBM passes (profiled at ~11ms
        of 57ms per 512x128-frame batch); converting the flattened view lets
        the convert write directly in the conv input layout.
        """
        B, T = frames.shape[0], frames.shape[1]
        flat = frames.reshape((B * T,) + frames.shape[2:])
        if flat.dtype == jnp.uint8:
            flat = flat.astype(self.dtype or jnp.float32) / 255.0
        feats = self.spatial_encoder(flat, train=train)
        return feats.reshape(B, T, self.spatial_dim)

    def temporal_encoding(
        self, features: jax.Array, train: bool = False, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """(B, T, spatial_dim) -> (B, T, temporal_dim). Reference model.py:239-254."""
        x = self.temporal_projection(features)
        x = positional_encoding(x)
        for conv_block in self.temporal_conv_blocks:
            # Zero masked positions before the conv so its implicit zero
            # padding matches an unpadded sequence of the true length.
            x_in = x if mask is None else x * mask[:, :, None].astype(x.dtype)
            x = x + conv_block(x_in, train=train)
        for attn_block in self.attention_blocks:
            x = attn_block(x, train=train, mask=mask)
        return x

    def adaptive_pooling(
        self, features: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """Triple pooling mean ‖ max ‖ learned-softmax. Reference model.py:256-270."""
        if mask is None:
            avg_pool = jnp.mean(features, axis=1)
            max_pool = jnp.max(features, axis=1)
            logits = nn.relu(self.temporal_pool(features))  # (B, T, C)
            weights = jax.nn.softmax(logits, axis=1)  # per-channel softmax over T
            weighted_pool = jnp.sum(features * weights, axis=1)
        else:
            m = mask[:, :, None].astype(features.dtype)
            denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
            avg_pool = jnp.sum(features * m, axis=1) / denom
            neg = jnp.finfo(jnp.float32).min / 2
            max_pool = jnp.max(jnp.where(m > 0, features, neg), axis=1)
            logits = nn.relu(self.temporal_pool(features))
            logits = jnp.where(m > 0, logits, neg)
            weights = jax.nn.softmax(logits, axis=1)
            weighted_pool = jnp.sum(features * weights * m, axis=1)
        return jnp.concatenate([avg_pool, max_pool, weighted_pool], axis=1)

    def forward_from_features(
        self,
        feats: jax.Array,
        train: bool = False,
        mask: Optional[jax.Array] = None,
        return_features: bool = False,
    ) -> jax.Array:
        """(B, T, spatial_dim) per-frame features -> (B, embedding_dim).

        The model from `encode_frames`'s output onward: temporal encoding +
        pooling + projection head + L2 norm. Per-frame CNN features are
        context-independent (the spatial encoder sees one frame at a time),
        so a temporal SUBSEQUENCE of a clip can be embedded by gathering rows
        of the full clip's feature map and entering here — in eval mode this
        is exactly equal to re-encoding the gathered pixels (BN uses running
        stats; the encoder has no dropout), which is what the training
        extract-reuse path (train_step.py, reuse_extract_features) and its
        tests rely on.
        """
        temporal_features = self.temporal_encoding(feats, train=train, mask=mask)
        pooled = self.adaptive_pooling(temporal_features, mask=mask)
        h = nn.relu(self.final_projection_1(pooled))
        h = self.final_dropout(h, deterministic=not train)
        embedding = self.final_projection_2(h).astype(jnp.float32)
        norm = jnp.linalg.norm(embedding, axis=1, keepdims=True)
        # torch F.normalize(p=2, eps=1e-12): x / max(||x||, eps)
        embedding = embedding / jnp.maximum(norm, 1e-12)
        if return_features:
            return embedding, temporal_features
        return embedding

    def forward_flat(
        self,
        flat_frames: jax.Array,
        batch_size: int,
        train: bool = False,
        mask: Optional[jax.Array] = None,
        return_features: bool = False,
    ) -> jax.Array:
        """(B*T, H, W, C) pre-flattened frames -> (B, embedding_dim).

        Identical math to __call__ on the (B, T, ...) view, but the caller
        stages frames already flattened so the multi-GB video tensor is never
        reshaped in-graph — on v5e the 5-D convert->relayout->reshape chain
        around `encode_frames`'s flatten costs ~11ms of full-HBM passes per
        512x128-frame batch (profiled); only the small (B*T, spatial_dim)
        feature map gets reshaped here.
        """
        N = flat_frames.shape[0]
        T = N // batch_size
        if flat_frames.dtype == jnp.uint8:
            flat_frames = flat_frames.astype(self.dtype or jnp.float32) / 255.0
        feats = self.spatial_encoder(flat_frames, train=train)
        feats = feats.reshape(batch_size, T, self.spatial_dim)
        return self.forward_from_features(
            feats, train=train, mask=mask, return_features=return_features
        )

    def __call__(
        self,
        video: jax.Array,
        train: bool = False,
        mask: Optional[jax.Array] = None,
        return_features: bool = False,
    ):
        """(B, T, H, W, C) -> (B, embedding_dim), L2-normalized.

        Reference forward: model.py:272-298. Delegates to forward_flat —
        identical math (the flatten is what encode_frames did anyway);
        batched-scan callers stage pre-flattened frames and call
        forward_flat directly to keep the reshape off-device.
        """
        B = video.shape[0]
        flat = video.reshape((B * video.shape[1],) + video.shape[2:])
        return self.forward_flat(
            flat, B, train=train, mask=mask, return_features=return_features
        )
