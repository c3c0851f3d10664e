"""Strided 3D-CNN video fingerprint model.

Reference parity target: `VideoFingerprint3D` (reference model.py:406-512).
Layout is (B, T, H, W, C) channels-last (NDHWC), TPU-native. Temporal padding
to a multiple of `frame_stride` (reference model.py:479-482) happens at trace
time with static shapes, so per-bucket compiled programs stay static-shape.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_fingerprint_tpu.models.layers import (
    Conv3DBlock,
    TorchConv,
    TorchDense,
    kaiming_normal_fan_out_init,
    normal_init,
)


class VideoFingerprint3D(nn.Module):
    """Fast 3D CNN fingerprint model with aggressive temporal striding."""

    embedding_dim: int = 256
    frame_stride: int = 32
    dropout: float = 0.2
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # Inference-only layout: eval BN folded into conv weights (models/fuse.py).
    fused: bool = False

    def setup(self):
        s = self.frame_stride
        # reference model.py:414-439 (channel comments there claim 512; the
        # actual channels are 16/32/64/128 — we follow the code).
        self.block0 = Conv3DBlock(
            features=16, kernel_size=(s, 5, 5), strides=(s, 2, 2), padding=(0, 2, 2),
            axis_name=self.axis_name, dtype=self.dtype, fuse_bn=self.fused,
        )
        self.block1 = Conv3DBlock(
            features=32, kernel_size=(3, 3, 3), strides=(1, 2, 2), padding=(1, 1, 1),
            axis_name=self.axis_name, dtype=self.dtype, fuse_bn=self.fused,
        )
        self.block2 = Conv3DBlock(
            features=64, kernel_size=(3, 3, 3), strides=(2, 2, 2), padding=(1, 1, 1),
            axis_name=self.axis_name, dtype=self.dtype, fuse_bn=self.fused,
        )
        self.block3 = Conv3DBlock(
            features=128, kernel_size=(3, 3, 3), strides=(1, 2, 2), padding=(1, 1, 1),
            axis_name=self.axis_name, dtype=self.dtype, fuse_bn=self.fused,
        )
        # temporal aggregation (reference model.py:442-443): Conv1d(128,128,k3,p1)
        # uses the *torch-default* init (the custom _initialize_weights only
        # touches Conv3d/BatchNorm3d/Linear, model.py:458-470).
        self.temporal_conv = TorchConv(
            features=128, kernel_size=(3,), padding=(1,), dtype=self.dtype
        )
        self.temporal_attention = TorchConv(
            features=1, kernel_size=(1,), dtype=self.dtype
        )
        # projector Linears: normal(0, 0.01), zero bias (model.py:468-470).
        self.projector_1 = TorchDense(
            features=128, kernel_init=normal_init(0.01),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
        )
        self.projector_2 = TorchDense(
            features=self.embedding_dim, kernel_init=normal_init(0.01),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
        )
        self.proj_dropout = nn.Dropout(rate=self.dropout)
        self.temperature = self.param(
            "temperature", lambda key, shape: jnp.full(shape, 0.07, jnp.float32), (1,)
        )

    def __call__(self, video: jax.Array, train: bool = False) -> jax.Array:
        """(B, T, H, W, C) -> (B, embedding_dim), L2-normalized.

        Reference forward: model.py:472-512.
        """
        B, T = video.shape[0], video.shape[1]
        if video.dtype == jnp.uint8:  # on-device normalize (see attention.py)
            video = video.astype(self.dtype or jnp.float32) / 255.0
        pad = (self.frame_stride - T % self.frame_stride) % self.frame_stride
        if pad > 0:
            video = jnp.pad(video, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))

        x = self.block0(video, train=train)
        x = self.block1(x, train=train)
        x = self.block2(x, train=train)
        x = self.block3(x, train=train)
        # AdaptiveAvgPool3d((None,1,1)): keep T', average spatial.
        features = jnp.mean(x, axis=(2, 3))  # (B, T', 128)

        temporal_features = self.temporal_conv(features)  # (B, T', 128)
        attn_logits = self.temporal_attention(temporal_features)  # (B, T', 1)
        attn_weights = jax.nn.softmax(attn_logits, axis=1)
        weighted = jnp.sum(temporal_features * attn_weights, axis=1)  # (B, 128)
        avg = jnp.mean(temporal_features, axis=1)  # (B, 128)
        combined = weighted + avg

        h = nn.relu(self.projector_1(combined))
        h = self.proj_dropout(h, deterministic=not train)
        embedding = self.projector_2(h).astype(jnp.float32)
        norm = jnp.linalg.norm(embedding, axis=1, keepdims=True)
        return embedding / jnp.maximum(norm, 1e-12)
