"""Core layers for the fingerprint models.

Semantics match the PyTorch reference modules (cited per class) closely enough
for >=0.999 embedding cosine agreement in inference mode, while the layouts are
TPU-native: images are NHWC, videos are (B, T, H, W, C), temporal sequences are
(B, T, C) — channels-last everywhere so XLA tiles convs/matmuls onto the MXU
without transposes.

Initializers reproduce the torch defaults (kaiming-uniform with a=sqrt(5) for
conv/linear weights and U(-1/sqrt(fan_in), ..) biases) so training dynamics are
comparable even though bit-level init equality is not a goal.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# Initializers (torch parity)
# ---------------------------------------------------------------------------


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch ConvNd/Linear default: kaiming_uniform(a=sqrt(5)).

    For a flax kernel of shape (*spatial, in_ch/groups, out_ch) the fan_in is
    prod(shape[:-1]); the resulting bound simplifies to 1/sqrt(fan_in).
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_fan_out_init(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_out', nonlinearity='relu') for convs.

    flax kernel shape (*spatial, in/groups, out): fan_out = out * prod(spatial).
    """
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_out = shape[-1] * receptive
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


# ---------------------------------------------------------------------------
# BatchNorm with exact torch semantics
# ---------------------------------------------------------------------------


class TorchBatchNorm(nn.Module):
    """BatchNorm over the trailing channel axis with torch semantics.

    - normalizes with the *biased* batch variance,
    - updates running_var with the *unbiased* variance (torch BatchNormNd),
    - torch momentum convention: running = (1-m)*running + m*batch, m=0.1.
    - optional `axis_name` enables cross-replica (sync) batch statistics under
      shard_map/pjit data parallelism, which is the TPU-native equivalent of
      single-device BN (per-replica stats would silently change dynamics).

    Reference: model.py:100-113 (BatchNorm2d), model.py:170 (BatchNorm1d),
    model.py:399 (BatchNorm3d).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        compute_dtype = self.dtype or x.dtype
        reduce_axes = tuple(range(x.ndim - 1))

        if use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            n = float(np.prod([x.shape[a] for a in reduce_axes]))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps)
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return y.astype(compute_dtype)


# ---------------------------------------------------------------------------
# Conv wrappers with torch-default init
# ---------------------------------------------------------------------------


class TorchConv(nn.Module):
    """nn.Conv with torch-default initialization, channels-last layout."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = None
    padding: Sequence[int] = None  # symmetric per-spatial-dim ints
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_init: Optional[callable] = None
    bias_init: Optional[callable] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        strides = tuple(self.strides) if self.strides else (1,) * len(ks)
        if self.padding is None:
            padding = ((0, 0),) * len(ks)
        else:
            padding = tuple((p, p) for p in self.padding)
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.feature_group_count) * int(np.prod(ks))
        conv = nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=strides,
            padding=padding,
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_conv_kernel_init,
            bias_init=self.bias_init or torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )
        return conv(x)


class TorchDense(nn.Module):
    """nn.Dense with torch Linear default init."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[callable] = None
    bias_init: Optional[callable] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        dense = nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_conv_kernel_init,
            bias_init=self.bias_init or torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dense",
        )
        return dense(x)


# ---------------------------------------------------------------------------
# Positional encoding (reference model.py:74-89)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def positional_encoding(x: jax.Array) -> jax.Array:
    """Add sinusoidal positional encoding; x: (B, T, C)."""
    T, C = x.shape[1], x.shape[2]
    pe = jnp.asarray(_sinusoidal_table(T, C), dtype=x.dtype)
    return x + pe[None, :, :]


# ---------------------------------------------------------------------------
# Spatial frame encoder (reference model.py:92-121)
# ---------------------------------------------------------------------------


class SpatialEncoder(nn.Module):
    """4x stride-2 conv stack + global avg pool + linear. Input: (N, H, W, 3).

    fuse_bn=True selects the lossless inference layout (models/fuse.py):
    eval-mode BN folded into conv weights (no bn modules) and the first conv
    rewritten as space-to-depth — (N,H,W,3) -> (N,H/2,W/2,12) with a 3x3
    stride-1 kernel scattered from the 5x5 stride-2 one — which widens the
    MXU contraction dim from 5*5*3=75 to 3*3*12=108 lanes. Weights come from
    `fuse.fuse_variables`, never from init.
    """

    out_dim: int = 128
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    fuse_bn: bool = False
    s2d: bool = False  # measured loss on v5e; see fuse.fuse_variables docstring

    @nn.compact
    def __call__(self, x, train: bool = False):
        specs = [(32, 5, 2), (64, 3, 1), (128, 3, 1), (256, 3, 1)]
        if self.s2d:
            n, h, w, c = x.shape
            x = x.reshape(n, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
            specs[0] = (32, 3, 1)
        for i, (ch, k, p) in enumerate(specs):
            stride = 1 if (self.s2d and i == 0) else 2
            x = TorchConv(
                features=ch,
                kernel_size=(k, k),
                strides=(stride, stride),
                padding=(p, p),
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            if not self.fuse_bn:
                x = TorchBatchNorm(
                    features=ch, axis_name=self.axis_name, dtype=self.dtype,
                    name=f"bn{i}",
                )(x, use_running_average=not train)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        x = TorchDense(features=self.out_dim, dtype=self.dtype, name="proj")(x)
        return x


# ---------------------------------------------------------------------------
# Temporal attention block (reference model.py:124-152)
# ---------------------------------------------------------------------------


class MultiHeadSelfAttention(nn.Module):
    """torch nn.MultiheadAttention(batch_first=True) equivalent.

    Params are stored jax-style: in_proj kernel (C, 3C) + bias (3C,), and an
    out-projection Dense. Dropout is applied to the attention weights during
    training (torch semantics). An optional key-padding mask (B, T) excludes
    padded frames — the reference applies no mask (model.py:272 takes no
    lengths), so mask=None reproduces reference behaviour exactly.
    """

    dim: int
    num_heads: int = 8
    drop: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None):
        B, T, C = x.shape
        H = self.num_heads
        D = C // H

        # torch MHA init: xavier_uniform in_proj, zero in_proj_bias,
        # out_proj Linear default kernel + zero bias.
        in_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (C, 3 * C), jnp.float32
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,), jnp.float32)

        compute_dtype = self.dtype or x.dtype
        qkv = x @ in_kernel.astype(compute_dtype) + in_bias.astype(compute_dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)

        if not train:
            # Fused Pallas kernel on TPU (no attention dropout in eval);
            # identical jnp math elsewhere (ops/attention.py).
            from video_fingerprint_tpu.ops.attention import multihead_attention

            out = multihead_attention(q, k, v, mask=mask)
        else:
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / math.sqrt(D)
            if mask is not None:
                neg = jnp.finfo(jnp.float32).min / 2
                scores = jnp.where(mask[:, None, None, :], scores, neg)
            attn = jax.nn.softmax(scores, axis=-1)
            attn = nn.Dropout(rate=self.drop, deterministic=not train)(attn)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", attn.astype(compute_dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(compute_dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        out = TorchDense(
            features=C,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_proj",
        )(out)
        return out


class TemporalAttentionBlock(nn.Module):
    """Pre-LN MHA + residual; pre-LN 1x1-conv MLP (GELU) + residual."""

    dim: int
    num_heads: int = 8
    mlp_ratio: int = 4
    drop: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None):
        dropout = lambda name: nn.Dropout(rate=self.drop, deterministic=not train, name=name)

        x_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        attn_out = MultiHeadSelfAttention(
            dim=self.dim, num_heads=self.num_heads, drop=self.drop,
            dtype=self.dtype, name="attn",
        )(x_norm, train=train, mask=mask)
        x = x + dropout("drop_attn")(attn_out)

        x_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        # 1x1 Conv1d on (B, T, C) == pointwise Dense; reference model.py:135-137.
        h = TorchDense(features=self.dim * self.mlp_ratio, dtype=self.dtype, name="conv1")(x_norm)
        h = dropout("drop_mlp1")(jax.nn.gelu(h, approximate=False))
        h = TorchDense(features=self.dim, dtype=self.dtype, name="conv2")(h)
        x = x + dropout("drop_mlp2")(h)
        return x


# ---------------------------------------------------------------------------
# Multi-scale temporal conv block (reference model.py:155-179)
# ---------------------------------------------------------------------------


class TemporalConvBlock(nn.Module):
    """Parallel grouped 1-D convs at several kernel sizes, concat on channels.

    Input/output: (B, T, C). Each branch maps C -> C/len(kernel_sizes) with
    groups = C/len(kernel_sizes), so len(kernel_sizes) must divide `dim` and
    the residual add requires the concat to reproduce `dim` exactly. The
    fingerprint models use kernel_sizes=(3,5,7,11) with dim=256 (4 input
    channels per group); the reference's own default [3,5,7] (model.py:158)
    is incompatible with dim=256 and is not replicated here.
    """

    dim: int
    kernel_sizes: Sequence[int] = (3, 5, 7, 11)
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    fuse_bn: bool = False  # eval BN pre-folded into conv weights (fuse.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.kernel_sizes)
        if self.dim % n != 0 or self.dim % (self.dim // n) != 0:
            raise ValueError(
                f"len(kernel_sizes)={n} must divide dim={self.dim} "
                "(branches concat back to dim for the residual add)"
            )
        branch_dim = self.dim // n
        outs = []
        for i, k in enumerate(self.kernel_sizes):
            h = TorchConv(
                features=branch_dim,
                kernel_size=(k,),
                padding=(k // 2,),
                feature_group_count=branch_dim,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            if not self.fuse_bn:
                h = TorchBatchNorm(
                    features=branch_dim, axis_name=self.axis_name, dtype=self.dtype,
                    name=f"bn{i}",
                )(h, use_running_average=not train)
            outs.append(nn.relu(h))
        return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# 3D conv block (reference model.py:393-403)
# ---------------------------------------------------------------------------


class Conv3DBlock(nn.Module):
    """Conv3d + BN3d + ReLU on (B, T, H, W, C); kaiming-normal fan-out init."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    padding: Sequence[int] = (0, 0, 0)
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    fuse_bn: bool = False  # eval BN pre-folded into conv weights (fuse.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            kernel_init=kaiming_normal_fan_out_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)
        if not self.fuse_bn:
            x = TorchBatchNorm(
                features=self.features, axis_name=self.axis_name, dtype=self.dtype,
                name="bn",
            )(x, use_running_average=not train)
        return nn.relu(x)
