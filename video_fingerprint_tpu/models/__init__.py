"""Model registry.

`create_model` mirrors the reference factory (reference model.py:585-610),
keyed by the same strings so checkpoint-embedded configs round-trip. Note the
reference quirk preserved here: the factory's 3D `frame_stride` default is 16
(model.py:606) while the rest of the codebase defaults to 32.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from video_fingerprint_tpu.models.attention import VideoFingerprintAttention
from video_fingerprint_tpu.models.cnn3d import VideoFingerprint3D

__all__ = ["create_model", "VideoFingerprintAttention", "VideoFingerprint3D"]


def create_model(
    model_type: str = "attention",
    axis_name: Optional[str] = None,
    dtype: Optional[jnp.dtype] = None,
    **kwargs,
):
    """Create a video fingerprint model (a flax.linen Module).

    Args:
        model_type: 'attention' or '3d' or 'cnn3d'.
        axis_name: mesh axis name for cross-replica (sync) BatchNorm stats
            under data parallelism; None for single-device semantics.
        dtype: compute dtype (e.g. jnp.bfloat16); params stay float32.
        **kwargs: model-specific hyperparameters (same keys as the reference).
    """
    if model_type == "attention":
        return VideoFingerprintAttention(
            spatial_dim=kwargs.get("spatial_dim", 128),
            temporal_dim=kwargs.get("temporal_dim", 256),
            embedding_dim=kwargs.get("embedding_dim", 256),
            num_attention_blocks=kwargs.get("num_attention_blocks", 4),
            axis_name=axis_name,
            dtype=dtype,
            fused=kwargs.get("fused", False),
            s2d=kwargs.get("s2d", False),
        )
    elif model_type in ("3d", "cnn3d"):
        return VideoFingerprint3D(
            embedding_dim=kwargs.get("embedding_dim", 256),
            frame_stride=kwargs.get("frame_stride", 16),
            dropout=kwargs.get("dropout", 0.2),
            axis_name=axis_name,
            dtype=dtype,
            fused=kwargs.get("fused", False),
        )
    raise ValueError(f"Unknown model type: {model_type}")
