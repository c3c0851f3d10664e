"""Lossless inference-time weight fusion (VERDICT round-1, item 3).

Transforms a trained variables tree ({'params', 'batch_stats'}) into the
weights of the `fused=True` model layout:

  1. **BN fold**: every eval-mode BatchNorm (a per-channel affine
     y = (x - mean) * scale/sqrt(var+eps) + bias) is folded into the
     preceding conv:  K' = K * a,  b' = (b - mean) * a + bias_bn  with
     a = scale / sqrt(var + eps).  Exact up to float rounding.
  2. **Space-to-depth first conv** (attention model): the 5x5 stride-2
     3-channel conv over (N,64,64,3) is re-indexed into a 3x3 stride-1
     12-channel conv over the 2x2 space-to-depth input (N,32,32,12).
     Tap (di,dj) of the 5x5 kernel lands at block offset
     (u,v) = (di%2, dj%2), position (dp,dq) = ((di-2-u)//2+1, (dj-2-v)//2+1)
     — a bijection, so the arithmetic is identical (the classic TPU MLPerf
     ResNet conv1 transform). Padding matches: pad=1 on the block grid
     zero-fills the same rows/cols the original pad=2 did.

The fused model computes the same function as the standard one in eval mode;
tests/test_fused_inference.py gates allclose + cosine. Training always uses
the standard layout (BN needs batch stats).
"""

from __future__ import annotations

import numpy as np


def _fold_conv_bn(params, stats, conv_path, bn_path, eps=1e-5):
    """Fold bn (scale,bias,mean,var) into conv (kernel,bias); returns dict."""
    kernel = np.asarray(params[conv_path]["conv"]["kernel"])
    bias = np.asarray(params[conv_path]["conv"]["bias"])
    scale = np.asarray(params[bn_path]["scale"])
    bn_bias = np.asarray(params[bn_path]["bias"])
    mean = np.asarray(stats[bn_path]["mean"])
    var = np.asarray(stats[bn_path]["var"])
    a = scale / np.sqrt(var + eps)
    return {
        "conv": {
            "kernel": (kernel * a).astype(kernel.dtype),
            "bias": ((bias - mean) * a + bn_bias).astype(bias.dtype),
        }
    }


def space_to_depth_kernel(k5: np.ndarray) -> np.ndarray:
    """(5,5,C,O) stride-2 kernel -> (3,3,4C,O) stride-1 kernel on s2d input.

    s2d channel packing follows SpatialEncoder's reshape: index = (u*2+v)*C+c.
    """
    kh, kw, C, O = k5.shape
    assert (kh, kw) == (5, 5), k5.shape
    k3 = np.zeros((3, 3, 4 * C, O), dtype=k5.dtype)
    for di in range(5):
        u = di % 2
        dp = (di - 2 - u) // 2 + 1
        for dj in range(5):
            v = dj % 2
            dq = (dj - 2 - v) // 2 + 1
            base = (u * 2 + v) * C
            k3[dp, dq, base:base + C, :] = k5[di, dj, :, :]
    return k3


def fuse_variables(variables, model_type: str = "attention", s2d: bool = False):
    """Standard trained variables -> variables for create_model(fused=True).

    The result has no 'batch_stats' collection (all BN folded away).

    s2d=True additionally rewrites conv0 to the space-to-depth layout
    (pair with create_model("attention", fused=True, s2d=True)). Measured on
    v5e this
    LOSES ~20ms per 512x128-frame batch: the in-graph 2x2 block transpose is
    a full-HBM relayout pass of the 3.2GB activation, costing more than the
    75->108-lane contraction widening saves (XLA already lays conv1 out with
    N in the lane dim, so the 3-channel input was never actually lane-padded).
    Kept for documentation/regression; default off.
    """
    params = dict(variables["params"])
    stats = variables.get("batch_stats", {})
    if model_type == "attention":
        se = dict(params["spatial_encoder"])
        se_stats = stats["spatial_encoder"]
        for i in range(4):
            se[f"conv{i}"] = _fold_conv_bn(se, se_stats, f"conv{i}", f"bn{i}")
            del se[f"bn{i}"]
        if s2d:
            k5 = se["conv0"]["conv"]["kernel"]
            se["conv0"] = {
                "conv": {
                    "kernel": space_to_depth_kernel(np.asarray(k5)),
                    "bias": se["conv0"]["conv"]["bias"],
                }
            }
        params["spatial_encoder"] = se
        for b in range(2):
            name = f"temporal_conv_blocks_{b}"
            tb = dict(params[name])
            tb_stats = stats[name]
            for j in range(4):
                tb[f"conv{j}"] = _fold_conv_bn(tb, tb_stats, f"conv{j}", f"bn{j}")
                del tb[f"bn{j}"]
            params[name] = tb
    elif model_type in ("3d", "cnn3d"):
        for i in range(4):
            name = f"block{i}"
            blk = dict(params[name])
            # block{i} holds a TorchConv named "conv" (inner nn.Conv "conv").
            params[name] = {"conv": _fold_conv_bn(blk, stats[name], "conv", "bn")}
    else:
        raise ValueError(f"Unknown model type: {model_type}")
    return {"params": params}
