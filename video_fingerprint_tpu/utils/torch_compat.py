"""PyTorch checkpoint interop.

Converts a reference `model_state_dict` (train.py:542 / fingerprint.py:70 key
layout) into this framework's flax variables ({'params', 'batch_stats'}), so
reference-trained `.pth` checkpoints can be served by the TPU scanner and the
>=0.999 cosine-agreement gate (BASELINE.md north star) can be tested directly.

All transforms are pure layout changes:
  conv2d  torch (O,I,kh,kw)    -> flax (kh,kw,I,O)
  conv3d  torch (O,I,kd,kh,kw) -> flax (kd,kh,kw,I,O)
  conv1d  torch (O,I/g,k)      -> flax (k,I/g,O)
  linear  torch (O,I)          -> flax (I,O)
  conv1d k=1 used as pointwise -> linear (squeeze kernel dim)
  MHA in_proj_weight (3C,C)    -> (C,3C); row blocks [q;k;v] become column blocks.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(w):  # linear
    return np.ascontiguousarray(w.T)


def _conv1d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _conv2d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv3d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _pointwise(w):  # conv1d k=1 -> dense
    return np.ascontiguousarray(w[:, :, 0].T)


def _set(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def _linear(params, sd, torch_key, our_path):
    _set(params, f"{our_path}/dense/kernel", _t(sd[f"{torch_key}.weight"]))
    _set(params, f"{our_path}/dense/bias", sd[f"{torch_key}.bias"])


def _bn(params, stats, sd, torch_key, our_path):
    _set(params, f"{our_path}/scale", sd[f"{torch_key}.weight"])
    _set(params, f"{our_path}/bias", sd[f"{torch_key}.bias"])
    _set(stats, f"{our_path}/mean", sd[f"{torch_key}.running_mean"])
    _set(stats, f"{our_path}/var", sd[f"{torch_key}.running_var"])


def attention_state_dict_to_variables(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference VideoFingerprintAttention state_dict -> flax variables."""
    params: Dict = {}
    stats: Dict = {}

    # SpatialEncoder: Sequential indices 0/3/6/9 convs, 1/4/7/10 BNs, 14 Linear
    # (reference model.py:96-118).
    for i, (conv_idx, bn_idx) in enumerate([(0, 1), (3, 4), (6, 7), (9, 10)]):
        _set(params, f"spatial_encoder/conv{i}/conv/kernel",
             _conv2d(sd[f"spatial_encoder.encoder.{conv_idx}.weight"]))
        _set(params, f"spatial_encoder/conv{i}/conv/bias",
             sd[f"spatial_encoder.encoder.{conv_idx}.bias"])
        _bn(params, stats, sd, f"spatial_encoder.encoder.{bn_idx}",
            f"spatial_encoder/bn{i}")
    _linear(params, sd, "spatial_encoder.encoder.14", "spatial_encoder/proj")

    _linear(params, sd, "temporal_projection", "temporal_projection")

    # 2x TemporalConvBlock with 4 branches each (model.py:201-205).
    for b in range(2):
        for j in range(4):
            tk = f"temporal_conv_blocks.{b}.convs.{j}"
            op = f"temporal_conv_blocks_{b}"
            _set(params, f"{op}/conv{j}/conv/kernel", _conv1d(sd[f"{tk}.0.weight"]))
            _set(params, f"{op}/conv{j}/conv/bias", sd[f"{tk}.0.bias"])
            _bn(params, stats, sd, f"{tk}.1", f"{op}/bn{j}")

    # Attention blocks (model.py:124-152).
    n_blocks = len({k.split(".")[1] for k in sd if k.startswith("attention_blocks.")})
    for i in range(n_blocks):
        tk = f"attention_blocks.{i}"
        op = f"attention_blocks_{i}"
        for norm in ("norm1", "norm2"):
            _set(params, f"{op}/{norm}/scale", sd[f"{tk}.{norm}.weight"])
            _set(params, f"{op}/{norm}/bias", sd[f"{tk}.{norm}.bias"])
        _set(params, f"{op}/attn/in_proj_kernel", _t(sd[f"{tk}.attn.in_proj_weight"]))
        _set(params, f"{op}/attn/in_proj_bias", sd[f"{tk}.attn.in_proj_bias"])
        _linear(params, sd, f"{tk}.attn.out_proj", f"{op}/attn/out_proj")
        # 1x1 Conv1d MLP -> pointwise Dense.
        _set(params, f"{op}/conv1/dense/kernel", _pointwise(sd[f"{tk}.conv1.weight"]))
        _set(params, f"{op}/conv1/dense/bias", sd[f"{tk}.conv1.bias"])
        _set(params, f"{op}/conv2/dense/kernel", _pointwise(sd[f"{tk}.conv2.weight"]))
        _set(params, f"{op}/conv2/dense/bias", sd[f"{tk}.conv2.bias"])

    # temporal_pool: Sequential(Conv1d k=1, ReLU) (model.py:215-217).
    _set(params, "temporal_pool/dense/kernel", _pointwise(sd["temporal_pool.0.weight"]))
    _set(params, "temporal_pool/dense/bias", sd["temporal_pool.0.bias"])

    _linear(params, sd, "final_projection.0", "final_projection_1")
    _linear(params, sd, "final_projection.3", "final_projection_2")

    _set(params, "temperature", sd["temperature"])

    return {"params": params, "batch_stats": stats}


def cnn3d_state_dict_to_variables(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference VideoFingerprint3D state_dict -> flax variables."""
    params: Dict = {}
    stats: Dict = {}

    for i in range(4):  # Conv3DBlocks at encoder indices 0..3 (model.py:414-436).
        tk = f"encoder.{i}"
        op = f"block{i}"
        _set(params, f"{op}/conv/conv/kernel", _conv3d(sd[f"{tk}.conv.weight"]))
        _set(params, f"{op}/conv/conv/bias", sd[f"{tk}.conv.bias"])
        _bn(params, stats, sd, f"{tk}.bn", f"{op}/bn")

    _set(params, "temporal_conv/conv/kernel", _conv1d(sd["temporal_conv.weight"]))
    _set(params, "temporal_conv/conv/bias", sd["temporal_conv.bias"])
    _set(params, "temporal_attention/conv/kernel", _conv1d(sd["temporal_attention.weight"]))
    _set(params, "temporal_attention/conv/bias", sd["temporal_attention.bias"])

    _linear(params, sd, "projector.0", "projector_1")
    _linear(params, sd, "projector.3", "projector_2")

    _set(params, "temperature", sd["temperature"])

    return {"params": params, "batch_stats": stats}


def state_dict_to_variables(sd: Mapping[str, np.ndarray], model_type: str) -> Dict:
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if model_type == "attention":
        return attention_state_dict_to_variables(sd)
    if model_type in ("3d", "cnn3d"):
        return cnn3d_state_dict_to_variables(sd)
    raise ValueError(f"Unknown model type: {model_type}")


def _get(tree, path: str):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return np.asarray(node)


def attention_variables_to_state_dict(variables) -> Dict[str, np.ndarray]:
    """Reverse conversion: flax variables -> reference state_dict layout, so
    checkpoints trained here can be served by the original PyTorch scanner."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}

    def put_linear(our_path, torch_key):
        sd[f"{torch_key}.weight"] = _t(_get(params, f"{our_path}/dense/kernel"))
        sd[f"{torch_key}.bias"] = _get(params, f"{our_path}/dense/bias")

    def put_bn(our_path, torch_key):
        sd[f"{torch_key}.weight"] = _get(params, f"{our_path}/scale")
        sd[f"{torch_key}.bias"] = _get(params, f"{our_path}/bias")
        sd[f"{torch_key}.running_mean"] = _get(stats, f"{our_path}/mean")
        sd[f"{torch_key}.running_var"] = _get(stats, f"{our_path}/var")
        sd[f"{torch_key}.num_batches_tracked"] = np.asarray(0, np.int64)

    for i, (conv_idx, bn_idx) in enumerate([(0, 1), (3, 4), (6, 7), (9, 10)]):
        w = _get(params, f"spatial_encoder/conv{i}/conv/kernel")
        sd[f"spatial_encoder.encoder.{conv_idx}.weight"] = np.transpose(w, (3, 2, 0, 1))
        sd[f"spatial_encoder.encoder.{conv_idx}.bias"] = _get(
            params, f"spatial_encoder/conv{i}/conv/bias")
        put_bn(f"spatial_encoder/bn{i}", f"spatial_encoder.encoder.{bn_idx}")
    put_linear("spatial_encoder/proj", "spatial_encoder.encoder.14")
    put_linear("temporal_projection", "temporal_projection")

    for b in range(2):
        for j in range(4):
            op = f"temporal_conv_blocks_{b}"
            tk = f"temporal_conv_blocks.{b}.convs.{j}"
            w = _get(params, f"{op}/conv{j}/conv/kernel")  # (k, in/g, out)
            sd[f"{tk}.0.weight"] = np.transpose(w, (2, 1, 0))
            sd[f"{tk}.0.bias"] = _get(params, f"{op}/conv{j}/conv/bias")
            put_bn(f"{op}/bn{j}", f"{tk}.1")

    n_blocks = len([k for k in params if k.startswith("attention_blocks_")])
    for i in range(n_blocks):
        op = f"attention_blocks_{i}"
        tk = f"attention_blocks.{i}"
        for norm in ("norm1", "norm2"):
            sd[f"{tk}.{norm}.weight"] = _get(params, f"{op}/{norm}/scale")
            sd[f"{tk}.{norm}.bias"] = _get(params, f"{op}/{norm}/bias")
        sd[f"{tk}.attn.in_proj_weight"] = _t(_get(params, f"{op}/attn/in_proj_kernel"))
        sd[f"{tk}.attn.in_proj_bias"] = _get(params, f"{op}/attn/in_proj_bias")
        put_linear(f"{op}/attn/out_proj", f"{tk}.attn.out_proj")
        for conv in ("conv1", "conv2"):
            w = _t(_get(params, f"{op}/{conv}/dense/kernel"))  # (out, in)
            sd[f"{tk}.{conv}.weight"] = w[:, :, None]  # conv1d k=1
            sd[f"{tk}.{conv}.bias"] = _get(params, f"{op}/{conv}/dense/bias")

    w = _t(_get(params, "temporal_pool/dense/kernel"))
    sd["temporal_pool.0.weight"] = w[:, :, None]
    sd["temporal_pool.0.bias"] = _get(params, "temporal_pool/dense/bias")
    put_linear("final_projection_1", "final_projection.0")
    put_linear("final_projection_2", "final_projection.3")
    sd["temperature"] = _get(params, "temperature")

    # The reference registers the sinusoidal table as a PERSISTENT buffer
    # (model.py:86 register_buffer), so its strict load_state_dict
    # (fingerprint.py:70) requires the key. It is deterministic: max_len
    # 10000 x d_model=temporal_dim, shape (1, 10000, C) (model.py:74-89).
    from video_fingerprint_tpu.models.layers import _sinusoidal_table

    temporal_dim = _get(params, "temporal_projection/dense/kernel").shape[1]
    sd["pos_encoding.pe"] = _sinusoidal_table(10000, temporal_dim)[None, :, :]
    return sd


def cnn3d_variables_to_state_dict(variables) -> Dict[str, np.ndarray]:
    """Reverse conversion for VideoFingerprint3D (model.py:406-512 layout)."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}

    for i in range(4):
        w = _get(params, f"block{i}/conv/conv/kernel")  # (kd,kh,kw,in,out)
        sd[f"encoder.{i}.conv.weight"] = np.transpose(w, (4, 3, 0, 1, 2))
        sd[f"encoder.{i}.conv.bias"] = _get(params, f"block{i}/conv/conv/bias")
        sd[f"encoder.{i}.bn.weight"] = _get(params, f"block{i}/bn/scale")
        sd[f"encoder.{i}.bn.bias"] = _get(params, f"block{i}/bn/bias")
        sd[f"encoder.{i}.bn.running_mean"] = _get(stats, f"block{i}/bn/mean")
        sd[f"encoder.{i}.bn.running_var"] = _get(stats, f"block{i}/bn/var")
        sd[f"encoder.{i}.bn.num_batches_tracked"] = np.asarray(0, np.int64)

    for name in ("temporal_conv", "temporal_attention"):
        w = _get(params, f"{name}/conv/kernel")  # (k, in, out)
        sd[f"{name}.weight"] = np.transpose(w, (2, 1, 0))
        sd[f"{name}.bias"] = _get(params, f"{name}/conv/bias")

    for our, torch_key in (("projector_1", "projector.0"), ("projector_2", "projector.3")):
        sd[f"{torch_key}.weight"] = _t(_get(params, f"{our}/dense/kernel"))
        sd[f"{torch_key}.bias"] = _get(params, f"{our}/dense/bias")
    sd["temperature"] = _get(params, "temperature")
    return sd


def variables_to_state_dict(variables, model_type: str) -> Dict[str, np.ndarray]:
    if model_type == "attention":
        return attention_variables_to_state_dict(variables)
    if model_type in ("3d", "cnn3d"):
        return cnn3d_variables_to_state_dict(variables)
    raise ValueError(f"Unknown model type: {model_type}")


def load_torch_checkpoint(path: str):
    """Load a reference `.pth` checkpoint -> (variables, config dict).

    Requires torch at call time (gated import: torch is only needed for
    interop, never on the TPU compute path).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    config = ckpt.get("config", {})
    sd = {k: v.detach().cpu().numpy() for k, v in ckpt["model_state_dict"].items()
          if k != "pos_encoding.pe"}
    model_type = config.get("model_type", "attention")
    return state_dict_to_variables(sd, model_type), config
