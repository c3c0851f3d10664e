"""Checkpointing with the reference's artifact semantics (C21).

Artifacts per run (reference train.py:538-568):
  checkpoints/last.ckpt            every epoch
  checkpoints/best.ckpt            on AUC-ROC improvement (+ best_metrics.json)
  checkpoints/epoch_N.ckpt         every 5 epochs (+ epoch_N_metrics.json)

A checkpoint embeds the full config (the L4->L5 contract: the scanner rebuilds
the model purely from it, reference fingerprint.py:51-72) plus optimizer state
and step counters so resume restores everything (train.py:849-863).

Format: a single msgpack file (flax.serialization) with sections:
  model:  {params, batch_stats}        — plain array trees
  train:  {opt_state_state_dict, epoch, global_step, bests}  — optional
  config: JSON string
  metrics: JSON string (optional)

`load_any` additionally accepts reference `.pth` checkpoints (torch interop)
so reference-trained models can be served / resumed-from directly.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _build_payload(
    params, batch_stats, config, opt_state_sd, epoch, global_step, bests, metrics
) -> Dict[str, Any]:
    """Shared payload schema for both checkpoint backends."""
    return {
        "model": {
            "params": _to_numpy_tree(params),
            "batch_stats": _to_numpy_tree(batch_stats),
        },
        "train": {
            "opt_state": _to_numpy_tree(opt_state_sd) if opt_state_sd is not None else {},
            "epoch": epoch,
            "global_step": global_step,
            "bests": bests or {},
        },
        "config_json": json.dumps(config, default=str),
        "metrics_json": json.dumps(metrics, default=float) if metrics else "",
    }


def save_checkpoint(
    path: Path | str,
    params,
    batch_stats,
    config: Dict[str, Any],
    opt_state_sd: Optional[Dict] = None,
    epoch: int = 0,
    global_step: int = 0,
    bests: Optional[Dict[str, float]] = None,
    metrics: Optional[Dict] = None,
) -> None:
    payload = _build_payload(
        params, batch_stats, config, opt_state_sd, epoch, global_step, bests, metrics
    )
    data = serialization.msgpack_serialize(payload)
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)  # atomic publish: a crash never corrupts last.ckpt


def load_checkpoint(path: Path | str) -> Dict[str, Any]:
    payload = serialization.msgpack_restore(Path(path).read_bytes())
    payload["config"] = json.loads(payload.pop("config_json") or "{}")
    mj = payload.pop("metrics_json", "")
    payload["metrics"] = json.loads(mj) if mj else None
    return payload


def save_checkpoint_orbax(
    path: Path | str,
    params,
    batch_stats,
    config: Dict[str, Any],
    opt_state_sd: Optional[Dict] = None,
    epoch: int = 0,
    global_step: int = 0,
    bests: Optional[Dict[str, float]] = None,
    metrics: Optional[Dict] = None,
) -> None:
    """Orbax backend: directory-based PyTree checkpoint (multi-host-safe
    writes, per-array files). Same payload schema as the msgpack format."""
    import orbax.checkpoint as ocp

    payload = _build_payload(
        params, batch_stats, config, opt_state_sd, epoch, global_step, bests, metrics
    )
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def load_checkpoint_orbax(path: Path | str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(Path(path).absolute())
    payload["config"] = json.loads(payload.pop("config_json") or "{}")
    mj = payload.pop("metrics_json", "")
    payload["metrics"] = json.loads(mj) if mj else None
    return payload


def load_any(path: Path | str) -> Tuple[Dict, Dict[str, Any]]:
    """Load ours (.ckpt msgpack file / Orbax directory) or a reference torch
    checkpoint (.pth). Returns (variables={'params','batch_stats'}, config).
    """
    path = Path(path)
    if path.is_dir():  # Orbax checkpoints are directories
        payload = load_checkpoint_orbax(path)
    elif path.suffix == ".pth" or _looks_like_torch(path):
        from video_fingerprint_tpu.utils.torch_compat import load_torch_checkpoint

        return load_torch_checkpoint(str(path))
    else:
        payload = load_checkpoint(path)
    model = payload["model"]
    return {"params": model["params"], "batch_stats": model["batch_stats"]}, payload["config"]


def _looks_like_torch(path: Path) -> bool:
    try:
        with open(path, "rb") as f:
            magic = f.read(4)
        return magic[:2] == b"PK"  # torch>=1.6 zipfile container
    except OSError:
        return False
