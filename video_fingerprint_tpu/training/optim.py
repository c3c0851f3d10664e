"""Optimizer construction: optax chains matching the reference's recipe (C19).

- global grad-norm clip 1.0 (train.py:224, :229) applied before Adam;
- AdamW betas (0.9, 0.999), weight decay 1e-4 on all params (train.py:54-59);
- attention model: per-module LR groups via optax.multi_transform —
  spatial_encoder x0.1, attention_blocks x0.5, rest x1.0 (train.py:33-50,
  :787-788) — with the reference's batch-stepped 10%-warmup cosine schedule
  floored at 0.1 (train.py:67-79);
- 3D model: epoch-stepped cosine annealing to lr*0.01 (train.py:61-66) —
  expressed per-step via steps_per_epoch so the whole thing stays inside one
  jitted train step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_floor(base_lr: float, total_steps: int, floor: float = 0.1):
    """Reference lr_lambda (train.py:71-77): linear warmup for the first 10%
    of steps, then cosine decay floored at `floor` of base."""
    warmup = max(1, total_steps // 10)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup
        progress = (step - warmup) / max(1, total_steps - warmup)
        cos = jnp.maximum(floor, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        return base_lr * jnp.where(step < warmup, warm, cos)

    return schedule


def epoch_cosine_annealing(base_lr: float, epochs: int, steps_per_epoch: int,
                           eta_min_ratio: float = 0.01):
    """torch CosineAnnealingLR stepped per epoch (train.py:61-66, :613-614)."""
    eta_min = base_lr * eta_min_ratio

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) // max(1, steps_per_epoch)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * jnp.minimum(epoch, epochs) / max(1, epochs))
        )

    return schedule


def _attention_param_labels(params) -> Any:
    """spatial / attention / other, keyed on the top-level module name
    (mirrors the reference's named_parameters split, train.py:33-50)."""

    def label_tree(tree, top):
        if top.startswith("spatial_encoder"):
            lbl = "spatial"
        elif top.startswith("attention_blocks"):
            lbl = "attention"
        else:
            lbl = "other"
        return jax.tree.map(lambda _: lbl, tree)

    return {k: label_tree(v, k) for k, v in params.items()}


def make_optimizer(
    model_type: str,
    params,
    learning_rate: float,
    weight_decay: float = 1e-4,
    total_steps: int = 10_000,
    epochs: int = 50,
    steps_per_epoch: int = 100,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    if model_type == "attention":
        def group(factor):
            return optax.adamw(
                learning_rate=warmup_cosine_floor(learning_rate * factor, total_steps),
                b1=0.9, b2=0.999, weight_decay=weight_decay,
            )

        tx = optax.multi_transform(
            {"spatial": group(0.1), "attention": group(0.5), "other": group(1.0)},
            _attention_param_labels(params),
        )
    else:
        tx = optax.adamw(
            learning_rate=epoch_cosine_annealing(
                learning_rate, epochs, steps_per_epoch
            ),
            b1=0.9, b2=0.999, weight_decay=weight_decay,
        )
    return optax.chain(optax.clip_by_global_norm(grad_clip), tx)


def current_lr(model_type: str, learning_rate: float, step: int,
               total_steps: int, epochs: int, steps_per_epoch: int) -> float:
    """Host-side mirror of the schedule for logging (train.py:256-258)."""
    if model_type == "attention":
        sched = warmup_cosine_floor(learning_rate, total_steps)
    else:
        sched = epoch_cosine_annealing(learning_rate, epochs, steps_per_epoch)
    return float(sched(step))
