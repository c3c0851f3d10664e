"""Fused train step: single-device and DP-sharded over the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _make(model_type, B=2, T=8, hw=32):
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.optim import make_optimizer
    from video_fingerprint_tpu.training.train_step import (
        init_train_state,
        make_train_step,
    )

    model = create_model(model_type, frame_stride=4)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, None, rng, (1, T, hw, hw, 3))
    tx = make_optimizer(model_type, state.params, learning_rate=1e-3,
                        total_steps=100, epochs=2, steps_per_epoch=10)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, model_type)
    batch = {
        "clip1": jax.random.uniform(jax.random.PRNGKey(1), (B, T, hw, hw, 3)),
        "clip2": jax.random.uniform(jax.random.PRNGKey(2), (B, T, hw, hw, 3)),
        "video_id": jnp.arange(B) % max(1, B // 2),
        "mask1": jnp.ones((B, T), bool),
        "mask2": jnp.ones((B, T), bool),
    }
    return model, state, step, batch


@pytest.mark.parametrize("model_type", [
    pytest.param("attention", marks=pytest.mark.slow),  # 42s cold; 3d (14s)
    "3d",                                               # keeps fast coverage
])
def test_train_step_updates(model_type):
    _, state, step, batch = _make(model_type)
    jstep = jax.jit(step)
    new_state, metrics = jstep(state, batch, jax.random.PRNGKey(3))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert 0.0 <= float(metrics["acc"]) <= 1.0
    # second step runs from the new state; warmup LR is 0 at step 0 (torch
    # LambdaLR semantics), so check param movement after step 2.
    new_state2, metrics2 = jstep(new_state, batch, jax.random.PRNGKey(3))
    assert int(new_state2.step) == 2
    assert np.isfinite(float(metrics2["loss"]))
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).sum()), state.params, new_state2.params
        ),
    )
    assert diff > 0


def test_train_step_device_augment_bf16():
    """--device_augment composes with --bf16: augmentation runs in f32 on the
    normalized clips, the model computes in bfloat16 — one finite fused step
    with moving params (the combination has no dedicated trajectory run, so
    pin it here)."""
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.optim import make_optimizer
    from video_fingerprint_tpu.training.train_step import (
        init_train_state,
        make_train_step,
    )

    B, T, hw = 2, 8, 32
    model = create_model("attention", dtype=jnp.bfloat16)
    state = init_train_state(model, None, jax.random.PRNGKey(0),
                             (1, T, hw, hw, 3))
    tx = make_optimizer("attention", state.params, learning_rate=1e-3,
                        total_steps=100, epochs=2, steps_per_epoch=10)
    state = state.replace(opt_state=tx.init(state.params))
    step = jax.jit(make_train_step(model, tx, "attention",
                                   device_augment=True))
    batch = {
        # uint8 clips like the device-augment loader ships them
        "clip1": jax.random.randint(jax.random.PRNGKey(1),
                                    (B, T, hw, hw, 3), 0, 256, jnp.uint8),
        "clip2": jax.random.randint(jax.random.PRNGKey(2),
                                    (B, T, hw, hw, 3), 0, 256, jnp.uint8),
        "video_id": jnp.arange(B),
        "mask1": jnp.ones((B, T), bool),
        "mask2": jnp.ones((B, T), bool),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    new_state2, metrics2 = step(new_state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics2["loss"]))
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     state.params, new_state2.params),
    )
    assert diff > 0


@pytest.mark.slow
def test_train_step_data_parallel_matches_single():
    """DP-sharded step over the 8-device mesh: runs, and grads/params equal
    the single-device result (GSPMD global semantics incl. sync-BN)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_fingerprint_tpu.parallel.mesh import make_mesh

    _, state, step, batch = _make("attention", B=8)
    rng = jax.random.PRNGKey(3)

    single = jax.jit(step)(state, batch, rng)

    mesh = make_mesh("data")
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    sharded_batch = {
        k: jax.device_put(v, bsh) for k, v in batch.items()
    }
    sharded_state = jax.device_put(state, repl)
    dp = jax.jit(step)(sharded_state, sharded_batch, jax.device_put(rng, repl))

    np.testing.assert_allclose(
        float(single[1]["loss"]), float(dp[1]["loss"]), rtol=1e-4
    )
    a = jax.tree.leaves(single[0].params)[0]
    b = jax.tree.leaves(dp[0].params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_step():
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.train_step import make_eval_step

    model = create_model("attention")
    B, T, hw = 2, 8, 32
    video = jnp.zeros((1, T, hw, hw, 3))
    variables = model.init(jax.random.PRNGKey(0), video)
    eval_step = jax.jit(make_eval_step(model, "attention"))
    batch = {
        "clip1": jax.random.uniform(jax.random.PRNGKey(1), (B, T, hw, hw, 3)),
        "clip2": jax.random.uniform(jax.random.PRNGKey(2), (B, T, hw, hw, 3)),
    }
    out, emb1, emb2 = eval_step(
        variables["params"], variables["batch_stats"], batch, jax.random.PRNGKey(4)
    )
    assert emb1.shape == (B, 256) and emb2.shape == (B, 256)
    assert np.isfinite(float(out["loss"]))
    assert float(out["loss_triplet"]) == 0.0  # no video_ids in validation


def test_eval_step_reuse_extract_features_exact():
    """Feature-reuse eval (the default) == the two-pixel-forwards path.

    Exactness holds because the spatial encoder is per-frame (context
    independent), has no dropout, and eval BN uses running stats — so a
    gathered row of the full clip's feature map IS the gathered frame's
    encoding (models/attention.py::forward_from_features)."""
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.train_step import make_eval_step

    model = create_model("attention")
    B, T, hw = 3, 10, 32
    video = jnp.zeros((1, T, hw, hw, 3))
    variables = model.init(jax.random.PRNGKey(0), video)
    lens = np.array([10, 7, 5])
    m = jnp.asarray(np.arange(T)[None, :] < lens[:, None])
    batch = {
        "clip1": jax.random.uniform(jax.random.PRNGKey(1), (B, T, hw, hw, 3)),
        "clip2": jax.random.uniform(jax.random.PRNGKey(2), (B, T, hw, hw, 3)),
        "mask1": m,
        "mask2": m,
    }
    key = jax.random.PRNGKey(4)
    out_px, e1_px, e2_px = jax.jit(
        make_eval_step(model, "attention", reuse_extract_features=False)
    )(variables["params"], variables["batch_stats"], batch, key)
    out_ru, e1_ru, e2_ru = jax.jit(
        make_eval_step(model, "attention", reuse_extract_features=True)
    )(variables["params"], variables["batch_stats"], batch, key)
    np.testing.assert_allclose(np.asarray(e1_px), np.asarray(e1_ru), atol=2e-6)
    np.testing.assert_allclose(np.asarray(e2_px), np.asarray(e2_ru), atol=2e-6)
    np.testing.assert_allclose(
        float(out_px["loss"]), float(out_ru["loss"]), rtol=1e-5)


@pytest.mark.slow  # two full attention train-step compiles
def test_train_step_reuse_extract_features():
    """reuse_extract_features: with extract_ratio=1.0 the extract batch IS
    the full batch, so even encoder BatchNorm batch statistics coincide and
    the reuse step must match the two-pixel-forwards step exactly (loss,
    grads, updated params). At the default ratio it must still train
    (finite loss, nonzero grads)."""
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.optim import make_optimizer
    from video_fingerprint_tpu.training.train_step import (
        init_train_state,
        make_train_step,
    )

    model = create_model("attention")
    B, T, hw = 3, 10, 32
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, None, rng, (1, T, hw, hw, 3))
    tx = make_optimizer("attention", state.params, learning_rate=1e-3,
                        total_steps=100, epochs=2, steps_per_epoch=10)
    state = state.replace(opt_state=tx.init(state.params))
    lens = np.array([10, 7, 5])
    m = jnp.asarray(np.arange(T)[None, :] < lens[:, None])
    batch = {
        "clip1": jax.random.uniform(jax.random.PRNGKey(1), (B, T, hw, hw, 3)),
        "clip2": jax.random.uniform(jax.random.PRNGKey(2), (B, T, hw, hw, 3)),
        "video_id": jnp.arange(B),
        "mask1": m,
        "mask2": m,
    }
    key = jax.random.PRNGKey(7)

    s_px, m_px = jax.jit(make_train_step(
        model, tx, "attention", extract_ratio=1.0))(state, batch, key)
    s_ru, m_ru = jax.jit(make_train_step(
        model, tx, "attention", extract_ratio=1.0,
        reuse_extract_features=True))(state, batch, key)
    np.testing.assert_allclose(
        float(m_px["loss"]), float(m_ru["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_px["grad_norm"]), float(m_ru["grad_norm"]), rtol=1e-4)
    max_diff = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s_px.params, s_ru.params)))
    assert max_diff < 1e-6, max_diff

    # default ratio: approximation mode (encoder BN batch stats shared) —
    # must produce a finite training signal with gradients flowing.
    s3, m3 = jax.jit(make_train_step(
        model, tx, "attention", reuse_extract_features=True))(state, batch, key)
    assert np.isfinite(float(m3["loss"])) and float(m3["grad_norm"]) > 0
