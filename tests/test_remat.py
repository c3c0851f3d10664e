"""Rematerialization: remat=True must give identical losses and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_remat_matches_plain():
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.optim import make_optimizer
    from video_fingerprint_tpu.training.train_step import (
        init_train_state,
        make_train_step,
    )

    model = create_model("attention")
    B, T, hw = 2, 8, 32
    state = init_train_state(model, None, jax.random.PRNGKey(0), (1, T, hw, hw, 3))
    tx = make_optimizer("attention", state.params, 1e-3, total_steps=10)
    state = state.replace(opt_state=tx.init(state.params))

    batch = {
        "clip1": jax.random.uniform(jax.random.PRNGKey(1), (B, T, hw, hw, 3)),
        "clip2": jax.random.uniform(jax.random.PRNGKey(2), (B, T, hw, hw, 3)),
        "video_id": jnp.arange(B),
        "mask1": jnp.ones((B, T), bool),
        "mask2": jnp.ones((B, T), bool),
    }
    rng = jax.random.PRNGKey(3)

    plain = jax.jit(make_train_step(model, tx, "attention", remat=False))
    rem = jax.jit(make_train_step(model, tx, "attention", remat=True))
    s1, m1 = plain(state, batch, rng)
    s2, m2 = rem(state, batch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
    a = jax.tree.leaves(s1.params)[0]
    b = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
