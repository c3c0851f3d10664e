"""Model-level sanity tests: shapes, normalization, determinism, masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_fingerprint_tpu.models import create_model


def _apply(model, variables, video, **kw):
    return jax.jit(lambda v, x: model.apply(v, x, **kw))(variables, video)


def _init_and_run(model, video, **apply_kwargs):
    variables = model.init(jax.random.PRNGKey(0), video)
    return variables, _apply(model, variables, video, **apply_kwargs)


@pytest.mark.parametrize("model_type", ["attention", "3d"])
def test_output_shape_and_norm(model_type):
    model = create_model(model_type)
    video = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 64, 64, 3))
    _, emb = _init_and_run(model, video)
    assert emb.shape == (2, 256)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_attention_deterministic_eval():
    model = create_model("attention")
    video = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), video)
    fwd = jax.jit(model.apply)
    emb1 = fwd(variables, video)
    emb2 = fwd(variables, video)
    np.testing.assert_array_equal(np.asarray(emb1), np.asarray(emb2))


def test_attention_param_count_matches_reference():
    # Reference prints 3,959,169 params for the attention default config
    # (train.py:597-600; recorded in SURVEY.md §6).
    model = create_model("attention")
    video = jnp.zeros((1, 4, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), video)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert n == 3_959_169


def test_3d_param_count_matches_reference():
    # Reference prints 409,170 params for the 3D default factory config
    # (frame_stride=16, model.py:606).
    model = create_model("3d")
    video = jnp.zeros((1, 16, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), video)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert n == 409_170


def test_attention_mask_equals_unpadded():
    """A masked padded batch must equal the unpadded forward (our improvement
    over the reference's pad-pollution, SURVEY.md §7 hard parts)."""
    model = create_model("attention")
    T_real, T_pad = 12, 20
    video = jax.random.uniform(jax.random.PRNGKey(3), (1, T_real, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), video)
    emb_ref = model.apply(variables, video)

    padded = jnp.pad(video, ((0, 0), (0, T_pad - T_real), (0, 0), (0, 0), (0, 0)))
    mask = jnp.arange(T_pad)[None, :] < T_real
    emb_masked = model.apply(variables, padded, mask=mask)
    cos = float(jnp.sum(emb_ref * emb_masked))
    assert cos > 0.9999, cos


def test_3d_temporal_padding_consistency():
    """T not divisible by frame_stride is zero-padded (model.py:479-482)."""
    model = create_model("3d", frame_stride=16)
    video = jax.random.uniform(jax.random.PRNGKey(4), (1, 20, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), video)
    emb_a = model.apply(variables, video)
    padded = jnp.pad(video, ((0, 0), (0, 12), (0, 0), (0, 0), (0, 0)))
    emb_b = model.apply(variables, padded)
    np.testing.assert_allclose(np.asarray(emb_a), np.asarray(emb_b), atol=1e-5)


@pytest.mark.slow
def test_train_mode_updates_batch_stats():
    model = create_model("attention")
    video = jax.random.uniform(jax.random.PRNGKey(5), (2, 8, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), video)
    out, mutated = model.apply(
        variables, video, train=True,
        rngs={"dropout": jax.random.PRNGKey(7)},
        mutable=["batch_stats"],
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed
