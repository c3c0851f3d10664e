"""Fused inference layout (models/fuse.py) computes the same function.

Gates the lossless-ness of BN folding + the space-to-depth first conv:
fused(x) must match standard eval forward to float-rounding tolerance, on
randomly-initialized weights with perturbed BN stats (so the fold is
non-trivial) for both model families.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_fingerprint_tpu.models import create_model
from video_fingerprint_tpu.models.fuse import fuse_variables, space_to_depth_kernel


def _perturbed_init(model, key=0):
    """init + random BN running stats (mean!=0, var!=1) to make folding real."""
    x = jnp.zeros((1, 8, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    rng = np.random.default_rng(3 + key)
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(
            rng.normal(0.0, 0.5, v.shape).astype(np.float32) ** 2 + 0.5
            if v.ndim else v
        ),
        variables["batch_stats"],
    )
    return {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("model_type,kwargs", [
    ("attention", {}),
    ("3d", {"frame_stride": 16}),
])
def test_fused_matches_standard(model_type, kwargs):
    model = create_model(model_type, **kwargs)
    variables = _perturbed_init(model)
    fused_model = create_model(model_type, fused=True, **kwargs)
    fused_vars = fuse_variables(variables, model_type)

    rng = np.random.default_rng(7)
    video = jnp.asarray(rng.random((2, 32, 64, 64, 3), dtype=np.float32))

    ref = np.asarray(jax.jit(model.apply)(variables, video))
    out = np.asarray(jax.jit(fused_model.apply)(fused_vars, video))

    cos = np.sum(ref * out, axis=1)
    assert cos.min() > 0.999999, cos
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_fused_tree_matches_fused_init():
    """fuse_variables must produce exactly the fused model's init tree."""
    model = create_model("attention")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    )
    fused_vars = fuse_variables(variables, "attention")
    fused_model = create_model("attention", fused=True)
    init_vars = fused_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    )

    def paths(tree):
        return {
            "/".join(str(k.key) for k in path): leaf.shape
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(fused_vars) == paths(init_vars)


def test_forward_flat_matches_call():
    """forward_flat on (B*T,...) == __call__ on (B,T,...), incl. u8 + mask."""
    model = create_model("attention")
    variables = _perturbed_init(model)
    rng = np.random.default_rng(11)
    video_u8 = jnp.asarray(
        (rng.random((3, 16, 64, 64, 3)) * 255).astype(np.uint8)
    )
    mask = jnp.asarray(rng.random((3, 16)) > 0.3)

    ref = np.asarray(model.apply(variables, video_u8, mask=mask))
    flat = video_u8.reshape((-1,) + video_u8.shape[2:])
    out = np.asarray(
        model.apply(variables, flat, 3, mask=mask, method="forward_flat")
    )
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_fused_bf16_flat_torch_golden():
    """The full production scan config (fused + forward_flat [+ bf16]) still
    clears the >=0.999 cosine gate against the torch reference goldens."""
    from tests.conftest import FIXTURE_DIR
    from video_fingerprint_tpu.utils.torch_compat import state_dict_to_variables

    fx = FIXTURE_DIR / "attention_parity.npz"
    if not fx.exists():
        pytest.skip("torch fixtures unavailable")
    z = np.load(fx)
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    variables = state_dict_to_variables(sd, "attention")
    fused_vars = fuse_variables(variables, "attention")

    for dtype, gate in [(None, 0.99999), (jnp.bfloat16, 0.999)]:
        fm = create_model("attention", fused=True, dtype=dtype)
        fwd = jax.jit(
            lambda v, x, b: fm.apply(v, x, b, method="forward_flat"),
            static_argnums=2,
        )
        for case in [k for k in z.files if k.startswith("in_")]:
            video = jnp.asarray(z[case]).transpose(0, 1, 3, 4, 2)
            flat = video.reshape((-1,) + video.shape[2:])
            emb = np.asarray(fwd(fused_vars, flat, video.shape[0]))
            ref = z[case.replace("in_", "out_")]
            cos = np.sum(emb * ref, axis=1) / (
                np.linalg.norm(emb, axis=1) * np.linalg.norm(ref, axis=1)
            )
            assert cos.min() > gate, f"{case} dtype={dtype} cos={cos.min()}"


def test_space_to_depth_kernel_is_exact():
    """The 5x5-s2 -> 3x3-s1 rewrite is bit-identical conv arithmetic."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, 64, 64, 3), dtype=np.float32))
    k5 = jnp.asarray(rng.random((5, 5, 3, 8), dtype=np.float32) - 0.5)

    y_ref = jax.lax.conv_general_dilated(
        x, k5, (2, 2), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    n, h, w, c = x.shape
    xs = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, h // 2, w // 2, 4 * c)
    k3 = jnp.asarray(space_to_depth_kernel(np.asarray(k5)))
    y = jax.lax.conv_general_dilated(
        xs, k3, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fused_bf16_3d_torch_golden():
    """The 3D fused layout (+ bf16) clears the cosine gate vs torch goldens."""
    from tests.conftest import FIXTURE_DIR
    from video_fingerprint_tpu.utils.torch_compat import state_dict_to_variables

    fx = FIXTURE_DIR / "cnn3d_parity.npz"
    if not fx.exists():
        pytest.skip("torch fixtures unavailable")
    z = np.load(fx)
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    variables = state_dict_to_variables(sd, "3d")
    fused_vars = fuse_variables(variables, "3d")

    for dtype, gate in [(None, 0.99999), (jnp.bfloat16, 0.999)]:
        fm = create_model("3d", frame_stride=16, fused=True, dtype=dtype)
        fwd = jax.jit(fm.apply)
        for case in [k for k in z.files if k.startswith("in_")]:
            video = jnp.asarray(z[case]).transpose(0, 1, 3, 4, 2)
            emb = np.asarray(fwd(fused_vars, video))
            ref = z[case.replace("in_", "out_")]
            cos = np.sum(emb * ref, axis=1) / (
                np.linalg.norm(emb, axis=1) * np.linalg.norm(ref, axis=1)
            )
            assert cos.min() > gate, f"{case} dtype={dtype} cos={cos.min()}"


def test_fused_s2d_model_matches_standard():
    """The full s2d layout is constructible end-to-end:
    create_model(fused=True, s2d=True) + fuse_variables(s2d=True) computes
    the same function as the standard eval forward."""
    model = create_model("attention")
    variables = _perturbed_init(model)
    fused_model = create_model("attention", fused=True, s2d=True)
    fused_vars = fuse_variables(variables, "attention", s2d=True)

    rng = np.random.default_rng(13)
    video = jnp.asarray(rng.random((2, 16, 64, 64, 3), dtype=np.float32))
    ref = np.asarray(jax.jit(model.apply)(variables, video))
    out = np.asarray(jax.jit(fused_model.apply)(fused_vars, video))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
