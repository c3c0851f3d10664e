"""On-device augmentation (ops/device_augment.py): distribution parity with
the reference parameter table (dataset.py:246-353), per-transform correctness
vs cv2, and train-step integration (VERDICT r2 #2)."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_fingerprint_tpu.ops.device_augment import (
    apply_augmentations,
    augment_clips,
    sample_params,
)

B, T, HW = 4, 3, 64


def _identity_params(batch=B, size=HW):
    """All gates off: apply_augmentations becomes the identity."""
    z = jnp.zeros((batch,))
    return {
        "do_color": z, "brightness": z + 1.0, "contrast": z + 1.0,
        "saturation": z + 1.0, "hue_shift": z,
        "do_flip": z, "noise_level": z, "blur_idx": z.astype(jnp.int32),
        "do_letterbox": z, "letterbox_bar": z.astype(jnp.int32) + 5,
        "letterbox_vertical": z,
        "do_overlay": z,
        "overlay_box": jnp.tile(jnp.asarray([[5, 5, 10, 30]]), (batch, 1)),
        "do_rotation": z, "rotation_angle": z,
    }


@pytest.fixture(scope="module")
def clips():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((B, T, HW, HW, 3), np.float32))


def test_param_distribution_matches_reference_table():
    """Gate probabilities and parameter ranges == reference dataset.py:250-353
    (the same table the host sampler is tested against)."""
    n = 0
    agg = {k: 0.0 for k in ["color", "flip", "noise", "blur", "letterbox",
                            "overlay", "rotation"]}
    mins = {}
    maxs = {}
    for i in range(40):
        p = sample_params(jax.random.PRNGKey(i), 64, HW)
        n += 64
        agg["color"] += float(p["do_color"].sum())
        agg["flip"] += float(p["do_flip"].sum())
        agg["noise"] += float((p["noise_level"] > 0).sum())
        agg["blur"] += float((p["blur_idx"] > 0).sum())
        agg["letterbox"] += float(p["do_letterbox"].sum())
        agg["overlay"] += float(p["do_overlay"].sum())
        agg["rotation"] += float(p["do_rotation"].sum())
        for key in ["brightness", "contrast", "saturation", "hue_shift",
                    "letterbox_bar", "rotation_angle"]:
            arr = np.asarray(p[key], np.float32)
            mins[key] = min(mins.get(key, np.inf), arr.min())
            maxs[key] = max(maxs.get(key, -np.inf), arr.max())
        active = np.asarray(p["noise_level"])[np.asarray(p["noise_level"]) > 0]
        if active.size:
            assert active.min() >= 0.02 and active.max() <= 0.1
        box = np.asarray(p["overlay_box"])
        assert (box[:, 2] >= 10).all() and (box[:, 2] <= 20).all()
        assert (box[:, 3] >= 30).all() and (box[:, 3] <= 60).all()
        assert (box[:, 0] >= 0).all() and (box[:, 0] + 0 <= HW - 10).all()
        assert set(np.unique(np.asarray(p["blur_idx"]))) <= {0, 1, 2, 3}
    for key, expect in [("color", .7), ("flip", .5), ("noise", .3),
                        ("blur", .5), ("letterbox", .3), ("overlay", .2),
                        ("rotation", .2)]:
        assert abs(agg[key] / n - expect) < 0.04, (key, agg[key] / n)
    assert 0.5 <= mins["brightness"] and maxs["brightness"] <= 1.5
    assert 0.5 <= mins["contrast"] and maxs["contrast"] <= 1.5
    assert 0.5 <= mins["saturation"] and maxs["saturation"] <= 1.5
    assert -0.1 <= mins["hue_shift"] and maxs["hue_shift"] <= 0.1
    assert 5 <= mins["letterbox_bar"] and maxs["letterbox_bar"] <= 15
    assert -5 <= mins["rotation_angle"] and maxs["rotation_angle"] <= 5


def test_per_frame_sampling_granularity():
    """Letterbox bar+orientation, overlay box and rotation angle are drawn
    per FRAME (reference dataset.py:319-320, :328-331, :344): (B, T)-shaped
    with real variation along T. A per-clip draw (all frames of one clip
    identical) must fail here."""
    p = sample_params(jax.random.PRNGKey(0), 8, HW, num_frames=16)
    for key in ("letterbox_bar", "letterbox_vertical", "rotation_angle"):
        assert p[key].shape == (8, 16), key
    assert p["overlay_box"].shape == (8, 16, 4)
    bars = np.asarray(p["letterbox_bar"])
    assert (bars.std(axis=1) > 0).all()  # every clip varies along T
    box = np.asarray(p["overlay_box"], np.float32)
    assert (box.std(axis=1).sum(axis=-1) > 0).all()
    ang = np.asarray(p["rotation_angle"])
    gated = np.asarray(p["do_rotation"]) > 0
    if gated.any():
        assert (ang[gated].std(axis=1) > 0).all()
    assert (ang[~gated] == 0).all()
    # gates and color/noise/blur params stay per-clip
    for key in ("do_letterbox", "do_overlay", "do_rotation", "brightness",
                "contrast", "saturation", "hue_shift", "noise_level",
                "blur_idx"):
        assert p[key].shape == (8,), key


def test_per_frame_rotation_matches_cv2_per_frame():
    """(B, T) rotation angles: each frame is rotated by ITS angle, matching
    cv2.warpAffine frame-by-frame (reference draws the angle inside the
    per-frame loop, dataset.py:344)."""
    rng = np.random.default_rng(2)
    base = rng.random((HW, HW, 3), np.float32)
    clips_same = jnp.asarray(np.tile(base, (B, T, 1, 1, 1)).reshape(
        B, T, HW, HW, 3))
    angles = np.tile(np.linspace(-4.0, 4.0, T, dtype=np.float32)[None],
                     (B, 1))
    p = _identity_params()
    p["do_rotation"] = jnp.ones((B,))
    p["rotation_angle"] = jnp.asarray(angles)
    out = np.asarray(apply_augmentations(p, clips_same, jax.random.PRNGKey(0)))
    for t in range(T):
        M = cv2.getRotationMatrix2D((HW // 2, HW // 2), float(angles[0, t]), 1.0)
        ref = cv2.warpAffine(base, M, (HW, HW))
        diff = np.abs(out[0, t, 4:-4, 4:-4] - ref[4:-4, 4:-4])
        assert diff.max() < 1e-4, t
    # and frames genuinely differ from each other
    assert np.abs(out[0, 0] - out[0, -1]).max() > 0.01


def test_per_frame_letterbox_and_overlay_apply():
    """(B, T)-shaped letterbox/overlay params hit each frame with its own
    bar/box."""
    clips_ones = jnp.ones((B, T, HW, HW, 3), jnp.float32)
    p = _identity_params()
    p["do_letterbox"] = jnp.ones((B,))
    bars = jnp.asarray(np.tile(np.array([5, 9, 13], np.int32)[None], (B, 1)))
    p["letterbox_bar"] = bars
    p["letterbox_vertical"] = jnp.ones((B, T))
    out = np.asarray(apply_augmentations(p, clips_ones, jax.random.PRNGKey(0)))
    for t, bar in enumerate([5, 9, 13]):
        assert (out[0, t, :bar] == 0).all() and (out[0, t, -bar:] == 0).all()
        assert (out[0, t, bar:-bar] != 0).all()

    p = _identity_params()
    p["do_overlay"] = jnp.ones((B,))
    boxes = np.tile(np.array([[0, 0, 10, 30], [20, 20, 10, 30],
                              [40, 30, 12, 31]], np.int32)[None], (B, 1, 1))
    p["overlay_box"] = jnp.asarray(boxes)
    out = np.asarray(apply_augmentations(p, clips_ones, jax.random.PRNGKey(0)))
    for t in range(T):
        oy, ox, ohh, oww = boxes[0, t]
        np.testing.assert_allclose(out[0, t, oy:oy + ohh, ox:ox + oww], 1.0,
                                   atol=1e-6)
        # exactly oh*ow pixels touched per frame
        touched = (np.abs(out[0, t] - 1.0) < 1e-6).all(-1).sum()
        assert touched == HW * HW  # input is all-ones; overlay blends to 1.0
    # distinguish via a non-trivial input
    rngc = np.random.default_rng(0)
    clipsr = jnp.asarray(rngc.random((B, T, HW, HW, 3), np.float32) * 0.5)
    out = np.asarray(apply_augmentations(p, clipsr, jax.random.PRNGKey(0)))
    x = np.asarray(clipsr)
    for t in range(T):
        oy, ox, ohh, oww = boxes[0, t]
        np.testing.assert_allclose(out[0, t, oy:oy + ohh, ox:ox + oww],
                                   0.7 * x[0, t, oy:oy + ohh, ox:ox + oww] + 0.3,
                                   atol=1e-6)
        mask = np.ones((HW, HW), bool)
        mask[oy:oy + ohh, ox:ox + oww] = False
        np.testing.assert_allclose(out[0, t][mask], x[0, t][mask], atol=1e-6)


def test_identity_and_determinism(clips):
    p = _identity_params()
    out = apply_augmentations(p, clips, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(clips), atol=1e-6)

    a = augment_clips(jax.random.PRNGKey(7), clips)
    b = augment_clips(jax.random.PRNGKey(7), clips)
    c = augment_clips(jax.random.PRNGKey(8), clips)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_flip_letterbox_overlay(clips):
    p = _identity_params()
    p["do_flip"] = jnp.ones((B,))
    out = apply_augmentations(p, clips, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(clips)[:, :, :, ::-1, :], atol=1e-6
    )

    p = _identity_params()
    p["do_letterbox"] = jnp.ones((B,))
    p["letterbox_bar"] = jnp.full((B,), 7, jnp.int32)
    p["letterbox_vertical"] = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    out = np.asarray(apply_augmentations(p, clips, jax.random.PRNGKey(0)))
    assert (out[0, :, :7] == 0).all() and (out[0, :, -7:] == 0).all()
    assert (out[0, :, 7:-7] != 0).any()
    assert (out[1, :, :, :7] == 0).all() and (out[1, :, :, -7:] == 0).all()

    p = _identity_params()
    p["do_overlay"] = jnp.ones((B,))
    p["overlay_box"] = jnp.tile(jnp.asarray([[5, 9, 10, 30]]), (B, 1))
    out = np.asarray(apply_augmentations(p, clips, jax.random.PRNGKey(0)))
    x = np.asarray(clips)
    np.testing.assert_allclose(
        out[:, :, 5:15, 9:39], 0.7 * x[:, :, 5:15, 9:39] + 0.3, atol=1e-6
    )
    np.testing.assert_allclose(out[:, :, :5], x[:, :, :5], atol=1e-6)


def test_noise_statistics(clips):
    p = _identity_params()
    sigma = 0.05
    p["noise_level"] = jnp.full((B,), sigma)
    big = jnp.tile(clips * 0 + 0.5, (1, 1, 1, 1, 1))
    out = np.asarray(apply_augmentations(p, big, jax.random.PRNGKey(3)))
    resid = out - 0.5
    assert abs(resid.std() - sigma) < 0.005
    assert abs(resid.mean()) < 0.005


@pytest.mark.parametrize("k,blur_idx", [(3, 1), (5, 2), (7, 3)])
def test_blur_matches_cv2(clips, k, blur_idx):
    """Device blur uses cv2's fixed small-gaussian taps + reflect-101 border,
    the exact semantics of GaussianBlur(f, (k,k), 0) on the host path."""
    p = _identity_params()
    p["blur_idx"] = jnp.full((B,), blur_idx, jnp.int32)
    out = np.asarray(apply_augmentations(p, clips, jax.random.PRNGKey(0)))
    frame = np.asarray(clips)[0, 0]
    ref = cv2.GaussianBlur(frame, (k, k), 0)
    np.testing.assert_allclose(out[0, 0], ref, atol=2e-6)


def test_rotation_matches_cv2(clips):
    """cv2.warpAffine(getRotationMatrix2D(center, angle, 1.0)) semantics;
    bilinear interpolation on float images matches to small tolerance."""
    angle = 4.0
    p = _identity_params()
    p["do_rotation"] = jnp.ones((B,))
    p["rotation_angle"] = jnp.full((B,), angle)
    out = np.asarray(apply_augmentations(p, clips, jax.random.PRNGKey(0)))
    frame = np.asarray(clips)[0, 0]
    M = cv2.getRotationMatrix2D((HW // 2, HW // 2), angle, 1.0)
    ref = cv2.warpAffine(frame, M, (HW, HW))
    # interior only: border handling differs by sub-pixel edge policy
    diff = np.abs(out[0, 0, 4:-4, 4:-4] - ref[4:-4, 4:-4])
    assert diff.max() < 1e-4 and diff.mean() < 1e-5


def test_color_semantics(clips):
    """Brightness/contrast/saturation/hue follow the host op order
    (augment.py:127-145) without the uint8 quantization steps."""
    p = _identity_params()
    p["do_color"] = jnp.ones((B,))
    p["brightness"] = jnp.full((B,), 1.3)
    out = np.asarray(apply_augmentations(p, clips, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(
        out, np.clip(np.asarray(clips) * 1.3, 0, 1), atol=1e-5
    )

    # saturation 0 -> grayscale (BT.601 weights, cv2's RGB2GRAY)
    p = _identity_params()
    p["do_color"] = jnp.ones((B,))
    p["saturation"] = jnp.zeros((B,))
    out = np.asarray(apply_augmentations(p, clips, jax.random.PRNGKey(0)))
    x = np.asarray(clips)
    gray = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    np.testing.assert_allclose(out, np.stack([gray] * 3, -1), atol=1e-5)

    # hue shift is a pure hue rotation: value (max channel) is preserved
    p = _identity_params()
    p["do_color"] = jnp.ones((B,))
    p["hue_shift"] = jnp.full((B,), 0.08)
    out = np.asarray(apply_augmentations(p, clips, jax.random.PRNGKey(0)))
    np.testing.assert_allclose(out.max(-1), x.max(-1), atol=1e-5)
    assert np.abs(out - x).max() > 0.01  # and it actually changed colors


def test_mask_keeps_padding_zero(clips):
    mask = jnp.asarray(np.array([[1, 1, 0]] * B, bool))
    padded = clips * mask[:, :, None, None, None]
    out = np.asarray(augment_clips(jax.random.PRNGKey(5), padded, mask))
    assert (out[:, 2] == 0).all()
    assert np.isfinite(out).all()


def test_train_step_with_device_augment(clips):
    """make_train_step(device_augment=True) compiles and trains."""
    import optax

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.train_step import (
        init_train_state,
        make_train_step,
    )

    model = create_model("attention", spatial_dim=16, temporal_dim=32,
                         embedding_dim=32, num_attention_blocks=1)
    state = init_train_state(model, None, jax.random.PRNGKey(0),
                             (1, 4, 32, 32, 3))
    tx = optax.adam(1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    step = jax.jit(make_train_step(model, tx, "attention",
                                   device_augment=True))
    rng = np.random.default_rng(0)
    batch = {
        "clip1": (rng.random((2, 6, 32, 32, 3)) * 255).astype(np.uint8),
        "clip2": (rng.random((2, 6, 32, 32, 3)) * 255).astype(np.uint8),
        "video_id": np.arange(2, dtype=np.int32),
        "mask1": np.ones((2, 6), bool),
        "mask2": np.ones((2, 6), bool),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # a second step with the same inputs draws different augmentations
    # (rng folds in state.step) -> different loss
    _, metrics2 = step(new_state, batch, jax.random.PRNGKey(1))
    assert float(metrics2["loss"]) != float(metrics["loss"])
