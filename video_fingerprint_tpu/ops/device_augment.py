"""On-device augmentation pipeline (C14, TPU-native).

Vectorized `jax.random` implementation of the reference's clip-level
augmentations (dataset.py:246-353) over a whole (B, T, H, W, C) batch inside
the jitted train step — the host pipeline (data/augment.py) applies the same
transforms per-frame in Python/cv2 and saturates host cores long before the
chip does (SURVEY.md §7 step 7, VERDICT r2 missing #2).

Same transforms, probabilities and parameter ranges as the reference, at the
reference's sampling granularity: the eight gates and the color / noise-sigma
/ blur-kernel params are one draw per CLIP (reference dataset.py:250-266),
while the letterbox bar+orientation, overlay box and rotation angle are one
draw per FRAME — (B, T)-shaped — matching the reference's in-loop draws
(dataset.py:319-320, :328-331, :344):

  color p=.7 (brightness/contrast/saturation U[0.5,1.5], hue U[-0.1,0.1]),
  hflip p=.5, gaussian noise p=.3 (sigma U[0.02,0.1]), blur p=.5
  (k in {3,5,7}, cv2's sigma-from-k rule), letterbox p=.3 (bar 5-15px,
  per-frame), white overlay p=.2 (alpha .3, per-frame box), rotation p=.2
  (+-5 deg bilinear, per-frame angle).

JPEG recompression (p=.5) is a codec and stays host-side — in device-augment
mode the host pipeline applies ONLY resize + JPEG before staging
(data/dataset.py augment_mode="device").

Branchless by design: every transform computes for the full batch and blends
per-clip with `where` on the sampled gate. At 64x64 frames the whole pipeline
is a few elementwise passes plus 14 shifted adds (separable blur) and one
bilinear gather (rotation) — noise next to the model's conv stack, and XLA
fuses most of it into neighbouring ops. Deliberate divergences from the host
path, documented here once: no intermediate uint8 quantization (values stay
f32); hue rotates in a pure-jnp HSV round trip (cv2 quantizes H to uint8
steps); and JPEG recompression moves from mid-pipeline (reference
dataset.py:313-319, after noise) to FIRST (the loader compresses the raw
resized frames before staging), so it acts on un-jittered pixels — the
augmentation strength is statistically equivalent and the training
trajectory matches the host pipeline epoch-for-epoch (docs/ROUND3_NOTES.md).
Blur uses cv2's own fixed small-gaussian taps with reflect-101 borders, so
it matches the host path to f32 rounding. Distribution and transform parity
are gated by tests/test_device_augment.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# cv2.GaussianBlur(sigma=0) with ksize <= 7 uses OpenCV's fixed
# small-gaussian tables (binomial-ish taps), not the computed gaussian —
# using the same tables makes the device blur match cv2 exactly (up to
# f32 rounding) for the host path's k in {3,5,7}.
_BLUR_KS = (3, 5, 7)
_CV2_SMALL_GAUSSIAN = {
    0: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def _gauss_kernel7(k: int):
    """k-tap cv2 small-gaussian embedded centered in 7 taps (zeros outside)."""
    import numpy as np

    taps = np.zeros((7,), np.float32)
    g = np.asarray(_CV2_SMALL_GAUSSIAN[k], np.float32)
    r = (len(g) - 1) // 2
    taps[3 - r : 3 + r + 1] = g
    return taps


def _kernel_table():
    """(4, 7) numpy constant, rows = [identity, k3, k5, k7]. Numpy (not jnp)
    on purpose: a module-level jnp cache built during a jit trace leaks the
    tracer into later traces."""
    import numpy as np

    return np.stack([_gauss_kernel7(k) for k in (0, *_BLUR_KS)])


def sample_params(
    key: Array, batch: int, frame_size: int, num_frames: Optional[int] = None
) -> Dict[str, Array]:
    """Augmentation parameters at the reference's sampling granularity:
    gates and color/noise/blur values are one draw per clip — (B,)-shaped —
    (dataset.py:250-266), while letterbox bar+orientation, overlay box and
    rotation angle are one draw per frame — (B, T)-shaped when `num_frames`
    is given — matching the reference's in-loop draws (dataset.py:319-320,
    :328-331, :344). With num_frames=None those four stay (B,)-shaped (one
    draw shared by all frames; test/debug hook). Gates are f32 in {0,1} so
    they blend with where/lerp. JPEG compression is intentionally absent
    (host-side codec)."""
    fshape = (batch,) if num_frames is None else (batch, num_frames)
    ks = jax.random.split(key, 16)
    u = lambda k: jax.random.uniform(k, (batch,))  # noqa: E731
    do_color = (u(ks[0]) > 0.3).astype(jnp.float32)
    do_flip = (u(ks[1]) > 0.5).astype(jnp.float32)
    do_noise = (u(ks[2]) > 0.7).astype(jnp.float32)
    do_blur = (u(ks[3]) > 0.5).astype(jnp.float32)
    do_letterbox = (u(ks[4]) > 0.7).astype(jnp.float32)
    do_overlay = (u(ks[5]) > 0.8).astype(jnp.float32)
    do_rotation = (u(ks[6]) > 0.8).astype(jnp.float32)

    oh = jax.random.randint(ks[7], fshape, 10, 21)
    ow = jax.random.randint(ks[8], fshape, 30, 61)
    # randint high is exclusive; reference randint(0, size-oh) is inclusive
    oy = jax.random.randint(ks[9], fshape, 0,
                            jnp.maximum(1, frame_size - oh + 1))
    ox = jax.random.randint(ks[10], fshape, 0,
                            jnp.maximum(1, frame_size - ow + 1))
    return {
        "do_color": do_color,
        "brightness": jax.random.uniform(ks[11], (batch,), minval=0.5, maxval=1.5),
        "contrast": jax.random.uniform(ks[12], (batch,), minval=0.5, maxval=1.5),
        "saturation": jax.random.uniform(ks[13], (batch,), minval=0.5, maxval=1.5),
        "hue_shift": jax.random.uniform(ks[14], (batch,), minval=-0.1, maxval=0.1),
        "do_flip": do_flip,
        # sigma=0 encodes "no noise" exactly like the host path
        "noise_level": do_noise * jax.random.uniform(
            ks[15], (batch,), minval=0.02, maxval=0.1
        ),
        # 0 = identity row of the kernel table, 1..3 = k 3/5/7
        "blur_idx": jnp.where(
            do_blur > 0,
            1 + jax.random.randint(jax.random.fold_in(key, 101), (batch,), 0, 3),
            0,
        ),
        "do_letterbox": do_letterbox,
        "letterbox_bar": jax.random.randint(
            jax.random.fold_in(key, 102), fshape, 5, 16
        ),
        "letterbox_vertical": (
            jax.random.uniform(jax.random.fold_in(key, 103), fshape) > 0.5
        ).astype(jnp.float32),
        "do_overlay": do_overlay,
        "overlay_box": jnp.stack([oy, ox, oh, ow], axis=-1),  # (B[, T], 4)
        "do_rotation": do_rotation,
        "rotation_angle": do_rotation.reshape(
            (batch,) + (1,) * (len(fshape) - 1)
        ) * jax.random.uniform(
            jax.random.fold_in(key, 104), fshape, minval=-5.0, maxval=5.0
        ),
    }


def _rgb_to_hsv(x: Array) -> Array:
    """(..., 3) RGB [0,1] -> HSV with H in [0,1)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe_d,
        jnp.where(mx == g, 2.0 + (b - r) / safe_d, 4.0 + (r - g) / safe_d),
    )
    h = jnp.where(d > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(x: Array) -> Array:
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _color(x: Array, p: Dict[str, Array]) -> Array:
    """Hue rotate -> brightness -> contrast -> saturation blend, the host
    path's exact op order (data/augment.py:127-145; reference
    dataset.py:262-296). Params broadcast (B,) -> (B,1,1,1[,1])."""
    bshape = (-1,) + (1,) * (x.ndim - 1)
    hsv = _rgb_to_hsv(x)
    h = (hsv[..., 0] + p["hue_shift"].reshape(bshape[:-1])) % 1.0
    y = _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))
    y = y * p["brightness"].reshape(bshape)
    y = (y - 0.5) * p["contrast"].reshape(bshape) + 0.5
    yc = jnp.clip(y, 0.0, 1.0)
    gray = (0.299 * yc[..., 0] + 0.587 * yc[..., 1] + 0.114 * yc[..., 2])
    s = p["saturation"].reshape(bshape)
    y = s * y + (1 - s) * gray[..., None]
    y = jnp.clip(y, 0.0, 1.0)
    return jnp.where(p["do_color"].reshape(bshape) > 0, y, x)


def _blur(x: Array, blur_idx: Array) -> Array:
    """Separable 7-tap blur with a per-clip kernel row (identity when off):
    14 shifted multiply-adds instead of a conv, so per-sample kernels cost
    nothing special. Borders reflect-101 (cv2 BORDER_DEFAULT)."""
    kern = jnp.asarray(_kernel_table())[blur_idx]  # (B, 7)
    B = x.shape[0]
    kb = kern.reshape((B,) + (1,) * (x.ndim - 1) + (7,))

    def pass_axis(y, axis):
        pad = [(0, 0)] * y.ndim
        pad[axis] = (3, 3)
        yp = jnp.pad(y, pad, mode="reflect")
        acc = 0.0
        for d in range(7):
            sl = [slice(None)] * y.ndim
            sl[axis] = slice(d, d + y.shape[axis])
            acc = acc + kb[..., d] * yp[tuple(sl)]
        return acc

    y = pass_axis(x, x.ndim - 3)  # H
    return pass_axis(y, x.ndim - 2)  # W


def _rotate_bilinear(x: Array, angle_deg: Array,
                     max_angle_deg: float = 5.0) -> Array:
    """Rotation about the frame center, bilinear, zero fill —
    cv2.warpAffine(getRotationMatrix2D(center, angle, 1.0)) semantics
    (reference dataset.py:345-351). x: (B, ..., H, W, C); angle_deg may be
    (B,) (one angle per clip) or (B, T) (per-frame angles, the reference's
    granularity — dataset.py:344) — any shape equal to x.shape[:angle.ndim].

    Implemented as a static stencil, not a gather: a 2-D gather of 3-float
    rows measured 181 ms/clip-batch on v5e (tools/exp_augment_hotspot.py,
    B=16 T=64 — 96% of the whole augment pipeline) because tiny-row gathers
    defeat the (8,128) tiled layout entirely. For |angle| <= max_angle_deg
    the source displacement is bounded by R = ceil((1-cos a)*r + sin(a)*r)
    pixels (R=3 at 5 deg on 64x64), so bilinear sampling
    out[p] = sum_q max(0,1-|sy-qy|)*max(0,1-|sx-qx|)*img[q] has all its
    nonzero terms inside a (2R+1)^2 window of shifted slices — 49 fused
    multiply-adds, identical arithmetic to the 4-tap gather form (the extra
    taps are exact zeros). Requires |angle_deg| <= max_angle_deg; the
    sampler draws +-5 deg (reference dataset.py:346)."""
    import numpy as np

    H, W = x.shape[-3], x.shape[-2]
    cy, cx = H // 2, W // 2  # cv2 center=(W//2, H//2)
    a = np.radians(max_angle_deg)
    mx = max(cx, W - 1 - cx)
    my = max(cy, H - 1 - cy)
    R = int(np.ceil(max((1 - np.cos(a)) * mx + np.sin(a) * my,
                        np.sin(a) * mx + (1 - np.cos(a)) * my)))
    # cv2 positive angle = CCW in image coords; the inverse (dst->src) map
    # then uses +theta directly (verified to 5e-6 against warpAffine).
    theta = angle_deg * (jnp.pi / 180.0)
    lead = theta.shape  # (B,) or (B, T)
    tshape = lead + (1, 1)
    cos = jnp.cos(theta).reshape(tshape)
    sin = jnp.sin(theta).reshape(tshape)
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    # source coords for each destination pixel (inverse rotation)
    sx = cos * (xx - cx) - sin * (yy - cy) + cx
    sy = sin * (xx - cx) + cos * (yy - cy) + cy

    # dims between the angle's lead dims and (H, W, C) — e.g. the T axis
    # when angles are per-clip; empty when angles are per-frame (B, T)
    extra = x.ndim - len(lead) - 3
    P = R + 1
    pad = [(0, 0)] * x.ndim
    pad[-3] = (P, P)
    pad[-2] = (P, P)
    xp = jnp.pad(x, pad)  # zero fill = cv2 BORDER_CONSTANT(0)
    # per-axis triangle weights per integer tap offset: (2R+1, *lead, H, W)
    offs = jnp.arange(-R, R + 1, dtype=jnp.float32).reshape(
        (2 * R + 1,) + (1,) * sx.ndim
    )
    wys = jnp.maximum(0.0, 1.0 - jnp.abs(sy - (yy + offs)))
    wxs = jnp.maximum(0.0, 1.0 - jnp.abs(sx - (xx + offs)))

    acc = jnp.zeros_like(x)
    for iy, dy in enumerate(range(-R, R + 1)):
        for ix, dx in enumerate(range(-R, R + 1)):
            w = (wys[iy] * wxs[ix]).astype(x.dtype)  # (*lead, H, W)
            wb = w.reshape(lead + (1,) * extra + (H, W, 1))
            sl = [slice(None)] * x.ndim
            sl[-3] = slice(P + dy, P + dy + H)
            sl[-2] = slice(P + dx, P + dx + W)
            acc = acc + wb * xp[tuple(sl)]
    return acc


def apply_augmentations(
    params: Dict[str, Array], clips: Array, noise_key: Array
) -> Array:
    """Apply sampled params to (B, T, H, W, C) f32 clips in [0,1].
    Deterministic given (params, noise_key). Transform order matches the host
    pipeline: color, flip, noise, blur, [jpeg: host-only], letterbox,
    overlay, rotation (reference dataset.py:259-353). letterbox_bar /
    letterbox_vertical / overlay_box / rotation_angle may be per-clip (B,)
    or per-frame (B, T) — the reference's granularity (dataset.py:319-344);
    gates and the other params are always per-clip (B,)."""
    B, T, H, W, C = clips.shape
    g = lambda name: params[name].reshape((B, 1, 1, 1, 1))  # noqa: E731
    # frame-level broadcast: (B,) -> (B,1,1,1,1), (B,T) -> (B,T,1,1,1)
    fb = lambda p: p.reshape(p.shape + (1,) * (5 - p.ndim))  # noqa: E731

    x = _color(clips, params)
    x = jnp.where(g("do_flip") > 0, x[:, :, :, ::-1, :], x)

    noise = jax.random.normal(noise_key, x.shape, x.dtype)
    x = jnp.clip(x + noise * g("noise_level"), 0.0, 1.0)

    x = _blur(x, params["blur_idx"])

    # letterbox: vertical=True bars rows (top/bottom), else columns
    bar = fb(params["letterbox_bar"])
    rows = jnp.arange(H).reshape((1, 1, H, 1, 1))
    cols = jnp.arange(W).reshape((1, 1, 1, W, 1))
    row_bar = (rows < bar) | (rows >= H - bar)
    col_bar = (cols < bar) | (cols >= W - bar)
    vert = fb(params["letterbox_vertical"]) > 0
    barred = jnp.where(vert, jnp.where(row_bar, 0.0, x), jnp.where(col_bar, 0.0, x))
    x = jnp.where(g("do_letterbox") > 0, barred, x)

    # white overlay rectangle, alpha 0.3
    oy, ox, ohh, oww = [fb(params["overlay_box"][..., i]) for i in range(4)]
    in_box = ((rows >= oy) & (rows < oy + ohh) & (cols >= ox) & (cols < ox + oww))
    x = jnp.where(g("do_overlay") * in_box > 0, 0.7 * x + 0.3, x)

    rotated = _rotate_bilinear(x, params["rotation_angle"])
    x = jnp.where(g("do_rotation") > 0, rotated, x)
    return x


def augment_clips(
    key: Array, clips: Array, mask: Optional[Array] = None
) -> Array:
    """Convenience wrapper: sample params + apply. Samples letterbox /
    overlay / rotation per frame like the reference (dataset.py:319-344).
    `mask` (B, T) re-zeroes padded frames afterwards (contrast/letterbox/
    overlay move zeros)."""
    k_params, k_noise = jax.random.split(key)
    params = sample_params(k_params, clips.shape[0], clips.shape[2],
                           num_frames=clips.shape[1])
    out = apply_augmentations(params, clips, k_noise)
    if mask is not None:
        out = out * mask[:, :, None, None, None].astype(out.dtype)
    return out
