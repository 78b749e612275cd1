"""AutoAugment / RandAugment as pure JAX array ops.

The reference applies PIL-based AutoAugment policies per image on the host
(``utils/augment.py:24-265``) or via torchvision on batched GPU tensors
with a uint8 round-trip (``methods/_trainer.py:216-229``). Here every op is
a jit-compatible function over float images in [0, 1]; policy selection is
a per-sample ``lax.switch``, affine ops are bilinear warps (hat-weight
contractions on the MXU at small sizes, 4-tap gathers at native high
resolution), and the
whole thing fuses into the train step (north-star item in BASELINE.json).

Policy tables follow the published AutoAugment policies (ImageNet / CIFAR10
/ SVHN) used by torchvision; sub-policy = two (op, prob, magnitude) stages.
Magnitude ranges follow torchvision's AutoAugment bins (10 levels); exact
PIL parity is approximate by design (resampling and rounding differ) — the
A_auc parity budget covers this (SURVEY §7 hard part 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# geometry: bilinear affine warp (replaces PIL Image.transform)
# --------------------------------------------------------------------------

# out-of-bounds fill. The reference's LIVE augmentation path is
# torchvision's transforms.AutoAugment on batched tensors
# (methods/_trainer.py:216-229), which fills 0; its vendored PIL policy
# classes fill gray (fillcolor=(128,128,128), utils/augment.py:179) but
# setup_transforms never uses them — only Rainbow Memory's optional
# vr_autoaug uncertainty metric does (rainbow_memory.py:267-268). Default
# matches the live path; pass fill=128/255 for the PIL convention.
# Out-of-range samples blend toward the fill by their lost coverage.
_FILL = 0.0


def _affine_warp(img, mat, fill: float = _FILL):
    """img (H, W, C) float; mat 2x3 mapping OUTPUT coords -> INPUT coords
    (PIL convention). Out-of-bounds coverage blends to ``fill``."""
    h, w, c = img.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    xin = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2]
    yin = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2]

    x0 = jnp.floor(xin)
    y0 = jnp.floor(yin)
    wx = xin - x0
    wy = yin - y0

    def tap(yc, xc):
        valid = ((xc >= 0) & (xc < w) & (yc >= 0) & (yc < h))
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        vals = img[yi, xi]                    # (H, W, C)
        return jnp.where(valid[..., None], vals, 0.0), \
            valid.astype(img.dtype)

    v00, m00 = tap(y0, x0)
    v01, m01 = tap(y0, x0 + 1)
    v10, m10 = tap(y0 + 1, x0)
    v11, m11 = tap(y0 + 1, x0 + 1)
    w00 = ((1 - wx) * (1 - wy)).astype(img.dtype)
    w01 = (wx * (1 - wy)).astype(img.dtype)
    w10 = ((1 - wx) * wy).astype(img.dtype)
    w11 = (wx * wy).astype(img.dtype)
    out = (w00[..., None] * v00 + w01[..., None] * v01
           + w10[..., None] * v10 + w11[..., None] * v11)
    cov = w00 * m00 + w01 * m01 + w10 * m10 + w11 * m11
    out = out + fill * (1.0 - cov)[..., None]
    return out.astype(img.dtype)


def _center_affine(img, a, b, c_, d, fill: float = _FILL):
    """Affine about the image center with linear part [[a,b],[c_,d]]."""
    h, w, _ = img.shape
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    # output->input: translate center to origin, apply M, translate back
    tx = cx - a * cx - b * cy
    ty = cy - c_ * cx - d * cy
    mat = jnp.array([[a, b, tx], [c_, d, ty]], jnp.float32)
    return _affine_warp(img, mat, fill)


def shear_x(img, mag, fill: float = _FILL):
    return _center_affine(img, 1.0, mag, 0.0, 1.0, fill)


def shear_y(img, mag, fill: float = _FILL):
    return _center_affine(img, 1.0, 0.0, mag, 1.0, fill)


def translate_x(img, mag, fill: float = _FILL):
    h, w, _ = img.shape
    mat = jnp.array([[1.0, 0.0, mag * w], [0.0, 1.0, 0.0]], jnp.float32)
    return _affine_warp(img, mat, fill)


def translate_y(img, mag, fill: float = _FILL):
    h, w, _ = img.shape
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, mag * h]], jnp.float32)
    return _affine_warp(img, mat, fill)


def rotate(img, deg, fill: float = _FILL):
    rad = deg * jnp.pi / 180.0
    c, s = jnp.cos(rad), jnp.sin(rad)
    return _center_affine(img, c, s, -s, c, fill)


# --------------------------------------------------------------------------
# color ops (PIL ImageEnhance/ImageOps semantics on [0,1] floats)
# --------------------------------------------------------------------------

# numpy on purpose: this module may first import inside a jit trace (lazy
# import from the preprocess pipeline); a module-level jnp constant created
# there would be a leaked tracer.
import numpy as _np  # noqa: E402

_GRAY = _np.array([0.299, 0.587, 0.114], _np.float32)


def _blend(a, b, factor):
    return jnp.clip(b + factor * (a - b), 0.0, 1.0)


def invert(img, _=None):
    return 1.0 - img


def brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def color(img, factor):
    gray = jnp.tensordot(img, _GRAY, axes=[[-1], [0]])[..., None]
    return _blend(img, jnp.broadcast_to(gray, img.shape), factor)


def contrast(img, factor):
    gray = jnp.tensordot(img, _GRAY, axes=[[-1], [0]])
    mean = jnp.mean(jnp.round(gray * 255.0) / 255.0)
    return _blend(img, jnp.full_like(img, mean), factor)


def sharpness(img, factor):
    # PIL SMOOTH kernel: [[1,1,1],[1,5,1],[1,1,1]] / 13, border kept
    k = jnp.array([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    blurred = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None], k[None, None], (1, 1), "SAME",
        precision=jax.lax.Precision.HIGHEST)[:, 0].transpose(1, 2, 0)
    h, w, _ = img.shape
    interior = ((jnp.arange(h) > 0) & (jnp.arange(h) < h - 1))[:, None] & \
        ((jnp.arange(w) > 0) & (jnp.arange(w) < w - 1))[None, :]
    blurred = jnp.where(interior[..., None], blurred, img)
    return _blend(img, blurred, factor)


def posterize(img, bits):
    levels = jnp.round(img * 255.0).astype(jnp.int32)
    shift = (8 - bits).astype(jnp.int32)
    kept = (levels >> shift) << shift
    return kept.astype(jnp.float32) / 255.0


def solarize(img, threshold):
    return jnp.where(img >= threshold, 1.0 - img, img)


def autocontrast(img, _=None):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    return jnp.clip((img - lo) * scale, 0.0, 1.0)


def equalize(img, _=None):
    """Per-channel histogram equalization (PIL ImageOps.equalize)."""
    def eq_channel(ch):
        levels = jnp.round(ch * 255.0).astype(jnp.int32)
        hist = jnp.bincount(levels.ravel(), length=256)
        nonzero = hist > 0
        # PIL: step = (total - last_nonzero_count) // 255
        last_nz = jnp.max(jnp.where(nonzero, jnp.arange(256), -1))
        step = (jnp.sum(hist) - hist[last_nz]) // 255
        cum = jnp.cumsum(hist)
        lut = (cum - hist + (step // 2)) // jnp.maximum(step, 1)
        lut = jnp.clip(lut, 0, 255)
        out = jnp.where(step == 0, levels, lut[levels])
        return out.astype(jnp.float32) / 255.0

    return jnp.stack([eq_channel(img[..., i]) for i in range(3)], axis=-1)


def identity(img, _=None):
    return img


# --------------------------------------------------------------------------
# policy machinery
# --------------------------------------------------------------------------

# op name -> (fn, magnitude_for_level fn, signed)
def _lvl(lo, hi):
    return lambda m: lo + (hi - lo) * (m / 9.0)


_OPS = {
    "ShearX": (shear_x, _lvl(0.0, 0.3), True),
    "ShearY": (shear_y, _lvl(0.0, 0.3), True),
    "TranslateX": (translate_x, _lvl(0.0, 150.0 / 331.0), True),
    "TranslateY": (translate_y, _lvl(0.0, 150.0 / 331.0), True),
    "Rotate": (rotate, _lvl(0.0, 30.0), True),
    "Brightness": (brightness, lambda m: 1.0 + _lvl(0.0, 0.9)(m), "enh"),
    "Color": (color, lambda m: 1.0 + _lvl(0.0, 0.9)(m), "enh"),
    "Contrast": (contrast, lambda m: 1.0 + _lvl(0.0, 0.9)(m), "enh"),
    "Sharpness": (sharpness, lambda m: 1.0 + _lvl(0.0, 0.9)(m), "enh"),
    # magnitude-table lambdas take python floats at table-build time and
    # must stay pure-python (jnp here would stage tracers when the table
    # is first built inside a jit trace)
    "Posterize": (posterize, lambda m: 8.0 - round(_lvl(0.0, 4.0)(m)),
                  False),
    "Solarize": (solarize, _lvl(1.0, 0.0), False),
    "AutoContrast": (autocontrast, lambda m: 0.0, False),
    "Equalize": (equalize, lambda m: 0.0, False),
    "Invert": (invert, lambda m: 0.0, False),
    "Identity": (identity, lambda m: 0.0, False),
}

_OP_NAMES = list(_OPS)


def _apply_op(img, op_idx, mag, sign):
    """lax.switch over the op table; sign in {-1, +1} flips signed mags."""
    def branch(name):
        fn, _, signed = _OPS[name]

        def run(img):
            if signed is True:
                return fn(img, mag * sign)
            if signed == "enh":
                # enhancement factor 1±delta
                return fn(img, 1.0 + (mag - 1.0) * sign)
            return fn(img, mag)

        return run

    return jax.lax.switch(op_idx, [branch(n) for n in _OP_NAMES], img)


# published AutoAugment policies (op, prob, level 0-9); level None -> 0
POLICIES = {
    "imagenet": [
        (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
        (("Solarize", 0.6, 5), ("AutoContrast", 0.6, 0)),
        (("Equalize", 0.8, 0), ("Equalize", 0.6, 0)),
        (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
        (("Equalize", 0.4, 0), ("Solarize", 0.2, 4)),
        (("Equalize", 0.4, 0), ("Rotate", 0.8, 8)),
        (("Solarize", 0.6, 3), ("Equalize", 0.6, 0)),
        (("Posterize", 0.8, 5), ("Equalize", 1.0, 0)),
        (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
        (("Equalize", 0.6, 0), ("Posterize", 0.4, 6)),
        (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
        (("Rotate", 0.4, 9), ("Equalize", 0.6, 0)),
        (("Equalize", 0.0, 0), ("Equalize", 0.8, 0)),
        (("Invert", 0.6, 0), ("Equalize", 1.0, 0)),
        (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
        (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
        (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
        (("Sharpness", 0.4, 7), ("Invert", 0.6, 0)),
        (("ShearX", 0.6, 5), ("Equalize", 1.0, 0)),
        (("Color", 0.4, 0), ("Equalize", 0.6, 0)),
        (("Equalize", 0.4, 0), ("Solarize", 0.2, 4)),
        (("Solarize", 0.6, 5), ("AutoContrast", 0.6, 0)),
        (("Invert", 0.6, 0), ("Equalize", 1.0, 0)),
        (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
        (("Equalize", 0.8, 0), ("Equalize", 0.6, 0)),
    ],
    "cifar10": [
        (("Invert", 0.1, 0), ("Contrast", 0.2, 6)),
        (("Rotate", 0.7, 2), ("TranslateX", 0.3, 9)),
        (("Sharpness", 0.8, 1), ("Sharpness", 0.9, 3)),
        (("ShearY", 0.5, 8), ("TranslateY", 0.7, 9)),
        (("AutoContrast", 0.5, 0), ("Equalize", 0.9, 0)),
        (("ShearY", 0.2, 7), ("Posterize", 0.3, 7)),
        (("Color", 0.4, 3), ("Brightness", 0.6, 7)),
        (("Sharpness", 0.3, 9), ("Brightness", 0.7, 9)),
        (("Equalize", 0.6, 0), ("Equalize", 0.5, 0)),
        (("Contrast", 0.6, 7), ("Sharpness", 0.6, 5)),
        (("Color", 0.7, 7), ("TranslateX", 0.5, 8)),
        (("Equalize", 0.3, 0), ("AutoContrast", 0.4, 0)),
        (("TranslateY", 0.4, 3), ("Sharpness", 0.2, 6)),
        (("Brightness", 0.9, 6), ("Color", 0.2, 8)),
        (("Solarize", 0.5, 2), ("Invert", 0.0, 0)),
        (("Equalize", 0.2, 0), ("AutoContrast", 0.6, 0)),
        (("Equalize", 0.2, 0), ("Equalize", 0.6, 0)),
        (("Color", 0.9, 9), ("Equalize", 0.6, 0)),
        (("AutoContrast", 0.8, 0), ("Solarize", 0.2, 8)),
        (("Brightness", 0.1, 3), ("Color", 0.7, 0)),
        (("Solarize", 0.4, 5), ("AutoContrast", 0.9, 0)),
        (("TranslateY", 0.9, 9), ("TranslateY", 0.7, 9)),
        (("AutoContrast", 0.9, 0), ("Solarize", 0.8, 3)),
        (("Equalize", 0.8, 0), ("Invert", 0.1, 0)),
        (("TranslateY", 0.7, 9), ("AutoContrast", 0.9, 0)),
    ],
    "svhn": [
        (("ShearX", 0.9, 4), ("Invert", 0.2, 3)),
        (("ShearY", 0.9, 8), ("Invert", 0.7, 5)),
        (("Equalize", 0.6, 5), ("Solarize", 0.6, 6)),
        (("Invert", 0.9, 3), ("Equalize", 0.6, 3)),
        (("Equalize", 0.6, 1), ("Rotate", 0.9, 3)),
        (("ShearX", 0.9, 4), ("AutoContrast", 0.8, 3)),
        (("ShearY", 0.9, 8), ("Invert", 0.4, 5)),
        (("ShearY", 0.9, 5), ("Solarize", 0.2, 6)),
        (("Invert", 0.9, 6), ("AutoContrast", 0.8, 1)),
        (("Equalize", 0.6, 3), ("Rotate", 0.9, 3)),
        (("ShearX", 0.9, 4), ("Solarize", 0.3, 3)),
        (("ShearY", 0.8, 8), ("Invert", 0.7, 4)),
        (("Equalize", 0.9, 5), ("TranslateY", 0.6, 6)),
        (("ShearX", 0.9, 4), ("AutoContrast", 0.8, 3)),
        (("ShearY", 0.8, 8), ("Solarize", 0.7, 4)),
        (("Invert", 0.6, 4), ("Rotate", 0.8, 4)),
        (("ShearY", 0.3, 7), ("TranslateX", 0.9, 3)),
        (("ShearX", 0.1, 6), ("Invert", 0.6, 5)),
        (("Solarize", 0.7, 2), ("TranslateY", 0.6, 7)),
        (("ShearY", 0.8, 4), ("Invert", 0.8, 8)),
        (("ShearX", 0.7, 9), ("TranslateY", 0.8, 3)),
        (("ShearY", 0.8, 5), ("AutoContrast", 0.7, 3)),
        (("ShearX", 0.7, 2), ("Invert", 0.1, 5)),
        (("Solarize", 0.5, 0), ("TranslateY", 0.2, 1)),
        (("AutoContrast", 0.9, 5), ("Solarize", 0.5, 3)),
    ],
}


@functools.lru_cache()
def _policy_arrays(policy: str):
    """Pack a policy table into (op_idx, prob, mag) numpy arrays (P, 2).

    Numpy (not jnp) on purpose: this is lru_cached and may first run inside
    a jit trace — caching trace-local jnp constants would leak tracers.
    """
    import numpy as np
    table = POLICIES[policy]
    op_idx = np.zeros((len(table), 2), np.int32)
    prob = np.zeros((len(table), 2), np.float32)
    mag = np.zeros((len(table), 2), np.float32)
    for i, stages in enumerate(table):
        for j, (name, p, lvl) in enumerate(stages):
            op_idx[i, j] = _OP_NAMES.index(name)
            prob[i, j] = p
            mag[i, j] = float(_OPS[name][1](float(lvl)))
    return op_idx, prob, mag


def _augment_one(rng, img, op_idx, prob, mag):
    """Apply one sub-policy (2 stages) to a single image."""
    ks = jax.random.split(rng, 5)
    pick = jax.random.randint(ks[0], (), 0, op_idx.shape[0])
    for j in range(2):
        gate = jax.random.bernoulli(ks[1 + j], prob[pick, j])
        sign = jnp.where(jax.random.bernoulli(ks[3 + (j % 2)]), 1.0, -1.0)
        img = jnp.where(gate,
                        _apply_op(img, op_idx[pick, j], mag[pick, j], sign),
                        img)
    return img


def auto_augment_batch(rng, images, policy: str = "imagenet"):
    """(B, H, W, C) float [0,1] -> augmented, per-sample policy draw."""
    op_idx, prob, mag = (jnp.asarray(a) for a in _policy_arrays(policy))
    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(lambda r, im: _augment_one(r, im, op_idx, prob, mag))(
        rngs, images)


_RA_OPS = ["Identity", "ShearX", "ShearY", "TranslateX", "TranslateY",
           "Rotate", "Brightness", "Color", "Contrast", "Sharpness",
           "Posterize", "Solarize", "AutoContrast", "Equalize"]


def rand_augment_batch(rng, images, num_ops: int = 2, magnitude: int = 9):
    """RandAugment (N ops at fixed magnitude) over the batch.

    Same per-sample semantics as vmapping ``_apply_op`` (one uniformly
    drawn op per stage, signed magnitudes), but through the batched stage
    machinery — one gather-free warp + shared color passes per stage
    instead of every-branch-per-sample under vmap(switch). Feeds the
    ``--transforms randaug`` pipeline and Rainbow Memory's 12-view MC
    uncertainty sampling (reference rainbow_memory.py:177-218).
    """
    ra_idx = jnp.asarray([_OP_NAMES.index(n) for n in _RA_OPS], jnp.int32)
    mags = jnp.asarray([float(_OPS[n][1](float(magnitude)))
                        for n in _RA_OPS], jnp.float32)
    signed = jnp.asarray([_OPS[n][2] is True for n in _RA_OPS], bool)
    enh = jnp.asarray([_OPS[n][2] == "enh" for n in _RA_OPS], bool)
    used = frozenset(_RA_OPS)

    b = images.shape[0]
    x = images
    keys = jax.random.split(rng, 2 * num_ops)
    for i in range(num_ops):
        pick = jax.random.randint(keys[2 * i], (b,), 0, len(_RA_OPS))
        sign = jnp.where(jax.random.bernoulli(keys[2 * i + 1], 0.5, (b,)),
                         1.0, -1.0)
        oi = ra_idx[pick]
        mg = mags[pick]
        mg = jnp.where(signed[pick], mg * sign, mg)
        mg = jnp.where(enh[pick], 1.0 + (mags[pick] - 1.0) * sign, mg)
        x = _apply_stage_batched(x, oi, mg,
                                 jnp.ones((b,), bool), used_ops=used)
    return jnp.clip(x, 0.0, 1.0)


# --------------------------------------------------------------------------
# batched fast path
#
# vmap(lax.switch) evaluates EVERY branch for every sample, so the naive
# per-sample policy application costs ~10 full-resolution affine warps per
# image (measured 1.7 s/batch at 224px on v5e). The batched path instead:
#   * composes whichever affine op a sample drew into a single 2x3 matrix
#     (scalar-only switch) and runs ONE batched warp per stage;
#   * evaluates the color ops once per batch (elementwise, cheap; equalize
#     via one fused segment-sum histogram) and selects per sample.
# Same per-sample policy semantics, ~10x less gather traffic.
# --------------------------------------------------------------------------

def _affine_params(op_idx, mag, h, w):
    """Per-sample 2x3 OUTPUT->INPUT matrix for affine ops; identity for
    non-affine ops. Scalar math only — safe under vmap."""
    shear_x = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])

    def mat(a, b_, c_, d, tx=0.0, ty=0.0):
        return jnp.array([[a, b_, tx], [c_, d, ty]], jnp.float32)

    branches = {
        "ShearX": lambda: mat(1.0, mag, 0.0, 1.0),
        "ShearY": lambda: mat(1.0, 0.0, mag, 1.0),
        "TranslateX": lambda: mat(1.0, 0.0, 0.0, 1.0, mag * w, 0.0),
        "TranslateY": lambda: mat(1.0, 0.0, 0.0, 1.0, 0.0, mag * h),
        "Rotate": lambda: mat(jnp.cos(mag * jnp.pi / 180.0),
                              jnp.sin(mag * jnp.pi / 180.0),
                              -jnp.sin(mag * jnp.pi / 180.0),
                              jnp.cos(mag * jnp.pi / 180.0)),
    }
    idx_of = {n: i for i, n in enumerate(_OP_NAMES)}
    fns = []
    for name in _OP_NAMES:
        fns.append(branches.get(name, lambda: shear_x))
    m = jax.lax.switch(op_idx, fns)
    is_affine = jnp.isin(op_idx, jnp.asarray(
        [idx_of[n] for n in branches]))
    return jnp.where(is_affine, m, shear_x), is_affine


def _center_mat(m, h, w):
    """Recenter the linear part about the image center (keep translate)."""
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    a, b_, tx0 = m[0]
    c_, d, ty0 = m[1]
    tx = cx - a * cx - b_ * cy + tx0
    ty = cy - c_ * cx - d * cy + ty0
    return jnp.array([[a, b_, tx], [c_, d, ty]], jnp.float32)


# above this edge length the hat-tensor warp's O(B·H²·W·(H+W)·C) FLOPs
# and (B, H, W, H) intermediates lose to the 4-tap gather (at 224px the
# 'boxi,byic->boxyc' einsum would materialize ~GBs); below it, gathers
# serialize on TPU and the einsum form is ~10x cheaper (measured at 32px)
_WARP_EINSUM_MAX_SIDE = 64


def _batched_warp(images, mats, fill: float = _FILL):
    """One bilinear warp per sample with per-sample matrices — as two
    batched contractions instead of gathers.

    The bilinear weight of input pixel (yi, xi) for output pixel (yo, xo)
    factorizes per axis: hat(yin-yi) * hat(xin-xi) with hat(t) =
    max(0, 1-|t|). Building the two hat tensors ((B, H, W, H) and
    (B, H, W, W)) and contracting them against the image turns the warp
    into MXU work. TPU gathers serialize — the vmapped 4-tap gather warp
    was ~3 ms/stage at bs=64x32px, ~6 ms of the headline step's
    preprocessing; this form is ~10x cheaper. Exact same math as
    `_affine_warp` (incl. the fill: lost hat-weight coverage blends to
    ``fill``, default 0 = the live torchvision convention), asserted by
    tests/test_preprocess.py. Large images
    (native 224px datasets augment before resize) route to the gather
    warp, where the quartic hat-tensor scaling would dominate instead.
    """
    b, h, w, c = images.shape
    if max(h, w) > _WARP_EINSUM_MAX_SIDE:
        return jax.vmap(lambda im, m: _affine_warp(im, m, fill))(images,
                                                                 mats)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    a = mats[:, 0, 0][:, None, None]
    b_ = mats[:, 0, 1][:, None, None]
    tx = mats[:, 0, 2][:, None, None]
    c_ = mats[:, 1, 0][:, None, None]
    d = mats[:, 1, 1][:, None, None]
    ty = mats[:, 1, 2][:, None, None]
    xin = a * xs[None, None, :] + b_ * ys[None, :, None] + tx  # (B, H, W)
    yin = c_ * xs[None, None, :] + d * ys[None, :, None] + ty
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xin[..., None] - xs))  # (B,H,W,Wi)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(yin[..., None] - ys))  # (B,H,W,Yi)
    # contract input columns, then input rows (o = yo, x = xo)
    t = jnp.einsum("boxi,byic->boxyc", wx, images,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("boxy,boxyc->boxc", wy, t,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    # hat-weight mass lost past the border blends to the fill value
    # (separable: total weight = sum_i wx_i * sum_y wy_y, == 1 in-range)
    cov = wx.sum(-1) * wy.sum(-1)                               # (B, H, W)
    out = out + fill * (1.0 - cov)[..., None]
    return out.astype(images.dtype)


def _batched_equalize(images):
    """Per-sample per-channel equalize, scatter/gather-free.

    TPU scatters (``bincount``) and irregular gathers serialize; instead
    the histogram is a one-hot reduction and the LUT application a one-hot
    matvec — both MXU work (measured 4.0 ms -> sub-ms for a 64x32x32x3
    batch). One-hot in bf16 is exact here: entries are 0/1 and LUT values
    are integers <= 255, all exactly representable.
    """
    b, h, w, c = images.shape
    if h * w > 64 * 64:
        # the (B, C, H·W, 256) one-hot is ~5 GB at 224px — per-sample
        # equalize is the right trade at native high resolution
        return jax.vmap(equalize)(images)
    levels = jnp.round(images * 255.0).astype(jnp.int32)        # (B,H,W,C)
    lv = levels.transpose(0, 3, 1, 2).reshape(b, c, h * w)      # (B,C,N)
    onehot = jax.nn.one_hot(lv, 256, dtype=jnp.bfloat16)        # (B,C,N,256)
    hist = onehot.astype(jnp.float32).sum(axis=2)               # (B,C,256)
    hist_i = hist.astype(jnp.int32)
    nz = hist_i > 0
    last_nz = jnp.max(jnp.where(nz, jnp.arange(256)[None, None, :], -1),
                      axis=-1)                                  # (B, C)
    last_count = jnp.take_along_axis(hist_i, last_nz[..., None],
                                     axis=-1)[..., 0]
    step = (hist_i.sum(-1) - last_count) // 255                 # (B, C)
    cum = jnp.cumsum(hist_i, axis=-1)
    lut = (cum - hist_i + (step // 2)[..., None]) // jnp.maximum(
        step, 1)[..., None]
    lut = jnp.clip(lut, 0, 255)                                 # (B, C, 256)
    out_lv = jnp.einsum("bcnk,bck->bcn", onehot,
                        lut.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    out_lv = jnp.round(out_lv).astype(jnp.int32)
    out_lv = out_lv.reshape(b, c, h, w).transpose(0, 2, 3, 1)   # (B,H,W,C)
    out = jnp.where((step == 0)[:, None, None, :], levels, out_lv)
    return out.astype(jnp.float32) / 255.0


# batched color ops: (B,H,W,C) x mag (B,) -> (B,H,W,C)
def _bmag(mag):
    return mag[:, None, None, None]


def _batched_contrast(x, m):
    gray = jnp.round(jnp.tensordot(x, _GRAY, axes=[[-1], [0]])
                     * 255.0) / 255.0
    mean = jnp.mean(gray, axis=(1, 2), keepdims=True)[..., None]
    return _blend(x, mean * jnp.ones_like(x), _bmag(m))


def _batched_smooth(x):
    """PIL SMOOTH over a batch as 9 shifted adds (no vmapped conv — a
    per-sample conv dispatch costs more than the arithmetic here)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = 5.0 * x
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc = acc + xp[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
    blurred = acc / 13.0
    interior = ((jnp.arange(h) > 0) & (jnp.arange(h) < h - 1))[:, None] & \
        ((jnp.arange(w) > 0) & (jnp.arange(w) < w - 1))[None, :]
    return jnp.where(interior[None, ..., None], blurred, x)


def _batched_sharpness(x, m):
    return _blend(x, _batched_smooth(x), _bmag(m))


def _batched_autocontrast(x):
    lo = jnp.min(x, axis=(1, 2), keepdims=True)
    hi = jnp.max(x, axis=(1, 2), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    return jnp.clip((x - lo) * scale, 0.0, 1.0)


_BATCHED_COLOR = {
    "Brightness": lambda x, m: _blend(x, jnp.zeros_like(x), _bmag(m)),
    "Color": lambda x, m: _blend(
        x, jnp.broadcast_to(jnp.tensordot(x, _GRAY, axes=[[-1], [0]])
                            [..., None], x.shape), _bmag(m)),
    "Contrast": _batched_contrast,
    "Sharpness": _batched_sharpness,
    "Posterize": lambda x, m: posterize(x, _bmag(m)),
    "Solarize": lambda x, m: jnp.where(x >= _bmag(m), 1.0 - x, x),
    "AutoContrast": lambda x, m: _batched_autocontrast(x),
    "Equalize": lambda x, m: _batched_equalize(x),
    "Invert": lambda x, m: 1.0 - x,
}


def _apply_stage_batched(x, op_idx, mag, gate, used_ops=None):
    """One policy stage over the whole batch.

    x (B,H,W,C) f32; op_idx/mag/gate (B,). Affine ops collapse into one
    batched warp; color ops are computed batch-wide and selected.
    ``used_ops`` (static set of op names appearing in the policy table)
    prunes branches no sample can ever draw.
    """
    b, h, w, _ = x.shape
    idx_of = {n: i for i, n in enumerate(_OP_NAMES)}
    affine_names = ("ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate")

    if used_ops is None or any(n in used_ops for n in affine_names):
        mats, is_affine = jax.vmap(
            lambda oi, mg: _affine_params(oi, mg, h, w))(op_idx, mag)
        mats = jax.vmap(lambda m: _center_mat(m, h, w))(mats)
        do_warp = is_affine & gate
        identity = jnp.broadcast_to(
            jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32),
            (b, 2, 3))
        mats = jnp.where(do_warp[:, None, None], mats, identity)
        x = _batched_warp(x, mats)

    for name, fn in _BATCHED_COLOR.items():
        if used_ops is not None and name not in used_ops:
            continue
        oi = idx_of[name]
        sel = (op_idx == oi) & gate
        y = fn(x, mag)
        x = jnp.where(sel[:, None, None, None], y, x)
    return x


def auto_augment_batch_fast(rng, images, policy: str = "imagenet"):
    """Batched AutoAugment: same sampling semantics as auto_augment_batch,
    ~10x cheaper at high resolution (one warp per stage)."""
    op_idx, prob, mag = (jnp.asarray(a) for a in _policy_arrays(policy))
    used_ops = frozenset(name for stages in POLICIES[policy]
                         for name, _, _ in stages)
    b = images.shape[0]
    k_pick, k_g1, k_g2, k_s1, k_s2 = jax.random.split(rng, 5)
    pick = jax.random.randint(k_pick, (b,), 0, op_idx.shape[0])
    x = images
    for j, (kg, ks) in enumerate(((k_g1, k_s1), (k_g2, k_s2))):
        gate = jax.random.bernoulli(kg, prob[pick, j])
        sign = jnp.where(jax.random.bernoulli(ks, 0.5, (b,)), 1.0, -1.0)
        oi = op_idx[pick, j]
        mg = mag[pick, j]
        # signed / enhancement magnitude handling per op class
        signed_ops = jnp.asarray([_OP_NAMES.index(n) for n in
                                  ("ShearX", "ShearY", "TranslateX",
                                   "TranslateY", "Rotate")])
        enh_ops = jnp.asarray([_OP_NAMES.index(n) for n in
                               ("Brightness", "Color", "Contrast",
                                "Sharpness")])
        mg = jnp.where(jnp.isin(oi, signed_ops), mg * sign, mg)
        mg = jnp.where(jnp.isin(oi, enh_ops),
                       1.0 + (mag[pick, j] - 1.0) * sign, mg)
        x = _apply_stage_batched(x, oi, mg, gate, used_ops=used_ops)
    return jnp.clip(x, 0.0, 1.0)
