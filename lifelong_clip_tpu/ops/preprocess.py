"""Fused on-device image preprocessing.

The reference applies torchvision transforms to *batched tensors on the GPU*
inside the hot loop (``--gpu_transform``; ``methods/_trainer.py:212-247``,
call sites like ``methods/adapter_clip.py:81``), with a uint8 round-trip for
AutoAugment and PIL-based policy code on the CPU path
(``utils/augment.py:24-265``). Here the whole pipeline is pure array ops
inside the jitted train step: uint8 in, normalized bf16/f32 out, per-sample
randomness from a single PRNG key — no host round-trips, fully fused by XLA.

Pipeline parity (train): [AutoAugment] -> Resize(S,S) -> RandomCrop(S, pad=4)
-> RandomHorizontalFlip -> Normalize  (+ optional Cutout / CutMix helpers).
Test: Resize -> Normalize.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


import functools as _functools

import numpy as _np


@_functools.lru_cache()
def _resize_matrix(n_in: int, n_out: int):
    """Bilinear interpolation as an (n_out, n_in) matrix (half-pixel
    centers, matching jax.image.resize/torchvision bilinear). numpy on
    purpose (lru_cached; may first build inside a jit trace)."""
    scale = n_in / n_out
    centers = (_np.arange(n_out) + 0.5) * scale - 0.5
    lo = _np.floor(centers).astype(_np.int64)
    frac = centers - lo
    m = _np.zeros((n_out, n_in), _np.float32)
    lo0 = _np.clip(lo, 0, n_in - 1)
    lo1 = _np.clip(lo + 1, 0, n_in - 1)
    m[_np.arange(n_out), lo0] += 1.0 - frac
    m[_np.arange(n_out), lo1] += frac
    return m


def resize_bilinear(x, size: int):
    """(B, H, W, C) -> (B, size, size, C), bilinear.

    Implemented as two separable matrix contractions (rides the MXU)
    instead of the gather-based lowering of jax.image.resize — a large
    win inside the fused train step for small-image datasets.
    """
    b, h, w, c = x.shape
    if h == size and w == size:
        return x
    rh = jnp.asarray(_resize_matrix(h, size))
    rw = jnp.asarray(_resize_matrix(w, size))
    x = jnp.einsum("oh,bhwc->bowc", rh, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("ow,bhwc->bhoc", rw, x,
                      precision=jax.lax.Precision.HIGHEST)


def normalize(x, mean: Tuple[float, ...], std: Tuple[float, ...]):
    """Channel-wise normalization; input in [0, 1]."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def pad_random_crop(rng, x, pad: int = 4):
    """Reflection-free zero-pad + per-sample random crop back to (H, W).

    Parity with torchvision ``RandomCrop(size, padding=4)`` (constant fill).
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    k1, k2 = jax.random.split(rng)
    oy = jax.random.randint(k1, (b,), 0, 2 * pad + 1)
    ox = jax.random.randint(k2, (b,), 0, 2 * pad + 1)

    def crop_one(img, y0, x0):
        return jax.lax.dynamic_slice(img, (y0, x0, 0), (h, w, c))

    return jax.vmap(crop_one)(xp, oy, ox)


def random_hflip(rng, x, p: float = 0.5):
    b = x.shape[0]
    flip = jax.random.bernoulli(rng, p, (b,))
    return jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)


def cutout(rng, x, size: int = 16, fill: float = 0.0):
    """Per-sample square cutout (reference utils/augment.py:268-321)."""
    b, h, w, _ = x.shape
    k1, k2 = jax.random.split(rng)
    cy = jax.random.randint(k1, (b, 1, 1), 0, h)
    cx = jax.random.randint(k2, (b, 1, 1), 0, w)
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    mask = ((jnp.abs(ys - cy) < size // 2) &
            (jnp.abs(xs - cx) < size // 2))
    return jnp.where(mask[..., None], jnp.asarray(fill, x.dtype), x)


def cutmix(rng, x, y_onehot, alpha: float = 1.0):
    """Batch CutMix (reference utils/augment.py:344-380): paste a random
    box from a shuffled partner into each image; labels mix by area."""
    b, h, w, _ = x.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    perm = jax.random.permutation(k1, b)
    lam = jax.random.beta(k2, alpha, alpha)
    rh = jnp.sqrt(1.0 - lam)
    cut_h = (h * rh).astype(jnp.int32)
    cut_w = (w * rh).astype(jnp.int32)
    cy = jax.random.randint(k3, (), 0, h)
    cx = jax.random.randint(k4, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    box = ((ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2))
    mixed = jnp.where(box[None, :, :, None], x[perm], x)
    area = ((y2 - y1) * (x2 - x1)).astype(jnp.float32) / (h * w)
    lam_adj = 1.0 - area
    y_mixed = lam_adj * y_onehot + (1.0 - lam_adj) * y_onehot[perm]
    return mixed, y_mixed, lam_adj


def resize_pad_random_crop(rng, x, size: int, pad: int = 4):
    """Fused resize_bilinear(size) + zero-pad(pad) + per-sample random
    crop back to (size, size), with no gathers on image data.

    Equivalent to ``pad_random_crop(rng, resize_bilinear(x, size), pad)``
    (torchvision ``RandomCrop(size, padding=4)`` semantics after the
    resize) but expressed as per-sample matrix contractions: output row o
    of sample b is padded-resized row (o + oy_b), so the per-sample
    resize matrix is just the shared bilinear matrix zero-padded by
    ``pad`` rows and shifted by the crop offset. The shift is a
    dynamic_slice over the tiny (size+2·pad, H) COEFFICIENT matrix —
    the image tensors only ever see einsums. The previous form's vmap'd
    dynamic_slice over the padded (B, 232, 232, C) batch lowered to a
    serialized TPU gather that went superlinear with batch
    (6 -> 60 ms for the bs 64 -> 128 pipeline).
    """
    b, h, w, c = x.shape
    k1, k2 = jax.random.split(rng)
    oy = jax.random.randint(k1, (b,), 0, 2 * pad + 1)
    ox = jax.random.randint(k2, (b,), 0, 2 * pad + 1)
    rh = jnp.asarray(_np.pad(_resize_matrix(h, size),
                             ((pad, pad), (0, 0))))     # (size+2p, H)
    rw = jnp.asarray(_np.pad(_resize_matrix(w, size),
                             ((pad, pad), (0, 0))))

    def shift(m, o):
        return jax.lax.dynamic_slice(m, (o, 0), (size, m.shape[1]))

    mh = jax.vmap(shift, in_axes=(None, 0))(rh, oy)     # (B, size, H)
    mw = jax.vmap(shift, in_axes=(None, 0))(rw, ox)
    x = jnp.einsum("boi,bihc->bohc", mh, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("boj,bhjc->bhoc", mw, x,
                      precision=jax.lax.Precision.HIGHEST)


def make_train_pipeline(img_size: int,
                        mean: Tuple[float, ...],
                        std: Tuple[float, ...],
                        *,
                        use_autoaug: bool = False,
                        autoaug_policy: str = "imagenet",
                        use_cutout: bool = False,
                        use_randaug: bool = False,
                        out_dtype=jnp.bfloat16):
    """Build a jittable fn(rng, uint8 images (B,H,W,C)) -> normalized batch."""

    def pipeline(rng, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        ks = jax.random.split(rng, 4)
        if use_autoaug:
            from .autoaugment import auto_augment_batch_fast
            x = auto_augment_batch_fast(ks[3], x, policy=autoaug_policy)
        if use_cutout:
            x = cutout(jax.random.fold_in(rng, 17), x, size=16)
        if use_randaug:
            from .autoaugment import rand_augment_batch
            x = rand_augment_batch(jax.random.fold_in(rng, 19), x)
        x = resize_pad_random_crop(ks[0], x, img_size, pad=4)
        x = random_hflip(ks[1], x)
        x = normalize(x, mean, std)
        return x.astype(out_dtype)

    return pipeline


def make_eval_pipeline(img_size: int,
                       mean: Tuple[float, ...],
                       std: Tuple[float, ...],
                       out_dtype=jnp.bfloat16):
    @functools.partial(jax.jit)
    def pipeline(images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        x = resize_bilinear(x, img_size)
        x = normalize(x, mean, std)
        return x.astype(out_dtype)

    return pipeline
