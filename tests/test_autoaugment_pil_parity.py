"""AutoAugment op parity against PIL — the reference's actual pipeline.

The reference's op semantics are PIL's (``utils/augment.py:171-265``:
ImageOps.{invert,posterize,solarize,autocontrast,equalize},
ImageEnhance.{Brightness,Color,Contrast,Sharpness}.enhance(1 ± m), AFFINE
transforms); its live pipeline applies the same op families through
torchvision's AutoAugment (``methods/_trainer.py:216-229``). Our ops are
jit-compatible float array functions; this file pins each one against PIL
on random uint8 images.

Tolerances: pixel-value ops are exact or within uint8 rounding;
ImageEnhance blends allow a few /255 for PIL's integer grayscale
intermediates; geometry is approximate by design (our bilinear resampling
vs PIL BICUBIC/NEAREST — SURVEY §7 hard part 5) so those check structure:
integer translations match exactly and the out-of-bounds region fills
with 0, matching the reference's LIVE path (torchvision AutoAugment on
tensors, _trainer.py:216-229, fill=None -> 0 — its vendored PIL policies
with gray fill are only reachable via RM's optional vr_autoaug metric).
"""

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from lifelong_clip_tpu.ops import autoaugment as A

RNG = np.random.default_rng(0)


def _u8(h=32, w=32):
    return RNG.integers(0, 256, (h, w, 3), np.uint8)


def _ours(fn, u8, *args):
    out = np.asarray(fn(u8.astype(np.float32) / 255.0, *args))
    return np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)


def _pil(im_fn, u8):
    return np.asarray(im_fn(Image.fromarray(u8)), np.uint8)


def test_invert_exact():
    u = _u8()
    np.testing.assert_array_equal(_ours(A.invert, u),
                                  _pil(ImageOps.invert, u))


@pytest.mark.parametrize("bits", [4, 5, 6, 7, 8])
def test_posterize_exact(bits):
    u = _u8()
    got = _ours(A.posterize, u, np.float32(bits))
    ref = _pil(lambda im: ImageOps.posterize(im, bits), u)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("threshold", [0, 85, 170, 256])
def test_solarize_exact(threshold):
    u = _u8()
    got = _ours(A.solarize, u, np.float32(threshold / 255.0))
    ref = _pil(lambda im: ImageOps.solarize(im, threshold), u)
    np.testing.assert_array_equal(got, ref)


def test_autocontrast_close():
    u = _u8()
    got = _ours(A.autocontrast, u)
    ref = _pil(ImageOps.autocontrast, u)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_equalize_exact():
    u = _u8()
    got = _ours(A.equalize, u)
    ref = _pil(ImageOps.equalize, u)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("factor", [0.1, 0.55, 1.0, 1.45, 1.9])
def test_brightness_close(factor):
    u = _u8()
    got = _ours(A.brightness, u, np.float32(factor))
    ref = _pil(lambda im: ImageEnhance.Brightness(im).enhance(factor), u)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.parametrize("factor", [0.1, 0.55, 1.45, 1.9])
def test_color_close(factor):
    u = _u8()
    got = _ours(A.color, u, np.float32(factor))
    ref = _pil(lambda im: ImageEnhance.Color(im).enhance(factor), u)
    # PIL rounds the grayscale degenerate to uint8 before blending
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 2


@pytest.mark.parametrize("factor", [0.1, 0.55, 1.45, 1.9])
def test_contrast_close(factor):
    u = _u8()
    got = _ours(A.contrast, u, np.float32(factor))
    ref = _pil(lambda im: ImageEnhance.Contrast(im).enhance(factor), u)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 2


@pytest.mark.parametrize("factor", [0.1, 0.55, 1.45, 1.9])
def test_sharpness_close(factor):
    u = _u8()
    got = _ours(A.sharpness, u, np.float32(factor))
    ref = _pil(lambda im: ImageEnhance.Sharpness(im).enhance(factor), u)
    # smooth-kernel conv: PIL rounds the degenerate to uint8 first
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 2


def test_translate_integer_exact_with_zero_fill():
    """Integer-pixel translation: bilinear == nearest, so ours must match
    PIL AFFINE exactly — including the live path's zero fill."""
    u = _u8()
    h, w = u.shape[:2]
    shift = 8  # pixels
    got = _ours(A.translate_x, u, np.float32(shift / w))
    ref = np.asarray(
        Image.fromarray(u).transform(
            (w, h), Image.AFFINE, (1, 0, shift, 0, 1, 0),
            fillcolor=(0, 0, 0)), np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_rotate_structure_and_fill():
    """Rotation: compare against PIL's bilinear rotate on a smooth
    gradient image; corners that rotate out of frame take the live
    path's zero fill."""
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    smooth = np.stack([xx / w, yy / h, (xx + yy) / (h + w)], -1)
    u = np.clip(np.round(smooth * 255), 0, 255).astype(np.uint8)
    deg = 30.0
    got = _ours(A.rotate, u, np.float32(deg))

    # sign convention: ours rotates clockwise in display space where PIL
    # rotates counterclockwise — protocol-equivalent because the policy
    # randomizes the magnitude sign (utils/augment.py random.choice([-1,1]))
    ref = np.asarray(
        Image.fromarray(u).rotate(-deg, resample=Image.BILINEAR),
        np.uint8)
    err = np.abs(got.astype(int) - ref.astype(int)).mean() / 255.0
    assert err < 0.02, err
    # corners rotate out of frame -> the live path's zero fill
    assert int(got[0, 0, 0]) <= 1
    assert int(got[-1, -1, 1]) <= 1


def test_shear_structure_and_fill():
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    smooth = np.stack([xx / w, yy / h, (xx + yy) / (h + w)], -1)
    u = np.clip(np.round(smooth * 255), 0, 255).astype(np.uint8)
    mag = 0.3
    got = _ours(A.shear_x, u, np.float32(mag))
    # the reference shears about the origin; ours about the center — apply
    # the same centered matrix through PIL for comparison
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    tx = cx - cx - mag * cy
    ref = np.asarray(
        Image.fromarray(u).transform(
            (w, h), Image.AFFINE, (1, mag, tx, 0, 1, 0), Image.BICUBIC,
            fillcolor=(0, 0, 0)), np.uint8)
    err = np.abs(got.astype(int) - ref.astype(int)).mean() / 255.0
    assert err < 0.02, err
