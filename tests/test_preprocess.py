"""Fused preprocessing + AutoAugment/RandAugment tests."""

import jax
import jax.numpy as jnp
import numpy as np

from lifelong_clip_tpu.ops import preprocess
from lifelong_clip_tpu.ops.autoaugment import (auto_augment_batch,
                                               autocontrast, equalize,
                                               posterize, rand_augment_batch,
                                               rotate, solarize)


def _imgs(n=4, s=32, seed=0):
    return (np.random.default_rng(seed)
            .integers(0, 255, (n, s, s, 3), np.uint8))


def test_train_pipeline_shapes_and_range():
    pipe = jax.jit(preprocess.make_train_pipeline(
        48, (0.5,) * 3, (0.25,) * 3, out_dtype=jnp.float32))
    out = pipe(jax.random.PRNGKey(0), jnp.asarray(_imgs()))
    assert out.shape == (4, 48, 48, 3)
    # normalized range for [0,1] input with mean .5 std .25: [-2, 2]
    assert float(out.min()) >= -2.01 and float(out.max()) <= 2.01


def test_pipeline_deterministic_per_key():
    pipe = jax.jit(preprocess.make_train_pipeline(
        32, (0.5,) * 3, (0.25,) * 3, use_autoaug=True,
        autoaug_policy="cifar10", out_dtype=jnp.float32))
    x = jnp.asarray(_imgs())
    a = pipe(jax.random.PRNGKey(7), x)
    b = pipe(jax.random.PRNGKey(7), x)
    c = pipe(jax.random.PRNGKey(8), x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_autoaugment_all_policies_jit():
    x = jnp.asarray(_imgs()).astype(jnp.float32) / 255.0
    for policy in ("imagenet", "cifar10", "svhn"):
        out = jax.jit(lambda r, x: auto_augment_batch(r, x, policy))(
            jax.random.PRNGKey(0), x)
        assert out.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(out)))
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_randaugment_jit():
    x = jnp.asarray(_imgs()).astype(jnp.float32) / 255.0
    out = jax.jit(rand_augment_batch)(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))


def test_color_ops_semantics():
    img = jnp.asarray(_imgs(1)[0]).astype(jnp.float32) / 255.0
    # posterize to 1 bit leaves only 0 or 128/255 per channel value
    p = posterize(img, jnp.asarray(1.0))
    assert set(np.unique(np.round(np.asarray(p) * 255))) <= {0.0, 128.0}
    # solarize threshold 0 inverts everything
    s = solarize(img, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(s), 1.0 - np.asarray(img),
                               atol=1e-6)
    # autocontrast stretches to [0, 1]
    ac = autocontrast(img * 0.5 + 0.25)
    assert float(ac.min()) < 0.02 and float(ac.max()) > 0.98
    # equalize flattens the histogram (roughly): output uses wide range
    eq = equalize(img)
    assert float(eq.max()) - float(eq.min()) > 0.9


def test_rotate_identity_at_zero():
    img = jnp.asarray(_imgs(1)[0]).astype(jnp.float32) / 255.0
    out = rotate(img, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_cutmix_mixes_labels():
    x = jnp.asarray(_imgs(8)).astype(jnp.float32) / 255.0
    y = jax.nn.one_hot(jnp.arange(8) % 4, 4)
    mixed, y_mixed, lam = preprocess.cutmix(jax.random.PRNGKey(3), x, y)
    assert mixed.shape == x.shape
    np.testing.assert_allclose(np.asarray(y_mixed.sum(-1)), 1.0, atol=1e-5)


def test_cutout_zeroes_patch():
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    out = preprocess.cutout(jax.random.PRNGKey(0), x, size=16, fill=0.0)
    frac = float(jnp.mean((out == 0).astype(jnp.float32)))
    assert 0.0 < frac < 0.5


def test_batched_warp_matches_gather_warp():
    """The einsum-form batched warp must equal the per-sample 4-tap
    gather warp exactly (same bilinear weights, same gray fill)."""
    from lifelong_clip_tpu.ops.autoaugment import (_affine_warp,
                                                   _batched_warp,
                                                   _center_mat)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((6, 32, 32, 3)), jnp.float32)
    # a mix of shears, rotations, translations (incl. out-of-range areas)
    raw = np.tile(np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                           np.float32), (6, 1, 1))
    raw[0, 0, 1] = 0.3            # shear x
    raw[1, 1, 0] = -0.25          # shear y
    raw[2, 0, 2] = 5.7            # translate x (subpixel)
    raw[3, 1, 2] = -3.2
    th = 0.4
    raw[4] = [[np.cos(th), np.sin(th), 0], [-np.sin(th), np.cos(th), 0]]
    raw[5] = [[1.1, 0.2, 1.5], [-0.1, 0.9, -2.0]]
    mats = jnp.asarray(np.stack([np.asarray(_center_mat(jnp.asarray(m),
                                                        32, 32))
                                 for m in raw]))
    ref = jax.vmap(_affine_warp)(x, mats)
    got = _batched_warp(x, mats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_randaugment_batched_matches_per_sample_ops():
    """Batched RandAugment must equal applying _apply_op per sample with
    the same drawn (op, magnitude, sign)."""
    from lifelong_clip_tpu.ops import autoaugment as aa
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    key = jax.random.PRNGKey(3)
    got = aa.rand_augment_batch(key, x, num_ops=2, magnitude=9)

    # replay the same draws
    ra_idx = jnp.asarray([aa._OP_NAMES.index(n) for n in aa._RA_OPS])
    mags = jnp.asarray([float(aa._OPS[n][1](9.0)) for n in aa._RA_OPS])
    keys = jax.random.split(key, 4)
    ref = x
    for i in range(2):
        pick = jax.random.randint(keys[2 * i], (8,), 0, len(aa._RA_OPS))
        sign = jnp.where(
            jax.random.bernoulli(keys[2 * i + 1], 0.5, (8,)), 1.0, -1.0)
        ref = jax.vmap(aa._apply_op)(ref, ra_idx[pick], mags[pick], sign)
    ref = jnp.clip(ref, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_batched_warp_highres_guard_matches():
    """Above the einsum-size threshold the warp routes to the gather path
    (the hat-tensor form would materialize GB-scale intermediates at
    224px); both forms agree at any size."""
    from lifelong_clip_tpu.ops.autoaugment import (_WARP_EINSUM_MAX_SIDE,
                                                   _affine_warp,
                                                   _batched_warp,
                                                   _center_mat)
    assert _WARP_EINSUM_MAX_SIDE < 224
    rng = np.random.default_rng(7)
    s = _WARP_EINSUM_MAX_SIDE + 16
    x = jnp.asarray(rng.random((2, s, s, 3)), jnp.float32)
    m = np.tile(np.array([[1.0, 0.3, 0.0], [0.0, 1.0, 2.5]], np.float32),
                (2, 1, 1))
    mats = jnp.asarray(np.stack([np.asarray(_center_mat(jnp.asarray(mm),
                                                        s, s))
                                 for mm in m]))
    got = _batched_warp(x, mats)
    ref = jax.vmap(_affine_warp)(x, mats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_batched_equalize_matches_per_sample_both_sides_of_guard():
    from lifelong_clip_tpu.ops.autoaugment import (_batched_equalize,
                                                   equalize)
    rng = np.random.default_rng(9)
    for s in (32, 72):  # one-hot path / per-sample fallback
        x = jnp.asarray(rng.integers(0, 256, (3, s, s, 3)) / 255.0,
                        jnp.float32)
        got = _batched_equalize(x)
        ref = jax.vmap(equalize)(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


def test_choose_suffix_len_boundaries():
    """Prefix sharing must disable rather than clamp below the EOT reach
    (a clamped window pools a pre-EOT token — wrong features)."""
    from lifelong_clip_tpu.models.proto_clip import choose_suffix_len
    # typical: lp=25, longest EOT at 33 -> need 9 -> bucket 16
    assert choose_suffix_len(33, 25, 77) == 16
    # EOT inside the prefix: nothing to share-suffix over
    assert choose_suffix_len(20, 25, 77) is None
    # exact fit at capacity: cap = 77-25-1 = 51, need 51 -> allowed
    assert choose_suffix_len(75, 25, 77) == 51
    # need exceeds capacity (EOT at the window edge): fall back entirely
    assert choose_suffix_len(76, 25, 77) is None


def test_resize_pad_random_crop_matches_unfused():
    """The gather-free fused resize+pad+crop must equal resize_bilinear
    followed by pad_random_crop for the SAME key (both draw the per-sample
    offsets with the identical split/randint sequence)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lifelong_clip_tpu.ops import preprocess

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((5, 32, 32, 3)), jnp.float32)
    key = jax.random.PRNGKey(7)
    ref = preprocess.pad_random_crop(
        key, preprocess.resize_bilinear(x, 48), pad=4)
    fused = preprocess.resize_pad_random_crop(key, x, 48, pad=4)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # no-resize case (input already at target size)
    x2 = jnp.asarray(rng.random((3, 48, 48, 3)), jnp.float32)
    ref2 = preprocess.pad_random_crop(key, x2, pad=4)
    fused2 = preprocess.resize_pad_random_crop(key, x2, 48, pad=4)
    np.testing.assert_allclose(np.asarray(fused2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)
