"""Fused LN+attention block kernel vs the unfused reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from lifelong_clip_tpu.ops.attention import causal_mask
from lifelong_clip_tpu.ops.fused_block_attn import (_reference_math,
                                                    fused_ln_attention_block)


def _setup(b=2, t=9, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    x = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    args = (1 + 0.1 * jax.random.normal(ks[1], (d,)),
            0.1 * jax.random.normal(ks[2], (d,)),
            0.1 * jax.random.normal(ks[3], (d, 3 * d)),
            0.1 * jax.random.normal(ks[4], (3 * d,)),
            0.1 * jax.random.normal(ks[5], (d, d)),
            0.1 * jax.random.normal(ks[6], (d,)))
    return x, args


@pytest.mark.parametrize("use_mask", [False, True])
def test_fused_block_matches_reference(use_mask):
    x, args = _setup()
    mask = causal_mask(x.shape[1]) if use_mask else None
    ref = _reference_math(x, *args, n_heads=4, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        out = fused_ln_attention_block(x, *args, 4, 0.0, mask)
    # bf16 weight quantization inside the kernel bounds the difference
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=6e-3, rtol=6e-3)


def test_fused_block_lora():
    x, args = _setup()
    d, r = 64, 4
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    lora = {"a_in": 0.1 * jax.random.normal(ks[0], (d, r)),
            "b_in": 0.1 * jax.random.normal(ks[1], (r, 3 * d)),
            "a_out": 0.1 * jax.random.normal(ks[2], (d, r)),
            "b_out": 0.1 * jax.random.normal(ks[3], (r, d))}
    ref = _reference_math(x, *args, n_heads=4, mask=None,
                          lora=dict(lora, scaling=0.25))
    with pltpu.force_tpu_interpret_mode():
        out = fused_ln_attention_block(x, *args, 4, 0.25, None, lora)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=6e-3, rtol=6e-3)
    # lora actually changes the output
    base = _reference_math(x, *args, n_heads=4, mask=None)
    assert not np.allclose(np.asarray(ref), np.asarray(base), atol=1e-4)


def test_fused_block_gradients():
    """Recompute backward == autodiff of the reference math."""
    x, args = _setup()
    mask = causal_mask(x.shape[1])

    def loss_ref(x, w_qkv):
        a = (args[0], args[1], w_qkv, args[3], args[4], args[5])
        return jnp.sum(_reference_math(x, *a, n_heads=4, mask=mask) ** 2)

    def loss_fused(x, w_qkv):
        a = (args[0], args[1], w_qkv, args[3], args[4], args[5])
        return jnp.sum(fused_ln_attention_block(x, *a, 4, 0.0, mask) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, args[2])
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1))(x, args[2])
    for a, b in zip(g_ref, g_fused):
        # grads flow through the recompute path (reference math exactly);
        # differences come only from the fwd output feeding the loss
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-2)


def test_fused_block_lora_gradients():
    """Fused backward kernel produces correct LoRA gradients."""
    x, args = _setup()
    d, r = 64, 4
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    lora = {"a_in": 0.1 * jax.random.normal(ks[0], (d, r)),
            "b_in": 0.1 * jax.random.normal(ks[1], (r, 3 * d)),
            "a_out": 0.1 * jax.random.normal(ks[2], (d, r)),
            "b_out": 0.1 * jax.random.normal(ks[3], (r, d))}

    def loss_ref(lo):
        return jnp.sum(_reference_math(
            x, *args, n_heads=4, mask=None,
            lora=dict(lo, scaling=0.25)) ** 2)

    def loss_fused(lo):
        return jnp.sum(fused_ln_attention_block(
            x, *args, 4, 0.25, None, lo) ** 2)

    g_ref = jax.grad(loss_ref)(lora)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused)(lora)
    for k in lora:
        np.testing.assert_allclose(np.asarray(g_fused[k]),
                                   np.asarray(g_ref[k]),
                                   atol=5e-2, rtol=5e-2)


def test_fused_prefix_block_matches_reference():
    from lifelong_clip_tpu.ops.fused_block_attn import (
        _prefix_reference_math, fused_prefix_attention_block)
    x, args = _setup()
    b, t, d = x.shape
    ks = jax.random.split(jax.random.PRNGKey(11), 2)
    pk = 0.3 * jax.random.normal(ks[0], (b, 5, d), jnp.float32)
    pv = 0.3 * jax.random.normal(ks[1], (b, 5, d), jnp.float32)
    ref = _prefix_reference_math(x, pk, pv, *args, n_heads=4, mask=None)
    with pltpu.force_tpu_interpret_mode():
        out = fused_prefix_attention_block(x, pk, pv, *args, 4, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=6e-3, rtol=6e-3)
    # asymmetric prefixes actually matter
    ref_sym = _prefix_reference_math(x, pk, pk, *args, n_heads=4,
                                     mask=None)
    assert not np.allclose(np.asarray(ref), np.asarray(ref_sym),
                           atol=1e-4)


def test_fused_prefix_block_prompt_gradients():
    """dprefix flows (prompt tokens are trainable)."""
    from lifelong_clip_tpu.ops.fused_block_attn import (
        _prefix_reference_math, fused_prefix_attention_block)
    x, args = _setup()
    b, t, d = x.shape
    ks = jax.random.split(jax.random.PRNGKey(12), 2)
    pk = 0.3 * jax.random.normal(ks[0], (b, 5, d), jnp.float32)
    pv = 0.3 * jax.random.normal(ks[1], (b, 5, d), jnp.float32)

    def lf(pk, pv):
        return jnp.sum(fused_prefix_attention_block(
            x, pk, pv, *args, 4, None) ** 2)

    def lr(pk, pv):
        return jnp.sum(_prefix_reference_math(
            x, pk, pv, *args, n_heads=4, mask=None) ** 2)

    g_ref = jax.grad(lr, argnums=(0, 1))(pk, pv)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(lf, argnums=(0, 1))(pk, pv)
    for a, b_ in zip(g_ref, g_fused):
        assert float(jnp.abs(a).max()) > 0
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=5e-2, rtol=5e-2)


def test_weight_grads_false_skips_dw_keeps_dx_dlora():
    """weight_grads=False: dx and LoRA grads identical to the full
    backward; base-weight/LN grads come back as exact zeros."""
    x, args = _setup()
    d, r = 64, 4
    ks = jax.random.split(jax.random.PRNGKey(13), 4)
    lora = {"a_in": 0.1 * jax.random.normal(ks[0], (d, r)),
            "b_in": 0.1 * jax.random.normal(ks[1], (r, 3 * d)),
            "a_out": 0.1 * jax.random.normal(ks[2], (d, r)),
            "b_out": 0.1 * jax.random.normal(ks[3], (r, d))}
    mask = causal_mask(x.shape[1])

    def loss(x, w_qkv, ls, lo, wg):
        a = (ls, args[1], w_qkv, args[3], args[4], args[5])
        return jnp.sum(fused_ln_attention_block(
            x, *a, 4, 0.25, mask, lo, wg) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_full = jax.grad(loss, argnums=(0, 1, 2, 3))(
            x, args[2], args[0], lora, True)
        g_skip = jax.grad(loss, argnums=(0, 1, 2, 3))(
            x, args[2], args[0], lora, False)
    # dx identical
    np.testing.assert_allclose(np.asarray(g_skip[0]),
                               np.asarray(g_full[0]), atol=1e-6)
    # LoRA grads identical
    for k in lora:
        np.testing.assert_allclose(np.asarray(g_skip[3][k]),
                                   np.asarray(g_full[3][k]), atol=1e-6)
    # base weight + LN grads: nonzero with the flag on, zero with it off
    assert float(jnp.abs(g_full[1]).max()) > 0
    assert float(jnp.abs(g_full[2]).max()) > 0
    np.testing.assert_array_equal(np.asarray(g_skip[1]), 0.0)
    np.testing.assert_array_equal(np.asarray(g_skip[2]), 0.0)


def test_prefix_weight_grads_false_keeps_dprefix():
    from lifelong_clip_tpu.ops.fused_block_attn import (
        fused_prefix_attention_block)
    x, args = _setup()
    b, t, d = x.shape
    ks = jax.random.split(jax.random.PRNGKey(14), 2)
    pk = 0.3 * jax.random.normal(ks[0], (b, 5, d), jnp.float32)
    pv = 0.3 * jax.random.normal(ks[1], (b, 5, d), jnp.float32)

    def loss(pk, pv, w_qkv, wg):
        a = (args[0], args[1], w_qkv, args[3], args[4], args[5])
        return jnp.sum(fused_prefix_attention_block(
            x, pk, pv, *a, 4, None, wg) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_full = jax.grad(loss, argnums=(0, 1, 2))(pk, pv, args[2], True)
        g_skip = jax.grad(loss, argnums=(0, 1, 2))(pk, pv, args[2], False)
    np.testing.assert_allclose(np.asarray(g_skip[0]),
                               np.asarray(g_full[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_skip[1]),
                               np.asarray(g_full[1]), atol=1e-6)
    assert float(jnp.abs(g_full[2]).max()) > 0
    np.testing.assert_array_equal(np.asarray(g_skip[2]), 0.0)


def test_tower_pallas_path_lora_grads_match_xla():
    """End-to-end wiring check for the frozen-tower fast backward: a LoRA
    image-tower grad through the pallas kernels (interpret mode) with the
    engine's base_grads=False must match the XLA einsum path."""
    import sys
    sys.path.insert(0, "tests")
    from test_engine import TINY
    from lifelong_clip_tpu.config import PEFTConfig
    from lifelong_clip_tpu.models import clip as clip_fns
    from lifelong_clip_tpu.models.init import init_clip_params
    from lifelong_clip_tpu.models.peft import init_tower_peft

    peft_cfg = PEFTConfig(method="lora", encoder="image", lora_r=4,
                          lora_alpha=16)
    frozen = init_clip_params(jax.random.PRNGKey(0), TINY)
    peft = init_tower_peft(jax.random.PRNGKey(1), TINY.vision_layers,
                           TINY.vision_width, peft_cfg)
    # out-proj LoRA B inits to zeros (standard LoRA), which would make
    # a_out's grad identically zero — perturb so every grad is exercised
    peft["lora"]["b_out"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(3), peft["lora"]["b_out"].shape)
    images = jax.random.normal(jax.random.PRNGKey(2),
                               (2, TINY.image_size, TINY.image_size, 3),
                               jnp.float32)

    def loss(peft, impl):
        img = clip_fns.encode_image(frozen, images, TINY,
                                    peft_cfg=peft_cfg, peft=peft,
                                    compute_dtype=jnp.float32,
                                    attn_impl=impl, base_grads=False)
        return jnp.sum(img.astype(jnp.float32) ** 2)

    g_xla = jax.grad(loss)(peft, "xla")
    with pltpu.force_tpu_interpret_mode():
        g_pallas = jax.grad(loss)(peft, "pallas")
    for k in g_xla["lora"]:
        ref = np.asarray(g_xla["lora"][k])
        got = np.asarray(g_pallas["lora"][k])
        assert float(np.abs(ref).max()) > 0, k
        # the kernel recomputes in bf16 internally; tolerance scales with
        # the grad magnitude (relative error per element blows up on the
        # few near-zero entries)
        np.testing.assert_allclose(got, ref, rtol=5e-2,
                                   atol=5e-2 * float(np.abs(ref).max()))
        cos = float((got * ref).sum() /
                    (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-12))
        assert cos > 0.999, (k, cos)
