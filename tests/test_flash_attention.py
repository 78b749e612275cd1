"""Pallas fused attention vs the XLA einsum path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelong_clip_tpu.ops.attention import causal_mask, sdpa_xla


def _flash_interpret(q, k, v, n_heads, mask=None):
    """Run the pallas kernel in interpreter mode (no TPU needed)."""
    from jax.experimental.pallas import tpu as pltpu
    from lifelong_clip_tpu.ops import flash_attention as fa
    with pltpu.force_tpu_interpret_mode():
        return fa.flash_attention(q, k, v, n_heads, mask=mask)


@pytest.mark.parametrize("t,s", [(9, 9), (197, 197), (16, 24)])
def test_flash_matches_xla(t, s):
    rng = jax.random.PRNGKey(0)
    b, d, h = 2, 64, 4
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, d), jnp.float32)
    ref = sdpa_xla(q, k, v, h)
    out = _flash_interpret(q, k, v, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_with_causal_mask():
    rng = jax.random.PRNGKey(1)
    b, t, d, h = 2, 13, 64, 4
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, d), jnp.float32)
    mask = causal_mask(t)
    ref = sdpa_xla(q, k, v, h, mask=mask)
    out = _flash_interpret(q, k, v, h, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_bf16():
    rng = jax.random.PRNGKey(2)
    b, t, d, h = 2, 32, 64, 4
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, t, d)).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, t, d)).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, t, d)).astype(jnp.bfloat16)
    ref = sdpa_xla(q, k, v, h)
    out = _flash_interpret(q, k, v, h)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_flash_gradients_match_xla():
    """Custom VJP must match autodiff through the einsum path."""
    rng = jax.random.PRNGKey(3)
    b, t, d, h = 2, 17, 64, 4
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, d), jnp.float32)
    mask = causal_mask(t)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v, h, mask=mask) ** 2)

    from jax.experimental.pallas import tpu as pltpu
    from lifelong_clip_tpu.ops import flash_attention as fa

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, h, mask) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)
