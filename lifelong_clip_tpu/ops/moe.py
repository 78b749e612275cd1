"""Dense mixture-of-adapter-experts dispatch.

The reference's ``SparseDispatcher`` (``models/clip/sparse_dispatcher.py``)
does data-dependent ``nonzero``/``split``/``index_add`` — shape-dynamic and
XLA-hostile. With the tiny expert count the reference uses (2 experts of
768→64→768 adapters), the TPU-right formulation is dense: every expert
computes, a top-k-masked gate matrix weights the combine. No dynamic shapes,
fully fusable, and numerically identical for samples inside top-k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# f32 operands must multiply at full precision (JAX's default matmul
# precision truncates f32 inputs to bf16); bf16 operands are unaffected,
# so this costs nothing on the bf16 hot path.
_P = jax.lax.Precision.HIGHEST

from ..config import PEFTConfig


def noisy_top_k_gates(cls_feats,
                      router,
                      w_noise,
                      top_k: int,
                      *,
                      rng=None,
                      noise_eps: float = 1e-2):
    """Per-sample noisy-top-k gates (reference model.py:559-594).

    cls_feats: (B, D); router/w_noise: (D, E). Returns (gates (B, E),
    importance (E,)) with gates softmaxed over the selected top-k only.
    """
    x32 = cls_feats.astype(jnp.float32)
    clean = x32 @ router.astype(jnp.float32)
    logits = clean
    if rng is not None:
        std = jax.nn.softplus(x32 @ w_noise.astype(jnp.float32)) + noise_eps
        logits = clean + jax.random.normal(rng, clean.shape) * std
    e = logits.shape[-1]
    k = min(top_k, e)
    top_vals, _ = jax.lax.top_k(logits, k)
    thresh = top_vals[:, k - 1:k]
    masked = jnp.where(logits >= thresh, logits, -jnp.inf)
    gates = jax.nn.softmax(masked, axis=-1)
    return gates, gates.sum(axis=0)


def moe_adapter_apply(x, moe, cfg: PEFTConfig, *, rng=None):
    """Gated sum of expert adapter deltas over the full token sequence.

    x: (B, T, D) block activations (gating uses x[:, 0]). moe: pytree from
    ``models.peft.init_moe`` with leaves (experts, ...) after the scan
    strips the layer axis.
    """
    gates, _ = noisy_top_k_gates(x[:, 0], moe["router"], moe["w_noise"],
                                 cfg.moe_top_k, rng=rng)
    ex = moe["experts"]
    h = jnp.einsum("btd,edk->betk", x, ex["w_down"],
                   preferred_element_type=jnp.float32, precision=_P)
    h = jax.nn.relu(h + ex["b_down"][None, :, None, :]).astype(x.dtype)
    y = jnp.einsum("betk,ekd->betd", h, ex["w_up"],
                   preferred_element_type=jnp.float32, precision=_P)
    y = y + ex["b_up"][None, :, None, :]
    y = cfg.adapter_scale * y
    out = jnp.einsum("be,betd->btd", gates.astype(jnp.float32),
                     y.astype(jnp.float32), precision=_P)
    return out.astype(x.dtype)


def cv_squared(x, eps: float = 1e-10):
    """Load-balancing penalty: squared coefficient of variation
    (reference model.py:497-515)."""
    x = x.astype(jnp.float32)
    return jnp.where(x.shape[0] <= 1, 0.0,
                     jnp.var(x) / (jnp.mean(x) ** 2 + eps))
