"""Multi-head attention for the CLIP towers, TPU-first.

One attention implementation serves every PEFT variant the reference
expresses as module-class swaps (``models/clip/model.py:639-683``): optional
LoRA deltas are fused into the qkv/out projections, and prompt/prefix tokens
arrive as extra KV-side tokens, so the same traced computation covers
vanilla / LoRA / adapter / prefix blocks.

Two execution paths share one signature:
  * an XLA einsum path (default; XLA already fuses bias+softmax+matmul well
    at CLIP's 197/77-token sequence lengths), and
  * a Pallas flash-attention kernel for the fused softmax(QK^T)V pipeline
    (``lifelong_clip_tpu.ops.flash_attention``), enabled via ``impl='pallas'``.

Shapes are batch-first ``(B, T, D)`` throughout. Softmax runs in fp32
regardless of compute dtype (parity with the reference's fp32-upcast
LayerNorm/AMP behavior, ``models/clip/model.py:194-200``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# f32 operands must multiply at full precision (JAX's default matmul
# precision truncates f32 inputs to bf16); bf16 operands are unaffected,
# so this costs nothing on the bf16 hot path.
_P = jax.lax.Precision.HIGHEST


def qkv_projection(x_q, x_k, x_v, w_qkv, b_qkv, lora=None):
    """Project queries from ``x_q``, keys from ``x_k``, values from ``x_v``
    (k/v inputs may carry different prefix tokens, e.g. CoPL's Ek/Ev —
    reference ``PromptedMultiheadAttention``, models/clip/model.py:265-293).

    ``w_qkv``: (D, 3D) fused projection. ``lora``: optional dict with
    ``a_in`` (D, r), ``b_in`` (r, 3D) and scalar ``scaling`` — the low-rank
    delta is computed as two skinny matmuls and added to the fused qkv.
    """
    d = x_q.shape[-1]

    def proj(x, lo, hi):
        y = jnp.einsum("btd,de->bte", x, w_qkv[:, lo:hi],
                       preferred_element_type=jnp.float32, precision=_P)
        y = y + b_qkv[lo:hi]
        if lora is not None:
            z = jnp.einsum("btd,dr->btr", x, lora["a_in"],
                           preferred_element_type=jnp.float32, precision=_P)
            y = y + lora["scaling"] * jnp.einsum(
                "btr,re->bte", z, lora["b_in"][:, lo:hi],
                preferred_element_type=jnp.float32, precision=_P)
        return y.astype(x.dtype)

    q = proj(x_q, 0, d)
    k = proj(x_k, d, 2 * d)
    v = proj(x_v, 2 * d, 3 * d)
    return q, k, v


def sdpa_xla(q, k, v, n_heads: int, mask: Optional[jnp.ndarray] = None):
    """Scaled dot-product attention, einsum formulation (XLA fuses this)."""
    b, t, d = q.shape
    s = k.shape[1]
    dh = d // n_heads
    q = q.reshape(b, t, n_heads, dh)
    k = k.reshape(b, s, n_heads, dh)
    v = v.reshape(b, s, n_heads, dh)
    scores = jnp.einsum("bthc,bshc->bhts", q, k,
                        preferred_element_type=jnp.float32, precision=_P)
    scores = scores * (dh ** -0.5)
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bshc->bthc", probs, v,
                     preferred_element_type=jnp.float32, precision=_P)
    return out.reshape(b, t, d).astype(v.dtype)


_DEFAULT_IMPL = None


def default_impl() -> str:
    """Pallas fused attention on TPU, XLA einsum elsewhere."""
    global _DEFAULT_IMPL
    if _DEFAULT_IMPL is None:
        _DEFAULT_IMPL = ("pallas" if jax.default_backend() == "tpu"
                         else "xla")
    return _DEFAULT_IMPL


def multi_head_attention(x_q,
                         params,
                         n_heads: int,
                         *,
                         x_kv=None,
                         mask: Optional[jnp.ndarray] = None,
                         lora=None,
                         impl: Optional[str] = None):
    """Full MHA: fused qkv (+LoRA), SDPA, output projection (+LoRA).

    params: {'w_qkv': (D,3D), 'b_qkv': (3D,), 'w_out': (D,D), 'b_out': (D,)}
    lora:   optional {'a_in','b_in','a_out','b_out','scaling'}; out-proj LoRA
            follows the reference's zero-init-B convention
            (``models/clip/lora.py:141-160``), in-proj B is xavier-init
            (``lora.py:437-455``).
    mask:   additive mask broadcastable to (B, H, T, S).
    """
    impl = impl or default_impl()
    if impl == "pallas" and mask is not None and any(
            d != 1 for d in mask.shape[:-2]):
        impl = "xla"  # batch/head-dependent mask: einsum path handles it
    x_kv = x_q if x_kv is None else x_kv
    x_k, x_v = x_kv if isinstance(x_kv, tuple) else (x_kv, x_kv)
    q, k, v = qkv_projection(x_q, x_k, x_v, params["w_qkv"],
                             params["b_qkv"], lora=lora)
    if impl == "pallas":
        from .flash_attention import flash_attention
        ctx = flash_attention(q, k, v, n_heads, mask=mask)
    else:
        ctx = sdpa_xla(q, k, v, n_heads, mask=mask)
    out = jnp.einsum("btd,de->bte", ctx, params["w_out"],
                     preferred_element_type=jnp.float32, precision=_P)
    out = out + params["b_out"]
    if lora is not None and lora.get("a_out") is not None:
        z = jnp.einsum("btd,dr->btr", ctx, lora["a_out"],
                       preferred_element_type=jnp.float32, precision=_P)
        out = out + lora["scaling"] * jnp.einsum(
            "btr,re->bte", z, lora["b_out"],
            preferred_element_type=jnp.float32, precision=_P)
    return out.astype(x_q.dtype)


def causal_mask(t: int, prefix: int = 0, dtype=jnp.float32):
    """Additive causal mask of shape (t, prefix + t).

    Query i attends to all ``prefix`` KV tokens plus keys 0..i (parity with
    ``build_attention_mask`` at ``models/clip/model.py:926-932``, extended
    for KV-side prompt prefixes which are always visible).
    """
    i = jnp.arange(t)[:, None]
    j = jnp.arange(prefix + t)[None, :]
    allowed = (j < prefix) | ((j - prefix) <= i)
    return jnp.where(allowed, 0.0, -jnp.inf).astype(dtype)
