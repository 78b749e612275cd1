"""Pallas TPU fused-attention kernel.

Replaces the reference's attention fast path
(``torch._native_multi_head_attention`` dispatch at
``models/clip/lora.py:607-616``; slow path is an eager bmm/softmax/bmm
pipeline, ``lora.py:1043-1074``). CLIP's sequences are short (197 visual /
77 text tokens + prompt prefixes), so one (batch·head) program computes the
whole softmax(QKᵀ/√d)V tile in VMEM — scores never touch HBM, softmax runs
in fp32 on the VPU, and both matmuls hit the MXU.

Layout: inputs (B, T, D) are reshaped to (B·H, T, dh) and padded to TPU
tile boundaries; padded key columns are masked to -inf, padded query rows
are sliced away on return. Masks may be (T, S), (S,), or anything
broadcastable to (B, H, T, S) — batch-dependent masks fall back to the XLA
path upstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)              # (T, dh)
    k = k_ref[0].astype(jnp.float32)              # (S, dh)
    v = v_ref[0].astype(jnp.float32)              # (S, dh)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (T, S)
    scores = scores + mask_ref[...]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (out / denom).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, n_heads: int, mask=None):
    """Fused SDPA with custom VJP. q (B, T, D); k, v (B, S, D); optional
    additive mask broadcastable to (T, S). Returns (B, T, D).

    Forward runs the Pallas kernel; backward recomputes the (small) score
    tile with einsums and applies the standard attention gradient — at
    CLIP sequence lengths the recompute is cheaper than saving probs.
    """
    return _flash_forward(q, k, v, n_heads, mask)


def _flash_forward(q, k, v, n_heads: int, mask=None):
    b, t, d = q.shape
    s = k.shape[1]
    dh = d // n_heads
    dtype = q.dtype

    # tile padding: sublanes (second-minor) multiples of 16 for bf16 /
    # 8 for f32; lanes (dh) to 128
    sub = 16 if dtype == jnp.bfloat16 else 8
    tp = _round_up(t, sub)
    sp = _round_up(s, sub)
    dp = _round_up(dh, 128)

    def split_heads(x, length, lp):
        x = x.reshape(b, length, n_heads, dh).transpose(0, 2, 1, 3)
        x = x.reshape(b * n_heads, length, dh)
        return jnp.pad(x, ((0, 0), (0, lp - length), (0, dp - dh)))

    qh = split_heads(q, t, tp)
    kh = split_heads(k, s, sp)
    vh = split_heads(v, s, sp)

    # additive mask (T, S) in fp32, -inf over padded keys; masks with
    # leading singleton dims (per-layer prefix masks) squeeze down
    if mask is not None and mask.ndim > 2:
        mask = mask.reshape(mask.shape[-2:]) if mask.shape[-2] != 1 \
            else mask.reshape(mask.shape[-1:])
    base = jnp.zeros((t, s), jnp.float32) if mask is None \
        else jnp.broadcast_to(mask.astype(jnp.float32), (t, s))
    base = jnp.pad(base, ((0, tp - t), (0, sp - s)),
                   constant_values=-jnp.inf)
    # padded query rows: give them one finite key to keep softmax sane
    base = base.at[t:, 0].set(0.0)

    grid = (b * n_heads,)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=dh ** -0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, sp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n_heads, tp, dp), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n_heads * tp * sp * dp,
            bytes_accessed=(b * n_heads * (tp + 2 * sp) * dp * 2
                            + tp * sp * 4),
            transcendentals=b * n_heads * tp * sp,
        ),
    )(qh, kh, vh, base)

    out = out[:, :t, :dh].reshape(b, n_heads, t, dh)
    return out.transpose(0, 2, 1, 3).reshape(b, t, d)


def _flash_fwd_rule(q, k, v, n_heads: int, mask):
    return _flash_forward(q, k, v, n_heads, mask), (q, k, v, mask)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, mask_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float):
    """Fused backward: recompute p in VMEM, emit dq/dk/dv in one program."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + mask_ref[...]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)               # (T, S)
    dv_ref[0] = jax.lax.dot_general(
        p, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (T, S)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0] = (jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _flash_bwd_rule(n_heads: int, res, g):
    q, k, v, mask = res
    b, t, d = q.shape
    s = k.shape[1]
    dh = d // n_heads
    dtype = q.dtype

    sub = 16 if dtype == jnp.bfloat16 else 8
    tp = _round_up(t, sub)
    sp = _round_up(s, sub)
    dp_ = _round_up(dh, 128)

    def split_heads(x, length, lp):
        x = x.reshape(b, length, n_heads, dh).transpose(0, 2, 1, 3)
        x = x.reshape(b * n_heads, length, dh)
        return jnp.pad(x, ((0, 0), (0, lp - length), (0, dp_ - dh)))

    qh = split_heads(q, t, tp)
    kh = split_heads(k, s, sp)
    vh = split_heads(v, s, sp)
    gh = split_heads(g, t, tp)

    if mask is not None and mask.ndim > 2:
        mask = mask.reshape(mask.shape[-2:]) if mask.shape[-2] != 1 \
            else mask.reshape(mask.shape[-1:])
    base = jnp.zeros((t, s), jnp.float32) if mask is None \
        else jnp.broadcast_to(mask.astype(jnp.float32), (t, s))
    base = jnp.pad(base, ((0, tp - t), (0, sp - s)),
                   constant_values=-jnp.inf)
    base = base.at[t:, 0].set(0.0)

    spec_t = pl.BlockSpec((1, tp, dp_), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((1, sp, dp_), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=dh ** -0.5),
        grid=(b * n_heads,),
        in_specs=[spec_t, spec_s, spec_s, spec_t,
                  pl.BlockSpec((tp, sp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec_t, spec_s, spec_s),
        out_shape=(jax.ShapeDtypeStruct((b * n_heads, tp, dp_), dtype),
                   jax.ShapeDtypeStruct((b * n_heads, sp, dp_), dtype),
                   jax.ShapeDtypeStruct((b * n_heads, sp, dp_), dtype)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * n_heads * tp * sp * dp_,
            bytes_accessed=b * n_heads * (3 * tp + 4 * sp) * dp_ * 2,
            transcendentals=b * n_heads * tp * sp,
        ),
    )(qh, kh, vh, gh, base)

    def merge(x, length):
        x = x[:, :length, :dh].reshape(b, n_heads, length, dh)
        return x.transpose(0, 2, 1, 3).reshape(b, length, d)

    return (merge(dq, t).astype(q.dtype), merge(dk, s).astype(k.dtype),
            merge(dv, s).astype(v.dtype), None)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
