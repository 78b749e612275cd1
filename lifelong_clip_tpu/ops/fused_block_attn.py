"""Fully-fused attention sub-block kernel: LN -> qkv -> SDPA -> out + res.

Goes one level beyond ``flash_attention``: the whole pre-MLP half of a
transformer block runs in one VMEM-resident program per batch row —
LayerNorm (fp32), fused qkv projection, per-head softmax attention, output
projection, and the residual add. Intermediates (qkv, scores, ctx) never
touch HBM; the weight blocks stay VMEM-resident across the batch grid
(constant index_map), so HBM traffic is ~(weights once + x in + out out).

Forward-only (used on inference paths); training keeps XLA's autodiff
(measured faster once its saved-probs backward is accounted for).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, ln_scale_ref, ln_bias_ref, w_qkv_ref, b_qkv_ref,
            w_out_ref, b_out_ref, mask_ref, a_in_ref, b_in_ref,
            a_out_ref, b_out_lora_ref, o_ref, *, n_heads: int, t: int,
            lora_scaling: float, eps: float = 1e-5):
    x = x_ref[0].astype(jnp.float32)                     # (Tp, D)
    d = x.shape[-1]
    tp = x.shape[0]

    # LayerNorm in fp32 (reference model.py:194-200 semantics)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_scale_ref[...].astype(jnp.float32) \
        + ln_bias_ref[...].astype(jnp.float32)
    h = h.astype(jnp.bfloat16)

    qkv = jax.lax.dot_general(
        h, w_qkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + \
        b_qkv_ref[...].astype(jnp.float32)               # (Tp, 3D)
    if lora_scaling != 0.0:
        z = jax.lax.dot_general(
            h, a_in_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (Tp, r)
        qkv = qkv + lora_scaling * jax.lax.dot_general(
            z.astype(jnp.bfloat16), b_in_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dh = d // n_heads
    scale = dh ** -0.5
    # padding + user mask (additive, shared across heads)
    pad_mask = mask_ref[...]

    heads_out = []
    for head in range(n_heads):
        lo = head * dh
        q = qkv[:, lo:lo + dh]
        k = qkv[:, d + lo:d + lo + dh]
        v = qkv[:, 2 * d + lo:2 * d + lo + dh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + pad_mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        heads_out.append(jax.lax.dot_general(
            p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(heads_out, axis=-1)

    ctx16 = ctx.astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        ctx16, w_out_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + \
        b_out_ref[...].astype(jnp.float32)
    if lora_scaling != 0.0:
        z2 = jax.lax.dot_general(
            ctx16, a_out_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + lora_scaling * jax.lax.dot_general(
            z2.astype(jnp.bfloat16),
            b_out_lora_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = (x + out).astype(o_ref.dtype)             # residual add


def _run_fused(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
               n_heads: int, mask, lora=None, lora_scaling: float = 0.0):
    b, t, d = x.shape
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    tp = _round_up(t, sub)
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))

    base = jnp.zeros((t, t), jnp.float32) if mask is None else \
        jnp.broadcast_to(mask.astype(jnp.float32), (t, t))
    base = jnp.pad(base, ((0, tp - t), (0, tp - t)),
                   constant_values=-jnp.inf)
    base = base.at[t:, 0].set(0.0)  # keep padded-row softmax finite

    w_qkv = w_qkv.astype(jnp.bfloat16)
    w_out = w_out.astype(jnp.bfloat16)
    if lora is not None:
        scaling = lora_scaling
        a_in, b_in = lora["a_in"], lora["b_in"]
        a_out, b_out_l = lora["a_out"], lora["b_out"]
        r = a_in.shape[-1]
    else:
        scaling = 0.0
        r = 8
        a_in = jnp.zeros((d, r), jnp.float32)
        b_in = jnp.zeros((r, 3 * d), jnp.float32)
        a_out = jnp.zeros((d, r), jnp.float32)
        b_out_l = jnp.zeros((r, d), jnp.float32)

    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, t=t,
                          lora_scaling=scaling),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(d), const(d),
            const(d, 3 * d), const(3 * d),
            const(d, d), const(d),
            const(tp, tp),
            const(d, r), const(r, 3 * d), const(d, r), const(r, d),
        ],
        out_specs=pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * tp * d * (4 * d + 2 * tp),
            bytes_accessed=(b * tp * d * 4 + 8 * d * d),
            transcendentals=b * n_heads * tp * tp,
        ),
    )(xp, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, base,
      a_in, b_in, a_out, b_out_l)
    return out[:, :t]


def _reference_math(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                    n_heads: int, mask, lora=None):
    """Pure-jnp equivalent (used for the recompute-based backward)."""
    from ..models.clip import layer_norm
    from .attention import multi_head_attention
    h = layer_norm(x, {"scale": ln_scale, "bias": ln_bias})
    params = {"w_qkv": w_qkv.astype(jnp.bfloat16),
              "b_qkv": b_qkv, "w_out": w_out.astype(jnp.bfloat16),
              "b_out": b_out}
    return x + multi_head_attention(h, params, n_heads, mask=mask,
                                    lora=lora, impl="xla")


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_ln_attention_block(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                             b_out, n_heads: int, lora_scaling: float = 0.0,
                             mask=None, lora=None):
    """x (B, T, D) -> x + out_proj(MHA(LN(x))), one fused VMEM program per
    batch row. Optional additive mask broadcastable to (T, T); optional
    LoRA deltas fused in-kernel. Backward recomputes through the pure-jnp
    equivalent (XLA autodiff), so all weight/LoRA grads flow."""
    return _run_fused(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                      n_heads, mask, lora, lora_scaling)


def _fused_fwd(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
               n_heads, lora_scaling, mask, lora):
    out = _run_fused(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                     n_heads, mask, lora, lora_scaling)
    return out, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, mask,
                 lora)


def _fused_bwd(n_heads, lora_scaling, res, g):
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, mask, lora = res
    if lora is None:
        _, vjp = jax.vjp(
            lambda *a: _reference_math(*a, n_heads=n_heads, mask=mask),
            x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out)
        grads = vjp(g)
        return grads + (None, None)
    _, vjp = jax.vjp(
        lambda *a: _reference_math(
            a[0], a[1], a[2], a[3], a[4], a[5], a[6], n_heads=n_heads,
            mask=mask, lora=dict(a[7], scaling=lora_scaling)),
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, lora)
    grads = vjp(g)
    return grads[:7] + (None, grads[7])


fused_ln_attention_block.defvjp(_fused_fwd, _fused_bwd)
