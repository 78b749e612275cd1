"""Fully-fused attention sub-block kernel: LN -> qkv -> SDPA -> out + res.

Goes one level beyond ``flash_attention``: the whole pre-MLP half of a
transformer block runs in one VMEM-resident program per GROUP of batch
rows — LayerNorm (fp32), fused qkv projection, per-head softmax attention,
output projection, and the residual add. Intermediates (qkv, scores, ctx)
never touch HBM; the weight blocks stay VMEM-resident across the batch
grid (constant index_map), so HBM traffic is ~(weights once + x in + out
out). Batching R rows per program (R=4 fwd / 2 bwd by default, the
``tools/sweep_fused_rows.py`` winners; see ``_ROWS_FWD``) fattens the
projection matmuls from M=Tp to M=R*Tp — the
per-row grid ran them at the skinny-matmul rate (~64 TFLOP/s vs ~93
achievable at ViT-B shapes on v5e).

Forward AND backward are hand-written kernels (custom_vjp): the backward
recomputes probabilities from the bf16 qkv instead of saving them, fuses
the LoRA delta in-kernel, and accumulates weight grads across a sequential
batch grid. Measured on v5e: 12-layer fwd chain 7.7 ms vs 20.4 ms unfused
XLA (2.65x); vision fwd+bwd 57 ms vs 90 ms XLA autodiff (1.57x) — see
BASELINE.md. Variants: vanilla/LoRA square-mask and KV-prefix (prompted)
blocks, both with custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# rows per Pallas program. One row per program (r2 design) leaves the
# M=197 projection matmuls too skinny for the MXU: measured ~64 TFLOP/s
# against a ~93 TFLOP/s FLOP-weighted achievable at ViT-B block shapes
# (VERDICT r2). Batching R rows fattens every projection to M = R*Tp and
# the dW contractions to K = R*Tp; attention stays per-row via batched
# dot_generals. Env-tunable for hardware sweeps.
import os
_ROWS_FWD = int(os.environ.get("LLC_FUSED_ROWS_FWD", "4"))
_ROWS_BWD = int(os.environ.get("LLC_FUSED_ROWS_BWD", "2"))


def _pick_rows(b: int, pref: int) -> int:
    r = max(min(pref, b), 1)
    while b % r:
        r -= 1
    return r


def _kernel(x_ref, ln_scale_ref, ln_bias_ref, w_qkv_ref, b_qkv_ref,
            w_out_ref, b_out_ref, mask_ref, a_in_ref, b_in_ref,
            a_out_ref, b_out_lora_ref, o_ref, *, n_heads: int, t: int,
            lora_scaling: float, eps: float = 1e-5):
    xr = x_ref[...]                                      # (R, Tp, D)
    r, tp, d = xr.shape
    x = xr.reshape(r * tp, d).astype(jnp.float32)

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
        b_qkv_ref[...].astype(jnp.float32)               # (R*Tp, 3D)
    if lora_scaling != 0.0:
        z = jax.lax.dot_general(
            h, a_in_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (R*Tp, r)
        qkv = qkv + lora_scaling * jax.lax.dot_general(
            z.astype(jnp.bfloat16), b_in_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dh = d // n_heads
    scale = dh ** -0.5
    # padding + user mask (additive, shared across rows and heads)
    pad_mask = mask_ref[...]

    qkv3 = qkv.astype(jnp.bfloat16).reshape(r, tp, 3 * d)
    heads_out = []
    for head in range(n_heads):
        lo = head * dh
        q = qkv3[:, :, lo:lo + dh]
        k = qkv3[:, :, d + lo:d + lo + dh]
        v = qkv3[:, :, 2 * d + lo:2 * d + lo + dh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale \
            + pad_mask[None]                             # (R, Tp, Tp)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        heads_out.append(jax.lax.dot_general(
            p.astype(jnp.bfloat16), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))         # (R, Tp, dh)
    ctx = jnp.concatenate(heads_out, axis=-1).reshape(r * tp, d)

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
    o_ref[...] = (x + out).reshape(r, tp, d).astype(o_ref.dtype)


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
    rows = _pick_rows(b, _ROWS_FWD)
    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, t=t,
                          lora_scaling=scaling),
        grid=(b // rows,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((rows, tp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(d), const(d),
            const(d, 3 * d), const(3 * d),
            const(d, d), const(d),
            const(tp, tp),
            const(d, r), const(r, 3 * d), const(d, r), const(r, d),
        ],
        out_specs=pl.BlockSpec((rows, tp, d), lambda i: (i, 0, 0),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 11))
def fused_ln_attention_block(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                             b_out, n_heads: int, lora_scaling: float = 0.0,
                             mask=None, lora=None,
                             weight_grads: bool = True):
    """x (B, T, D) -> x + out_proj(MHA(LN(x))), one fused VMEM program per
    batch row. Optional additive mask broadcastable to (T, T); optional
    LoRA deltas fused in-kernel. Backward is a hand-written recompute
    kernel, so all weight/LoRA grads flow.

    ``weight_grads=False`` asserts the base block weights (w_qkv/b_qkv/
    w_out/b_out/LN) are NOT being differentiated — their grads come back
    as zeros and the backward kernel skips the dW matmuls (~1/3 of its
    matmul FLOPs). PEFT methods train only LoRA/prompt subtrees, so this
    is the hot-path default via ``_block(base_grads=False)``."""
    return _run_fused(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                      n_heads, mask, lora, lora_scaling)


def _fused_fwd(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
               n_heads, lora_scaling, mask, lora, weight_grads):
    out = _run_fused(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                     n_heads, mask, lora, lora_scaling)
    return out, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, mask,
                 lora)


def _fused_bwd(n_heads, lora_scaling, weight_grads, res, g):
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, mask, lora = res
    grads, dlora = _run_fused_bwd(x, g, ln_scale, ln_bias, w_qkv, b_qkv,
                                  w_out, mask, lora, n_heads, lora_scaling,
                                  weight_grads)
    dx, dls, dlb, dwqkv, dbqkv, dwout, dbout = grads

    def like(grad, primal):
        return grad.astype(primal.dtype)

    out = (like(dx, x), like(dls, ln_scale), like(dlb, ln_bias),
           like(dwqkv, w_qkv), like(dbqkv, b_qkv), like(dwout, w_out),
           like(dbout, b_out))
    if lora is None:
        return out + (None, None)
    dlora = {k: like(v, lora[k]) for k, v in dlora.items()}
    return out + (None, dlora)


fused_ln_attention_block.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# fused backward: recompute the block half in VMEM and emit dx + all weight
# grads in one pass. Weight-grad outputs use constant index maps; TPU grids
# execute sequentially, so accumulation across batch programs is safe
# (zero-initialized at program 0).
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, g_ref, ln_scale_ref, ln_bias_ref, w_qkv_ref,
                b_qkv_ref, w_out_ref, mask_ref, a_in_ref, b_in_ref,
                a_out_ref, b_out_lora_ref,
                dx_ref, dls_ref, dlb_ref, dwqkv_ref, dbqkv_ref,
                dwout_ref, dbout_ref, dain_ref, dbin_ref, daout_ref,
                dbout_l_ref,
                *, n_heads: int, lora_scaling: float,
                weight_grads: bool = True, eps: float = 1e-5):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)
        dain_ref[...] = jnp.zeros_like(dain_ref)
        dbin_ref[...] = jnp.zeros_like(dbin_ref)
        daout_ref[...] = jnp.zeros_like(daout_ref)
        dbout_l_ref[...] = jnp.zeros_like(dbout_l_ref)

    xr = x_ref[...]                                     # (R, Tp, D)
    rr, tp, d = xr.shape
    x = xr.reshape(rr * tp, d).astype(jnp.float32)
    g = g_ref[...].reshape(rr * tp, d).astype(jnp.float32)   # d(y)
    dh_dim = d // n_heads
    scale = dh_dim ** -0.5

    # ---- forward recompute ----
    gamma = ln_scale_ref[...].astype(jnp.float32)
    beta = ln_bias_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    h32 = xhat * gamma + beta
    h = h32.astype(jnp.bfloat16)

    w_qkv = w_qkv_ref[...]
    qkv = jax.lax.dot_general(
        h, w_qkv, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + \
        b_qkv_ref[...].astype(jnp.float32)
    if lora_scaling != 0.0:
        a_in = a_in_ref[...].astype(jnp.bfloat16)
        b_in = b_in_ref[...].astype(jnp.bfloat16)
        z = jax.lax.dot_general(
            h, a_in, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = qkv + lora_scaling * jax.lax.dot_general(
            z.astype(jnp.bfloat16), b_in,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    pad_mask = mask_ref[...]
    qkv3 = qkv.astype(jnp.bfloat16).reshape(rr, tp, 3 * d)

    def head_probs(head):
        lo = head * dh_dim
        q = qkv3[:, :, lo:lo + dh_dim]
        k = qkv3[:, :, d + lo:d + lo + dh_dim]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale + pad_mask[None]
        m = jnp.max(s, axis=-1, keepdims=True)
        pr = jnp.exp(s - m)
        return pr / jnp.sum(pr, axis=-1, keepdims=True)   # (R, Tp, Tp)

    # probabilities are reused by the attention backward below — compute
    # each head's score/softmax ONCE (they are recomputed from bf16 qkv,
    # not saved from the forward)
    probs = [head_probs(h) for h in range(n_heads)]
    ctxs = []
    for head in range(n_heads):
        lo = head * dh_dim
        v = qkv3[:, :, 2 * d + lo:2 * d + lo + dh_dim]
        ctxs.append(jax.lax.dot_general(
            probs[head].astype(jnp.bfloat16), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))          # (R, Tp, dh)
    ctx = jnp.concatenate(ctxs, axis=-1).reshape(rr * tp, d)
    ctx16 = ctx.astype(jnp.bfloat16)

    # ---- backward ----
    g16 = g.astype(jnp.bfloat16)
    w_out = w_out_ref[...]
    # out-proj grads (skipped when the base weights are frozen)
    if weight_grads:
        dwout_ref[...] += jax.lax.dot_general(
            ctx16, g16, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbout_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    dctx = jax.lax.dot_general(
        g16, w_out, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if lora_scaling != 0.0:
        a_out = a_out_ref[...].astype(jnp.bfloat16)
        b_out_l = b_out_lora_ref[...].astype(jnp.bfloat16)
        z2 = jax.lax.dot_general(
            ctx16, a_out, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbout_l_ref[...] += lora_scaling * jax.lax.dot_general(
            z2.astype(jnp.bfloat16), g16,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dz2 = lora_scaling * jax.lax.dot_general(
            g16, b_out_l, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        daout_ref[...] += jax.lax.dot_general(
            ctx16, dz2.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dctx = dctx + jax.lax.dot_general(
            dz2.astype(jnp.bfloat16), a_out,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # attention backward per head -> dqkv (batched over R)
    dctx3 = dctx.reshape(rr, tp, d)
    dqkv_parts_q, dqkv_parts_k, dqkv_parts_v = [], [], []
    for head in range(n_heads):
        lo = head * dh_dim
        q = qkv3[:, :, lo:lo + dh_dim]
        k = qkv3[:, :, d + lo:d + lo + dh_dim]
        v = qkv3[:, :, 2 * d + lo:2 * d + lo + dh_dim]
        p = probs[head]
        dctx_h = dctx3[:, :, lo:lo + dh_dim].astype(jnp.bfloat16)
        dv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), dctx_h,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (R, Tp, dh)
        dp = jax.lax.dot_general(
            dctx_h, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (R, Tp, Tp)
        dscore = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds16 = dscore.astype(jnp.bfloat16)
        dq = jax.lax.dot_general(
            ds16, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds16, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dqkv_parts_q.append(dq)
        dqkv_parts_k.append(dk)
        dqkv_parts_v.append(dv)
    dqkv = jnp.concatenate(
        dqkv_parts_q + dqkv_parts_k + dqkv_parts_v,
        axis=-1).reshape(rr * tp, 3 * d)

    dqkv16 = dqkv.astype(jnp.bfloat16)
    if weight_grads:
        dwqkv_ref[...] += jax.lax.dot_general(
            h, dqkv16, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbqkv_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)
    dh = jax.lax.dot_general(
        dqkv16, w_qkv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if lora_scaling != 0.0:
        dz = lora_scaling * jax.lax.dot_general(
            dqkv16, b_in, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dain_ref[...] += jax.lax.dot_general(
            h, dz.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbin_ref[...] += lora_scaling * jax.lax.dot_general(
            z.astype(jnp.bfloat16), dqkv16,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = dh + jax.lax.dot_general(
            dz.astype(jnp.bfloat16), a_in,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # LayerNorm backward
    if weight_grads:
        dls_ref[...] += jnp.sum(dh * xhat, axis=0, keepdims=True)
        dlb_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dxhat = dh * gamma
    mean_dxhat = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean_dxhat_xhat = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - mean_dxhat - xhat * mean_dxhat_xhat)
    dx_ref[...] = (g + dx_ln).reshape(rr, tp, d).astype(dx_ref.dtype)


def _run_fused_bwd(x, g, ln_scale, ln_bias, w_qkv, b_qkv, w_out, mask,
                   lora, n_heads: int, lora_scaling: float,
                   weight_grads: bool = True):
    b, t, d = x.shape
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    tp = _round_up(t, sub)
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, tp - t), (0, 0)))

    base = jnp.zeros((t, t), jnp.float32) if mask is None else \
        jnp.broadcast_to(mask.astype(jnp.float32), (t, t))
    base = jnp.pad(base, ((0, tp - t), (0, tp - t)),
                   constant_values=-jnp.inf)
    base = base.at[t:, 0].set(0.0)

    if lora is not None:
        a_in, b_in = lora["a_in"], lora["b_in"]
        a_out, b_out_l = lora["a_out"], lora["b_out"]
        r = a_in.shape[-1]
    else:
        r = 8
        a_in = jnp.zeros((d, r), jnp.float32)
        b_in = jnp.zeros((r, 3 * d), jnp.float32)
        a_out = jnp.zeros((d, r), jnp.float32)
        b_out_l = jnp.zeros((r, d), jnp.float32)

    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    rows = _pick_rows(b, _ROWS_BWD)
    row = pl.BlockSpec((rows, tp, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads=n_heads,
                          lora_scaling=lora_scaling,
                          weight_grads=weight_grads),
        grid=(b // rows,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[row, row, const(d), const(d), const(d, 3 * d),
                  const(3 * d), const(d, d), const(tp, tp),
                  const(d, r), const(r, 3 * d), const(d, r), const(r, d)],
        out_specs=(row, const(1, d), const(1, d), const(d, 3 * d),
                   const(1, 3 * d), const(d, d), const(1, d),
                   const(d, r), const(r, 3 * d), const(d, r),
                   const(r, d)),
        out_shape=(jax.ShapeDtypeStruct((b, tp, d), x.dtype),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, 3 * d), f32),
                   jax.ShapeDtypeStruct((1, 3 * d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, r), f32),
                   jax.ShapeDtypeStruct((r, 3 * d), f32),
                   jax.ShapeDtypeStruct((d, r), f32),
                   jax.ShapeDtypeStruct((r, d), f32)),
    )(xp, gp, ln_scale, ln_bias, w_qkv.astype(jnp.bfloat16), b_qkv,
      w_out.astype(jnp.bfloat16), base, a_in, b_in, a_out, b_out_l)

    (dx, dls, dlb, dwqkv, dbqkv, dwout, dbout, dain, dbin, daout,
     dboutl) = outs
    dx = dx[:, :t]
    grads = (dx, dls[0], dlb[0], dwqkv, dbqkv[0], dwout, dbout[0])
    if lora is None:
        return grads, None
    return grads, {"a_in": dain, "b_in": dbin, "a_out": daout,
                   "b_out": dboutl}


# ---------------------------------------------------------------------------
# KV-prefix variant: prompt tokens (possibly distinct for K and V — CoPL's
# Ek/Ev) join the key/value source, queries come from LN(x) only. Serves
# the prompted towers (MVP g/e pools, CoPL, DualPrompt). Backward
# recomputes through the pure-jnp equivalent (prompts are trainable, so
# dprefix must flow).
# ---------------------------------------------------------------------------

def _prefix_kernel(x_ref, pk_ref, pv_ref, ln_scale_ref, ln_bias_ref,
                   w_qkv_ref, b_qkv_ref, w_out_ref, b_out_ref, mask_ref,
                   o_ref, *, n_heads: int, eps: float = 1e-5):
    xr = x_ref[...]                                     # (R, Tp, D)
    r, tp, d = xr.shape
    x = xr.reshape(r * tp, d).astype(jnp.float32)

    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + eps)
    h = h * ln_scale_ref[...].astype(jnp.float32) \
        + ln_bias_ref[...].astype(jnp.float32)
    h16 = h.astype(jnp.bfloat16)

    pk = pk_ref[...].astype(jnp.bfloat16)               # (R, Pp, D)
    pv = pv_ref[...].astype(jnp.bfloat16)
    h3 = h16.reshape(r, tp, d)
    k_src = jnp.concatenate([pk, h3], axis=1)           # (R, Sp, D)
    v_src = jnp.concatenate([pv, h3], axis=1)
    sp = k_src.shape[1]

    w_qkv = w_qkv_ref[...]
    b_qkv = b_qkv_ref[...].astype(jnp.float32)
    # projections flattened over rows: M = R*Tp / R*Sp (skinny per-row
    # matmuls are the per-program grid's loss mode — see _ROWS_FWD)
    q = (jax.lax.dot_general(
        h16, w_qkv[:, :d], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + b_qkv[:d]).astype(jnp.bfloat16).reshape(r, tp, d)
    k = (jax.lax.dot_general(
        k_src.reshape(r * sp, d), w_qkv[:, d:2 * d],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + b_qkv[d:2 * d]).astype(jnp.bfloat16).reshape(r, sp, d)
    v = (jax.lax.dot_general(
        v_src.reshape(r * sp, d), w_qkv[:, 2 * d:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + b_qkv[2 * d:]).astype(jnp.bfloat16).reshape(r, sp, d)

    dh = d // n_heads
    scale = dh ** -0.5
    pad_mask = mask_ref[...]
    heads_out = []
    for head in range(n_heads):
        lo = head * dh
        s = jax.lax.dot_general(
            q[:, :, lo:lo + dh], k[:, :, lo:lo + dh],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale + pad_mask[None]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        heads_out.append(jax.lax.dot_general(
            p.astype(jnp.bfloat16), v[:, :, lo:lo + dh],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))        # (R, Tp, dh)
    ctx = jnp.concatenate(heads_out, axis=-1).reshape(r * tp, d)

    out = jax.lax.dot_general(
        ctx.astype(jnp.bfloat16), w_out_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + \
        b_out_ref[...].astype(jnp.float32)
    o_ref[...] = (x + out).reshape(r, tp, d).astype(o_ref.dtype)


def _prefix_reference_math(x, pk, pv, ln_scale, ln_bias, w_qkv, b_qkv,
                           w_out, b_out, n_heads: int, mask):
    from ..models.clip import layer_norm
    from .attention import multi_head_attention
    h = layer_norm(x, {"scale": ln_scale, "bias": ln_bias})
    x_kv = (jnp.concatenate([pk.astype(h.dtype), h], axis=1),
            jnp.concatenate([pv.astype(h.dtype), h], axis=1))
    params = {"w_qkv": w_qkv.astype(jnp.bfloat16), "b_qkv": b_qkv,
              "w_out": w_out.astype(jnp.bfloat16), "b_out": b_out}
    return x + multi_head_attention(h, params, n_heads, x_kv=x_kv,
                                    mask=mask, impl="xla")


def _run_prefix_fused(x, pk, pv, ln_scale, ln_bias, w_qkv, b_qkv, w_out,
                      b_out, n_heads: int, mask, rows_pref=None):
    b, t, d = x.shape
    p_len = pk.shape[1]
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    tp = _round_up(t, sub)
    pp = _round_up(p_len, sub)
    sp = pp + tp
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    pkp = jnp.pad(pk, ((0, 0), (0, pp - p_len), (0, 0)))
    pvp = jnp.pad(pv, ((0, 0), (0, pp - p_len), (0, 0)))

    s_len = p_len + t
    base = jnp.zeros((t, s_len), jnp.float32) if mask is None else \
        jnp.broadcast_to(mask.astype(jnp.float32), (t, s_len))
    # layout in the kernel: [padded prefix (pp) | padded tokens (tp)]
    full = jnp.full((tp, sp), -jnp.inf, jnp.float32)
    full = jax.lax.dynamic_update_slice(full, base[:, :p_len], (0, 0))
    full = jax.lax.dynamic_update_slice(full, base[:, p_len:], (0, pp))
    full = full.at[t:, 0].set(0.0)  # keep padded-row softmax finite
    # padded-prefix columns stay -inf; padded query rows handled above

    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    rows = _pick_rows(b, rows_pref or _ROWS_FWD)
    row = lambda ln: pl.BlockSpec((rows, ln, d), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_prefix_kernel, n_heads=n_heads),
        grid=(b // rows,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[row(tp), row(pp), row(pp), const(d), const(d),
                  const(d, 3 * d), const(3 * d), const(d, d), const(d),
                  const(tp, sp)],
        out_specs=row(tp),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * tp * d * (4 * d + 2 * sp),
            bytes_accessed=b * (tp + 2 * pp) * d * 4 + 8 * d * d,
            transcendentals=b * n_heads * tp * sp,
        ),
    )(xp, pkp.astype(x.dtype), pvp.astype(x.dtype), ln_scale, ln_bias,
      w_qkv.astype(jnp.bfloat16), b_qkv, w_out.astype(jnp.bfloat16),
      b_out, full)
    return out[:, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 11, 12, 13))
def fused_prefix_attention_block(x, pk, pv, ln_scale, ln_bias, w_qkv,
                                 b_qkv, w_out, b_out, n_heads: int,
                                 mask=None, weight_grads: bool = True,
                                 rows_fwd=None, rows_bwd=None):
    """Prompted block half: x + out_proj(MHA(LN(x); KV prefixed by
    pk/pv)). pk/pv (B, P, D) are trainable prompt tokens (CoPL Ek/Ev or a
    shared prefix). Backward is a hand-written recompute kernel; dpk/dpv
    always flow. ``weight_grads=False`` asserts the block weights are
    frozen (the usual case — prompted towers train only the prompts): the
    backward skips the dW matmuls and returns zeros for them.
    ``rows_fwd/rows_bwd`` override the rows-per-program defaults — callers
    with many short rows (e.g. ProtoCLIP's B*C pair batch) want far more
    rows per program than the 208-token vision tower."""
    return _run_prefix_fused(x, pk, pv, ln_scale, ln_bias, w_qkv, b_qkv,
                             w_out, b_out, n_heads, mask,
                             rows_pref=rows_fwd)


def _prefix_fwd(x, pk, pv, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                n_heads, mask, weight_grads, rows_fwd, rows_bwd):
    out = _run_prefix_fused(x, pk, pv, ln_scale, ln_bias, w_qkv, b_qkv,
                            w_out, b_out, n_heads, mask,
                            rows_pref=rows_fwd)
    return out, (x, pk, pv, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                 mask)


def _prefix_bwd(n_heads, weight_grads, rows_fwd, rows_bwd, res, g):
    x, pk, pv, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out, mask = res
    (dx, dpk, dpv, dls, dlb, dwqkv, dbqkv, dwout, dbout) = \
        _run_prefix_fused_bwd(x, pk, pv, ln_scale, ln_bias, w_qkv, b_qkv,
                              w_out, mask, g, n_heads, weight_grads,
                              rows_pref=rows_bwd)

    def like(grad, primal):
        return grad.astype(primal.dtype)

    return (like(dx, x), like(dpk, pk), like(dpv, pv),
            like(dls, ln_scale), like(dlb, ln_bias), like(dwqkv, w_qkv),
            like(dbqkv, b_qkv), like(dwout, w_out), like(dbout, b_out),
            None)


fused_prefix_attention_block.defvjp(_prefix_fwd, _prefix_bwd)


def _prefix_bwd_kernel(x_ref, pk_ref, pv_ref, ln_scale_ref, ln_bias_ref,
                       w_qkv_ref, b_qkv_ref, w_out_ref, mask_ref, g_ref,
                       dx_ref, dpk_ref, dpv_ref, dls_ref, dlb_ref,
                       dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
                       *, n_heads: int, weight_grads: bool = True,
                       eps: float = 1e-5):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    xr = x_ref[...]                                     # (R, Tp, D)
    rr, tp, d = xr.shape
    x = xr.reshape(rr * tp, d).astype(jnp.float32)
    g = g_ref[...].reshape(rr * tp, d).astype(jnp.float32)
    dh_dim = d // n_heads
    scale = dh_dim ** -0.5

    # ---- forward recompute (batched over R rows) ----
    gamma = ln_scale_ref[...].astype(jnp.float32)
    beta = ln_bias_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    h16 = (xhat * gamma + beta).astype(jnp.bfloat16)

    pk = pk_ref[...].astype(jnp.bfloat16)               # (R, Pp, D)
    pv = pv_ref[...].astype(jnp.bfloat16)
    h3 = h16.reshape(rr, tp, d)
    k_src = jnp.concatenate([pk, h3], axis=1)           # (R, Sp, D)
    v_src = jnp.concatenate([pv, h3], axis=1)
    pp = pk.shape[1]
    sp = k_src.shape[1]
    k_flat = k_src.reshape(rr * sp, d)
    v_flat = v_src.reshape(rr * sp, d)

    w_qkv = w_qkv_ref[...]
    b_qkv = b_qkv_ref[...].astype(jnp.float32)
    q16 = (jax.lax.dot_general(
        h16, w_qkv[:, :d], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_qkv[:d]).astype(
            jnp.bfloat16).reshape(rr, tp, d)
    k16 = (jax.lax.dot_general(
        k_flat, w_qkv[:, d:2 * d],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_qkv[d:2 * d]).astype(
            jnp.bfloat16).reshape(rr, sp, d)
    v16 = (jax.lax.dot_general(
        v_flat, w_qkv[:, 2 * d:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_qkv[2 * d:]).astype(
            jnp.bfloat16).reshape(rr, sp, d)

    pad_mask = mask_ref[...]

    def head_probs(head):
        lo = head * dh_dim
        s = jax.lax.dot_general(
            q16[:, :, lo:lo + dh_dim], k16[:, :, lo:lo + dh_dim],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale + pad_mask[None]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        return p / jnp.sum(p, axis=-1, keepdims=True)   # (R, Tp, Sp)

    # probabilities are reused by the attention backward — one score/
    # softmax per head
    probs = [head_probs(h) for h in range(n_heads)]
    ctxs = []
    for head in range(n_heads):
        lo = head * dh_dim
        ctxs.append(jax.lax.dot_general(
            probs[head].astype(jnp.bfloat16), v16[:, :, lo:lo + dh_dim],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))        # (R, Tp, dh)
    ctx16 = jnp.concatenate(ctxs, axis=-1).reshape(
        rr * tp, d).astype(jnp.bfloat16)

    # ---- backward ----
    g16 = g.astype(jnp.bfloat16)
    w_out = w_out_ref[...]
    if weight_grads:
        dwout_ref[...] += jax.lax.dot_general(
            ctx16, g16, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbout_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    dctx = jax.lax.dot_general(
        g16, w_out, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(rr, tp, d)

    dq_parts, dk_parts, dv_parts = [], [], []
    for head in range(n_heads):
        lo = head * dh_dim
        p = probs[head]
        dctx_h = dctx[:, :, lo:lo + dh_dim].astype(jnp.bfloat16)
        dv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), dctx_h,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (R, Sp, dh)
        dp = jax.lax.dot_general(
            dctx_h, v16[:, :, lo:lo + dh_dim],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (R, Tp, Sp)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds16 = ds.astype(jnp.bfloat16)
        dq_parts.append(jax.lax.dot_general(
            ds16, k16[:, :, lo:lo + dh_dim],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale)  # (R, Tp, dh)
        dk_parts.append(jax.lax.dot_general(
            ds16, q16[:, :, lo:lo + dh_dim],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale)  # (R, Sp, dh)
        dv_parts.append(dv)
    dq = jnp.concatenate(dq_parts, axis=-1).reshape(rr * tp, d)
    dk = jnp.concatenate(dk_parts, axis=-1).reshape(rr * sp, d)
    dv = jnp.concatenate(dv_parts, axis=-1).reshape(rr * sp, d)

    dq16 = dq.astype(jnp.bfloat16)
    dk16 = dk.astype(jnp.bfloat16)
    dv16 = dv.astype(jnp.bfloat16)
    if weight_grads:
        dwq = jax.lax.dot_general(
            h16, dq16, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwk = jax.lax.dot_general(
            k_flat, dk16, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwv = jax.lax.dot_general(
            v_flat, dv16, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwqkv_ref[...] += jnp.concatenate([dwq, dwk, dwv], axis=-1)
        dbqkv_ref[...] += jnp.concatenate(
            [jnp.sum(dq, axis=0, keepdims=True),
             jnp.sum(dk, axis=0, keepdims=True),
             jnp.sum(dv, axis=0, keepdims=True)], axis=-1)

    dk_src = jax.lax.dot_general(
        dk16, w_qkv[:, d:2 * d],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(rr, sp, d)
    dv_src = jax.lax.dot_general(
        dv16, w_qkv[:, 2 * d:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(rr, sp, d)
    dpk_ref[...] = dk_src[:, :pp].astype(dpk_ref.dtype)
    dpv_ref[...] = dv_src[:, :pp].astype(dpv_ref.dtype)

    dh = jax.lax.dot_general(
        dq16, w_qkv[:, :d], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = dh + (dk_src[:, pp:] + dv_src[:, pp:]).reshape(rr * tp, d)

    if weight_grads:
        dls_ref[...] += jnp.sum(dh * xhat, axis=0, keepdims=True)
        dlb_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dxhat = dh * gamma
    mean_dxhat = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean_dxhat_xhat = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - mean_dxhat - xhat * mean_dxhat_xhat)
    dx_ref[...] = (g + dx_ln).reshape(rr, tp, d).astype(dx_ref.dtype)


def _run_prefix_fused_bwd(x, pk, pv, ln_scale, ln_bias, w_qkv, b_qkv,
                          w_out, mask, g, n_heads: int,
                          weight_grads: bool = True, rows_pref=None):
    b, t, d = x.shape
    p_len = pk.shape[1]
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    tp = _round_up(t, sub)
    pp = _round_up(p_len, sub)
    sp = pp + tp
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, tp - t), (0, 0)))
    pkp = jnp.pad(pk, ((0, 0), (0, pp - p_len), (0, 0)))
    pvp = jnp.pad(pv, ((0, 0), (0, pp - p_len), (0, 0)))

    s_len = p_len + t
    base = jnp.zeros((t, s_len), jnp.float32) if mask is None else \
        jnp.broadcast_to(mask.astype(jnp.float32), (t, s_len))
    full = jnp.full((tp, sp), -jnp.inf, jnp.float32)
    full = jax.lax.dynamic_update_slice(full, base[:, :p_len], (0, 0))
    full = jax.lax.dynamic_update_slice(full, base[:, p_len:], (0, pp))
    full = full.at[t:, 0].set(0.0)

    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    rows = _pick_rows(b, rows_pref or _ROWS_BWD)
    row = lambda ln: pl.BlockSpec((rows, ln, d), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_prefix_bwd_kernel, n_heads=n_heads,
                          weight_grads=weight_grads),
        grid=(b // rows,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[row(tp), row(pp), row(pp), const(d), const(d),
                  const(d, 3 * d), const(3 * d), const(d, d),
                  const(tp, sp), row(tp)],
        out_specs=(row(tp), row(pp), row(pp), const(1, d), const(1, d),
                   const(d, 3 * d), const(1, 3 * d), const(d, d),
                   const(1, d)),
        out_shape=(jax.ShapeDtypeStruct((b, tp, d), x.dtype),
                   jax.ShapeDtypeStruct((b, pp, d), pk.dtype),
                   jax.ShapeDtypeStruct((b, pp, d), pv.dtype),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, 3 * d), f32),
                   jax.ShapeDtypeStruct((1, 3 * d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32)),
    )(xp, pkp.astype(x.dtype), pvp.astype(x.dtype), ln_scale, ln_bias,
      w_qkv.astype(jnp.bfloat16), b_qkv, w_out.astype(jnp.bfloat16),
      full, gp)
    dx, dpk, dpv, dls, dlb, dwqkv, dbqkv, dwout, dbout = outs
    return (dx[:, :t], dpk[:, :p_len], dpv[:, :p_len], dls[0], dlb[0],
            dwqkv, dbqkv[0], dwout, dbout[0])
