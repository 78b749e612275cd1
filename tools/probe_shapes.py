"""Sustained bf16 matmul rate at the headline step's own shapes (TPU).

The 4096^3 probe (bench.py) bounds the chip; this bounds the STEP: each
probe is a dependent chain over the step's real matmul shapes (ViT-B/16,
bs=64, T=208 padded), timed with one closing host fetch. The
FLOP-weighted mix of these rates is the honest "achievable" the fused
step should be judged against (VERDICT r2 weak #1 used mixed
conventions; all FLOPs here are 2*M*N*K).

Shapes (M = B*Tp = 13312):
  qkv+back   (M,768)@(768,2304) then (M,2304)@(2304,768)
  mlp pair   (M,768)@(768,3072) then (M,3072)@(3072,768)
  attn       768 batched (208,64)@(64,208) + (208,208)@(208,64)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

B, TP, D, H = 64, 208, 768, 12
M = B * TP
ITERS = 60


def main():
    from lifelong_clip_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def mk(*shape, scale):
        return jnp.asarray(rng.normal(size=shape) * scale, jnp.bfloat16)

    def chain(x0, body, flops_per_iter, name):
        @jax.jit
        def run(x):
            out, _ = jax.lax.scan(lambda c, _: (body(c), None), x, None,
                                  length=ITERS)
            return out

        y = run(x0)
        jax.block_until_ready(y)
        y = run(x0)
        float(jnp.sum(y.astype(jnp.float32)))
        t0 = time.perf_counter()
        y = run(x0)
        float(jnp.sum(y.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        tf = ITERS * flops_per_iter / dt / 1e12
        print(json.dumps({"probe": name, "tflops": round(tf, 1),
                          "ms_per_iter": round(dt / ITERS * 1e3, 3)}),
              flush=True)
        return tf

    x = mk(M, D, scale=1.0)

    w_up_q = mk(D, 3 * D, scale=D ** -0.5)
    w_dn_q = mk(3 * D, D, scale=(3 * D) ** -0.5)
    f_qkv = 2 * M * D * 3 * D + 2 * M * 3 * D * D
    t_qkv = chain(x, lambda c: jnp.dot(
        jnp.dot(c, w_up_q, preferred_element_type=jnp.bfloat16), w_dn_q,
        preferred_element_type=jnp.bfloat16), f_qkv, "qkv_pair_768x2304")

    w_up_m = mk(D, 4 * D, scale=D ** -0.5)
    w_dn_m = mk(4 * D, D, scale=(4 * D) ** -0.5)
    f_mlp = 2 * M * D * 4 * D + 2 * M * 4 * D * D
    t_mlp = chain(x, lambda c: jnp.dot(
        jnp.dot(c, w_up_m, preferred_element_type=jnp.bfloat16), w_dn_m,
        preferred_element_type=jnp.bfloat16), f_mlp, "mlp_pair_768x3072")

    w_sq = mk(D, D, scale=D ** -0.5)
    f_sq = 2 * 2 * M * D * D
    t_sq = chain(x, lambda c: jnp.dot(
        jnp.dot(c, w_sq, preferred_element_type=jnp.bfloat16), w_sq,
        preferred_element_type=jnp.bfloat16), f_sq, "proj_pair_768x768")

    # attention-shaped batched dots: scores then ctx, B*H batches
    dh = D // H
    q0 = mk(B * H, TP, dh, scale=dh ** -0.25)

    def attn_body(q):
        s = jax.lax.dot_general(
            q, q, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16)        # (BH, TP, TP)
        return jax.lax.dot_general(
            s, q, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16) * jnp.bfloat16(
                TP ** -0.5)
    f_attn = B * H * (2 * TP * dh * TP + 2 * TP * TP * dh)
    t_attn = chain(q0, attn_body, f_attn, "attn_batched_208x64")

    # FLOP-weighted achievable for the fwd+bwd step: weights = each
    # family's share of step matmul FLOPs (fwd+bwd+recompute, frozen base)
    w = {"qkv": 3 * (6 * D * D), "out": 3 * (2 * D * D),
         "mlp": 2 * (16 * D * D), "attn": 3 * (4 * TP * D)}
    tot = sum(w.values())
    ach = tot / (w["qkv"] / t_qkv + w["out"] / t_sq + w["mlp"] / t_mlp
                 + w["attn"] / t_attn)
    print(json.dumps({"probe": "flop_weighted_achievable",
                      "tflops": round(ach, 1),
                      "weights_pct": {k: round(100 * v / tot, 1)
                                      for k, v in w.items()}}), flush=True)


if __name__ == "__main__":
    main()
