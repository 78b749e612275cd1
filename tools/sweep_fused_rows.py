"""Sweep rows-per-program for the fused block kernels (TPU).

Times the ViT-B/16 vision tower forward and fwd+bwd (LoRA grads,
frozen base) at bs=64 across LLC_FUSED_ROWS_{FWD,BWD} values, in ONE
process (the module globals are set between builds; every variant gets a
fresh jit). Dependent-chain timing closed by a single value fetch per
CLAUDE.md discipline.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from lifelong_clip_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lifelong_clip_tpu.config import CLIPConfig, PEFTConfig
    from lifelong_clip_tpu.models import build_peft, clip as clip_fns
    from lifelong_clip_tpu.models.init import init_clip_params
    from lifelong_clip_tpu.ops import fused_block_attn as fba

    bs = 64
    cfg = CLIPConfig()
    peft_cfg = PEFTConfig(method="lora", encoder="image", lora_r=4)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    peft = build_peft(jax.random.PRNGKey(1), cfg, peft_cfg)["vision"]
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(bs, 224, 224, 3)),
        jnp.bfloat16)

    # params/peft as ARGUMENTS: capturing them bakes ~600 MB of constants
    # into the HLO the tunnel uploads (remote compile rejects with 413)
    def time_chain(fn, x0, iters=20):
        y = fn(params, peft, x0)
        jax.block_until_ready(y)
        y = fn(params, peft, x0)
        float(jnp.sum(y[0]) if isinstance(y, tuple) else jnp.sum(y))
        t0 = time.perf_counter()
        carry = x0
        out = None
        for _ in range(iters):
            out = fn(params, peft, carry)
            s = out[0] if isinstance(out, tuple) else out
            # dependent chain: next input nudged by prev output
            carry = x0 * (1.0 + 1e-6 * jnp.sum(s).astype(jnp.bfloat16))
        s = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(s))
        return (time.perf_counter() - t0) / iters * 1e3

    def fwd_fn():
        @jax.jit
        def f(pr, pf, x):
            return clip_fns.encode_image(
                pr, x, cfg, peft_cfg=peft_cfg, peft=pf,
                compute_dtype=jnp.bfloat16, base_grads=False)
        return f

    def fwdbwd_fn():
        @jax.jit
        def f(pr, pf, x):
            def loss(p):
                e = clip_fns.encode_image(
                    pr, x, cfg, peft_cfg=peft_cfg, peft=p,
                    compute_dtype=jnp.bfloat16, base_grads=False)
                return jnp.sum(e.astype(jnp.float32))
            l, g = jax.value_and_grad(loss)(pf)
            return l, g["lora"]["a_in"]
        return f

    results = {}
    for r in (1, 2, 4, 8, 16):
        fba._ROWS_FWD = r
        ms = time_chain(fwd_fn(), imgs)
        results[f"fwd_rows_{r}"] = round(ms, 2)
        print(json.dumps({"probe": f"fwd rows={r}", "ms": round(ms, 2)}),
              flush=True)
    best_fwd = min((1, 2, 4, 8, 16),
                   key=lambda r: results[f"fwd_rows_{r}"])
    fba._ROWS_FWD = best_fwd
    for r in (1, 2, 4, 8):
        fba._ROWS_BWD = r
        ms = time_chain(fwdbwd_fn(), imgs)
        results[f"fwdbwd_rows_{r}"] = round(ms, 2)
        print(json.dumps({"probe": f"fwd+bwd bwd_rows={r} "
                                   f"(fwd_rows={best_fwd})",
                          "ms": round(ms, 2)}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
