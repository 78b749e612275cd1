"""Error bar for bench.py's headline MFU (VERDICT r3 stretch item 9).

bench.py's ``mfu_vs_measured_matmul`` oscillated 0.58-0.64 across r3
re-measures. This probe separates the two noise sources by repeating,
in ONE process, (a) the sustained 4096^3 bf16 matmul chain and (b) the
headline lora-clip train-step chain, N times each — same methodology as
bench.py (dependent chain closed by a single host fetch, CLAUDE.md
tunnel-timing rules). Prints every repeat plus mean/std/CV so the
headline MFU claim carries an honest error bar.

NOTE: the matmul chain, step setup, and analytic FLOP model below
deliberately MIRROR bench.py's (importing bench.py would run its
module-level cache/probe setup in-process and perturb the timing being
measured). If bench.py's FLOP model or headline config changes, update
this probe in the same commit — the error bar is only meaningful for
the quantity bench.py reports.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPEATS = 5
ITERS = 20


def _chain_time(fn, close):
    t0 = time.perf_counter()
    close(fn())
    return time.perf_counter() - t0


def main():
    from lifelong_clip_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lifelong_clip_tpu.config import CLIPConfig, PEFTConfig
    from lifelong_clip_tpu.methods.engine import TrainState, make_train_step
    from lifelong_clip_tpu.models import build_peft
    from lifelong_clip_tpu.models.init import init_clip_params
    from lifelong_clip_tpu.utils.train_utils import make_optimizer

    # --- matmul chain (identical to bench.py's probe) -------------------
    m4k = jnp.asarray(
        np.random.default_rng(1).normal(size=(4096, 4096)) * 4096 ** -0.5,
        jnp.bfloat16)

    @jax.jit
    def matmul_chain(a):
        def body(c, _):
            return jnp.dot(c, m4k,
                           preferred_element_type=jnp.bfloat16), None
        out, _ = jax.lax.scan(body, a, None, length=256)
        return out

    close = lambda mm: float(jnp.sum(mm.astype(jnp.float32)))
    close(matmul_chain(m4k))  # compile+exec
    mm_tflops = []
    for _ in range(REPEATS):
        dt = _chain_time(lambda: matmul_chain(m4k), close)
        mm_tflops.append(256 * 2 * 4096 ** 3 / dt / 1e12)

    # --- headline step chain (identical to bench.py's setup) ------------
    batch_size, n_cls = 64, 64
    cfg = CLIPConfig()
    peft_cfg = PEFTConfig(method="lora", encoder="image", lora_r=4)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    peft = build_peft(jax.random.PRNGKey(1), cfg, peft_cfg)
    tx = make_optimizer("adamw", 5e-4)
    state = TrainState.create(trainable=peft, frozen=params, tx=tx,
                              rng=jax.random.PRNGKey(2))
    step = make_train_step(cfg, peft_cfg, tx, image_size=cfg.image_size,
                           mean=(0.48145466, 0.4578275, 0.40821073),
                           std=(0.26862954, 0.26130258, 0.27577711),
                           use_autoaug=True, autoaug_policy="cifar10",
                           cached_text=True, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    tokens = np.zeros((n_cls, cfg.context_length), np.int32)
    tokens[:, 0] = 49406
    tokens[:, 1:8] = rng.integers(1000, 40000, (n_cls, 7))
    tokens[:, 8] = 49407
    from lifelong_clip_tpu.models import clip as clip_fns
    txt = jax.jit(lambda p, t: clip_fns.normalize(clip_fns.encode_text(
        p, t, cfg)))(params, jnp.asarray(tokens))
    batch = {
        "images": jnp.asarray(rng.integers(0, 255,
                                           (batch_size, 32, 32, 3),
                                           np.uint8)),
        "labels": jnp.asarray(rng.integers(0, n_cls, (batch_size,)),
                              jnp.int32),
        "tokens": txt,
        "mask": jnp.zeros((n_cls,), jnp.float32),
    }
    state, metrics = step(state, batch)
    float(metrics["loss"])

    step_ms = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = step(state, batch)
        float(metrics["loss"])
        step_ms.append((time.perf_counter() - t0) / ITERS * 1e3)

    # bench.py's analytic step-FLOP model
    d_, t_, l_ = cfg.vision_width, \
        (cfg.image_size // cfg.patch_size) ** 2 + 1, cfg.vision_layers
    per_tok_layer_fwd = 24 * d_ * d_ + 4 * t_ * d_
    per_tok_layer = 2 * per_tok_layer_fwd + (8 * d_ * d_ + 4 * t_ * d_)
    step_flops = batch_size * t_ * l_ * per_tok_layer
    mfu = [(step_flops / (ms / 1e3)) / (tf * 1e12)
           for ms, tf in zip(step_ms, mm_tflops)]

    def stats(xs):
        return {"values": [round(x, 2) for x in xs],
                "mean": round(float(np.mean(xs)), 2),
                "std": round(float(np.std(xs)), 2),
                "cv_pct": round(float(np.std(xs) / np.mean(xs) * 100), 1)}

    print(json.dumps({
        "matmul_tflops": stats(mm_tflops),
        "step_ms": stats(step_ms),
        "mfu_vs_measured_matmul": {
            "values": [round(x, 3) for x in mfu],
            "mean": round(float(np.mean(mfu)), 3),
            "std": round(float(np.std(mfu)), 3)},
    }, indent=1))


if __name__ == "__main__":
    main()
