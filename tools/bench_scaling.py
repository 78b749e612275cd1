"""Batch-size scaling of the headline online step (TPU).

Same program as bench.py at bs in {64, 128, 256}: shows how far the
per-chip step is from its large-batch throughput ceiling (online CL fixes
bs=64 by protocol; the ceiling contextualizes the per-step efficiency).
One JSON line per batch size.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def bench(batch_size: int):
    import jax
    import jax.numpy as jnp

    from lifelong_clip_tpu.config import CLIPConfig, PEFTConfig
    from lifelong_clip_tpu.methods.engine import TrainState, make_train_step
    from lifelong_clip_tpu.models import build_peft, clip as clip_fns
    from lifelong_clip_tpu.models.init import init_clip_params
    from lifelong_clip_tpu.utils.train_utils import make_optimizer

    n_cls = 64
    cfg = CLIPConfig()
    peft_cfg = PEFTConfig(method="lora", encoder="image", lora_r=4)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    peft = build_peft(jax.random.PRNGKey(1), cfg, peft_cfg)
    tx = make_optimizer("adamw", 5e-4)
    state = TrainState.create(trainable=peft, frozen=params, tx=tx,
                              rng=jax.random.PRNGKey(2))
    # remat policy A/B (VERDICT r4 item 6): LLC_REMAT_POLICY=mlp tries the
    # selective save-all-but-MLP-hidden checkpoint at every bs; full =
    # whole-scan remat; default keeps the measured r3 choices (bs>=256
    # full remat — cannot compile otherwise; bs=128 spills)
    pol = os.environ.get("LLC_REMAT_POLICY", "")
    remat = {"mlp": "mlp", "full": True}.get(pol, batch_size >= 256)
    step = make_train_step(cfg, peft_cfg, tx, image_size=cfg.image_size,
                           mean=(0.48145466, 0.4578275, 0.40821073),
                           std=(0.26862954, 0.26130258, 0.27577711),
                           use_autoaug=True, autoaug_policy="cifar10",
                           cached_text=True, compute_dtype=jnp.bfloat16,
                           remat=remat)
    rng = np.random.default_rng(0)
    tokens = np.zeros((n_cls, cfg.context_length), np.int32)
    tokens[:, 0] = 49406
    tokens[:, 1:8] = rng.integers(1000, 40000, (n_cls, 7))
    tokens[:, 8] = 49407
    txt = jax.jit(lambda p, t: clip_fns.normalize(clip_fns.encode_text(
        p, t, cfg)))(params, jnp.asarray(tokens))
    batch = {
        "images": jnp.asarray(rng.integers(
            0, 255, (batch_size, 32, 32, 3), np.uint8)),
        "labels": jnp.asarray(rng.integers(0, n_cls, (batch_size,)),
                              jnp.int32),
        "tokens": txt,
        "mask": jnp.zeros((n_cls,), jnp.float32),
    }
    state, m = step(state, batch)
    float(m["loss"])
    state, m = step(state, batch)
    float(m["loss"])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    float(m["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "batch_size": batch_size,
        "remat": str(remat),
        "step_ms": round(dt / iters * 1e3, 2),
        "samples_per_sec": round(batch_size * iters / dt, 1),
    }), flush=True)


def main():
    from lifelong_clip_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    for bs in (int(a) for a in (sys.argv[1:] or ["64", "128", "256"])):
        bench(bs)


if __name__ == "__main__":
    main()
