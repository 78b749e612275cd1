"""Ablation profile of the headline online train step (TPU).

Times variants of the bs=64 LoRA ViT-B/16 step to localize cost:
full step, no-augmentation, forward-only, XLA-attention (vs fused
Pallas), and an L-vs-2L depth slope for the per-layer block cost
(the slope cancels fixed dispatch/epilogue overhead — CLAUDE.md
benchmarking notes). One JSON line per variant.

Timing discipline (tunneled TPU): pipeline a dependent chain of steps,
close with ONE host value fetch.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _timed(fn, state, batch, iters=20):
    s, m = fn(state, batch)
    float(m["loss"])
    s, m = fn(s, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        s, m = fn(s, batch)
    float(m["loss"])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from lifelong_clip_tpu.config import CLIPConfig, PEFTConfig
    from lifelong_clip_tpu.methods.engine import TrainState, make_train_step
    from lifelong_clip_tpu.models import build_peft, clip as clip_fns
    from lifelong_clip_tpu.models.init import init_clip_params
    from lifelong_clip_tpu.utils.train_utils import make_optimizer

    bs, n_cls = 64, 64
    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)
    peft_cfg = PEFTConfig(method="lora", encoder="image", lora_r=4)
    tx = make_optimizer("adamw", 5e-4)
    rng = np.random.default_rng(0)

    def build(cfg):
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        peft = build_peft(jax.random.PRNGKey(1), cfg, peft_cfg)
        state = TrainState.create(trainable=peft, frozen=params, tx=tx,
                                  rng=jax.random.PRNGKey(2))
        tokens = np.zeros((n_cls, cfg.context_length), np.int32)
        tokens[:, 0] = 49406
        tokens[:, 1:8] = rng.integers(1000, 40000, (n_cls, 7))
        tokens[:, 8] = 49407
        txt = jax.jit(lambda p, t: clip_fns.normalize(clip_fns.encode_text(
            p, t, cfg)))(params, jnp.asarray(tokens))
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 255, (bs, 32, 32, 3), np.uint8)),
            "labels": jnp.asarray(rng.integers(0, n_cls, (bs,)), jnp.int32),
            "tokens": txt,
            "mask": jnp.zeros((n_cls,), jnp.float32),
        }
        return state, batch

    def mk(cfg, **kw):
        base = dict(image_size=cfg.image_size, mean=mean, std=std,
                    use_autoaug=True, autoaug_policy="cifar10",
                    cached_text=True, compute_dtype=jnp.bfloat16,
                    donate=False)
        base.update(kw)
        return make_train_step(cfg, peft_cfg, tx, **base)

    cfg = CLIPConfig()  # ViT-B/16, 12 layers
    state, batch = build(cfg)
    out = {}

    def emit(k, v):
        out[k] = v
        print(json.dumps({"variant": k, "ms": round(v, 2)}), flush=True)

    emit("full", _timed(mk(cfg), state, batch))
    emit("xla_attn", _timed(mk(cfg, attn_impl="xla"), state, batch))

    # forward-only (loss value, no grad/update): wrap engine fwd directly
    import functools
    from lifelong_clip_tpu.methods import engine
    from lifelong_clip_tpu.ops import preprocess
    pipeline = preprocess.make_train_pipeline(
        cfg.image_size, mean, std, use_autoaug=True,
        autoaug_policy="cifar10", out_dtype=jnp.bfloat16)
    fwd = functools.partial(engine.peft_forward_cached_text,
                            clip_cfg=cfg, peft_cfg=peft_cfg,
                            compute_dtype=jnp.bfloat16, attn_impl=None)

    @jax.jit
    def fwd_only(state, batch):
        rng_, aug_rng, _ = jax.random.split(state.rng, 3)
        images = pipeline(aug_rng, batch["images"])
        logits, _, _ = fwd(state.frozen, state.trainable, images,
                           batch["tokens"])
        import optax
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits + batch["mask"][None, :], batch["labels"]).mean()
        return state.replace(rng=rng_), {"loss": loss}

    emit("fwd_only", _timed(fwd_only, state, batch))

    # augmentation pipeline alone (uint8 CIFAR -> bf16 224 normalized)
    @jax.jit
    def aug_only(state, batch):
        rng_, aug_rng, _ = jax.random.split(state.rng, 3)
        images = pipeline(aug_rng, batch["images"])
        return state.replace(rng=rng_), {
            "loss": jnp.mean(images.astype(jnp.float32))}

    emit("aug_only", _timed(aug_only, state, batch))

    # depth slope: 12 vs 24 layers -> per-layer fwd+bwd block cost
    cfg24 = CLIPConfig(vision_layers=24)
    state24, batch24 = build(cfg24)
    emit("depth24", _timed(mk(cfg24), state24, batch24))
    per_layer = (out["depth24"] - out["full"]) / 12.0

    print(json.dumps({
        "bwd_ms": round(out["full"] - out["fwd_only"], 2),
        "pallas_vs_xla_ms": round(out["xla_attn"] - out["full"], 2),
        "per_layer_ms": round(per_layer, 3),
        "blocks12_ms": round(per_layer * 12, 2),
        "epilogue_ms": round(out["full"] - per_layer * 12, 2),
    }))


if __name__ == "__main__":
    main()
