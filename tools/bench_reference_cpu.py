#!/usr/bin/env python
"""Same-hardware (CPU) comparison: reference torch CLIP vs this framework.

The reference is CUDA-only in spirit but runs on CPU torch; this gives a
measured structural comparison on identical hardware (no GPU exists in
this environment, and the TPU obviously can't run torch). Two probes at
ViT-B/16 scale, fp32, identical shapes:

  * image-encoder forward (bs configurable) — the eval hot path
  * text-tower LoRA forward+backward — a train-step core both sides can
    run (the reference's image tower crashes for LoRA as shipped; see
    tests/test_reference_parity.py)

Usage: PYTHONPATH=. python tools/bench_reference_cpu.py [batch=8] [iters=3]

Measured result (this container, bs=8 fp32): torch is ~1.35x faster than
XLA-CPU on both probes — a statement about oneDNN vs XLA *CPU* kernels,
not about the TPU target (where the reference cannot run). Recorded for
transparency; the TPU numbers live in BASELINE.md / bench.py.
"""

import os
import sys
import time

import numpy as np

REFERENCE = "/root/reference"


def load_ref_clip(design_details):
    import types
    import importlib.util
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    if "refclip.model" not in sys.modules:
        pkg = types.ModuleType("refclip")
        pkg.__path__ = [os.path.join(REFERENCE, "models", "clip")]
        sys.modules["refclip"] = pkg
        spec = importlib.util.spec_from_file_location(
            "refclip.model",
            os.path.join(REFERENCE, "models", "clip", "model.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refclip.model"] = mod
        spec.loader.exec_module(mod)
    mod = sys.modules["refclip.model"]
    torch.manual_seed(0)
    return mod.CLIP(512, 224, 12, 768, 16, 77, 49408, 512, 8, 12,
                    design_details=design_details).float().eval()


def main(batch=8, iters=3):
    import torch

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from lifelong_clip_tpu.config import CLIPConfig, PEFTConfig
    from lifelong_clip_tpu.models import build_peft
    from lifelong_clip_tpu.models import clip as clip_fns
    from lifelong_clip_tpu.models.convert import state_dict_to_params

    print(f"CPU comparison @ ViT-B/16, fp32, bs={batch}, {iters} iters")

    # ---- image forward ----------------------------------------------------
    ref = load_ref_clip({"method": "prefix_prompt", "peft_encoder": "image"})
    sd = {k: v.float().numpy() for k, v in ref.state_dict().items()}
    params, cfg = state_dict_to_params(sd, CLIPConfig())
    imgs = np.random.default_rng(0).normal(
        size=(batch, 224, 224, 3)).astype(np.float32)
    timgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2))

    with torch.no_grad():
        ref.encode_image(timgs)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            ref.encode_image(timgs)
        t_ref = (time.perf_counter() - t0) / iters

    fwd = jax.jit(lambda p, x: clip_fns.encode_image(
        p, x, cfg, compute_dtype=jnp.float32))
    jimgs = jnp.asarray(imgs)
    fwd(params, jimgs).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        fwd(params, jimgs).block_until_ready()
    t_ours = (time.perf_counter() - t0) / iters
    print(f"image fwd:  reference {t_ref*1e3:.0f} ms | ours "
          f"{t_ours*1e3:.0f} ms | speedup {t_ref/t_ours:.2f}x")

    # ---- text LoRA forward+backward ----------------------------------------
    ref2 = load_ref_clip({"method": "lora", "peft_encoder": "text",
                          "lora_r": 4, "lora_alpha": 1}).train()
    toks = np.zeros((batch, 77), np.int64)
    toks[:, 0] = 49406
    toks[:, 1:8] = np.random.default_rng(1).integers(
        1000, 40000, (batch, 7))
    toks[:, 8] = 49407
    ttoks = torch.from_numpy(toks)
    lora_params = [p for n, p in ref2.named_parameters() if "lora" in n]
    for p in ref2.parameters():
        p.requires_grad_(False)
    for p in lora_params:
        p.requires_grad_(True)

    def ref_step():
        out = ref2.encode_text(ttoks)
        loss = (out ** 2).sum()
        loss.backward()
        for p in lora_params:
            p.grad = None

    ref_step()
    t0 = time.perf_counter()
    for _ in range(iters):
        ref_step()
    t_ref = (time.perf_counter() - t0) / iters

    sd2 = {k: v.float().detach().numpy()
           for k, v in ref2.state_dict().items()}
    params2, _ = state_dict_to_params(sd2, CLIPConfig())
    peft_cfg = PEFTConfig(method="lora", encoder="text", lora_r=4)
    peft = build_peft(jax.random.PRNGKey(0), cfg, peft_cfg)

    @jax.jit
    def our_step(pt, params):
        def loss(pt):
            out = clip_fns.encode_text(
                params, jnp.asarray(toks.astype(np.int32)), cfg,
                peft_cfg=peft_cfg, peft=pt, compute_dtype=jnp.float32)
            return jnp.sum(out ** 2)
        return jax.grad(loss)(pt)

    g = our_step(peft["text"], params2)
    jax.tree.map(lambda a: a.block_until_ready(), g)
    t0 = time.perf_counter()
    for _ in range(iters):
        g = our_step(peft["text"], params2)
    jax.tree.map(lambda a: a.block_until_ready(), g)
    t_ours = (time.perf_counter() - t0) / iters
    print(f"text LoRA fwd+bwd: reference {t_ref*1e3:.0f} ms | ours "
          f"{t_ours*1e3:.0f} ms | speedup {t_ref/t_ours:.2f}x")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
