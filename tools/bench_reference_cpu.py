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

Why no full lora-clip image train step on the reference side: the
snapshot's ``VisualTransformer.forward`` passes ``prompt=`` to every block
(model.py:780) but only the prefix block class accepts it, so the image
tower CRASHES for vanilla/lora/adapter design_details (verified; matches
the crash in the reference's own nohup.out). The runnable same-config
probes are therefore (a) the image forward through prefix blocks
(numerically vanilla attention) and (b) the text-side LoRA TRAIN CORE —
per-class text encoding + CE + backward + AdamW — the reference's only
working LoRA path.

Writes the measured ratios to ``tools/cpu_baseline.json``; ``bench.py``
reads the train-core ratio as its ``vs_baseline``. This compares oneDNN
vs XLA *CPU* kernels — the only hardware both stacks run on — not the
TPU target (where the reference cannot run); measured numbers are
recorded in BASELINE.md.
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

    # ---- text LoRA TRAIN CORE: per-class text encode + CE + bwd + AdamW ----
    # the reference's online_train re-encodes the exposed class names every
    # step with text-side LoRA and steps the optimizer
    # (methods/adapter_clip.py:84-96); image features enter the loss as
    # data here (the reference image tower cannot train — see module doc)
    n_cls = 64
    ref2 = load_ref_clip({"method": "lora", "peft_encoder": "text",
                          "lora_r": 4, "lora_alpha": 1}).train()
    rng = np.random.default_rng(1)
    toks = np.zeros((n_cls, 77), np.int64)
    toks[:, 0] = 49406
    toks[:, 1:8] = rng.integers(1000, 40000, (n_cls, 7))
    toks[:, 8] = 49407
    img_feats = rng.normal(size=(batch, 512)).astype(np.float32)
    img_feats /= np.linalg.norm(img_feats, axis=-1, keepdims=True)
    labels = rng.integers(0, n_cls, (batch,))

    ttoks = torch.from_numpy(toks)
    timg = torch.from_numpy(img_feats)
    tlab = torch.from_numpy(labels)
    lora_params = [p for n, p in ref2.named_parameters() if "lora" in n]
    for p in ref2.parameters():
        p.requires_grad_(False)
    for p in lora_params:
        p.requires_grad_(True)
    opt = torch.optim.AdamW(lora_params, lr=5e-4)

    def ref_step():
        txt = ref2.encode_text(ttoks)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        logits = ref2.logit_scale.exp() * timg @ txt.t()
        loss = torch.nn.functional.cross_entropy(logits, tlab)
        opt.zero_grad()
        loss.backward()
        opt.step()

    ref_step()
    t0 = time.perf_counter()
    for _ in range(iters):
        ref_step()
    t_ref_train = (time.perf_counter() - t0) / iters

    sd2 = {k: v.float().detach().numpy()
           for k, v in ref2.state_dict().items()}
    params2, _ = state_dict_to_params(sd2, CLIPConfig())
    peft_cfg = PEFTConfig(method="lora", encoder="text", lora_r=4)
    peft = build_peft(jax.random.PRNGKey(0), cfg, peft_cfg)
    import optax
    tx = optax.adamw(5e-4)
    opt_state = tx.init(peft["text"])
    jtoks = jnp.asarray(toks.astype(np.int32))
    jimg = jnp.asarray(img_feats)
    jlab = jnp.asarray(labels, jnp.int32)

    @jax.jit
    def our_step(pt, opt_state, params):
        def loss_fn(pt):
            txt = clip_fns.encode_text(
                params, jtoks, cfg, peft_cfg=peft_cfg, peft=pt,
                compute_dtype=jnp.float32)
            txt = clip_fns.normalize(txt)
            logits = jnp.exp(params["logit_scale"]) * jimg @ txt.T
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, jlab).mean()
        loss, grads = jax.value_and_grad(loss_fn)(pt)
        updates, opt_state = tx.update(grads, opt_state, pt)
        return optax.apply_updates(pt, updates), opt_state, loss

    pt = peft["text"]
    pt, opt_state, loss = our_step(pt, opt_state, params2)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        pt, opt_state, loss = our_step(pt, opt_state, params2)
    float(loss)
    t_ours_train = (time.perf_counter() - t0) / iters
    print(f"train core (text encode + CE + bwd + adamw, bs={batch}, "
          f"{n_cls} classes): reference {t_ref_train*1e3:.0f} ms | ours "
          f"{t_ours_train*1e3:.0f} ms | speedup "
          f"{t_ref_train/t_ours_train:.2f}x")

    # persist the measured same-hardware ratios for bench.py's vs_baseline
    import json
    out = {
        "config": {"model": "ViT-B/16", "dtype": "fp32", "batch": batch,
                   "n_classes": n_cls, "iters": iters},
        "image_fwd_torch_ms": round(t_ref * 1e3, 1),
        "image_fwd_xla_ms": round(t_ours * 1e3, 1),
        "image_fwd_speedup_vs_torch": round(t_ref / t_ours, 4),
        "train_core_torch_ms": round(t_ref_train * 1e3, 1),
        "train_core_xla_ms": round(t_ours_train * 1e3, 1),
        "train_core_speedup_vs_torch": round(
            t_ref_train / t_ours_train, 4),
        "note": "same-hardware CPU measurement (oneDNN vs XLA-CPU); the "
                "reference image tower cannot train as shipped — see "
                "module docstring",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cpu_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
