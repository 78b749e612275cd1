"""Per-method step benchmark: one measured row per flagship method.

Times the REAL trainer ``online_step`` (host label remap + fused pipeline
+ jitted train step) at the headline batch size on synthetic data with
full-size towers — the per-method complement to bench.py's lora-clip
headline. Prints one JSON line per method.

Timing methodology (see CLAUDE.md): the tunneled TPU's block_until_ready
can return early and host fetches cost ~25 ms, so each measurement times a
pipelined chain of dependent steps closed by ONE loss fetch.

Usage: python bench_all.py [method ...]   (default: the flagship set)
       method may carry a model preset: lora-clip@ViT-L/14
"""

import json
import sys
import time

import numpy as np

FLAGSHIPS = ["lora-clip", "mvp-clip", "maple", "adapter-clip-proto_prompt",
             "moe-clip"]

BATCH = 64
ITERS = 10


def bench_method(method: str):
    from lifelong_clip_tpu.config import StreamConfig, TrainConfig
    from lifelong_clip_tpu.methods import get_method

    method, _, model = method.partition("@")
    model = model or "ViT-B/16"
    cfg = TrainConfig(
        method=method, dataset="synthetic-100", model_name=model,
        batchsize=BATCH, test_batchsize=BATCH, online_iter=1,
        lr=5e-4, memory_size=0, eval_period=10 ** 9,
        stream=StreamConfig(n_tasks=2, n=50, m=10, seed=1),
        transforms=("cutmix", "autoaug"), use_bf16=True,
        log_path="/tmp/bench_results", seed=1)
    tr = get_method(method)(cfg, synthetic_fallback=True)
    if hasattr(tr, "online_before_task"):
        tr.online_before_task(0)

    idx = np.asarray(tr.stream.task_indices[0][:BATCH])
    images, labels = tr.train_dataset.gather(idx)
    tr.vocab.expose(labels)

    # compile + settle
    stats = tr.online_step(images, labels, idx)
    float(np.asarray(stats["loss"]))
    stats = tr.online_step(images, labels, idx)
    float(np.asarray(stats["loss"]))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        stats = tr.online_step(images, labels, idx)
    loss = float(np.asarray(stats["loss"]))
    dt = time.perf_counter() - t0

    step_ms = dt / ITERS * 1e3
    print(json.dumps({
        "metric": f"{method}_step_ms" if model == "ViT-B/16"
        else f"{method}@{model}_step_ms",
        "value": round(step_ms, 2),
        "unit": f"ms/step (bs={BATCH}, {model}, full online_step incl. "
                "host remap + fused augmentation)",
        "samples_per_sec": round(BATCH * ITERS / dt, 1),
        "loss_finite": bool(np.isfinite(loss)),
    }), flush=True)


def main(methods):
    from lifelong_clip_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    for m in methods or FLAGSHIPS:
        try:
            bench_method(m)
        except Exception as e:  # keep measuring the rest
            print(json.dumps({"metric": f"{m}_step_ms", "value": None,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
