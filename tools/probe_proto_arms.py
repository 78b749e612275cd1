"""Minimal ProtoCLIP stage-1 full-step timer (one jit, one arm per process).

Times ONLY the full stage-1 train step (the bench_all adapter-clip-
proto_prompt step row, minus host remap) as a pipelined chain closed by
one fetch. Env arms: LLC_SUFFIX_REMAT (full/dots/none),
LLC_FUSED_ROWS_SUFFIX (1/2/4). Run ONE arm per fresh process and
serialize TPU jobs (CLAUDE.md). The r4 A/B recorded in BASELINE.md
("Measured machine rates" / stage-1 decomposition) used exactly this
probe: full/2 159.3 ms, none/2 156.2, full/4 162.6, rows=1 timeout.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BATCH = 64
ITERS = 10


def main():
    from lifelong_clip_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lifelong_clip_tpu.config import StreamConfig, TrainConfig
    from lifelong_clip_tpu.methods import get_method

    cfg = TrainConfig(
        method="adapter-clip-proto_prompt", dataset="synthetic-100",
        model_name="ViT-B/16", batchsize=BATCH, test_batchsize=BATCH,
        online_iter=1, lr=5e-4, memory_size=0, eval_period=10 ** 9,
        stream=StreamConfig(n_tasks=2, n=50, m=10, seed=1),
        transforms=("cutmix", "autoaug"), use_bf16=True,
        log_path="/tmp/bench_results", seed=1)
    tr = get_method("adapter-clip-proto_prompt")(cfg,
                                                 synthetic_fallback=True)
    tr.online_before_task(0)
    idx = np.asarray(tr.stream.task_indices[0][:BATCH])
    images, labels = tr.train_dataset.gather(idx)
    tr.vocab.expose(labels)
    tokens, mask, y, _ = tr.vocab.batch_table(labels, tr.step_capacity)
    jb = {"images": jnp.asarray(images), "tokens": jnp.asarray(tokens),
          "mask": jnp.asarray(mask), "labels": jnp.asarray(y, jnp.int32)}

    state = tr.state
    state, stats = tr._stage1_step(state, jb, 0)
    float(np.asarray(stats["loss"]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, stats = tr._stage1_step(state, jb, 0)
    loss = float(np.asarray(stats["loss"]))
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(json.dumps({
        "arm": {"remat": os.environ.get("LLC_SUFFIX_REMAT", "full"),
                "rows": os.environ.get("LLC_FUSED_ROWS_SUFFIX", "2")},
        "stage1_step_ms": round(ms, 2),
        "loss_finite": bool(np.isfinite(loss))}), flush=True)


if __name__ == "__main__":
    main()
