"""Per-method step + eval benchmark: one measured row per registered method.

Times the REAL trainer ``online_step`` (host label remap + fused pipeline
+ jitted train step) at the headline batch size on synthetic data with
full-size towers — the per-method complement to bench.py's lora-clip
headline — plus the REAL ``evaluate()`` sweep and Rainbow Memory's
12-view MC uncertainty pass. Prints one JSON line per row.

Timing methodology (see CLAUDE.md): the tunneled TPU's block_until_ready
can return early and host fetches cost ~25 ms, so each train measurement
times a pipelined chain of dependent steps closed by ONE loss fetch. The
eval row runs the same grouped-fetch loop ``evaluate()`` runs in
production (predictions stacked and fetched 8 batches per tunnel round
trip, one-group lookahead) — that IS the eval path users run.

Usage: python bench_all.py [method ...]   (default: every registered method)
       method may carry a model preset: lora-clip@ViT-L/14
"""

import json
import sys
import time

import numpy as np

FLAGSHIPS = ["lora-clip", "mvp-clip", "maple", "adapter-clip-proto_prompt",
             "moe-clip"]
# VERDICT r2 item 6: ER family + ViT-prompt methods measured too.
ALL = FLAGSHIPS + [
    "er", "clib", "rm", "lwf", "ewc++", "Finetuning",
    "l2p@vit_base_patch16_224", "dualprompt@vit_base_patch16_224",
    "mvp@vit_base_patch16_224", "continual-clip",
]
# replay methods need a populated memory for a representative step
_MEMORY = {"er": 500, "clib": 500, "rm": 500, "lwf": 500}
# continual-clip is zero-shot: no train step, eval row only
_EVAL_ONLY = {"continual-clip"}

BATCH = 64
ITERS = 10
EVAL_BATCHES = 16   # timed slice of the evaluate() sweep


# method-behavior flags the reference launch scripts turn on (the class
# defaults mirror the reference CLI defaults: all off) — bench the shipped
# script configurations
_METHOD_ATTRS = {
    "mvp-clip": {"use_mask": True, "use_contrastiv": True},
    "mvp": {"use_mask": True, "use_contrastiv": True,
            "use_afs": True, "use_gsf": True},
}


def make_trainer(method: str, model: str):
    from lifelong_clip_tpu.config import StreamConfig, TrainConfig
    from lifelong_clip_tpu.methods import get_method

    cfg = TrainConfig(
        method=method, dataset="synthetic-100", model_name=model,
        batchsize=BATCH, test_batchsize=BATCH, online_iter=1,
        lr=5e-4, memory_size=_MEMORY.get(method, 0),
        # rm trains online_iter*temp_batchsize iterations per stream
        # batch (reference online_step:47, r4 realignment) — temp=2 keeps
        # the row a 2-iteration step instead of a 32-iteration sweep
        temp_batchsize=(2 if method == "rm" else BATCH // 2)
        if method in _MEMORY else 0,
        eval_period=10 ** 9,
        stream=StreamConfig(n_tasks=2, n=50, m=10, seed=1),
        transforms=("cutmix", "autoaug"), use_bf16=True,
        log_path="/tmp/bench_results", seed=1)
    cls = get_method(method)
    if method in _METHOD_ATTRS:
        cls = type(cls.__name__, (cls,), _METHOD_ATTRS[method])
    tr = cls(cfg, synthetic_fallback=True)
    if hasattr(tr, "online_before_task"):
        tr.online_before_task(0)
    return tr


def _row(name: str, model: str, step_ms: float, unit: str, **extra):
    metric = f"{name}_ms" if model == "ViT-B/16" else f"{name}@{model}_ms"
    print(json.dumps({"metric": metric, "value": round(step_ms, 2),
                      "unit": unit, **extra}), flush=True)


def bench_train(tr, method: str, model: str):
    idx = np.asarray(tr.stream.task_indices[0][:BATCH])
    images, labels = tr.train_dataset.gather(idx)
    tr.vocab.expose(labels)

    # compile + settle; replay methods also fill memory during warmup
    stats = tr.online_step(images, labels, idx)
    float(np.asarray(stats["loss"]))
    stats = tr.online_step(images, labels, idx)
    float(np.asarray(stats["loss"]))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        stats = tr.online_step(images, labels, idx)
    loss = float(np.asarray(stats["loss"]))
    dt = time.perf_counter() - t0

    _row(f"{method}_step", model, dt / ITERS * 1e3,
         f"ms/step (bs={BATCH}, {model}, full online_step incl. host "
         "remap + fused augmentation)",
         samples_per_sec=round(BATCH * ITERS / dt, 1),
         loss_finite=bool(np.isfinite(loss)))


def bench_eval(tr, method: str, model: str):
    """Time the real evaluate() batch loop over the full exposed table."""
    from lifelong_clip_tpu.utils.stream import exposed_test_indices

    tr.vocab.expose(np.asarray(tr.train_dataset.targets))  # full table
    idx = exposed_test_indices(tr.test_dataset.targets, tr.vocab.exposed)
    tr.prepare_eval()
    images, _ = tr.test_dataset.gather(idx[:BATCH])
    np.asarray(tr.predict(images))                     # compile
    n = min(EVAL_BATCHES * BATCH, len(idx) - len(idx) % BATCH)
    # mirrors OnlineTrainer.evaluate(): grouped fetches — dispatch races
    # ahead, predictions come back stacked once per GROUP_N batches with
    # a one-group lookahead (compile the stack op outside the timed loop)
    import jax.numpy as jnp
    GROUP_N = 8
    warm = [tr.predict(images) for _ in range(GROUP_N)]
    np.asarray(jnp.stack(warm))                        # compile stack
    t0 = time.perf_counter()
    done = 0
    groups, cur = [], []
    for lo in range(0, n, BATCH):
        images, _ = tr.test_dataset.gather(idx[lo:lo + BATCH])
        cur.append(tr.predict(images))
        done += BATCH
        if len(cur) == GROUP_N:
            groups.append(cur)
            cur = []
            if len(groups) == 2:
                np.asarray(jnp.stack(groups.pop(0)))   # honest host fetch
    for g in groups:
        np.asarray(jnp.stack(g))
    for p in cur:
        np.asarray(p)
    dt = time.perf_counter() - t0
    _row(f"{method}_eval", model, dt / (done // BATCH) * 1e3,
         f"ms/eval-batch (bs={BATCH}, {model}, real predict loop incl. "
         "host gather + fetch)",
         images_per_sec=round(done / dt, 1))


def bench_rm_uncertainty(tr, model: str):
    """RM's 12-view MC vote-ratio pass (reference montecarlo,
    rainbow_memory.py:244-285) over one batch."""
    import jax.numpy as jnp

    idx = np.asarray(tr.stream.task_indices[0][:BATCH])
    images, _ = tr.train_dataset.gather(idx)
    mask = jnp.asarray(tr.vocab.logit_mask())
    args = lambda: (tr.state.frozen, tr.state.trainable,
                    jnp.asarray(images), mask, tr.next_rng())
    np.asarray(tr._mc_uncertainty(*args()))            # compile
    t0 = time.perf_counter()
    for _ in range(ITERS):
        u = tr._mc_uncertainty(*args())
    float(np.asarray(u).sum())
    dt = time.perf_counter() - t0
    _row("rm_uncertainty", model, dt / ITERS * 1e3,
         f"ms/batch (bs={BATCH}, 12 MC views, vote-ratio)")


def bench_method(spec: str):
    method, _, model = spec.partition("@")
    model = model or "ViT-B/16"
    tr = make_trainer(method, model)
    if method not in _EVAL_ONLY:
        bench_train(tr, method, model)
    if method == "rm":
        bench_rm_uncertainty(tr, model)
    bench_eval(tr, method, model)


def main(methods):
    from lifelong_clip_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    for m in methods or ALL:
        try:
            bench_method(m)
        except Exception as e:  # keep measuring the rest
            print(json.dumps({"metric": f"{m}_step_ms", "value": None,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
