"""Decompose the ViT-prompt family's eval/step cost (VERDICT r4 item #5).

The l2p/dualprompt/mvp@vit eval rows sit at 44-47 ms/batch vs ~21 for
every CLIP method. Structurally each forward is TWO tower passes — the
frozen promptless CLS query (reference l2p.py:145-150) feeding prompt
selection, then the prompted pass — so the protocol floor is ~2x a plain
eval. This tool measures where the time actually goes:

  * plain_fwd   — promptless tower forward at eval resolution (floor/pass)
  * query       — the frozen CLS query program alone
  * predict     — the full jitted predict program (query + select +
                  prompted pass + head), WITHOUT host gather/fetch costs
  * predict_xla — same program with the fused Pallas kernels swapped for
                  the XLA attention path (confirms the fused routing is
                  live and what it buys)
  * step        — the full jitted online train step program
  * step_xla    — ditto under XLA attention

Timing (CLAUDE.md): programs are dispatched back-to-back (device executes
launches in order) and closed by ONE host value fetch of the last output;
per-program cost is elapsed/iters. One JSON line per (method, component).

Usage: python tools/profile_vit_prompt.py [l2p dualprompt mvp]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BATCH = 64
ITERS = 20
MODEL = "vit_base_patch16_224"


def _trainer(method):
    from lifelong_clip_tpu.config import StreamConfig, TrainConfig
    from lifelong_clip_tpu.methods import get_method
    cfg = TrainConfig(
        method=method, dataset="synthetic-100", model_name=MODEL,
        batchsize=BATCH, test_batchsize=BATCH, online_iter=1, lr=5e-4,
        memory_size=0, temp_batchsize=0, eval_period=10 ** 9,
        stream=StreamConfig(n_tasks=2, n=50, m=10, seed=1),
        transforms=("autoaug",), use_bf16=True,
        log_path="/tmp/bench_results", seed=1)
    cls = get_method(method)
    if method == "mvp":
        cls = type(cls.__name__, (cls,), {
            "use_mask": True, "use_contrastiv": True,
            "use_afs": True, "use_gsf": True})
    tr = cls(cfg, synthetic_fallback=True)
    tr.online_before_task(0)
    return tr


def _timed(dispatch, fetch, iters=ITERS):
    """dispatch() -> out (un-fetched); fetch(out) forces it. Warm twice,
    then time iters dispatches closed by one fetch of the last output."""
    fetch(dispatch())
    fetch(dispatch())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = dispatch()
    fetch(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _row(method, component, ms, **extra):
    print(json.dumps({"metric": f"{method}@{MODEL}_{component}_ms",
                      "value": round(ms, 2),
                      "unit": f"ms/batch (bs={BATCH}, program only)",
                      **extra}), flush=True)


def profile(method):
    import jax
    import jax.numpy as jnp
    from lifelong_clip_tpu.models import clip as clip_fns
    from lifelong_clip_tpu.models import vit_prompt as vp
    from lifelong_clip_tpu.ops import preprocess

    tr = _trainer(method)
    cfg = tr.clip_cfg
    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(rng.integers(0, 255, (BATCH, 32, 32, 3),
                                         np.uint8))
    tr.vocab.expose(np.asarray(tr.train_dataset.targets))
    tr.prepare_eval()

    def eval_res(images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        x = preprocess.resize_bilinear(x, cfg.image_size)
        return preprocess.normalize(x, tr.train_dataset.mean,
                                    tr.train_dataset.std)

    # plain promptless forward at eval resolution: the per-pass floor
    @jax.jit
    def plain_fwd(frozen, images_u8):
        from lifelong_clip_tpu.models.mvp_clip import _vit_prelude
        x, v = _vit_prelude(frozen, eval_res(images_u8),
                            cfg, tr.compute_dtype)
        h = clip_fns.transformer(x, v["blocks"], cfg.vision_heads,
                                 act=cfg.act, base_grads=False)
        return clip_fns.layer_norm(h[:, :1], v["ln_post"])[:, 0]

    _row(method, "plain_fwd",
         _timed(lambda: plain_fwd(tr.state.frozen, images_u8),
                lambda o: float(jnp.sum(o.astype(jnp.float32)))))

    # the frozen CLS query program alone (first of the two passes)
    @jax.jit
    def query(frozen, images_u8):
        q, _, _ = vp.vit_query(frozen, eval_res(images_u8).astype(
            tr.compute_dtype), cfg, tr.compute_dtype)
        return q

    _row(method, "query",
         _timed(lambda: query(tr.state.frozen, images_u8),
                lambda o: float(jnp.sum(o.astype(jnp.float32)))))

    # full predict program (no host gather, no grouped-fetch overhead)
    _row(method, "predict",
         _timed(lambda: tr.predict(images_u8),
                lambda o: int(np.asarray(o)[0])))

    # full train step program
    idx = np.asarray(tr.stream.task_indices[0][:BATCH])
    tr_images, tr_labels = tr.train_dataset.gather(idx)

    def step():
        return tr.online_step(tr_images, tr_labels, idx)

    _row(method, "step",
         _timed(step, lambda s: float(np.asarray(s["loss"]))))


def profile_xla(method):
    """Same predict/step programs with the XLA attention path — a fresh
    trainer built under the swapped default (impl resolves at trace
    time), in the same process AFTER the pallas rows so the A/B shares
    session state."""
    from lifelong_clip_tpu.ops import attention
    prev = attention._DEFAULT_IMPL
    attention._DEFAULT_IMPL = "xla"
    try:
        import jax.numpy as jnp
        tr = _trainer(method)
        rng = np.random.default_rng(0)
        images_u8 = jnp.asarray(rng.integers(0, 255, (BATCH, 32, 32, 3),
                                             np.uint8))
        tr.vocab.expose(np.asarray(tr.train_dataset.targets))
        tr.prepare_eval()
        _row(method, "predict_xla",
             _timed(lambda: tr.predict(images_u8),
                    lambda o: int(np.asarray(o)[0])))
        idx = np.asarray(tr.stream.task_indices[0][:BATCH])
        tr_images, tr_labels = tr.train_dataset.gather(idx)
        _row(method, "step_xla",
             _timed(lambda: tr.online_step(tr_images, tr_labels, idx),
                    lambda s: float(np.asarray(s["loss"]))))
    finally:
        attention._DEFAULT_IMPL = prev


def main(methods):
    from lifelong_clip_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    for m in methods or ["l2p", "dualprompt", "mvp"]:
        profile(m)
        profile_xla(m)


if __name__ == "__main__":
    main(sys.argv[1:])
