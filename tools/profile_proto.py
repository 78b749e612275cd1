"""Ablation profile of the ProtoCLIP stage-1 step (TPU).

Decomposes the ~360 ms bs=64 step (bench_all.py row) into its pieces:
query pass, prompted image tower fwd+bwd, prefix-shared text fwd and
fwd+bwd, and the full step. One JSON line per piece; pieces are timed as
pipelined chains closed by a single host fetch (CLAUDE.md).
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
    import optax

    from lifelong_clip_tpu.config import StreamConfig, TrainConfig
    from lifelong_clip_tpu.methods import get_method
    from lifelong_clip_tpu.models import proto_clip as pc

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
    state = tr.state
    clip_cfg, dt = tr.clip_cfg, tr.compute_dtype
    n_tasks = cfg.stream.n_tasks

    from lifelong_clip_tpu.ops import preprocess
    pipeline = preprocess.make_train_pipeline(
        clip_cfg.image_size, tr.train_dataset.mean, tr.train_dataset.std,
        use_autoaug=True, out_dtype=dt)
    key = jax.random.PRNGKey(0)
    imgs = pipeline(key, jnp.asarray(images))
    jb = {"tokens": jnp.asarray(tokens), "mask": jnp.asarray(mask),
          "labels": jnp.asarray(y, jnp.int32)}

    def timed(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        acc = None
        for _ in range(ITERS):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(json.dumps({"piece": name, "ms": round(ms, 2)}), flush=True)

    from lifelong_clip_tpu.models import clip as clip_fns
    from lifelong_clip_tpu.models.mvp_clip import _vit_prelude

    # 1. query pass (frozen promptless fwd)
    @jax.jit
    def query_pass(frozen, images):
        x, v = _vit_prelude(frozen, images, clip_cfg, dt)
        q = clip_fns.transformer(x, v["blocks"], clip_cfg.vision_heads,
                                 base_grads=False)
        return clip_fns.layer_norm(q[:, :1], v["ln_post"])[:, 0]

    timed("image_query_fwd", query_pass, state.frozen, imgs)

    # 2. prompted image tower fwd only
    @jax.jit
    def img_fwd(frozen, proto, images):
        return pc.proto_encode_image(frozen, proto, images, clip_cfg,
                                     task_count=0, n_tasks=n_tasks,
                                     train=True, compute_dtype=dt)

    timed("image_prompted_fwd(incl_query)", img_fwd, state.frozen,
          state.trainable, imgs)

    # 3. prompted image tower fwd+bwd (grad wrt copl)
    @jax.jit
    def img_fwdbwd(frozen, proto, images):
        def obj(p):
            img = pc.proto_encode_image(frozen, p, images, clip_cfg,
                                        task_count=0, n_tasks=n_tasks,
                                        train=True, compute_dtype=dt)
            return jnp.sum(img.astype(jnp.float32) ** 2)
        return jax.grad(obj)(proto)["copl"]["p"]

    timed("image_prompted_fwd_bwd(incl_query)", img_fwdbwd, state.frozen,
          state.trainable, imgs)

    # 4. text features fwd only (needs img feats)
    img_feats = img_fwd(state.frozen, state.trainable, imgs)
    jax.block_until_ready(img_feats)

    @jax.jit
    def txt_fwd(frozen, proto, img_feats, tokens):
        txt, _ = pc.proto_text_features(
            frozen, proto, img_feats, tokens, clip_cfg, top_k=tr.top_k,
            n_ctx=tr.n_ctx, suffix_len=tr.suffix_len, compute_dtype=dt)
        return txt

    timed("text_pairs_fwd", txt_fwd, state.frozen, state.trainable,
          img_feats, jb["tokens"])

    # 5. text features fwd+bwd (grad wrt text pools only)
    @jax.jit
    def txt_fwdbwd(frozen, proto, img_feats, tokens):
        def obj(p):
            txt, _ = pc.proto_text_features(
                frozen, p, img_feats, tokens, clip_cfg, top_k=tr.top_k,
                n_ctx=tr.n_ctx, suffix_len=tr.suffix_len,
                compute_dtype=dt)
            return jnp.sum(txt.astype(jnp.float32) ** 2)
        return jax.grad(obj)(proto)["text_prompt"]

    timed("text_pairs_fwd_bwd", txt_fwdbwd, state.frozen, state.trainable,
          img_feats, jb["tokens"])

    # 6. full stage-1 step (the bench_all row, minus host remap)
    def full(state):
        s, stats = tr._stage1_step(state, {"images": jnp.asarray(images),
                                           **jb}, 0)
        return stats["loss"]

    timed("full_stage1_step", full, state)


if __name__ == "__main__":
    main()
