"""Per-stage profile of the fused train preprocessing pipeline (TPU).

Times cumulative prefixes of the headline pipeline (uint8 CIFAR batch ->
AutoAugment -> resize 224 -> pad4 crop -> hflip -> normalize bf16) so the
stage diffs reflect the real composition (lane-padding layout effects make
isolated-stage timings lie — CLAUDE.md). Keys are fed as arguments
(jit-captured constant keys constant-fold and collapse the random
branches).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from lifelong_clip_tpu.ops import preprocess
    from lifelong_clip_tpu.ops.autoaugment import auto_augment_batch_fast

    bs = 64
    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (bs, 32, 32, 3), np.uint8))

    def upto(stage):
        def one(key, images_u8):
            ks = jax.random.split(key, 4)
            x = images_u8.astype(jnp.float32) / 255.0
            if stage >= 1:
                x = auto_augment_batch_fast(ks[3], x, policy="cifar10")
            if stage >= 2:
                # fused resize+pad+crop einsum (what make_train_pipeline
                # runs; the old resize->pad->vmap'd-slice form gathered)
                x = preprocess.resize_pad_random_crop(ks[0], x, 224, pad=4)
            if stage >= 3:
                x = preprocess.random_hflip(ks[1], x)
            if stage >= 4:
                x = preprocess.normalize(x, mean, std).astype(jnp.bfloat16)
            # reduce to a scalar so timing isn't dominated by a
            # (..., 3)-channel output layout (CLAUDE.md pitfall)
            return jnp.sum(x.astype(jnp.float32))

        # all iterations inside ONE device program (scan over keys): the
        # tunneled dispatch latency would otherwise swamp ms-scale stages
        @jax.jit
        def many(keys, images_u8):
            def body(c, k):
                return c + one(k, images_u8), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
            return acc

        return many

    names = ["u8_to_f32", "autoaug", "resize_pad_crop", "hflip",
             "normalize_cast"]
    iters = 50
    keys = jax.random.split(jax.random.PRNGKey(0), iters)
    prev = 0.0
    for stage, name in enumerate(names):
        fn = upto(stage)
        float(fn(keys, images))
        float(fn(keys, images))
        t0 = time.perf_counter()
        float(fn(keys, images))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({"upto": name, "ms": round(ms, 3),
                          "stage_ms": round(ms - prev, 3)}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
