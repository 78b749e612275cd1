"""Post-run zero-shot evaluation on held-out datasets.

Parity target: reference ``--zero_shot_evaluation`` flow
(``methods/_trainer.py:391-401`` + ``setup_zero_shot_dataset:175-193``):
after the online run, classify other datasets zero-shot using their class
names through the (possibly adapted) CLIP towers.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from ..data.registry import get_dataset
from ..models import clip as clip_fns
from ..ops import preprocess
from ..utils.metrics import per_class_counts
from ..utils.tokenizer import tokenize

log = logging.getLogger("lifelong_clip_tpu")


def run_zero_shot_eval(trainer, dataset_names, *,
                       synthetic_fallback: bool = False,
                       template: str = "a bad photo of a {}."):
    """Evaluate the trainer's model zero-shot on each named dataset."""
    import jax

    frozen = trainer.state.frozen if hasattr(trainer, "state") \
        else trainer.params
    trainable = getattr(getattr(trainer, "state", None), "trainable", None)
    cfg = trainer.clip_cfg
    dt = trainer.compute_dtype

    @jax.jit
    def encode_images(images_u8, mean, std):
        x = images_u8.astype(jnp.float32) / 255.0
        x = preprocess.resize_bilinear(x, cfg.image_size)
        x = preprocess.normalize(x, mean, std).astype(dt)
        img = clip_fns.encode_image(
            frozen, x, cfg,
            peft_cfg=trainer.peft_cfg if trainer.peft_cfg.on_vision()
            else None,
            peft=(trainable or {}).get("vision"), compute_dtype=dt)
        return clip_fns.normalize(img)

    results = {}
    for name in dataset_names:
        try:
            ds = get_dataset(name, trainer.cfg.data_dir, train=False,
                             synthetic_fallback=synthetic_fallback)
        except Exception as e:
            log.warning("zero-shot: skipping %s (%s)", name, e)
            continue
        tokens = tokenize([template.format(c) for c in ds.class_names])
        # text-side PEFT applies here too: the reference evaluates through
        # the adapted custom_clip (_trainer.py:391-401), so adapters/LoRA
        # on the text tower must not silently drop out at zero-shot eval
        txt = clip_fns.encode_text(
            frozen, jnp.asarray(tokens), cfg,
            peft_cfg=trainer.peft_cfg if trainer.peft_cfg.on_text()
            else None,
            peft=(trainable or {}).get("text"), compute_dtype=dt)
        txt = clip_fns.normalize(txt)
        scale = float(np.exp(np.asarray(frozen["logit_scale"])))
        bs = trainer.cfg.test_batchsize
        correct = np.zeros((ds.n_classes,), np.int64)
        total = np.zeros((ds.n_classes,), np.int64)
        mean = jnp.asarray(ds.mean)
        std = jnp.asarray(ds.std)
        from .base import pad_batch
        for lo in range(0, len(ds), bs):
            idx = np.arange(lo, min(lo + bs, len(ds)))
            imgs, labels = ds.gather(idx)
            # tail batches tile to the full static shape (no tail-shape
            # recompile) via the shared helper
            imgs, _, n = pad_batch(imgs, labels, bs)
            img_f = np.asarray(encode_images(jnp.asarray(imgs), mean,
                                             std), np.float32)[:n]
            logits = scale * img_f @ np.asarray(txt, np.float32).T
            preds = logits.argmax(-1)
            c, t = per_class_counts(preds, labels, ds.n_classes)
            correct += c
            total += t
        acc = float(correct.sum() / max(total.sum(), 1))
        results[name] = acc
        log.info("zero-shot %s: acc %.4f (%d samples)", name, acc,
                 int(total.sum()))
        # append the reference's zero-shot line format to result.txt
        # (_trainer.py:391-401)
        import os
        with open(os.path.join(trainer.result_dir(), "result.txt"),
                  "a") as f:
            f.write(f"Dataset:{name} | test_acc:{acc:.4f}\n")
    return results
