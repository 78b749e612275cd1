"""MaPLe trainer — online multi-modal prompt tuning.

Parity target: reference ``methods/maple.py``: only the prompt-learner
parameters train (``online_before_task():111-138``); per-step tokenized
prompts are "<init phrase> <classname>." for batch-visible classes
(``online_train():89-95``). Here the class-prompt token table lives in the
ClassVocabulary (template swapped to the MaPLe prefix), and the forward is
``models/maple.maple_forward`` inside the standard jitted step.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PEFTConfig
from ..models import build_clip
from ..models.init import param_count
from ..models.maple import init_maple_params, maple_forward
from ..utils import tokenizer as tok
from ..utils.class_vocab import ClassVocabulary
from ..utils.train_utils import make_optimizer
from .base import OnlineTrainer, pad_batch
from .engine import TrainState, make_train_step, remat_fallback

log = logging.getLogger("lifelong_clip_tpu")

CTX_INIT = "a bad photo of a"


class MaPLe(OnlineTrainer):

    n_ctx = 3
    prompt_depth = 3

    def setup_model(self):
        cfg = self.cfg
        self.params, self.clip_cfg = build_clip(
            cfg.model_name, cfg.pretrained_path, rng=self.next_rng())
        self.peft_cfg = PEFTConfig(method="maple", n_ctx=self.n_ctx,
                                   prompt_depth=self.prompt_depth)
        self.compute_dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32

        # class prompts: "<ctx words> <classname>." — ctx token positions
        # 1..1+n_ctx get spliced with the learnable ctx in the fwd
        self.vocab = ClassVocabulary(
            self.train_dataset.class_names,
            max_classes=cfg.max_classes or self.n_classes,
            template=CTX_INIT + " {}.")
        ctx_tokens = tok.default_tokenizer().encode(CTX_INIT)
        assert len(ctx_tokens) >= self.n_ctx

        self.learner = init_maple_params(
            self.next_rng(), self.params, self.clip_cfg,
            n_ctx=self.n_ctx, depth=self.prompt_depth,
            ctx_init_tokens=ctx_tokens)
        # host-side snapshot: the live buffers enter the donated train
        # state and are invalidated after the first step
        self.learner_init = jax.tree.map(np.asarray, self.learner)
        self.tx = make_optimizer(cfg.opt_name, cfg.lr,
                                 sched_name=cfg.sched_name)
        self.state = TrainState.create(trainable=self.learner,
                                       frozen=self.params, tx=self.tx,
                                       rng=self.next_rng())
        log.info("MaPLe trainable params: %d", param_count(self.learner))

        self.step_capacity = min(self.vocab.max_classes, cfg.batchsize)

        fwd = functools.partial(
            lambda frozen, trainable, images, tokens:
            maple_forward(frozen, trainable, images, tokens, self.clip_cfg,
                          self.n_ctx, self.compute_dtype))
        # pure-DP meshes ride the shard_map road (fused kernels per
        # shard, grads pmean — same as the adapter/ER families); the
        # joint-tower forward is replicated-weights/batch-local, exactly
        # the supported layout
        dp_only = None
        if self.mesh is not None:
            from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
            if self.mesh.shape[MODEL_AXIS] == 1 \
                    and cfg.batchsize % self.mesh.shape[DATA_AXIS] == 0:
                dp_only = self.mesh
        self._dp_mesh = dp_only
        self._train_step = remat_fallback(lambda fb: make_train_step(
            self.clip_cfg, self.peft_cfg, self.tx,
            image_size=self.clip_cfg.image_size,
            mean=self.train_dataset.mean, std=self.train_dataset.std,
            use_autoaug="autoaug" in cfg.transforms,
            compute_dtype=self.compute_dtype, forward_fn=fwd,
            dp_mesh=self._dp_mesh,
            # fb: engine.remat_fallback retry after a compile-time HBM OOM
            remat=cfg.remat or cfg.batchsize >= 256 or fb))

        from ..models import clip as clip_fns
        from ..models.maple import maple_encode_image, maple_encode_text
        from ..ops import preprocess

        @jax.jit
        def text_features(frozen, learner, tokens):
            txt = maple_encode_text(frozen, learner, tokens, self.clip_cfg,
                                    self.n_ctx, self.compute_dtype)
            return clip_fns.normalize(txt)

        @jax.jit
        def eval_step(frozen, learner, images_u8, txt_features, mask):
            x = images_u8.astype(jnp.float32) / 255.0
            x = preprocess.resize_bilinear(x, self.clip_cfg.image_size)
            x = preprocess.normalize(x, self.train_dataset.mean,
                                     self.train_dataset.std)
            img = maple_encode_image(frozen, learner,
                                     x.astype(self.compute_dtype),
                                     self.clip_cfg, self.n_ctx,
                                     self.compute_dtype)
            img = clip_fns.normalize(img)
            scale = jnp.exp(frozen["logit_scale"]).astype(jnp.float32)
            logits = scale * jnp.einsum(
                "be,ce->bc", img.astype(jnp.float32),
                txt_features.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST) + mask[None, :]
            return jnp.argmax(logits, axis=-1), logits

        self._text_fn = text_features
        self._eval_fn = eval_step
        self._txt_cache_key = None

    def online_before_task(self, task_id):
        # the reference rebuilds the optimizer at every task boundary
        # (online_before_task -> reset_opt, methods/maple.py:138 +
        # _trainer.py:536-538): fresh moments + restarted schedule
        if task_id > 0:
            self.state = self.state.replace(
                opt_state=self.tx.init(self.state.trainable))

    def online_step(self, images, labels, indices):
        cfg = self.cfg
        images, labels, _ = pad_batch(images, labels, cfg.batchsize)
        if cfg.visible_classes == "batch":
            tokens, mask, y, _ = self.vocab.batch_table(labels,
                                                     self.step_capacity)
        else:
            tokens = self.vocab.token_table
            mask = self.vocab.logit_mask()
            y = self.vocab.remap(labels)
        batch = {"images": jnp.asarray(images),
                 "labels": jnp.asarray(y, jnp.int32),
                 "tokens": jnp.asarray(tokens),
                 "mask": jnp.asarray(mask)}
        stats = {}
        for _ in range(max(int(cfg.online_iter), 1)):
            self.state, stats = self._train_step(self.state, batch)
        self._txt_cache_key = None
        return stats

    def prepare_eval(self):
        key = (len(self.vocab), int(self.state.step))
        if self._txt_cache_key != key:
            self._txt_cache = self._text_fn(
                self.state.frozen, self.state.trainable,
                jnp.asarray(self.vocab.token_table))
            self._mask = jnp.asarray(self.vocab.logit_mask())
            self._txt_cache_key = key

    def predict(self, images):
        preds, _ = self._eval_fn(self.state.frozen, self.state.trainable,
                                 jnp.asarray(images), self._txt_cache,
                                 self._mask)
        return preds
