"""Online PEFT training of CLIP: LoRA / adapter / MoE-adapter.

Parity target: reference ``methods/adapter_clip.py`` (serves both
``lora-clip`` and ``adapter-clip``; the MoE variant rides the same trainer
with ``design_details['method']='moe'``). The whole of the reference's
``online_train`` (label remap loop, GPU transform, per-step class-name
tokenization, AMP fwd/bwd, scheduler step — ``adapter_clip.py:63-113``) is
one jitted step here; online_iter repeats execute the same compiled program.

Replay memory follows the reference's reservoir + memory-batch concat
(``adapter_clip.py:210-247``), with determinism from a seeded host RNG
instead of rank-0 broadcast.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models import build_clip, build_peft
from ..models.init import param_count
from ..utils.train_utils import make_optimizer
from .base import OnlineTrainer, _MeshMixin, pad_batch
from .engine import (TrainState, make_eval_step, make_text_feature_fn,
                     make_train_step)

import logging

log = logging.getLogger("lifelong_clip_tpu")


class AdapterCLIP(_MeshMixin, OnlineTrainer):
    """Trainer for lora-clip / adapter-clip / moe-clip methods."""

    def setup_model(self):
        cfg = self.cfg
        self.params, self.clip_cfg = build_clip(
            cfg.model_name, cfg.pretrained_path, rng=self.next_rng())
        method = {"lora-clip": "lora", "adapter-clip": "adapter",
                  "moe-clip": "moe"}.get(cfg.method, cfg.peft.method)
        self.peft_cfg = dataclasses.replace(cfg.peft, method=method)
        self.peft = build_peft(self.next_rng(), self.clip_cfg, self.peft_cfg)
        self.compute_dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32

        # fixed class capacity of the per-step (batch-visible) class table:
        # a batch of B samples + replay can expose at most B + replay classes
        self.step_capacity = min(self.vocab.max_classes,
                                 cfg.batchsize + max(cfg.temp_batchsize, 0))

        self.tx = make_optimizer(cfg.opt_name, cfg.lr,
                                 sched_name=cfg.sched_name,
                                 total_steps=self._estimate_steps())
        self.state = self.place_state(
            TrainState.create(trainable=self.peft, frozen=self.params,
                              tx=self.tx, rng=self.next_rng()),
            tx=self.tx, peft_method=self.peft_cfg.method)
        # model-axis meshes route attention through the einsum path:
        # GSPMD partitions it (and inserts the TP/EP collectives) freely,
        # which it cannot do through an opaque Pallas custom call. A
        # PURE-DP mesh instead runs the train step inside shard_map over
        # the data axis (engine.make_train_step dp_mesh=) — each shard
        # runs the fused Pallas kernels on its local batch rows and grads
        # pmean over ICI, so multi-chip DP keeps the 2.6x kernel win.
        # Eval/text passes stay on the einsum path under any mesh (cold
        # paths; replicated GSPMD handles them without a partition rule).
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
        dp_only = self.mesh is not None \
            and self.mesh.shape[MODEL_AXIS] == 1 \
            and (cfg.batchsize + max(cfg.temp_batchsize, 0)) \
            % self.mesh.shape[DATA_AXIS] == 0
        self._dp_mesh = self.mesh if dp_only else None
        self._attn_impl = "xla" if self.mesh is not None else None
        self._train_attn_impl = None if (self.mesh is None or dp_only) \
            else "xla"
        # eval rides the same shard_map road when its (fixed, tail-tiled)
        # batch divides the data axis — otherwise a meshed eval
        # replicates the full batch on every chip via the einsum path
        eval_dp = dp_only \
            and cfg.test_batchsize % self.mesh.shape[DATA_AXIS] == 0
        self._eval_dp_mesh = self.mesh if eval_dp else None
        self._eval_attn_impl = None if (self.mesh is None or eval_dp) \
            else "xla"
        log.info("backbone params: %d | trainable PEFT params: %d",
                 param_count(self.params), param_count(self.peft))

        use_autoaug = "autoaug" in cfg.transforms
        # image-only PEFT: per-class text features are constant for a given
        # class set — cache them outside the step (removes the text tower
        # from the hot loop; the reference recomputes it every step)
        self._use_text_cache = not self.peft_cfg.on_text()
        self._step_txt_cache = {}
        from .engine import ce_on_probs_loss, remat_fallback
        self._train_step = remat_fallback(lambda fb: make_train_step(
            self.clip_cfg, self.peft_cfg, self.tx,
            image_size=self.clip_cfg.image_size,
            mean=self.train_dataset.mean, std=self.train_dataset.std,
            use_autoaug=use_autoaug,
            autoaug_policy=("cifar10" if "cifar" in cfg.dataset else
                            "svhn" if "svhn" in cfg.dataset else "imagenet"),
            cached_text=self._use_text_cache,
            compute_dtype=self.compute_dtype,
            attn_impl=self._train_attn_impl,
            dp_mesh=self._dp_mesh,
            # reference adapter-clip trains CE on softmaxed probs
            # (see engine.ce_on_probs_loss); --ce_on_probs 0 opts out
            loss_fn=ce_on_probs_loss if cfg.ce_on_probs else None,
            # at bs=256 the un-remat'd step fails to COMPILE (HBM);
            # at bs=128 measured remat loses slightly to the spill
            # (690 vs 738 samples/s) — threshold at 256, --remat forces
            # on; fb = engine.remat_fallback retry after a compile OOM
            # (e.g. ViT-L/14 at bs=64)
            remat=cfg.remat or cfg.batchsize >= 256 or fb))
        self._text_fn = make_text_feature_fn(
            self.clip_cfg, self.peft_cfg, compute_dtype=self.compute_dtype,
            attn_impl=self._attn_impl)
        self._eval_fn = make_eval_step(
            self.clip_cfg, self.peft_cfg,
            image_size=self.clip_cfg.image_size,
            mean=self.train_dataset.mean, std=self.train_dataset.std,
            compute_dtype=self.compute_dtype,
            attn_impl=self._eval_attn_impl, dp_mesh=self._eval_dp_mesh)
        self._txt_cache_key = None

    def _estimate_steps(self) -> int:
        n = len(self.train_dataset)
        return max(int(n / max(self.cfg.batchsize, 1)
                       * max(self.cfg.online_iter, 1)), 1)

    # -- hot loop --------------------------------------------------------------
    def online_step(self, images, labels, indices):
        cfg = self.cfg
        # replay concat (half stream / half memory when temp_batchsize set)
        if cfg.memory_size > 0 and len(self.memory) > 0 \
                and cfg.temp_batchsize > 0:
            mem_idx = self.memory.sample(cfg.temp_batchsize)
            m_images, m_labels = self.train_dataset.gather(mem_idx)
            images = np.concatenate([images, m_images], axis=0)
            labels = np.concatenate([labels, m_labels], axis=0)

        step_bs = cfg.batchsize + max(cfg.temp_batchsize, 0)
        images, labels, _ = pad_batch(images, labels, step_bs)

        if cfg.visible_classes == "batch":
            tokens, mask, y, slots = self.vocab.batch_table(
                labels, self.step_capacity)
        else:  # all exposed classes visible
            tokens = self.vocab.token_table
            mask = self.vocab.logit_mask()
            y = self.vocab.remap(labels)
            slots = np.where(self.vocab.exposed_mask,
                             np.arange(self.vocab.max_classes), -1)

        if self._use_text_cache:
            key = tuple(int(s) for s in slots)
            feats = self._step_txt_cache.get(key)
            if feats is None:
                feats = self._text_fn(self.state.frozen,
                                      self.state.trainable,
                                      jnp.asarray(tokens))
                if len(self._step_txt_cache) > 512:
                    self._step_txt_cache.clear()
                self._step_txt_cache[key] = feats
            tokens_or_feats = feats
        else:
            tokens_or_feats = jnp.asarray(tokens)

        batch = self.place_batch(
            {"images": jnp.asarray(images),
             "labels": jnp.asarray(y, jnp.int32),
             "tokens": tokens_or_feats,
             "mask": jnp.asarray(mask)})
        stats = {}
        for _ in range(max(int(self.cfg.online_iter), 1)):
            self.state, stats = self._train_step(self.state, batch)

        if cfg.memory_size > 0:
            for i, lab in zip(indices, labels[:len(indices)]):
                self.memory.reservoir_update(int(i), int(lab))
        if not self._use_text_cache:
            self._txt_cache_key = None  # trainable text changed
        return stats

    # -- freeze policy: structural. Only the PEFT tree is in the optimizer. --
    def online_before_task(self, task_id):
        if self.cfg.debug:
            log.info("task %d | exposed classes: %d", task_id,
                     len(self.vocab))
        # the reference rebuilds the optimizer at every task boundary
        # (online_before_task -> reset_opt, methods/adapter_clip.py:127 +
        # _trainer.py:536-538): fresh moments + restarted schedule
        if task_id > 0:
            self.state = self.state.replace(
                opt_state=self.tx.init(self.state.trainable))

    # -- eval -------------------------------------------------------------------
    def prepare_eval(self):
        key = (len(self.vocab), int(self.state.step))
        if self._txt_cache_key != key:
            self._txt_cache = self._text_fn(
                self.state.frozen, self.state.trainable,
                jnp.asarray(self.vocab.token_table))
            self._mask = jnp.asarray(self.vocab.logit_mask())
            self._txt_cache_key = key

    def predict(self, images):
        from ..parallel.mesh import DATA_AXIS
        images = jnp.asarray(images)
        if self.mesh is not None and self._eval_dp_mesh is None \
                and images.shape[0] % self.mesh.shape[DATA_AXIS] == 0:
            # model-axis meshes run eval through the einsum route — give
            # GSPMD a batch-sharded operand so it distributes the batch
            # instead of replicating the whole program on every chip
            from jax.sharding import NamedSharding, PartitionSpec as P
            images = jax.device_put(
                images, NamedSharding(self.mesh, P("data")))
        preds, _ = self._eval_fn(self.state.frozen, self.state.trainable,
                                 images, self._txt_cache, self._mask)
        return preds
