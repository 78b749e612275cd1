"""MVP-CLIP trainer — mask + visual prompts with AFS/GSF losses.

Parity target: reference ``methods/mvp_clip.py``. The per-sample
text-feature gradients behind the ignore/compensation scores
(``_compute_grads():204-238`` — a backward-in-a-Python-loop with
retain_graph) become one ``jax.vmap(jax.grad)`` over the feature-level
loss; AFS divides image features by the compensation score before the head
(``loss_fn():256-280``), GSF reweights per-sample CE by ``ign**gamma``; the
prompt-pool similarity loss is added (contrastive when ``use_contrastiv``).

The e-prompt usage counts are a non-trainable buffer threaded explicitly
through the jitted step.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import PEFTConfig
from ..models import build_clip
from ..models import clip as clip_fns
from ..models.init import param_count
from ..models.mvp_clip import init_mvp_params, mvp_features, mvp_head
from ..ops import preprocess
from ..utils.train_utils import make_optimizer
from .base import OnlineTrainer, pad_batch
from .engine import TrainState

log = logging.getLogger("lifelong_clip_tpu")


def mvp_scores(img_f, txt_f, y, cls_mask, class_mask, scale,
               use_mask: bool, margin: float, dp_axis=None):
    """(ign_score, cps_score) per sample from detached features
    (reference _compute_grads + _get_ignore/_get_compensation).

    ``dp_axis``: under the shard_map DP road the batch-mean gradient must
    be the GLOBAL batch's (the reference's single-device semantics), so
    the per-class mean gradient is pmean'd across shards."""
    img_n = clip_fns.normalize(img_f).astype(jnp.float32)
    txt_n = clip_fns.normalize(txt_f).astype(jnp.float32)

    def loss_one(t_feat, i_f, y_i, m_i):
        logit = scale * (i_f @ t_feat.T)
        if use_mask:
            logit = logit * m_i[:logit.shape[0]]
        logit = logit + class_mask
        return optax.softmax_cross_entropy_with_integer_labels(
            logit[None], y_i[None])[0]

    # (B, C, D): gradient of each sample's loss wrt the text features
    g = jax.vmap(jax.grad(loss_one), in_axes=(None, 0, 0, 0))(
        txt_n, img_n, y, cls_mask.astype(jnp.float32))
    sample_grad = jnp.take_along_axis(
        g, y[:, None, None].astype(jnp.int32), axis=1)[:, 0]       # (B, D)
    batch_grad_full = g.mean(axis=0)                               # (C, D)
    if dp_axis is not None:
        # equal shard sizes: pmean of per-shard means == global mean
        batch_grad_full = jax.lax.pmean(batch_grad_full, dp_axis)
    batch_grad = batch_grad_full[y]                                # (B, D)

    def cos(a, b, eps=1e-8):
        na = jnp.linalg.norm(a, axis=-1) + eps
        nb = jnp.linalg.norm(b, axis=-1) + eps
        return jnp.sum(a * b, axis=-1) / (na * nb)

    ign_score = 1.0 - cos(sample_grad, batch_grad)
    cps_score = 1.0 - cos(txt_n[y], img_n) + margin
    return jax.lax.stop_gradient(ign_score), \
        jax.lax.stop_gradient(cps_score)


class CLIP_MVP(OnlineTrainer):

    # flag defaults match the reference CLI (configuration/config.py:
    # 96-100, all store_true -> False): the reference trainer reads every
    # flag via kwargs.get (methods/mvp_clip.py:31-35) and overrides the
    # MODEL defaults in setup_distributed_model, so the model-side
    # defaults (use_mask=True etc.) never apply. scripts/mvp_clip.sh
    # turns on mask+contrastiv (reference scripts/mvp_clip.sh:52).
    use_mask = False
    use_contrastiv = False
    use_afs = False
    use_gsf = False
    use_last_layer = False
    alpha = 0.5
    gamma = 2.0
    margin = 0.5
    task_num = 10  # e-prompt pool size (reference mvp_clip.py:26)

    def setup_model(self):
        cfg = self.cfg
        self.params, self.clip_cfg = build_clip(
            cfg.model_name, cfg.pretrained_path, rng=self.next_rng())
        self.peft_cfg = PEFTConfig(method="mvp")
        self.compute_dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
        # reference CLIP_MVP(task_num=10) — get_model (models/__init__.py:
        # 36-37) never passes task_num, so the shipped e-prompt pool is 10
        # regardless of n_tasks
        self.e_pool = self.task_num
        self.mvp = init_mvp_params(self.next_rng(), self.clip_cfg,
                                   e_pool=self.e_pool,
                                   num_classes=self.vocab.max_classes)
        self.count = jnp.zeros((self.e_pool,), jnp.float32)
        self.tx = make_optimizer(cfg.opt_name, cfg.lr,
                                 sched_name=cfg.sched_name)
        self.state = TrainState.create(trainable=self.mvp,
                                       frozen=self.params, tx=self.tx,
                                       rng=self.next_rng())
        log.info("MVP trainable params: %d", param_count(self.mvp))
        self.step_capacity = min(self.vocab.max_classes, cfg.batchsize)
        # pure-DP meshes ride the unified shard_map road (batch rows local
        # per shard, fused kernels legal, grads pmean over ICI); the
        # count/score reductions are psum/pmean'd inside the step so the
        # sharded semantics equal the single-program step's
        self._dp_mesh = self.resolve_dp_mesh(cfg.batchsize)
        self._eval_dp_mesh = self.resolve_dp_mesh(cfg.test_batchsize)

        pipeline = preprocess.make_train_pipeline(
            self.clip_cfg.image_size, self.train_dataset.mean,
            self.train_dataset.std,
            use_autoaug="autoaug" in cfg.transforms,
            out_dtype=self.compute_dtype)
        use_mask, use_afs = self.use_mask, self.use_afs
        use_gsf, use_contrastiv = self.use_gsf, self.use_contrastiv
        alpha, gamma, margin = self.alpha, self.gamma, self.margin
        clip_cfg, dt = self.clip_cfg, self.compute_dtype
        use_last_layer = self.use_last_layer

        from ..parallel.mesh import DATA_AXIS
        from .engine import dp_batch_specs, dp_fold_rng, dp_shard_map
        dp_axis = DATA_AXIS if self._dp_mesh is not None else None

        def _features(frozen, mvp, count, images):
            return mvp_features(frozen, mvp, count, images, clip_cfg,
                                use_contrastiv=use_contrastiv,
                                use_last_layer=use_last_layer,
                                train=True, compute_dtype=dt,
                                dp_axis=dp_axis)

        # --remat / bs>=256 / the engine's OOM fallback: checkpoint the
        # prompted-tower forward (the step's dominant activation holder)
        # so its backward recomputes block intermediates
        feats_fn = (jax.checkpoint(_features)
                    if cfg.remat or cfg.batchsize >= 256 else _features)

        def step(state: TrainState, batch, count):
            rng, aug_rng = jax.random.split(state.rng)
            aug_rng = dp_fold_rng(dp_axis, aug_rng)
            images = pipeline(aug_rng, batch["images"])
            scale = jnp.exp(state.frozen["logit_scale"]).astype(jnp.float32)
            # slot-gathered per-sample class mask column space
            slot_ids = batch["slot_globals"]  # (K,) global ids, -1 pad

            def objective(mvp):
                txt = clip_fns.encode_text(state.frozen, batch["tokens"],
                                           clip_cfg, compute_dtype=dt)
                img, cls_mask_full, sim_loss, new_count, idx = feats_fn(
                    state.frozen, mvp, count, images)
                # gather mask columns for the step's class slots
                cls_mask = cls_mask_full[:, jnp.clip(slot_ids, 0, None)]
                ign, cps = mvp_scores(
                    jax.lax.stop_gradient(img), jax.lax.stop_gradient(txt),
                    batch["labels"], jax.lax.stop_gradient(cls_mask),
                    batch["mask"], scale, use_mask, margin,
                    dp_axis=dp_axis)
                img_used = img / cps[:, None].astype(img.dtype) \
                    if use_afs else img
                logits = mvp_head(state.frozen, img_used, txt,
                                  cls_mask=cls_mask if use_mask else None,
                                  class_mask=batch["mask"],
                                  use_mask=use_mask)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch["labels"])
                loss = ce.mean()
                if use_gsf:
                    # reference broadcast quirk (mvp_clip.py:273-276, and
                    # identically mvp.py:248-250): nll_loss is ALREADY
                    # mean-reduced when the (B,) ign**gamma broadcast hits
                    # it, so GSF scales the mean loss by mean(ign**gamma)
                    # instead of weighting per-sample CE (the paper's form)
                    gsf_w = jnp.mean(ign ** gamma)
                    if dp_axis is not None:
                        # global mean BEFORE the product: pmean of
                        # mean_s(ign^g)·loss_s is not M·L — the scale must
                        # be the global batch's (ign is stop-gradient, so
                        # this is a constant in the backward)
                        gsf_w = jax.lax.pmean(gsf_w, dp_axis)
                    loss = (1 - alpha) * loss + alpha * gsf_w * loss
                loss = loss + sim_loss
                acc = jnp.mean((jnp.argmax(logits, -1) ==
                                batch["labels"]).astype(jnp.float32))
                return loss, (acc, new_count)

            (loss, (acc, new_count)), grads = jax.value_and_grad(
                objective, has_aux=True)(state.trainable)
            if dp_axis is not None:
                # per-shard means over equal shards -> pmean == the global
                # batch mean (the DP all-reduce GSPMD would insert); the
                # e-prompt usage counts are per-row bincounts, so the
                # global increment is the psum of the local deltas
                loss, acc, grads = jax.lax.pmean((loss, acc, grads),
                                                 dp_axis)
                new_count = count + jax.lax.psum(new_count - count,
                                                 dp_axis)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.trainable)
            trainable = optax.apply_updates(state.trainable, updates)
            new_state = state.replace(step=state.step + 1,
                                      trainable=trainable,
                                      opt_state=opt_state, rng=rng)
            return new_state, new_count, {"loss": loss, "acc": acc}

        if self._dp_mesh is not None:
            from jax.sharding import PartitionSpec as P
            step = dp_shard_map(
                step, self._dp_mesh,
                in_specs=(P(), dp_batch_specs(
                    ("images", "labels", "tokens", "mask",
                     "slot_globals")), P()),
                out_specs=(P(), P(), P()))
        self._mvp_step = jax.jit(step)

        @jax.jit
        def text_features(frozen, tokens):
            return clip_fns.normalize(clip_fns.encode_text(
                frozen, tokens, clip_cfg, compute_dtype=dt))

        def eval_step(frozen, mvp, count, images_u8, txt_features, mask,
                      slot_ids):
            x = images_u8.astype(jnp.float32) / 255.0
            x = preprocess.resize_bilinear(x, clip_cfg.image_size)
            x = preprocess.normalize(x, self.train_dataset.mean,
                                     self.train_dataset.std)
            img, cls_mask_full, _, _, _ = mvp_features(
                frozen, mvp, count, x.astype(dt), clip_cfg,
                use_contrastiv=use_contrastiv,
                use_last_layer=self.use_last_layer,
                train=False, compute_dtype=dt)
            cls_mask = cls_mask_full[:, jnp.clip(slot_ids, 0, None)]
            logits = mvp_head(frozen, img, txt_features,
                              cls_mask=cls_mask if use_mask else None,
                              class_mask=mask, use_mask=use_mask)
            return jnp.argmax(logits, axis=-1), logits

        if self._eval_dp_mesh is not None:
            from jax.sharding import PartitionSpec as P
            eval_step = dp_shard_map(
                eval_step, self._eval_dp_mesh,
                in_specs=(P(), P(), P(), P(DATA_AXIS), P(), P(), P()),
                out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
        eval_step = jax.jit(eval_step)

        self._text_fn = text_features
        self._eval_fn = eval_step
        self._txt_cache_n = -1

    # -- checkpoint plumbing: the e-prompt usage-count buffer lives
    # OUTSIDE TrainState — without this a resumed run resets selection
    # statistics to zero and re-warms the pool (VERDICT r4 §5.4) ----------
    def checkpoint_extra(self):
        extra = super().checkpoint_extra()
        extra["mvp_clip"] = {"count": np.asarray(self.count)}
        return extra

    def restore_extra(self, extra):
        super().restore_extra(extra)
        st = (extra or {}).get("mvp_clip")
        if st:
            self.count = jnp.asarray(st["count"])

    def online_step(self, images, labels, indices):
        cfg = self.cfg
        images, labels, _ = pad_batch(images, labels, cfg.batchsize)
        if cfg.visible_classes == "batch":
            tokens, mask, y, slot_globals = self.vocab.batch_table(
                labels, self.step_capacity)
        else:
            tokens = self.vocab.token_table
            mask = self.vocab.logit_mask()
            y = self.vocab.remap(labels)
            slot_globals = np.where(self.vocab.exposed_mask,
                                    np.arange(self.vocab.max_classes), -1)
        batch = {"images": jnp.asarray(images),
                 "labels": jnp.asarray(y, jnp.int32),
                 "tokens": jnp.asarray(tokens),
                 "mask": jnp.asarray(mask),
                 "slot_globals": jnp.asarray(slot_globals, jnp.int32)}
        stats = {}
        for _ in range(max(int(cfg.online_iter), 1)):
            self.state, self.count, stats = self._mvp_step(
                self.state, batch, self.count)
        return stats

    def prepare_eval(self):
        if self._txt_cache_n != len(self.vocab):
            self._txt_cache = self._text_fn(
                self.state.frozen, jnp.asarray(self.vocab.token_table))
            self._mask = jnp.asarray(self.vocab.logit_mask())
            # exposed slot i corresponds to mask column = global slot i
            # (the per-prompt mask is indexed by exposed slot order)
            self._slot_ids = jnp.asarray(
                np.where(self.vocab.exposed_mask,
                         np.arange(self.vocab.max_classes), -1), jnp.int32)
            self._txt_cache_n = len(self.vocab)

    def predict(self, images):
        preds, _ = self._eval_fn(self.state.frozen, self.state.trainable,
                                 self.count, jnp.asarray(images),
                                 self._txt_cache, self._mask,
                                 self._slot_ids)
        return preds


class CLIP_MVP_Full(CLIP_MVP):
    """MVP with every bell on (mask + contrastive + AFS + GSF) and the
    full-depth query pass."""
    use_mask = True
    use_contrastiv = True
    use_afs = True
    use_gsf = True
    use_last_layer = True
