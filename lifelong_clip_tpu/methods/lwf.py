"""Learning without Forgetting (LwF) — distillation from the previous model.

Parity target: reference ``methods/lwf.py`` — the old model is snapshotted
once at the END of every online step, after its ``online_iter`` train
iterations (``online_step():50-51``); until the first snapshot exists no
KD term is applied (``model_forward():150``); training then adds
``kd_hp=0.2`` times a temperature-2 KD term (``_KD_loss():112-115``).

Faithful quirks: the KD runs over the RAW logits of both models — no
exposure mask is added to either side (``model_forward():147-153`` uses
``ori_logit`` and ``old_logit``), and the ``[:, :len(self.old_mask)]``
slice is the FULL width (``old_mask`` is the whole n_classes mask tensor,
so ``len`` returns n_classes, not the previously-seen count). Here the
"old model" is just the previous trainable pytree; the KD term rides
inside the same jitted step (no second module, no ``no_grad``
bookkeeping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import preprocess
from .base import pad_batch
from .engine import TrainState
from .er_baseline import ER, head_forward


class LwF(ER):

    kd_temperature = 2.0
    kd_hp = 0.2   # reference lwf.py:26

    def setup_model(self):
        super().setup_model()
        cfg = self.cfg
        fwd = functools.partial(head_forward, clip_cfg=self.clip_cfg,
                                compute_dtype=self.compute_dtype)
        pipeline = preprocess.make_train_pipeline(
            self.clip_cfg.image_size, self.train_dataset.mean,
            self.train_dataset.std,
            use_autoaug="autoaug" in self.cfg.transforms,
            out_dtype=self.compute_dtype)
        tau = self.kd_temperature
        kd_hp = self.kd_hp

        # the reference LwF NEVER applies cutmix: model_forward computes
        # do_cutmix and discards it (reference lwf.py:144-147) — rebuild
        # the pre-snapshot step without the cutmix branch ER enables from
        # cfg.transforms (autoaug stays on)
        from .engine import make_train_step, remat_fallback
        self._train_step = remat_fallback(lambda fb: make_train_step(
            self.clip_cfg, self.peft_cfg, self.tx,
            image_size=self.clip_cfg.image_size,
            mean=self.train_dataset.mean, std=self.train_dataset.std,
            use_autoaug="autoaug" in cfg.transforms, use_cutmix=False,
            compute_dtype=self.compute_dtype, forward_fn=fwd,
            remat=cfg.remat or cfg.batchsize >= 256 or fb))

        def build_kd_step(remat):
            # --remat / the bs>=256 threshold / the OOM fallback apply to
            # the KD step too: checkpoint the tower forward so its
            # backward recomputes block intermediates (the kd step holds
            # TWO tower forwards live — strictly larger than the ER step)
            fwd_r = jax.checkpoint(fwd) if remat else fwd

            def kd_step(state: TrainState, batch, old_trainable):
                rng, aug_rng = jax.random.split(state.rng)
                images = pipeline(aug_rng, batch["images"])
                # the reference distills from the old model's RAW logits —
                # no exposure mask on either side (lwf.py:147-153)
                old_logits, _, _ = fwd(state.frozen, old_trainable, images,
                                       None)

                def objective(trainable):
                    raw, _, _ = fwd_r(state.frozen, trainable, images,
                                      None)
                    logits = raw + batch["mask"][None, :]
                    ce = optax.softmax_cross_entropy_with_integer_labels(
                        logits, batch["labels"]).mean()
                    # KD over the full logit width: the reference's
                    # [:, :len(old_mask)] slice is the whole n_classes
                    # mask tensor, not the previously-seen count
                    # (lwf.py:152-153)
                    log_p = jax.nn.log_softmax(raw / tau, axis=-1)
                    q = jax.nn.softmax(old_logits / tau, axis=-1)
                    kd = -jnp.sum(q * log_p, axis=-1).mean()
                    loss = ce + kd_hp * kd
                    acc = jnp.mean((jnp.argmax(logits, -1) ==
                                    batch["labels"]).astype(jnp.float32))
                    return loss, acc

                (loss, acc), grads = jax.value_and_grad(
                    objective, has_aux=True)(state.trainable)
                updates, opt_state = self.tx.update(grads, state.opt_state,
                                                    state.trainable)
                trainable = optax.apply_updates(state.trainable, updates)
                return state.replace(step=state.step + 1,
                                     trainable=trainable,
                                     opt_state=opt_state, rng=rng), \
                    {"loss": loss, "acc": acc}

            return jax.jit(kd_step)

        self._kd_step = remat_fallback(
            lambda fb: build_kd_step(cfg.remat or cfg.batchsize >= 256
                                     or fb))
        self._old_trainable = None

    # -- checkpoint plumbing: the KD teacher lives OUTSIDE TrainState —
    # without this a resumed run silently trains with NO distillation
    # until the next snapshot (VERDICT r4 §5.4) ---------------------------
    def checkpoint_extra(self):
        extra = super().checkpoint_extra()
        extra["lwf"] = {
            "old_trainable": None if self._old_trainable is None
            else jax.tree.map(np.asarray, self._old_trainable)}
        return extra

    def restore_extra(self, extra):
        super().restore_extra(extra)
        st = (extra or {}).get("lwf")
        if not st:
            return
        self._old_trainable = None if st["old_trainable"] is None \
            else jax.tree.map(jnp.asarray, st["old_trainable"])

    def online_step(self, images, labels, indices):
        cfg = self.cfg
        # memory stores STREAM samples: snapshot before replay_concat
        # truncates/reshuffles labels (temp_batchsize > 0 would otherwise
        # pair stream indices with memory labels)
        stream_labels = labels
        images, labels = self.replay_concat(images, labels)
        images, labels, _ = pad_batch(images, labels, self._step_bs())
        y = self.vocab.remap(labels)
        batch = {"images": jnp.asarray(images),
                 "labels": jnp.asarray(y, jnp.int32),
                 "tokens": self._dummy_tokens,
                 "mask": jnp.asarray(self.vocab.logit_mask())}
        stats = {}
        for _ in range(max(int(cfg.online_iter), 1)):
            if self._old_trainable is None:
                # no snapshot yet: plain CE step (reference lwf.py:150 —
                # no KD term until old_model exists)
                self.state, stats = self._train_step(self.state, batch)
            else:
                self.state, stats = self._kd_step(self.state, batch,
                                                  self._old_trainable)
        # snapshot once per online_step AFTER its online_iter loop — the
        # reference deep-copies the model at the end of online_step
        # (lwf.py:50-51), so every iteration of the NEXT step distills
        # from this post-step model
        self._old_trainable = self.state.trainable
        self.update_memory(indices, stream_labels[:len(indices)])
        return stats
