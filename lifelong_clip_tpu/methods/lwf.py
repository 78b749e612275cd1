"""Learning without Forgetting (LwF) — distillation from the previous model.

Parity target: reference ``methods/lwf.py`` — the old model is snapshotted
once at the END of every online step, after its ``online_iter`` train
iterations (``online_step():50-51``), and training adds a temperature-2 KD
term over the previously-seen class slots (``_KD_loss():112-115``). Here
the "old model" is just the previous trainable pytree; the KD term rides
inside the same jitted step (no second module, no ``no_grad`` bookkeeping).
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

    def setup_model(self):
        super().setup_model()
        fwd = functools.partial(head_forward, clip_cfg=self.clip_cfg,
                                compute_dtype=self.compute_dtype)
        pipeline = preprocess.make_train_pipeline(
            self.clip_cfg.image_size, self.train_dataset.mean,
            self.train_dataset.std,
            use_autoaug="autoaug" in self.cfg.transforms,
            out_dtype=self.compute_dtype)
        tau = self.kd_temperature

        def kd_step(state: TrainState, batch, old_trainable, old_mask):
            rng, aug_rng = jax.random.split(state.rng)
            images = pipeline(aug_rng, batch["images"])
            old_logits, _, _ = fwd(state.frozen, old_trainable, images,
                                   None)
            old_logits = old_logits + old_mask[None, :]

            def objective(trainable):
                logits, _, _ = fwd(state.frozen, trainable, images, None)
                logits = logits + batch["mask"][None, :]
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch["labels"]).mean()
                # KD over previously-exposed slots (reference lwf.py:112-115)
                log_p = jax.nn.log_softmax(logits / tau, axis=-1)
                q = jax.nn.softmax(old_logits / tau, axis=-1)
                valid = jnp.isfinite(old_mask)
                kd = -jnp.sum(jnp.where(valid[None, :], q * log_p, 0.0),
                              axis=-1).mean()
                loss = ce + kd
                acc = jnp.mean((jnp.argmax(logits, -1) ==
                                batch["labels"]).astype(jnp.float32))
                return loss, acc

            (loss, acc), grads = jax.value_and_grad(
                objective, has_aux=True)(state.trainable)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.trainable)
            trainable = optax.apply_updates(state.trainable, updates)
            return state.replace(step=state.step + 1, trainable=trainable,
                                 opt_state=opt_state, rng=rng), \
                {"loss": loss, "acc": acc}

        self._kd_step = jax.jit(kd_step)
        self._old_trainable = None
        self._old_mask = None

    def online_step(self, images, labels, indices):
        cfg = self.cfg
        images, labels = self.replay_concat(images, labels)
        images, labels, _ = pad_batch(images, labels, self._step_bs())
        y = self.vocab.remap(labels)
        batch = {"images": jnp.asarray(images),
                 "labels": jnp.asarray(y, jnp.int32),
                 "mask": jnp.asarray(self.vocab.logit_mask())}
        stats = {}
        if self._old_trainable is None:
            # first step: distill from self (KD term = const offset)
            self._old_trainable = self.state.trainable
            self._old_mask = batch["mask"]
        old = (self._old_trainable, self._old_mask)
        for _ in range(max(int(cfg.online_iter), 1)):
            self.state, stats = self._kd_step(self.state, batch, *old)
        # snapshot once per online_step AFTER its online_iter loop — the
        # reference deep-copies the model at the end of online_step
        # (lwf.py:50-51), so every iteration of the NEXT step distills
        # from this post-step model
        self._old_trainable = self.state.trainable
        self._old_mask = batch["mask"]
        self.update_memory(indices, labels[:len(indices)])
        return stats
