"""Rainbow Memory (RM) — uncertainty-diverse memory + post-task training.

Parity target: reference ``methods/rainbow_memory.py``: online steps train
on the stream; the episodic memory is rebuilt at task boundaries by
Monte-Carlo-augmentation uncertainty sampling (``uncertainty_sampling():
177-218`` — rank candidates per class by prediction instability across
augmented views, keep an even spread of ranks), with class-balanced random
replacement during the stream (``update_memory():91-108``); after each task
the model trains ``memory_epoch`` epochs on memory
(``online_memory_train():126-175``).

The MC-augmentation uncertainty is a single jitted call: K augmented views
are generated and scored on device in one batched forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import preprocess
from .base import pad_batch
from .er_baseline import ER

# the reference's vr_randaug mode uses 12 RandAugment views
# (montecarlo(), rainbow_memory.py:263-265)
MC_VIEWS = 12


def vote_ratio_uncertainty(view_preds, n_classes: int):
    """Monte-Carlo vote-ratio uncertainty (reference ``variance_ratio``,
    rainbow_memory.py:279-285): each augmented view votes its argmax class;
    uncertainty = 1 − (max vote count) / n_views.

    ``view_preds``: (V, B) int predicted classes per view. Returns (B,).
    """
    votes = jax.nn.one_hot(view_preds, n_classes).sum(axis=0)   # (B, C)
    return 1.0 - votes.max(axis=-1) / view_preds.shape[0]


class RM(ER):

    def setup_model(self):
        super().setup_model()
        fwd_predict = self._predict_fn  # slot preds, argmax

        @jax.jit
        def mc_disagreement(frozen, trainable, images_u8, mask, rng):
            """MC vote-ratio uncertainty: each augmented view votes its
            argmax class; uncertainty = 1 − max vote ratio (reference
            montecarlo + variance_ratio, rainbow_memory.py:244-285)."""
            pipeline = preprocess.make_train_pipeline(
                self.clip_cfg.image_size, self.train_dataset.mean,
                self.train_dataset.std, out_dtype=self.compute_dtype)

            def one_view(k):
                from ..methods.er_baseline import head_forward
                x = pipeline(k, images_u8)
                logits, _, _ = head_forward(
                    frozen, trainable, x, None, clip_cfg=self.clip_cfg,
                    compute_dtype=self.compute_dtype)
                return jnp.argmax(logits + mask[None, :], axis=-1)

            preds = jnp.stack([one_view(k) for k in
                               jax.random.split(rng, MC_VIEWS)])  # (V, B)
            return vote_ratio_uncertainty(preds, mask.shape[0])

        self._mc_uncertainty = mc_disagreement
        self._task_seen: list = []

    def online_step(self, images, labels, indices):
        cfg = self.cfg
        images, labels = self.replay_concat(images, labels)
        images, labels, _ = pad_batch(images, labels, self._step_bs())
        y = self.vocab.remap(labels)
        batch = {"images": jnp.asarray(images),
                 "labels": jnp.asarray(y, jnp.int32),
                 "tokens": self._dummy_tokens,
                 "mask": jnp.asarray(self.vocab.logit_mask())}
        stats = {}
        for _ in range(max(int(cfg.online_iter), 1)):
            self.state, stats = self._train_step(self.state, batch)
        # track task samples for boundary-time uncertainty sampling
        self._task_seen.extend(int(i) for i in indices)
        if cfg.memory_size > 0:
            for i, lab in zip(indices, labels[:len(indices)]):
                self.memory.balanced_random_update(int(i), int(lab))
        return stats

    # -- task boundary -----------------------------------------------------
    def online_after_task(self, task_id):
        cfg = self.cfg
        if cfg.memory_size > 0:
            self._rebuild_memory_by_uncertainty()
            if cfg.memory_epoch > 0:
                self._memory_train_epochs()
        self._task_seen = []

    def _uncertainties(self, indices: np.ndarray) -> np.ndarray:
        bs = self.cfg.batchsize
        mask = jnp.asarray(self.vocab.logit_mask())
        out = np.zeros((len(indices),), np.float64)
        for lo in range(0, len(indices), bs):
            chunk = indices[lo:lo + bs]
            imgs, labs = self.train_dataset.gather(chunk)
            imgs, labs, valid = pad_batch(imgs, labs, bs)
            u = np.asarray(self._mc_uncertainty(
                self.state.frozen, self.state.trainable, jnp.asarray(imgs),
                mask, self.next_rng()))
            out[lo:lo + valid] = u[:valid]
        return out

    def _rebuild_memory_by_uncertainty(self):
        """Even-rank uncertainty sampling per class over memory + task pool
        (reference uncertainty_sampling, rainbow_memory.py:177-218)."""
        pool = np.unique(np.concatenate([
            self.memory.ordered_indices(),
            np.asarray(self._task_seen, np.int64)])) \
            if self._task_seen else self.memory.ordered_indices()
        if len(pool) == 0:
            return
        labels = self.train_dataset.targets[pool]
        classes = np.unique(labels)
        budget = max(self.memory.memory_size // max(len(classes), 1), 1)
        unc = self._uncertainties(pool)

        keep_idx, keep_lab = [], []
        for c in classes:
            sel = np.nonzero(labels == c)[0]
            ranked = sel[np.argsort(unc[sel])]
            take = min(budget, len(ranked))
            # even spread across the uncertainty ranking (diversity)
            picks = ranked[np.linspace(0, len(ranked) - 1, take)
                           .astype(int)]
            keep_idx.extend(int(pool[p]) for p in picks)
            keep_lab.extend([int(c)] * take)
        keep_idx = keep_idx[:self.memory.memory_size]
        keep_lab = keep_lab[:self.memory.memory_size]
        self.memory.indices = keep_idx
        self.memory.labels = keep_lab
        self.memory.loss_history = [0.0] * len(keep_idx)
        self.memory.usage_count = [0] * len(keep_idx)

    def _memory_train_epochs(self):
        cfg = self.cfg
        epochs = int(cfg.memory_epoch)  # --memory_epoch (config.py:83)
        n = len(self.memory)
        if n == 0:
            return
        mask = jnp.asarray(self.vocab.logit_mask())
        for _ in range(epochs):
            order = self.memory.rng.permutation(n)
            mem = self.memory.ordered_indices()[order]
            for lo in range(0, n, cfg.batchsize):
                chunk = mem[lo:lo + cfg.batchsize]
                imgs, labs = self.train_dataset.gather(chunk)
                imgs, labs, _ = pad_batch(imgs, labs,
                                          cfg.batchsize * 2
                                          if cfg.memory_size > 0
                                          else cfg.batchsize)
                batch = {"images": jnp.asarray(imgs),
                         "labels": jnp.asarray(self.vocab.remap(labs),
                                               jnp.int32),
                         "tokens": self._dummy_tokens,
                         "mask": mask}
                self.state, _ = self._train_step(self.state, batch)
