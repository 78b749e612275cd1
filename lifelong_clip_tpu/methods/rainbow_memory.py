"""Rainbow Memory (RM) — class-balanced memory + post-task training.

Parity target: reference ``methods/rainbow_memory.py``'s LIVE behavior
(r4 realignment): each stream batch trains ``online_iter *
temp_batchsize`` iterations (``online_step():47``); the episodic memory
does class-balanced RANDOM replacement on every stream sample
(``update_memory():91-108`` — count the incoming class in, evict a random
slot of the most-populated class); after each task the model trains
``memory_epoch`` epochs over memory IN SLOT ORDER with a warm-start LR
schedule — 0.1·lr, then lr, then cosine-annealing warm restarts
(``online_memory_train():126-175``).

The Monte-Carlo uncertainty machinery (``uncertainty_sampling()`` /
``montecarlo()``, reference :177-285) is DEAD code in the reference — no
call site anywhere — so the task-boundary uncertainty rebuild here is a
capability add behind ``--rm_uncertainty`` (default off = live
reference). The MC pass is a single jitted call: 12 augmented views are
generated and scored on device in one batched forward.
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

    def _make_tx(self, cfg):
        # the memory-train epochs mutate the LR in place (warm start +
        # cosine restarts) while adam moments persist — inject_hyperparams
        # makes the LR a mutable leaf of opt_state, same pattern as
        # CLIB's adaptive LR. The reference pins sched const for RM
        # (rainbow_memory.py:28) and resets LR to base per task via a
        # fresh LambdaLR (online_before_task():112).
        import optax
        from ..utils.train_utils import make_optimizer as _mk
        return optax.inject_hyperparams(
            lambda learning_rate: _mk(cfg.opt_name, learning_rate,
                                      sched_name="const"))(
                                          learning_rate=cfg.lr)

    # _set_lr inherited from ER (shared inject_hyperparams plumbing)

    @staticmethod
    def memory_epoch_lr(epoch: int, base_lr: float,
                        dataset: str = "") -> float:
        """The reference's per-epoch memory-train LR
        (online_memory_train():126-151): epoch 0 -> 0.1·base (warm
        start), epoch 1 -> base, epoch >= 2 steps the per-task scheduler
        once per epoch — MultiStepLR(milestones=[30,60,80,90], gamma=0.1)
        when ``dataset == 'imagenet'`` (:127-130), otherwise
        CosineAnnealingWarmRestarts(T_0=1, T_mult=2, eta_min=0.01·base).
        Epoch e>=2 has taken e-1 scheduler steps, so the MultiStepLR arm
        is base · 0.1^|{m <= e-1}| in closed form."""
        if epoch <= 0:
            return base_lr * 0.1
        if epoch == 1:
            return base_lr
        if dataset == "imagenet":
            decays = sum(1 for m in (30, 60, 80, 90) if m <= epoch - 1)
            return base_lr * (0.1 ** decays)
        eta_min = base_lr * 0.01
        # replay torch CAWR: T_i starts at 1 and doubles at each restart;
        # step() advances T_cur and wraps. epoch e applies e-1 steps.
        t_cur, t_i = 0, 1
        for _ in range(epoch - 1):
            t_cur += 1
            if t_cur >= t_i:
                t_cur -= t_i
                t_i *= 2
        return eta_min + (base_lr - eta_min) * (
            1 + float(np.cos(np.pi * t_cur / t_i))) / 2

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

    def _iters_per_batch(self) -> int:
        """Reference online_step():47 trains ``int(online_iter) *
        temp_batchsize * world_size`` iterations per stream batch.
        temp_batchsize=0 divides by zero in the reference's loss
        averaging — patched per evident intent to one multiplier."""
        cfg = self.cfg
        return max(int(cfg.online_iter), 1) * max(int(cfg.temp_batchsize),
                                                  1)

    def online_step(self, images, labels, indices):
        cfg = self.cfg
        # memory stores STREAM samples only — snapshot before the replay
        # concat/pad reshuffles labels (reference update_memory(idx,
        # labels) receives the pure stream labels; pairing indices with
        # post-concat labels would poison the class-balanced counts)
        stream_labels = labels
        images, labels = self.replay_concat(images, labels)
        images, labels, _ = pad_batch(images, labels, self._step_bs())
        y = self.vocab.remap(labels)
        batch = {"images": jnp.asarray(images),
                 "labels": jnp.asarray(y, jnp.int32),
                 "tokens": self._dummy_tokens,
                 "mask": jnp.asarray(self.vocab.logit_mask())}
        stats = {}
        for _ in range(self._iters_per_batch()):
            self.state, stats = self._train_step(self.state, batch)
        # track task samples for the optional boundary-time rebuild
        self._task_seen.extend(int(i) for i in indices)
        if cfg.memory_size > 0:
            for i, lab in zip(indices, stream_labels[:len(indices)]):
                self.memory.balanced_random_update(
                    int(i), int(lab), class_order=self.vocab.exposed)
        return stats

    # -- task boundary -----------------------------------------------------
    def online_before_task(self, task_id):
        super().online_before_task(task_id)
        # reference online_before_task():112 installs a fresh constant
        # LambdaLR, which resets the optimizer LR to base after the
        # previous task's memory-train schedule left it elsewhere
        self._set_lr(self.cfg.lr)

    def online_after_task(self, task_id):
        cfg = self.cfg
        if cfg.memory_size > 0:
            if cfg.rm_uncertainty:
                self._rebuild_memory_by_uncertainty()
            if cfg.memory_epoch > 0:
                self._memory_train_epochs()
        self._task_seen = []

    # -- checkpoint plumbing: the mid-task candidate pool for the optional
    # uncertainty rebuild (the live LR rides in opt_state.hyperparams and
    # the eviction-draw generator in memory.state_dict) --------------------
    def checkpoint_extra(self):
        return {"rm": {"task_seen": list(self._task_seen)}}

    def restore_extra(self, extra):
        st = (extra or {}).get("rm")
        if st:
            self._task_seen = list(st["task_seen"])

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
        """Post-task memory training (reference online_memory_train,
        rainbow_memory.py:126-175): each epoch walks the memory IN SLOT
        ORDER, repeated ``len(memory) // batchsize`` times
        (MemoryOrderedSampler(memory, bs, len//bs) concatenates the full
        arange per iteration), under the warm-start LR schedule
        (memory_epoch_lr). n < batchsize zeroes the reference's iteration
        count (and its loss averaging divides by zero) — patched per
        intent to skip. Tail batches (when n·iters % bs != 0) run
        unpadded, exactly like the reference DataLoader's short final
        batch (tiling would over-weight the leading rows); the shard_map
        DP mesh needs divisible shapes, so only there the tail pads by
        tiling."""
        cfg = self.cfg
        epochs = int(cfg.memory_epoch)  # --memory_epoch (config.py:83)
        n = len(self.memory)
        iters = n // cfg.batchsize
        if n == 0 or iters == 0:
            return
        mask = jnp.asarray(self.vocab.logit_mask())
        for epoch in range(epochs):
            self._set_lr(self.memory_epoch_lr(epoch, cfg.lr, cfg.dataset))
            mem = np.concatenate(
                [self.memory.ordered_indices()] * iters)
            for lo in range(0, len(mem), cfg.batchsize):
                chunk = mem[lo:lo + cfg.batchsize]
                imgs, labs = self.train_dataset.gather(chunk)
                if len(labs) < cfg.batchsize:
                    # the reference's DataLoader trains the tail as its
                    # own smaller batch (unweighted mean over the tail
                    # rows) — tiling would over-weight the leading rows
                    # whenever bs % tail != 0. Run it unpadded (one extra
                    # trace at the tail shape); under the shard_map DP
                    # mesh the tail must divide the axis, so pad-tile
                    # there as a documented approximation.
                    if self._dp_mesh is not None:
                        imgs, labs, _ = pad_batch(imgs, labs,
                                                  cfg.batchsize)
                batch = {"images": jnp.asarray(imgs),
                         "labels": jnp.asarray(self.vocab.remap(labs),
                                               jnp.int32),
                         "tokens": self._dummy_tokens,
                         "mask": mask}
                self.state, _ = self._train_step(self.state, batch)
