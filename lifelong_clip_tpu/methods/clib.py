"""CLIB — memory-only training with sample-wise importance + adaptive LR.

Parity target: reference ``methods/clib.py``: training batches come from
episodic memory only; memory replacement evicts, from the most frequent
class (counting the incoming sample), the slot whose
``others_loss_decrease`` attribution is smallest (``update_memory():66-87``
+ ``utils/memory.py:29-75`` — see ``ReplayMemory.clib_update`` for the two
shipped-defect intent patches); a raw per-sample loss sweep over the whole
memory runs every ``imp_update_period`` updates and feeds the attribution
EMA (``samplewise_loss_update():226-244``); and the LR alternates between
a high/low pair, with a Welch t-test deciding geometric re-centering
(``adaptive_lr():134-195`` — host-side here, as it is O(steps) scalar
work). The reference computes no per-incoming-sample loss anywhere in
this path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy.stats import ttest_ind

from ..ops import preprocess
from .base import pad_batch
from .engine import TrainState
from .er_baseline import ER, head_features, head_forward, head_logits


class CLIB(ER):

    ema_ratio = 0.90

    def _make_tx(self, cfg):
        # adaptive LR needs a mutable learning rate -> inject_hyperparams
        # (built through ER's optimizer seam so the shared state/step all
        # bind the SAME transform; the old post-setup rebuild left ER's
        # _train_step closed over a discarded optimizer)
        import optax as _optax
        return _optax.inject_hyperparams(_optax.adamw)(
            learning_rate=cfg.lr)

    def setup_model(self):
        cfg = self.cfg
        self._lr_high = cfg.lr
        # reference clib.py:37: low_lr = lr_step * lr
        self._lr_low = cfg.lr_step * cfg.lr
        super().setup_model()

        fwd = functools.partial(head_forward, clip_cfg=self.clip_cfg,
                                compute_dtype=self.compute_dtype)
        pipeline = preprocess.make_train_pipeline(
            self.clip_cfg.image_size, self.train_dataset.mean,
            self.train_dataset.std,
            use_autoaug="autoaug" in cfg.transforms,
            out_dtype=self.compute_dtype)

        def step(state: TrainState, batch):
            rng, aug_rng = jax.random.split(state.rng)
            images = pipeline(aug_rng, batch["images"])

            def objective(trainable):
                logits, _, _ = fwd(state.frozen, trainable, images, None)
                logits = logits + batch["mask"][None, :]
                losses = optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch["labels"])
                acc = jnp.mean((jnp.argmax(logits, -1) ==
                                batch["labels"]).astype(jnp.float32))
                return losses.mean(), (acc, losses)

            (loss, (acc, losses)), grads = jax.value_and_grad(
                objective, has_aux=True)(state.trainable)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.trainable)
            trainable = optax.apply_updates(state.trainable, updates)
            return state.replace(step=state.step + 1, trainable=trainable,
                                 opt_state=opt_state, rng=rng), \
                {"loss": loss, "acc": acc, "losses": losses}

        self._clib_step = jax.jit(step)

        # Loss bookkeeping runs on the DETERMINISTIC eval transform
        # (resize + normalize, no augmentation) and the tower is frozen
        # for CLIB (head-only trainable tree), so per-sample tower
        # features are constants of the dataset index. Split the pass at
        # the tower->head boundary and cache features per index: the
        # whole-memory refresh (reference samplewise_loss_update,
        # clib.py:216-244 — full forwards over the memory every
        # imp_update_period updates) becomes a head-only pass.
        def eval_feats(frozen, images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            x = preprocess.resize_bilinear(x, self.clip_cfg.image_size)
            x = preprocess.normalize(x, self.train_dataset.mean,
                                     self.train_dataset.std)
            return head_features(frozen, x.astype(self.compute_dtype),
                                 clip_cfg=self.clip_cfg,
                                 compute_dtype=self.compute_dtype)

        @jax.jit
        def head_losses(trainable, feats, labels, mask):
            logits = head_logits(trainable, feats) + mask[None, :]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)

        @jax.jit
        def losses_and_feats(frozen, trainable, images_u8, labels, mask):
            # the slow path serves train_backbone subclasses, where the
            # live tower sits in trainable["backbone"] and frozen is {}
            # (same selection as er_baseline.head_forward)
            tower = trainable.get("backbone") or frozen
            feats = eval_feats(tower, images_u8)
            return head_losses(trainable, feats, labels, mask), feats

        @jax.jit
        def scatter_feats(buf, feats, pos, slots):
            # slots padded with an out-of-range sentinel are dropped, so
            # one compiled program serves any number of live updates
            return buf.at[slots].set(feats[pos], mode="drop")

        self._feats_fn = jax.jit(eval_feats)
        self._head_losses = head_losses
        self._losses_and_feats = losses_and_feats
        self._scatter_feats = scatter_feats
        # Device-resident feature cache, one row per memory slot. Host
        # keeps only the slot -> dataset-index map; feature rows never
        # cross the tunnel (a host-side cache measured SLOWER than the
        # full sweep — the ~1.5 MB feats upload per refresh plus the
        # per-step feats fetch cost more than the tower forwards saved).
        # Only valid while the tower is frozen; FT-style trainable
        # backbones bypass it.
        self._feat_buf = None
        self._slot_index = None
        self._inc_pos = {}
        self._inc_feats_dev = None
        self._feats_cacheable = "backbone" not in self.state.trainable

        # adaptive LR machinery (reference clib.py:134-195)
        self._lr_is_high = True
        self._high_hist, self._low_hist = [], []
        self._prev_losses = None
        self._train_count = 0
        self._imp_counter = 0
        self._loss_sweep = None        # last RAW sweep (reference self.loss)
        self._dropped_idx = []         # slots written since last LR period
        self._mem_dropped_idx = []     # slots written since last loss sweep
        self._set_lr(self._lr_high)

    # _set_lr inherited from ER (shared inject_hyperparams plumbing)

    # -- checkpoint plumbing: without this a resumed run silently resets
    # the adaptive-LR state machine and attributes the first post-resume
    # sweep against an empty prev (ADVICE r3) -------------------------------
    def checkpoint_extra(self):
        return {"clib": {
            "lr_high": self._lr_high, "lr_low": self._lr_low,
            "lr_is_high": self._lr_is_high,
            "high_hist": list(self._high_hist),
            "low_hist": list(self._low_hist),
            "prev_losses": None if self._prev_losses is None
            else np.asarray(self._prev_losses).tolist(),
            "train_count": self._train_count,
            "imp_counter": self._imp_counter,
            "loss_sweep": None if self._loss_sweep is None
            else np.asarray(self._loss_sweep).tolist(),
            "dropped_idx": list(self._dropped_idx),
            "mem_dropped_idx": list(self._mem_dropped_idx),
            "previous_slots": list(self.memory.previous_slots),
        }}

    def restore_extra(self, extra):
        st = (extra or {}).get("clib")
        if not st:
            return
        self._lr_high = st["lr_high"]
        self._lr_low = st["lr_low"]
        self._lr_is_high = st["lr_is_high"]
        self._high_hist = list(st["high_hist"])
        self._low_hist = list(st["low_hist"])
        self._prev_losses = None if st["prev_losses"] is None \
            else np.asarray(st["prev_losses"], np.float64)
        self._train_count = st["train_count"]
        self._imp_counter = st["imp_counter"]
        self._loss_sweep = None if st["loss_sweep"] is None \
            else np.asarray(st["loss_sweep"], np.float64)
        self._dropped_idx = list(st["dropped_idx"])
        self._mem_dropped_idx = list(st["mem_dropped_idx"])
        self.memory.previous_slots = list(st["previous_slots"])
        self._set_lr(self._lr_high if self._lr_is_high else self._lr_low)

    # -- hot loop ---------------------------------------------------------
    def online_step(self, images, labels, indices):
        """Reference clib.py:48-64: memory insertion, then memory-only
        training with a loss sweep + adaptive-LR check per iteration.
        The reference never computes a per-sample loss for incoming
        samples — insertion is scored purely by others_loss_decrease."""
        cfg = self.cfg
        mask = jnp.asarray(self.vocab.logit_mask())
        if self._feats_cacheable:
            # dispatch the incoming batch's tower features now (device
            # only, no host fetch); the refresh scatters the rows that
            # clib_update actually inserts into the slot buffer
            step_imgs, _, _ = pad_batch(images, labels, cfg.batchsize)
            self._inc_feats_dev = self._feats_fn(self.state.frozen,
                                                 jnp.asarray(step_imgs))
            self._inc_pos = {int(idx): i for i, idx in enumerate(indices)}
        order = self.vocab.exposed
        for idx, lab in zip(indices, labels):
            slot = self.memory.clib_update(int(idx), int(lab), order)
            # reference clib.py:81-87: every written slot lands on BOTH
            # dropped lists (append path included)
            self._dropped_idx.append(slot)
            self._mem_dropped_idx.append(slot)

        # memory-only training batches
        stats = {}
        for _ in range(max(int(cfg.online_iter), 1)):
            mem_idx, slots = self.memory.sample_with_slots(cfg.batchsize)
            if len(mem_idx) == 0:
                return {}
            self.memory.mark_used(slots)
            m_images, m_labels = self.train_dataset.gather(mem_idx)
            m_images, m_labels, _ = pad_batch(m_images, m_labels,
                                              cfg.batchsize)
            batch = {"images": jnp.asarray(m_images),
                     "labels": jnp.asarray(self.vocab.remap(m_labels),
                                           jnp.int32),
                     "mask": mask}
            self.state, stats = self._clib_step(self.state, batch)
            self._samplewise_loss_update()
            self._adaptive_lr()
        stats = {k: v for k, v in stats.items() if k != "losses"}
        return stats

    def _samplewise_loss_update(self, batch_cap: int = 256):
        """EMA-refresh the loss history over the whole memory, every
        ``imp_update_period`` model updates
        (reference samplewise_loss_update, clib.py:216-244)."""
        self._imp_counter += 1
        if self._imp_counter % max(self.cfg.imp_update_period, 1) != 0:
            return
        n = len(self.memory)
        if n == 0:
            return
        idx = self.memory.ordered_indices()
        labels = np.asarray(self.memory.labels)
        mask = jnp.asarray(self.vocab.logit_mask())
        all_losses = self._memory_losses(idx, labels, mask, batch_cap)
        # reference clib.py:242-243: the sweep-over-sweep change feeds the
        # others_loss_decrease attribution (slots replaced since the last
        # sweep masked out), and the RAW sweep becomes self.loss
        prev = self._loss_sweep if self._loss_sweep is not None \
            else np.empty((0,), np.float64)
        self.memory.clib_loss_update(all_losses, prev,
                                     dropped_slots=self._mem_dropped_idx,
                                     ema_ratio=self.ema_ratio)
        self._mem_dropped_idx = []
        self._loss_sweep = all_losses

    def _memory_losses(self, idx, labels, mask, batch_cap: int):
        """Per-sample loss over the memory under the eval transform.

        Fast path (frozen tower): head-only pass over cached per-index
        tower features — no image forwards at all in steady state, since
        every memory sample was seen as an incoming batch and cached
        there. Cache misses (e.g. a resumed run restoring memory from a
        checkpoint) batch-compute features first. Slow path (trainable
        backbone): full forwards, chunked at ``batch_cap`` with every
        chunk dispatched before any fetch so the ~25 ms/host-fetch tunnel
        latency overlaps device execution."""
        n = len(idx)
        if self._feats_cacheable:
            if self._feat_buf is None:
                m = max(self.memory.memory_size, n, 1)
                m = -(-m // batch_cap) * batch_cap
                self._feat_buf = jnp.zeros(
                    (m, self.clip_cfg.embed_dim), jnp.float32)
                self._slot_index = np.full((m,), -1, np.int64)
            m = self._feat_buf.shape[0]
            cur = np.full((m,), -1, np.int64)
            cur[:n] = idx
            stale = np.nonzero(cur != self._slot_index)[0]
            stale = stale[cur[stale] >= 0]
            if len(stale):
                pos = np.asarray([self._inc_pos.get(int(cur[s]), -1)
                                  for s in stale], np.int32)
                from_inc = stale[pos >= 0]
                if len(from_inc) and self._inc_feats_dev is not None:
                    k = int(self._inc_feats_dev.shape[0])
                    sl = np.full((k,), m, np.int64)   # m = dropped sentinel
                    pp = np.zeros((k,), np.int32)
                    sl[:len(from_inc)] = from_inc
                    pp[:len(from_inc)] = pos[pos >= 0]
                    self._feat_buf = self._scatter_feats(
                        self._feat_buf, self._inc_feats_dev,
                        jnp.asarray(pp), jnp.asarray(sl))
                    rest = stale[pos < 0]
                else:
                    rest = stale
                # slots not covered by the last incoming batch (memory
                # restored from a checkpoint, pre-populated memory):
                # recompute their features, chunked, written on device
                for lo in range(0, len(rest), batch_cap):
                    chunk = rest[lo:lo + batch_cap]
                    imgs, _ = self.train_dataset.gather(cur[chunk])
                    pad = batch_cap - len(chunk)
                    if pad:
                        imgs = np.concatenate(
                            [imgs, imgs[:1].repeat(pad, 0)], 0)
                    feats = self._feats_fn(self.state.frozen,
                                           jnp.asarray(imgs))
                    sl = np.full((batch_cap,), m, np.int64)
                    sl[:len(chunk)] = chunk
                    self._feat_buf = self._scatter_feats(
                        self._feat_buf, feats,
                        jnp.arange(batch_cap, dtype=jnp.int32),
                        jnp.asarray(sl))
                self._slot_index = cur
            labs = np.zeros((m,), labels.dtype)
            labs[:n] = labels
            dev = self._head_losses(
                self.state.trainable, self._feat_buf,
                jnp.asarray(self.vocab.remap(labs), jnp.int32), mask)
            return np.asarray(dev, np.float64)[:n]
        all_losses = np.zeros((n,), np.float64)
        in_flight = []
        for lo in range(0, n, batch_cap):
            chunk = idx[lo:lo + batch_cap]
            imgs, _ = self.train_dataset.gather(chunk)
            labs = labels[lo:lo + batch_cap]
            imgs, labs, valid = pad_batch(imgs, labs, batch_cap)
            dev = self._losses_and_feats(
                self.state.frozen, self.state.trainable, jnp.asarray(imgs),
                jnp.asarray(self.vocab.remap(labs), jnp.int32), mask)[0]
            in_flight.append((lo, valid, dev))
        for lo, valid, dev in in_flight:
            all_losses[lo:lo + valid] = np.asarray(dev)[:valid]
        return all_losses

    def _adaptive_lr(self, significance: float = 0.05):
        """Reference clib.py:134-195 adaptive_lr, faithfully: the loss
        decrease each period excludes slots replaced since the last
        period boundary; on a significant t-test the LR pair re-centers
        geometrically AND the high/low phase flips a second time."""
        cfg = self.cfg
        period = cfg.lr_period or 10
        min_iter = cfg.lr_length or 10
        # reference adaptive_lr gates on the importance-update counter
        # (clib.py:135)
        if self._imp_counter % max(cfg.imp_update_period, 1) != 0:
            return
        self._train_count += 1
        cur = self._loss_sweep
        if cur is None or len(cur) == 0:      # clib.py:137
            return
        if self._train_count % period != 0:
            return
        if self._prev_losses is not None and self._train_count > 20:
            k = len(self._prev_losses)
            mask = np.ones(len(cur), bool)
            if self._dropped_idx:
                d = np.asarray(self._dropped_idx, np.int64)
                mask[d[d < len(cur)]] = False
            decrease = float(np.mean((self._prev_losses[:k] -
                                      cur[:k])[mask[:k]]))
            hist = self._high_hist if self._lr_is_high else self._low_hist
            hist.append(decrease)
            if len(hist) > min_iter:
                del hist[0]
        self._prev_losses = cur
        self._lr_is_high = not self._lr_is_high
        self._set_lr(self._lr_high if self._lr_is_high else self._lr_low)
        self._dropped_idx = []                # clib.py:162

        if (len(self._high_hist) == len(self._low_hist)
                and len(self._high_hist) >= min_iter):
            _, p = ttest_ind(self._low_hist, self._high_hist,
                             equal_var=False, alternative="greater")
            step = cfg.lr_step
            if p < significance:      # low LR decreased loss more
                self._lr_high = self._lr_low
                self._lr_low *= step
            elif p > 1 - significance:  # high LR wins
                self._lr_low = self._lr_high
                self._lr_high /= step
            else:
                return
            self._high_hist, self._low_hist = [], []
            # clib.py:169-195: re-centering toggles the phase again
            self._lr_is_high = not self._lr_is_high
            self._set_lr(self._lr_high if self._lr_is_high
                         else self._lr_low)
