"""ProtoCLIP trainer — two-stage prototype/prompt online learning.

Parity target: reference ``methods/Trainer_ProtoCLIP.py``:
  * stage 1 (online): CE over per-(sample, class) prompt-pool logits on
    batch-visible classes (``online_train():104-177``; key loss is
    commented out in the reference);
  * task end: feature extraction over the task's samples, per-class mean +
    covariance prototypes (``_compute_class_mean():308-358`` — the
    reference's per-class DataLoader at ~30 s/class becomes one batched
    sweep + segment reductions), semantic-drift displacement of old
    prototypes (``displacement():441-450``), CoPL pool task-count advance
    with Gram-Schmidt re-init (``zoo.py:207-263``);
  * stage 2: per-class MultivariateNormal sampling and SGD+cosine
    retraining of text_key/text_prompt on feature-level forwards
    (``_stage2_compact_classifier():452-566``).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import PEFTConfig
from ..models import build_clip
from ..models import proto_clip as pc
from ..models.init import param_count
from ..ops import preprocess
from ..utils.class_vocab import ClassVocabulary
from ..utils.train_utils import make_optimizer
from .base import OnlineTrainer, pad_batch
from .engine import TrainState

log = logging.getLogger("lifelong_clip_tpu")


def displacement(Y1: np.ndarray, Y2: np.ndarray, embedding_old: np.ndarray,
                 sigma: float) -> np.ndarray:
    """Semantic-drift displacement field — faithful port of the reference's
    ``Trainer_ProtoCLIP.displacement()`` (``Trainer_ProtoCLIP.py:441-450``).

    ``Y1``/``Y2`` are the SAME samples embedded by the pre-task and
    post-task model respectively (n, e); ``embedding_old`` holds the old
    class prototypes (C, e). Each prototype moves by the Gaussian-kernel
    weighted mean of the per-sample drifts ``Y2 - Y1`` — weights from the
    squared distance between ``Y1`` and the prototype, with the reference's
    ``+1e-5`` floor before row-normalization.
    """
    Y1 = np.asarray(Y1, np.float64)
    Y2 = np.asarray(Y2, np.float64)
    embedding_old = np.asarray(embedding_old, np.float64)
    DY = Y2 - Y1                                                  # (n, e)
    distance = ((Y1[None, :, :] - embedding_old[:, None, :]) ** 2
                ).sum(axis=2)                                     # (C, n)
    W = np.exp(-distance / (2 * sigma ** 2)) + 1e-5
    W_norm = W / W.sum(axis=1, keepdims=True)
    return W_norm @ DY                                            # (C, e)


class Trainer_ProtoCLIP(OnlineTrainer):

    num_prompt = 10
    n_ctx = 12
    top_k = 2
    num_sampled_pcls = 64
    ca_epochs = 5
    stage2_lr = 5e-3
    sigma_drift = 4.0
    # reference --ca/--ssca gates (config.py:31-33): ca enables the
    # stage-2 compact classifier, ssca enables semantic drift compensation
    ca = True
    ssca = True

    def setup_model(self):
        cfg = self.cfg
        self.params, self.clip_cfg = build_clip(
            cfg.model_name, cfg.pretrained_path, rng=self.next_rng())
        self.peft_cfg = PEFTConfig(method="proto")
        self.compute_dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
        prefix = " ".join(["x"] * self.n_ctx * self.top_k)
        self.vocab = ClassVocabulary(
            self.train_dataset.class_names,
            max_classes=cfg.max_classes or self.n_classes,
            template=prefix + " {}.")
        self.proto = pc.init_proto_params(
            self.next_rng(), self.clip_cfg, num_prompt=self.num_prompt,
            n_ctx=self.n_ctx)
        self.tx = make_optimizer(cfg.opt_name, cfg.lr,
                                 sched_name=cfg.sched_name)
        self.state = TrainState.create(trainable=self.proto,
                                       frozen=self.params, tx=self.tx,
                                       rng=self.next_rng())
        log.info("ProtoCLIP trainable params: %d", param_count(self.proto))
        self.step_capacity = min(self.vocab.max_classes, cfg.batchsize)
        self.task_count = 0

        # prototype storage
        e = self.clip_cfg.embed_dim
        self._class_means = np.zeros((self.vocab.max_classes, e),
                                     np.float64)
        self._class_covs = np.zeros((self.vocab.max_classes, e, e),
                                    np.float64)
        self._have_proto = np.zeros((self.vocab.max_classes,), bool)
        self._task_samples: list = []
        self._old_feats = None

        pipeline = preprocess.make_train_pipeline(
            self.clip_cfg.image_size, self.train_dataset.mean,
            self.train_dataset.std,
            use_autoaug="autoaug" in cfg.transforms,
            out_dtype=self.compute_dtype)
        clip_cfg, dt = self.clip_cfg, self.compute_dtype
        n_tasks = cfg.stream.n_tasks
        top_k, n_ctx = self.top_k, self.n_ctx
        # static class-suffix length for the prefix-shared text pass:
        # cover the longest tokenized class name, bucketed to 8
        lp = 1 + min(top_k, self.num_prompt) * n_ctx
        suffix_len = pc.choose_suffix_len(self.vocab.max_token_pos(), lp,
                                          self.clip_cfg.context_length)
        self.suffix_len = suffix_len

        def stage1_step(state: TrainState, batch, task_count):
            rng, aug_rng = jax.random.split(state.rng)
            images = pipeline(aug_rng, batch["images"])

            def objective(proto):
                img = pc.proto_encode_image(
                    state.frozen, proto, images, clip_cfg,
                    task_count=task_count, n_tasks=n_tasks, train=True,
                    compute_dtype=dt)
                txt, _ = pc.proto_text_features(
                    state.frozen, proto, img, batch["tokens"], clip_cfg,
                    top_k=top_k, n_ctx=n_ctx, suffix_len=suffix_len,
                    compute_dtype=dt)
                logits = pc.proto_logits(state.frozen, img, txt)
                logits = logits + batch["mask"][None, :]
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch["labels"]).mean()
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

        self._stage1_step = jax.jit(stage1_step, static_argnums=(2,))

        @jax.jit
        def extract_features(frozen, proto, images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            x = preprocess.resize_bilinear(x, clip_cfg.image_size)
            x = preprocess.normalize(x, self.train_dataset.mean,
                                     self.train_dataset.std)
            return pc.proto_encode_image(
                frozen, proto, x.astype(dt), clip_cfg,
                task_count=0, n_tasks=n_tasks, train=False,
                compute_dtype=dt)

        self._extract = extract_features

        @jax.jit
        def eval_logits(frozen, proto, images_u8, tokens, mask):
            img = extract_features(frozen, proto, images_u8)
            txt, _ = pc.proto_text_features(frozen, proto, img, tokens,
                                            clip_cfg, top_k=top_k,
                                            n_ctx=n_ctx,
                                            suffix_len=suffix_len,
                                            compute_dtype=dt)
            logits = pc.proto_logits(frozen, img, txt) + mask[None, :]
            return jnp.argmax(logits, axis=-1), logits

        self._eval_fn = eval_logits

    # -- task boundary: pre-task old-model embeddings -------------------------
    def online_before_task(self, task_id):
        """Extract the INCOMING task's samples with the pre-task model
        (reference ``compute_old_embedding()``, Trainer_ProtoCLIP.py:259-266)
        so drift pairs the same images across the old/new model."""
        idx = np.asarray(self.stream.task_indices[task_id], np.int64)
        if self.cfg.debug:
            idx = idx[:500]
        self._sdc_idx = np.unique(idx)
        if self._have_proto.any():
            log.info("SDC: extracting %d samples with pre-task model",
                     len(self._sdc_idx))
            self._old_feats = self._batched_features(self._sdc_idx)
        else:
            self._old_feats = None

    # -- stage 1 ------------------------------------------------------------
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
            self.state, stats = self._stage1_step(self.state, batch,
                                                  self.task_count)
        self._task_samples.extend(int(i) for i in indices)
        return stats

    # -- task boundary: prototypes + drift + stage 2 --------------------------
    def online_after_task(self, task_id):
        idx = getattr(self, "_sdc_idx", None)
        if idx is None:
            idx = np.asarray(sorted(set(self._task_samples)), np.int64)
        if len(idx) == 0:
            return
        feats = self._batched_features(idx)
        labels = self.train_dataset.targets[idx]

        # semantic drift compensation: same samples under old vs new model
        # shift the OLD prototypes (reference stage1_and_stage2():267-280 +
        # displacement():441-450), applied before new prototypes are built;
        # gated on --ssca (reference :276)
        if self.ssca and self._old_feats is not None \
                and self._have_proto.any():
            slots = np.nonzero(self._have_proto)[0]
            gap = displacement(self._old_feats, feats,
                               self._class_means[slots], self.sigma_drift)
            self._class_means[slots] += gap

        # per-class mean + covariance (one batched sweep; reference loops
        # a DataLoader per class at ~30 s/class)
        for c in np.unique(labels):
            f = feats[labels == c].astype(np.float64)
            slot = self.vocab.remap([c])[0]
            self._class_means[slot] = f.mean(axis=0)
            cov = np.cov(f.T) if len(f) > 1 else np.eye(f.shape[1])
            self._class_covs[slot] = cov + 1e-4 * np.eye(f.shape[1])
            self._have_proto[slot] = True

        self._old_feats = None
        # stage-2 runs from the second task on, gated on --ca
        # (reference stage1_and_stage2():284-286)
        if task_id > 0 and self.ca_epochs > 0 and self.ca:
            self._stage2()
        self.task_count += 1
        # CoPL pool re-orthogonalization at the task switch
        copl = {k: pc.gram_schmidt(np.asarray(v))
                for k, v in self.state.trainable["copl"].items()}
        trainable = dict(self.state.trainable,
                         copl={k: jnp.asarray(v) for k, v in copl.items()})
        self.state = self.state.replace(trainable=trainable)
        self._task_samples = []

    def _batched_features(self, idx: np.ndarray) -> np.ndarray:
        bs = self.cfg.batchsize
        out = np.zeros((len(idx), self.clip_cfg.embed_dim), np.float32)
        for lo in range(0, len(idx), bs):
            chunk = idx[lo:lo + bs]
            imgs, _ = self.train_dataset.gather(chunk)
            n = len(chunk)
            if n < bs:
                imgs = np.concatenate([imgs, imgs[:bs - n]])[:bs]
            f = np.asarray(self._extract(self.state.frozen,
                                         self.state.trainable,
                                         jnp.asarray(imgs)),
                           np.float32)
            out[lo:lo + n] = f[:n]
        return out

    def _stage2(self):
        """MVN-sample features per seen class, retrain the text pools."""
        slots = np.nonzero(self._have_proto)[0]
        if len(slots) == 0:
            return
        rng = np.random.default_rng(self.cfg.seed + self.task_count)
        n_tasks = self.cfg.stream.n_tasks
        task_size = max(len(slots) // max(self.task_count + 1, 1), 1)

        # reference stage-2 uses SGD(momentum=0.9, weight_decay=self.wd=0)
        # (Trainer_ProtoCLIP.py:476-479) — distinct from the generic
        # select_optimizer sgd, which has no momentum
        tx = make_optimizer("sgd", self.stage2_lr, sched_name="cos",
                            momentum=0.9, weight_decay=0.0,
                            total_steps=self.ca_epochs * max(
                                len(slots) * self.num_sampled_pcls // 16, 1))
        opt_state = tx.init(self.state.trainable)
        trainable = self.state.trainable
        tokens = jnp.asarray(self.vocab.token_table)
        mask = jnp.asarray(self.vocab.logit_mask())

        import functools

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def stage2_jit(trainable, opt_state, feats, labels):
            def objective(proto):
                img = feats / (jnp.linalg.norm(feats, axis=-1,
                                               keepdims=True) + 1e-8)
                img = img.astype(self.compute_dtype)
                txt, _ = pc.proto_text_features(
                    self.state.frozen, proto, img, tokens, self.clip_cfg,
                    top_k=self.top_k, n_ctx=self.n_ctx,
                    suffix_len=self.suffix_len,
                    compute_dtype=self.compute_dtype)
                logits = pc.proto_logits(self.state.frozen, img, txt)
                logits = logits + mask[None, :]
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()

            loss, grads = jax.value_and_grad(objective)(trainable)
            updates, new_opt = tx.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), new_opt, loss

        sample_batch = 16
        for epoch in range(self.ca_epochs):
            feats_list, label_list = [], []
            for slot in slots:
                t_id = int(slot) // task_size
                decay = (t_id + 1) / (self.task_count + 1) * 0.1
                mean = self._class_means[slot] * (0.9 + decay)
                f = rng.multivariate_normal(
                    mean, self._class_covs[slot],
                    size=self.num_sampled_pcls,
                    method="cholesky" if _is_pd(self._class_covs[slot])
                    else "svd")
                feats_list.append(f.astype(np.float32))
                label_list.extend([int(slot)] * self.num_sampled_pcls)
            feats = np.concatenate(feats_list)
            labels = np.asarray(label_list, np.int64)
            perm = rng.permutation(len(labels))
            feats, labels = feats[perm], labels[perm]
            total = 0.0
            nb = len(labels) // sample_batch
            for i in range(nb):
                sl = slice(i * sample_batch, (i + 1) * sample_batch)
                trainable, opt_state, loss = stage2_jit(
                    trainable, opt_state, jnp.asarray(feats[sl]),
                    jnp.asarray(labels[sl], jnp.int32))
                total += float(loss)
            log.info("stage2 epoch %d | loss %.4f", epoch,
                     total / max(nb, 1))
        self.state = self.state.replace(trainable=trainable)

    # -- eval -----------------------------------------------------------------
    def prepare_eval(self):
        self._mask = jnp.asarray(self.vocab.logit_mask())
        self._tokens = jnp.asarray(self.vocab.token_table)

    def predict(self, images):
        preds, _ = self._eval_fn(self.state.frozen, self.state.trainable,
                                 jnp.asarray(images), self._tokens,
                                 self._mask)
        return preds


def _is_pd(cov: np.ndarray) -> bool:
    try:
        np.linalg.cholesky(cov)
        return True
    except np.linalg.LinAlgError:
        return False
