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
from ..models import clip as clip_fns
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
    copl_n_tasks = 10    # reference CoPLPrompt(768, 10, ...) hardcode
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
        # pure-DP meshes ride the unified shard_map road (VERDICT r4 #1):
        # stage-1 CE is per-sample decomposable, so batch rows run local
        # per shard and grads pmean over ICI; eval shards its rows the
        # same way. A model-axis mesh raises in resolve_dp_mesh (the
        # prompted proto tower has no einsum routing). Stage 2 and the
        # prototype/SDC feature sweeps are task-boundary work on small
        # feature batches — they run replicated under any mesh.
        self._dp_mesh = self.resolve_dp_mesh(cfg.batchsize)
        self._eval_dp_mesh = self.resolve_dp_mesh(cfg.test_batchsize)

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
        # CoPL pool task-slicing divisor: the reference hardcodes
        # CoPLPrompt(768, 10, [100, 8, 0]) (models/proto_clip.py:82) — the
        # pool is ALWAYS carved into 10 task slices regardless of the
        # run's n_tasks
        n_tasks = self.copl_n_tasks
        top_k, n_ctx = self.top_k, self.n_ctx
        # static class-suffix length for the prefix-shared text pass:
        # cover the longest tokenized class name, bucketed to 8
        lp = 1 + min(top_k, self.num_prompt) * n_ctx
        suffix_len = pc.choose_suffix_len(self.vocab.max_token_pos(), lp,
                                          self.clip_cfg.context_length)
        self.suffix_len = suffix_len

        # --remat / bs>=256: checkpoint the prompted image tower (the text
        # pass already remats internally — models/proto_clip.py:177,443)
        remat_img = cfg.remat or cfg.batchsize >= 256

        from ..parallel.mesh import DATA_AXIS
        from .engine import dp_batch_specs, dp_fold_rng, dp_shard_map
        dp_axis = DATA_AXIS if self._dp_mesh is not None else None

        def stage1_step(state: TrainState, batch, task_count):
            rng, aug_rng = jax.random.split(state.rng)
            aug_rng = dp_fold_rng(dp_axis, aug_rng)
            images = pipeline(aug_rng, batch["images"])

            def encode_img(proto, images):
                return pc.proto_encode_image(
                    state.frozen, proto, images, clip_cfg,
                    task_count=task_count, n_tasks=n_tasks, train=True,
                    compute_dtype=dt)

            img_fn = jax.checkpoint(encode_img) if remat_img else encode_img

            def objective(proto):
                img = img_fn(proto, images)
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
            if dp_axis is not None:
                # per-shard means over equal shards -> pmean == the
                # global batch mean (the DP all-reduce)
                loss, acc, grads = jax.lax.pmean((loss, acc, grads),
                                                 dp_axis)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.trainable)
            trainable = optax.apply_updates(state.trainable, updates)
            return state.replace(step=state.step + 1, trainable=trainable,
                                 opt_state=opt_state, rng=rng), \
                {"loss": loss, "acc": acc}

        if self._dp_mesh is not None:
            # task_count must stay STATIC (it drives pool slicing) while
            # shard_map sees only array operands: build one wrapped step
            # per task_count, served from a host-level cache (same
            # recompile cadence as the static_argnums path below)
            import functools
            from jax.sharding import PartitionSpec as P

            @functools.lru_cache(maxsize=None)
            def _stage1_for(task_count: int):
                return jax.jit(dp_shard_map(
                    functools.partial(stage1_step, task_count=task_count),
                    self._dp_mesh,
                    in_specs=(P(), dp_batch_specs(
                        ("images", "labels", "tokens", "mask"))),
                    out_specs=(P(), P())))

            def _stage1(state, batch, task_count):
                return _stage1_for(int(task_count))(state, batch)

            self._stage1_step = _stage1
        else:
            self._stage1_step = jax.jit(stage1_step, static_argnums=(2,))

        def eval_preprocess(images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            x = preprocess.resize_bilinear(x, clip_cfg.image_size)
            return preprocess.normalize(x, self.train_dataset.mean,
                                        self.train_dataset.std)

        @jax.jit
        def extract_plain(frozen, images_u8):
            # prototype/SDC features run the PLAIN tower (no CoPL
            # prompts), L2-normalized — the reference extracts them via
            # AdapterCLIP.encode_image (models/adapter_clip.py:76-79)
            # through Trainer.extract_vector, NOT the prompted forward
            x = eval_preprocess(images_u8)
            f = clip_fns.encode_image(frozen, x.astype(dt), clip_cfg,
                                      compute_dtype=dt)
            return clip_fns.normalize(f)

        self._extract_plain = extract_plain

        # task_count is STATIC (recompiles once per task, served from the
        # compile cache): eval after task N must use pool slices 0..N like
        # the reference (zoo.py:95-110 eval branch K[0:f]) — a fixed 0
        # froze eval to the first task's slice
        import functools
        from jax.sharding import PartitionSpec as P

        def _jit_eval(body, static_pos, in_specs, out_specs):
            """Per-task_count eval builder: plain jit+static without a
            mesh; under the pure-DP road one dp_shard_map-wrapped program
            per task_count (images/outputs row-sharded, rest replicated),
            served from a host cache at the same recompile cadence."""
            if self._eval_dp_mesh is None:
                return jax.jit(body, static_argnums=(static_pos,))

            @functools.lru_cache(maxsize=None)
            def _for(tc: int):
                return jax.jit(dp_shard_map(
                    functools.partial(body, task_count=tc),
                    self._eval_dp_mesh, in_specs=in_specs,
                    out_specs=out_specs))

            def dispatch(*args):
                return _for(int(args[static_pos]))(*args[:static_pos])

            return dispatch

        def eval_logits(frozen, proto, images_u8, tokens, mask,
                        task_count):
            x = eval_preprocess(images_u8)
            img = pc.proto_encode_image(
                frozen, proto, x.astype(dt), clip_cfg,
                task_count=task_count, n_tasks=n_tasks, train=False,
                compute_dtype=dt)
            txt, _ = pc.proto_text_features(frozen, proto, img, tokens,
                                            clip_cfg, top_k=top_k,
                                            n_ctx=n_ctx,
                                            suffix_len=suffix_len,
                                            compute_dtype=dt)
            logits = pc.proto_logits(frozen, img, txt) + mask[None, :]
            return jnp.argmax(logits, axis=-1), logits

        self._eval_fn = _jit_eval(
            eval_logits, 5,
            in_specs=(P(), P(), P(DATA_AXIS), P(), P()),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)))

        # eval text cache: per-(sample, class) text features depend on the
        # image only through the ordered top-k prompt selection — at the
        # reference's (P=10, k=2) that is 90 distinct ctx splices. One
        # batched pass per eval sweep builds all (n_comb, C, E) features;
        # per-batch eval then costs the image pass + a row gather instead
        # of the full B·C pair-text pass (r3: proto eval 87.2 ms/batch vs
        # 21.7 for lora — VERDICT r4 item 4)
        combos, lookup = pc.prompt_combinations(self.num_prompt, top_k)
        self._comb_ok = combos is not None
        if self._comb_ok:
            num_prompt = self.num_prompt

            @jax.jit
            def comb_text_table(frozen, proto, tokens):
                d = proto["text_prompt"].shape[-1]
                ctx = proto["text_prompt"][combos].reshape(
                    len(combos), -1, d)
                return pc.text_features_for_ctx(
                    frozen, ctx, tokens, clip_cfg, suffix_len=suffix_len,
                    compute_dtype=dt)

            def eval_logits_cached(frozen, proto, images_u8, txt_comb,
                                   mask, lookup_tbl, task_count):
                x = eval_preprocess(images_u8)
                img = pc.proto_encode_image(
                    frozen, proto, x.astype(dt), clip_cfg,
                    task_count=task_count, n_tasks=n_tasks, train=False,
                    compute_dtype=dt)
                prob = jnp.einsum(
                    "be,pe->bp", img.astype(jnp.float32),
                    proto["text_key"].astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
                _, idx = jax.lax.top_k(prob,
                                       min(top_k, prob.shape[1]))
                cid = lookup_tbl[pc.fold_selection(idx, num_prompt)]
                txt = txt_comb[cid]                       # (B, C, E)
                logits = pc.proto_logits(frozen, img, txt) + mask[None, :]
                return jnp.argmax(logits, axis=-1), logits

            self._comb_text_fn = comb_text_table
            self._eval_cached_fn = _jit_eval(
                eval_logits_cached, 6,
                in_specs=(P(), P(), P(DATA_AXIS), P(), P(), P()),
                out_specs=(P(DATA_AXIS), P(DATA_AXIS)))
            self._comb_lookup = jnp.asarray(lookup)
        self._txt_comb = None

    # -- task boundary: opt reset + pre-task embeddings + pool GS -------------
    def online_before_task(self, task_id):
        """Reference ``online_before_task`` order (Trainer_ProtoCLIP.py:
        57-91): freeze policy + ``reset_opt``, ``compute_old_embedding``
        (extract the INCOMING task's samples with the pre-task model so
        drift pairs the same images across old/new), THEN the CoPL
        task-count advance + Gram-Schmidt re-init (``process_task_count``,
        zoo.py:58-79). GS runs here — after the previous task's eval —
        not at task end: the re-orthogonalized pools are first seen by the
        new task's steps."""
        if task_id > 0:
            self.state = self.state.replace(
                opt_state=self.tx.init(self.state.trainable))
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
        if task_id > 0:
            self.task_count += 1
            copl = {k: pc.gram_schmidt(np.asarray(v))
                    for k, v in self.state.trainable["copl"].items()}
            trainable = dict(self.state.trainable,
                             copl={k: jnp.asarray(v)
                                   for k, v in copl.items()})
            self.state = self.state.replace(trainable=trainable)

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

        # per-class mean + covariance, computed ONCE when a class first
        # gets a prototype and never rebuilt (reference _compute_class_mean
        # :308-358 runs only over the incoming range(known, total) window;
        # later tasks only drift-shift the means). The sample set is ALL
        # train-split samples of the class under the eval transform
        # (get_dataset_by_indices source='train' mode='test'); cov is f64
        # + 1e-3·I (reference :345). The reference's per-class DataLoader
        # at ~30 s/class becomes a batched sweep.
        targets = np.asarray(self.train_dataset.targets)
        for c in self._prototype_classes(task_id):
            slot = self.vocab.remap([c])[0]
            if self._have_proto[slot]:
                continue
            cls_idx = np.nonzero(targets == int(c))[0]
            if len(cls_idx) == 0:
                continue
            f = self._batched_features(cls_idx).astype(np.float64)
            self._class_means[slot] = f.mean(axis=0)
            cov = np.cov(f.T) if len(f) > 1 else np.eye(f.shape[1])
            self._class_covs[slot] = cov + 1e-3 * np.eye(f.shape[1])
            self._have_proto[slot] = True

        self._old_feats = None
        # stage-2 runs from the second task on, gated on --ca
        # (reference stage1_and_stage2():284-286)
        if task_id > 0 and self.ca_epochs > 0 and self.ca:
            self._stage2(task_id)
        self._task_samples = []

    # -- checkpoint plumbing: prototypes/covariances, the CoPL pool task
    # counter, and the running task-sample list live OUTSIDE TrainState —
    # without this a resumed run runs stage 2 / eval over ZEROED
    # prototypes and slices the wrong pool window (VERDICT r4 §5.4) -------
    def checkpoint_extra(self):
        extra = super().checkpoint_extra()
        extra["proto"] = {
            "task_count": self.task_count,
            "class_means": np.asarray(self._class_means),
            "class_covs": np.asarray(self._class_covs),
            "have_proto": np.asarray(self._have_proto),
            "task_samples": list(self._task_samples),
        }
        return extra

    def restore_extra(self, extra):
        super().restore_extra(extra)
        st = (extra or {}).get("proto")
        if not st:
            return
        self.task_count = int(st["task_count"])
        self._class_means = np.asarray(st["class_means"], np.float64)
        self._class_covs = np.asarray(st["class_covs"], np.float64)
        self._have_proto = np.asarray(st["have_proto"], bool)
        self._task_samples = list(st["task_samples"])

    def _prototype_classes(self, task_id):
        """Classes whose prototypes are built at this task's end: every
        exposed class that does not have one yet. (The reference's window
        is ``range(_known_classes, _total_classes)`` — RAW class ids
        advanced by per-task disjoint counts, which assumes classes enter
        in id order and skips blurry-only classes; here the sane
        exposure-driven equivalent builds each class's prototype at the
        end of the task that first exposes it.)"""
        return list(self.vocab.exposed)

    def _batched_features(self, idx: np.ndarray) -> np.ndarray:
        bs = self.cfg.batchsize
        out = np.zeros((len(idx), self.clip_cfg.embed_dim), np.float32)
        for lo in range(0, len(idx), bs):
            chunk = idx[lo:lo + bs]
            imgs, _ = self.train_dataset.gather(chunk)
            n = len(chunk)
            if n < bs:
                imgs = np.concatenate([imgs, imgs[:bs - n]])[:bs]
            f = np.asarray(self._extract_plain(self.state.frozen,
                                               jnp.asarray(imgs)),
                           np.float32)
            out[lo:lo + n] = f[:n]
        return out

    def _stage2(self, task_id):
        """MVN-sample features per seen class, retrain the text pools."""
        slots = np.nonzero(self._have_proto)[0]
        if len(slots) == 0:
            return
        rng = np.random.default_rng(self.cfg.seed + self.task_count)
        task_size = self._stage2_task_size(task_id)

        # reference stage-2: SGD(momentum=0.9, weight_decay=self.wd=0)
        # (Trainer_ProtoCLIP.py:476-479) under CosineAnnealingLR with
        # T_max=ca_epochs stepped once PER EPOCH (:481, :564) — lr is
        # constant within an epoch, cosine-decayed between epochs
        nb_per_epoch = max(len(slots) * self.num_sampled_pcls // 16, 1)

        def epoch_cosine(step):
            e = jnp.minimum(step // nb_per_epoch, self.ca_epochs)
            return self.stage2_lr * 0.5 * (
                1.0 + jnp.cos(jnp.pi * e / self.ca_epochs))

        tx = optax.sgd(learning_rate=epoch_cosine, momentum=0.9)
        opt_state = tx.init(self.state.trainable)
        trainable = self.state.trainable
        tokens = jnp.asarray(self.vocab.token_table)
        # stage-2 CE runs over exactly the prototype'd classes (the
        # reference's table is all_classnames[:_total_classes] and it
        # slices logits[:, :crct_num], :546-556) — mask everything else
        mask = jnp.asarray(np.where(self._have_proto, 0.0,
                                    -np.inf).astype(np.float32))

        import functools

        # frozen is an ARGUMENT, not a capture: baking the tower into the
        # HLO as constants explodes compile time (the EWC++ lesson)
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def stage2_jit(trainable, opt_state, frozen, feats, labels):
            def objective(proto):
                img = feats / (jnp.linalg.norm(feats, axis=-1,
                                               keepdims=True) + 1e-8)
                img = img.astype(self.compute_dtype)
                txt, _ = pc.proto_text_features(
                    frozen, proto, img, tokens, self.clip_cfg,
                    top_k=self.top_k, n_ctx=self.n_ctx,
                    suffix_len=self.suffix_len,
                    compute_dtype=self.compute_dtype)
                logits = pc.proto_logits(frozen, img, txt)
                logits = logits + mask[None, :]
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()

            loss, grads = jax.value_and_grad(objective)(trainable)
            updates, new_opt = tx.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), new_opt, loss

        sample_batch = 16
        for epoch in range(self.ca_epochs):
            feats, labels = self._stage2_sample_epoch(slots, task_size,
                                                      rng)
            total = 0.0
            nb = len(labels) // sample_batch
            for i in range(nb):
                sl = slice(i * sample_batch, (i + 1) * sample_batch)
                trainable, opt_state, loss = stage2_jit(
                    trainable, opt_state, self.state.frozen,
                    jnp.asarray(feats[sl]),
                    jnp.asarray(labels[sl], jnp.int32))
                total += float(loss)
            log.info("stage2 epoch %d | loss %.4f", epoch,
                     total / max(nb, 1))
        self.state = self.state.replace(trainable=trainable)

    def _stage2_task_size(self, task_id) -> int:
        """Decay-grouping width for stage 2. The reference passes
        ``train_sampler.disjoint_class_num[task_id]`` (:286) — which its
        sampler computes as the QUIRKY ``n_classes/n_tasks`` reshape of
        ALL class names (online_sampler.py:62-63), not the true disjoint
        count; here the sane true count is used (the parity harness
        overrides to the reference's value)."""
        return max(len(self.stream.disjoint_classes[task_id]), 1)

    def _stage2_sample_epoch(self, slots, task_size, rng):
        """One epoch's shuffled MVN feature draws (reference :507-524:
        sample num_sampled_pcls per class from MVN(mean*(0.9+decay), cov),
        concat, randperm-shuffle)."""
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
        return feats[perm], labels[perm]

    # -- eval -----------------------------------------------------------------
    def prepare_eval(self):
        self._mask = jnp.asarray(self.vocab.logit_mask())
        self._tokens = jnp.asarray(self.vocab.token_table)
        if self._comb_ok:
            # trainable/class set are frozen for the whole sweep: one
            # combination-table pass amortizes over every eval batch
            self._txt_comb = self._comb_text_fn(
                self.state.frozen, self.state.trainable, self._tokens)

    def predict(self, images):
        if self._txt_comb is not None:
            preds, _ = self._eval_cached_fn(
                self.state.frozen, self.state.trainable,
                jnp.asarray(images), self._txt_comb, self._mask,
                self._comb_lookup, self.task_count)
            return preds
        preds, _ = self._eval_fn(self.state.frozen, self.state.trainable,
                                 jnp.asarray(images), self._tokens,
                                 self._mask, self.task_count)
        return preds


def _is_pd(cov: np.ndarray) -> bool:
    try:
        np.linalg.cholesky(cov)
        return True
    except np.linalg.LinAlgError:
        return False
