"""Host-side orchestration of the online CL lifecycle.

The analogue of the reference's ``_Trainer`` (``methods/_trainer.py:249-653``)
— seeding, stream/dataset setup, the task × batch loop, periodic online
evaluation, metric artifacts — but with the per-step work compiled into the
jitted engine (methods/engine.py). Host code only moves indices, builds
padded class tables, and logs.

Method hook contract preserved from the reference (``_trainer.py:418-428``):
``online_before_task`` / ``online_step`` / ``online_after_task`` /
``online_evaluate``.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig, resolve_clip_preset
from ..data.registry import ArrayDataset, get_dataset
from ..parallel import mesh as mesh_lib
from ..utils.class_vocab import ClassVocabulary
from ..utils.memory import ReplayMemory
from ..utils.metrics import OnlineMetrics, per_class_counts
from ..utils.stream import (exposed_test_indices, iter_batches,
                            si_blurry_stream, stream_class_histogram)

log = logging.getLogger("lifelong_clip_tpu")


class OnlineTrainer:
    """Base online continual-learning trainer."""

    def __init__(self, cfg: TrainConfig,
                 train_dataset: Optional[ArrayDataset] = None,
                 test_dataset: Optional[ArrayDataset] = None,
                 synthetic_fallback: bool = False):
        self.cfg = cfg
        self.rng = jax.random.PRNGKey(cfg.seed)

        self.train_dataset = train_dataset or get_dataset(
            cfg.dataset, cfg.data_dir, train=True,
            synthetic_fallback=synthetic_fallback)
        self.test_dataset = test_dataset or get_dataset(
            cfg.dataset, cfg.data_dir, train=False,
            synthetic_fallback=synthetic_fallback)
        self.n_classes = self.train_dataset.n_classes

        self.stream = si_blurry_stream(
            self.train_dataset.targets, self.n_classes,
            cfg.stream.n_tasks, cfg.stream.n, cfg.stream.m,
            cfg.stream.seed, cfg.stream.rnd_NM)

        max_classes = cfg.max_classes or self.n_classes
        self.vocab = ClassVocabulary(self.train_dataset.class_names,
                                     max_classes=max_classes,
                                     template=cfg.text_template)
        self.memory = ReplayMemory(cfg.memory_size, seed=cfg.seed)
        self.metrics = OnlineMetrics(self.n_classes)
        self.mesh = mesh_lib.make_mesh(cfg.mesh_shape) \
            if np.prod(cfg.mesh_shape) > 1 else None

        self.clip_cfg = resolve_clip_preset(cfg.model_name)
        self._setup_run_logger()
        hist = stream_class_histogram(self.stream,
                                      self.train_dataset.targets)
        log.info("stream data config: %s",
                 [f"task{t}: {int((h > 0).sum())} classes / {int(h.sum())} "
                  f"samples" for t, h in enumerate(hist)])
        np.save(os.path.join(self.result_dir(), "train_data_config.npy"),
                hist)
        self.samples_seen = 0
        self._next_eval = cfg.eval_period
        self.eval_records = {"acc": [], "time": [], "step": []}
        self._start = time.time()
        self.setup_model()

    def _setup_run_logger(self):
        """Per-run ``log.txt`` in the run dir — the reference's artifact
        schema includes it (``methods/_trainer.py:486-503``, rank-0
        ``setup_root_logger``). The handler attaches to the PACKAGE
        logger, not root: an embedding application's root config (level,
        handlers) stays untouched, and everything this framework logs
        flows through the package logger anyway. One handler per process
        (tests build many trainers; accumulating handlers would duplicate
        lines); ``run()`` detaches it when the run finishes."""
        pkg = logging.getLogger("lifelong_clip_tpu")
        self._teardown_run_logger()
        fh = logging.FileHandler(
            os.path.join(self.result_dir(), "log.txt"))
        fh.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        fh.setLevel(logging.INFO)
        fh._llc_run_log = True
        fh._llc_prev_level = None
        if pkg.getEffectiveLevel() > logging.INFO:
            # library use without basicConfig: the file handler must
            # still see INFO records (scoped to the package logger).
            # Remember the level we clobbered so teardown restores the
            # embedding application's verbosity (ADVICE r4 #2).
            fh._llc_prev_level = pkg.level
            pkg.setLevel(logging.INFO)
        pkg.addHandler(fh)

    @staticmethod
    def _teardown_run_logger():
        pkg = logging.getLogger("lifelong_clip_tpu")
        for h in list(pkg.handlers):
            if getattr(h, "_llc_run_log", False):
                pkg.removeHandler(h)
                if getattr(h, "_llc_prev_level", None) is not None:
                    pkg.setLevel(h._llc_prev_level)
                h.close()

    # -- to be provided by method subclasses ---------------------------------
    def setup_model(self):
        raise NotImplementedError

    def online_step(self, images: np.ndarray, labels: np.ndarray,
                    indices: np.ndarray):
        raise NotImplementedError

    def online_before_task(self, task_id: int):
        pass

    def online_after_task(self, task_id: int):
        pass

    # -- main loop ------------------------------------------------------------
    def run(self, resume_from: Optional[str] = None):
        cfg = self.cfg
        from ..utils.observability import StepTimer, profile_trace
        self.step_timer = StepTimer()

        start_task, start_batch = 0, 0
        if resume_from:
            from ..utils.checkpoints import restore_trainer
            cursor = restore_trainer(self, resume_from)
            start_task = cursor.get("task_id", 0)
            start_batch = cursor.get("batch", 0)
            self.samples_seen = cursor.get("samples_seen", 0)
            self._next_eval = cursor.get("next_eval", cfg.eval_period)
            log.info("resumed from %s at task %d batch %d", resume_from,
                     start_task, start_batch)

        profile_dir = (os.path.join(self.result_dir(), "profile")
                       if cfg.profile else None)
        with profile_trace(profile_dir, enabled=cfg.profile):
            for task_id in range(start_task, self.stream.n_tasks):
                log.info("### task %d / %d ###", task_id + 1,
                         self.stream.n_tasks)
                self.online_before_task(task_id)
                task_indices = self.stream.task_indices[task_id]
                if cfg.debug:
                    task_indices = task_indices[:500]
                # reference runs epochNum passes per task
                # (_trainer.py:336); the online default here is one pass
                for epoch in range(max(int(cfg.epoch_num), 1)):
                    # host-side gather of batch N+1 — and, when no replay
                    # concat will touch the images on host, their device
                    # upload too — overlaps the device step for batch N
                    from ..data.prefetch import BatchPrefetcher
                    pf = BatchPrefetcher(
                        iter_batches(task_indices, cfg.batchsize),
                        self.train_dataset.gather,
                        place=self._prefetch_place(), depth=2)
                    for bi, (batch_idx, images, labels) in enumerate(pf):
                        if (task_id == start_task and epoch == 0
                                and bi < start_batch):
                            continue
                        self.vocab.expose(labels)
                        with self.step_timer.tick():
                            stats = self.online_step(images, labels,
                                                     batch_idx)
                        self.samples_seen += len(batch_idx)
                        if stats:
                            self._report_train(stats)
                        if self.samples_seen >= self._next_eval:
                            self._periodic_eval()
                            self._next_eval += cfg.eval_period
                self.online_after_task(task_id)
                self._task_end_eval(task_id)
                self._maybe_checkpoint(task_id)
        try:
            return self.save_result()
        finally:
            # stop appending process-wide records to a finished run's
            # log.txt (a next trainer would otherwise re-point it anyway)
            self._teardown_run_logger()

    def _maybe_checkpoint(self, task_id: int):
        ckpt_dir = getattr(self.cfg, "ckpt_dir", "") or \
            os.environ.get("LLC_CKPT_DIR", "")
        if not ckpt_dir:
            return
        from ..utils.checkpoints import save_checkpoint
        save_checkpoint(
            ckpt_dir, state=getattr(self, "state", {}), memory=self.memory,
            vocab=self.vocab, metrics=self.metrics,
            cursor={"task_id": task_id + 1, "batch": 0,
                    "samples_seen": self.samples_seen,
                    "next_eval": self._next_eval},
            extra=self.checkpoint_extra())
        log.info("checkpoint saved to %s (post-task %d)", ckpt_dir,
                 task_id + 1)

    def checkpoint_extra(self):
        """Hook: method-specific host state to persist alongside the
        TrainState (e.g. CLIB's adaptive-LR machine). Must be picklable."""
        return {}

    def restore_extra(self, extra):
        """Hook: restore what ``checkpoint_extra`` saved."""

    # -- evaluation -----------------------------------------------------------
    def evaluate(self):
        """Full eval over test samples of exposed classes; returns
        (correct, total) per-class arrays (global class ids)."""
        idx = exposed_test_indices(self.test_dataset.targets,
                                       self.vocab.exposed)
        correct = np.zeros((self.n_classes,), np.int64)
        total = np.zeros((self.n_classes,), np.int64)
        if len(idx) == 0:
            return correct, total
        bs = self.cfg.test_batchsize
        self.prepare_eval()
        all_labels, all_preds = [], []
        exposed = np.asarray(self.vocab.exposed)

        # fully pipelined sweep: predict() returns un-fetched device
        # arrays, so the host races ahead gathering + dispatching every
        # batch; predictions come back in fixed-size stacked groups so
        # the ~25 ms tunnel round trip is paid once per GROUP_N batches,
        # not once per batch (the group size is static so the stack op
        # compiles exactly once)
        import jax.numpy as jnp
        GROUP_N = 8

        def consume(group):
            if len(group) == GROUP_N:
                rows = np.asarray(jnp.stack([p for p, _, _ in group]))
            else:  # tail: per-batch fetches
                rows = [np.asarray(p) for p, _, _ in group]
            for (_, labels, n), row in zip(group, rows):
                preds_slot = row[:n]
                # slot ids -> global class ids
                preds = exposed[np.clip(preds_slot, 0, len(exposed) - 1)]
                c, t = per_class_counts(preds, labels, self.n_classes)
                correct[:] += c
                total[:] += t
                all_labels.append(labels)
                all_preds.append(preds)

        # one-GROUP lookahead: group k is fetched only after group k+1 is
        # fully dispatched, so the device keeps executing through the
        # fetch round trip
        groups, cur = [], []
        for lo in range(0, len(idx), bs):
            chunk = idx[lo:lo + bs]
            images, labels = self.test_dataset.gather(chunk)
            n = len(chunk)
            if n < bs:  # pad to the static batch shape (tile: n can be
                # smaller than bs - n, and predict() must always see bs
                # rows or the tail batch compiles a second program and
                # breaks the grouped stack)
                reps = -(-bs // n)
                images = np.concatenate([images] * reps, axis=0)[:bs]
            cur.append((self.predict(images), labels, n))
            if len(cur) == GROUP_N:
                groups.append(cur)
                cur = []
                if len(groups) == 2:
                    consume(groups.pop(0))
        for g in groups:
            consume(g)
        if cur:
            consume(cur)
        # kept for the seed_k_confusion_matrix.npy artifact (the reference
        # saves the LAST eval's matrix, _trainer.py:363-365)
        from ..utils.metrics import confusion_matrix
        self._last_confusion = confusion_matrix(
            np.concatenate(all_labels), np.concatenate(all_preds))
        return correct, total

    def prepare_eval(self):
        """Hook: refresh cached text features etc. before an eval sweep."""

    def predict(self, images: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def _periodic_eval(self):
        correct, total = self.evaluate()
        acc = self.metrics.record_eval(self.samples_seen, correct, total)
        self.eval_records["acc"].append(acc)
        self.eval_records["time"].append(self.samples_seen)
        self.eval_records["step"].append(self.samples_seen)
        log.info("eval @ %d samples | acc %.4f | classes %d",
                 self.samples_seen, acc, len(self.vocab))

    def _task_end_eval(self, task_id: int):
        correct, total = self.evaluate()
        acc = self.metrics.record_task_end(correct, total)
        timing = getattr(self, "step_timer", None)
        t = timing.summary() if timing else {}
        log.info("task %d done | acc %.4f | elapsed %.1fs | "
                 "step p50 %.1fms p99 %.1fms", task_id + 1, acc,
                 time.time() - self._start, t.get("p50_ms", 0.0),
                 t.get("p99_ms", 0.0))

    def _report_train(self, stats):
        if self.samples_seen % (self.cfg.batchsize * 20) == 0:
            log.info("train | samples %d | loss %.4f | acc %.4f | "
                     "classes %d", self.samples_seen,
                     float(stats.get("loss", 0.0)),
                     float(stats.get("acc", 0.0)), len(self.vocab))

    # -- artifacts (schema-compatible with reference _trainer.py:359-401) ----
    def result_dir(self) -> str:
        cfg = self.cfg
        s = cfg.stream
        d = os.path.join(cfg.log_path, cfg.dataset,
                         f"TASK{s.n_tasks}N{s.n}M{s.m}",
                         cfg.note or cfg.method)
        os.makedirs(d, exist_ok=True)
        return d

    def save_result(self):
        """Artifacts schema-compatible with reference save_result
        (_trainer.py:359-389): seed_k*.npy accuracy curves, the last eval's
        confusion matrix, and result.txt in the reference's exact text
        format. Machine-readable JSON lines go to result.jsonl."""
        out = self.metrics.summary()
        d = self.result_dir()
        seed = self.cfg.seed
        np.save(os.path.join(d, f"seed_{seed}.npy"),
                np.asarray(self.metrics.task_acc))
        np.save(os.path.join(d, f"seed_{seed}_eval.npy"),
                np.asarray(self.eval_records["acc"]))
        np.save(os.path.join(d, f"seed_{seed}_eval_time.npy"),
                np.asarray(self.eval_records["time"]))
        cm = getattr(self, "_last_confusion", None)
        if cm is not None:
            np.save(os.path.join(d, f"seed_{seed}_confusion_matrix.npy"), cm)
        task_acc = [float(a) for a in self.metrics.task_acc]
        cls_acc = [[float(x) for x in a] for a in self.metrics.task_cls_acc]
        with open(os.path.join(d, "result.txt"), "w") as f:
            f.write(f"Dataset:{self.cfg.dataset} | A_auc {out['A_auc']:.5f}"
                    f" | A_avg {out['A_avg']:.5f}"
                    f" | A_last {out['A_last']:.5f}"
                    f" | F_last {out['F_last']:.5f}\n")
            f.write(f"task_acc:{task_acc}\n")
            f.write(f"per_task_acc:{cls_acc}")
        with open(os.path.join(d, "result.jsonl"), "a") as f:
            f.write(json.dumps({"seed": seed, **out}) + "\n")
        log.info("result: %s", out)
        return out

    # -- misc helpers ----------------------------------------------------------
    def next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def resolve_dp_mesh(self, *batch_sizes, allow_model_axis=False):
        """Resolve the pure-DP shard_map road for this trainer — the ONE
        multi-chip mechanism every method family shares: the step runs
        inside ``shard_map`` over the data axis (batch rows local per
        shard, params replicated, grads ``pmean`` over ICI), which keeps
        the fused Pallas kernels legal on multi-chip (GSPMD cannot
        partition their opaque custom calls).

        Returns the mesh when it is pure-DP (model axis 1) and every
        given batch size divides the data axis; otherwise ``None`` with a
        one-time warning — the trainer then runs its plain jitted step
        with unsharded inputs (single-program semantics, never GSPMD
        through the kernels). Trainers WITHOUT their own model-axis
        einsum routing (everything except the adapter-clip family) must
        leave ``allow_model_axis=False`` so a model-axis mesh fails
        loudly instead of silently hitting unpartitionable kernels.

        Replaces the reference's method-agnostic DataParallel scaffold
        (``methods/_trainer.py:540-574``) uniformly across methods."""
        if self.mesh is None:
            return None
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
        if self.mesh.shape[MODEL_AXIS] > 1:
            if allow_model_axis:
                return None
            raise ValueError(
                f"method {self.cfg.method!r} supports pure data-parallel "
                f"meshes only (--mesh Nx1); got a model axis of "
                f"{self.mesh.shape[MODEL_AXIS]}")
        n = self.mesh.shape[DATA_AXIS]
        bad = sorted({int(b) for b in batch_sizes if b % n != 0})
        if bad:
            if not getattr(self, "_warned_mesh_skip", False):
                log.warning(
                    "batch size(s) %s do not divide the %d-way data axis; "
                    "method %r runs WITHOUT the mesh (single-program "
                    "step) — pick sizes divisible by the data axis",
                    bad, n, self.cfg.method)
                self._warned_mesh_skip = True
            return None
        return self.mesh

    def _prefetch_place(self):
        """Device-upload hook for the batch prefetcher.

        With no replay memory the step consumes the stream images as-is,
        so the prefetch thread can ``device_put`` them (sharded over the
        data axis when a mesh is active) and the host→HBM upload overlaps
        the previous step's device work. Replay-concat trainers
        (memory_size > 0) assemble the step batch with np.concatenate on
        host, so they keep images host-side (the identity)."""
        if self.cfg.memory_size > 0:
            return lambda x: x
        mesh = getattr(self, "mesh", None)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import DATA_AXIS
            n = mesh.shape[DATA_AXIS]

            def put(x):
                spec = P(DATA_AXIS) if x.shape[0] % n == 0 else P()
                return jax.device_put(x, NamedSharding(mesh, spec))

            return put
        return jax.device_put


def pad_batch(images, labels, batch_size: int):
    """Pad a short tail batch to the static step shape; returns valid count.

    ``images`` may already live on device (prefetcher upload) — padding
    then stays on device instead of pulling the batch back to host."""
    n = len(labels)
    if n == batch_size:
        return images, labels, n
    reps = -(-batch_size // n)
    cat = jnp.concatenate if isinstance(images, jax.Array) \
        else np.concatenate
    images = cat([images] * reps, axis=0)[:batch_size]
    labels = np.concatenate([labels] * reps, axis=0)[:batch_size]
    return images, labels, n


class _MeshMixin:
    """Mesh placement helpers for engine-based trainers.

    With ``--mesh NxM`` the batch shards over the data axis (DP: gradient
    all-reduce becomes a compiler-inserted psum over ICI, replacing the
    reference's NCCL scaffolding, SURVEY §2.6/2.7). A model axis M>1
    additionally shards the frozen tower's qkv/MLP weights (TP) and — for
    the MoE method — the expert leaves of the trainable tree (EP), per
    parallel/mesh.py's partition rules; opt-state moments inherit the
    trainable shardings via a fresh ``tx.init``.
    """

    def place_state(self, state, tx=None, peft_method: str = ""):
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import MODEL_AXIS, shard_params
        if self.mesh.shape[MODEL_AXIS] > 1:
            frozen = shard_params(state.frozen, self.mesh,
                                  tensor_parallel=True)
            trainable = shard_params(state.trainable, self.mesh,
                                     expert_parallel=peft_method == "moe")
            opt_state = tx.init(trainable) if tx is not None \
                else jax.tree.map(
                    lambda a: jax.device_put(
                        a, NamedSharding(self.mesh, P())), state.opt_state)
            state = state.replace(frozen=frozen, trainable=trainable,
                                  opt_state=opt_state)
            # remaining leaves (rng, step, ...) get explicit replicated
            # placements too — same discipline as the replicated branch
            placed = {"frozen", "trainable", "opt_state"}
            rest = {f: jax.tree.map(
                        lambda a: jax.device_put(
                            a, NamedSharding(self.mesh, P())),
                        getattr(state, f))
                    for f in state.__dataclass_fields__
                    if f not in placed}
            return state.replace(**rest)
        return jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(self.mesh, P())),
            state)

    def place_batch(self, batch):
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS
        n = self.mesh.shape[DATA_AXIS]

        def put(k, v):
            if k in ("images", "labels"):
                if v.shape[0] % n == 0:
                    return jax.device_put(v, NamedSharding(self.mesh,
                                                           P(DATA_AXIS)))
                if not getattr(self, "_warned_replicated_batch", False):
                    # correct but a silent n× perf cliff — say so once
                    log.warning(
                        "batch dim %d does not divide the %d-way data "
                        "axis; replicating the batch on every device "
                        "(pick a batchsize divisible by the mesh)",
                        v.shape[0], n)
                    self._warned_replicated_batch = True
            return jax.device_put(v, NamedSharding(self.mesh, P()))

        return {k: put(k, jnp.asarray(v)) for k, v in batch.items()}
