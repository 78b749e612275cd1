"""Experience Replay + naive Finetuning baselines.

Parity targets: reference ``methods/er_baseline.py`` (reservoir memory,
replay-batch concat, cutmix-augmented training) and
``methods/finetuning.py`` (no memory, plain online SGD). The reference's
classifier for these methods is a trainable vision model; here the
classifier is the CLIP vision tower + a linear head over ``max_classes``
logits — the head (and, for FT, the whole tower) sits in the trainable
pytree, so the same jitted engine serves all of them.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PEFTConfig
from ..models import build_clip
from ..models import clip as clip_fns
from ..models.init import param_count
from ..utils.train_utils import make_optimizer
from .base import OnlineTrainer, pad_batch
from .engine import TrainState, make_train_step, remat_fallback

log = logging.getLogger("lifelong_clip_tpu")

_P = jax.lax.Precision.HIGHEST


def head_features(params, images, *, clip_cfg, compute_dtype,
                  base_grads=False):
    """Tower half of the ER-family classifier: CLIP image features,
    unit-normalized, f32 — the exact tower->head boundary value."""
    img = clip_fns.encode_image(params, images, clip_cfg,
                                compute_dtype=compute_dtype,
                                base_grads=base_grads)
    return clip_fns.normalize(img).astype(jnp.float32)


def head_logits(trainable, img):
    """Head half: linear logits from the f32 boundary features."""
    return jnp.einsum("be,ec->bc", img, trainable["head"]["w"],
                      precision=_P) + trainable["head"]["b"]


def head_forward(frozen, trainable, images, tokens, *, clip_cfg,
                 compute_dtype):
    """Classifier forward: CLIP image features -> linear head logits.

    If the trainable tree carries a ``backbone`` (FT), the vision tower
    itself is trained; otherwise it stays frozen.
    """
    params = trainable.get("backbone") or frozen
    img = head_features(params, images, clip_cfg=clip_cfg,
                        compute_dtype=compute_dtype,
                        base_grads="backbone" in trainable)
    return head_logits(trainable, img), img, None


class ER(OnlineTrainer):
    """Experience replay with reservoir memory and cutmix."""

    train_backbone = False

    def _make_tx(self, cfg):
        """Optimizer hook — CLIB/RM override this with an
        ``optax.inject_hyperparams`` transform so ``_set_lr`` can mutate
        the live learning rate (adaptive LR / memory-epoch schedule)."""
        return make_optimizer(cfg.opt_name, cfg.lr,
                              sched_name=cfg.sched_name)

    def _set_lr(self, lr: float):
        """Mutate the injected learning rate in place (adam moments
        persist). Requires ``_make_tx`` to build an inject_hyperparams
        transform."""
        self.state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, jnp.float32)

    def setup_model(self):
        cfg = self.cfg
        self.params, self.clip_cfg = build_clip(
            cfg.model_name, cfg.pretrained_path, rng=self.next_rng())
        self.peft_cfg = PEFTConfig(method="none")
        self.compute_dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
        c = self.vocab.max_classes
        e = self.clip_cfg.embed_dim
        head = {"w": jnp.zeros((e, c), jnp.float32),
                "b": jnp.zeros((c,), jnp.float32)}
        trainable = {"head": head}
        frozen = self.params
        if self.train_backbone:
            # the tower moves into the trainable tree; keep frozen empty so
            # the donated state never aliases the same buffers twice
            trainable["backbone"] = self.params
            frozen = {}
        self.tx = self._make_tx(cfg)
        self.state = TrainState.create(trainable=trainable,
                                       frozen=frozen, tx=self.tx,
                                       rng=self.next_rng())
        log.info("trainable params: %d", param_count(trainable))

        import functools
        fwd = functools.partial(head_forward, clip_cfg=self.clip_cfg,
                                compute_dtype=self.compute_dtype)
        # pure-DP meshes run the step inside shard_map (fused kernels
        # survive multi-chip DP, grads pmean over ICI — same road as
        # AdapterCLIP; see engine.make_train_step). Both the stream-step
        # and the memory-epoch batch shapes must divide the data axis.
        # jit(shard_map) places unsharded inputs per its specs, so no
        # explicit state/batch placement is needed here. Subclass-owned
        # steps (ewc++/lwf-KD/clib) stay replicated under a mesh.
        dp_only = None
        if self.mesh is not None:
            from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
            n = self.mesh.shape[DATA_AXIS]
            if self.mesh.shape[MODEL_AXIS] == 1 \
                    and self._step_bs() % n == 0 \
                    and cfg.batchsize % n == 0:
                dp_only = self.mesh
        self._dp_mesh = dp_only
        self._train_step = remat_fallback(lambda fb: make_train_step(
            self.clip_cfg, self.peft_cfg, self.tx,
            image_size=self.clip_cfg.image_size,
            mean=self.train_dataset.mean, std=self.train_dataset.std,
            use_autoaug="autoaug" in cfg.transforms,
            use_cutmix="cutmix" in cfg.transforms,
            compute_dtype=self.compute_dtype, forward_fn=fwd,
            dp_mesh=self._dp_mesh,
            # fb: engine.remat_fallback retry after a compile-time HBM OOM
            remat=cfg.remat or cfg.batchsize >= 256 or fb))

        @jax.jit
        def predict_fn(frozen, trainable, images_u8, mask):
            from ..ops import preprocess
            x = images_u8.astype(jnp.float32) / 255.0
            x = preprocess.resize_bilinear(x, self.clip_cfg.image_size)
            x = preprocess.normalize(x, self.train_dataset.mean,
                                     self.train_dataset.std)
            logits, _, _ = fwd(frozen, trainable,
                               x.astype(self.compute_dtype), None)
            return jnp.argmax(logits + mask[None, :], axis=-1)

        self._predict_fn = predict_fn
        # head logits cover all max_classes slots; tokens unused
        self._dummy_tokens = jnp.zeros((self.vocab.max_classes, 1),
                                       jnp.int32)

    def replay_concat(self, images, labels):
        """Reference composition (methods/er_baseline.py:33-41 +
        _trainer memory_batchsize): with ``temp_batchsize`` set, the
        training batch is temp stream samples + (batchsize - temp) memory
        samples; otherwise a full stream batch + a full memory batch."""
        cfg = self.cfg
        if cfg.temp_batchsize > 0:
            images = images[:cfg.temp_batchsize]
            labels = labels[:cfg.temp_batchsize]
            mem_bs = max(cfg.batchsize - cfg.temp_batchsize, 0)
        else:
            mem_bs = cfg.batchsize
        if cfg.memory_size > 0 and len(self.memory) > 0 and mem_bs > 0:
            mem_idx = self.memory.sample(mem_bs)
            m_images, m_labels = self.train_dataset.gather(mem_idx)
            images = np.concatenate([images, m_images], axis=0)
            labels = np.concatenate([labels, m_labels], axis=0)
        return images, labels

    def _step_bs(self) -> int:
        cfg = self.cfg
        if cfg.memory_size <= 0:
            return cfg.batchsize
        return cfg.batchsize if cfg.temp_batchsize > 0 \
            else cfg.batchsize * 2

    def online_step(self, images, labels, indices):
        cfg = self.cfg
        stream_images, stream_labels = images, labels
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
        self.update_memory(indices, stream_labels)
        return stats

    def update_memory(self, indices, labels):
        if self.cfg.memory_size > 0:
            for i, lab in zip(indices, labels):
                self.memory.reservoir_update(int(i), int(lab))

    def prepare_eval(self):
        self._mask = jnp.asarray(self.vocab.logit_mask())

    def predict(self, images):
        return self._predict_fn(self.state.frozen, self.state.trainable,
                                jnp.asarray(images), self._mask)


class FT(ER):
    """Naive online finetuning (reference methods/finetuning.py): trains
    the full vision tower + head, no replay memory."""

    train_backbone = True

    def update_memory(self, indices, labels):
        pass
