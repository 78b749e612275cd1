"""Zero-shot frozen-CLIP baseline ("continual-clip").

Parity target: reference ``methods/continual_clip.py`` +
``models/continual_clip.py`` — no training; evaluation classifies against
text embeddings of the exposed class names, refreshed only when new classes
appear (reference rebuilds tokens on exposure at
``models/continual_clip.py:20-32``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import PEFTConfig
from ..models import build_clip
from .base import OnlineTrainer
from .engine import make_eval_step, make_text_feature_fn


class ContinualCLIP(OnlineTrainer):

    def setup_model(self):
        cfg = self.cfg
        self.params, self.clip_cfg = build_clip(
            cfg.model_name, cfg.pretrained_path, rng=self.next_rng())
        self.peft_cfg = PEFTConfig(method="none")
        self.compute_dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
        # zero-shot = eval-only, but it still rides the unified multi-chip
        # road (VERDICT r4 #1): a pure-DP mesh shard_maps the eval step
        # (each shard scores its local rows through the fused kernels); a
        # model-axis mesh routes attention through the einsum path so
        # GSPMD never meets the opaque Pallas custom call
        self._eval_dp_mesh = self.resolve_dp_mesh(cfg.test_batchsize,
                                                  allow_model_axis=True)
        attn = "xla" if (self.mesh is not None
                         and self._eval_dp_mesh is None) else None
        self._text_fn = make_text_feature_fn(
            self.clip_cfg, self.peft_cfg, compute_dtype=self.compute_dtype,
            attn_impl=attn)
        self._eval_fn = make_eval_step(
            self.clip_cfg, self.peft_cfg,
            image_size=self.clip_cfg.image_size,
            mean=self.train_dataset.mean, std=self.train_dataset.std,
            compute_dtype=self.compute_dtype,
            attn_impl=attn, dp_mesh=self._eval_dp_mesh)
        self._txt_cache = None
        self._txt_cache_n = -1

    def online_step(self, images, labels, indices):
        # zero-shot: exposure tracking only (reference
        # methods/continual_clip.py:21-44 returns (-1, -1))
        return {}

    def prepare_eval(self):
        if self._txt_cache_n != len(self.vocab):
            self._txt_cache = self._text_fn(
                self.params, None, jnp.asarray(self.vocab.token_table))
            self._mask = jnp.asarray(self.vocab.logit_mask())
            self._txt_cache_n = len(self.vocab)

    def predict(self, images):
        preds, _ = self._eval_fn(self.params, None, jnp.asarray(images),
                                 self._txt_cache, self._mask)
        return preds
