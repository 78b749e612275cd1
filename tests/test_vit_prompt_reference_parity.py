"""Golden forward parity for the ViT-prompt family MODELS (L2P/DualPrompt).

The reference ships models/l2p.py and models/dualprompt.py but registers NO
trainer for them (methods/__init__.py + main.py route only `mvp` to the
ViT family), so whole-run parity is impossible — these tests drive the
reference MODEL forwards directly (over the tiny timm shim from the
whole-run harness) against this repo's ``l2p_forward`` /
``dualprompt_forward`` with identical converted weights:

* L2P (models/l2p.py:140-165): normed full-depth query, frequency-
  diversified top-S key match when training, prompts inserted after CLS
  with the CLS position embedding added, classifier over the MEAN of the
  prompt-token outputs.
* DualPrompt (models/dualprompt.py:224-250, prompt_tuning mode): g-prompt
  (pool of 1) at layers (0,1), query-selected e-prompt at (2,3,4) — both
  + pos_embed[:, :1] — appended per layer then truncated; classifier on
  the CLS output; similarity = selected e-distance mean.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference tree unavailable")

sys.path.insert(0, os.path.dirname(__file__))


def _ref_module(name: str):
    import test_whole_run_parity as H
    H._install_timm_shim()
    H._package("models", os.path.join(REFERENCE, "models"))
    import importlib
    return importlib.import_module(f"models.{name}")


def _convert(backbone):
    from lifelong_clip_tpu.models.convert import timm_vit_to_params
    sd = {k: v.detach().float().numpy()
          for k, v in backbone.state_dict().items()}
    return timm_vit_to_params(sd)


def _batch(n=6, hw=32, seed=3):
    import torch
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, hw, hw, 3)).astype(np.float32)
    return x, torch.from_numpy(x.transpose(0, 3, 1, 2))


def test_l2p_forward_matches_reference():
    import torch
    import jax.numpy as jnp
    from lifelong_clip_tpu.models.vit_prompt import l2p_forward

    mod = _ref_module("l2p")
    m = mod.L2P(pool_size=10, selection_size=5, prompt_len=5,
                num_classes=20)
    m.eval()
    params, cfg, head = _convert(m.backbone)
    trainable = {
        "pool": {"key": jnp.asarray(m.prompt.key.detach().numpy()),
                 "prompts": jnp.asarray(
                     m.prompt.prompts.detach().numpy())},
        "head": {"w": jnp.asarray(head["w"]), "b": jnp.asarray(head["b"])},
    }
    xj, xt = _batch()

    with torch.no_grad():
        ref_logits = m(xt).numpy()
    ref_counter = m.prompt.counter.numpy().copy()

    logits, sim, counts = l2p_forward(
        params, trainable, jnp.asarray(xj), cfg,
        frequency=jnp.ones((10,)), selection_size=5, prompt_len=5,
        train=False, diversified=True, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=1e-4, atol=1e-4)
    # same prompts selected: the reference counter (bincount over topk,
    # l2p.py:77) equals our one-hot counts
    np.testing.assert_array_equal(np.asarray(counts), ref_counter)

    # train mode: the frequency-diversified scaling changes the selection
    # (l2p.py:66-67 — match * L1-normalized frequency); skewed frequencies
    # must steer BOTH implementations to the same different choice
    m.train()
    m.backbone.eval()
    freq = torch.arange(1.0, 11.0)
    m.prompt.frequency.copy_(freq)
    m.prompt.counter.zero_()
    with torch.no_grad():
        ref_logits_tr = m(xt).numpy()
    ref_counter_tr = m.prompt.counter.numpy().copy()
    logits_tr, _, counts_tr = l2p_forward(
        params, trainable, jnp.asarray(xj), cfg,
        frequency=jnp.asarray(freq.numpy()), selection_size=5,
        prompt_len=5, train=True, diversified=True,
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits_tr), ref_logits_tr,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(counts_tr), ref_counter_tr)
    assert not np.array_equal(ref_counter, ref_counter_tr), \
        "diversified scaling should change the selection in this setup"


def test_dualprompt_forward_matches_reference():
    import torch
    import jax.numpy as jnp
    from lifelong_clip_tpu.models.vit_prompt import dualprompt_forward

    mod = _ref_module("dualprompt")
    m = mod.DualPrompt(num_classes=20, task_num=10)
    m.eval()
    params, cfg, head = _convert(m.backbone)
    trainable = {
        "g_pool": {"key": jnp.asarray(m.g_prompt.key.detach().numpy()),
                   "prompts": jnp.asarray(
                       m.g_prompt.prompts.detach().numpy())},
        "e_pool": {"key": jnp.asarray(m.e_prompt.key.detach().numpy()),
                   "prompts": jnp.asarray(
                       m.e_prompt.prompts.detach().numpy())},
        "head": {"w": jnp.asarray(head["w"]), "b": jnp.asarray(head["b"])},
    }
    xj, xt = _batch()

    with torch.no_grad():
        ref_logits = m(xt).numpy()
    ref_sim = float(m.similarity)
    ref_counter = m.e_prompt.counter.numpy().copy()

    logits, sim, counts = dualprompt_forward(
        params, trainable, jnp.asarray(xj), cfg,
        e_frequency=jnp.ones((10,)), pos_g=(0, 1), pos_e=(2, 3, 4),
        len_g=5, len_e=20, train=False, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(sim), ref_sim, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(counts), ref_counter)
