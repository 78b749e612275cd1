"""Prompt pools for the ViT prompt-tuning family (L2P / DualPrompt / MVP).

Parity target: reference ``models/l2p.py`` (``Prompt`` pool: key-matched
selection with optional frequency-diversified and batchwise modes,
frequency/counter buffers, ``:33-90``) and ``models/dualprompt.py``
(g/e-prompt placement with prompt- or prefix-tuning, ``:92-200``).

Backbone note: the reference uses a timm ViT-B/16 (ImageNet-21k). This
build runs the prompt machinery over the functional CLIP-ViT vision tower
(same transformer geometry; QuickGELU + ln_pre variant). Weights load from
a CLIP checkpoint; a timm-exact converter can slot in behind
``models/convert.py`` without touching this module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPConfig
from . import clip as clip_fns

_P = jax.lax.Precision.HIGHEST


def init_prompt_pool(rng, pool_size: int, prompt_len: int, dim: int):
    """key/prompts ~ U(-1, 1) (reference l2p.py:51-56)."""
    k1, k2 = jax.random.split(rng)
    return {
        "key": jax.random.uniform(k1, (pool_size, dim), jnp.float32, -1, 1),
        "prompts": jax.random.uniform(k2, (pool_size, prompt_len, dim),
                                      jnp.float32, -1, 1),
    }


def pool_select(pool, query, frequency, selection_size: int, *,
                diversified: bool, train: bool):
    """Top-S key match (smallest 1-cos distance), optionally scaled by
    L1-normalized frequency when training (reference l2p.py:61-84).

    Returns (similarity (B, S), selected prompts (B, S, plen, D),
    counts (pool,)).
    """
    q = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + 1e-8)
    k = pool["key"] / (jnp.linalg.norm(pool["key"], axis=-1,
                                       keepdims=True) + 1e-8)
    match = 1.0 - jnp.einsum("bd,pd->bp", q.astype(jnp.float32),
                             k.astype(jnp.float32), precision=_P)
    if train and diversified:
        freq = frequency / (jnp.sum(frequency) + 1e-8)
        score = match * freq[None, :]
    else:
        score = match
    neg, topk = jax.lax.top_k(-score, selection_size)
    sim = jnp.take_along_axis(match, topk, axis=1)
    sel = pool["prompts"][topk]                       # (B, S, plen, D)
    counts = jnp.sum(jax.nn.one_hot(topk, pool["key"].shape[0]),
                     axis=(0, 1))
    return sim, sel, counts


# Layers per scan iteration for this family's towers: the L2P/DualPrompt
# step is the one place the depth-scan grouping measurably wins — g=4
# 83.7 ms vs g=1 88.3 ms (l2p step, same-session A/B, r3); every other
# method family measured equal-or-faster at the global g=1 default (see
# BASELINE.md negative results).
_SCAN_GROUP = 4


def vit_query(frozen, images, cfg: CLIPConfig, compute_dtype):
    """Frozen promptless CLS query (reference l2p.py:145-150)."""
    from .mvp_clip import _vit_prelude
    x, v = _vit_prelude(frozen, images, cfg, compute_dtype)
    q = clip_fns.transformer(jax.lax.stop_gradient(x), v["blocks"],
                             cfg.vision_heads, act=cfg.act,
                             base_grads=False, scan_group=_SCAN_GROUP)
    return jax.lax.stop_gradient(
        clip_fns.layer_norm(q[:, :1], v["ln_post"])[:, 0]), x, v


def l2p_forward(frozen, trainable, images, cfg: CLIPConfig, *,
                frequency, selection_size: int, prompt_len: int,
                train: bool, diversified: bool = True,
                compute_dtype=jnp.bfloat16):
    """L2P: selected prompt tokens inserted after CLS; classifier head over
    the mean of the prompt-token outputs (reference l2p.py:139-165)."""
    query, x, v = vit_query(frozen, images, cfg, compute_dtype)
    sim, sel, counts = pool_select(trainable["pool"], query, frequency,
                                   selection_size, diversified=diversified,
                                   train=train)
    b = x.shape[0]
    sp = sel.reshape(b, selection_size * prompt_len, -1)
    sp = sp + v["pos_embed"][:1].astype(jnp.float32)  # + pos_embed[0]
    x = jnp.concatenate([x[:, :1], sp.astype(x.dtype), x[:, 1:]], axis=1)
    h = clip_fns.transformer(x, v["blocks"], cfg.vision_heads,
                             act=cfg.act, base_grads=False,
                             scan_group=_SCAN_GROUP)
    h = clip_fns.layer_norm(h, v["ln_post"])
    pooled = h[:, 1:selection_size * prompt_len + 1].mean(axis=1)
    logits = jnp.einsum("bd,dc->bc", pooled.astype(jnp.float32),
                        trainable["head"]["w"], precision=_P) \
        + trainable["head"]["b"]
    return logits, sim.mean(), counts


def dualprompt_forward(frozen, trainable, images, cfg: CLIPConfig, *,
                       e_frequency, pos_g, pos_e, len_g: int, len_e: int,
                       train: bool, compute_dtype=jnp.bfloat16):
    """DualPrompt (prompt_tuning mode): g-prompt (pool of 1) at pos_g,
    query-selected e-prompt at pos_e, appended per layer then truncated
    (reference dualprompt.py:149-173) — masked KV-prefix in the scan with
    ``prompt_ln=True`` (appended tokens pass through each block's norm1 in
    the reference). Head reads the CLS output."""
    query, x, v = vit_query(frozen, images, cfg, compute_dtype)
    b = x.shape[0]
    _, g_sel, _ = pool_select(trainable["g_pool"], query,
                              jnp.ones((1,)), 1, diversified=False,
                              train=train)
    sim, e_sel, counts = pool_select(trainable["e_pool"], query,
                                     e_frequency, 1, diversified=False,
                                     train=train)
    pos0 = v["pos_embed"][:1].astype(jnp.float32)
    g = (g_sel.reshape(b, len(pos_g), len_g, -1)
         + pos0).astype(compute_dtype)
    e = (e_sel.reshape(b, len(pos_e), len_e, -1)
         + pos0).astype(compute_dtype)

    layers = cfg.vision_layers
    p_max = max(len_g, len_e)
    d = x.shape[-1]
    vals = jnp.zeros((layers, b, p_max, d), compute_dtype)
    valid = np.zeros((layers, p_max), bool)
    for i, layer in enumerate(pos_g):
        if layer >= layers:
            continue
        vals = vals.at[layer, :, :len_g].set(g[:, i])
        valid[layer, :len_g] = True
    for i, layer in enumerate(pos_e):
        if layer >= layers:
            continue
        vals = vals.at[layer, :, :len_e].set(e[:, i])
        valid[layer, :len_e] = True

    h = clip_fns.transformer(x, v["blocks"], cfg.vision_heads,
                             layer_prompts=vals,
                             layer_prompt_valid=jnp.asarray(valid),
                             prompt_ln=True, act=cfg.act,
                             base_grads=False, scan_group=_SCAN_GROUP)
    pooled = clip_fns.layer_norm(h[:, :1], v["ln_post"])[:, 0]
    logits = jnp.einsum("bd,dc->bc", pooled.astype(jnp.float32),
                        trainable["head"]["w"], precision=_P) \
        + trainable["head"]["b"]
    return logits, sim.mean(), counts
