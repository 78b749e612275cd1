"""MVP on CLIP — mask + visual prompt pools, functionally.

Parity target: reference ``models/mvp_clip.py`` (CLIP_MVP):
  * frozen CLIP; learnables are a key pool (E, 768), a per-prompt class
    mask (E, num_classes) init −1, a shared g-prompt and a per-task e-prompt
    pool (``__init__:69-104``);
  * query = CLS feature of a promptless no-grad pass (``forward_features:
    196-218``; ``use_last_layer`` default True → full depth);
  * e-prompt selection: smallest cosine distance to keys, optionally scaled
    by usage counts (contrastive mode), count buffer updated by bincount
    (``:224-254``);
  * prompt injection: g-prompts at layers (0,1) ×5 tokens, selected
    e-prompt at layers (2,3,4) ×20 tokens, appended then truncated per
    block (``prompt_tuning:158-175``) — realized here as masked KV-prefix
    slots inside the block scan with ``prompt_ln=True`` (each block's ln_1
    applied to the prompt tokens, exactly as the appended tokens receive
    it in the reference; parity-tested in
    tests/test_reference_parity.py::test_mvp_prompt_tuning_parity);
  * head: cosine logits × logit_scale, per-sample mask ``sigmoid(m)·2``
    (``:263-264``), similarity loss (contrastive or mean distance).

The trainer-side MVP losses (AFS/GSF via per-sample feature grads) live in
``methods/mvp_clip.py`` using ``jax.vmap(jax.grad)`` instead of the
reference's backward-in-a-loop (``methods/mvp_clip.py:204-238``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPConfig
from . import clip as clip_fns

_P = jax.lax.Precision.HIGHEST

POS_G = (0, 1)
POS_E = (2, 3, 4)
LEN_G = 5
LEN_E = 20


def init_mvp_params(rng, clip_cfg: CLIPConfig, *, e_pool: int,
                    num_classes: int, len_g: int = LEN_G,
                    len_e: int = LEN_E):
    """Learnable tree (reference __init__:82-104): key randn, mask −1,
    prompts randn."""
    d = clip_cfg.vision_width
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "key": jax.random.normal(k1, (e_pool, d), jnp.float32),
        "mask": jnp.full((e_pool, num_classes), -1.0, jnp.float32),
        "g_prompts": jax.random.normal(
            k2, (1, len(POS_G) * len_g, d), jnp.float32),
        "e_prompts": jax.random.normal(
            k3, (e_pool, len(POS_E) * len_e, d), jnp.float32),
    }


def _cos(a, b, eps=1e-8):
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + eps)
    b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + eps)
    return jnp.sum(a * b, axis=-1)


def _vit_prelude(frozen, images, cfg: CLIPConfig, compute_dtype):
    v = clip_fns._cast_tree(frozen["vision"], compute_dtype)
    x = clip_fns.extract_patches(images.astype(compute_dtype),
                                 cfg.patch_size)
    x = jnp.einsum("bnp,pd->bnd", x, v["patch_kernel"],
                   preferred_element_type=jnp.float32,
                   precision=_P).astype(compute_dtype)
    if "patch_bias" in v:   # timm ViTs: conv proj has a bias (CLIP's not)
        x = x + v["patch_bias"].astype(compute_dtype)
    cls = jnp.broadcast_to(v["class_embedding"],
                           (x.shape[0], 1, cfg.vision_width))
    x = jnp.concatenate([cls.astype(compute_dtype), x], axis=1)
    x = x + v["pos_embed"].astype(compute_dtype)
    if cfg.use_ln_pre:
        # timm ViTs have no pre-transformer LN — and LayerNorm with
        # identity affine params still normalizes, so this must be gated
        # on the config, not neutralized through the params
        x = clip_fns.layer_norm(x, v["ln_pre"])
    return x, v


def _layer_prompt_tensors(mvp, sel_e, batch: int, layers: int,
                          len_g: int, len_e: int, dtype,
                          pos_g=POS_G, pos_e=POS_E):
    """Build the padded (L, B, P_max, D) prompt tokens + (L, P_max) valid
    mask for the scan: g slices at pos_g, selected e slices at pos_e.
    Positions beyond the tower depth are dropped (small test towers)."""
    d = mvp["g_prompts"].shape[-1]
    p_max = max(len_g, len_e)
    vals = jnp.zeros((layers, batch, p_max, d), dtype)
    valid = np.zeros((layers, p_max), bool)
    g = mvp["g_prompts"][0].reshape(len(pos_g), len_g, d)
    for i, layer in enumerate(pos_g):
        if layer >= layers:
            continue
        vals = vals.at[layer, :, :len_g].set(
            jnp.broadcast_to(g[i][None], (batch, len_g, d)).astype(dtype))
        valid[layer, :len_g] = True
    e = sel_e.reshape(batch, len(pos_e), len_e, d)
    for i, layer in enumerate(pos_e):
        if layer >= layers:
            continue
        vals = vals.at[layer, :, :len_e].set(
            e[:, i].astype(dtype))
        valid[layer, :len_e] = True
    return vals, jnp.asarray(valid)


def mvp_features(frozen,
                 mvp,
                 count,
                 images,
                 cfg: CLIPConfig,
                 *,
                 use_contrastiv: bool = False,
                 use_last_layer: bool = True,
                 train: bool = True,
                 query_ln: bool = True,
                 compute_dtype=jnp.bfloat16,
                 dp_axis=None):
    """Returns (image_feats, per-sample class mask, similarity_loss,
    new_count, selected idx).

    ``query_ln``: CLIP_MVP applies the tower's final LN to the query CLS
    token (reference models/mvp_clip.py:218 ``ln_post(query[:, 0, :])``);
    the ViT-classifier MVP does NOT (reference models/mvp.py:188-191 takes
    the raw block output ``query[:, 0]`` with no ``backbone.norm``) — the
    ViT trainer passes False.

    ``dp_axis``: inside the shard_map DP road the contrastive similarity
    loss couples every sample to every OTHER sample's count mass (the
    reference's (B, B) broadcast quirk below) — the mass vector is
    all-gathered so each shard's cross terms span the GLOBAL batch and the
    trainer's loss pmean reproduces single-program semantics exactly."""
    x, v = _vit_prelude(frozen, images, cfg, compute_dtype)
    b = x.shape[0]

    # promptless query pass (no grad; reference forward_features:196-218)
    q = jax.lax.stop_gradient(x)
    q_blocks = v["blocks"]
    if not use_last_layer:
        q_blocks = jax.tree.map(lambda a: a[:-1], q_blocks)
    q = clip_fns.transformer(jax.lax.stop_gradient(q), q_blocks,
                             cfg.vision_heads, act=cfg.act,
                             base_grads=False)
    if query_ln:
        query = clip_fns.layer_norm(q[:, :1], v["ln_post"])[:, 0]
    else:
        query = q[:, 0]
    query = jax.lax.stop_gradient(query)

    # e-prompt selection (reference :224-254)
    distance = 1.0 - _cos(query[:, None, :].astype(jnp.float32),
                          mvp["key"][None, :, :])          # (B, E)
    mass = (count + 1.0) if use_contrastiv else jnp.ones_like(count)
    scaled = distance * mass[None, :]
    idx = jnp.argmin(scaled, axis=-1)                       # selection_size=1
    sel_dist = jnp.take_along_axis(distance, idx[:, None], axis=1)[:, 0]
    sel_e = mvp["e_prompts"][idx]                           # (B, e_size, D)
    sel_mask = mvp["mask"][idx]                             # (B, C)

    if use_contrastiv:
        key_dist = 1.0 - _cos(mvp["key"][:, None, :],
                              mvp["key"][None, :, :])       # (E, E)
        # reference broadcast quirk (mvp_clip.py:241-247): with topk of
        # shape (B, 1), `key_wise_distance[topk] / mass[topk]` broadcasts
        # (B, 1, E) against (B, 1) -> (B, B, E), and `distance /
        # mass[topk]` broadcasts (B,) against (B, 1) -> (B, B): every
        # sample's distances are rescaled by every OTHER sample's count
        # mass too, and the mean runs over the cross terms as well
        m = mass[idx]                                       # (B,)
        kd = key_dist[idx]                                  # (B, E)
        if dp_axis is not None:
            # global cross terms: columns j span all shards via
            # all_gather; rows i stay shard-local, so the global (i, j)
            # mean is the pmean of per-shard means — pmean'd BEFORE the
            # nonlinear log (pmean's psum transpose keeps the gradients
            # exactly equal to the single-program step's)
            m = jax.lax.all_gather(m, dp_axis, tiled=True)  # (B_global,)
        pos = jnp.exp(kd[:, None, :] / m[None, :, None]).mean()
        anchor = jnp.exp(sel_dist[:, None] / m[None, :]).mean()
        if dp_axis is not None:
            pos = jax.lax.pmean(pos, dp_axis)
            anchor = jax.lax.pmean(anchor, dp_axis)
        similarity_loss = -jnp.log(pos / (anchor + pos) + 1e-6)
    else:
        similarity_loss = sel_dist.mean()

    new_count = count + jnp.bincount(
        idx, length=count.shape[0]).astype(count.dtype) if train else count

    vals, valid = _layer_prompt_tensors(
        mvp, sel_e, b, cfg.vision_layers, LEN_G, LEN_E, compute_dtype)
    h = clip_fns.transformer(x, v["blocks"], cfg.vision_heads,
                             layer_prompts=vals, layer_prompt_valid=valid,
                             prompt_ln=True, act=cfg.act,
                             base_grads=False)
    pooled = clip_fns.layer_norm(h[:, :1], v["ln_post"])[:, 0]
    img = jnp.einsum("bd,de->be", pooled, v["proj"],
                     preferred_element_type=jnp.float32, precision=_P)
    img = img.astype(compute_dtype)
    cls_mask = jax.nn.sigmoid(sel_mask.astype(jnp.float32)) * 2.0
    return img, cls_mask, similarity_loss, new_count, idx


def mvp_head(frozen, img_feats, txt_feats, cls_mask=None, class_mask=None,
             use_mask: bool = True):
    """Cosine head + per-sample prompt mask + exposure mask
    (reference forward_head:266-280 and trainer masking)."""
    img = clip_fns.normalize(img_feats).astype(jnp.float32)
    txt = clip_fns.normalize(txt_feats).astype(jnp.float32)
    scale = jnp.exp(frozen["logit_scale"]).astype(jnp.float32)
    logits = scale * jnp.einsum("be,ce->bc", img, txt, precision=_P)
    if use_mask and cls_mask is not None:
        logits = logits * cls_mask[:, :logits.shape[1]]
    if class_mask is not None:
        logits = logits + class_mask[None, :]
    return logits
