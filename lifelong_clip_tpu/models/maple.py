"""MaPLe — multi-modal prompt learning over the functional CLIP towers.

Parity target: reference ``models/maple.py`` + the vendored
``models/maple_clip/model.py`` MaPLe blocks:

  * text side: token embeddings with positions ``1..1+n_ctx`` replaced by a
    learnable ctx (init from the embedding of "a bad photo of a",
    ``maple.py:93-101``); at layers ``1..depth-1`` those positions are
    *replaced* again by per-depth compound prompts
    (``model.py:382-397``);
  * vision side: ``n_ctx`` visual ctx tokens (a Linear projection of the
    text ctx, 512→768) appended at the sequence tail (``model.py:571-575``),
    and replaced at layers ``1..depth-1`` by projections of the compound
    text prompts (``model.py:366-380``);
  * all compound projection layers share one initialization
    (``_get_clones`` deep-copies a single initialized Linear).

Here the per-layer replacement is expressed as data in the ``lax.scan``
over blocks: a (L, n_ctx, D) replacement tensor + per-layer flag.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPConfig
from ..ops.attention import causal_mask
from . import clip as clip_fns

_P = jax.lax.Precision.HIGHEST


def init_maple_params(rng, frozen, clip_cfg: CLIPConfig,
                      n_ctx: int = 3, depth: int = 3,
                      ctx_init_tokens=None):
    """Build the MultiModalPromptLearner parameter tree.

    ``ctx_init_tokens``: int token ids of the init phrase ("a bad photo of
    a"); ctx vectors start from their embeddings (reference maple.py:93-101).
    """
    tw = clip_cfg.text_width
    vw = clip_cfg.vision_width
    k1, k2, k3 = jax.random.split(rng, 3)

    if ctx_init_tokens is not None and len(ctx_init_tokens) >= n_ctx:
        ctx = jnp.asarray(
            frozen["text"]["token_embedding"][
                np.asarray(ctx_init_tokens[:n_ctx])])
    else:
        ctx = 0.02 * jax.random.normal(k1, (n_ctx, tw), jnp.float32)

    def linear_init(rng, fan_in, fan_out):
        # torch nn.Linear default: kaiming-uniform(a=sqrt5) + uniform bias
        bound_w = math.sqrt(6.0 / fan_in) / math.sqrt(2.0)
        kw, kb = jax.random.split(rng)
        w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32,
                               -bound_w, bound_w)
        bound_b = 1.0 / math.sqrt(fan_in)
        b = jax.random.uniform(kb, (fan_out,), jnp.float32,
                               -bound_b, bound_b)
        return w, b

    proj_w, proj_b = linear_init(k2, tw, vw)
    # one shared init tiled over depth-1 (reference _get_clones semantics)
    cw, cb = linear_init(jax.random.fold_in(k2, 1), tw, vw)
    d = max(depth - 1, 0)
    compound_text = 0.02 * jax.random.normal(
        k3, (max(d, 1), n_ctx, tw), jnp.float32)[:d]
    return {
        "ctx": ctx,
        "proj_w": proj_w, "proj_b": proj_b,
        "compound_text": compound_text,
        "compound_proj_w": jnp.tile(cw[None], (d, 1, 1)) if d else
        jnp.zeros((0, tw, vw)),
        "compound_proj_b": jnp.tile(cb[None], (d, 1)) if d else
        jnp.zeros((0, vw)),
    }


def _scan_with_replacement(x, blocks, n_heads, mask, replace, n_ctx,
                           where: str):
    """Scan blocks; per layer optionally replace prompt token positions.

    replace: (L, n_ctx, D) values + (L,) flag; where='tail' replaces the
    last n_ctx tokens (vision), where='post_sos' replaces tokens 1..1+n_ctx
    (text). Layer 0 never replaces (first_layer semantics).
    """
    vals, flags = replace

    def one_layer(h, sl):
        blk, val, flag = sl["blk"], sl["val"], sl["flag"]
        rep = jnp.broadcast_to(val[None], (h.shape[0],) + val.shape)
        rep = rep.astype(h.dtype)
        if where == "tail":
            tail = jnp.where(flag, rep, h[:, -n_ctx:])
            h = jnp.concatenate([h[:, :-n_ctx], tail], axis=1)
        else:
            mid = jnp.where(flag, rep, h[:, 1:1 + n_ctx])
            h = jnp.concatenate([h[:, :1], mid, h[:, 1 + n_ctx:]], axis=1)
        # MaPLe trains only the learner (ctx/compound/projections) —
        # prompt grads flow through the replaced token positions (dx),
        # never through the frozen block weights
        return clip_fns._block(h, blk, n_heads, mask, None, None, None,
                               None, base_grads=False)

    xs = {"blk": blocks, "val": vals, "flag": flags}
    n_layers = flags.shape[0]
    g = clip_fns._resolve_group(n_layers, None)   # partial unroll
    if g > 1:
        xs = jax.tree.map(
            lambda a: a.reshape((n_layers // g, g) + a.shape[1:]), xs)

    def body(h, sl):
        if g == 1:
            return one_layer(h, sl), None
        for j in range(g):
            h = one_layer(h, jax.tree.map(lambda a: a[j], sl))
        return h, None

    x, _ = jax.lax.scan(body, x, xs)
    return x


def _replacement_arrays(layers: int, prompts, n_ctx: int, dim: int,
                        dtype):
    """(depth-1, n_ctx, D) prompts -> per-layer (L, n_ctx, D) + flags with
    layer i in 1..depth-1 replaced by prompts[i-1]. Prompt depth beyond the
    tower is dropped (shallow test towers)."""
    d = min(prompts.shape[0], layers - 1)
    vals = jnp.zeros((layers, n_ctx, dim), dtype)
    flags = jnp.zeros((layers,), bool)
    if d > 0:
        vals = vals.at[1:1 + d].set(prompts[:d].astype(dtype))
        flags = flags.at[1:1 + d].set(True)
    return vals, flags


def maple_encode_text(frozen, learner, tokens, clip_cfg: CLIPConfig,
                      n_ctx: int, compute_dtype=jnp.bfloat16):
    """Text tower with ctx splice + per-layer compound replacement.

    ``tokens`` must embed the init phrase at positions 1..1+n_ctx (the
    class prompt is "<init phrase> <classname>."), so EOT argmax pooling is
    unchanged.
    """
    t = clip_fns._cast_tree(frozen["text"], compute_dtype)
    x = t["token_embedding"][tokens].astype(compute_dtype)
    ctx = jnp.broadcast_to(learner["ctx"][None].astype(compute_dtype),
                           (x.shape[0], n_ctx, x.shape[-1]))
    x = jnp.concatenate([x[:, :1], ctx, x[:, 1 + n_ctx:]], axis=1)
    x = x + t["pos_embed"].astype(compute_dtype)
    mask = causal_mask(clip_cfg.context_length)
    replace = _replacement_arrays(clip_cfg.text_layers,
                                  learner["compound_text"], n_ctx,
                                  clip_cfg.text_width, compute_dtype)
    x = _scan_with_replacement(x, t["blocks"], clip_cfg.text_heads, mask,
                               replace, n_ctx, "post_sos")
    x = clip_fns.layer_norm(x, t["ln_final"])
    eot = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None].astype(jnp.int32),
                                 axis=1)[:, 0]
    emb = jnp.einsum("bd,de->be", pooled, t["text_projection"],
                     preferred_element_type=jnp.float32, precision=_P)
    return emb.astype(compute_dtype)


def maple_encode_image(frozen, learner, images, clip_cfg: CLIPConfig,
                       n_ctx: int, compute_dtype=jnp.bfloat16):
    """Vision tower with appended visual ctx + per-layer replacement."""
    v = clip_fns._cast_tree(frozen["vision"], compute_dtype)
    x = clip_fns.extract_patches(images.astype(compute_dtype),
                                 clip_cfg.patch_size)
    x = jnp.einsum("bnp,pd->bnd", x, v["patch_kernel"],
                   preferred_element_type=jnp.float32,
                   precision=_P).astype(compute_dtype)
    cls = jnp.broadcast_to(v["class_embedding"],
                           (x.shape[0], 1, clip_cfg.vision_width))
    x = jnp.concatenate([cls.astype(compute_dtype), x], axis=1)
    x = x + v["pos_embed"].astype(compute_dtype)

    visual_ctx = (learner["ctx"].astype(jnp.float32) @
                  learner["proj_w"] + learner["proj_b"])
    visual_ctx = jnp.broadcast_to(
        visual_ctx[None].astype(compute_dtype),
        (x.shape[0], n_ctx, clip_cfg.vision_width))
    x = jnp.concatenate([x, visual_ctx], axis=1)
    x = clip_fns.layer_norm(x, v["ln_pre"])

    deep_visual = jnp.einsum(
        "dnt,dtv->dnv", learner["compound_text"].astype(jnp.float32),
        learner["compound_proj_w"],
        preferred_element_type=jnp.float32,
        precision=_P) + learner["compound_proj_b"][:, None, :]
    replace = _replacement_arrays(clip_cfg.vision_layers, deep_visual,
                                  n_ctx, clip_cfg.vision_width,
                                  compute_dtype)
    x = _scan_with_replacement(x, v["blocks"], clip_cfg.vision_heads, None,
                               replace, n_ctx, "tail")
    pooled = clip_fns.layer_norm(x[:, :1], v["ln_post"])[:, 0]
    emb = jnp.einsum("bd,de->be", pooled, v["proj"],
                     preferred_element_type=jnp.float32, precision=_P)
    return emb.astype(compute_dtype)


def maple_forward(frozen, learner, images, tokens, clip_cfg: CLIPConfig,
                  n_ctx: int, compute_dtype=jnp.bfloat16):
    img = clip_fns.normalize(maple_encode_image(
        frozen, learner, images, clip_cfg, n_ctx, compute_dtype))
    txt = clip_fns.normalize(maple_encode_text(
        frozen, learner, tokens, clip_cfg, n_ctx, compute_dtype))
    scale = jnp.exp(frozen["logit_scale"]).astype(jnp.float32)
    logits = scale * jnp.einsum("be,ce->bc", img.astype(jnp.float32),
                                txt.astype(jnp.float32), precision=_P)
    return logits, img, txt
