"""Parameter initialization for the functional CLIP towers.

Follows the OpenAI CLIP init scheme (scaled normals per depth) so that a
random-init model is trainable when pretrained weights are unavailable.
Layout matches what ``models/convert.py`` produces from a real checkpoint:
transformer blocks are layer-stacked pytrees (leading dim = n_layers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPConfig


def _ln(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def _stack_ln(layers, d):
    return {"scale": jnp.ones((layers, d), jnp.float32),
            "bias": jnp.zeros((layers, d), jnp.float32)}


def _blocks(rng, layers: int, width: int):
    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    ks = jax.random.split(rng, 4)
    return {
        "ln_1": _stack_ln(layers, width),
        "attn": {
            "w_qkv": attn_std * jax.random.normal(
                ks[0], (layers, width, 3 * width), jnp.float32),
            "b_qkv": jnp.zeros((layers, 3 * width), jnp.float32),
            "w_out": proj_std * jax.random.normal(
                ks[1], (layers, width, width), jnp.float32),
            "b_out": jnp.zeros((layers, width), jnp.float32),
        },
        "ln_2": _stack_ln(layers, width),
        "mlp": {
            "w_fc": fc_std * jax.random.normal(
                ks[2], (layers, width, 4 * width), jnp.float32),
            "b_fc": jnp.zeros((layers, 4 * width), jnp.float32),
            "w_proj": proj_std * jax.random.normal(
                ks[3], (layers, 4 * width, width), jnp.float32),
            "b_proj": jnp.zeros((layers, width), jnp.float32),
        },
    }


def init_clip_params(rng, cfg: CLIPConfig):
    kv, kt, k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 8)
    vw = cfg.vision_width
    vscale = vw ** -0.5
    if cfg.tower == "rn":
        from .resnet import init_rn_params
        return {
            "vision": init_rn_params(kv, cfg),
            "text": _text_tree(kt, k5, k6, cfg),
            "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
        }
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    return {
        "vision": {
            "patch_kernel": vscale * jax.random.normal(
                k1, (patch_dim, vw), jnp.float32),
            "class_embedding": vscale * jax.random.normal(
                k2, (vw,), jnp.float32),
            "pos_embed": vscale * jax.random.normal(
                k3, (cfg.vision_seq_len, vw), jnp.float32),
            "ln_pre": _ln(vw),
            "blocks": _blocks(kv, cfg.vision_layers, vw),
            "ln_post": _ln(vw),
            "proj": vscale * jax.random.normal(
                k4, (vw, cfg.embed_dim), jnp.float32),
        },
        "text": _text_tree(kt, k5, k6, cfg),
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
    }


def _text_tree(kt, k5, k6, cfg: CLIPConfig):
    tw = cfg.text_width
    return {
        "token_embedding": 0.02 * jax.random.normal(
            k5, (cfg.vocab_size, tw), jnp.float32),
        "pos_embed": 0.01 * jax.random.normal(
            k6, (cfg.context_length, tw), jnp.float32),
        "blocks": _blocks(kt, cfg.text_layers, tw),
        "ln_final": _ln(tw),
        "text_projection": (tw ** -0.5) * jax.random.normal(
            jax.random.fold_in(kt, 7), (tw, cfg.embed_dim), jnp.float32),
    }


def param_count(tree) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(tree))
