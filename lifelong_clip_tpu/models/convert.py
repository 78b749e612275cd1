"""Convert an OpenAI CLIP checkpoint into the functional pytree layout.

Covers what the reference loader does at ``models/clip/clip_loader.py:83-139``
+ ``build_model`` (``models/clip/model.py:1005-1062``): accept a TorchScript
archive or plain state dict, infer the architecture from tensor shapes, and
produce parameters — here as layer-stacked JAX pytrees matching
``models/init.py``. Torch (CPU build) is used only as a file reader; nothing
torch touches the compute path.

No network download: the reference fetches weights by URL with sha256
verification; in this environment checkpoints must be provided on disk
(``pretrained_path``). Absent a checkpoint, models run from seeded random
init (tests/bench do this).
"""

from __future__ import annotations

import numpy as np

from ..config import CLIPConfig


def _load_state_dict(path: str):
    import torch  # local import: torch is IO-only here
    obj = torch.jit.load(path, map_location="cpu").state_dict() \
        if _is_jit_archive(path) else torch.load(path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.float().cpu().numpy() for k, v in obj.items()}


def _is_jit_archive(path: str) -> bool:
    import zipfile
    try:
        with zipfile.ZipFile(path) as zf:
            return any(n.endswith("constants.pkl") for n in zf.namelist())
    except Exception:
        return False


def infer_config(sd) -> CLIPConfig:
    """Shape-driven architecture inference (reference model.py:1005-1044).

    ViT checkpoints are identified by ``visual.proj`` (reference
    ``build_model:1006``); otherwise the ModifiedResNet branch reads stage
    depths from the ``visual.layerN`` key families (``:1019-1033``).
    """
    embed_dim = sd["text_projection"].shape[1]
    text_width = sd["ln_final.weight"].shape[0]
    text_layers = len({k.split(".")[2] for k in sd
                       if k.startswith("transformer.resblocks")})
    text_kw = dict(
        embed_dim=embed_dim,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        text_width=text_width,
        text_heads=text_width // 64,
        text_layers=text_layers,
    )
    if "visual.proj" in sd:  # ViT
        vision_width = sd["visual.conv1.weight"].shape[0]
        patch_size = sd["visual.conv1.weight"].shape[-1]
        # layer index is the 4th component: visual.transformer.resblocks.N
        vision_layers = len({k.split(".")[3] for k in sd
                             if k.startswith("visual.transformer.resblocks")})
        grid = int(round(
            (sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
        return CLIPConfig(
            image_size=grid * patch_size,
            patch_size=patch_size,
            vision_width=vision_width,
            vision_layers=vision_layers,
            vision_heads=vision_width // 64,
            **text_kw,
        )
    # ModifiedResNet
    counts = tuple(
        len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
        for b in (1, 2, 3, 4))
    vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
    output_width = int(round(
        (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5))
    return CLIPConfig(
        image_size=output_width * 32,
        patch_size=32,  # unused for rn; keeps grid_size well-defined
        vision_width=vision_width,
        vision_layers=counts,
        vision_heads=vision_width * 32 // 64,
        tower="rn",
        **text_kw,
    )


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _stack_blocks(sd, prefix: str, layers: int):
    out = {"ln_1": {"scale": [], "bias": []},
           "attn": {"w_qkv": [], "b_qkv": [], "w_out": [], "b_out": []},
           "ln_2": {"scale": [], "bias": []},
           "mlp": {"w_fc": [], "b_fc": [], "w_proj": [], "b_proj": []}}
    for i in range(layers):
        p = f"{prefix}.resblocks.{i}"
        out["ln_1"]["scale"].append(sd[f"{p}.ln_1.weight"])
        out["ln_1"]["bias"].append(sd[f"{p}.ln_1.bias"])
        # torch in_proj_weight is (3D, D) acting as x @ W.T -> transpose
        out["attn"]["w_qkv"].append(sd[f"{p}.attn.in_proj_weight"].T)
        out["attn"]["b_qkv"].append(sd[f"{p}.attn.in_proj_bias"])
        out["attn"]["w_out"].append(sd[f"{p}.attn.out_proj.weight"].T)
        out["attn"]["b_out"].append(sd[f"{p}.attn.out_proj.bias"])
        out["ln_2"]["scale"].append(sd[f"{p}.ln_2.weight"])
        out["ln_2"]["bias"].append(sd[f"{p}.ln_2.bias"])
        out["mlp"]["w_fc"].append(sd[f"{p}.mlp.c_fc.weight"].T)
        out["mlp"]["b_fc"].append(sd[f"{p}.mlp.c_fc.bias"])
        out["mlp"]["w_proj"].append(sd[f"{p}.mlp.c_proj.weight"].T)
        out["mlp"]["b_proj"].append(sd[f"{p}.mlp.c_proj.bias"])
    import jax.numpy as jnp
    return {k: {kk: jnp.asarray(np.stack(vv)) for kk, vv in v.items()}
            for k, v in out.items()}


def state_dict_to_params(sd, cfg: CLIPConfig = None):
    """Returns (params, cfg). ``sd``: str->np.ndarray state dict."""
    import jax.numpy as jnp
    cfg = cfg or infer_config(sd)
    if cfg.tower == "rn":
        from .resnet import rn_state_dict_to_vision
        params = {
            "vision": rn_state_dict_to_vision(sd),
            "text": _text_params(sd, cfg),
            "logit_scale": jnp.asarray(sd["logit_scale"]),
        }
        return params, cfg
    conv = sd["visual.conv1.weight"]  # (W, 3, P, P)
    # our patch vectors are flattened (ph, pw, c): reorder kernel to match
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    params = {
        "vision": {
            "patch_kernel": jnp.asarray(patch_kernel),
            "class_embedding": jnp.asarray(sd["visual.class_embedding"]),
            "pos_embed": jnp.asarray(sd["visual.positional_embedding"]),
            "ln_pre": {k: jnp.asarray(v) for k, v in
                       _ln(sd, "visual.ln_pre").items()},
            "blocks": _stack_blocks(sd, "visual.transformer",
                                    cfg.vision_layers),
            "ln_post": {k: jnp.asarray(v) for k, v in
                        _ln(sd, "visual.ln_post").items()},
            "proj": jnp.asarray(sd["visual.proj"]),
        },
        "text": _text_params(sd, cfg),
        "logit_scale": jnp.asarray(sd["logit_scale"]),
    }
    return params, cfg


def _text_params(sd, cfg: CLIPConfig):
    import jax.numpy as jnp
    return {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "pos_embed": jnp.asarray(sd["positional_embedding"]),
        "blocks": _stack_blocks(sd, "transformer", cfg.text_layers),
        "ln_final": {k: jnp.asarray(v) for k, v in
                     _ln(sd, "ln_final").items()},
        "text_projection": jnp.asarray(sd["text_projection"]),
    }


def load_clip_params(path: str):
    """Load checkpoint file -> (params, cfg)."""
    sd = _load_state_dict(path)
    return state_dict_to_params(sd)


def timm_vit_to_params(sd, cfg: CLIPConfig = None):
    """Convert a timm-style ViT state dict (blocks.N.attn.qkv.weight ...)
    into the vision-tower pytree (timm variant: act='gelu', no ln_pre).

    Covers the reference's L2P/DualPrompt/MVP backbone family
    (``models/l2p.py:23-31``, vit_base_patch16_224). The classifier head
    (``head.weight/bias``) is returned separately — trainers own heads.
    """
    import jax.numpy as jnp
    layers = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    width = sd["cls_token"].shape[-1]
    conv = sd["patch_embed.proj.weight"]     # (W, 3, P, P)
    patch = conv.shape[-1]
    if cfg is None:
        from ..config import CLIPConfig as _C
        n_pos = sd["pos_embed"].shape[-2]    # 1 + grid**2
        grid = int(round((n_pos - 1) ** 0.5))
        cfg = _C(embed_dim=width, vision_width=width, vision_layers=layers,
                 vision_heads=width // 64, patch_size=patch,
                 image_size=grid * patch, act="gelu", use_ln_pre=False)
    blocks = {"ln_1": {"scale": [], "bias": []},
              "attn": {"w_qkv": [], "b_qkv": [], "w_out": [], "b_out": []},
              "ln_2": {"scale": [], "bias": []},
              "mlp": {"w_fc": [], "b_fc": [], "w_proj": [], "b_proj": []}}
    for i in range(layers):
        p = f"blocks.{i}"
        blocks["ln_1"]["scale"].append(sd[f"{p}.norm1.weight"])
        blocks["ln_1"]["bias"].append(sd[f"{p}.norm1.bias"])
        blocks["attn"]["w_qkv"].append(sd[f"{p}.attn.qkv.weight"].T)
        blocks["attn"]["b_qkv"].append(sd[f"{p}.attn.qkv.bias"])
        blocks["attn"]["w_out"].append(sd[f"{p}.attn.proj.weight"].T)
        blocks["attn"]["b_out"].append(sd[f"{p}.attn.proj.bias"])
        blocks["ln_2"]["scale"].append(sd[f"{p}.norm2.weight"])
        blocks["ln_2"]["bias"].append(sd[f"{p}.norm2.bias"])
        blocks["mlp"]["w_fc"].append(sd[f"{p}.mlp.fc1.weight"].T)
        blocks["mlp"]["b_fc"].append(sd[f"{p}.mlp.fc1.bias"])
        blocks["mlp"]["w_proj"].append(sd[f"{p}.mlp.fc2.weight"].T)
        blocks["mlp"]["b_proj"].append(sd[f"{p}.mlp.fc2.bias"])
    blocks = {k: {kk: jnp.asarray(np.stack(vv)) for kk, vv in v.items()}
              for k, v in blocks.items()}

    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(-1, width)
    pos = sd["pos_embed"]
    pos = pos[0] if pos.ndim == 3 else pos
    vision = {
        "patch_kernel": jnp.asarray(patch_kernel),
        # timm's patch-embed conv has a bias (CLIP's conv1 is bias=False);
        # consumed as an optional leaf by the vision preludes
        **({"patch_bias": jnp.asarray(sd["patch_embed.proj.bias"])}
           if "patch_embed.proj.bias" in sd else {}),
        "class_embedding": jnp.asarray(sd["cls_token"].reshape(-1)),
        "pos_embed": jnp.asarray(pos),
        # no ln_pre in timm ViTs: identity params keep the tree uniform
        "ln_pre": {"scale": jnp.ones((width,), jnp.float32),
                   "bias": jnp.zeros((width,), jnp.float32)},
        "blocks": blocks,
        "ln_post": {"scale": jnp.asarray(sd["norm.weight"]),
                    "bias": jnp.asarray(sd["norm.bias"])},
        # timm has no projection; identity keeps encode_image shape-stable
        "proj": jnp.eye(width, dtype=jnp.float32),
    }
    head = None
    if "head.weight" in sd:
        head = {"w": jnp.asarray(sd["head.weight"].T),
                "b": jnp.asarray(sd["head.bias"])}
    return {"vision": vision, "logit_scale": jnp.asarray(0.0)}, cfg, head
