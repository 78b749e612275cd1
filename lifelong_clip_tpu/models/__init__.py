"""Model registry: method name -> (params, peft trees, forward fns).

Counterpart of the reference's ``get_model`` dispatch
(``models/__init__.py:13-42``), but returning pytrees + pure functions
rather than nn.Modules.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ..config import CLIPConfig, PEFTConfig, resolve_clip_preset
from . import clip as clip_fns  # noqa: F401
from .init import init_clip_params, param_count  # noqa: F401
from .peft import init_peft  # noqa: F401


def build_clip(model_name: str = "ViT-B/16",
               pretrained_path: Optional[str] = None,
               rng=None):
    """Build CLIP params: from checkpoint if available, else seeded init.

    Mirrors reference ``clip_loader.load`` (models/clip/clip_loader.py:83)
    minus the network download (zero-egress environment).
    """
    if pretrained_path and os.path.exists(pretrained_path):
        from .convert import load_clip_params
        return load_clip_params(pretrained_path)
    cfg = resolve_clip_preset(model_name)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    return init_clip_params(rng, cfg), cfg


def build_peft(rng, clip_cfg: CLIPConfig, peft_cfg: PEFTConfig):
    if peft_cfg.method in ("none",):
        return {"vision": None, "text": None}
    return init_peft(rng, clip_cfg, peft_cfg)
