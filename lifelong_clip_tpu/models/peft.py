"""PEFT parameter trees: LoRA, bottleneck adapters, MoE-adapters, prefixes.

The reference expresses PEFT as residual-block subclass swaps selected by a
``design_details`` dict (``models/clip/model.py:639-683``). Here each method
is just a parameter pytree, layer-stacked for ``lax.scan``, consumed by the
single block implementation in ``models/clip.py``. Only these trees are
passed to the optimizer — the backbone stays a frozen pytree, so "freeze
policies" (e.g. reference ``methods/adapter_clip.py:117-127``) are structural
rather than flag-flipping.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import CLIPConfig, PEFTConfig


def _kaiming_uniform(rng, shape, fan_in, a=math.sqrt(5)):
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def _xavier_uniform(rng, shape, fan_in, fan_out):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def init_lora(rng, layers: int, width: int, cfg: PEFTConfig):
    """Fused-qkv LoRA + out-proj LoRA per block.

    Init parity with the reference: in-proj A and B are xavier-uniform
    (``models/clip/lora.py:437-455`` — note B is *not* zero there), out-proj
    follows standard LoRA (A kaiming, B zeros; ``lora.py:119-127``).
    """
    r = cfg.lora_r
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "a_in": _xavier_uniform(k1, (layers, width, r), width, r),
        "b_in": _xavier_uniform(k2, (layers, r, 3 * width), r, 3 * width),
        "a_out": _kaiming_uniform(k3, (layers, width, r), width),
        "b_out": jnp.zeros((layers, r, width), jnp.float32),
    }


def init_adapter(rng, layers: int, width: int, cfg: PEFTConfig):
    """Bottleneck adapter per block (reference models/clip/adapter.py:36-50):
    down kaiming-uniform, up zeros, biases zero, fixed scale applied in fwd.
    """
    k = cfg.adapter_dim
    return {
        "w_down": _kaiming_uniform(rng, (layers, width, k), width),
        "b_down": jnp.zeros((layers, k), jnp.float32),
        "w_up": jnp.zeros((layers, k, width), jnp.float32),
        "b_up": jnp.zeros((layers, width), jnp.float32),
    }


def init_moe(rng, layers: int, width: int, cfg: PEFTConfig):
    """Noisy-top-k MoE of adapters (reference _MoA, model.py:445-636):
    router/noise weights zero-init, per-expert adapters as in init_adapter.
    """
    e = cfg.moe_experts
    ks = jax.random.split(rng, e)
    experts = [init_adapter(ks[i], layers, width, cfg) for i in range(e)]
    experts = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1), *experts)
    return {
        "router": jnp.zeros((layers, width, e), jnp.float32),
        "w_noise": jnp.zeros((layers, width, e), jnp.float32),
        "experts": experts,  # each leaf (layers, experts, ...)
    }


def init_tower_peft(rng, layers: int, width: int, cfg: PEFTConfig):
    if cfg.method == "lora":
        return {"lora": init_lora(rng, layers, width, cfg)}
    if cfg.method == "adapter":
        return {"adapter": init_adapter(rng, layers, width, cfg)}
    if cfg.method == "moe":
        return {"moe": init_moe(rng, layers, width, cfg)}
    raise ValueError(f"unknown tower PEFT method {cfg.method!r}")


def init_peft(rng, clip_cfg: CLIPConfig, cfg: PEFTConfig):
    """Returns {'vision': tree|None, 'text': tree|None} per PEFTConfig."""
    kv, kt = jax.random.split(rng)
    vision = (init_tower_peft(kv, clip_cfg.vision_layers,
                              clip_cfg.vision_width, cfg)
              if cfg.on_vision() else None)
    text = (init_tower_peft(kt, clip_cfg.text_layers, clip_cfg.text_width,
                            cfg)
            if cfg.on_text() else None)
    return {"vision": vision, "text": text}
