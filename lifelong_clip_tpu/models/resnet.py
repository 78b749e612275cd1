"""Functional ModifiedResNet visual tower (CLIP RN50 family).

Parity target: reference ``models/clip/model.py:113-191`` —
  * 3-conv stem (conv1 stride 2) + avgpool(2), all BN+ReLU
    (``ModifiedResNet.__init__:131-152``, ``stem()`` in ``forward:176-183``);
  * 4 bottleneck stages with anti-aliased strides: an avgpool precedes any
    stride>1 convolution, in both the main path (after conv2,
    ``Bottleneck.forward:50-63``) and the downsample shortcut
    (``Bottleneck.__init__:37-47``);
  * attention pooling instead of global average pooling
    (``AttentionPool2d:66-111``): mean token prepended, learned positional
    embedding, one multi-head attention with separate q/k/v/c projections,
    output read at the mean-token position.

TPU-first choices: NHWC layout with HWIO conv kernels (XLA's native TPU
conv layout), exact-window average pooling as a reshape+mean (no
reduce_window), BatchNorm folded to its inference-mode affine form in fp32
(the reference returns the model in ``.eval()``, ``build_model:1062``, and
this framework keeps backbones frozen), and the attention pool computed
with the pooled mean token as the ONLY query — the reference computes full
self-attention and discards all but row 0 (``AttentionPool2d.forward:111``),
so a single-query attention is mathematically identical at 1/(HW+1) the
FLOPs.

The RN tower takes no PEFT subtrees: the reference injects PEFT only into
transformer blocks (``Transformer.__init__``, model.py:639-683); its
ModifiedResNet has none.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPConfig

_P = jax.lax.Precision.HIGHEST


def _conv(x, w, stride: int = 1, padding: int = 0):
    """NHWC x HWIO conv."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_P)


def _bn(x, p, eps: float = 1e-5):
    """Inference-mode BatchNorm as an affine transform in fp32."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    y = (x.astype(jnp.float32) - p["mean"]) * (inv * p["scale"]) + p["bias"]
    return y.astype(x.dtype)


def _avgpool(x, k: int):
    """Exact-window average pool, kernel = stride = k (AvgPool2d(k))."""
    if k == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h // k, k, w // k, k, c)
    return x.mean(axis=(2, 4))


def _bottleneck(x, p, stride: int):
    """Reference Bottleneck.forward (model.py:50-63)."""
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], padding=1), p["bn2"]))
    out = _avgpool(out, stride)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if p.get("downsample") is not None:
        d = p["downsample"]
        identity = _bn(_conv(_avgpool(x, stride), d["conv"]), d["bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attnpool(x, p, n_heads: int):
    """AttentionPool2d (model.py:66-111) with the mean token as the only
    query — identical output to full self-attention read at row 0."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    mean = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)        # (B, HW+1, C)
    tokens = tokens + p["pos_embed"].astype(tokens.dtype)

    dh = c // n_heads
    q = (jnp.einsum("bd,de->be", tokens[:, 0].astype(jnp.float32),
                    p["q"]["w"], precision=_P) + p["q"]["b"])
    k = (jnp.einsum("btd,de->bte", tokens.astype(jnp.float32),
                    p["k"]["w"], precision=_P) + p["k"]["b"])
    v = (jnp.einsum("btd,de->bte", tokens.astype(jnp.float32),
                    p["v"]["w"], precision=_P) + p["v"]["b"])
    q = q.reshape(b, n_heads, dh)
    k = k.reshape(b, -1, n_heads, dh)
    v = v.reshape(b, -1, n_heads, dh)
    scores = jnp.einsum("bhd,bthd->bht", q, k, precision=_P) / np.sqrt(dh)
    attn = jax.nn.softmax(scores, axis=-1)
    pooled = jnp.einsum("bht,bthd->bhd", attn, v, precision=_P)
    pooled = pooled.reshape(b, c)
    out = jnp.einsum("bd,de->be", pooled, p["c"]["w"],
                     precision=_P) + p["c"]["b"]
    return out


def rn_encode_image(params, images, cfg: CLIPConfig,
                    compute_dtype=jnp.float32):
    """ModifiedResNet forward: (B, H, W, 3) -> (B, embed_dim)."""
    v = params["vision"]
    x = images.astype(compute_dtype)
    for s in range(3):
        st = v["stem"][s]
        x = jax.nn.relu(_bn(_conv(x, st["w"],
                                  stride=2 if s == 0 else 1, padding=1),
                            st["bn"]))
    x = _avgpool(x, 2)
    for stage_i, stage in enumerate(v["layers"]):
        stride = 1 if stage_i == 0 else 2
        for block_i, blk in enumerate(stage):
            x = _bottleneck(x, blk, stride if block_i == 0 else 1)
    emb = _attnpool(x, v["attnpool"], cfg.vision_heads)
    return emb.astype(compute_dtype)


def init_rn_params(rng, cfg: CLIPConfig):
    """Seeded random RN vision tree (matching the reference init scheme:
    attnpool projections std=C^-0.5, bn3 scale zero-init,
    model.py:857-869)."""
    width = cfg.vision_width
    layers = cfg.vision_layers  # tuple of 4 stage depths
    keys = iter(jax.random.split(rng, 256))

    def conv_w(k, kh, kw, cin, cout):
        fan_in = kh * kw * cin
        return jax.random.normal(k, (kh, kw, cin, cout),
                                 jnp.float32) / np.sqrt(fan_in)

    def bn_p(c, zero_scale=False):
        return {"scale": jnp.zeros((c,), jnp.float32) if zero_scale
                else jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32),
                "mean": jnp.zeros((c,), jnp.float32),
                "var": jnp.ones((c,), jnp.float32)}

    stem = [
        {"w": conv_w(next(keys), 3, 3, 3, width // 2), "bn": bn_p(width // 2)},
        {"w": conv_w(next(keys), 3, 3, width // 2, width // 2),
         "bn": bn_p(width // 2)},
        {"w": conv_w(next(keys), 3, 3, width // 2, width), "bn": bn_p(width)},
    ]

    stages = []
    inplanes = width
    for stage_i, depth in enumerate(layers):
        planes = width * (2 ** stage_i)
        stride = 1 if stage_i == 0 else 2
        stage = []
        for block_i in range(depth):
            blk = {
                "conv1": conv_w(next(keys), 1, 1, inplanes, planes),
                "bn1": bn_p(planes),
                "conv2": conv_w(next(keys), 3, 3, planes, planes),
                "bn2": bn_p(planes),
                "conv3": conv_w(next(keys), 1, 1, planes, planes * 4),
                "bn3": bn_p(planes * 4, zero_scale=True),
                "downsample": None,
            }
            if (stride if block_i == 0 else 1) > 1 or inplanes != planes * 4:
                blk["downsample"] = {
                    "conv": conv_w(next(keys), 1, 1, inplanes, planes * 4),
                    "bn": bn_p(planes * 4)}
            stage.append(blk)
            inplanes = planes * 4
        stages.append(stage)

    c = width * 32
    spacial = cfg.image_size // 32
    std = c ** -0.5

    def lin(k, din, dout):
        return {"w": jax.random.normal(k, (din, dout), jnp.float32) * std,
                "b": jnp.zeros((dout,), jnp.float32)}

    attnpool = {
        "pos_embed": jax.random.normal(
            next(keys), (spacial ** 2 + 1, c), jnp.float32) * std,
        "q": lin(next(keys), c, c), "k": lin(next(keys), c, c),
        "v": lin(next(keys), c, c), "c": lin(next(keys), c, cfg.embed_dim),
    }
    return {"stem": stem, "layers": stages, "attnpool": attnpool}


def rn_state_dict_to_vision(sd):
    """Map the reference RN ``visual.*`` state-dict keys into the
    functional tree (torch OIHW conv kernels -> HWIO; BN running stats kept
    for the inference-mode affine)."""

    def conv(key):
        return jnp.asarray(sd[key].transpose(2, 3, 1, 0))

    def bn(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"]),
                "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
                "var": jnp.asarray(sd[f"{prefix}.running_var"])}

    stem = [{"w": conv(f"visual.conv{i}.weight"), "bn": bn(f"visual.bn{i}")}
            for i in (1, 2, 3)]

    stages = []
    for s in (1, 2, 3, 4):
        depth = len({k.split(".")[2] for k in sd
                     if k.startswith(f"visual.layer{s}.")})
        stage = []
        for b in range(depth):
            p = f"visual.layer{s}.{b}"
            blk = {"conv1": conv(f"{p}.conv1.weight"), "bn1": bn(f"{p}.bn1"),
                   "conv2": conv(f"{p}.conv2.weight"), "bn2": bn(f"{p}.bn2"),
                   "conv3": conv(f"{p}.conv3.weight"), "bn3": bn(f"{p}.bn3"),
                   "downsample": None}
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample"] = {"conv": conv(f"{p}.downsample.0.weight"),
                                     "bn": bn(f"{p}.downsample.1")}
            stage.append(blk)
        stages.append(stage)

    def lin(prefix):
        return {"w": jnp.asarray(sd[f"{prefix}.weight"].T),
                "b": jnp.asarray(sd[f"{prefix}.bias"])}

    attnpool = {
        "pos_embed": jnp.asarray(sd["visual.attnpool.positional_embedding"]),
        "q": lin("visual.attnpool.q_proj"),
        "k": lin("visual.attnpool.k_proj"),
        "v": lin("visual.attnpool.v_proj"),
        "c": lin("visual.attnpool.c_proj"),
    }
    return {"stem": stem, "layers": stages, "attnpool": attnpool}
