"""Pure-functional CLIP image/text towers with trace-time PEFT injection.

Capability parity target: the vendored CLIP at reference
``models/clip/model.py`` (``CLIP.encode_image/encode_text/forward``,
``:938-975``) including its PEFT block variants (``:639-683``). The design
inverts the reference's mutable-module approach: there is exactly one block
implementation, and LoRA / adapter / KV-prefix behavior comes from optional
parameter subtrees resolved at trace time, so every method compiles to the
same fused XLA program shape.

TPU-first choices:
  * transformer depth runs under ``lax.scan`` over layer-stacked parameters
    (one compiled block body; fast compiles, small HLO);
  * patch embedding is reshape+matmul (MXU) instead of a conv
    (reference uses cuDNN conv at ``models/clip/model.py:709-713``);
  * compute in bf16 with fp32 LayerNorm/softmax/accumulation (replacing the
    reference's CUDA AMP + fp32-upcast LayerNorm, ``model.py:194-200``);
  * batch-first layouts; no data-dependent Python control flow.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# f32 operands must multiply at full precision (JAX's default matmul
# precision truncates f32 inputs to bf16); bf16 operands are unaffected,
# so this costs nothing on the bf16 hot path.
_P = jax.lax.Precision.HIGHEST

from ..config import CLIPConfig, PEFTConfig
from ..ops.attention import causal_mask, multi_head_attention

# layers per lax.scan iteration (partial unroll). The early-r3 ~60 ms
# scan vs ~26 ms unrolled gap for the prompted ViT-B tower motivated a
# G=4 default, but the row-batched fused kernels erased it: measured
# late-r3, G=1 is equal-or-faster on EVERY config (lora 55.6 vs 56.6,
# mvp-clip 72.9 vs 74.3, maple 59.8 vs 63.3, proto stage-1 159.8 vs
# 163.3 ms) and G=4's larger live set pushes ViT-L/14 bs=64 over HBM at
# compile (g=1 un-remat'd 257.4 ms vs g=4 remat'd 288.9). A FULL unroll
# additionally explodes remote-compile time through the TPU tunnel.
# Env-tunable for sweeps.
import os
_SCAN_GROUP = int(os.environ.get("LLC_SCAN_GROUP", "1"))


def _resolve_group(n_layers: int, pref: Optional[int]) -> int:
    g = _SCAN_GROUP if pref is None else pref
    g = max(min(g, n_layers), 1)
    while n_layers % g:
        g -= 1
    return g


def layer_norm(x, p, eps: float = 1e-5):
    """LayerNorm computed in fp32 and cast back (reference model.py:194-200)."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dt)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _exact_gelu(x):
    # timm/AugReg ViTs use torch nn.GELU (erf form); jax.nn.gelu defaults
    # to the tanh approximation, which drifts ~1e-3 per op vs torch
    return jax.nn.gelu(x, approximate=False)


_ACTS = {"quick_gelu": quick_gelu, "gelu": _exact_gelu}


def _adapter_apply(y, p, scale: float):
    """Bottleneck adapter delta: scale * up(relu(down(y))).

    Matches reference ``models/clip/adapter.py:53-73`` with
    ``adapter_scalar=0.1``, no internal LayerNorm; the residual add happens
    at the call site (serial adapter, ``model.py:434-442``).
    """
    h = jnp.einsum("btd,dk->btk", y, p["w_down"],
                   preferred_element_type=jnp.float32, precision=_P) + p["b_down"]
    h = jax.nn.relu(h).astype(y.dtype)
    out = jnp.einsum("btk,kd->btd", h, p["w_up"],
                     preferred_element_type=jnp.float32, precision=_P) + p["b_up"]
    return (scale * out).astype(y.dtype)


def _block(x, blk, n_heads: int, mask, peft_cfg: Optional[PEFTConfig],
           peft, kv_prefix, attn_impl: str, act: str = "quick_gelu",
           prompt_ln: bool = False, base_grads: bool = True,
           moe_rng=None):
    """One residual attention block; PEFT branches resolve at trace time.

    ``prompt_ln`` selects sequence-append prompt semantics (reference
    ``prompt_tuning``, models/mvp_clip.py:157-175): appended prompt tokens
    pass through the block's ln_1 before becoming K/V. False = raw KV
    prefix (reference ``PromptedMultiheadAttention``, model.py:265-293).

    ``base_grads=False`` asserts the block's own weights are frozen (the
    caller differentiates only PEFT/prompt subtrees): the fused kernels'
    hand-written backward then skips the base-weight grad matmuls.
    """
    if kv_prefix is not None and prompt_ln:
        kv_prefix = jax.tree.map(lambda t: layer_norm(t, blk["ln_1"]),
                                 kv_prefix)
    lora = None
    adapter = None
    moe = None
    if peft is not None and peft_cfg is not None:
        if peft_cfg.method == "lora":
            lora = dict(peft["lora"],
                        scaling=peft_cfg.lora_alpha / peft_cfg.lora_r)
        elif peft_cfg.method == "adapter":
            adapter = peft.get("adapter")
        elif peft_cfg.method == "moe":
            moe = peft.get("moe")

    from ..ops.attention import default_impl
    resolved = attn_impl or default_impl()
    # PEFT-free vanilla self-attention on TPU: one fully-fused VMEM
    # program per batch row (LN + qkv + SDPA + out + residual) — measured
    # 2.6x faster than the unfused chain at ViT-B/16 shapes
    square_mask = mask is None or (
        hasattr(mask, "ndim") and mask.ndim <= 2
        and mask.shape[-1] == x.shape[1])
    if resolved == "pallas" and kv_prefix is None and square_mask:
        from ..ops.fused_block_attn import fused_ln_attention_block
        lora_arrays = None
        lora_scaling = 0.0
        if lora is not None:
            lora_scaling = float(lora["scaling"])
            lora_arrays = {k: lora[k]
                           for k in ("a_in", "b_in", "a_out", "b_out")}
        y = fused_ln_attention_block(
            x, blk["ln_1"]["scale"], blk["ln_1"]["bias"],
            blk["attn"]["w_qkv"], blk["attn"]["b_qkv"],
            blk["attn"]["w_out"], blk["attn"]["b_out"], n_heads,
            lora_scaling, mask, lora_arrays, base_grads)
        if adapter is not None:
            y = y + _adapter_apply(y - x, adapter, peft_cfg.adapter_scale)
        return _mlp_half(y, blk, adapter, moe, act, peft_cfg, moe_rng)

    # prompted blocks (prompt pools / prefix prompts): fused kernel with
    # pk/pv joining the KV source
    if resolved == "pallas" and kv_prefix is not None and lora is None:
        pk, pv = (kv_prefix["k"], kv_prefix["v"]) \
            if isinstance(kv_prefix, dict) else (kv_prefix, kv_prefix)
        m2 = mask
        if m2 is not None and m2.ndim > 2 and all(
                s == 1 for s in m2.shape[:-2]):
            m2 = m2.reshape(m2.shape[-2:]) if m2.shape[-2] != 1 \
                else m2.reshape(m2.shape[-1:])
        prefix_ok = (m2 is None or (hasattr(m2, "ndim") and m2.ndim <= 2
                     and m2.shape[-1] == x.shape[1] + pk.shape[1]))
        if prefix_ok:
            from ..ops.fused_block_attn import fused_prefix_attention_block
            y = fused_prefix_attention_block(
                x, pk, pv, blk["ln_1"]["scale"], blk["ln_1"]["bias"],
                blk["attn"]["w_qkv"], blk["attn"]["b_qkv"],
                blk["attn"]["w_out"], blk["attn"]["b_out"], n_heads, m2,
                base_grads)
            if adapter is not None:
                y = y + _adapter_apply(y - x, adapter,
                                       peft_cfg.adapter_scale)
            return _mlp_half(y, blk, adapter, moe, act, peft_cfg, moe_rng)

    h = layer_norm(x, blk["ln_1"])
    if kv_prefix is None:
        x_kv = h
    elif isinstance(kv_prefix, dict):
        # asymmetric prefixes: Ek on the key path, Ev on the value path
        x_kv = (jnp.concatenate([kv_prefix["k"].astype(h.dtype), h], axis=1),
                jnp.concatenate([kv_prefix["v"].astype(h.dtype), h], axis=1))
    else:
        x_kv = jnp.concatenate([kv_prefix.astype(h.dtype), h], axis=1)
    a = multi_head_attention(h, blk["attn"], n_heads, x_kv=x_kv, mask=mask,
                             lora=lora, impl=attn_impl)
    if adapter is not None:
        a = a + _adapter_apply(a, adapter, peft_cfg.adapter_scale)
    x = x + a

    return _mlp_half(x, blk, adapter, moe, act, peft_cfg, moe_rng)


def _mlp_half(x, blk, adapter, moe, act, peft_cfg=None, moe_rng=None):
    """Second block half: x + MLP(LN2(x)) (+ adapter/MoE deltas).

    The two (B, T, 4D) hidden tensors carry the ``mlp_hidden`` checkpoint
    name: under ``remat='mlp'`` (transformer below) the backward saves
    everything EXCEPT them and recomputes just fc+act — they are the
    activation set that spills HBM at bs>=128 (BASELINE.md scaling
    table), and whole-scan remat measured slower than the spill."""
    from jax.ad_checkpoint import checkpoint_name
    h = layer_norm(x, blk["ln_2"])
    m = jnp.einsum("btd,de->bte", h, blk["mlp"]["w_fc"],
                   preferred_element_type=jnp.float32,
                   precision=_P) + blk["mlp"]["b_fc"]
    m = checkpoint_name(m, "mlp_hidden")
    m = _ACTS[act](m.astype(h.dtype))
    m = checkpoint_name(m, "mlp_hidden")
    m = jnp.einsum("bte,ed->btd", m, blk["mlp"]["w_proj"],
                   preferred_element_type=jnp.float32,
                   precision=_P) + blk["mlp"]["b_proj"]
    m = m.astype(h.dtype)
    if adapter is not None:
        m = m + _adapter_apply(m, adapter, peft_cfg.adapter_scale)
    if moe is not None:
        # MoE-of-adapters delta joins the MLP residual, gated on the CLS
        # token of the post-attention activations (reference _MoA.forward,
        # models/clip/model.py:596-636) — dense all-expert combine instead
        # of data-dependent scatter/gather. A per-layer ``moe_rng`` turns
        # on the reference's train-time gate noise (noisy_top_k_gating,
        # model.py:571-576); eval passes rng=None for clean-logit gating.
        from ..ops.moe import moe_adapter_apply
        m = m + moe_adapter_apply(x, moe, peft_cfg, rng=moe_rng)
    return x + m


def transformer(x,
                blocks,
                n_heads: int,
                *,
                mask=None,
                peft_cfg: Optional[PEFTConfig] = None,
                peft=None,
                layer_prompts=None,
                layer_prompt_valid=None,
                attn_impl: Optional[str] = None,
                act: str = "quick_gelu",
                prompt_ln: bool = False,
                remat: bool = False,
                collect_inputs: bool = False,
                base_grads: bool = True,
                moe_rng=None,
                scan_group: Optional[int] = None):
    """Scan the stacked residual blocks over the depth axis.

    ``remat=True`` wraps the scan body in ``jax.checkpoint`` so the
    backward pass recomputes per-block intermediates instead of saving
    them — HBM activation footprint drops from O(layers · block
    intermediates) to O(layers · block inputs). Used by giant-batch
    passes like ProtoCLIP's B·C per-(sample, class) text encoding.

    ``blocks``/``peft``/``layer_prompts`` are layer-stacked pytrees
    (leading dim = n_layers). ``layer_prompts`` of shape (L, B, P, D) —
    or (L, P, D), broadcast over batch — are consumed as KV-side prefix
    tokens per layer. Two prompt semantics exist in the reference and
    ``prompt_ln`` selects between them: False = raw KV prefix
    (``PromptedMultiheadAttention``, model.py:265-293); True = MVP's
    append-then-truncate ``prompt_tuning`` (models/mvp_clip.py:157-175),
    where appended tokens pass through each block's ln_1 before the
    attention projections. Truncated prompt-token outputs only influence
    retained tokens through attention KV, so per-layer KV injection plus
    the ln_1 is exactly equivalent (parity-tested in
    tests/test_reference_parity.py::test_mvp_prompt_tuning_parity).

    ``layer_prompt_valid`` (L, P) bool marks which prefix slots are live
    per layer — this lets pools with different prompt lengths per layer
    share one padded scan (invalid slots are attention-masked out).
    """
    xs = {"blk": blocks}
    if peft is not None:
        xs["peft"] = peft
    if moe_rng is not None and peft_cfg is not None \
            and peft_cfg.method == "moe":
        # one key per layer as scan data — each block's gate noise draw is
        # independent (mirrors per-module noise in reference _MoA). Keys
        # MUST arrive as step arguments, never jit-captured constants
        # (constant folding would freeze the "noise").
        n_layers = jax.tree.leaves(blocks)[0].shape[0]
        xs["moe_rng"] = jax.random.split(moe_rng, n_layers)
    if layer_prompts is not None:
        def bcast(lp):
            if lp.ndim == 3:
                lp = jnp.broadcast_to(
                    lp[:, None], (lp.shape[0], x.shape[0]) + lp.shape[1:])
            return lp

        # dict {'k','v'} = asymmetric prefixes (CoPL Ek/Ev); array = shared
        layer_prompts = jax.tree.map(bcast, layer_prompts)
        xs["prompts"] = layer_prompts
        if layer_prompt_valid is not None:
            t = x.shape[1]
            prefix_mask = jnp.where(layer_prompt_valid, 0.0, -jnp.inf)
            full = jnp.concatenate(
                [prefix_mask, jnp.zeros((prefix_mask.shape[0], t))], axis=1)
            # (L, 1, 1, P + T): broadcast over batch, heads, queries
            xs["pmask"] = full[:, None, None, :]

    n_layers = jax.tree.leaves(blocks)[0].shape[0]
    g = _resolve_group(n_layers, scan_group)
    if g > 1:
        xs = jax.tree.map(
            lambda a: a.reshape((n_layers // g, g) + a.shape[1:]), xs)

    def one_layer(h, sl):
        m = mask
        if "pmask" in sl:
            m = sl["pmask"] if m is None else m + sl["pmask"]
        return _block(h, sl["blk"], n_heads, m, peft_cfg, sl.get("peft"),
                      sl.get("prompts"), attn_impl, act,
                      prompt_ln=prompt_ln, base_grads=base_grads,
                      moe_rng=sl.get("moe_rng"))

    def body(h, sl):
        if g == 1:
            return one_layer(h, sl), (h if collect_inputs else None)
        ins = []
        for j in range(g):
            if collect_inputs:
                ins.append(h)
            h = one_layer(h, jax.tree.map(lambda a: a[j], sl))
        return h, (jnp.stack(ins) if collect_inputs else None)

    if remat == "mlp":
        # selective: save every residual except the (B, T, 4D) MLP
        # hiddens (tagged in _mlp_half) — the backward recomputes only
        # fc+act, trading ~1/3 of the MLP fwd FLOPs for the exact
        # activation set that spills HBM at bs>=128
        wrapped = jax.checkpoint(
            body, policy=jax.checkpoint_policies
            .save_anything_except_these_names("mlp_hidden"))
    elif remat:
        wrapped = jax.checkpoint(body)
    else:
        wrapped = body
    x, layer_inputs = jax.lax.scan(wrapped, x, xs)
    if collect_inputs:
        # per-layer block INPUTS (L, B, T, D) — the states a later pass can
        # inject as ln_1-processed KV prefixes (prefix sharing: under a
        # causal mask these are independent of any tokens to their right)
        if g > 1:
            layer_inputs = layer_inputs.reshape(
                (n_layers,) + layer_inputs.shape[2:])
        return x, layer_inputs
    return x


def _cast_tree(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree)


def extract_patches(images, patch_size: int):
    """(B, H, W, 3) -> (B, N, P*P*3) patch vectors, flattened (ph, pw, c)."""
    b, h, w, c = images.shape
    gh, gw = h // patch_size, w // patch_size
    x = images.reshape(b, gh, patch_size, gw, patch_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, P, P, C)
    return x.reshape(b, gh * gw, patch_size * patch_size * c)


def encode_image(params,
                 images,
                 cfg: CLIPConfig,
                 *,
                 peft_cfg: Optional[PEFTConfig] = None,
                 peft=None,
                 layer_prompts=None,
                 compute_dtype=jnp.bfloat16,
                 attn_impl: Optional[str] = None,
                 return_tokens: bool = False,
                 base_grads: bool = True,
                 depth_runner=None,
                 moe_rng=None,
                 remat: bool = False):
    """Vision tower. ``images``: (B, H, W, 3) normalized floats.

    ``remat=True`` checkpoints the block scan (backward recomputes block
    intermediates) — the large-batch (bs>=128) activation-spill fix.

    ``depth_runner`` swaps the depth loop implementation (same signature
    as ``transformer``) — e.g. parallel/pipeline.py's pipelined runner.

    Returns the projected CLS embedding (B, embed_dim); with
    ``return_tokens`` also the final token sequence (for prompt-pool query
    extraction, cf. ``get_patch_feature`` at reference model.py:731-753).

    ``cfg.tower == "rn"`` dispatches to the ModifiedResNet tower
    (reference model.py:113-191) — which, like the reference's, carries no
    PEFT subtrees (PEFT block swaps happen only in ``Transformer``,
    model.py:639-683).
    """
    if getattr(cfg, "tower", "vit") == "rn":
        assert peft is None and layer_prompts is None and not return_tokens,\
            "the ModifiedResNet tower takes no PEFT/prompt subtrees"
        from .resnet import rn_encode_image
        return rn_encode_image(params, images, cfg,
                               compute_dtype=compute_dtype)
    v = _cast_tree(params["vision"], compute_dtype)
    pv = _cast_tree(peft, compute_dtype) if peft is not None else None
    x = extract_patches(images.astype(compute_dtype), cfg.patch_size)
    x = jnp.einsum("bnp,pd->bnd", x, v["patch_kernel"],
                   preferred_element_type=jnp.float32, precision=_P).astype(compute_dtype)
    if "patch_bias" in v:   # timm ViTs: conv proj has a bias (CLIP's not)
        x = x + v["patch_bias"].astype(compute_dtype)
    cls = jnp.broadcast_to(v["class_embedding"],
                           (x.shape[0], 1, cfg.vision_width))
    x = jnp.concatenate([cls.astype(compute_dtype), x], axis=1)
    x = x + v["pos_embed"].astype(compute_dtype)
    if cfg.use_ln_pre:
        x = layer_norm(x, v["ln_pre"])
    runner = depth_runner or transformer
    extra = {} if moe_rng is None else {"moe_rng": moe_rng}
    if remat:
        extra["remat"] = True     # conditional: alternate depth_runners
    x = runner(x, v["blocks"], cfg.vision_heads,
               peft_cfg=peft_cfg if (peft_cfg and peft_cfg.on_vision())
               else None,
               peft=pv, layer_prompts=layer_prompts,
               attn_impl=attn_impl, act=cfg.act,
               base_grads=base_grads, **extra)
    pooled = layer_norm(x[:, :1], v["ln_post"])[:, 0]
    emb = jnp.einsum("bd,de->be", pooled, v["proj"],
                     preferred_element_type=jnp.float32, precision=_P)
    emb = emb.astype(compute_dtype)
    if return_tokens:
        return emb, x
    return emb


def encode_text(params,
                tokens,
                cfg: CLIPConfig,
                *,
                peft_cfg: Optional[PEFTConfig] = None,
                peft=None,
                layer_prompts=None,
                compute_dtype=jnp.bfloat16,
                attn_impl: Optional[str] = None,
                base_grads: bool = True,
                moe_rng=None,
                remat: bool = False):
    """Text tower. ``tokens``: (B, context_length) int32.

    Pools features at the EOT position (argmax of token ids — EOT has the
    largest id; parity with reference model.py:941-956).
    """
    t = _cast_tree(params["text"], compute_dtype)
    pt = _cast_tree(peft, compute_dtype) if peft is not None else None
    x = t["token_embedding"][tokens].astype(compute_dtype)
    x = x + t["pos_embed"].astype(compute_dtype)
    prefix = 0 if layer_prompts is None else layer_prompts.shape[-2]
    mask = causal_mask(cfg.context_length, prefix=prefix)
    x = transformer(x, t["blocks"], cfg.text_heads, mask=mask,
                    peft_cfg=peft_cfg if (peft_cfg and peft_cfg.on_text())
                    else None,
                    peft=pt, layer_prompts=layer_prompts,
                    attn_impl=attn_impl, act=cfg.act,
                    base_grads=base_grads, moe_rng=moe_rng, remat=remat)
    x = layer_norm(x, t["ln_final"])
    eot = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None].astype(jnp.int32),
                                 axis=1)[:, 0]
    emb = jnp.einsum("bd,de->be", pooled, t["text_projection"],
                     preferred_element_type=jnp.float32, precision=_P)
    return emb.astype(compute_dtype)


def normalize(x, eps: float = 1e-8):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / (n + eps)).astype(x.dtype)


def clip_forward(params,
                 images,
                 tokens,
                 cfg: CLIPConfig,
                 *,
                 peft_cfg: Optional[PEFTConfig] = None,
                 peft_vision=None,
                 peft_text=None,
                 compute_dtype=jnp.bfloat16,
                 attn_impl: Optional[str] = None,
                 base_grads: bool = True,
                 moe_rng=None,
                 remat: bool = False):
    """Joint forward: (logits_per_image, image_feats, text_feats).

    Parity with reference ``CLIP.forward`` (model.py:958-975), minus the
    transposed duplicate logits_per_text (derivable by the caller).
    ``moe_rng`` (train steps only) turns on noisy top-k gating in any MoE
    blocks; None (the eval default) gates on clean logits.
    """
    rng_v = rng_t = None
    if moe_rng is not None:
        rng_v, rng_t = jax.random.split(moe_rng)
    img = normalize(encode_image(params, images, cfg, peft_cfg=peft_cfg,
                                 peft=peft_vision,
                                 compute_dtype=compute_dtype,
                                 attn_impl=attn_impl,
                                 base_grads=base_grads, moe_rng=rng_v,
                                 remat=remat))
    txt = normalize(encode_text(params, tokens, cfg, peft_cfg=peft_cfg,
                                peft=peft_text, compute_dtype=compute_dtype,
                                attn_impl=attn_impl,
                                base_grads=base_grads, moe_rng=rng_t,
                                remat=remat))
    scale = jnp.exp(params["logit_scale"]).astype(jnp.float32)
    logits = scale * jnp.einsum("be,ce->bc", img.astype(jnp.float32),
                                txt.astype(jnp.float32), precision=_P)
    return logits, img, txt
