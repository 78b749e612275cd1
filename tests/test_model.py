"""CLIP tower tests: shapes, dtype policy, PEFT identity/effect properties.

Key invariants (cheap substitutes for golden-logit parity until a real
checkpoint is available):
  * zero-init'd adapter and out-LoRA-B leave the forward numerically close
    to the vanilla tower at init (the PEFT deltas are residual);
  * text pooling picks the EOT position;
  * LayerNorm computes in fp32 under bf16 compute;
  * fused attention matches an explicit per-head reference computation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelong_clip_tpu.config import CLIPConfig, PEFTConfig
from lifelong_clip_tpu.models import build_peft, clip_fns
from lifelong_clip_tpu.models.init import init_clip_params, param_count
from lifelong_clip_tpu.ops.attention import (causal_mask,
                                             multi_head_attention)

TINY = CLIPConfig(embed_dim=64, image_size=32, patch_size=8,
                  vision_width=64, vision_layers=2, vision_heads=4,
                  context_length=16, vocab_size=1000, text_width=64,
                  text_heads=4, text_layers=2)


@pytest.fixture(scope="module")
def tiny_params():
    return init_clip_params(jax.random.PRNGKey(0), TINY)


def test_param_count_vit_b16():
    params = init_clip_params(jax.random.PRNGKey(0), CLIPConfig())
    # OpenAI ViT-B/16 has 149,620,737 params (visual 86M + text 63M)
    assert param_count(params) == 149_620_737


def test_encode_shapes(tiny_params):
    imgs = jnp.zeros((4, 32, 32, 3), jnp.float32)
    toks = np.zeros((5, 16), np.int32)
    toks[:, 0] = 999
    toks[:, 3] = 998  # pretend eot at pos 3 via argmax
    img_f = clip_fns.encode_image(tiny_params, imgs, TINY)
    txt_f = clip_fns.encode_text(tiny_params, jnp.asarray(toks), TINY)
    assert img_f.shape == (4, 64)
    assert txt_f.shape == (5, 64)


def test_clip_forward_logits(tiny_params):
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    toks = np.zeros((7, 16), np.int32)
    toks[:, 0] = 1
    toks[np.arange(7), 1 + np.arange(7) % 3] = 999
    logits, img_f, txt_f = clip_fns.clip_forward(
        tiny_params, imgs, jnp.asarray(toks), TINY)
    assert logits.shape == (4, 7)
    n = jnp.linalg.norm(img_f.astype(jnp.float32), axis=-1)
    np.testing.assert_allclose(np.asarray(n), 1.0, atol=1e-2)


def test_text_pooling_is_eot_position(tiny_params):
    """Moving tokens after the argmax position must not change the output."""
    toks = np.zeros((1, 16), np.int32)
    toks[0, 0] = 5
    toks[0, 1] = 999  # eot-like max id at position 1
    a = clip_fns.encode_text(tiny_params, jnp.asarray(toks), TINY,
                             compute_dtype=jnp.float32)
    toks2 = toks.copy()
    toks2[0, 3] = 7  # pad garbage after eot
    b = clip_fns.encode_text(tiny_params, jnp.asarray(toks2), TINY,
                             compute_dtype=jnp.float32)
    # pooling position identical; later tokens only affect other positions
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_layernorm_fp32_upcast():
    x = (jnp.ones((2, 4, 8), jnp.bfloat16) * 300 +
         jnp.arange(8, dtype=jnp.bfloat16) * 0.01)
    p = {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))}
    y = clip_fns.layer_norm(x, p)
    assert y.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))


def test_attention_matches_explicit_reference():
    """Fused einsum MHA == naive per-head loop computation."""
    rng = jax.random.PRNGKey(3)
    d, h, t, b = 32, 4, 9, 2
    ks = jax.random.split(rng, 5)
    params = {
        "w_qkv": jax.random.normal(ks[0], (d, 3 * d)) * 0.1,
        "b_qkv": jax.random.normal(ks[1], (3 * d,)) * 0.1,
        "w_out": jax.random.normal(ks[2], (d, d)) * 0.1,
        "b_out": jax.random.normal(ks[3], (d,)) * 0.1,
    }
    x = jax.random.normal(ks[4], (b, t, d))
    out = multi_head_attention(x, params, h)

    # naive reference (pure numpy — jnp matmuls default to bf16 precision)
    qkv = (np.asarray(x) @ np.asarray(params["w_qkv"])
           + np.asarray(params["b_qkv"]))
    q, k, v = np.split(qkv, 3, axis=-1)
    dh = d // h
    ctx = np.zeros((b, t, d))
    for bi in range(b):
        for hi in range(h):
            qs = q[bi, :, hi * dh:(hi + 1) * dh]
            ks_ = k[bi, :, hi * dh:(hi + 1) * dh]
            vs = v[bi, :, hi * dh:(hi + 1) * dh]
            att = qs @ ks_.T / np.sqrt(dh)
            att = np.exp(att - att.max(-1, keepdims=True))
            att = att / att.sum(-1, keepdims=True)
            ctx[bi, :, hi * dh:(hi + 1) * dh] = att @ vs
    expected = ctx @ np.asarray(params["w_out"]) + np.asarray(params["b_out"])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_causal_mask_prefix():
    m = causal_mask(4, prefix=2)
    assert m.shape == (4, 6)
    assert np.isfinite(np.asarray(m[:, :2])).all()  # prefix always visible
    assert np.asarray(m)[0, 3] == -np.inf
    assert np.isfinite(np.asarray(m)[3, 5])


def test_adapter_is_identity_at_init(tiny_params):
    """Adapter up-proj is zero-init -> forward equals vanilla at init."""
    peft_cfg = PEFTConfig(method="adapter", encoder="image")
    peft = build_peft(jax.random.PRNGKey(9), TINY, peft_cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    base = clip_fns.encode_image(tiny_params, imgs, TINY,
                                 compute_dtype=jnp.float32)
    with_peft = clip_fns.encode_image(tiny_params, imgs, TINY,
                                      peft_cfg=peft_cfg,
                                      peft=peft["vision"],
                                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_peft),
                               atol=1e-5)


def test_lora_changes_forward(tiny_params):
    """Reference in-proj LoRA B is xavier (non-zero) -> output differs."""
    peft_cfg = PEFTConfig(method="lora", encoder="image", lora_r=4)
    peft = build_peft(jax.random.PRNGKey(9), TINY, peft_cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    base = clip_fns.encode_image(tiny_params, imgs, TINY,
                                 compute_dtype=jnp.float32)
    with_peft = clip_fns.encode_image(tiny_params, imgs, TINY,
                                      peft_cfg=peft_cfg,
                                      peft=peft["vision"],
                                      compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(base), np.asarray(with_peft))


def test_moe_forward_runs(tiny_params):
    peft_cfg = PEFTConfig(method="moe", encoder="image", moe_experts=2)
    peft = build_peft(jax.random.PRNGKey(9), TINY, peft_cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    out = clip_fns.encode_image(tiny_params, imgs, TINY, peft_cfg=peft_cfg,
                                peft=peft["vision"],
                                compute_dtype=jnp.float32)
    assert out.shape == (2, 64)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_moe_train_gate_noise_varies_with_key(tiny_params):
    """moe_rng turns on noisy top-k gating (reference model.py:571-576):
    different keys -> different outputs; rng=None (eval) is deterministic
    clean-logit gating."""
    peft_cfg = PEFTConfig(method="moe", encoder="image", moe_experts=4,
                          moe_top_k=2)
    peft = build_peft(jax.random.PRNGKey(9), TINY, peft_cfg)
    # experts are zero-init (residual delta) — make them matter so gate
    # perturbations reach the output
    peft["vision"]["moe"]["experts"]["w_up"] = jax.random.normal(
        jax.random.PRNGKey(3),
        peft["vision"]["moe"]["experts"]["w_up"].shape)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))

    def run(moe_rng):
        return np.asarray(clip_fns.encode_image(
            tiny_params, imgs, TINY, peft_cfg=peft_cfg,
            peft=peft["vision"], compute_dtype=jnp.float32,
            moe_rng=moe_rng))

    a = run(jax.random.PRNGKey(0))
    b = run(jax.random.PRNGKey(1))
    clean1 = run(None)
    clean2 = run(None)
    assert not np.allclose(a, b)
    np.testing.assert_array_equal(clean1, clean2)
    assert np.isfinite(a).all() and np.isfinite(b).all()


def test_kv_prefix_prompts(tiny_params):
    """Layer prompts change the output and keep shapes fixed."""
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    prompts = jax.random.normal(jax.random.PRNGKey(4),
                                (TINY.vision_layers, 3, TINY.vision_width))
    base = clip_fns.encode_image(tiny_params, imgs, TINY,
                                 compute_dtype=jnp.float32)
    out = clip_fns.encode_image(tiny_params, imgs, TINY,
                                layer_prompts=prompts,
                                compute_dtype=jnp.float32)
    assert out.shape == base.shape
    assert not np.allclose(np.asarray(base), np.asarray(out))


def test_jit_and_grad_through_peft(tiny_params):
    peft_cfg = PEFTConfig(method="lora", encoder="image")
    peft = build_peft(jax.random.PRNGKey(9), TINY, peft_cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))

    @jax.jit
    def loss_fn(pv):
        f = clip_fns.encode_image(tiny_params, imgs, TINY,
                                  peft_cfg=peft_cfg, peft=pv,
                                  compute_dtype=jnp.float32)
        return jnp.sum(f ** 2)

    g = jax.grad(loss_fn)(peft["vision"])
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


def test_timm_vit_converter_and_variant():
    """timm-layout state dict -> tower pytree; gelu/no-ln_pre variant runs
    and the head comes back separately."""
    from lifelong_clip_tpu.models.convert import timm_vit_to_params
    rng = np.random.default_rng(0)
    d, layers, patch, n_cls = 64, 2, 8, 10

    sd = {
        "cls_token": rng.normal(size=(1, 1, d)).astype(np.float32),
        "pos_embed": rng.normal(size=(1, 17, d)).astype(np.float32),
        "patch_embed.proj.weight": rng.normal(
            size=(d, 3, patch, patch)).astype(np.float32),
        "norm.weight": np.ones((d,), np.float32),
        "norm.bias": np.zeros((d,), np.float32),
        "head.weight": rng.normal(size=(n_cls, d)).astype(np.float32),
        "head.bias": np.zeros((n_cls,), np.float32),
    }
    for i in range(layers):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = np.ones((d,), np.float32)
        sd[f"{p}.norm1.bias"] = np.zeros((d,), np.float32)
        sd[f"{p}.attn.qkv.weight"] = rng.normal(
            size=(3 * d, d)).astype(np.float32) * 0.05
        sd[f"{p}.attn.qkv.bias"] = np.zeros((3 * d,), np.float32)
        sd[f"{p}.attn.proj.weight"] = rng.normal(
            size=(d, d)).astype(np.float32) * 0.05
        sd[f"{p}.attn.proj.bias"] = np.zeros((d,), np.float32)
        sd[f"{p}.norm2.weight"] = np.ones((d,), np.float32)
        sd[f"{p}.norm2.bias"] = np.zeros((d,), np.float32)
        sd[f"{p}.mlp.fc1.weight"] = rng.normal(
            size=(4 * d, d)).astype(np.float32) * 0.05
        sd[f"{p}.mlp.fc1.bias"] = np.zeros((4 * d,), np.float32)
        sd[f"{p}.mlp.fc2.weight"] = rng.normal(
            size=(d, 4 * d)).astype(np.float32) * 0.05
        sd[f"{p}.mlp.fc2.bias"] = np.zeros((d,), np.float32)

    params, cfg, head = timm_vit_to_params(sd)
    assert cfg.act == "gelu" and not cfg.use_ln_pre
    assert cfg.vision_layers == layers and cfg.patch_size == patch
    assert head["w"].shape == (d, n_cls)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    feats = clip_fns.encode_image(params, imgs, cfg,
                                  compute_dtype=jnp.float32)
    assert feats.shape == (2, d)
    assert np.isfinite(np.asarray(feats)).all()
    # identity proj: features == normed CLS
    logits = np.asarray(feats) @ np.asarray(head["w"]) + \
        np.asarray(head["b"])
    assert logits.shape == (2, n_cls)
