"""Golden numerical parity against the reference's torch CLIP.

Instantiates the reference's vendored ``models/clip/model.py:CLIP`` at a
tiny size (CPU torch), converts its state dict through
``models/convert.py:state_dict_to_params``, and compares encoder outputs
and joint logits on identical inputs. This validates BOTH the converter's
key/layout mapping and the functional towers' math (LayerNorm semantics,
QuickGELU, causal masking, EOT pooling, logit scaling) — without needing
the OpenAI checkpoint on disk.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference tree unavailable")


@pytest.fixture(scope="module")
def ref_and_ours():
    import torch
    # the reference visual forward calls .cuda() unconditionally
    # (model.py:768); make it a no-op on this CPU-only torch build
    torch.Tensor.cuda = lambda self, *a, **k: self
    # the reference package __init__ imports timm (unavailable); load the
    # vendored CLIP as a synthetic package rooted at models/clip instead
    import importlib.util
    import types
    try:
        pkg = types.ModuleType("refclip")
        pkg.__path__ = [os.path.join(REFERENCE, "models", "clip")]
        sys.modules["refclip"] = pkg
        spec = importlib.util.spec_from_file_location(
            "refclip.model",
            os.path.join(REFERENCE, "models", "clip", "model.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refclip.model"] = mod
        spec.loader.exec_module(mod)
        RefCLIP = mod.CLIP
    except Exception as e:
        pytest.skip(f"reference CLIP not importable: {e}")

    torch.manual_seed(0)
    # tiny-but-real dims: width 64 (1 head of 64), 2+2 layers, patch 8
    # NOTE: the reference's VisualTransformer.forward passes prompt= to
    # every block (model.py:780), but only the prefix block class accepts
    # it — the snapshot's image path CRASHES for vanilla/lora/adapter
    # design_details (verified; consistent with the crash in its
    # nohup.out). prefix_prompt blocks with no prompt module are
    # numerically identical to vanilla attention, so parity is checked
    # through that configuration.
    ref = RefCLIP(embed_dim=32, image_resolution=32, vision_layers=2,
                  vision_width=64, vision_patch_size=8, context_length=16,
                  vocab_size=100, transformer_width=64,
                  transformer_heads=1, transformer_layers=2,
                  design_details={"method": "prefix_prompt",
                                  "peft_encoder": "image"}).float().eval()

    sd = {k: v.float().cpu().numpy() for k, v in ref.state_dict().items()}
    from lifelong_clip_tpu.models.convert import state_dict_to_params
    from lifelong_clip_tpu.config import CLIPConfig
    cfg = CLIPConfig(embed_dim=32, image_size=32, patch_size=8,
                     vision_width=64, vision_layers=2, vision_heads=1,
                     context_length=16, vocab_size=100, text_width=64,
                     text_heads=1, text_layers=2)
    params, _ = state_dict_to_params(sd, cfg)
    return ref, params, cfg


def _inputs():
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    toks = np.zeros((4, 16), np.int64)
    toks[:, 0] = 99
    for i in range(4):
        toks[i, 1:3 + i] = rng.integers(1, 90, 2 + i)
        toks[i, 3 + i] = 98  # highest-id token inside -> argmax pooling pos
    # ensure argmax picks the eot slot: make 99 the sot? argmax finds 99 at
    # position 0... reference pools at argmax(tokens) — use 99 as eot at
    # the end instead
    toks[:, 0] = 1
    for i in range(4):
        toks[i, 3 + i] = 99
    return imgs, toks


def test_encode_image_parity(ref_and_ours):
    import jax.numpy as jnp
    import torch
    from lifelong_clip_tpu.models import clip as clip_fns
    ref, params, cfg = ref_and_ours
    imgs, _ = _inputs()
    with torch.no_grad():
        ref_out = ref.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(clip_fns.encode_image(
        params, jnp.asarray(imgs), cfg, compute_dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=2e-3)


def test_encode_text_parity(ref_and_ours):
    import jax.numpy as jnp
    import torch
    from lifelong_clip_tpu.models import clip as clip_fns
    ref, params, cfg = ref_and_ours
    _, toks = _inputs()
    with torch.no_grad():
        ref_out = ref.encode_text(torch.from_numpy(toks)).numpy()
    ours = np.asarray(clip_fns.encode_text(
        params, jnp.asarray(toks.astype(np.int32)), cfg,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=2e-3)


def test_joint_logits_parity(ref_and_ours):
    import jax.numpy as jnp
    import torch
    from lifelong_clip_tpu.models import clip as clip_fns
    ref, params, cfg = ref_and_ours
    imgs, toks = _inputs()
    with torch.no_grad():
        ref_logits, _, _, _ = ref(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
            torch.from_numpy(toks))
    logits, _, _ = clip_fns.clip_forward(
        params, jnp.asarray(imgs), jnp.asarray(toks.astype(np.int32)),
        cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=3e-3, rtol=3e-3)


def _ref_clip(design_details):
    import torch
    import importlib.util
    import types
    torch.Tensor.cuda = lambda self, *a, **k: self
    if "refclip.model" not in sys.modules:
        pkg = types.ModuleType("refclip")
        pkg.__path__ = [os.path.join(REFERENCE, "models", "clip")]
        sys.modules["refclip"] = pkg
        spec = importlib.util.spec_from_file_location(
            "refclip.model",
            os.path.join(REFERENCE, "models", "clip", "model.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refclip.model"] = mod
        spec.loader.exec_module(mod)
    mod = sys.modules["refclip.model"]
    torch.manual_seed(0)
    return mod.CLIP(32, 32, 2, 64, 8, 16, 100, 64, 1, 2,
                    design_details=design_details).float().eval()


def test_lora_text_parity():
    """LoRA math parity on the text tower (the reference's only working
    LoRA path — see the visual-crash note above): in-proj A/B with xavier
    B, out-proj LoRA, scaling alpha/r."""
    import jax.numpy as jnp
    import torch
    from lifelong_clip_tpu.config import CLIPConfig, PEFTConfig
    from lifelong_clip_tpu.models import clip as clip_fns
    from lifelong_clip_tpu.models.convert import state_dict_to_params

    r, alpha = 4, 1
    ref = _ref_clip({"method": "lora", "peft_encoder": "text",
                     "lora_r": r, "lora_alpha": alpha})
    sd = {k: v.float().cpu().numpy() for k, v in ref.state_dict().items()}
    cfg = CLIPConfig(embed_dim=32, image_size=32, patch_size=8,
                     vision_width=64, vision_layers=2, vision_heads=1,
                     context_length=16, vocab_size=100, text_width=64,
                     text_heads=1, text_layers=2)
    params, _ = state_dict_to_params(sd, cfg)

    # map the reference's LoRA tensors into our peft tree
    def stack(key):
        return np.stack([sd[f"transformer.resblocks.{i}.{key}"]
                         for i in range(2)])

    peft_text = {"lora": {
        "a_in": jnp.asarray(stack("attn.in_proj_weight_lora_A")
                            .transpose(0, 2, 1)),
        "b_in": jnp.asarray(stack("attn.in_proj_weight_lora_B")
                            .transpose(0, 2, 1)),
        "a_out": jnp.asarray(stack("attn.out_proj.lora_A")
                             .transpose(0, 2, 1)),
        "b_out": jnp.asarray(stack("attn.out_proj.lora_B")
                             .transpose(0, 2, 1)),
    }}
    # reference out-proj lora_B is zero-init; perturb both sides to make
    # the check non-trivial
    rng = np.random.default_rng(1)
    b_out = rng.normal(0, 0.05, peft_text["lora"]["b_out"].shape)
    peft_text["lora"]["b_out"] = jnp.asarray(b_out.astype(np.float32))
    with torch.no_grad():
        for i in range(2):
            blk = ref.transformer.resblocks[i]
            blk.attn.out_proj.lora_B.copy_(
                torch.from_numpy(b_out[i].T.astype(np.float32).copy()))

    _, toks = _inputs()
    with torch.no_grad():
        ref_out = ref.encode_text(torch.from_numpy(toks)).numpy()
    peft_cfg = PEFTConfig(method="lora", encoder="text", lora_r=r,
                          lora_alpha=alpha)
    ours = np.asarray(clip_fns.encode_text(
        params, jnp.asarray(toks.astype(np.int32)), cfg,
        peft_cfg=peft_cfg, peft=peft_text, compute_dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref_out, atol=3e-4, rtol=3e-3)


def test_adapter_text_parity():
    """Serial-adapter math parity on the text tower."""
    import jax.numpy as jnp
    import torch
    from lifelong_clip_tpu.config import CLIPConfig, PEFTConfig
    from lifelong_clip_tpu.models import clip as clip_fns
    from lifelong_clip_tpu.models.convert import state_dict_to_params

    ref = _ref_clip({"method": "adapter", "peft_encoder": "text",
                     "ffn_num": 64})
    # adapter up_proj is zero-init; randomize so the delta is non-trivial
    rng = np.random.default_rng(2)
    with torch.no_grad():
        for i in range(2):
            ad = ref.transformer.resblocks[i].adaptmlp
            ad.up_proj.weight.copy_(torch.from_numpy(
                rng.normal(0, 0.05, ad.up_proj.weight.shape)
                .astype(np.float32)))
            ad.up_proj.bias.copy_(torch.from_numpy(
                rng.normal(0, 0.05, ad.up_proj.bias.shape)
                .astype(np.float32)))
    sd = {k: v.float().cpu().numpy() for k, v in ref.state_dict().items()}
    cfg = CLIPConfig(embed_dim=32, image_size=32, patch_size=8,
                     vision_width=64, vision_layers=2, vision_heads=1,
                     context_length=16, vocab_size=100, text_width=64,
                     text_heads=1, text_layers=2)
    params, _ = state_dict_to_params(sd, cfg)

    def stack(key):
        return np.stack([sd[f"transformer.resblocks.{i}.adaptmlp.{key}"]
                         for i in range(2)])

    peft_text = {"adapter": {
        "w_down": jnp.asarray(stack("down_proj.weight").transpose(0, 2, 1)),
        "b_down": jnp.asarray(stack("down_proj.bias")),
        "w_up": jnp.asarray(stack("up_proj.weight").transpose(0, 2, 1)),
        "b_up": jnp.asarray(stack("up_proj.bias")),
    }}
    _, toks = _inputs()
    import torch as _t
    with _t.no_grad():
        ref_out = ref.encode_text(_t.from_numpy(toks)).numpy()
    peft_cfg = PEFTConfig(method="adapter", encoder="text",
                          adapter_dim=64, adapter_scale=0.1)
    ours = np.asarray(clip_fns.encode_text(
        params, jnp.asarray(toks.astype(np.int32)), cfg,
        peft_cfg=peft_cfg, peft=peft_text, compute_dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref_out, atol=3e-4, rtol=3e-3)


def test_mvp_prompt_tuning_parity():
    """Drive the reference's ACTUAL prompt_tuning loop (appended prompt
    tokens pass through each block's ln_1, then outputs are truncated;
    models/mvp_clip.py:157-175) against our masked KV-prefix scan with
    prompt_ln=True on converted weights."""
    import ast
    import torch
    import jax.numpy as jnp
    from lifelong_clip_tpu.config import CLIPConfig
    from lifelong_clip_tpu.models import clip as clip_fns
    from lifelong_clip_tpu.models.convert import state_dict_to_params
    from lifelong_clip_tpu.models.mvp_clip import _layer_prompt_tensors

    ref = _ref_clip({"method": "prefix_prompt", "peft_encoder": "image"})
    sd = {k: v.float().cpu().numpy() for k, v in ref.state_dict().items()}
    cfg = CLIPConfig(embed_dim=32, image_size=32, patch_size=8,
                     vision_width=64, vision_layers=2, vision_heads=1,
                     context_length=16, vocab_size=100, text_width=64,
                     text_heads=1, text_layers=2)
    params, _ = state_dict_to_params(sd, cfg)

    # extract the reference's prompt_tuning method verbatim and bind it to
    # a minimal namespace (it only reads backbone/len/pos attributes)
    src = open(os.path.join(REFERENCE, "models", "mvp_clip.py")).read()
    fn_node = next(n for n in ast.walk(ast.parse(src))
                   if isinstance(n, ast.FunctionDef)
                   and n.name == "prompt_tuning")
    ns = {"torch": torch}
    exec(compile(ast.Module(body=[fn_node], type_ignores=[]),
                 "ref_mvp_clip", "exec"), ns)

    class _NS:
        pass

    len_g, len_e = 3, 5
    pos_g, pos_e = (0,), (1,)
    holder = _NS()
    holder.len_g_prompt = len_g
    holder.len_e_prompt = len_e
    holder.pos_g_prompt = torch.tensor(pos_g)
    holder.pos_e_prompt = torch.tensor(pos_e)
    backbone = _NS()
    backbone.visual = ref.visual
    holder.backbone = backbone

    rng = np.random.default_rng(5)
    b, t, d = 2, 9, 64
    x = rng.normal(size=(b, t, d)).astype(np.float32)
    g = rng.normal(size=(b, len(pos_g) * len_g, d)).astype(np.float32) * 0.4
    e = rng.normal(size=(b, len(pos_e) * len_e, d)).astype(np.float32) * 0.4

    with torch.no_grad():
        ref_out = ns["prompt_tuning"](
            holder, torch.from_numpy(x.transpose(1, 0, 2)),
            torch.from_numpy(g), torch.from_numpy(e))
        ref_out = ref_out.numpy().transpose(1, 0, 2)

    fake_mvp = {"g_prompts": jnp.asarray(g[:1])}
    vals, valid = _layer_prompt_tensors(
        fake_mvp, jnp.asarray(e), b, cfg.vision_layers, len_g, len_e,
        jnp.float32, pos_g=pos_g, pos_e=pos_e)
    # g prompts are per-sample here (batch 2 shares sample 0's g in the
    # fake tree); give every sample its own g like the reference call
    g_full = jnp.asarray(g).reshape(b, len(pos_g), len_g, d)
    for i, layer in enumerate(pos_g):
        vals = vals.at[layer, :, :len_g].set(g_full[:, i])
    ours = np.asarray(clip_fns.transformer(
        jnp.asarray(x), params["vision"]["blocks"], cfg.vision_heads,
        layer_prompts=vals, layer_prompt_valid=valid, prompt_ln=True,
        attn_impl="xla"))
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=5e-3)

    # teeth: raw KV-prefix (no ln_1 on prompts) must NOT match
    raw = np.asarray(clip_fns.transformer(
        jnp.asarray(x), params["vision"]["blocks"], cfg.vision_heads,
        layer_prompts=vals, layer_prompt_valid=valid, prompt_ln=False,
        attn_impl="xla"))
    assert not np.allclose(raw, ref_out, atol=5e-4, rtol=5e-3)


def test_prefix_prompt_attention_parity():
    """KV-prefix semantics match the reference's PromptedMultiheadAttention
    (prompts concatenated to the PRE-projection key/value inputs,
    models/clip/model.py:265-293)."""
    import torch
    import jax
    import jax.numpy as jnp
    from lifelong_clip_tpu.config import CLIPConfig
    from lifelong_clip_tpu.models import clip as clip_fns
    from lifelong_clip_tpu.models.convert import state_dict_to_params

    ref = _ref_clip({"method": "prefix_prompt", "peft_encoder": "image"})
    sd = {k: v.float().cpu().numpy() for k, v in ref.state_dict().items()}
    cfg = CLIPConfig(embed_dim=32, image_size=32, patch_size=8,
                     vision_width=64, vision_layers=2, vision_heads=1,
                     context_length=16, vocab_size=100, text_width=64,
                     text_heads=1, text_layers=2)
    params, _ = state_dict_to_params(sd, cfg)

    rng = np.random.default_rng(3)
    b, t, p_len, d = 2, 9, 4, 64
    x = rng.normal(size=(b, t, d)).astype(np.float32)
    pk = rng.normal(size=(b, p_len, d)).astype(np.float32) * 0.3
    pv = rng.normal(size=(b, p_len, d)).astype(np.float32) * 0.3

    # reference: first visual block with prompt=(pk, pv); torch blocks are
    # seq-first (L, N, E)
    blk = ref.visual.transformer.resblocks[0]
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(1, 0, 2))
        ref_out = blk(tx, prompt=(torch.from_numpy(pk),
                                  torch.from_numpy(pv)))
        ref_out = ref_out.numpy().transpose(1, 0, 2)

    # ours: _block with the same layer-0 weights and kv_prefix dict —
    # NOTE the reference applies prompts to the RAW block input (before
    # ln_1), while our _block concatenates after ln_1... verify which.
    blk0 = jax.tree.map(lambda a: a[0], params["vision"]["blocks"])
    ours = clip_fns._block(
        jnp.asarray(x), blk0, 1, None, None, None,
        {"k": jnp.asarray(pk), "v": jnp.asarray(pv)}, "xla")
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-4,
                               rtol=5e-3)
