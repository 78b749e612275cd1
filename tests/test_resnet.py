"""ModifiedResNet visual tower: golden parity vs the reference torch model
(models/clip/model.py:113-191) + RN-aware architecture inference."""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference tree unavailable")


@pytest.fixture(scope="module")
def rn_ref_and_ours():
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    import importlib.util
    import types
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
    # tuple vision_layers -> ModifiedResNet branch (model.py:806-817):
    # width 16 -> feature dim 512, heads 8; input 64 -> 2x2 attnpool grid
    ref = mod.CLIP(embed_dim=32, image_resolution=64,
                   vision_layers=(1, 1, 2, 1), vision_width=16,
                   vision_patch_size=None, context_length=16,
                   vocab_size=100, transformer_width=64,
                   transformer_heads=1, transformer_layers=2,
                   design_details={"method": "prefix_prompt",
                                   "peft_encoder": "image"}).float()

    # randomize BN running stats so inference-mode parity is non-trivial
    rng = np.random.default_rng(7)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.3, m.running_mean.shape)
                    .astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, m.running_var.shape)
                    .astype(np.float32)))
    ref = ref.eval()

    sd = {k: v.float().cpu().numpy() for k, v in ref.state_dict().items()}
    from lifelong_clip_tpu.models.convert import state_dict_to_params
    params, cfg = state_dict_to_params(sd)
    return ref, params, cfg


def test_rn_infer_config(rn_ref_and_ours):
    _, _, cfg = rn_ref_and_ours
    assert cfg.tower == "rn"
    assert tuple(cfg.vision_layers) == (1, 1, 2, 1)
    assert cfg.vision_width == 16
    assert cfg.vision_heads == 8          # width * 32 // 64 (model.py:808)
    assert cfg.image_size == 64
    assert cfg.embed_dim == 32


def test_rn_encode_image_parity(rn_ref_and_ours):
    import jax.numpy as jnp
    import torch
    from lifelong_clip_tpu.models import clip as clip_fns
    ref, params, cfg = rn_ref_and_ours
    imgs = np.random.default_rng(0).normal(
        size=(3, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(clip_fns.encode_image(
        params, jnp.asarray(imgs), cfg, compute_dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=5e-3)


def test_rn_joint_logits_parity(rn_ref_and_ours):
    import jax.numpy as jnp
    import torch
    from lifelong_clip_tpu.models import clip as clip_fns
    ref, params, cfg = rn_ref_and_ours
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    toks = np.zeros((3, 16), np.int64)
    toks[:, 0] = 1
    for i in range(3):
        toks[i, 1:3 + i] = rng.integers(1, 90, 2 + i)
        toks[i, 3 + i] = 99
    with torch.no_grad():
        ref_logits, _, _, _ = ref(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
            torch.from_numpy(toks))
    logits, _, _ = clip_fns.clip_forward(
        params, jnp.asarray(imgs), jnp.asarray(toks.astype(np.int32)),
        cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=5e-3, rtol=5e-3)


def test_rn_random_init_forward():
    """RN presets initialize and run without a checkpoint."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from lifelong_clip_tpu.config import CLIP_PRESETS
    from lifelong_clip_tpu.models import clip as clip_fns
    from lifelong_clip_tpu.models.init import init_clip_params

    cfg = dataclasses.replace(
        CLIP_PRESETS["RN50"], vision_layers=(1, 1, 1, 1), vision_width=16,
        vision_heads=8, image_size=64, embed_dim=32, context_length=16,
        vocab_size=100, text_width=32, text_heads=1, text_layers=2)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    emb = clip_fns.encode_image(params, imgs, cfg,
                                compute_dtype=jnp.float32)
    assert emb.shape == (2, 32)
    assert bool(jnp.isfinite(emb).all())


def test_rn_tower_through_trainer():
    """RN towers wire through the full trainer path (continual-clip e2e on
    a tiny ModifiedResNet): stream -> eval engine -> metrics/artifacts."""
    import dataclasses
    from lifelong_clip_tpu.config import CLIP_PRESETS
    from lifelong_clip_tpu.data.registry import make_synthetic
    from lifelong_clip_tpu.methods.continual_clip import ContinualCLIP
    from test_engine import tiny_cfg

    tiny_rn = dataclasses.replace(
        CLIP_PRESETS["RN50"], vision_layers=(1, 1, 1, 1), vision_width=16,
        vision_heads=8, image_size=32, embed_dim=32, context_length=77,
        vocab_size=49408, text_width=32, text_heads=1, text_layers=2)

    class TinyRNContinual(ContinualCLIP):
        def setup_model(self):
            import sys
            import jax
            import lifelong_clip_tpu.models as M
            from lifelong_clip_tpu.models.init import init_clip_params

            def rn_build(model_name, pretrained_path=None, rng=None):
                return init_clip_params(
                    rng if rng is not None else jax.random.PRNGKey(0),
                    tiny_rn), tiny_rn

            M.build_clip = rn_build
            for name, mod in list(sys.modules.items()):
                if (name.startswith("lifelong_clip_tpu.methods.")
                        and hasattr(mod, "build_clip")):
                    mod.build_clip = rn_build
            super().setup_model()

    from lifelong_clip_tpu.config import StreamConfig
    train = make_synthetic(n_classes=6, per_class=12, image_size=32, seed=0)
    test = make_synthetic(n_classes=6, per_class=4, image_size=32, seed=0,
                          train=False)
    cfg = tiny_cfg(method="continual-clip", model_name="RN50",
                   stream=StreamConfig(n_tasks=2, n=50, m=10, seed=1))
    out = TinyRNContinual(cfg, train_dataset=train,
                          test_dataset=test).run()
    assert np.isfinite(out["A_last"])
