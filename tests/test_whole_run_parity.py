"""Whole-run behavioral parity against the reference trainer.

Runs the reference's ACTUAL ``_Trainer.run()`` loop — the real
``methods/adapter_clip.py:AdapterCLIP`` AND the real
``methods/mvp_clip.py:CLIP_MVP`` over the real ``OnlineSampler``,
``Memory``, optimizer factory, and training math — next to this repo's
``OnlineTrainer.run()`` on the same tiny towers (identical converted
weights incl. LoRA / prompt pools), the same synthetic data, and the same
Si-Blurry stream, then compares per-step training-loss trajectories and
per-task accuracy trajectories.

Harness notes (all confined to this file; reference behavior unmodified):
  * missing third-party deps of the reference (torchvision, randaugment,
    ftfy, torch_optimizer, pip `clip`) are stubbed — the stubs implement
    the exact tensor math the reference pipeline needs (ToTensor /
    Normalize), with the stochastic crops/flips as identity so BOTH sides
    run deterministic preprocessing;
  * the shipped ``prompt=`` crash (VisualTransformer.forward passes a
    kwarg vanilla/LoRA blocks don't accept, reference model.py:780) is
    patched by letting visual blocks swallow the kwarg — the evidently
    intended behavior, exactly as PARITY.md documents;
  * ``nn.DataParallel`` is applied on CPU (reference online_step requires
    ``.module``; CPU DataParallel forwards straight to the module);
  * the reference's task-end eval scores with a class table of
    ``all_classnames[:_total_classes]`` where slot index == class id
    (its online_after_task + online_evaluate quirk) — the comparison
    mirrors that exact metric on our side.
"""

import os
import sys
import types
import importlib.util

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference tree unavailable")

N_CLASSES = 20
BATCH = 16
# n_tasks=10 is the one value where the reference's own eval runs: its
# online_evaluate allocates correct_l=zeros(n_tasks) but _interpret_pred
# returns hardcoded zeros(10) bins (adapter_clip.py:121 + _trainer.py:521)
# — any other task count crashes the shipped eval
N_TASKS = 10
LR = 2e-3
SEED = 1


# --------------------------------------------------------------------------
# stubs for reference deps missing in this environment
# --------------------------------------------------------------------------

def _install_stubs():
    import torch

    # real .cuda() returns a device COPY — in autograd terms, a non-leaf
    # when the source requires grad (proto's `prompt_loss = zeros(
    # requires_grad=True).cuda()` then `+=` relies on exactly that);
    # identity for everything else
    torch.Tensor.cuda = lambda self, *a, **k: (
        self.clone() if (self.requires_grad and self.is_leaf) else self)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # the MaPLe blocks hard-cast prompt tensors with .half() even when the
    # model runs float32 (reference maple_clip/model.py:374,397,570) — on a
    # CPU-float run torch.cat then dtype-crashes. Identity keeps the run in
    # f32 on BOTH sides (on the intended fp16-GPU path the cast is lossy
    # but type-consistent); only prompt tensors call .half() here.
    torch.Tensor.half = lambda self, *a, **k: self

    if "randaugment" not in sys.modules:
        ra = types.ModuleType("randaugment")

        class RandAugment:  # never active: transforms=[]
            def __call__(self, x):
                return x

        ra.RandAugment = RandAugment
        sys.modules["randaugment"] = ra
        # rainbow_memory.py:11 imports the SUBMODULE form (used only by
        # its dead montecarlo path)
        ra_sub = types.ModuleType("randaugment.randaugment")
        ra_sub.RandAugment = RandAugment
        sys.modules["randaugment.randaugment"] = ra_sub

    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy

    if "torch_optimizer" not in sys.modules:
        to = types.ModuleType("torch_optimizer")
        to.RAdam = torch.optim.Adam  # unused on the adamw path
        sys.modules["torch_optimizer"] = to

    if "clip" not in sys.modules:
        sys.modules["clip"] = types.ModuleType("clip")

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")

        class Compose:
            def __init__(self, fns):
                self.fns = fns

            def __call__(self, x):
                for f in self.fns:
                    x = f(x)
                return x

        class _Identity:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        class ToTensor:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):  # HWC uint8 -> CHW float/255
                t = torch.from_numpy(np.asarray(x).copy())
                return t.permute(2, 0, 1).float() / 255.0

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, x):  # CHW or BCHW
                return (x - self.mean.to(x.dtype)) / self.std.to(x.dtype)

        for name in ("Resize", "RandomCrop", "RandomHorizontalFlip",
                     "CenterCrop", "RandomResizedCrop", "AutoAugment",
                     "AutoAugmentPolicy", "Lambda"):
            setattr(tr, name, _Identity)
        tr.Compose = Compose
        tr.ToTensor = ToTensor
        tr.Normalize = Normalize
        tr.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic",
                                                     BILINEAR="bilinear")
        tm = types.ModuleType("torchvision.models")  # zoo.py imports it
        tv.transforms = tr
        tv.models = tm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.models"] = tm


def _install_timm_shim():
    """timm is not installed here; the reference ViT-prompt models import
    ``timm.models.create_model`` + registry/vision_transformer helpers at
    module level (models/mvp.py:2-9, models/l2p.py:2-11,
    models/dualprompt.py:2-9). The shim reimplements the timm-0.6.12
    VisionTransformer attribute surface those models touch —
    ``patch_embed / cls_token / pos_embed / pos_drop / blocks[n].{norm1,
    attn.{qkv,num_heads,scale,proj,attn_drop,proj_drop}, ls1, drop_path1,
    norm2, mlp.{fc1,act,fc2}, ls2, drop_path2} / norm / fc_norm / head /
    embed_dim / num_features`` — at tiny scale (the registered
    vit_base_patch16_224_l2p dims are ignored, exactly as the CLIP-family
    harness serves tiny towers through the real loaders). ``create_model``
    reseeds torch so repeated builds are bit-identical.

    LayerNorm eps is pinned to 1e-5 (this repo's uniform tower eps); real
    timm uses 1e-6 — an O(1e-6) relative LN difference, far below every
    tolerance in this file — so the comparison isolates the METHOD logic,
    not library constants."""
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class _ShimAttention(nn.Module):
        def __init__(self, dim, num_heads):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=True)
            self.attn_drop = nn.Dropout(0.0)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(0.0)

        def forward(self, x):
            b, n, c = x.shape
            qkv = self.qkv(x).reshape(
                b, n, 3, self.num_heads, c // self.num_heads).permute(
                    2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = self.attn_drop(attn.softmax(dim=-1))
            x = (attn @ v).transpose(1, 2).reshape(b, n, c)
            return self.proj_drop(self.proj(x))

    class _ShimMlp(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.fc1 = nn.Linear(dim, dim * 4)
            self.act = nn.GELU()     # exact erf GELU (timm default)
            self.fc2 = nn.Linear(dim * 4, dim)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class _ShimBlock(nn.Module):
        def __init__(self, dim, num_heads):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim)     # eps: see shim docstring
            self.attn = _ShimAttention(dim, num_heads)
            self.ls1 = nn.Identity()
            self.drop_path1 = nn.Identity()
            self.norm2 = nn.LayerNorm(dim)
            self.mlp = _ShimMlp(dim)
            self.ls2 = nn.Identity()
            self.drop_path2 = nn.Identity()

        def forward(self, x):
            x = x + self.drop_path1(self.ls1(self.attn(self.norm1(x))))
            x = x + self.drop_path2(self.ls2(self.mlp(self.norm2(x))))
            return x

    class _ShimPatchEmbed(nn.Module):
        def __init__(self, dim, patch):
            super().__init__()
            self.proj = nn.Conv2d(3, dim, kernel_size=patch, stride=patch)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class _ShimViT(nn.Module):
        def __init__(self, img_size=32, patch=8, dim=64, depth=4,
                     num_heads=1, num_classes=N_CLASSES):
            super().__init__()
            n = (img_size // patch) ** 2
            self.embed_dim = self.num_features = dim
            self.patch_embed = _ShimPatchEmbed(dim, patch)
            self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
            self.pos_embed = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
            self.pos_drop = nn.Dropout(0.0)
            self.blocks = nn.Sequential(
                *[_ShimBlock(dim, num_heads) for _ in range(depth)])
            self.norm = nn.LayerNorm(dim)
            self.fc_norm = nn.Identity()   # token pooling: fc_norm is
            # Identity in timm's vit_base_patch16_224
            self.head = nn.Linear(dim, num_classes)

    def create_model(name=None, pretrained=False, num_classes=N_CLASSES,
                     **kwargs):
        torch.manual_seed(0)
        return _ShimViT(num_classes=num_classes)

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    registry = types.ModuleType("timm.models.registry")
    vit_mod = types.ModuleType("timm.models.vision_transformer")
    registry.register_model = lambda fn: fn
    vit_mod._cfg = lambda **kw: dict(kw)
    vit_mod.default_cfgs = {}
    vit_mod._create_vision_transformer = \
        lambda name, pretrained=False, **kw: create_model(
            name, pretrained, **kw)
    timm_models.create_model = create_model
    timm_models.registry = registry
    timm_models.vision_transformer = vit_mod
    timm.create_model = create_model
    timm.models = timm_models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.registry"] = registry
    sys.modules["timm.models.vision_transformer"] = vit_mod


def _package(name: str, path: str):
    """Register a namespace package pointing at a reference directory
    WITHOUT executing its __init__.py (the real ones import timm etc.)."""
    if name in sys.modules:
        return sys.modules[name]
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    sys.modules[name] = pkg
    return pkg


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    """Reference trainer importable + fake datasets/models registries."""
    _install_stubs()
    import torch

    _package("utils", os.path.join(REFERENCE, "utils"))
    _package("methods", os.path.join(REFERENCE, "methods"))
    models_pkg = _package("models", os.path.join(REFERENCE, "models"))

    # the shared data both frameworks train on
    from lifelong_clip_tpu.data.registry import get_dataset as our_get_ds
    ds_train = our_get_ds("synthetic-20", train=True)
    ds_test = our_get_ds("synthetic-20", train=False)

    class _RefSynth:
        """torchvision-style wrapper over the same arrays."""
        def __init__(self, root=None, train=True, download=False,
                     transform=None):
            self._ds = ds_train if train else ds_test
            self.transform = transform
            self.classes = list(range(N_CLASSES))
            self.classes_names = list(self._ds.class_names)
            self.targets = [int(t) for t in self._ds.targets]
            self.data = self._ds.images        # HWC uint8 (proto's
            # get_dataset_by_indices reads .data directly)

        def __getitem__(self, i):
            img = self._ds.images[i]          # HWC uint8
            if self.transform is not None:
                img = self.transform(img)
            return img, int(self._ds.targets[i])

        def __len__(self):
            return len(self._ds.targets)

    datasets_stub = types.ModuleType("datasets")
    datasets_stub.get_dataset = lambda name: (
        _RefSynth, tuple(ds_train.mean), tuple(ds_train.std), N_CLASSES)
    sys.modules["datasets"] = datasets_stub
    # Trainer_ProtoCLIP imports the GPT-attribute subsystem at module
    # level (used only by the commented-out before_train branch)
    for name in ("datasets.gpt", "datasets.gpt.gpt_generation",
                 "datasets.gpt.gpt_generation.attributes"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["datasets.gpt.gpt_generation"].attributes = \
        sys.modules["datasets.gpt.gpt_generation.attributes"]

    # tiny reference CLIP served through the real wrapper
    import models.clip.model as ref_model_mod  # noqa: E402
    import models.clip.clip_loader as ref_loader  # noqa: E402

    def tiny_loader(name, device=None, jit=False, design_details=None):
        torch.manual_seed(0)
        # heads = width // 64 everywhere (the CLIP head-dim convention the
        # shape-driven config inference relies on, reference model.py:1041)
        # MVP gets a 3-layer vision tower so an e-prompt position (2) is
        # live alongside the g-prompt positions (0, 1)
        vision_layers = 3 if (design_details or {}).get(
            "method") == "mvp" else 2
        # ProtoCLIP's CoPLPrompt hardcodes the 768 vision width
        # (models/proto_clip.py:82) and feature_dim defaults to the real
        # 512 text width — its tiny model keeps real widths, tiny depth
        if (design_details or {}).get("method") == "prefix_prompt":
            # embed_dim == transformer_width: CUSTOM_CLIP's prompt
            # selection does image_features @ text_key.T with text_key in
            # feature_dim=512 (models/proto_clip.py:110), conflating the
            # joint space with the text width — as real CLIP ViT-B/16 does
            m = ref_model_mod.CLIP(
                embed_dim=512, image_resolution=32, vision_layers=3,
                vision_width=768, vision_patch_size=8, context_length=77,
                vocab_size=49408, transformer_width=512,
                transformer_heads=8, transformer_layers=2,
                design_details=design_details).float()
            # prefix blocks accept (and need) the prompt= kwarg — no patch
            return m
        m = ref_model_mod.CLIP(
            embed_dim=64, image_resolution=32, vision_layers=vision_layers,
            vision_width=64, vision_patch_size=8, context_length=77,
            vocab_size=49408, transformer_width=64, transformer_heads=1,
            transformer_layers=2,
            design_details=design_details or {}).float()
        # in-harness patch for the shipped prompt= crash (model.py:780):
        # visual blocks accept-and-drop the kwarg
        for blk in m.visual.transformer.resblocks:
            blk.forward = (lambda o: (
                lambda x, register_blk=False, prompt=None: o(x)))(blk.forward)
        return m

    ref_loader.load = tiny_loader

    import models.adapter_clip as ref_adapter_mod  # noqa: E402
    import models.mvp_clip as ref_mvp_model_mod  # noqa: E402

    def build_ref_mvp_model():
        m = ref_mvp_model_mod.CLIP_MVP(num_classes=N_CLASSES,
                                       model_name="tiny", device="cpu")
        # in-harness patch for shipped defect #3 (PARITY.md): CLIP_MVP has
        # no `dtype` attribute but _trainer.py:283 reads custom_clip.dtype
        m.dtype = m.backbone.dtype
        return m

    # tiny reference MaPLe: REAL widths (text 512, vision 768) — the
    # reference hardcodes both in MultiModalPromptLearner
    # (Linear(ctx_dim, 768) maple.py:115/131, torch.empty(n_ctx, 512)
    # maple.py:125) so no other width can build — at depth-3 towers, which
    # keep every compound-prompt injection layer (1, 2) live
    import models.maple_clip.model as ref_mc_model_mod  # noqa: E402
    import models.maple as ref_maple_model_mod  # noqa: E402

    _maple_design = {"trainer": "MaPLe", "vision_depth": 0,
                     "language_depth": 0, "vision_ctx": 0,
                     "language_ctx": 0, "maple_length": 3}

    def tiny_maple_clip(name, n_ctx=3, device="cpu"):
        torch.manual_seed(0)
        return ref_mc_model_mod.CLIP(
            embed_dim=64, image_resolution=32, vision_layers=3,
            vision_width=768, vision_patch_size=8, context_length=77,
            vocab_size=49408, transformer_width=512, transformer_heads=8,
            transformer_layers=3, design_details=_maple_design).float()

    ref_maple_model_mod.load_clip = tiny_maple_clip

    def build_ref_maple_model():
        # load_clip reseeds to 0, so the prompt-learner draws that follow
        # tower construction land on the same RNG state every call —
        # repeated builds are bit-identical
        return ref_maple_model_mod.MaPLe(model_name="tiny", n_ctx=3,
                                         device="cpu")

    # tiny timm backbone for the ViT-prompt family (see _install_timm_shim)
    _install_timm_shim()
    import models.mvp as ref_vitmvp_model_mod  # noqa: E402

    def build_ref_vitmvp_model():
        # create_model reseeds torch to 0, so the key/mask/prompt draws
        # that follow backbone construction are bit-identical per build
        m = ref_vitmvp_model_mod.MVP(num_classes=N_CLASSES)
        # in-harness patch for shipped defect #3 (PARITY.md): no model in
        # the ViT family exposes `.dtype` but _trainer.py:283 reads it
        m.dtype = torch.float32
        return m

    import models.proto_clip as ref_proto_model_mod  # noqa: E402

    def build_ref_proto_model(args):
        # deterministic: the loader reseeds to 0 before tower draws, so
        # text_key / text_prompt / PromptLearner / CoPL pool draws that
        # follow are the same on every call
        return ref_proto_model_mod.CUSTOM_CLIP(args, torch.device("cpu"))

    # ER-family classifier: the reference registry has NO model branch for
    # er/clib/rm/lwf/Finetuning/ewc++ (models/__init__.py:40-42 raises —
    # PARITY.md "Second reference defect"), so whole-run parity against
    # the SHIPPED model is impossible. Supplying this repo's documented
    # design decision (CLIP vision tower + linear head over normalized
    # features, methods/er_baseline.py) identically to BOTH trainers pins
    # the TRAINER math — masking, CE, optimizer, scheduler, KD, memory
    # and eval quirks — with the model shared by construction.
    class _RefHeadClassifier(torch.nn.Module):
        def __init__(self, clip_model, num_classes, train_backbone):
            super().__init__()
            self.backbone = clip_model
            for p in self.backbone.parameters():
                p.requires_grad = train_backbone
            self.head = torch.nn.Linear(
                self.backbone.text_projection.shape[1], num_classes)
            self.dtype = torch.float32   # defect #3: _trainer reads it

        def forward(self, x):
            f = self.backbone.encode_image(x).float()
            f = f / (f.norm(dim=-1, keepdim=True) + 1e-8)
            return self.head(f)

    def build_ref_head_model(train_backbone=False):
        # tiny_loader reseeds torch, so the head draw that follows is
        # bit-identical per build
        clip_m = tiny_loader("tiny", design_details={})
        return _RefHeadClassifier(clip_m, N_CLASSES, train_backbone)

    def fake_get_model(model_name=None, method=None, peft_encoder="image",
                       **kw):
        if method == "mvp-clip":
            return build_ref_mvp_model(), 32
        if method == "moe-clip":
            # the reference never registers a MoE method (its MoA blocks,
            # model.py:445-636, are reachable only by constructing
            # AdapterCLIP(peft_method='moe') directly) — this run drives
            # that evidently-intended configuration through the real
            # AdapterCLIP trainer. Gate NOISE is disabled on both sides
            # for determinism (torch.randn_like vs jax PRNG cannot be
            # stream-matched; the noise math itself is component-tested
            # in tests/test_ops_moe) — clean-logit gating is the
            # reference's own eval-mode path (model.py:577-578)
            m = ref_adapter_mod.AdapterCLIP(
                model_name="tiny", peft_method="moe",
                peft_encoder=peft_encoder, device=torch.device("cpu"))
            for mod in m.modules():
                if hasattr(mod, "noisy_gating"):
                    mod.noisy_gating = False
            _liven_moe_init(m)   # seeded live gates/experts (see helper)
            return m, 32
        if method == "maple":
            return build_ref_maple_model(), 32
        if method == "adapter-clip-proto_prompt":
            return build_ref_proto_model(kw["args"]), 32
        if method == "mvp":
            return build_ref_vitmvp_model(), 32
        if method in ("er", "lwf", "rm"):
            return build_ref_head_model(train_backbone=False), 32
        if method in ("Finetuning", "ewc++"):
            # ewc++ with a trainable backbone so the fisher/penalty set
            # (named_parameters()[:-2] — everything but the head) is
            # non-empty and the regularization math actually executes
            return build_ref_head_model(train_backbone=True), 32
        if method == "continual-clip":
            import models.continual_clip as ref_czs_model_mod
            return ref_czs_model_mod.ContinualCLIP(model_name="tiny",
                                                   device="cpu"), 32
        # adapter-clip / lora-clip both route to AdapterCLIP with the
        # matching peft design (reference models/__init__.py:23-34)
        return ref_adapter_mod.AdapterCLIP(
            model_name="tiny",
            peft_method="adapter" if method == "adapter-clip" else "lora",
            peft_encoder=peft_encoder, device=torch.device("cpu")), 32

    models_pkg.get_model = fake_get_model

    import methods._trainer as ref_trainer_mod  # noqa: E402
    import methods.adapter_clip as ref_adapter_trainer  # noqa: E402
    import methods.mvp_clip as ref_mvp_trainer  # noqa: E402
    import methods.maple as ref_maple_trainer  # noqa: E402
    import methods.Trainer_ProtoCLIP as ref_proto_trainer  # noqa: E402
    import methods.mvp as ref_vitmvp_trainer  # noqa: E402
    import methods.er_baseline as ref_er_trainer  # noqa: E402
    import methods.finetuning as ref_ft_trainer  # noqa: E402
    import methods.lwf as ref_lwf_trainer  # noqa: E402
    import methods.ewcpp as ref_ewcpp_trainer  # noqa: E402
    import methods.rainbow_memory as ref_rm_trainer  # noqa: E402

    # CPU DataParallel so online_step's `.module` works (the nohup.out
    # crash in the reference comes from the missing wrap on 1 GPU).
    # Only for the adapter family: the mvp trainer calls custom methods
    # (set_exposed_classes, labels_tokenize) directly on custom_clip,
    # which DataParallel does NOT forward.
    orig_sdm = ref_trainer_mod._Trainer.setup_distributed_model

    def patched_sdm(self):
        orig_sdm(self)
        if self.method in ("lora-clip", "adapter-clip", "moe-clip") and \
                not hasattr(self.custom_clip, "module"):
            self.custom_clip = torch.nn.DataParallel(self.custom_clip)

    ref_trainer_mod._Trainer.setup_distributed_model = patched_sdm

    return types.SimpleNamespace(
        trainer_cls=ref_adapter_trainer.AdapterCLIP,
        mvp_trainer_cls=ref_mvp_trainer.CLIP_MVP,
        maple_trainer_cls=ref_maple_trainer.MaPLe,
        proto_trainer_cls=ref_proto_trainer.Trainer_ProtoCLIP,
        vitmvp_trainer_cls=ref_vitmvp_trainer.MVP,
        build_ref_vitmvp_model=build_ref_vitmvp_model,
        er_trainer_cls=ref_er_trainer.ER,
        ft_trainer_cls=ref_ft_trainer.FT,
        lwf_trainer_cls=ref_lwf_trainer.LwF,
        ewcpp_trainer_cls=ref_ewcpp_trainer.EWCpp,
        rm_trainer_cls=ref_rm_trainer.RM,
        build_ref_head_model=build_ref_head_model,
        build_ref_mvp_model=build_ref_mvp_model,
        build_ref_maple_model=build_ref_maple_model,
        build_ref_proto_model=build_ref_proto_model,
        tiny_loader=tiny_loader,
        ds_train=ds_train, ds_test=ds_test,
        tmp=tmp_path_factory.mktemp("refrun"))


def _liven_moe_init(root):
    """Give the MoA init teeth for parity: the shipped zero router + zero
    up projections make gating degenerate (clean logits all tie at zero,
    expert outputs vanish — a top-k or gating-input bug would be
    invisible for many steps). Seeded small-random router/up_proj, applied
    identically to BOTH sides (deterministic generator, module order), put
    live gates and live expert deltas into the STEP-0 forward, which the
    rtol 1e-4 step-0 assertion then pins."""
    import torch
    g = torch.Generator().manual_seed(123)
    for mod in root.modules():
        if hasattr(mod, "adaptmlp_list"):   # a MoA block
            with torch.no_grad():
                mod.router.copy_(
                    torch.randn(mod.router.shape, generator=g) * 0.02)
                for ex in mod.adaptmlp_list:
                    ex.up_proj.weight.copy_(torch.randn(
                        ex.up_proj.weight.shape, generator=g) * 0.02)


def _ref_kwargs(log_path: str):
    return dict(
        method="lora-clip", dataset="synthetic-20", model_name="tiny",
        n=50, m=10, rnd_NM=False, n_tasks=N_TASKS, epochNum=1,
        rnd_seed=SEED, memory_size=0, log_path=log_path,
        opt_name="adamw", sched_name="const", batchsize=BATCH,
        test_batchsize=32, n_worker=0, lr=LR, init_model=False,
        init_opt=True, topk=1, use_amp=False, transforms=[],
        reg_coef=100, data_dir="./data", debug=False, note="parity",
        selection_size=1, ca=False, ssca=False, ca_epochs=5,
        model_type=None, feature_dim=64, num_prompt=0, n_ctx=0, topK=1,
        text_template="a bad photo of a {}.", peft_encoder="image",
        num_sampled_pcls=0, eval_period=100000, temp_batchsize=0,
        online_iter=1, num_gpus=1, workers_per_gpu=0,
        imp_update_period=1, zero_shot_evaluation=False,
        zero_shot_dataset=None, lr_step=0.95, lr_length=10, lr_period=10,
        memory_epoch=0, distilling=False, agem_batch=0, mir_cands=0,
        visible_classes="batch")


def _det_pipeline(image_size, mean, std, **kw):
    """Deterministic preprocessing mirroring the stubbed reference
    pipeline (ToTensor + Normalize; stochastic crops/flips are identity
    on BOTH sides)."""
    import jax.numpy as jnp

    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    out_dtype = kw.get("out_dtype", jnp.float32)

    def run(rng, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        return ((x - m) / s).astype(out_dtype)

    return run


def _run_reference(ref_env, method="lora-clip"):
    kw = _ref_kwargs(str(ref_env.tmp / method))
    kw["method"] = method
    tr = ref_env.trainer_cls(**kw)
    if method == "moe-clip":
        # in-harness intent patch: the trainer's freeze-by-name
        # (adapter_clip.py:117-119 keeps only 'adaptmlp'/'lora') would
        # freeze the router of a design the shipped registry cannot even
        # build; the MoA lineage (MoE-Adapters) trains the router, and our
        # moe-clip keeps it in the trainable tree. reset_opt() re-runs so
        # the rebuilt optimizer (requires_grad params only,
        # train_utils.py:16-31) sees the unfrozen router. w_noise stays
        # frozen: with gate noise off it has no gradient path (on our side
        # its zero-grad leaf provably stays zero under adamw).
        orig_obt = tr.online_before_task

        def obt_unfreeze_router(task_id):
            orig_obt(task_id)
            for k, v in tr.custom_clip.named_parameters():
                if "router" in k:
                    v.requires_grad = True
            tr.reset_opt()

        tr.online_before_task = obt_unfreeze_router
    losses = []
    orig_step = tr.online_step

    def record_step(images, labels, idx):
        loss, acc = orig_step(images, labels, idx)
        losses.append(float(loss))
        return loss, acc

    tr.online_step = record_step
    tr.run()
    # per-task quirky-metric accuracies saved by save_result
    acc = np.load(os.path.join(tr.log_dir, f"seed_{SEED}.npy"))
    return np.asarray(acc, np.float64), np.asarray(losses)


def _run_ours(ref_env, monkeypatch, tmp_path, peft="lora"):
    import torch
    import jax
    import jax.numpy as jnp
    from lifelong_clip_tpu.config import (TrainConfig, PEFTConfig,
                                          StreamConfig)
    from lifelong_clip_tpu.methods.adapter_clip import AdapterCLIP
    from lifelong_clip_tpu.utils.stream import exposed_test_indices
    from lifelong_clip_tpu.utils.tokenizer import tokenize
    from lifelong_clip_tpu.ops import preprocess as prep

    # identical initial weights: the reference loader's state dict through
    # the converter
    design = ({"method": "lora", "peft_encoder": "image",
               "lora_alpha": 1, "lora_r": 4} if peft == "lora" else
              {"method": peft, "peft_encoder": "image",
               "ffn_num": 64})
    ref_model = ref_env.tiny_loader("tiny", design_details=design)
    if peft == "moe":
        # same seeded liven as the reference-side build in fake_get_model:
        # identical tensors land in our converted peft tree below
        _liven_moe_init(ref_model)
    sd = {k: v.detach().float().numpy()
          for k, v in ref_model.state_dict().items()}
    ckpt = tmp_path / "tiny_ref.pt"
    torch.save(ref_model.state_dict(), str(ckpt))

    def stack(key):
        return np.stack([sd[f"visual.transformer.resblocks.{i}.{key}"]
                         for i in range(2)])

    if peft == "lora":
        # identical LoRA init (reference kaiming A / zero B)
        peft_tree = {"lora": {
            "a_in": jnp.asarray(stack("attn.in_proj_weight_lora_A")
                                .transpose(0, 2, 1)),
            "b_in": jnp.asarray(stack("attn.in_proj_weight_lora_B")
                                .transpose(0, 2, 1)),
            "a_out": jnp.asarray(stack("attn.out_proj.lora_A")
                                 .transpose(0, 2, 1)),
            "b_out": jnp.asarray(stack("attn.out_proj.lora_B")
                                 .transpose(0, 2, 1)),
        }}
        peft_cfg = PEFTConfig(method="lora", encoder="image", lora_r=4,
                              lora_alpha=1)
    elif peft == "moe":
        # identical MoA init (reference _MoA, model.py:445-488): zero
        # router/noise weights, per-expert adapters with kaiming down /
        # ZERO up. Stacked to our (layers, experts, ...) expert leaves.
        def stack_experts(key, transpose=False):
            a = np.stack([np.stack(
                [sd[f"visual.transformer.resblocks.{i}"
                    f".adaptmlp_list.{j}.{key}"] for j in range(2)])
                for i in range(2)])
            return a.transpose(0, 1, 3, 2) if transpose else a

        peft_tree = {"moe": {
            "router": jnp.asarray(stack("router")),
            "w_noise": jnp.asarray(stack("w_noise")),
            "experts": {
                "w_down": jnp.asarray(
                    stack_experts("down_proj.weight", transpose=True)),
                "b_down": jnp.asarray(stack_experts("down_proj.bias")),
                "w_up": jnp.asarray(
                    stack_experts("up_proj.weight", transpose=True)),
                "b_up": jnp.asarray(stack_experts("up_proj.bias")),
            },
        }}
        peft_cfg = PEFTConfig(method="moe", encoder="image",
                              adapter_dim=64, adapter_scale=0.1,
                              moe_experts=2, moe_top_k=2)
        # deterministic gating on our side too: force clean logits (the
        # reference run's MoA blocks have noisy_gating=False) — patch at
        # the ops level so the production rng threading stays exercised
        # up to the gate call
        from lifelong_clip_tpu.ops import moe as moe_ops
        orig_gates = moe_ops.noisy_top_k_gates

        def clean_gates(cls_feats, router, w_noise, top_k, *, rng=None,
                        noise_eps=1e-2):
            return orig_gates(cls_feats, router, w_noise, top_k,
                              rng=None, noise_eps=noise_eps)

        monkeypatch.setattr(moe_ops, "noisy_top_k_gates", clean_gates)
    else:
        # identical serial-adapter init (reference kaiming down / ZERO up
        # — the shipped init, trained for real by both runs)
        peft_tree = {"adapter": {
            "w_down": jnp.asarray(stack("adaptmlp.down_proj.weight")
                                  .transpose(0, 2, 1)),
            "b_down": jnp.asarray(stack("adaptmlp.down_proj.bias")),
            "w_up": jnp.asarray(stack("adaptmlp.up_proj.weight")
                                .transpose(0, 2, 1)),
            "b_up": jnp.asarray(stack("adaptmlp.up_proj.bias")),
        }}
        peft_cfg = PEFTConfig(method="adapter", encoder="image",
                              adapter_dim=64, adapter_scale=0.1)
    import lifelong_clip_tpu.methods.adapter_clip as ours_mod
    monkeypatch.setattr(ours_mod, "build_peft",
                        lambda rng, ccfg, pcfg: {"vision": peft_tree,
                                                 "text": None})
    # pin build_clip to the converted reference weights regardless of what
    # earlier tests left behind (test_engine._TinyMixin patches the symbol
    # in every methods module and never restores it)
    from lifelong_clip_tpu.models.convert import load_clip_params
    monkeypatch.setattr(ours_mod, "build_clip",
                        lambda *a, **k: load_clip_params(str(ckpt)))

    monkeypatch.setattr(prep, "make_train_pipeline", _det_pipeline)

    quirky = []

    class ParityTrainer(AdapterCLIP):
        def online_after_task(self, task_id):
            super().online_after_task(task_id)
            # reference _total_classes: disjoint_class_num reshapes ALL
            # class names over tasks (online_sampler.py:62-63 never slices
            # to disjoint_num), so each task "introduces"
            # n_classes/n_tasks ids regardless of the Si-Blurry split
            total = (task_id + 1) * N_CLASSES // N_TASKS
            quirky.append(self._quirky_eval(total))

        def _quirky_eval(self, total_classes: int) -> float:
            """Reference eval: table = all_classnames[:_total_classes],
            slot index == class id, over exposed-class test samples."""
            names = self.train_dataset.class_names[:total_classes]
            toks = tokenize([self.cfg.text_template.format(n)
                             for n in names],
                            context_length=self.clip_cfg.context_length)
            feats = self._text_fn(self.state.frozen, self.state.trainable,
                                  jnp.asarray(toks))
            mask = jnp.zeros((total_classes,), jnp.float32)
            idx = exposed_test_indices(self.test_dataset.targets,
                                       self.vocab.exposed)
            bs = 32
            correct = total = 0
            for lo in range(0, len(idx), bs):
                chunk = idx[lo:lo + bs]
                images, labels = self.test_dataset.gather(chunk)
                n = len(chunk)
                if n < bs:
                    images = np.concatenate(
                        [images] * (-(-bs // n)), axis=0)[:bs]
                preds, _ = self._eval_fn(
                    self.state.frozen, self.state.trainable,
                    jnp.asarray(images), feats, mask)
                preds = np.asarray(preds)[:n]
                correct += int((preds == labels).sum())
                total += n
            return correct / max(total, 1)

    cfg = TrainConfig(
        # model_name is a placeholder preset: the real (tiny) architecture
        # is inferred from the checkpoint via pretrained_path
        method={"lora": "lora-clip", "adapter": "adapter-clip",
                "moe": "moe-clip"}[peft],
        dataset="synthetic-20", model_name="ViT-B/16",
        pretrained_path=str(ckpt), batchsize=BATCH, test_batchsize=32,
        online_iter=1, temp_batchsize=0, lr=LR, opt_name="adamw",
        sched_name="default", memory_size=0, eval_period=100000,
        visible_classes="batch", peft=peft_cfg,
        stream=StreamConfig(n_tasks=N_TASKS, n=50, m=10, rnd_NM=False,
                            seed=SEED),
        transforms=(), use_bf16=False, log_path=str(tmp_path),
        seed=SEED)

    tr = ParityTrainer(cfg, train_dataset=ref_env.ds_train,
                       test_dataset=ref_env.ds_test)
    losses = []
    orig_step = tr.online_step

    def record_step(images, labels, idx):
        stats = orig_step(images, labels, idx)
        losses.append(float(stats["loss"]))
        return stats

    tr.online_step = record_step
    tr.run()
    return np.asarray(quirky, np.float64), np.asarray(losses)


def test_whole_run_trajectories_match(ref_env, monkeypatch, tmp_path):
    ref_acc, ref_losses = _run_reference(ref_env)
    our_acc, our_losses = _run_ours(ref_env, monkeypatch, tmp_path)

    assert len(ref_losses) == len(our_losses), \
        "step counts differ: stream/batching diverged"
    # step 0: identical weights + deterministic transforms -> the loss is
    # the same forward math; tight agreement pins CE-on-probs + tower
    # parity through both training stacks
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-4,
                               atol=1e-4)
    # early trajectory: fp32 accumulation drift only
    np.testing.assert_allclose(our_losses[:10], ref_losses[:10], rtol=2e-2,
                               atol=2e-2)
    # whole-run loss trajectory stays close in the mean
    assert abs(our_losses.mean() - ref_losses.mean()) < 0.05, \
        (our_losses.mean(), ref_losses.mean())

    # per-task accuracy trajectories (the reference's own quirky metric,
    # mirrored exactly on our side); fp32 drift can flip a borderline
    # prediction or two, hence the small absolute slack
    assert ref_acc.shape == our_acc.shape == (N_TASKS,)
    np.testing.assert_allclose(our_acc, ref_acc, atol=0.01)


def test_adapter_whole_run_trajectories_match(ref_env, monkeypatch,
                                              tmp_path):
    """Same trainer family, serial-adapter design (reference
    models/__init__.py:23-27 routes adapter-clip to
    AdapterCLIP(peft_method='adapter')): pins the down-ReLU-up adapter
    math on attn+mlp through real training from the shipped zero-init
    up projection."""
    ref_acc, ref_losses = _run_reference(ref_env, method="adapter-clip")
    our_acc, our_losses = _run_ours(ref_env, monkeypatch, tmp_path,
                                    peft="adapter")

    assert len(ref_losses) == len(our_losses)
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(our_losses[:10], ref_losses[:10], rtol=2e-2,
                               atol=2e-2)
    assert abs(our_losses.mean() - ref_losses.mean()) < 0.05, \
        (our_losses.mean(), ref_losses.mean())
    assert ref_acc.shape == our_acc.shape == (N_TASKS,)
    np.testing.assert_allclose(our_acc, ref_acc, atol=0.01)


def test_moe_whole_run_trajectories_match(ref_env, monkeypatch, tmp_path):
    """Same trainer family, MoA design (mixture of adapter experts with
    noisy-top-k routing, reference model.py:445-636 — never registered in
    the shipped registry; reachable only via
    AdapterCLIP(peft_method='moe')). Pins per-sample CLS-token gating,
    top-k softmax gate weights, the dense all-expert combine against the
    reference's SparseDispatcher scatter/gather, router gradients through
    the gate softmax, and per-expert adapter training. The shipped
    zero router/up init makes gating degenerate (all logits tie at zero,
    expert deltas vanish), so _liven_moe_init seeds identical small-random
    router/up on BOTH sides — the step-0 rtol 1e-4 assertion then really
    pins the gate math (teeth-checked: top_k=1 on our side fails step 0).
    Gate noise disabled on both sides (RNG backends cannot be
    stream-matched); the reference's router unfreeze is an in-harness
    intent patch documented in _run_reference."""
    ref_acc, ref_losses = _run_reference(ref_env, method="moe-clip")
    our_acc, our_losses = _run_ours(ref_env, monkeypatch, tmp_path,
                                    peft="moe")

    assert len(ref_losses) == len(our_losses)
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(our_losses[:10], ref_losses[:10], rtol=2e-2,
                               atol=2e-2)
    assert abs(our_losses.mean() - ref_losses.mean()) < 0.05, \
        (our_losses.mean(), ref_losses.mean())
    assert ref_acc.shape == our_acc.shape == (N_TASKS,)
    np.testing.assert_allclose(our_acc, ref_acc, atol=0.01)


# ==========================================================================
# mvp-clip: whole-run parity for the prompt-injection family
# ==========================================================================
#
# Additional in-harness patches this family needs (reference defects #3/#4,
# PARITY.md "reference defects"): CLIP_MVP exposes no `.dtype`
# (_trainer.py:283 reads it), patched in the fixture's model builder; and
# the shipped `memory_batchsize = 0` (_trainer.py:147) makes online_step's
# `DataLoader(batch_size=0)` (mvp_clip.py:56-59) raise — patched to 1,
# which is behavior-neutral at memory_size=0 (the `len(self.memory) > 0`
# guard keeps the provider unread and the memory stays empty).

def _mvp_ref_kwargs(log_path: str):
    kw = _ref_kwargs(log_path)
    kw.update(method="mvp-clip", opt_name="adam", use_mask=True,
              use_contrastiv=True, use_afs=True, use_gsf=True,
              use_last_layer=True, alpha=0.5, gamma=2.0, margin=0.5,
              selection_size=1,
              # the shipped default (batchsize//2, _trainer.py:142-143):
              # temp_batchsize=0 makes MemoryBatchSampler's iterations 0
              # and torch.cat([]) raise; 8 is behavior-neutral at
              # memory_size=0 (the memory provider is never read)
              temp_batchsize=None)
    return kw


def _patch_memory_loader_workers(trainer_mod):
    """Harness-only speedup: the reference online_step constructs AND
    iter()s a DataLoader(num_workers=4) for the (empty) replay memory on
    EVERY step — ~4 worker-process forks per step, minutes of pure fork
    overhead on this 1-core box. Worker count is not semantics and the
    provider is never read at memory_size=0; force 0 workers."""
    import torch.utils.data as tud
    real = tud.DataLoader

    def zero_workers(*a, **k):
        k["num_workers"] = 0
        return real(*a, **k)

    trainer_mod.DataLoader = zero_workers


def _run_reference_mvp(ref_env):
    import methods.mvp_clip as ref_mvp_trainer_mod
    _patch_memory_loader_workers(ref_mvp_trainer_mod)
    tr = ref_env.mvp_trainer_cls(**_mvp_ref_kwargs(
        str(ref_env.tmp / "mvp")))
    tr.memory_batchsize = 1  # in-harness patch for shipped defect #4
    # _trainer.py:133-138 computes world_size = cuda.device_count() -> 0
    # on a GPU-less host, zeroing MemoryBatchSampler's iterations; 1 is
    # the single-GPU value
    tr.world_size = 1
    # shipped defect: _trainer.py:350 calls report_training with
    # (epoch, samples_cnt, loss, acc) but CLIP_MVP.report_training
    # (mvp_clip.py:282) takes (sample_num, loss, acc) — logging-only,
    # stubbed out
    tr.report_training = lambda *a, **k: None
    # same defect class: _trainer.py:438 calls online_evaluate(loader,
    # samples_cnt) but CLIP_MVP.online_evaluate (mvp_clip.py:134) takes
    # only the loader; samples_cnt is unused there
    _orig_eval = tr.online_evaluate
    tr.online_evaluate = lambda loader, *a, **k: _orig_eval(loader)

    # shipped defect: mvp's online_evaluate allocates zeros(n_classes)=20
    # per-class bins (mvp_clip.py:136-137) but _trainer._interpret_pred
    # returns hardcoded zeros(10) bins — size-mismatch crash for any
    # n_classes != 10. The bins only feed the cls_acc log line (avg_acc,
    # which this test compares, is total_correct/total_num); patch a
    # size-correct histogram
    def fixed_interpret(y, pred):
        import torch
        cnt = torch.zeros(tr.n_classes)
        correct = torch.zeros(tr.n_classes)
        for c in y.unique():
            m = y == c
            cnt[c] = m.sum()
            correct[c] = (pred[m] == c).sum()
        return cnt, correct

    tr._interpret_pred = fixed_interpret
    losses = []
    orig_step = tr.online_step

    def record_step(images, labels, idx):
        loss, acc = orig_step(images, labels, idx)
        losses.append(float(loss))
        return loss, acc

    tr.online_step = record_step
    tr.run()
    acc = np.load(os.path.join(tr.log_dir, f"seed_{SEED}.npy"))
    return np.asarray(acc, np.float64), np.asarray(losses)


def _run_ours_mvp(ref_env, monkeypatch, tmp_path):
    import torch
    import jax.numpy as jnp
    from lifelong_clip_tpu.config import (TrainConfig, PEFTConfig,
                                          StreamConfig)
    import lifelong_clip_tpu.methods.mvp_clip as ours_mvp_mod
    from lifelong_clip_tpu.methods.mvp_clip import CLIP_MVP_Full
    from lifelong_clip_tpu.models.convert import load_clip_params
    from lifelong_clip_tpu.ops import preprocess as prep

    # bit-identical weights: the fixture's builder reseeds torch before
    # constructing, so this model equals the one the reference run trains
    ref_m = ref_env.build_ref_mvp_model()
    ckpt = tmp_path / "tiny_mvp_backbone.pt"
    torch.save(ref_m.backbone.state_dict(), str(ckpt))
    mvp_tree = {
        "key": jnp.asarray(ref_m.key.detach().numpy()),
        "mask": jnp.asarray(ref_m.mask.detach().numpy()),
        "g_prompts": jnp.asarray(ref_m.g_prompts.detach().numpy()),
        "e_prompts": jnp.asarray(ref_m.e_prompts.detach().numpy()),
    }
    monkeypatch.setattr(ours_mvp_mod, "build_clip",
                        lambda *a, **k: load_clip_params(str(ckpt)))
    monkeypatch.setattr(ours_mvp_mod, "init_mvp_params",
                        lambda *a, **k: mvp_tree)
    monkeypatch.setattr(prep, "make_train_pipeline", _det_pipeline)

    accs, losses = [], []

    class ParityMVPTrainer(CLIP_MVP_Full):
        """Mirrors two reference behaviors our production trainer does
        differently: no padding of partial tail batches (the reference
        trains on the raw 4-sample tail), and the reference's quirky batch
        table — batch-local class order is FIRST APPEARANCE IN THE BATCH,
        and `mask[:, y.unique()]` (mvp_clip.py:113) resolves to per-prompt
        mask columns 0..K-1 regardless of which classes are in the batch
        (y is batch-local, so its sorted unique is always arange(K))."""

        def _quirky_batch_table(self, batch_labels, capacity):
            v = self.vocab
            uniq = []
            for yy in np.asarray(batch_labels).ravel():
                yy = int(yy)
                if yy not in uniq:
                    uniq.append(yy)
            tokens = np.zeros((capacity, v.context_length), np.int32)
            mask = np.full((capacity,), -np.inf, np.float32)
            slots = np.full((capacity,), -1, np.int64)
            local = {}
            for i, yy in enumerate(uniq):
                tokens[i] = v.token_table[v._pos[yy]]
                mask[i] = 0.0
                slots[i] = i  # reference quirk: mask columns 0..K-1
                local[yy] = i
            labels = np.asarray(
                [local[int(yy)] for yy in np.asarray(batch_labels)],
                np.int64)
            return tokens, mask, labels, slots

        def online_step(self, images, labels, indices):
            import jax.numpy as jnp
            cfg = self.cfg
            tokens, mask, y, slot_globals = self._quirky_batch_table(
                labels, self.step_capacity)
            batch = {"images": jnp.asarray(images),
                     "labels": jnp.asarray(y, jnp.int32),
                     "tokens": jnp.asarray(tokens),
                     "mask": jnp.asarray(mask),
                     "slot_globals": jnp.asarray(slot_globals, jnp.int32)}
            stats = {}
            for _ in range(max(int(cfg.online_iter), 1)):
                self.state, self.count, stats = self._mvp_step(
                    self.state, batch, self.count)
            losses.append(float(stats["loss"]))
            return stats

        def online_after_task(self, task_id):
            super().online_after_task(task_id)
            # reference task-end eval (evalue_afterTrain -> mvp
            # online_evaluate): exposed-class test samples against the
            # exposure-ordered class table — exactly this repo's
            # evaluate() semantics, so no quirk mirror is needed here
            correct, total = self.evaluate()
            accs.append(correct.sum() / max(total.sum(), 1))

    cfg = TrainConfig(
        method="mvp-clip", dataset="synthetic-20", model_name="ViT-B/16",
        pretrained_path=str(ckpt), batchsize=BATCH, test_batchsize=32,
        online_iter=1, temp_batchsize=0, lr=LR, opt_name="adam",
        sched_name="const", memory_size=0, eval_period=100000,
        visible_classes="batch", peft=PEFTConfig(method="mvp"),
        stream=StreamConfig(n_tasks=N_TASKS, n=50, m=10, rnd_NM=False,
                            seed=SEED),
        transforms=(), use_bf16=False, log_path=str(tmp_path),
        seed=SEED)

    tr = ParityMVPTrainer(cfg, train_dataset=ref_env.ds_train,
                          test_dataset=ref_env.ds_test)
    tr.run()
    return np.asarray(accs, np.float64), np.asarray(losses)


def test_mvp_whole_run_trajectories_match(ref_env, monkeypatch, tmp_path):
    ref_acc, ref_losses = _run_reference_mvp(ref_env)
    our_acc, our_losses = _run_ours_mvp(ref_env, monkeypatch, tmp_path)

    assert len(ref_losses) == len(our_losses), \
        "step counts differ: stream/batching diverged"
    # step 0 pins the whole stack: prompt selection + injection, the
    # contrastive cross-term loss, GSF via vmap(grad) vs the reference's
    # backward-in-a-loop, masking quirks
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(our_losses[:10], ref_losses[:10], rtol=2e-2,
                               atol=2e-2)
    assert abs(our_losses.mean() - ref_losses.mean()) < 0.05, \
        (our_losses.mean(), ref_losses.mean())

    assert ref_acc.shape == our_acc.shape == (N_TASKS,)
    np.testing.assert_allclose(our_acc, ref_acc, atol=0.02)


# ==========================================================================
# maple: whole-run parity for the compound multi-modal prompt family
# ==========================================================================
#
# Additional in-harness patches this family needs (all shipped reference
# defects, same classes as the mvp ones): the .half() prompt casts
# (handled in _install_stubs), memory_batchsize=0 -> DataLoader
# (batch_size=0) raise, world_size = cuda.device_count() = 0,
# report_training arity (maple.py:301 takes 3 args, _trainer.py:350 passes
# 4), online_evaluate arity (maple.py:173 takes 1, _trainer.py:438 passes
# 2), and the 10-bin _interpret_pred histogram (crashes at n_classes=20).

def _maple_ref_kwargs(log_path: str):
    kw = _ref_kwargs(log_path)
    # temp_batchsize=None -> the shipped batchsize//2 default: maple's
    # per-step MemoryBatchSampler draws `temp_batchsize*online_iter*
    # world_size` iterations, and 0 iterations makes torch.cat([]) raise
    # (same defect class the mvp harness documents); 8 is behavior-neutral
    # at memory_size=0 (all draws are empty)
    kw.update(method="maple", n_ctx=3, temp_batchsize=None)
    return kw


def _run_reference_maple(ref_env):
    import torch
    import methods.maple as ref_maple_trainer_mod
    _patch_memory_loader_workers(ref_maple_trainer_mod)
    tr = ref_env.maple_trainer_cls(**_maple_ref_kwargs(
        str(ref_env.tmp / "maple")))
    tr.memory_batchsize = 1   # shipped defect #4 (behavior-neutral: the
    tr.world_size = 1         # memory stays empty at memory_size=0)
    tr.report_training = lambda *a, **k: None
    _orig_eval = tr.online_evaluate
    tr.online_evaluate = lambda loader, *a, **k: _orig_eval(loader)

    def fixed_interpret(y, pred):
        cnt = torch.zeros(tr.n_classes)
        correct = torch.zeros(tr.n_classes)
        for c in y.unique():
            m = y == c
            cnt[c] = m.sum()
            correct[c] = (pred[m] == c).sum()
        return cnt, correct

    tr._interpret_pred = fixed_interpret
    losses = []
    orig_step = tr.online_step

    def record_step(images, labels, idx):
        loss, acc = orig_step(images, labels, idx)
        losses.append(float(loss))
        return loss, acc

    tr.online_step = record_step
    tr.run()
    acc = np.load(os.path.join(tr.log_dir, f"seed_{SEED}.npy"))
    return np.asarray(acc, np.float64), np.asarray(losses)


def _run_ours_maple(ref_env, monkeypatch, tmp_path):
    import torch
    import jax.numpy as jnp
    from lifelong_clip_tpu.config import (TrainConfig, PEFTConfig,
                                          StreamConfig)
    import lifelong_clip_tpu.methods.maple as ours_maple_mod
    from lifelong_clip_tpu.methods.maple import MaPLe as OurMaPLe
    from lifelong_clip_tpu.models.convert import load_clip_params
    from lifelong_clip_tpu.ops import preprocess as prep

    # bit-identical weights: towers through the converter, prompt learner
    # converted tensor-by-tensor (ctx / proj / compound prompts + the
    # cloned per-depth projections)
    ref_m = ref_env.build_ref_maple_model()
    ckpt = tmp_path / "tiny_maple_backbone.pt"
    torch.save(ref_m.base_clip_model.state_dict(), str(ckpt))
    pl = ref_m.prompt_learner
    learner = {
        "ctx": jnp.asarray(pl.ctx.detach().numpy()),
        "proj_w": jnp.asarray(pl.proj.weight.detach().numpy().T),
        "proj_b": jnp.asarray(pl.proj.bias.detach().numpy()),
        "compound_text": jnp.asarray(
            torch.stack(list(pl.compound_prompts_text)).detach().numpy()),
        "compound_proj_w": jnp.asarray(np.stack(
            [l.weight.detach().numpy().T
             for l in pl.compound_prompt_projections])),
        "compound_proj_b": jnp.asarray(np.stack(
            [l.bias.detach().numpy()
             for l in pl.compound_prompt_projections])),
    }
    monkeypatch.setattr(ours_maple_mod, "build_clip",
                        lambda *a, **k: load_clip_params(str(ckpt)))
    monkeypatch.setattr(ours_maple_mod, "init_maple_params",
                        lambda *a, **k: learner)
    monkeypatch.setattr(prep, "make_train_pipeline", _det_pipeline)

    accs, losses = [], []

    class ParityMaPLeTrainer(OurMaPLe):
        """Production trainer minus tail-batch padding (the reference
        trains on the raw 4-sample tail)."""

        def online_step(self, images, labels, indices):
            cfg = self.cfg
            tokens, mask, y, _ = self.vocab.batch_table(
                labels, self.step_capacity)
            batch = {"images": jnp.asarray(images),
                     "labels": jnp.asarray(y, jnp.int32),
                     "tokens": jnp.asarray(tokens),
                     "mask": jnp.asarray(mask)}
            stats = {}
            for _ in range(max(int(cfg.online_iter), 1)):
                self.state, stats = self._train_step(self.state, batch)
            self._txt_cache_key = None
            losses.append(float(stats["loss"]))
            return stats

        def online_after_task(self, task_id):
            super().online_after_task(task_id)
            # reference task-end eval (evalue_afterTrain -> maple
            # online_evaluate): exposed-class test samples scored against
            # the exposure-ordered class table == this repo's evaluate()
            correct, total = self.evaluate()
            accs.append(correct.sum() / max(total.sum(), 1))

    cfg = TrainConfig(
        method="maple", dataset="synthetic-20", model_name="ViT-B/16",
        pretrained_path=str(ckpt), batchsize=BATCH, test_batchsize=32,
        online_iter=1, temp_batchsize=0, lr=LR, opt_name="adamw",
        sched_name="const", memory_size=0, eval_period=100000,
        visible_classes="batch", peft=PEFTConfig(method="maple"),
        stream=StreamConfig(n_tasks=N_TASKS, n=50, m=10, rnd_NM=False,
                            seed=SEED),
        transforms=(), use_bf16=False, log_path=str(tmp_path),
        seed=SEED)

    tr = ParityMaPLeTrainer(cfg, train_dataset=ref_env.ds_train,
                            test_dataset=ref_env.ds_test)
    tr.run()
    return np.asarray(accs, np.float64), np.asarray(losses)


# ==========================================================================
# continual-clip: whole-run parity for the zero-shot path
# ==========================================================================
#
# The reference's ContinualCLIP wraps the PIP `clip` package (2-tuple
# forward); this harness serves the vendored tiny CLIP through a 2-tuple
# adapter so the real trainer loop runs unmodified. Exercises the
# OnlineTestSampler exposure filtering, exposure-ordered text classifier
# rebuild, and the task-acc artifact pipeline with zero training.

def _czs_ref_kwargs(log_path: str):
    kw = _ref_kwargs(log_path)
    kw.update(method="continual-clip")
    return kw


def _run_reference_czs(ref_env):
    import sys as _sys
    import torch
    import models.maple_clip.clip as ref_mc_clip  # tokenize (CLIP BPE)
    import models.continual_clip as ref_czs_model_mod  # noqa: E402

    class _TwoTuple(torch.nn.Module):
        """pip-clip API adapter over the vendored 4-tuple CLIP."""

        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, image, text):
            out = self.m(image, text)
            return out[0], out[1]

    clip_stub = _sys.modules["clip"]
    clip_stub.load = lambda name, device="cpu", jit=False: (
        _TwoTuple(ref_env.tiny_loader(name)), None)
    clip_stub.tokenize = ref_mc_clip.tokenize

    import methods.continual_clip as ref_czs_trainer  # noqa: E402
    # shipped defects (same classes as mvp/maple): no .dtype on the
    # wrapper (class-attr patch — custom_clip is only built inside
    # run()); report_training/online_evaluate arity; 10-bin histogram
    ref_czs_model_mod.ContinualCLIP.dtype = torch.float32
    tr = ref_czs_trainer.ContinualCLIP(**_czs_ref_kwargs(
        str(ref_env.tmp / "czs")))
    tr.report_training = lambda *a, **k: None
    _orig_eval = tr.online_evaluate
    tr.online_evaluate = lambda loader, *a, **k: _orig_eval(loader)

    def fixed_interpret(y, pred):
        cnt = torch.zeros(tr.n_classes)
        correct = torch.zeros(tr.n_classes)
        for c in y.unique():
            m = y == c
            cnt[c] = m.sum()
            correct[c] = (pred[m] == c).sum()
        return cnt, correct

    tr._interpret_pred = fixed_interpret
    tr.run()
    acc = np.load(os.path.join(tr.log_dir, f"seed_{SEED}.npy"))
    return np.asarray(acc, np.float64)


def _run_ours_czs(ref_env, monkeypatch, tmp_path):
    import torch
    from lifelong_clip_tpu.config import (TrainConfig, PEFTConfig,
                                          StreamConfig)
    import lifelong_clip_tpu.methods.continual_clip as ours_czs_mod
    from lifelong_clip_tpu.methods.continual_clip import (
        ContinualCLIP as OurCZS)
    from lifelong_clip_tpu.models.convert import load_clip_params
    from lifelong_clip_tpu.ops import preprocess as prep

    ref_model = ref_env.tiny_loader("tiny")
    ckpt = tmp_path / "tiny_vanilla.pt"
    torch.save(ref_model.state_dict(), str(ckpt))
    monkeypatch.setattr(ours_czs_mod, "build_clip",
                        lambda *a, **k: load_clip_params(str(ckpt)))
    monkeypatch.setattr(prep, "make_train_pipeline", _det_pipeline)

    accs = []

    class ParityCZS(OurCZS):
        def online_after_task(self, task_id):
            super().online_after_task(task_id)
            correct, total = self.evaluate()
            accs.append(correct.sum() / max(total.sum(), 1))

    cfg = TrainConfig(
        method="continual-clip", dataset="synthetic-20",
        model_name="ViT-B/16", pretrained_path=str(ckpt),
        batchsize=BATCH, test_batchsize=32, online_iter=1,
        temp_batchsize=0, lr=LR, opt_name="adamw", sched_name="const",
        memory_size=0, eval_period=100000, visible_classes="batch",
        peft=PEFTConfig(method="none"),
        stream=StreamConfig(n_tasks=N_TASKS, n=50, m=10, rnd_NM=False,
                            seed=SEED),
        transforms=(), use_bf16=False, log_path=str(tmp_path),
        seed=SEED)

    tr = ParityCZS(cfg, train_dataset=ref_env.ds_train,
                   test_dataset=ref_env.ds_test)
    tr.run()
    return np.asarray(accs, np.float64)


def test_zero_shot_whole_run_trajectories_match(ref_env, monkeypatch,
                                                tmp_path):
    ref_acc = _run_reference_czs(ref_env)
    our_acc = _run_ours_czs(ref_env, monkeypatch, tmp_path)
    assert ref_acc.shape == our_acc.shape == (N_TASKS,)
    # frozen model, deterministic preprocessing: only fp32 accumulation
    # drift can flip a borderline prediction
    np.testing.assert_allclose(our_acc, ref_acc, atol=0.01)


def test_maple_whole_run_trajectories_match(ref_env, monkeypatch,
                                            tmp_path):
    ref_acc, ref_losses = _run_reference_maple(ref_env)
    our_acc, our_losses = _run_ours_maple(ref_env, monkeypatch, tmp_path)

    assert len(ref_losses) == len(our_losses), \
        "step counts differ: stream/batching diverged"
    # step 0 pins the whole compound-prompt stack: ctx splice + per-layer
    # replacement on both towers, the 512->768 projections, EOT pooling
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(our_losses[:10], ref_losses[:10], rtol=2e-2,
                               atol=2e-2)
    assert abs(our_losses.mean() - ref_losses.mean()) < 0.05, \
        (our_losses.mean(), ref_losses.mean())

    assert ref_acc.shape == our_acc.shape == (N_TASKS,)
    np.testing.assert_allclose(our_acc, ref_acc, atol=0.02)


# ==========================================================================
# proto-clip: whole-run parity for the two-stage prototype/prompt family
# ==========================================================================
#
# Full two-stage run: stage-1 prompt-pool training, pre/post-task feature
# extraction, semantic-drift compensation, per-class MVN prototypes, and
# the stage-2 compact-classifier retrain (ca+ssca on). The parity
# subclass mirrors three reference quirks the production trainer
# implements sanely: the raw-id prototype window (range(known, total)
# assumes classes enter in id order — here the vocab is pre-exposed in id
# order so slot == class id), the all_classnames[:_total_classes] eval
# table, and torch-global-RNG MVN sampling in stage 2 (the torch RNG
# state matches the reference's: both processes reseed inside the tiny
# loader and draw nothing else from the global stream in between).

PROTO_N_TASKS = 5
PROTO_NUM_PROMPT = 6
PROTO_N_CTX = 3
PROTO_TOPK = 2
PROTO_PCLS = 16
PROTO_CA_EPOCHS = 2


def _proto_ref_kwargs(log_path: str):
    kw = _ref_kwargs(log_path)
    kw.update(method="adapter-clip-proto_prompt",
              model_type="adapter-clip-proto_prompt",
              n_tasks=PROTO_N_TASKS, num_prompt=PROTO_NUM_PROMPT,
              n_ctx=PROTO_N_CTX, topK=PROTO_TOPK, feature_dim=512,
              num_sampled_pcls=PROTO_PCLS, ca=True, ssca=True,
              ca_epochs=PROTO_CA_EPOCHS)
    return kw


def _run_reference_proto(ref_env):
    import torch
    import methods.Trainer_ProtoCLIP as ref_proto_trainer_mod
    _patch_memory_loader_workers(ref_proto_trainer_mod)
    tr = ref_env.proto_trainer_cls(**_proto_ref_kwargs(
        str(ref_env.tmp / "proto")))

    # shipped defect: online_evaluate allocates zeros(n_tasks) task bins
    # but _interpret_pred returns hardcoded zeros(10) — size mismatch for
    # n_tasks != 10. Only the sums feed avg_acc; bin everything into 0.
    def fixed_interpret(y, pred):
        cnt = torch.zeros(tr.n_tasks)
        correct = torch.zeros(tr.n_tasks)
        cnt[0] = len(y)
        correct[0] = (pred == y).sum()
        return cnt, correct

    tr._interpret_pred = fixed_interpret
    losses = []
    orig_step = tr.online_step

    def record_step(images, labels, idx):
        loss, acc = orig_step(images, labels, idx)
        losses.append(float(loss))
        return loss, acc

    tr.online_step = record_step
    tr.run()
    acc = np.load(os.path.join(tr.log_dir, f"seed_{SEED}.npy"))
    return np.asarray(acc, np.float64), np.asarray(losses)


def _run_ours_proto(ref_env, monkeypatch, tmp_path):
    import argparse
    import torch
    import jax.numpy as jnp
    from lifelong_clip_tpu.config import (TrainConfig, PEFTConfig,
                                          StreamConfig)
    import lifelong_clip_tpu.methods.proto_clip as ours_proto_mod
    from lifelong_clip_tpu.methods.proto_clip import (
        Trainer_ProtoCLIP as OurProto)
    from lifelong_clip_tpu.models.convert import load_clip_params
    from lifelong_clip_tpu.models import proto_clip as pc_models
    from lifelong_clip_tpu.ops import preprocess as prep
    from lifelong_clip_tpu.utils.stream import exposed_test_indices
    from lifelong_clip_tpu.utils.tokenizer import tokenize

    args = argparse.Namespace(**_proto_ref_kwargs(str(tmp_path)))
    ref_m = ref_env.build_ref_proto_model(args)
    ckpt = tmp_path / "tiny_proto_backbone.pt"
    torch.save(ref_m.model.state_dict(), str(ckpt))
    n_copl = len(ref_m.prompt_module.e_layers)
    proto_tree = {
        "text_key": jnp.asarray(ref_m.text_key.detach().numpy()),
        "text_prompt": jnp.asarray(ref_m.text_prompt.detach().numpy()),
        "copl": {
            "k": jnp.asarray(np.stack(
                [getattr(ref_m.prompt_module, f"e_k_{l}").detach().numpy()
                 for l in range(n_copl)])),
            "a": jnp.asarray(np.stack(
                [getattr(ref_m.prompt_module, f"e_a_{l}").detach().numpy()
                 for l in range(n_copl)])),
            "p": jnp.asarray(np.stack(
                [getattr(ref_m.prompt_module, f"e_p_{l}").detach().numpy()
                 for l in range(n_copl)])),
        },
    }
    monkeypatch.setattr(ours_proto_mod, "build_clip",
                        lambda *a, **k: load_clip_params(str(ckpt)))
    monkeypatch.setattr(pc_models, "init_proto_params",
                        lambda *a, **k: proto_tree)
    monkeypatch.setattr(prep, "make_train_pipeline", _det_pipeline)

    accs, losses = [], []

    class ParityProto(OurProto):
        num_prompt = PROTO_NUM_PROMPT
        n_ctx = PROTO_N_CTX
        top_k = PROTO_TOPK
        num_sampled_pcls = PROTO_PCLS
        ca_epochs = PROTO_CA_EPOCHS
        ca = True
        ssca = True

        def setup_model(self):
            super().setup_model()
            # reference raw-id quirk: prototype window / stage-2 table /
            # eval table all index classes by RAW id — pre-exposing the
            # vocab in id order makes slot == class id (CE is invariant
            # to table-slot permutation, so stage-1 is unaffected)
            self.vocab.expose(range(N_CLASSES))
            self._seen = set()
            self._known = 0
            self._total = 0

        def online_step(self, images, labels, indices):
            cfg = self.cfg
            self._seen.update(int(y) for y in np.asarray(labels))
            tokens, mask, y, _ = self.vocab.batch_table(
                labels, self.step_capacity)
            batch = {"images": jnp.asarray(images),
                     "labels": jnp.asarray(y, jnp.int32),
                     "tokens": jnp.asarray(tokens),
                     "mask": jnp.asarray(mask)}
            self.state, stats = self._stage1_step(self.state, batch,
                                                  self.task_count)
            self._task_samples.extend(int(i) for i in indices)
            losses.append(float(stats["loss"]))
            return stats

        def _prototype_classes(self, task_id):
            # reference window: range(_known_classes, _total_classes)
            # advanced by disjoint_class_num — which the sampler computes
            # as the QUIRKY n_classes/n_tasks reshape of ALL class names
            # (online_sampler.py:62-63), NOT the true disjoint count
            self._known = self._total
            self._total += N_CLASSES // PROTO_N_TASKS
            return list(range(self._known, self._total))

        def _stage2_task_size(self, task_id):
            return N_CLASSES // PROTO_N_TASKS  # same reshape quirk

        def _stage2_sample_epoch(self, slots, task_size, rng):
            # reference sampling (:487-524): torch MVN per class from
            # mean*(0.9+decay) f32, torch .sample + randperm on the
            # GLOBAL torch RNG
            from torch.distributions import MultivariateNormal
            feats_list, label_list = [], []
            for slot in slots:
                t_id = int(slot) // task_size
                decay = (t_id + 1) / (self.task_count + 1) * 0.1
                mean = torch.tensor(self._class_means[slot],
                                    dtype=torch.float64) * (0.9 + decay)
                m = MultivariateNormal(
                    mean.float(),
                    torch.tensor(self._class_covs[slot]).float())
                feats_list.append(m.sample((self.num_sampled_pcls,)))
                label_list.extend([int(slot)] * self.num_sampled_pcls)
            feats = torch.cat(feats_list, dim=0).to(torch.float32)
            labels = torch.tensor(label_list).long()
            perm = torch.randperm(feats.size(0))
            return (feats[perm].numpy(),
                    labels[perm].numpy().astype(np.int64))

        def online_after_task(self, task_id):
            super().online_after_task(task_id)
            accs.append(self._quirky_eval())

        def _quirky_eval(self):
            # reference eval: table = all_classnames[:_total_classes]
            # (slot == raw id), over exposed-class test samples, raw
            # labels, avg_acc in PERCENT (:232)
            names = self.train_dataset.class_names[:self._total]
            toks = tokenize([self.vocab.template.format(n)
                             for n in names],
                            context_length=self.clip_cfg.context_length)
            mask = jnp.zeros((len(names),), jnp.float32)
            idx = exposed_test_indices(self.test_dataset.targets,
                                       sorted(self._seen))
            bs = 32
            correct = total = 0
            for lo in range(0, len(idx), bs):
                chunk = idx[lo:lo + bs]
                images, labels = self.test_dataset.gather(chunk)
                n = len(chunk)
                if n < bs:
                    images = np.concatenate(
                        [images] * (-(-bs // n)), axis=0)[:bs]
                preds, _ = self._eval_fn(
                    self.state.frozen, self.state.trainable,
                    jnp.asarray(images), jnp.asarray(toks), mask,
                    self.task_count)
                preds = np.asarray(preds)[:n]
                correct += int((preds == labels).sum())
                total += n
            return 100.0 * correct / max(total, 1)

    cfg = TrainConfig(
        method="adapter-clip-proto_prompt", dataset="synthetic-20",
        model_name="ViT-B/16", pretrained_path=str(ckpt),
        batchsize=BATCH, test_batchsize=32, online_iter=1,
        temp_batchsize=0, lr=LR, opt_name="adamw", sched_name="const",
        memory_size=0, eval_period=100000, visible_classes="batch",
        peft=PEFTConfig(method="proto"),
        stream=StreamConfig(n_tasks=PROTO_N_TASKS, n=50, m=10,
                            rnd_NM=False, seed=SEED),
        transforms=(), use_bf16=False, log_path=str(tmp_path),
        seed=SEED)

    tr = ParityProto(cfg, train_dataset=ref_env.ds_train,
                     test_dataset=ref_env.ds_test)
    tr.run()
    return np.asarray(accs, np.float64), np.asarray(losses)


# The proto run is the heaviest test in the suite (~46 min standalone:
# reference torch ~31 min + ours ~14 min) and degrades BADLY when run in
# the same process as 160 earlier tests (measured >100 min — accumulated
# jit-cache/allocator state). The public test is a subprocess wrapper: a
# fresh interpreter runs the _impl at standalone speed and in isolation.

@pytest.mark.skipif(os.environ.get("LLC_PARITY_SUBPROC") != "1",
                    reason="runs via the subprocess wrapper below")
def test_proto_whole_run_trajectories_match_impl(ref_env, monkeypatch,
                                                 tmp_path):
    import time
    t0 = time.time()
    ref_acc, ref_losses = _run_reference_proto(ref_env)
    t1 = time.time()
    our_acc, our_losses = _run_ours_proto(ref_env, monkeypatch, tmp_path)
    split = (f"proto parity runtimes: reference {t1 - t0:.0f}s, "
             f"ours {time.time() - t1:.0f}s")
    print("\n" + split, file=sys.stderr)
    with open("/tmp/proto_parity_times.txt", "w") as f:
        f.write(split + "\n")

    assert len(ref_losses) == len(our_losses), \
        "step counts differ: stream/batching diverged"
    # step 0 pins the prompted tower (CoPL prefix synthesis + prefix
    # attention), top-K prompt selection, the per-(sample, class) text
    # pass, and the Σ img⊙txt logit head
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(our_losses[:10], ref_losses[:10], rtol=2e-2,
                               atol=2e-2)
    assert abs(our_losses.mean() - ref_losses.mean()) < 0.05, \
        (our_losses.mean(), ref_losses.mean())

    # per-task accs are in PERCENT. Tasks 0-2 are held tight; from the
    # second stage-2 round on, fp drift in the prototype covs (XLA vs
    # torch f32 kernels) flows through Cholesky into the MVN draws and
    # compounds through the retrained pools, so later tasks get slack;
    # the whole-trajectory mean stays tight either way
    assert ref_acc.shape == our_acc.shape == (PROTO_N_TASKS,)
    np.testing.assert_allclose(our_acc[:3], ref_acc[:3], atol=2.0)
    np.testing.assert_allclose(our_acc, ref_acc, atol=6.0)
    assert abs(our_acc.mean() - ref_acc.mean()) < 2.0, (our_acc, ref_acc)


def test_proto_whole_run_trajectories_match():
    import subprocess
    env = dict(os.environ, LLC_PARITY_SUBPROC="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.abspath(__file__)
         + "::test_proto_whole_run_trajectories_match_impl", "-x", "-q"],
        env=env, capture_output=True, text=True, timeout=5400)
    assert r.returncode == 0, \
        "proto parity subprocess failed:\n" + r.stdout[-4000:] + \
        r.stderr[-2000:]
    # a skipped child (env gate not propagated) also exits 0 — require
    # the test to have actually run
    assert "1 passed" in r.stdout, \
        "proto parity subprocess did not run the impl:\n" + r.stdout[-2000:]


# ==========================================================================
# mvp (ViT classifier): whole-run parity for the timm-backbone family
# ==========================================================================
#
# The reference's methods/mvp.py is the ONLY registered trainer over the
# timm ViT backbones (l2p/dualprompt have models but no main.py/methods
# entry). timm itself is not installed here; _install_timm_shim serves a
# faithful tiny timm-0.6.12 VisionTransformer through the real
# models/mvp.py. Shipped defects patched in-harness (same classes as the
# mvp-clip family, PARITY.md #3-#6): no `.dtype` attribute,
# memory_batchsize=0 -> DataLoader(batch_size=0) raise, world_size =
# cuda.device_count() = 0, report_training arity (mvp.py:253 takes 3,
# _trainer.py:350 passes 4), online_evaluate arity, and the 10-bin
# _interpret_pred histogram (crashes at n_classes=20).
#
# Config: scripts/mvp.sh flags (mask + contrastiv + afs + gsf;
# use_last_layer stays at its CLI default False, so the query pass skips
# the final block — models/mvp.py:188-189).

def _vitmvp_ref_kwargs(log_path: str):
    kw = _ref_kwargs(log_path)
    kw.update(method="mvp", opt_name="adam", use_mask=True,
              use_contrastiv=True, use_afs=True, use_gsf=True,
              use_last_layer=False, alpha=0.5, gamma=2.0, margin=0.5,
              temp_batchsize=None)
    return kw


def _run_reference_vitmvp(ref_env):
    import methods.mvp as ref_vitmvp_trainer_mod
    _patch_memory_loader_workers(ref_vitmvp_trainer_mod)
    tr = ref_env.vitmvp_trainer_cls(**_vitmvp_ref_kwargs(
        str(ref_env.tmp / "vitmvp")))
    tr.memory_batchsize = 1  # in-harness patch for shipped defect #4
    tr.world_size = 1        # cuda.device_count() = 0 on this host
    # shipped defect #7 (PARITY.md): methods/mvp.py reads
    # self.model_without_ddp in model_forward/_compute_grads/loss_fn/
    # setup_distributed_model (:115,190,238,265) but NOTHING in the
    # snapshot ever assigns it (`grep -rn "model_without_ddp ="` is
    # empty) — the trainer was carried from the MVP paper codebase whose
    # _Trainer bound it. Bind the evidently intended object (the model
    # sans DataParallel wrapper) before the override's attribute pokes.
    _orig_sdm = tr.setup_distributed_model

    def _sdm_with_binding():
        tr.model_without_ddp = tr.custom_clip
        _orig_sdm()

    tr.setup_distributed_model = _sdm_with_binding
    # arity defects (#5): _trainer.run passes one more argument than the
    # mvp overrides take — logging-only, stubbed / adapted
    tr.report_training = lambda *a, **k: None
    _orig_eval = tr.online_evaluate
    tr.online_evaluate = lambda loader, *a, **k: _orig_eval(loader)

    def fixed_interpret(y, pred):  # defect #6: size-correct histogram
        import torch
        cnt = torch.zeros(tr.n_classes)
        correct = torch.zeros(tr.n_classes)
        for c in y.unique():
            m = y == c
            cnt[c] = m.sum()
            correct[c] = (pred[m] == c).sum()
        return cnt, correct

    tr._interpret_pred = fixed_interpret
    losses = []
    orig_step = tr.online_step

    def record_step(images, labels, idx):
        loss, acc = orig_step(images, labels, idx)
        losses.append(float(loss))
        return loss, acc

    tr.online_step = record_step
    tr.run()
    acc = np.load(os.path.join(tr.log_dir, f"seed_{SEED}.npy"))
    return np.asarray(acc, np.float64), np.asarray(losses)


def _run_ours_vitmvp(ref_env, monkeypatch, tmp_path):
    import jax.numpy as jnp
    from lifelong_clip_tpu.config import TrainConfig, PEFTConfig, \
        StreamConfig
    import lifelong_clip_tpu.methods.vit_prompt_methods as ours_vp_mod
    import lifelong_clip_tpu.models.mvp_clip as ours_mvp_model_mod
    from lifelong_clip_tpu.methods.engine import TrainState
    from lifelong_clip_tpu.models.convert import timm_vit_to_params
    from lifelong_clip_tpu.ops import preprocess as prep

    # bit-identical weights: backbone state dict through the timm
    # converter (incl. the patch-embed conv BIAS timm has and CLIP lacks),
    # prompt pools / keys / masks / head copied leaf-for-leaf
    ref_m = ref_env.build_ref_vitmvp_model()
    sd = {k: v.detach().float().numpy()
          for k, v in ref_m.backbone.state_dict().items()}
    params, timm_cfg, head = timm_vit_to_params(sd)
    mvp_tree = {
        "key": jnp.asarray(ref_m.key.detach().numpy()),
        "mask": jnp.asarray(ref_m.mask.detach().numpy()),
        "g_prompts": jnp.asarray(ref_m.g_prompts.detach().numpy()),
        "e_prompts": jnp.asarray(ref_m.e_prompts.detach().numpy()),
    }
    monkeypatch.setattr(ours_vp_mod, "build_clip",
                        lambda *a, **k: (params, timm_cfg))
    monkeypatch.setattr(ours_mvp_model_mod, "init_mvp_params",
                        lambda *a, **k: mvp_tree)
    monkeypatch.setattr(prep, "make_train_pipeline", _det_pipeline)

    accs, losses = [], []

    class ParityVitMVP(ours_vp_mod.MVP):
        # scripts/mvp.sh flag set (class defaults mirror the all-off
        # reference CLI defaults)
        use_mask = True
        use_contrastiv = True
        use_afs = True
        use_gsf = True
        use_last_layer = False

        def setup_model(self):
            super().setup_model()
            tr_tree = dict(self.state.trainable)
            tr_tree["head"] = {"w": jnp.asarray(head["w"]),
                               "b": jnp.asarray(head["b"])}
            self.state = TrainState.create(trainable=tr_tree,
                                           frozen=self.state.frozen,
                                           tx=self.tx, rng=self.state.rng)

        def online_step(self, images, labels, indices):
            # the reference trains the raw tail batch (no padding)
            cfg = self.cfg
            batch = {"images": jnp.asarray(images),
                     "labels": jnp.asarray(self.vocab.remap(labels),
                                           jnp.int32),
                     "mask": jnp.asarray(self.vocab.logit_mask())}
            stats = {}
            for _ in range(max(int(cfg.online_iter), 1)):
                self.state, self.count, stats = self._step(
                    self.state, batch, self.count)
            losses.append(float(stats["loss"]))
            return stats

        def online_after_task(self, task_id):
            super().online_after_task(task_id)
            # reference task-end eval: exposed-class test samples against
            # exposure-ordered head slots — this repo's evaluate() exactly
            correct, total = self.evaluate()
            accs.append(correct.sum() / max(total.sum(), 1))

    cfg = TrainConfig(
        method="mvp", dataset="synthetic-20",
        model_name="vit_base_patch16_224",  # placeholder: build_clip is
        # pinned to the converted tiny backbone above
        batchsize=BATCH, test_batchsize=32, online_iter=1,
        temp_batchsize=0, lr=LR, opt_name="adam", sched_name="const",
        memory_size=0, eval_period=100000, visible_classes="batch",
        peft=PEFTConfig(method="mvp"),
        stream=StreamConfig(n_tasks=N_TASKS, n=50, m=10, rnd_NM=False,
                            seed=SEED),
        transforms=(), use_bf16=False, log_path=str(tmp_path), seed=SEED)

    tr = ParityVitMVP(cfg, train_dataset=ref_env.ds_train,
                      test_dataset=ref_env.ds_test)
    tr.run()
    return np.asarray(accs, np.float64), np.asarray(losses)


def test_vitmvp_whole_run_trajectories_match(ref_env, monkeypatch,
                                             tmp_path):
    ref_acc, ref_losses = _run_reference_vitmvp(ref_env)
    our_acc, our_losses = _run_ours_vitmvp(ref_env, monkeypatch, tmp_path)

    assert len(ref_losses) == len(our_losses), \
        "step counts differ: stream/batching diverged"
    # step 0 pins the timm converter (patch bias, exact GELU), the
    # no-final-norm query pass, prompt selection + injection through the
    # masked KV-prefix scan, the contrastive cross-term loss, and the
    # closed-form head-gradient ign/cps scores vs the reference's
    # deepcopy-head backward-in-a-loop
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(our_losses[:10], ref_losses[:10], rtol=2e-2,
                               atol=2e-2)
    assert abs(our_losses.mean() - ref_losses.mean()) < 0.05, \
        (our_losses.mean(), ref_losses.mean())

    assert ref_acc.shape == our_acc.shape == (N_TASKS,)
    np.testing.assert_allclose(our_acc, ref_acc, atol=0.02)


# ==========================================================================
# ER family (er / Finetuning / lwf): whole-run parity with an
# in-harness model
# ==========================================================================
#
# The shipped reference cannot build a model for ANY of its six ER-family
# methods (models/__init__.py has no branch — PARITY.md "Second reference
# defect"), so these runs supply the _RefHeadClassifier (this repo's
# documented ER-family design) to BOTH trainers and pin the trainer math.
# In-harness patches beyond the model (all shipped defects): `self.mask`
# is never initialized anywhere (er_baseline.py:138 reads it; lwf.py:69
# updates it; nothing creates it) — initialized to -inf with the
# exposure-slot zeroing every runnable family applies (lwf.py:69,
# mvp_clip setup_dataset); memory_batchsize=0 -> DataLoader(batch_size=0)
# raise in ER's per-step sampler; world_size = cuda.device_count() = 0;
# online_evaluate arity; the zeros(10) _interpret_pred histogram.
# Configs use adam (weight_decay=0): with adamw, torch skips params whose
# .grad is None (the never-touched text tower in the shared CLIP), while
# optax would still weight-decay their zero-grad leaves — adam keeps the
# two optimizer semantics identical for unused parameters.

def _erfam_ref_kwargs(log_path: str, method: str):
    kw = _ref_kwargs(log_path)
    # temp_batchsize drives only FT's iteration count
    # (online_iter * temp_batchsize * world_size, finetuning.py:25) and
    # ER's unread memory-sampler length; 1 keeps one train call per
    # online_iter on both sides
    kw.update(method=method, opt_name="adam", temp_batchsize=1)
    if method == "rm":
        # a LIVE memory: class-balanced random replacement per stream
        # sample + 4 post-task memory epochs (warm LR 0.1·lr -> lr ->
        # cosine-warm-restart points); temp_batchsize=2 makes rm's
        # iteration count (online_iter * temp_batchsize, online_step():47)
        # exercise the multi-iteration path
        kw.update(memory_size=RM_MEMORY, temp_batchsize=2,
                  memory_epoch=4)
    return kw


RM_MEMORY = 32     # rm parity memory size (2 full batches per epoch pass)
RM_SLOT_SEED = 777  # shared eviction-draw generator seed (both sides)


def _patch_reference_rm(tr):
    """In-harness patches for the reference RM's shipped defects (each
    per evident intent, same discipline as the other configs):

    1. utils/memory.py Memory.add_new_class is ``pass`` — cls_list /
       cls_count never grow and replace_data crashes on the empty tensor
       (the same defect family that blocks CLIB whole-run). The intended
       growth is spelled out in its own commented lines (memory.py:25-27);
       restore exactly that. (Restored after the run.)
    2. memory_batchsize stays 0 (the SHIPPED value, _trainer.py:147 — the
       replay provider is never read), but online_step still constructs
       DataLoader(batch_size=0) which raises; clamp the module's
       DataLoader to batch_size>=1 (never iterated at 0).
    3. update_memory (rainbow_memory.py:96-108) is re-bound with identical
       math except (a) ``.squeeze()`` -> ``.reshape(-1)`` — squeeze
       produces a 0-d cand_idx when the heaviest class holds exactly one
       slot and ``len()``/indexing crash — and (b) the global-RNG
       ``torch.randint`` draws from a dedicated seeded generator so the
       jax side can stream-match the eviction draws exactly (same
       determinization class as the moe gate-noise patch).
    """
    import copy as _copy
    import torch
    import torch.utils.data as tud
    import methods.rainbow_memory as ref_rm_mod
    import utils.memory as ref_mem_mod

    real_loader = tud.DataLoader

    def clamped_loader(*a, **k):
        k["num_workers"] = 0
        if "batch_size" in k:
            k["batch_size"] = max(1, k["batch_size"])
        return real_loader(*a, **k)

    ref_rm_mod.DataLoader = clamped_loader

    def fixed_add_new_class(self, cls_list):
        # memory.py:25-27 (the commented-out intent)
        self.cls_list = torch.tensor(cls_list)
        self.cls_count = torch.cat([
            self.cls_count,
            torch.zeros(len(self.cls_list) - len(self.cls_count))])
        self.cls_train_cnt = torch.cat([
            self.cls_train_cnt,
            torch.zeros(len(self.cls_list) - len(self.cls_train_cnt))])

    tr._orig_mem_anc = ref_mem_mod.Memory.add_new_class
    ref_mem_mod.Memory.add_new_class = fixed_add_new_class

    g = torch.Generator().manual_seed(RM_SLOT_SEED)

    def det_update_memory(index, label):
        # rainbow_memory.py:96-108 verbatim math (see docstring for the
        # two patches)
        for x, y in zip(index, label):
            if len(tr.memory) >= tr.memory_size:
                label_frequency = _copy.deepcopy(tr.memory.cls_count)
                label_frequency[tr.exposed_classes.index(y.item())] += 1
                cls_to_replace = torch.argmax(label_frequency)
                cand_idx = (tr.memory.labels ==
                            tr.memory.cls_list[cls_to_replace]
                            ).nonzero().reshape(-1)
                idx_to_replace = cand_idx[torch.randint(
                    0, len(cand_idx), (1,), generator=g)]
                tr.memory.replace_data([x, y], int(idx_to_replace))
            else:
                tr.memory.replace_data([x, y])

    tr.update_memory = det_update_memory

    _orig_omt = tr.online_memory_train

    def omt_with_dataset(*a, **k):
        # shipped defect: loss_update_dataset is created in
        # RM.setup_distributed_dataset (rainbow_memory.py:34-38), a hook
        # _trainer NEVER calls -> AttributeError at the first task end.
        # The intent is the raw train set under bare ToTensor — exactly
        # what _trainer.setup_dataset:196-199 already built as
        # train_dataset (transform=transforms.ToTensor()).
        if not hasattr(tr, "loss_update_dataset"):
            tr.loss_update_dataset = tr.train_dataset
        return _orig_omt(*a, **k)

    tr.online_memory_train = omt_with_dataset


def _run_reference_erfam(ref_env, method: str):
    import torch
    import methods.er_baseline as ref_er_mod
    _patch_memory_loader_workers(ref_er_mod)
    cls = {"er": ref_env.er_trainer_cls,
           "Finetuning": ref_env.ft_trainer_cls,
           "lwf": ref_env.lwf_trainer_cls,
           "ewc++": ref_env.ewcpp_trainer_cls,
           "rm": ref_env.rm_trainer_cls}[method]
    if method == "rm":
        import methods.rainbow_memory as ref_rm_mod
        _patch_memory_loader_workers(ref_rm_mod)
    tr = cls(**_erfam_ref_kwargs(str(ref_env.tmp / f"erfam_{method}"),
                                 method))
    if method == "rm":
        _patch_reference_rm(tr)
    else:
        tr.memory_batchsize = 1  # defect #4 (ER's per-step DataLoader)
    tr.world_size = 1
    # shipped defect: self.mask is read (er_baseline.py:138/145/166) and
    # updated (lwf.py:69) but never CREATED for this family; initialize
    # the -inf exposure mask exactly as the runnable families do, and for
    # er/Finetuning (whose add_new_class has no mask update) apply the
    # lwf.py:69 exposure zeroing after each add_new_class
    tr.mask = torch.zeros(N_CLASSES) - torch.inf
    if method != "lwf":
        _orig_anc = tr.add_new_class

        def _anc_with_mask(class_name):
            _orig_anc(class_name)
            tr.mask[:len(tr.exposed_classes)] = 0.0

        tr.add_new_class = _anc_with_mask
    _orig_eval = tr.online_evaluate
    tr.online_evaluate = lambda loader, *a, **k: _orig_eval(loader)

    def fixed_interpret(y, pred):
        cnt = torch.zeros(tr.n_classes)
        correct = torch.zeros(tr.n_classes)
        for c in y.unique():
            m = y == c
            cnt[c] = m.sum()
            correct[c] = (pred[m] == c).sum()
        return cnt, correct

    tr._interpret_pred = fixed_interpret
    losses = []
    orig_step = tr.online_step

    def record_step(images, labels, idx):
        loss, acc = orig_step(images, labels, idx)
        losses.append(float(loss))
        return loss, acc

    tr.online_step = record_step
    try:
        # harness-side warning scope: the REFERENCE's save_result takes
        # np.mean over its periodic-eval list (_trainer.py:368) which is
        # EMPTY at this harness's eval_period (beyond the stream), and
        # over acc_diff when no class repeats — numpy's "Mean of empty
        # slice" RuntimeWarnings are the reference's own artifact math,
        # not a defect under test (our save_result guards these)
        import warnings
        with warnings.catch_warnings():
            warnings.filterwarnings(
                "ignore", "Mean of empty slice", RuntimeWarning)
            warnings.filterwarnings(
                "ignore", "invalid value encountered", RuntimeWarning)
            tr.run()
    finally:
        if method == "rm":   # un-leak the Memory class patch
            import utils.memory as ref_mem_mod
            ref_mem_mod.Memory.add_new_class = tr._orig_mem_anc
    acc = np.load(os.path.join(tr.log_dir, f"seed_{SEED}.npy"))
    return np.asarray(acc, np.float64), np.asarray(losses)


def _run_ours_erfam(ref_env, monkeypatch, tmp_path, method: str):
    import torch
    import jax.numpy as jnp
    from lifelong_clip_tpu.config import TrainConfig, PEFTConfig, \
        StreamConfig
    import lifelong_clip_tpu.methods.er_baseline as ours_er_mod
    import lifelong_clip_tpu.methods.ewcpp as ours_ewc_mod
    import lifelong_clip_tpu.methods.lwf as ours_lwf_mod
    from lifelong_clip_tpu.methods.engine import TrainState
    from lifelong_clip_tpu.models.convert import load_clip_params
    from lifelong_clip_tpu.ops import preprocess as prep

    ref_m = ref_env.build_ref_head_model(
        train_backbone=(method in ("Finetuning", "ewc++")))
    ckpt = tmp_path / f"tiny_head_{method}.pt"
    torch.save(ref_m.backbone.state_dict(), str(ckpt))
    head_w = jnp.asarray(ref_m.head.weight.detach().numpy().T)
    head_b = jnp.asarray(ref_m.head.bias.detach().numpy())

    monkeypatch.setattr(ours_er_mod, "build_clip",
                        lambda *a, **k: load_clip_params(str(ckpt)))
    monkeypatch.setattr(prep, "make_train_pipeline", _det_pipeline)

    class _EWCppFT(ours_ewc_mod.EWCpp):
        # reference ewc++ here runs over the train_backbone head model so
        # its fisher/penalty set (everything but the head) is non-empty
        train_backbone = True

    import lifelong_clip_tpu.methods.rainbow_memory as ours_rm_mod
    base_cls = {"er": ours_er_mod.ER, "Finetuning": ours_er_mod.FT,
                "lwf": ours_lwf_mod.LwF, "ewc++": _EWCppFT,
                "rm": ours_rm_mod.RM}[method]
    accs, losses = [], []

    class ParityER(base_cls):
        def setup_model(self):
            super().setup_model()
            tr_tree = dict(self.state.trainable)
            tr_tree["head"] = {"w": head_w, "b": head_b}
            self.state = TrainState.create(trainable=tr_tree,
                                           frozen=self.state.frozen,
                                           tx=self.tx, rng=self.state.rng)

        def online_step(self, images, labels, indices):
            # raw tail batches; the reference's replay provider is dead
            # (memory_batchsize=0, _trainer.py:147) so the train batch is
            # the stream batch for every config here — rm still WRITES
            # memory (consumed by the post-task memory epochs)
            cfg = self.cfg
            batch = {"images": jnp.asarray(images),
                     "labels": jnp.asarray(self.vocab.remap(labels),
                                           jnp.int32),
                     "tokens": self._dummy_tokens,
                     "mask": jnp.asarray(self.vocab.logit_mask())}
            stats = {}
            iters = self._iters_per_batch() if method == "rm" \
                else max(int(cfg.online_iter), 1)
            tot = 0.0
            for _ in range(iters):
                if method == "ewc++":
                    self.state, self.ewc_state, stats = self._ewc_step(
                        self.state, batch, self.ewc_state)
                elif method == "lwf" and self._old_trainable is not None:
                    self.state, stats = self._kd_step(
                        self.state, batch, self._old_trainable)
                else:
                    self.state, stats = self._train_step(self.state, batch)
                tot += float(stats["loss"])
            if method == "lwf":
                self._old_trainable = self.state.trainable
            if method == "rm":
                # production class-balanced replacement, stream-matched
                # to the reference via the shared eviction generator
                for i, lab in zip(indices,
                                  np.asarray(labels)[:len(indices)]):
                    self.memory.balanced_random_update(
                        int(i), int(lab), class_order=self.vocab.exposed)
            # the reference online_step reports the mean over iterations
            losses.append(tot / iters)
            return stats

        def online_after_task(self, task_id):
            super().online_after_task(task_id)
            correct, total = self.evaluate()
            accs.append(correct.sum() / max(total.sum(), 1))

    rm_kw = dict(memory_size=RM_MEMORY, temp_batchsize=2,
                 memory_epoch=4) if method == "rm" \
        else dict(memory_size=0, temp_batchsize=0)
    cfg = TrainConfig(
        method=method if method == "rm" else "er",
        dataset="synthetic-20", model_name="ViT-B/16",
        pretrained_path=str(ckpt), batchsize=BATCH, test_batchsize=32,
        online_iter=1, lr=LR, opt_name="adam",
        sched_name="const", eval_period=100000,
        visible_classes="batch", peft=PEFTConfig(method="none"),
        stream=StreamConfig(n_tasks=N_TASKS, n=50, m=10, rnd_NM=False,
                            seed=SEED),
        transforms=(), use_bf16=False, log_path=str(tmp_path), seed=SEED,
        **rm_kw)

    tr = ParityER(cfg, train_dataset=ref_env.ds_train,
                  test_dataset=ref_env.ds_test)
    if method == "rm":
        tr.memory._torch_gen = torch.Generator().manual_seed(RM_SLOT_SEED)
    tr.run()
    return np.asarray(accs, np.float64), np.asarray(losses)


def _assert_erfam_match(ref, ours):
    ref_acc, ref_losses = ref
    our_acc, our_losses = ours
    assert len(ref_losses) == len(our_losses), \
        "step counts differ: stream/batching diverged"
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(our_losses[:10], ref_losses[:10], rtol=2e-2,
                               atol=2e-2)
    assert abs(our_losses.mean() - ref_losses.mean()) < 0.05, \
        (our_losses.mean(), ref_losses.mean())
    assert ref_acc.shape == our_acc.shape == (N_TASKS,)
    np.testing.assert_allclose(our_acc, ref_acc, atol=0.02)


def test_er_whole_run_trajectories_match(ref_env, monkeypatch, tmp_path):
    _assert_erfam_match(_run_reference_erfam(ref_env, "er"),
                        _run_ours_erfam(ref_env, monkeypatch, tmp_path,
                                        "er"))


def test_ft_whole_run_trajectories_match(ref_env, monkeypatch, tmp_path):
    """Pins base_grads=True full-tower training against torch autograd
    over the same weights."""
    _assert_erfam_match(_run_reference_erfam(ref_env, "Finetuning"),
                        _run_ours_erfam(ref_env, monkeypatch, tmp_path,
                                        "Finetuning"))


def test_lwf_whole_run_trajectories_match(ref_env, monkeypatch, tmp_path):
    """Pins the KD composition: no KD before the first snapshot, raw-logit
    full-width T=2 distillation, kd_hp=0.2, once-per-step snapshot."""
    _assert_erfam_match(_run_reference_erfam(ref_env, "lwf"),
                        _run_ours_erfam(ref_env, monkeypatch, tmp_path,
                                        "lwf"))


def test_ewcpp_whole_run_trajectories_match(ref_env, monkeypatch,
                                            tmp_path):
    """Pins the EWC++ composition over a TRAINED backbone: double update
    per step with torch's accumulated second gradient (g1+g2, zero_grad
    runs once per step), fisher EMA + path-integral score over everything
    but the head (named_parameters()[:-2]), task-end importance snapshot,
    and the quadratic penalty live from task 2 on."""
    _assert_erfam_match(_run_reference_erfam(ref_env, "ewc++"),
                        _run_ours_erfam(ref_env, monkeypatch, tmp_path,
                                        "ewc++"))


def test_rm_whole_run_trajectories_match(ref_env, monkeypatch, tmp_path):
    """Pins Rainbow Memory's LIVE composition (its MC uncertainty pass is
    dead code in the reference): online_iter*temp_batchsize iterations
    per stream batch, class-balanced random replacement per stream sample
    (increment-then-argmax in exposure order, eviction draws
    stream-matched through a shared generator), and 4 post-task memory
    epochs walking memory in slot order under the warm LR schedule
    (0.1·lr, lr, then cosine-warm-restart points)."""
    _assert_erfam_match(_run_reference_erfam(ref_env, "rm"),
                        _run_ours_erfam(ref_env, monkeypatch, tmp_path,
                                        "rm"))
