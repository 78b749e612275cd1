"""Dormant real-data quality runs (VERDICT r3 missing #1 / r4 item #6).

This environment is zero-egress: no real CIFAR-100/ImageNet-R files and no
pretrained CLIP weights exist on disk, so these tests skip by default. On
a machine where BOTH appear, they run the reference's HEADLINE config
(``/root/reference/scripts/lora_clip.sh:29-45`` and the sibling
adapter_clip/maple/mvp_clip scripts, which share its knobs: ViT-B/16,
5 tasks, N=50 M=10 rnd_NM, bs=64, lr 5e-4 adamw, online_iter 3, mem 0,
eval_period 1000) end to end for FOUR method families x both datasets and
gate A_auc, with zero code changes:

  * **zero-shot floor**: every trained run must beat the frozen
    continual-clip zero-shot A_auc on the same stream — training adds
    value at scale, the cheapest real-weights teeth;
  * **recorded expectation ±0.5 pts**: the reference repo publishes NO
    numbers (SURVEY §6, ``BASELINE.json "published": {}``), so the first
    real-data run PINS the measured A_auc into
    ``tests/quality_expectations.json`` (committed thereafter); later
    runs must stay within ±0.5 accuracy points of the pinned value —
    the BASELINE.json quality target.

Enable with: dataset files under ``$LLC_DATA_DIR`` (default ``./data``;
CIFAR-100 = ``cifar-100-python/``, ImageNet-R = ``imagenet-r/``) plus a
checkpoint at ``$LLC_CLIP_CKPT`` or ``~/.cache/clip/ViT-B-16.pt``.
"""

import json
import os

import pytest

DATA_DIR = os.environ.get("LLC_DATA_DIR", "./data")
EXPECT_PATH = os.path.join(os.path.dirname(__file__),
                           "quality_expectations.json")

_CKPT_SEARCH = [
    os.environ.get("LLC_CLIP_CKPT", ""),
    os.path.expanduser("~/.cache/clip/ViT-B-16.pt"),
    os.path.join(DATA_DIR, "ViT-B-16.pt"),
]
CKPT = next((p for p in _CKPT_SEARCH if p and os.path.isfile(p)), None)

_DATASETS = {
    "cifar100": os.path.join(DATA_DIR, "cifar-100-python"),
    "imagenet-r": os.path.join(DATA_DIR, "imagenet-r"),
}
_AVAILABLE = [k for k, p in _DATASETS.items() if os.path.isdir(p)]

# one per trained family with a reference headline script:
# scripts/{lora_clip,adapter_clip,maple,mvp_clip}.sh share the core knobs
_METHODS = ["lora-clip", "adapter-clip", "maple", "mvp-clip"]

dormant = pytest.mark.skipif(
    CKPT is None or not _AVAILABLE,
    reason="dormant quality run: needs real dataset files under "
           f"{DATA_DIR!r} AND a pretrained checkpoint (LLC_CLIP_CKPT)")


def _headline_cfg(dataset, method, seed=1):
    """The reference headline knobs (scripts/lora_clip.sh:29-45; the
    adapter_clip/maple/mvp_clip scripts differ only in method flags)."""
    from lifelong_clip_tpu.config import (PEFTConfig, StreamConfig,
                                          TrainConfig)
    peft = {"lora-clip": PEFTConfig(method="lora", encoder="image",
                                    lora_r=4, lora_alpha=16),
            "adapter-clip": PEFTConfig(method="adapter", encoder="image"),
            }.get(method, PEFTConfig(method="none"))
    return TrainConfig(
        method=method, dataset=dataset, model_name="ViT-B/16",
        pretrained_path=CKPT, data_dir=DATA_DIR,
        batchsize=64, test_batchsize=128, online_iter=3, lr=5e-4,
        opt_name="adamw", eval_period=1000, memory_size=0,
        temp_batchsize=0, peft=peft,
        stream=StreamConfig(n_tasks=5, n=50, m=10, seed=seed,
                            rnd_NM=True),
        transforms=("autoaug",), use_bf16=True,
        log_path="/tmp/llc_quality_runs", seed=seed)


def _trainer_cls(method):
    """Method class with its script's behavior flags (mvp_clip.sh passes
    --use_mask --use_contrastiv; main.py maps those onto class attrs)."""
    from lifelong_clip_tpu.methods import get_method
    cls = get_method(method)
    if method == "mvp-clip":
        cls = type(cls.__name__, (cls,),
                   {"use_mask": True, "use_contrastiv": True})
    return cls


_RUN_CACHE = {}


def _run(dataset, method):
    key = (dataset, method)
    if key not in _RUN_CACHE:
        cfg = _headline_cfg(dataset, method)
        _RUN_CACHE[key] = _trainer_cls(method)(cfg).run()
    return _RUN_CACHE[key]


def test_headline_cfg_constructs():
    """Always-on bit-rot guard: the dormant harness's configs must keep
    constructing against the live TrainConfig schema for every method and
    the method classes must keep resolving (incl. the mvp flag subclass)."""
    for method in _METHODS + ["continual-clip"]:
        cfg = _headline_cfg("cifar100", method)
        assert (cfg.stream.n_tasks, cfg.stream.n, cfg.stream.m,
                cfg.stream.rnd_NM) == (5, 50, 10, True)
        assert cfg.batchsize == 64 and cfg.online_iter == 3
        assert cfg.memory_size == 0
        assert _trainer_cls(method) is not None
    assert _headline_cfg("cifar100", "lora-clip").peft.method == "lora"
    assert _headline_cfg("cifar100", "adapter-clip").peft.method == \
        "adapter"
    assert _headline_cfg("cifar100", "maple").peft.method == "none"
    cls = _trainer_cls("mvp-clip")
    assert cls.use_mask and cls.use_contrastiv


@dormant
@pytest.mark.parametrize("dataset", _AVAILABLE or ["none"])
@pytest.mark.parametrize("method", _METHODS)
def test_training_beats_zero_shot(dataset, method):
    zs = _run(dataset, "continual-clip")
    out = _run(dataset, method)
    assert out["A_auc"] > zs["A_auc"], (
        f"{method}/{dataset}: trained A_auc {out['A_auc']:.4f} does not "
        f"beat the zero-shot floor {zs['A_auc']:.4f} — online training "
        "adds no value at scale")


@dormant
@pytest.mark.parametrize("dataset", _AVAILABLE or ["none"])
@pytest.mark.parametrize("method", _METHODS)
def test_a_auc_matches_recorded_expectation(dataset, method):
    """±0.5 accuracy points vs the pinned expectation; the first run on a
    real-data machine pins it (and prints the JSON to commit)."""
    zs = _run(dataset, "continual-clip")
    out = _run(dataset, method)
    expectations = {}
    if os.path.exists(EXPECT_PATH):
        expectations = json.load(open(EXPECT_PATH))
    key = f"{method}/{dataset}/TASK5N50M10rnd/seed1"
    measured = {"A_auc": round(out["A_auc"], 5),
                "A_last": round(out["A_last"], 5),
                "zero_shot_A_auc": round(zs["A_auc"], 5)}
    if key not in expectations:
        expectations[key] = measured
        with open(EXPECT_PATH, "w") as f:
            json.dump(expectations, f, indent=1, sort_keys=True)
        pytest.skip(
            f"first real-data run pinned expectation {measured} into "
            f"{EXPECT_PATH} — commit it; subsequent runs gate at ±0.5 pts")
    want = expectations[key]["A_auc"]
    assert abs(out["A_auc"] - want) <= 0.005, (
        f"{method}/{dataset}: A_auc {out['A_auc']:.5f} off the recorded "
        f"expectation {want:.5f} by more than 0.5 accuracy points")
