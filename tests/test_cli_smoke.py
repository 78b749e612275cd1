"""CLI end-to-end smoke: every registered method through the real ``main()``.

The reference's only integration check is running its launch scripts by
hand (SURVEY §4 — no tests exist); prior rounds here drove the CLI
manually and that's what caught the eval tail-batch under-padding bug
(PARITY.md r3 notes). This automates it: each method name registered in
``methods/__init__.py`` runs through the actual CLI entry
(``lifelong_clip_tpu.main:main``) at the ``debug-tiny`` preset on a tiny
synthetic stream — argument parsing, config mapping, trainer
construction, the full task loop, periodic + after-task eval, and the
reference-format artifacts all execute for real.

Kept tiny on purpose: 10 classes x 8 samples, bs=8, 2 tasks. The
``lora-clip`` and ``er`` rows keep the default transforms (cutmix +
autoaug) so the fused augmentation path runs inside a CLI-built step; the
rest pass an empty transform list to keep CPU compile time down.
"""

import glob
import os

import pytest

from lifelong_clip_tpu.main import main
from lifelong_clip_tpu.methods import get_method

# every name the registry accepts (reference main.py:25-40); "template"
# is an alias of the proto trainer — checked as such below, not re-run
METHODS = [
    "continual-clip", "lora-clip", "adapter-clip", "moe-clip",
    "er", "Finetuning", "lwf", "ewc++", "clib", "rm",
    "maple", "mvp-clip", "adapter-clip-proto_prompt",
    "l2p", "dualprompt", "mvp",
]

# methods that keep the default (cutmix+autoaug) transform list
_WITH_AUG = {"lora-clip", "er"}


def _argv(method, log_path):
    argv = [
        "--method", method, "--dataset", "synthetic-10x8",
        "--model_name", "debug-tiny", "--n_tasks", "2",
        "--batchsize", "8", "--test_batchsize", "8",
        "--memory_size", "16", "--eval_period", "40",
        "--log_path", log_path, "--note", f"smoke_{method}",
        "--rnd_seed", "1", "--seed", "1", "--no_bf16",
    ]
    if method not in _WITH_AUG:
        argv.append("--transforms")  # nargs="*" -> empty list
    if method == "rm":
        # exercise both the live memory-epoch path and the opt-in MC
        # uncertainty rebuild (r4 flag)
        argv += ["--memory_epoch", "1", "--rm_uncertainty"]
    return argv


@pytest.mark.parametrize("method", METHODS)
def test_cli_method_smoke(method, tmp_path):
    out = main(_argv(method, str(tmp_path)))
    assert set(out) >= {"A_auc", "A_avg", "A_last", "F_last"}, out
    for v in out.values():
        assert v == v, f"NaN metric in {method}: {out}"

    # reference-format artifacts land under log_path (_trainer.py:359-401)
    found = glob.glob(os.path.join(str(tmp_path), "**", "result.txt"),
                      recursive=True)
    assert found, "result.txt artifact missing"
    npys = glob.glob(os.path.join(str(tmp_path), "**", "*.npy"),
                     recursive=True)
    assert npys, "npy artifacts missing"


def test_template_is_proto_alias():
    assert get_method("template") is get_method("adapter-clip-proto_prompt")
