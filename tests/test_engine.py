"""End-to-end engine tests on a tiny CLIP + synthetic stream.

These are the TPU-framework analogue of the reference's --debug smoke runs
(methods/_trainer.py:343-344): a full online CL run — stream, exposure,
jitted train step, replay memory, periodic eval, metric artifacts — at toy
scale, plus a check that training actually reduces loss.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelong_clip_tpu.config import (CLIPConfig, PEFTConfig, StreamConfig,
                                      TrainConfig)
from lifelong_clip_tpu.data.registry import make_synthetic
from lifelong_clip_tpu.methods.adapter_clip import AdapterCLIP
from lifelong_clip_tpu.methods.continual_clip import ContinualCLIP

TINY = CLIPConfig(embed_dim=64, image_size=32, patch_size=8,
                  vision_width=64, vision_layers=2, vision_heads=4,
                  context_length=77, vocab_size=49408, text_width=64,
                  text_heads=4, text_layers=2)


def tiny_cfg(**kw):
    base = dict(
        method="lora-clip", dataset="synthetic-8", model_name="ViT-B/16",
        batchsize=8, test_batchsize=8, online_iter=1, lr=1e-3,
        eval_period=64, memory_size=16, temp_batchsize=0,
        stream=StreamConfig(n_tasks=2, n=50, m=10, seed=1),
        transforms=(), use_bf16=False, log_path="/tmp/llc_results",
        debug=True, seed=1)
    base.update(kw)
    return TrainConfig(**base)


class _TinyMixin:
    """Swap the ViT-B/16 preset for the tiny tower in tests."""

    def setup_model(self):
        self._preset_override()
        super().setup_model()

    def _preset_override(self):
        import lifelong_clip_tpu.models as M
        orig = M.build_clip

        def tiny_build(model_name, pretrained_path=None, rng=None):
            from lifelong_clip_tpu.models.init import init_clip_params
            return init_clip_params(rng if rng is not None else
                                    jax.random.PRNGKey(0), TINY), TINY

        self._orig_build = orig
        # patch the symbol in every loaded method module (each imports
        # build_clip by name); missing one silently runs the full-size
        # ViT-B/16 on CPU and takes minutes
        import sys
        M.build_clip = tiny_build
        for name, mod in list(sys.modules.items()):
            if (name.startswith("lifelong_clip_tpu.methods.")
                    and hasattr(mod, "build_clip")):
                mod.build_clip = tiny_build


class TinyAdapterCLIP(_TinyMixin, AdapterCLIP):
    pass


class TinyContinualCLIP(_TinyMixin, ContinualCLIP):
    pass


@pytest.fixture(scope="module")
def synth():
    train = make_synthetic(n_classes=8, per_class=24, image_size=32, seed=0)
    test = make_synthetic(n_classes=8, per_class=6, image_size=32, seed=0,
                          train=False)
    return train, test


def test_zero_shot_run(synth):
    train, test = synth
    cfg = tiny_cfg(method="continual-clip")
    tr = TinyContinualCLIP(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert set(out) == {"A_auc", "A_avg", "A_last", "F_last"}
    assert len(tr.metrics.task_acc) == 2
    assert len(tr.vocab) == 8  # all classes exposed after the stream

    # artifact parity: a parser written against the REFERENCE's result.txt
    # format (_trainer.py:386-389) must read this run's file
    import ast
    import os
    import re
    d = tr.result_dir()
    lines = open(os.path.join(d, "result.txt")).read().splitlines()
    m = re.fullmatch(
        r"Dataset:(\S+) \| A_auc ([\d.]+) \| A_avg ([\d.]+) "
        r"\| A_last ([\d.]+) \| F_last (-?[\d.eE+-]+)", lines[0])
    assert m, lines[0]
    assert float(m.group(2)) == round(out["A_auc"], 5)
    task_acc = ast.literal_eval(lines[1].split("task_acc:", 1)[1])
    per_task = ast.literal_eval(lines[2].split("per_task_acc:", 1)[1])
    assert len(task_acc) == cfg.stream.n_tasks
    assert len(per_task) == cfg.stream.n_tasks

    # confusion-matrix artifact (reference _trainer.py:363-365)
    cm = np.load(os.path.join(d, f"seed_{cfg.seed}_confusion_matrix.npy"))
    assert cm.ndim == 2 and cm.shape[0] == cm.shape[1]
    # the final eval sweeps every test sample of an exposed class
    from lifelong_clip_tpu.utils.stream import exposed_test_indices
    n_eval = len(exposed_test_indices(test.targets, tr.vocab.exposed))
    assert int(cm.sum()) == n_eval
    # per-run log.txt file handler (reference _trainer.py:486-503)
    log_txt = open(os.path.join(d, "log.txt")).read()
    assert "task 1" in log_txt and "result:" in log_txt


def test_lora_online_run_loss_decreases(synth):
    train, test = synth
    # lr compensates the damped gradients of the reference's CE-on-probs
    # training math (the adapter-clip family default, engine.ce_on_probs_loss)
    cfg = tiny_cfg(method="lora-clip", online_iter=2, lr=1e-2,
                   peft=PEFTConfig(method="lora", encoder="image",
                                   lora_r=4))
    tr = TinyAdapterCLIP(cfg, train_dataset=train, test_dataset=test)

    losses = []
    orig_step = tr.online_step

    def spy(images, labels, indices):
        stats = orig_step(images, labels, indices)
        losses.append(float(stats["loss"]))
        return stats

    tr.online_step = spy
    out = tr.run()
    assert np.isfinite(losses).all()
    # training signal: later losses lower than the first on average
    assert np.mean(losses[-5:]) < losses[0] + 1e-3
    assert out["A_last"] >= 0.0
    assert len(tr.memory) > 0  # reservoir filled


def test_adapter_run_and_state_step_count(synth):
    train, test = synth
    cfg = tiny_cfg(method="adapter-clip", online_iter=1,
                   peft=PEFTConfig(method="adapter", encoder="image"))
    tr = TinyAdapterCLIP(cfg, train_dataset=train, test_dataset=test)
    tr.run()
    n_batches = sum(-(-len(t) // cfg.batchsize) if False else
                    (len(t) + cfg.batchsize - 1) // cfg.batchsize
                    for t in tr.stream.task_indices)
    assert int(tr.state.step) == n_batches  # one jitted step per batch


def test_epoch_num_multiplies_passes(synth):
    """--epochNum runs that many passes per task (reference
    _trainer.py:336)."""
    train, test = synth
    cfg = tiny_cfg(method="adapter-clip", online_iter=1, epoch_num=2,
                   peft=PEFTConfig(method="adapter", encoder="image"))
    tr = TinyAdapterCLIP(cfg, train_dataset=train, test_dataset=test)
    tr.run()
    n_batches = sum((len(t) + cfg.batchsize - 1) // cfg.batchsize
                    for t in tr.stream.task_indices)
    assert int(tr.state.step) == 2 * n_batches


def test_mesh_flag_validation():
    """--mesh rejects malformed specs with a friendly message (was a raw
    ValueError traceback — verify-skill known rough edge)."""
    import pytest as _pytest
    from lifelong_clip_tpu.main import args_to_config, base_parser
    for bad in ("bogus", "0x2", "2x2x2"):
        with _pytest.raises(SystemExit, match="DATAxMODEL"):
            args_to_config(base_parser().parse_args(["--mesh", bad]))
    ok = args_to_config(base_parser().parse_args(["--mesh", "4x2"]))
    assert ok.mesh_shape == (4, 2)


def test_attr_flag_overrides():
    """CLI flags like --topK map onto trainer class attributes only when
    they differ from the parser default."""
    from lifelong_clip_tpu.main import _ATTR_FLAGS, base_parser
    from lifelong_clip_tpu.methods import get_method
    parser = base_parser()
    args = parser.parse_args(["--topK", "3", "--ssca", ""])
    cls = get_method("adapter-clip-proto_prompt")
    overrides = {attr: getattr(args, flag)
                 for flag, attr in _ATTR_FLAGS.items()
                 if hasattr(cls, attr)
                 and getattr(args, flag) != parser.get_default(flag)}
    assert overrides["top_k"] == 3
    assert overrides["ssca"] is False   # --ssca "" -> falsy (type=bool)
    assert "n_ctx" not in overrides     # default untouched


def test_visible_all_mode(synth):
    train, test = synth
    cfg = tiny_cfg(method="lora-clip", visible_classes="all",
                   peft=PEFTConfig(method="lora", encoder="image"))
    tr = TinyAdapterCLIP(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])


def test_er_and_ft_run(synth):
    from lifelong_clip_tpu.methods.er_baseline import ER, FT

    class TinyER(_TinyMixin, ER):
        pass

    class TinyFT(_TinyMixin, FT):
        pass

    train, test = synth
    cfg = tiny_cfg(method="er", memory_size=32, online_iter=1,
                   transforms=("cutmix",))
    tr = TinyER(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    assert len(tr.memory) > 0

    cfg = tiny_cfg(method="Finetuning", memory_size=0)
    tr = TinyFT(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    assert len(tr.memory) == 0


def test_remat_step_matches_plain(synth):
    """remat=True (large-batch HBM-spill fix) is a pure scheduling change:
    loss and updated params match the plain step bit-for-bit on CPU."""
    from lifelong_clip_tpu.methods.engine import TrainState, make_train_step
    from lifelong_clip_tpu.models import build_peft
    from lifelong_clip_tpu.models.init import init_clip_params
    from lifelong_clip_tpu.utils.train_utils import make_optimizer

    peft_cfg = PEFTConfig(method="lora", encoder="image", lora_r=4)
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    peft = build_peft(jax.random.PRNGKey(1), TINY, peft_cfg)
    tx = make_optimizer("adamw", 1e-3)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.integers(0, 255, (8, 32, 32, 3),
                                           np.uint8)),
        "labels": jnp.asarray(rng.integers(0, 4, (8,)), jnp.int32),
        "tokens": jnp.asarray(rng.normal(size=(4, 64)), jnp.float32),
        "mask": jnp.zeros((4,), jnp.float32),
    }
    outs = {}
    # "mlp" = the selective save-all-but-MLP-hidden policy (the bs>=128
    # HBM-spill fix) — like full remat it must be a pure scheduling change
    for remat in (False, True, "mlp"):
        state = TrainState.create(trainable=jax.tree.map(jnp.copy, peft),
                                  frozen=params, tx=tx,
                                  rng=jax.random.PRNGKey(2))
        step = make_train_step(TINY, peft_cfg, tx,
                               image_size=TINY.image_size,
                               mean=(0.5,) * 3, std=(0.5,) * 3,
                               augment=False, cached_text=True,
                               compute_dtype=jnp.float32, donate=False,
                               remat=remat)
        new_state, m = step(state, batch)
        outs[remat] = (float(m["loss"]),
                       np.asarray(jax.tree.leaves(
                           new_state.trainable)[0]))
    assert outs[False][0] == outs[True][0]
    np.testing.assert_array_equal(outs[False][1], outs[True][1])
    assert outs[False][0] == outs["mlp"][0]
    np.testing.assert_array_equal(outs[False][1], outs["mlp"][1])


def test_remat_custom_forward_matches_plain(synth):
    """With a caller-supplied forward_fn the fine-grained depth-scan remat
    can't thread through — make_train_step wraps the whole forward in
    jax.checkpoint instead (the maple/ER large-batch path). Same
    pure-scheduling guarantee: identical loss and updates."""
    import functools
    from lifelong_clip_tpu.methods.engine import (TrainState,
                                                  make_train_step,
                                                  peft_forward_cached_text)
    from lifelong_clip_tpu.models import build_peft
    from lifelong_clip_tpu.models.init import init_clip_params
    from lifelong_clip_tpu.utils.train_utils import make_optimizer

    peft_cfg = PEFTConfig(method="lora", encoder="image", lora_r=4)
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    peft = build_peft(jax.random.PRNGKey(1), TINY, peft_cfg)
    tx = make_optimizer("adamw", 1e-3)
    fwd = functools.partial(peft_forward_cached_text, clip_cfg=TINY,
                            peft_cfg=peft_cfg,
                            compute_dtype=jnp.float32, attn_impl=None)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.integers(0, 255, (8, 32, 32, 3),
                                           np.uint8)),
        "labels": jnp.asarray(rng.integers(0, 4, (8,)), jnp.int32),
        "tokens": jnp.asarray(rng.normal(size=(4, 64)), jnp.float32),
        "mask": jnp.zeros((4,), jnp.float32),
    }
    outs = {}
    for remat in (False, True):
        state = TrainState.create(trainable=jax.tree.map(jnp.copy, peft),
                                  frozen=params, tx=tx,
                                  rng=jax.random.PRNGKey(2))
        step = make_train_step(TINY, peft_cfg, tx,
                               image_size=TINY.image_size,
                               mean=(0.5,) * 3, std=(0.5,) * 3,
                               augment=False, forward_fn=fwd,
                               compute_dtype=jnp.float32, donate=False,
                               remat=remat)
        new_state, m = step(state, batch)
        outs[remat] = (float(m["loss"]),
                       np.asarray(jax.tree.leaves(
                           new_state.trainable)[0]))
    assert outs[False][0] == outs[True][0]
    np.testing.assert_array_equal(outs[False][1], outs[True][1])


def test_evaluate_short_tail_batch_inside_full_group(synth):
    """Regression: evaluate()'s grouped prediction fetch stacks GROUP_N
    per-batch results into one host transfer; a tail batch with
    n < bs - n used to be under-padded (a single ``images[:pad]`` concat
    only doubles the n rows available), producing an odd-shaped
    prediction that crashed ``jnp.stack`` whenever the batch count was a
    multiple of the group size (caught live on the TPU CLI run)."""
    train, _ = synth
    # 59 samples @ bs=8 -> 8 batches (a multiple of GROUP_N=8) so the
    # tail lands INSIDE a stacked group; n=3 < bs-n=5 forces the tiled pad
    big = make_synthetic(n_classes=8, per_class=16, image_size=32, seed=0,
                         train=False)
    test59 = dataclasses.replace(
        big, images=big.images[:59], targets=big.targets[:59])
    cfg = tiny_cfg(method="continual-clip")
    tr = TinyContinualCLIP(cfg, train_dataset=train, test_dataset=test59)
    tr.vocab.expose(test59.targets)
    correct, total = tr.evaluate()
    assert int(total.sum()) == 59
    assert int(tr._last_confusion.sum()) == 59
