"""End-to-end tiny runs of the ER-family methods (LwF, EWC++, CLIB, RM)."""

import jax
import numpy as np
import pytest

from lifelong_clip_tpu.methods.clib import CLIB
from lifelong_clip_tpu.methods.ewcpp import EWCpp
from lifelong_clip_tpu.methods.lwf import LwF
from lifelong_clip_tpu.methods.rainbow_memory import RM

from test_engine import _TinyMixin, synth, tiny_cfg  # noqa: F401


class TinyLwF(_TinyMixin, LwF):
    pass


class TinyEWC(_TinyMixin, EWCpp):
    pass


class TinyCLIB(_TinyMixin, CLIB):
    pass


class TinyRM(_TinyMixin, RM):
    pass


def test_lwf_run(synth):  # noqa: F811
    train, test = synth
    cfg = tiny_cfg(method="lwf", memory_size=32)
    tr = TinyLwF(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])


def test_lwf_ignores_cutmix(synth):  # noqa: F811
    """The reference LwF computes ``do_cutmix`` and never uses it
    (reference lwf.py:144-147) — its training is ALWAYS plain CE (+KD).
    Regression for an r3 code-review finding: LwF inherited ER's
    cutmix-enabled pre-snapshot step, so the first online_step trained
    soft-label mixed CE under the default transforms. With identical
    seeds, LwF's early losses must be bit-identical with and without
    "cutmix" in transforms; the same comparison on ER diverges (teeth:
    ER really does cutmix)."""
    from lifelong_clip_tpu.methods.er_baseline import ER

    class TinyER(_TinyMixin, ER):
        pass

    def first_losses(cls, method, transforms, n=6):
        cfg = tiny_cfg(method=method, memory_size=0, online_iter=1,
                       transforms=transforms)
        tr = cls(cfg, train_dataset=synth[0], test_dataset=synth[1])
        losses = []
        stream = tr.stream
        for t in range(2):
            idx = stream.task_indices[t][:cfg.batchsize * 3]
            for lo in range(0, len(idx), cfg.batchsize):
                chunk = idx[lo:lo + cfg.batchsize]
                images, labels = tr.train_dataset.gather(chunk)
                tr.vocab.expose(labels)
                stats = tr.online_step(images, labels, chunk)
                losses.append(float(stats["loss"]))
                if len(losses) >= n:
                    return np.asarray(losses)
        return np.asarray(losses)

    lwf_plain = first_losses(TinyLwF, "lwf", ())
    lwf_cm = first_losses(TinyLwF, "lwf", ("cutmix",))
    np.testing.assert_array_equal(lwf_plain, lwf_cm)

    er_plain = first_losses(TinyER, "er", ())
    er_cm = first_losses(TinyER, "er", ("cutmix",))
    assert not np.array_equal(er_plain, er_cm)


def test_ewcpp_run(synth):  # noqa: F811
    train, test = synth
    cfg = tiny_cfg(method="ewc++", memory_size=32)
    tr = TinyEWC(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    # fisher accumulated and importance snapshotted at task end
    fisher_mag = sum(float(abs(x).sum()) for x in
                     jax.tree.leaves(tr.ewc_state["fisher"]))
    imp_mag = sum(float(abs(x).sum()) for x in
                  jax.tree.leaves(tr.ewc_state["importance"]))
    assert fisher_mag > 0 and imp_mag > 0
    assert float(tr.ewc_state["has_reg"]) == 1.0


def test_clib_run(synth):  # noqa: F811
    train, test = synth
    cfg = tiny_cfg(method="clib", memory_size=32, online_iter=1)
    tr = TinyCLIB(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    assert len(tr.memory) > 0
    # loss history maintained
    assert any(l != 0.0 for l in tr.memory.loss_history)


def test_clib_feature_cache_matches_full_forwards(synth):  # noqa: F811
    """The head-only refresh over cached tower features must produce the
    same per-sample losses as full forwards (the tower is frozen and the
    loss transform is deterministic, so features are per-index constants),
    track live head updates, and recover from cache misses."""
    import jax.numpy as jnp

    train, test = synth
    cfg = tiny_cfg(method="clib", memory_size=32, online_iter=1)
    tr = TinyCLIB(cfg, train_dataset=train, test_dataset=test)
    for step in range(3):
        idx = np.arange(step * 4, step * 4 + 4)
        imgs, labels = train.gather(idx)
        tr.vocab.expose(labels)
        tr.online_step(imgs, labels, idx)
    assert len(tr.memory) > 0 and tr._feat_buf is not None
    assert (tr._slot_index >= 0).sum() == len(tr.memory)

    idx = tr.memory.ordered_indices()
    labels = np.asarray(tr.memory.labels)
    mask = jnp.asarray(tr.vocab.logit_mask())
    fast = tr._memory_losses(idx, labels, mask, batch_cap=8)
    tr._feats_cacheable = False
    slow = tr._memory_losses(idx, labels, mask, batch_cap=8)
    tr._feats_cacheable = True
    np.testing.assert_allclose(fast, slow, rtol=0, atol=1e-5)

    # cache misses (e.g. memory restored from a checkpoint) recompute the
    # stale slots on device, including ones the last incoming batch can't
    # serve
    tr._slot_index = np.full_like(tr._slot_index, -1)
    tr._inc_pos = {}
    refill = tr._memory_losses(idx, labels, mask, batch_cap=8)
    np.testing.assert_allclose(refill, slow, rtol=0, atol=1e-5)
    assert (tr._slot_index[:len(idx)] == idx).all()

    # the cached path sees head updates: perturb the head (per-class, so
    # the softmax CE actually moves), losses move
    head = tr.state.trainable["head"]
    delta = 0.1 * jnp.arange(head["w"].shape[1], dtype=head["w"].dtype)
    tr.state = tr.state.replace(trainable={"head": {
        "w": head["w"] + delta[None, :], "b": head["b"] - delta}})
    moved = tr._memory_losses(idx, labels, mask, batch_cap=8)
    assert not np.allclose(moved, slow, atol=1e-6)


def test_cli_knobs_reach_config():
    """--lr_step/--lr_period/--lr_length/--reg_coef/--memory_epoch/
    --imp_update_period must land in TrainConfig (VERDICT r1 item 5)."""
    from lifelong_clip_tpu.main import args_to_config, base_parser
    args = base_parser().parse_args(
        ["--lr_step", "0.5", "--lr_period", "7", "--lr_length", "3",
         "--reg_coef", "42", "--memory_epoch", "2",
         "--imp_update_period", "4"])
    cfg = args_to_config(args)
    assert cfg.lr_step == 0.5 and cfg.lr_period == 7 and cfg.lr_length == 3
    assert cfg.reg_coef == 42 and cfg.memory_epoch == 2
    assert cfg.imp_update_period == 4


def test_clib_adaptive_lr_honors_knobs(synth):  # noqa: F811
    """Non-default lr_step changes the LR pair and the t-test re-centering
    (reference clib.py:37 low_lr = lr_step * lr, and :160-190)."""
    train, test = synth
    cfg = tiny_cfg(method="clib", memory_size=32, online_iter=1,
                   lr_step=0.5, lr_period=2, lr_length=4)
    tr = TinyCLIB(cfg, train_dataset=train, test_dataset=test)
    assert np.isclose(tr._lr_low, 0.5 * cfg.lr)      # not 0.95 * lr

    # drive the machinery to a period boundary with histories that make
    # the low LR win the Welch t-test -> geometric re-centering by lr_step
    tr._loss_sweep = np.ones(8)
    tr._prev_losses = np.full(8, 2.0)                 # appends decrease 1.0
    tr._train_count = 21                              # next call: 22 % 2 == 0
    tr._lr_is_high = True
    tr._high_hist = [0.0, 0.1, -0.1]                  # + 1.0 appended -> 4
    tr._low_hist = [2.0, 2.1, 1.9, 2.05]
    lr_high_before = tr._lr_high
    tr._adaptive_lr()
    assert np.isclose(tr._lr_high, 0.5 * lr_high_before)
    assert np.isclose(tr._lr_low, 0.25 * lr_high_before)
    # the re-centering toggles the phase a second time (reference
    # clib.py:169-195): the period toggle went high->low, re-centering
    # flips back to high, so the live LR is the NEW high
    assert tr._lr_is_high
    live = float(np.asarray(
        tr.state.opt_state.hyperparams["learning_rate"]))
    assert np.isclose(live, tr._lr_high)


def test_vote_ratio_uncertainty():
    """Hand-built case where the reference's MC vote ratio and a
    max-mean-softmax metric DISAGREE on which sample is more uncertain —
    pins the implementation to the vote-ratio semantics
    (reference variance_ratio, rainbow_memory.py:279-285)."""
    import jax.numpy as jnp
    from lifelong_clip_tpu.methods.rainbow_memory import \
        vote_ratio_uncertainty

    # sample A: all 4 views vote class 0 (with low confidence)
    # sample B: 3 views vote class 0 confidently, 1 view flips to class 1
    probs = np.array([
        [[0.90, 0.10], [0.95, 0.05]],
        [[0.55, 0.45], [0.95, 0.05]],
        [[0.55, 0.45], [0.95, 0.05]],
        [[0.55, 0.45], [0.05, 0.95]],
    ])  # (V=4, B=2, C=2)
    preds = jnp.argmax(jnp.asarray(probs), axis=-1)           # (V, B)
    unc = np.asarray(vote_ratio_uncertainty(preds, 2))
    np.testing.assert_allclose(unc, [0.0, 0.25])              # B > A

    # the old mean-softmax metric ranks them the OTHER way round
    old = 1.0 - probs.mean(axis=0).max(axis=-1)
    assert old[0] > old[1]
    assert unc[1] > unc[0]

    # degenerate: unanimous votes -> 0; maximal split -> 1 - 1/V
    u2 = np.asarray(vote_ratio_uncertainty(
        jnp.asarray([[2, 0], [2, 1], [2, 3], [2, 2]]), 4))
    np.testing.assert_allclose(u2, [0.0, 0.75])


def test_rm_run(synth):  # noqa: F811
    train, test = synth
    # rm_uncertainty=True exercises the MC vote-ratio rebuild (capability
    # add behind the flag; the default mirrors the reference's live path
    # where uncertainty_sampling is dead code)
    cfg = tiny_cfg(method="rm", memory_size=24, online_iter=1,
                   memory_epoch=1, rm_uncertainty=True)
    tr = TinyRM(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    # memory rebuilt class-balanced at task end
    labels = np.asarray(tr.memory.labels)
    assert len(labels) > 0
    counts = np.bincount(labels)
    assert counts[counts > 0].max() - counts[counts > 0].min() <= \
        max(2, 24 // 8)


def test_rm_default_run_live_reference_path(synth):  # noqa: F811
    """Default rm (no uncertainty rebuild — the reference's live path):
    class-balanced random replacement, in-order memory epochs under the
    warm LR schedule, LR restored to base at the next task start."""
    from lifelong_clip_tpu.methods.rainbow_memory import RM
    train, test = synth
    cfg = tiny_cfg(method="rm", memory_size=16, online_iter=1,
                   temp_batchsize=2, memory_epoch=3, batchsize=8)
    tr = TinyRM(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    assert len(tr.memory) == 16
    # memory stores STREAM samples: every slot's label must be the true
    # dataset label of its index (regression: replay_concat/pad reshuffled
    # labels were being paired with stream indices)
    tgt = np.asarray(train.targets)
    assert all(int(tgt[i]) == int(l)
               for i, l in zip(tr.memory.indices, tr.memory.labels))
    # epoch LR schedule replays torch CAWR(T_0=1, T_mult=2) exactly
    base = cfg.lr
    assert RM.memory_epoch_lr(0, base) == base * 0.1
    assert RM.memory_epoch_lr(1, base) == base
    assert RM.memory_epoch_lr(2, base) == base          # restart epoch
    mid = RM.memory_epoch_lr(3, base)                   # cos(pi/2) point
    np.testing.assert_allclose(mid, base * 0.01 + (base - base * 0.01) / 2,
                               rtol=1e-6)
    assert RM.memory_epoch_lr(4, base) == base          # next restart
    # imagenet branch replays MultiStepLR([30,60,80,90], gamma=0.1): the
    # reference swaps schedulers on dataset (rainbow_memory.py:127-130);
    # warm-start epochs 0/1 force-set LR before any scheduler step
    assert RM.memory_epoch_lr(0, base, "imagenet") == base * 0.1
    assert RM.memory_epoch_lr(1, base, "imagenet") == base
    assert RM.memory_epoch_lr(2, base, "imagenet") == base   # held at base
    assert RM.memory_epoch_lr(30, base, "imagenet") == base  # e-1=29 < 30
    np.testing.assert_allclose(
        RM.memory_epoch_lr(31, base, "imagenet"), base * 0.1, rtol=1e-12)
    np.testing.assert_allclose(
        RM.memory_epoch_lr(61, base, "imagenet"), base * 0.01, rtol=1e-12)
    np.testing.assert_allclose(
        RM.memory_epoch_lr(95, base, "imagenet"), base * 1e-4, rtol=1e-12)
    # the run ends right after the last memory train; its final epoch LR
    # (f32) is what the state carries
    np.testing.assert_allclose(
        float(tr.state.opt_state.hyperparams["learning_rate"]),
        RM.memory_epoch_lr(int(cfg.memory_epoch) - 1, base), rtol=1e-6)


def test_er_cutmix_loss_finite(synth):  # noqa: F811
    """CutMix trains through the soft-label CE: padded class slots carry
    -inf masked logits, and the naive y·log_softmax turns the 0·(-inf)
    padding terms into NaN (regression: every ER-family cutmix step
    returned NaN loss/grads). Reference cutmix loss:
    methods/er_baseline.py:132-147."""
    from lifelong_clip_tpu.methods.er_baseline import ER

    class TinyER(_TinyMixin, ER):
        pass

    train, test = synth
    cfg = tiny_cfg(method="er", memory_size=32, temp_batchsize=4,
                   transforms=("cutmix",))
    tr = TinyER(cfg, train_dataset=train, test_dataset=test)
    tr.online_before_task(0)
    idx = np.asarray(tr.stream.task_indices[0][:8])
    images, labels = tr.train_dataset.gather(idx)
    tr.vocab.expose(labels)
    for _ in range(4):
        stats = tr.online_step(images, labels, idx)
        assert np.isfinite(float(np.asarray(stats["loss"])))


@pytest.mark.parametrize("method", ["lwf", "ewc++", "rm"])
def test_memory_stores_stream_labels(synth, method):  # noqa: F811
    """Replay memory must pair stream dataset indices with the STREAM
    labels (regression: with temp_batchsize > 0, replay_concat truncates
    the stream portion and appends memory labels, and lwf/ewc++/rm were
    storing those reshuffled labels against stream indices)."""
    train, test = synth
    cls = {"lwf": TinyLwF, "ewc++": TinyEWC, "rm": TinyRM}[method]
    cfg = tiny_cfg(method=method, online_iter=1, memory_size=8,
                   temp_batchsize=2)
    tr = cls(cfg, train_dataset=train, test_dataset=test)
    tr.online_before_task(0)
    tgt = np.asarray(train.targets)
    bs = cfg.batchsize
    for lo in range(0, 3 * bs, bs):
        idx = np.arange(lo, lo + bs)
        images, labels = train.gather(idx)
        tr.vocab.expose(labels)
        tr.online_step(images, labels, idx)
    assert len(tr.memory) > 0
    assert all(int(tgt[i]) == int(l)
               for i, l in zip(tr.memory.indices, tr.memory.labels))
