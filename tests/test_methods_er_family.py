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


def test_rm_run(synth):  # noqa: F811
    train, test = synth
    cfg = tiny_cfg(method="rm", memory_size=24, online_iter=1)
    tr = TinyRM(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    # memory rebuilt class-balanced at task end
    labels = np.asarray(tr.memory.labels)
    assert len(labels) > 0
    counts = np.bincount(labels)
    assert counts[counts > 0].max() - counts[counts > 0].min() <= \
        max(2, 24 // 8)
