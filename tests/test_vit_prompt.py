"""L2P / DualPrompt / MVP(ViT) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelong_clip_tpu.models import vit_prompt as vp
from lifelong_clip_tpu.models.init import init_clip_params
from lifelong_clip_tpu.methods.vit_prompt_methods import (MVP, DualPrompt,
                                                          L2P)

from test_engine import TINY, _TinyMixin, synth, tiny_cfg  # noqa: F401


def test_pool_select_diversified_prefers_rare():
    pool = vp.init_prompt_pool(jax.random.PRNGKey(0), 4, 3, 16)
    # orthogonal keys -> equal (nonzero) distance for all -> freq decides
    pool = dict(pool, key=jnp.eye(4, 16))
    query = jnp.concatenate([jnp.zeros((2, 4)), jnp.ones((2, 12))], axis=1)
    freq = jnp.asarray([100.0, 1.0, 100.0, 100.0])
    _, _, counts = vp.pool_select(pool, query, freq, 1, diversified=True,
                                  train=True)
    assert int(jnp.argmax(counts)) == 1  # rare prompt selected


def test_pool_select_counts_sum():
    pool = vp.init_prompt_pool(jax.random.PRNGKey(0), 6, 3, 16)
    query = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    sim, sel, counts = vp.pool_select(pool, query, jnp.ones((6,)), 2,
                                      diversified=False, train=True)
    assert sim.shape == (4, 2)
    assert sel.shape == (4, 2, 3, 16)
    assert float(counts.sum()) == 8.0  # B * selection_size


class TinyL2P(_TinyMixin, L2P):
    pool_size = 4
    selection_size = 2
    prompt_len = 2


class TinyDual(_TinyMixin, DualPrompt):
    pos_g = (0,)
    pos_e = (1,)
    len_g = 2
    len_e = 4


class TinyMVPViT(_TinyMixin, MVP):
    pass


def test_l2p_trainer_run(synth):  # noqa: F811
    train, test = synth
    cfg = tiny_cfg(method="l2p", memory_size=0, online_iter=1)
    tr = TinyL2P(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    assert float(tr.frequency.sum()) > tr.pool_size  # counters advanced


def test_dualprompt_trainer_run(synth):  # noqa: F811
    train, test = synth
    cfg = tiny_cfg(method="dualprompt", memory_size=0, online_iter=1)
    tr = TinyDual(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])


def test_mvp_vit_trainer_run(synth):  # noqa: F811
    train, test = synth
    cfg = tiny_cfg(method="mvp", memory_size=0, online_iter=1)
    tr = TinyMVPViT(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    assert float(tr.count.sum()) > 0
