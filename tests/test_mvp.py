"""MVP-CLIP model + trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelong_clip_tpu.models.init import init_clip_params
from lifelong_clip_tpu.models.mvp_clip import (init_mvp_params,
                                               mvp_features, mvp_head)
from lifelong_clip_tpu.methods.mvp_clip import CLIP_MVP, CLIP_MVP_Full, \
    mvp_scores

from test_engine import TINY, _TinyMixin, synth, tiny_cfg  # noqa: F401


@pytest.fixture(scope="module")
def frozen():
    return init_clip_params(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def mvp():
    return init_mvp_params(jax.random.PRNGKey(1), TINY, e_pool=4,
                           num_classes=8)


def test_mvp_features_shapes_and_count(frozen, mvp):
    imgs = jax.random.normal(jax.random.PRNGKey(2), (3, 32, 32, 3))
    count = jnp.zeros((4,), jnp.float32)
    img, cls_mask, sim_loss, new_count, idx = mvp_features(
        frozen, mvp, count, imgs, TINY, train=True,
        compute_dtype=jnp.float32)
    assert img.shape == (3, TINY.embed_dim)
    assert cls_mask.shape == (3, 8)
    # sigmoid(-1)*2 at init
    np.testing.assert_allclose(np.asarray(cls_mask),
                               2 / (1 + np.e), atol=1e-3)
    assert float(new_count.sum()) == 3.0  # one selection per sample
    assert np.isfinite(float(sim_loss))


def test_mvp_contrastive_mass_shifts_selection(frozen, mvp):
    imgs = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
    heavy = jnp.asarray([100.0, 0.0, 0.0, 0.0])
    _, _, _, _, idx0 = mvp_features(frozen, mvp, jnp.zeros(4), imgs, TINY,
                                    use_contrastiv=True, train=False,
                                    compute_dtype=jnp.float32)
    _, _, _, _, idx1 = mvp_features(frozen, mvp, heavy, imgs, TINY,
                                    use_contrastiv=True, train=False,
                                    compute_dtype=jnp.float32)
    # a heavily used prompt 0 must not keep winning under count scaling
    assert not np.all(np.asarray(idx1) == 0) or \
        not np.any(np.asarray(idx0) == 0)


def test_mvp_prompts_affect_features(frozen, mvp):
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    count = jnp.zeros((4,), jnp.float32)
    a, _, _, _, _ = mvp_features(frozen, mvp, count, imgs, TINY,
                                 train=False, compute_dtype=jnp.float32)
    mvp2 = dict(mvp, g_prompts=mvp["g_prompts"] + 2.0)
    b, _, _, _, _ = mvp_features(frozen, mvp2, count, imgs, TINY,
                                 train=False, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_mvp_scores_shapes():
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (4, 16))
    txt = jax.random.normal(jax.random.fold_in(rng, 1), (6, 16))
    y = jnp.asarray([0, 1, 2, 1], jnp.int32)
    cls_mask = jnp.ones((4, 6))
    class_mask = jnp.zeros((6,))
    ign, cps = mvp_scores(img, txt, y, cls_mask, class_mask,
                          jnp.asarray(100.0), True, 0.5)
    assert ign.shape == (4,) and cps.shape == (4,)
    assert np.isfinite(np.asarray(ign)).all()
    assert (np.asarray(cps) > 0).all()  # margin keeps it positive


class TinyMVP(_TinyMixin, CLIP_MVP):
    pass


class TinyMVPFull(_TinyMixin, CLIP_MVP_Full):
    pass


def test_mvp_trainer_run(synth):  # noqa: F811
    train, test = synth
    cfg = tiny_cfg(method="mvp-clip", memory_size=0, online_iter=1)
    tr = TinyMVP(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    assert float(tr.count.sum()) > 0  # prompts were selected/counted


def test_mvp_full_trainer_run(synth):  # noqa: F811
    train, test = synth
    cfg = tiny_cfg(method="mvp-clip", memory_size=0, online_iter=1,
                   stream=__import__("lifelong_clip_tpu.config",
                                     fromlist=["StreamConfig"]
                                     ).StreamConfig(n_tasks=2, n=50, m=10,
                                                    seed=1))
    tr = TinyMVPFull(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
