"""MaPLe model + trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelong_clip_tpu.config import CLIPConfig
from lifelong_clip_tpu.models.init import init_clip_params
from lifelong_clip_tpu.models.maple import (init_maple_params,
                                            maple_encode_image,
                                            maple_encode_text,
                                            maple_forward)
from lifelong_clip_tpu.methods.maple import MaPLe

from test_engine import TINY, _TinyMixin, synth, tiny_cfg  # noqa: F401


@pytest.fixture(scope="module")
def frozen():
    return init_clip_params(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def learner(frozen):
    return init_maple_params(jax.random.PRNGKey(1), frozen, TINY,
                             n_ctx=3, depth=3, ctx_init_tokens=[5, 6, 7, 8])


def _tokens(n=4):
    t = np.zeros((n, TINY.context_length), np.int32)
    t[:, 0] = 49406
    t[:, 1:5] = [5, 6, 7, 8]
    t[np.arange(n), 6 + np.arange(n) % 3] = 49407
    return jnp.asarray(t)


def test_maple_ctx_init_from_embedding(frozen, learner):
    emb = np.asarray(frozen["text"]["token_embedding"])[[5, 6, 7]]
    np.testing.assert_allclose(np.asarray(learner["ctx"]), emb, atol=1e-6)


def test_maple_shapes_and_grad(frozen, learner):
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    toks = _tokens(5)
    logits, img, txt = maple_forward(frozen, learner, imgs, toks, TINY,
                                     n_ctx=3, compute_dtype=jnp.float32)
    assert logits.shape == (2, 5)
    assert img.shape == (2, TINY.embed_dim)

    def loss(lp):
        lg, _, _ = maple_forward(frozen, lp, imgs, toks, TINY, n_ctx=3,
                                 compute_dtype=jnp.float32)
        return jnp.sum(lg ** 2)

    g = jax.grad(loss)(learner)
    mags = {k: float(jnp.abs(v).max()) for k, v in g.items()}
    assert mags["ctx"] > 0            # ctx reaches both towers
    assert mags["compound_text"] > 0  # deep prompts used
    assert mags["proj_w"] > 0         # visual projection used


def test_maple_compound_prompts_change_output(frozen, learner):
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    a = maple_encode_image(frozen, learner, imgs, TINY, 3,
                           compute_dtype=jnp.float32)
    learner2 = dict(learner,
                    compound_text=learner["compound_text"] + 1.0)
    b = maple_encode_image(frozen, learner2, imgs, TINY, 3,
                           compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_maple_text_ctx_splice(frozen, learner):
    """Changing token ids at the ctx positions must NOT change the output
    (they are replaced by the learnable ctx)."""
    t1 = _tokens(1)
    t2 = np.asarray(t1).copy()
    t2[0, 2] = 123  # inside ctx span (positions 1..4 with n_ctx=3 -> 1..3)
    a = maple_encode_text(frozen, learner, t1, TINY, 3,
                          compute_dtype=jnp.float32)
    b = maple_encode_text(frozen, learner, jnp.asarray(t2), TINY, 3,
                          compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TinyMaPLe(_TinyMixin, MaPLe):
    pass


def test_maple_trainer_run(synth):  # noqa: F811
    train, test = synth
    cfg = tiny_cfg(method="maple", memory_size=0, online_iter=1)
    tr = TinyMaPLe(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    # learner actually moved
    delta = float(jnp.abs(np.asarray(tr.state.trainable["ctx"]) -
                          tr.learner_init["ctx"]).max())
    assert delta > 0
