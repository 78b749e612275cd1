"""ProtoCLIP model + trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelong_clip_tpu.models import proto_clip as pc
from lifelong_clip_tpu.models.init import init_clip_params
from lifelong_clip_tpu.methods.proto_clip import Trainer_ProtoCLIP

from test_engine import TINY, _TinyMixin, synth, tiny_cfg  # noqa: F401


@pytest.fixture(scope="module")
def frozen():
    return init_clip_params(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def proto():
    return pc.init_proto_params(jax.random.PRNGKey(1), TINY,
                                num_prompt=4, n_ctx=3, copl_pool=8,
                                copl_len=4)


def test_gram_schmidt_orthonormal():
    t = np.random.default_rng(0).normal(size=(5, 16)).astype(np.float32)
    g = pc.gram_schmidt(t)
    gram = g @ g.T
    np.testing.assert_allclose(gram, np.eye(5), atol=1e-5)


def test_copl_prefixes_shapes(frozen, proto):
    q = jax.random.normal(jax.random.PRNGKey(2), (3, TINY.vision_width))
    prompts, valid = pc.copl_prefixes(proto["copl"], q, TINY.vision_layers,
                                      task_count=0, n_tasks=2, train=True,
                                      dtype=jnp.float32)
    assert prompts["k"].shape == (2, 3, 2, TINY.vision_width)
    assert prompts["v"].shape == prompts["k"].shape
    assert bool(valid.all())  # layers 0,1 both in COPL span for depth 2


def test_copl_task_slicing(frozen, proto):
    """Train mode must only engage the current task's pool slice."""
    q = jax.random.normal(jax.random.PRNGKey(2), (2, TINY.vision_width))

    def prompt_sum(copl):
        p, _ = pc.copl_prefixes(copl, q, TINY.vision_layers, task_count=0,
                                n_tasks=2, train=True, dtype=jnp.float32)
        return jnp.sum(p["k"] ** 2) + jnp.sum(p["v"] ** 2)

    g = jax.grad(prompt_sum)(proto["copl"])
    gp = np.asarray(g["p"])  # (layers, pool, len, d)
    pool = gp.shape[1]
    # task 0 of 2 -> first half live, second half frozen
    assert np.abs(gp[:, :pool // 2]).sum() > 0
    np.testing.assert_allclose(gp[:, pool // 2:], 0.0)


def test_proto_text_features_shapes(frozen, proto):
    img = jax.random.normal(jax.random.PRNGKey(3), (2, TINY.embed_dim))
    tokens = np.zeros((4, TINY.context_length), np.int32)
    tokens[:, 0] = 999
    tokens[:, 8] = 998
    txt, idx = pc.proto_text_features(frozen, proto, img,
                                      jnp.asarray(tokens), TINY,
                                      top_k=2, n_ctx=3,
                                      compute_dtype=jnp.float32)
    assert txt.shape == (2, 4, TINY.embed_dim)
    assert idx.shape == (2, 2)
    logits = pc.proto_logits(frozen, img, txt)
    assert logits.shape == (2, 4)


def test_prompt_selection_is_per_sample(frozen, proto):
    """Different image features should be able to pick different prompts."""
    img = jnp.asarray(np.eye(2, TINY.embed_dim, dtype=np.float32))
    prob = img @ proto["text_key"].T
    _, ref_idx = jax.lax.top_k(prob, 2)
    tokens = np.zeros((2, TINY.context_length), np.int32)
    tokens[:, 0] = 999
    tokens[:, 8] = 998
    _, idx = pc.proto_text_features(frozen, proto, img,
                                    jnp.asarray(tokens), TINY, top_k=2,
                                    n_ctx=3, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


class TinyProto(_TinyMixin, Trainer_ProtoCLIP):
    n_ctx = 3
    top_k = 2
    num_prompt = 4
    num_sampled_pcls = 8
    ca_epochs = 1


def test_proto_trainer_two_stage_run(synth):  # noqa: F811
    train, test = synth
    cfg = tiny_cfg(method="adapter-clip-proto_prompt", memory_size=0,
                   online_iter=1)
    tr = TinyProto(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    assert tr.task_count == 2                 # advanced per task
    assert tr._have_proto.sum() > 0           # prototypes recorded
    # stage-2 moved the text pools
    assert np.isfinite(
        np.asarray(tr.state.trainable["text_prompt"])).all()
