"""Pipeline-parallelism tests (virtual 8-device CPU mesh).

The reference has no pipeline parallelism (SURVEY §2.6: DP only); this is
a capability add. The contract under test: the GPipe-style depth pipeline
(parallel/pipeline.py) is numerically a drop-in for the lax.scan tower —
same activations, same loss, same per-step parameter updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lifelong_clip_tpu.config import CLIPConfig, PEFTConfig
from lifelong_clip_tpu.methods.engine import TrainState, make_train_step
from lifelong_clip_tpu.models import build_peft
from lifelong_clip_tpu.models import clip as clip_fns
from lifelong_clip_tpu.models.init import init_clip_params
from lifelong_clip_tpu.parallel import mesh as mesh_lib
from lifelong_clip_tpu.parallel.pipeline import (make_pp_forward,
                                                 pipelined_transformer)
from lifelong_clip_tpu.utils.train_utils import make_optimizer

# 4 layers so a 4-stage pipeline holds one layer per stage
TINY4 = CLIPConfig(embed_dim=64, image_size=32, patch_size=8,
                   vision_width=128, vision_layers=4, vision_heads=4,
                   context_length=16, vocab_size=512, text_width=128,
                   text_heads=4, text_layers=2)


def _batch(b, n_cls=8, seed=0):
    rng = np.random.default_rng(seed)
    tokens = np.zeros((n_cls, TINY4.context_length), np.int32)
    tokens[:, 0] = 511
    tokens[:, 3] = 510
    return {
        "images": jnp.asarray(rng.integers(0, 255, (b, 32, 32, 3),
                                           np.uint8)),
        "labels": jnp.asarray(rng.integers(0, n_cls, (b,)), jnp.int32),
        "tokens": jnp.asarray(tokens),
        "mask": jnp.zeros((n_cls,), jnp.float32),
    }


@pytest.mark.parametrize("shape,micro", [((2, 4), 2), ((4, 2), 2)])
def test_pipelined_transformer_matches_scan(devices, shape, micro):
    mesh = mesh_lib.make_mesh(shape)
    params = init_clip_params(jax.random.PRNGKey(0), TINY4)
    blocks = params["vision"]["blocks"]
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 17, 128), jnp.float32)

    ref = clip_fns.transformer(x, blocks, TINY4.vision_heads,
                               attn_impl="xla")
    blocks_s = mesh_lib.shard_params_pp({"vision": {"blocks": blocks}},
                                        mesh)["vision"]["blocks"]
    got = jax.jit(lambda a, b: pipelined_transformer(
        a, b, TINY4.vision_heads, mesh=mesh, n_microbatches=micro,
        attn_impl="xla"))(x, blocks_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_pp_train_step_matches_single_device(devices):
    """Full train step with a pipelined vision tower (dp=2 x pp=4) must
    reproduce the replicated step's loss and parameter updates."""
    mesh = mesh_lib.make_mesh((2, 4))
    peft_cfg = PEFTConfig(method="lora", encoder="image", lora_r=4)
    params = init_clip_params(jax.random.PRNGKey(0), TINY4)
    peft = build_peft(jax.random.PRNGKey(1), TINY4, peft_cfg)
    tx = make_optimizer("adamw", 1e-3)
    batch = _batch(b=16)

    # replicated baseline
    state = TrainState.create(trainable=peft, frozen=params, tx=tx,
                              rng=jax.random.PRNGKey(2))
    step = make_train_step(TINY4, peft_cfg, tx, image_size=32,
                           mean=(0.5,) * 3, std=(0.25,) * 3,
                           compute_dtype=jnp.float32, attn_impl="xla",
                           donate=False)
    _, m_ref = step(state, batch)
    new_ref, _ = step(state, batch)

    # pipelined: vision blocks + vision LoRA stacks shard over 'model'
    params_pp = mesh_lib.shard_params_pp(params, mesh)
    peft_pp = mesh_lib.shard_params_pp(peft, mesh, match=("vision",))
    assert params_pp["vision"]["blocks"]["attn"]["w_qkv"].sharding.spec \
        == P("model")
    assert peft_pp["vision"]["lora"]["a_in"].sharding.spec == P("model")
    state_pp = TrainState.create(trainable=peft_pp, frozen=params_pp,
                                 tx=tx, rng=jax.random.PRNGKey(2))
    fwd = make_pp_forward(TINY4, peft_cfg, mesh, n_microbatches=2,
                          compute_dtype=jnp.float32, attn_impl="xla")
    step_pp = make_train_step(TINY4, peft_cfg, tx, image_size=32,
                              mean=(0.5,) * 3, std=(0.25,) * 3,
                              compute_dtype=jnp.float32, forward_fn=fwd,
                              donate=False)
    sharded = {k: jax.device_put(
        v, NamedSharding(mesh, P("data") if k in ("images", "labels")
                         else P()))
        for k, v in batch.items()}
    new_pp, m_pp = step_pp(state_pp, sharded)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    # updates match leaf-for-leaf (gather the pp-sharded trainables)
    for k in ("a_in", "b_in"):
        np.testing.assert_allclose(
            np.asarray(new_pp.trainable["vision"]["lora"][k]),
            np.asarray(new_ref.trainable["vision"]["lora"][k]),
            atol=1e-5, rtol=1e-4)


def test_pp_single_stage_falls_back(devices):
    """model axis of 1 routes straight to the lax.scan tower."""
    mesh = mesh_lib.make_mesh((8, 1))
    params = init_clip_params(jax.random.PRNGKey(0), TINY4)
    blocks = params["vision"]["blocks"]
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 17, 128), jnp.float32)
    ref = clip_fns.transformer(x, blocks, TINY4.vision_heads,
                               attn_impl="xla")
    got = pipelined_transformer(x, blocks, TINY4.vision_heads, mesh=mesh,
                                n_microbatches=2, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6)
