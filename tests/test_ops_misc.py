"""Unit tests for MoE gating, schedulers, and optimizer factory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelong_clip_tpu.ops.moe import (cv_squared, moe_adapter_apply,
                                       noisy_top_k_gates)
from lifelong_clip_tpu.utils.train_utils import make_optimizer, make_schedule
from lifelong_clip_tpu.config import PEFTConfig


def test_noisy_top_k_gates_shapes_and_sparsity():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (6, 16))
    router = jax.random.normal(jax.random.fold_in(rng, 1), (16, 4))
    w_noise = jnp.zeros((16, 4))
    gates, importance = noisy_top_k_gates(x, router, w_noise, top_k=2)
    assert gates.shape == (6, 4)
    np.testing.assert_allclose(np.asarray(gates.sum(-1)), 1.0, atol=1e-5)
    # top-2: at most 2 nonzero per row
    assert (np.asarray(gates) > 1e-6).sum(-1).max() <= 2
    assert importance.shape == (4,)


def test_noisy_gating_with_rng_differs():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (6, 16))
    router = jax.random.normal(jax.random.fold_in(rng, 1), (16, 4))
    w_noise = jnp.ones((16, 4))
    g1, _ = noisy_top_k_gates(x, router, w_noise, 2,
                              rng=jax.random.PRNGKey(5))
    g2, _ = noisy_top_k_gates(x, router, w_noise, 2,
                              rng=jax.random.PRNGKey(6))
    assert not np.allclose(np.asarray(g1), np.asarray(g2))


def test_cv_squared():
    assert float(cv_squared(jnp.asarray([1.0, 1.0, 1.0]))) < 1e-6
    assert float(cv_squared(jnp.asarray([1.0, 0.0, 0.0]))) > 0.5


def test_moe_adapter_apply_shapes():
    from lifelong_clip_tpu.models.peft import init_moe
    cfg = PEFTConfig(method="moe", moe_experts=2, adapter_dim=8)
    moe_stacked = init_moe(jax.random.PRNGKey(0), 2, 16, cfg)
    moe = jax.tree.map(lambda a: a[0], moe_stacked)  # one layer slice
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 16))
    out = moe_adapter_apply(x, moe, cfg)
    assert out.shape == x.shape
    # zero-init experts (up zeros) -> zero delta at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


@pytest.mark.parametrize("name", ["default", "exp", "cos", "coslr",
                                  "codacosine", "anneal", "multistep"])
def test_schedules_produce_finite_lrs(name):
    s = make_schedule(name, 1e-3, total_steps=100)
    if callable(s):
        for step in (0, 50, 99):
            v = float(s(step))
            assert 0.0 <= v <= 1e-3 + 1e-9
    else:
        assert s == 1e-3


@pytest.mark.parametrize("opt", ["adam", "adamw", "radam", "sgd"])
def test_optimizer_factory(opt):
    tx = make_optimizer(opt, 1e-3, grad_clip=1.0)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4))}
    updates, _ = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_remat_fallback_rebuilds_on_compile_oom():
    """engine.remat_fallback: a compile-time HBM OOM on the first call
    rebuilds the step with remat=True and retries; other errors and
    second failures propagate; the fallback executable is reused."""
    from lifelong_clip_tpu.methods.engine import remat_fallback

    built = []

    def build(remat):
        built.append(remat)

        def fn(state, batch):
            if not remat:
                raise jax.errors.JaxRuntimeError(
                    "INTERNAL: http://…/remote_compile: HTTP 500 … "
                    "Ran out of memory in memory space hbm. Used 16.23G")
            return ("ok", state + batch)

        return fn

    step = remat_fallback(build)
    assert step(1, 2) == ("ok", 3)
    assert built == [False, True]
    assert step(3, 4) == ("ok", 7)          # reuses the remat build
    assert built == [False, True]

    def build_other_error(remat):
        def fn(state, batch):
            raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: shapes")
        return fn

    step2 = remat_fallback(build_other_error)
    with pytest.raises(jax.errors.JaxRuntimeError, match="INVALID"):
        step2(1, 2)


def test_remat_fallback_never_retries_after_success():
    """An OOM AFTER the step has succeeded once is memory pressure, not
    program size — and donation may have consumed the caller's buffers —
    so it must propagate, not trigger a rebuild."""
    from lifelong_clip_tpu.methods.engine import remat_fallback

    calls = {"n": 0}

    def build(remat):
        def fn(state, batch):
            calls["n"] += 1
            if calls["n"] > 1:
                raise jax.errors.JaxRuntimeError(
                    "RESOURCE_EXHAUSTED: Ran out of memory in memory "
                    "space hbm")
            return state + batch
        return fn

    step = remat_fallback(build)
    assert step(1, 2) == 3
    with pytest.raises(jax.errors.JaxRuntimeError, match="Ran out"):
        step(3, 4)
