"""ProtoCLIP model + trainer tests."""

import ast
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lifelong_clip_tpu.models import proto_clip as pc
from lifelong_clip_tpu.models.init import init_clip_params
from lifelong_clip_tpu.methods.proto_clip import (Trainer_ProtoCLIP,
                                                  displacement)

from test_engine import TINY, _TinyMixin, synth, tiny_cfg  # noqa: F401

REFERENCE = "/root/reference/methods/Trainer_ProtoCLIP.py"


def _reference_displacement():
    """Extract the reference's pure-numpy displacement() method body via
    ast (the module itself imports torch/sklearn; the function needs only
    numpy and its arguments)."""
    tree = ast.parse(open(REFERENCE).read())
    fn = next(n for n in ast.walk(tree)
              if isinstance(n, ast.FunctionDef) and n.name == "displacement")
    ns = {"np": np}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), REFERENCE, "exec"),
         ns)
    return ns["displacement"]


@pytest.mark.skipif(not os.path.exists(REFERENCE),
                    reason="reference tree unavailable")
def test_displacement_matches_reference():
    rng = np.random.default_rng(0)
    Y1 = rng.normal(size=(40, 16))
    Y2 = Y1 + rng.normal(scale=0.1, size=(40, 16))
    old_means = rng.normal(size=(5, 16))
    ref = _reference_displacement()(None, Y1, Y2, old_means, 4.0)
    got = displacement(Y1, Y2, old_means, 4.0)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)
    # far-away prototypes still move (the +1e-5 floor dominates): every
    # row of W normalizes to the unweighted mean drift in the limit
    far = np.full((1, 16), 1e3)
    got_far = displacement(Y1, Y2, far, 4.0)
    np.testing.assert_allclose(got_far[0], (Y2 - Y1).mean(axis=0),
                               atol=1e-8)


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


def test_sdc_pairs_same_samples_and_moves_only_old_protos(synth):  # noqa: F811
    """Drift must pair the SAME samples under the old vs new model
    (reference compute_old_embedding():259-266 + stage1_and_stage2():267-280)
    and shift exactly the previously-seen prototypes by displacement()."""
    train, test = synth
    cfg = tiny_cfg(method="adapter-clip-proto_prompt", memory_size=0,
                   online_iter=1)
    tr = TinyProto(cfg, train_dataset=train, test_dataset=test)
    tr._stage2 = lambda task_id: None  # isolate the prototype/drift math

    # task 0: no prototypes yet -> no old-model extraction
    tr.online_before_task(0)
    assert tr._old_feats is None
    idx0 = tr._sdc_idx
    tr.vocab.expose(train.targets[idx0])  # run() does this per batch
    tr.online_after_task(0)
    old_slots = np.nonzero(tr._have_proto)[0]
    assert len(old_slots) > 0

    # task 1: pre-task extraction runs on the incoming task's samples
    tr.online_before_task(1)
    assert tr._old_feats is not None
    np.testing.assert_array_equal(tr._sdc_idx,
                                  np.unique(tr.stream.task_indices[1][:500]))
    tr.vocab.expose(train.targets[tr._sdc_idx])
    old_feats = tr._old_feats.copy()
    means_before = tr._class_means[old_slots].copy()

    # make the "new model" features a deterministic shift of the old ones
    shift = 0.25
    tr._batched_features = lambda idx: old_feats + shift
    tr.online_after_task(1)

    expected_gap = displacement(old_feats, old_feats + shift,
                                means_before, tr.sigma_drift)
    task1_classes = np.unique(train.targets[tr._sdc_idx])
    task1_slots = set(int(s) for s in tr.vocab.remap(task1_classes))
    for i, slot in enumerate(old_slots):
        if int(slot) in task1_slots:
            continue  # re-seen classes get fresh prototypes afterwards
        np.testing.assert_allclose(tr._class_means[slot],
                                   means_before[i] + expected_gap[i],
                                   rtol=1e-6, atol=1e-8)
    # uniform drift of +shift everywhere moves every old prototype by it
    np.testing.assert_allclose(expected_gap, shift, rtol=1e-6)


def test_proto_trainer_two_stage_run(synth):  # noqa: F811
    train, test = synth
    cfg = tiny_cfg(method="adapter-clip-proto_prompt", memory_size=0,
                   online_iter=1)
    tr = TinyProto(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
    # reference timing: process_task_count fires at online_BEFORE_task for
    # task_id>0 (Trainer_ProtoCLIP.py:84-91), so a 2-task run ends at 1
    assert tr.task_count == 1
    assert tr._have_proto.sum() > 0           # prototypes recorded
    # stage-2 moved the text pools
    assert np.isfinite(
        np.asarray(tr.state.trainable["text_prompt"])).all()


def test_eval_comb_cache_matches_direct(synth):  # noqa: F811
    """The eval combination-table path (precomputed per-sweep text
    features gathered by the sample's top-k selection) must reproduce the
    direct per-batch B·C text pass exactly — same logits, same preds."""
    train, test = synth
    cfg = tiny_cfg(method="adapter-clip-proto_prompt", memory_size=0,
                   online_iter=1)
    tr = TinyProto(cfg, train_dataset=train, test_dataset=test)
    assert tr._comb_ok
    # a few steps so pools/selection are non-degenerate
    for bi, lo in enumerate(range(0, 32, cfg.batchsize)):
        idx = np.arange(lo, lo + cfg.batchsize)
        images, labels = train.gather(idx)
        tr.vocab.expose(labels)
        tr.online_step(images, labels, idx)
    tr.prepare_eval()
    assert tr._txt_comb is not None
    images, _ = test.gather(np.arange(8))
    preds_c, logits_c = tr._eval_cached_fn(
        tr.state.frozen, tr.state.trainable, jnp.asarray(images),
        tr._txt_comb, tr._mask, tr._comb_lookup, tr.task_count)
    preds_d, logits_d = tr._eval_fn(
        tr.state.frozen, tr.state.trainable, jnp.asarray(images),
        tr._tokens, tr._mask, tr.task_count)
    fin = np.isfinite(np.asarray(logits_d))
    np.testing.assert_allclose(np.asarray(logits_c)[fin],
                               np.asarray(logits_d)[fin],
                               rtol=2e-2, atol=2e-2)  # bf16 pass
    np.testing.assert_array_equal(np.asarray(preds_c),
                                  np.asarray(preds_d))


def test_prompt_combinations_cover_topk():
    """Every top_k outcome folds to a valid combo row; impossible tuples
    (repeats) stay -1."""
    combos, lookup = pc.prompt_combinations(4, 2)
    assert combos.shape == (12, 2)                 # 4P2 ordered pairs
    for row, (i, j) in enumerate(combos):
        assert lookup[i * 4 + j] == row
    for i in range(4):
        assert lookup[i * 4 + i] == -1             # repeats impossible
    # over-cap selections disable the cache
    c, lo = pc.prompt_combinations(10, 4, cap=1024)
    assert c is None and lo is None


def test_prefix_shared_text_features_match_full(frozen, proto):
    """The prefix-shared fast path (per-sample prefix pass + per-pair
    class-suffix pass with collected KV states) must reproduce the full
    B*C 77-token pass exactly — values AND gradients: under the causal
    mask the [SOS]+ctx prefix is class-independent and post-EOT tokens
    never reach the pooled position."""
    rng = np.random.default_rng(7)
    b, c, top_k, n_ctx = 3, 4, 2, 3
    lp = 1 + top_k * n_ctx
    img = jnp.asarray(rng.normal(size=(b, TINY.embed_dim)), jnp.float32)
    tokens = np.zeros((c, TINY.context_length), np.int32)
    eots = [9, 12, 10, 15]
    for i, e in enumerate(eots):
        tokens[i, 0] = 49406                       # SOT
        tokens[i, 1:e] = rng.integers(1, 40000, e - 1)
        tokens[i, e] = 49407                       # EOT (max id)
    tokens = jnp.asarray(tokens)
    s = max(eots) - lp + 1

    kw = dict(top_k=top_k, n_ctx=n_ctx, compute_dtype=jnp.float32)
    full, idx_full = pc.proto_text_features(frozen, proto, img, tokens,
                                            TINY, suffix_len=None, **kw)
    fast, idx_fast = pc.proto_text_features(frozen, proto, img, tokens,
                                            TINY, suffix_len=s, **kw)
    np.testing.assert_array_equal(np.asarray(idx_fast), np.asarray(idx_full))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                               atol=2e-5, rtol=1e-4)

    w = jnp.asarray(rng.normal(size=(b, c, TINY.embed_dim)), jnp.float32)

    def loss(p, suffix_len):
        txt, _ = pc.proto_text_features(frozen, p, img, tokens, TINY,
                                        suffix_len=suffix_len, **kw)
        return jnp.sum(txt * w)

    g_full = jax.grad(loss)(proto, None)
    g_fast = jax.grad(loss)(proto, s)
    np.testing.assert_allclose(np.asarray(g_fast["text_prompt"]),
                               np.asarray(g_full["text_prompt"]),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_fast["text_key"]),
                               np.asarray(g_full["text_key"]),
                               atol=2e-4, rtol=1e-3)


def test_copl_prefixes_vectorized_matches_per_layer_loop():
    """The layer-vectorized CoPL synthesis must equal the straightforward
    per-layer loop (values and pool gradients)."""
    import jax
    import jax.numpy as jnp
    from lifelong_clip_tpu.config import CLIPConfig
    from lifelong_clip_tpu.models import proto_clip as pc

    cfg = CLIPConfig(embed_dim=32, image_size=32, patch_size=8,
                     vision_width=64, vision_layers=9, vision_heads=4,
                     context_length=16, vocab_size=128, text_width=64,
                     text_heads=4, text_layers=2)
    copl = {k: v for k, v in pc.init_proto_params(
        jax.random.PRNGKey(0), cfg, copl_pool=10)["copl"].items()}
    query = jax.random.normal(jax.random.PRNGKey(1), (5, 64), jnp.float32)

    def reference(copl, query, layers, task_count, n_tasks, train):
        pool = copl["k"].shape[1]
        pt = pool // max(n_tasks, 1)
        s, f = task_count * pt, (task_count + 1) * pt
        idx = jnp.arange(pool)
        live = ((idx >= s) & (idx < f)) if train \
            else jnp.zeros((pool,), bool)
        use = idx < f

        def synth(k_pool, a_pool, p_pool):
            k_eff = jnp.where(live[:, None], k_pool,
                              jax.lax.stop_gradient(k_pool))
            a_eff = jnp.where(live[:, None], a_pool,
                              jax.lax.stop_gradient(a_pool))
            p_eff = jnp.where(live[:, None, None], p_pool,
                              jax.lax.stop_gradient(p_pool))
            aq = query[:, None, :] * a_eff[None]
            nk = k_eff / (jnp.linalg.norm(k_eff, axis=-1,
                                          keepdims=True) + 1e-8)
            nq = aq / (jnp.linalg.norm(aq, axis=-1,
                                       keepdims=True) + 1e-8)
            w = jnp.einsum("bpd,pd->bp", nq, nk)
            w = jnp.where(use[None, :], w, 0.0)
            pr = jnp.einsum("bp,pld->bld", w, p_eff)
            half = pr.shape[1] // 2
            return pr[:, :half], pr[:, half:]

        b = query.shape[0]
        half = copl["p"].shape[2] // 2
        d = copl["p"].shape[-1]
        ek = jnp.zeros((layers, b, half, d), jnp.float32)
        ev = jnp.zeros((layers, b, half, d), jnp.float32)
        for i, layer in enumerate(pc.COPL_LAYERS):
            if layer >= layers:
                continue
            k_, v_ = synth(copl["k"][i], copl["a"][i], copl["p"][i])
            ek = ek.at[layer].set(k_)
            ev = ev.at[layer].set(v_)
        return ek, ev

    for task_count, train in ((0, True), (1, True), (1, False)):
        got, valid = pc.copl_prefixes(copl, query, cfg.vision_layers,
                                      task_count=task_count, n_tasks=2,
                                      train=train, dtype=jnp.float32)
        ek_ref, ev_ref = reference(copl, query, cfg.vision_layers,
                                   task_count, 2, train)
        np.testing.assert_allclose(np.asarray(got["k"]),
                                   np.asarray(ek_ref), atol=2e-6)
        np.testing.assert_allclose(np.asarray(got["v"]),
                                   np.asarray(ev_ref), atol=2e-6)
        assert valid[:7].all() and not valid[7:].any()

    # pool gradients match (live-slice masking preserved)
    def loss_new(c):
        pr, _ = pc.copl_prefixes(c, query, cfg.vision_layers,
                                 task_count=0, n_tasks=2, train=True,
                                 dtype=jnp.float32)
        return jnp.sum(pr["k"] ** 2) + jnp.sum(pr["v"] ** 2)

    def loss_ref(c):
        ek, ev = reference(c, query, cfg.vision_layers, 0, 2, True)
        return jnp.sum(ek ** 2) + jnp.sum(ev ** 2)

    g_new = jax.grad(loss_new)(copl)
    g_ref = jax.grad(loss_ref)(copl)
    for k in ("p", "k", "a"):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_ref[k]), atol=2e-5,
                                   rtol=2e-5)
    # task 0: live slice = first half of the pool; future slice masked
    pt = copl["k"].shape[1] // 2
    assert float(jnp.abs(g_new["p"][:, :pt]).max()) > 0
    assert float(jnp.abs(g_new["p"][:, pt:]).max()) == 0.0


def test_suffix_pass_fused_matches_einsum_body(frozen, proto, monkeypatch):
    """The TPU fused-kernel suffix body (row-batched prefix kernel over
    the flattened B*C pair batch) must match the einsum body — values and
    prompt grads. Runs the Pallas kernel in interpret mode on CPU; bf16
    weight quantization inside the kernel bounds the tolerance."""
    from lifelong_clip_tpu.ops import attention as attn_mod
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(11)
    b, c, top_k, n_ctx = 2, 3, 2, 3
    img = jnp.asarray(rng.normal(size=(b, TINY.embed_dim)), jnp.float32)
    tokens = np.zeros((c, TINY.context_length), np.int32)
    for i, e in enumerate([9, 12, 10]):
        tokens[i, 0] = 49406
        tokens[i, 1:e] = rng.integers(1, 40000, e - 1)
        tokens[i, e] = 49407
    tokens = jnp.asarray(tokens)
    s = 12 - (1 + top_k * n_ctx) + 1

    kw = dict(top_k=top_k, n_ctx=n_ctx, compute_dtype=jnp.float32,
              suffix_len=s)
    w = jnp.asarray(rng.normal(size=(b, c, TINY.embed_dim)), jnp.float32)

    def loss(p):
        txt, _ = pc.proto_text_features(frozen, p, img, tokens, TINY, **kw)
        return jnp.sum(txt * w)

    ref_val, ref_grad = jax.value_and_grad(loss)(proto)

    monkeypatch.setattr(attn_mod, "default_impl", lambda: "pallas")
    # interpret-mode pallas carries an IO effect jax.checkpoint can't
    # partial-eval (real TPU lowering has no such effect) — skip remat
    monkeypatch.setenv("LLC_SUFFIX_REMAT", "none")
    with pltpu.force_tpu_interpret_mode():
        fused_val, fused_grad = jax.value_and_grad(loss)(proto)

    np.testing.assert_allclose(float(fused_val), float(ref_val),
                               atol=6e-3, rtol=6e-3)
    # absolute tolerance scaled to the grad magnitude (the kernel runs
    # bf16 internally vs the einsum body's f32; per-element relative
    # error blows up on near-zero entries — same policy as
    # test_fused_block.py's grad checks)
    gr = np.asarray(ref_grad["text_prompt"])
    gf = np.asarray(fused_grad["text_prompt"])
    np.testing.assert_allclose(gf, gr, atol=0.02 * np.abs(gr).max())
