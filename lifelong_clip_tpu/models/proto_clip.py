"""ProtoCLIP (CUSTOM_CLIP) — prompt-pool CLIP with CoPL visual prompts.

Parity target: reference ``models/proto_clip.py`` + ``models/clip/zoo.py``:
  * learnable ``text_key`` (P, 512) / ``text_prompt`` (P, n_ctx, 512) pools
    (``proto_clip.py:58-63``), top-K selection by image-feature similarity
    (``forward():109-124``): selected ctx tokens are spliced into per-class
    prompt embeddings "x"*K·n_ctx + classname, and each (sample, class)
    pair runs the text tower (logits = scale · Σ img⊙txt_c);
  * CoPL visual prompt module (``zoo.py:82-148``): per-layer (0-6) pools of
    (prompt, key, attention) triplets; attention-weighted synthesis of
    (Ek, Ev) prefix tokens from a query feature; per-task pool slicing with
    frozen earlier slices; Gram-Schmidt re-orthogonalization at task
    switches (host-side, ``zoo.py:207-263``);
  * feature-level entry (``image_is_feature``) for the stage-2 classifier
    retrain (``forward():84-154``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPConfig
from . import clip as clip_fns
from .clip import causal_mask

_P = jax.lax.Precision.HIGHEST

COPL_LAYERS = (0, 1, 2, 3, 4, 5, 6)
COPL_POOL = 100
COPL_LEN = 8  # Ek 4 + Ev 4


def init_proto_params(rng, clip_cfg: CLIPConfig, *, num_prompt: int = 10,
                      n_ctx: int = 12, copl_pool: int = COPL_POOL,
                      copl_len: int = COPL_LEN):
    """text pools normal(0.02); CoPL pools orthonormalized at init
    (reference zoo.py:30-46 runs gram_schmidt on fresh pools)."""
    tw, vw = clip_cfg.text_width, clip_cfg.vision_width
    ks = jax.random.split(rng, 6)
    copl = {
        "p": jax.random.uniform(ks[0], (len(COPL_LAYERS), copl_pool,
                                        copl_len, vw), jnp.float32, -1, 1),
        "k": jax.random.uniform(ks[1], (len(COPL_LAYERS), copl_pool, vw),
                                jnp.float32, -1, 1),
        "a": jax.random.uniform(ks[2], (len(COPL_LAYERS), copl_pool, vw),
                                jnp.float32, -1, 1),
    }
    copl = jax.tree.map(lambda t: gram_schmidt(np.asarray(t)), copl)
    return {
        "text_key": 0.02 * jax.random.normal(ks[3], (num_prompt, tw),
                                             jnp.float32),
        "text_prompt": 0.02 * jax.random.normal(
            ks[4], (num_prompt, n_ctx, tw), jnp.float32),
        "copl": {k: jnp.asarray(v) for k, v in copl.items()},
    }


def gram_schmidt(t: np.ndarray) -> np.ndarray:
    """Orthonormalize pool vectors (host-side, rare — task boundaries only;
    reference zoo.py:207-263). Leading dims batch; last axis flattened."""
    shp = t.shape
    flat = t.reshape(shp[0], shp[1], -1) if t.ndim > 2 else t[None]
    out = np.zeros_like(flat)
    for l in range(flat.shape[0]):
        basis = []
        for i in range(flat.shape[1]):
            v = flat[l, i].astype(np.float64)
            for b in basis:
                v = v - np.dot(v, b) * b
            n = np.linalg.norm(v)
            if n > 1e-10:
                v = v / n
            else:
                v = np.random.default_rng(i).normal(size=v.shape)
                v /= np.linalg.norm(v)
            basis.append(v)
            out[l, i] = v
        # match input scale roughly (reference keeps unnormalized scale
        # via uniform init; orthonormal basis suffices functionally)
    return (out.reshape(shp) if t.ndim > 2 else out[0]).astype(np.float32)


def copl_prefixes(copl, query, layers: int, *, task_count: int,
                  n_tasks: int, train: bool, dtype):
    """Synthesize per-layer (Ek, Ev) prefix tokens from the query.

    Task slicing per reference zoo.py:95-110: train uses the current
    task's pool slice with earlier slices frozen (stop_gradient); eval
    uses all slices up to the current task.
    """
    pool = copl["k"].shape[1]
    pt = pool // max(n_tasks, 1)
    s, f = task_count * pt, (task_count + 1) * pt
    idx = jnp.arange(pool)
    if train:
        live = (idx >= s) & (idx < f)
        use = idx < f
    else:
        live = jnp.zeros((pool,), bool)
        use = idx < f

    # one vectorized synthesis over ALL prompt layers (the prompt-layer
    # axis rides the einsums): the per-layer python loop this replaces
    # emitted ~15 tiny kernels per layer and its backward ~3x that —
    # measured 4.9 ms fwd / 46 ms fwd+bwd of pure dispatch for ~0.1 GFLOP
    n_live = sum(1 for l in COPL_LAYERS if l < layers)
    assert tuple(COPL_LAYERS[:n_live]) == tuple(range(n_live)), \
        "vectorized synthesis assumes contiguous prompt layers from 0"

    def eff(p, extra_dims):
        m = live.reshape((1, -1) + (1,) * extra_dims)
        return jnp.where(m, p, jax.lax.stop_gradient(p))

    k_eff = eff(copl["k"][:n_live], 1)                   # (C, P, D)
    a_eff = eff(copl["a"][:n_live], 1)
    p_eff = eff(copl["p"][:n_live], 2)                   # (C, P, 2h, D)
    aq = query[None, :, None, :] * a_eff[:, None]        # (C, B, P, D)
    nk = k_eff / (jnp.linalg.norm(k_eff, axis=-1, keepdims=True) + 1e-8)
    nq = aq / (jnp.linalg.norm(aq, axis=-1, keepdims=True) + 1e-8)
    w = jnp.einsum("cbpd,cpd->cbp", nq, nk, precision=_P)
    w = jnp.where(use[None, None, :], w, 0.0)            # mask future
    pr = jnp.einsum("cbp,cpld->cbld", w, p_eff, precision=_P)
    half = pr.shape[2] // 2

    b = query.shape[0]
    d = copl["p"].shape[-1]
    pad = jnp.zeros((layers - n_live, b, half, d), dtype)
    ek = jnp.concatenate([pr[:, :, :half].astype(dtype), pad], axis=0)
    ev = jnp.concatenate([pr[:, :, half:].astype(dtype), pad], axis=0)
    valid = np.zeros((layers, half), bool)
    valid[:n_live] = True
    return {"k": ek, "v": ev}, jnp.asarray(valid)


def proto_encode_image(frozen, proto, images, cfg: CLIPConfig, *,
                       task_count: int, n_tasks: int, train: bool,
                       compute_dtype=jnp.bfloat16):
    """Image tower with CoPL prefix prompts; query from a frozen
    promptless pass (reference get_patch_feature + prompt_module fwd)."""
    from .mvp_clip import _vit_prelude
    x, v = _vit_prelude(frozen, images, cfg, compute_dtype)
    q = clip_fns.transformer(jax.lax.stop_gradient(x), v["blocks"],
                             cfg.vision_heads, base_grads=False)
    query = clip_fns.layer_norm(q[:, :1], v["ln_post"])[:, 0]
    query = jax.lax.stop_gradient(query).astype(jnp.float32)

    prompts, valid = copl_prefixes(proto["copl"], query, cfg.vision_layers,
                                   task_count=task_count, n_tasks=n_tasks,
                                   train=train, dtype=compute_dtype)
    h = clip_fns.transformer(x, v["blocks"], cfg.vision_heads,
                             layer_prompts=prompts,
                             layer_prompt_valid=valid, base_grads=False)
    pooled = clip_fns.layer_norm(h[:, :1], v["ln_post"])[:, 0]
    img = jnp.einsum("bd,de->be", pooled, v["proj"],
                     preferred_element_type=jnp.float32, precision=_P)
    return clip_fns.normalize(img.astype(compute_dtype))


def encode_text_embeddings(frozen, embeds, eot_pos, cfg: CLIPConfig,
                           compute_dtype=jnp.bfloat16):
    """Text tower over pre-built token embeddings (prompt splicing).

    Runs with per-layer rematerialization: the batch here is B·C
    (sample, class) pairs — at bs=64 × 64 visible classes that is 4096
    sequences of 77 tokens, whose saved backward intermediates alone
    exceed v5e HBM (measured: 68 GB requested). Remat trades ~1 extra
    forward for an O(depth) activation-memory cut and fits easily.
    """
    t = clip_fns._cast_tree(frozen["text"], compute_dtype)
    x = embeds.astype(compute_dtype) + t["pos_embed"].astype(compute_dtype)
    x = clip_fns.transformer(x, t["blocks"], cfg.text_heads,
                             mask=causal_mask(cfg.context_length),
                             remat=True, base_grads=False)
    x = clip_fns.layer_norm(x, t["ln_final"])
    pooled = jnp.take_along_axis(
        x, eot_pos[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    emb = jnp.einsum("bd,de->be", pooled, t["text_projection"],
                     preferred_element_type=jnp.float32, precision=_P)
    return emb.astype(compute_dtype)


def proto_text_features(frozen, proto, img_feats, class_tokens,
                        cfg: CLIPConfig, *, top_k: int, n_ctx: int,
                        suffix_len: int | None = None,
                        compute_dtype=jnp.bfloat16):
    """Per-(sample, class) text features with selected prompt ctx.

    class_tokens: (C, 77) of "x"*n_ctx·topK + classname prompts. Returns
    (B, C, E) normalized features. The reference loops B·C full text
    passes on GPU (``proto_clip.py:109-124``).

    ``suffix_len=None`` runs the direct equivalent: one batched pass over
    B·C spliced 77-token sequences.

    ``suffix_len=S`` (static, ≥ max EOT − prefix + 1 over the class table)
    enables **prefix sharing** — the big perf lever for this method. Under
    the causal mask, the ``[SOS] + ctx`` prefix (length 1 + topK·n_ctx) is
    identical across all C classes of a sample, and tokens after EOT never
    influence the pooled feature. So: run the prefix once per sample,
    collect each layer's block inputs, and run only the S-token class
    suffix per (sample, class) pair with those states injected as
    ln_1-processed KV prefixes. Mathematically exact (tested against the
    full pass, values and grads); token-positions drop from B·C·77 to
    B·Lp + B·C·S.
    """
    prob = jnp.einsum("be,pe->bp", img_feats.astype(jnp.float32),
                      proto["text_key"].astype(jnp.float32), precision=_P)
    k = min(top_k, prob.shape[1])
    _, indices = jax.lax.top_k(prob, k)                       # (B, k)
    sel = proto["text_prompt"][indices]                       # (B, k, n_ctx, D)
    b = img_feats.shape[0]
    ctx = sel.reshape(b, k * n_ctx, -1)
    txt = text_features_for_ctx(frozen, ctx, class_tokens, cfg,
                                suffix_len=suffix_len,
                                compute_dtype=compute_dtype)
    return txt, indices


def text_features_for_ctx(frozen, ctx, class_tokens, cfg: CLIPConfig, *,
                          suffix_len: int | None = None,
                          compute_dtype=jnp.bfloat16):
    """Normalized (B, C, E) text features for given spliced ctx tokens.

    ``ctx``: (B, lp-1, D) prompt token embeddings spliced after [SOS].
    The B axis can be samples (stage-1 training, top-k selected ctx) or
    PROMPT COMBINATIONS (the eval cache, see ``prompt_combinations``)."""
    b = ctx.shape[0]
    lp = 1 + ctx.shape[1]
    eot = jnp.argmax(class_tokens, axis=-1)                   # (C,)
    c = class_tokens.shape[0]

    if suffix_len is not None and lp + suffix_len < cfg.context_length:
        txt = _prefix_shared_text(frozen, ctx, class_tokens, eot, lp,
                                  int(suffix_len), cfg, compute_dtype)
        return clip_fns.normalize(txt)

    t = frozen["text"]
    embeds = t["token_embedding"][class_tokens]               # (C, 77, D)
    # splice ctx into positions 1..lp for every (sample, class)
    pair_embeds = jnp.broadcast_to(embeds[None], (b, c) + embeds.shape[1:])
    ctx_bc = jnp.broadcast_to(ctx[:, None], (b, c) + ctx.shape[1:])
    pair_embeds = jnp.concatenate(
        [pair_embeds[:, :, :1], ctx_bc.astype(pair_embeds.dtype),
         pair_embeds[:, :, lp:]], axis=2)
    eot_bc = jnp.broadcast_to(eot[None], (b, c)).reshape(b * c)
    txt = encode_text_embeddings(
        frozen, pair_embeds.reshape(b * c, *pair_embeds.shape[2:]),
        eot_bc, cfg, compute_dtype)
    return clip_fns.normalize(txt).reshape(b, c, -1)


def prompt_combinations(num_prompt: int, top_k: int, cap: int = 1024):
    """All ordered top-k prompt selections, or None when too many.

    ``jax.lax.top_k`` yields k DISTINCT pool indices in probability order,
    so a sample's spliced ctx is fully determined by one of
    P!/(P-k)! ordered tuples — 90 at the reference's (P=10, k=2). Eval
    text features therefore take at most that many distinct values per
    class: precompute them once per eval sweep and reduce the per-batch
    text cost to a gather (the reference re-runs B·C text passes per eval
    batch, ``models/proto_clip.py:109-124``).

    Returns (combos (n, k) int32, flat_lookup (P**k,) int32) where
    ``flat_lookup[fold(tuple)]`` = combo row (-1 for impossible tuples,
    e.g. repeated indices); fold = base-P positional encoding."""
    from itertools import permutations
    k = min(top_k, num_prompt)
    combos = list(permutations(range(num_prompt), k))
    if len(combos) > cap:
        return None, None
    lookup = np.full((num_prompt ** k,), -1, np.int32)
    for row, tup in enumerate(combos):
        flat = 0
        for v in tup:
            flat = flat * num_prompt + v
        lookup[flat] = row
    return np.asarray(combos, np.int32), lookup


def fold_selection(indices, num_prompt: int):
    """Base-P fold of (B, k) top-k index tuples -> (B,) flat ids matching
    ``prompt_combinations``'s lookup layout."""
    b, k = indices.shape
    flat = jnp.zeros((b,), jnp.int32)
    for m in range(k):
        flat = flat * num_prompt + indices[:, m].astype(jnp.int32)
    return flat


def _prefix_shared_text(frozen, ctx, class_tokens, eot, lp: int, s: int,
                        cfg: CLIPConfig, compute_dtype):
    """Prefix-shared per-(sample, class) text encoding (see caller doc).

    ``ctx``: (B, lp-1, D) selected prompt tokens. Returns UNnormalized
    (B, C, E) features.
    """
    t = clip_fns._cast_tree(frozen["text"], compute_dtype)
    emb_table = t["token_embedding"]
    pos = t["pos_embed"].astype(compute_dtype)
    b = ctx.shape[0]
    c = class_tokens.shape[0]
    d = emb_table.shape[-1]

    # SOS id is static: the BPE vocab appends <|startoftext|> then
    # <|endoftext|> (utils/tokenizer.py:88), so SOT = vocab_size - 2
    # (49406 for CLIP's 49408 vocab) — independent of the table layout
    sos_id = cfg.vocab_size - 2
    sos = jnp.broadcast_to(emb_table[sos_id][None, None], (b, 1, d))
    prefix = jnp.concatenate(
        [sos.astype(compute_dtype), ctx.astype(compute_dtype)],
        axis=1) + pos[:lp]
    # per-sample prefix pass, collecting each layer's block input — these
    # are exactly what the suffix pass needs as ln_1'd KV prefixes
    _, layer_states = clip_fns.transformer(
        prefix, t["blocks"], cfg.text_heads, mask=causal_mask(lp),
        collect_inputs=True, base_grads=False)                                  # (L, B, lp, D)

    suffix = emb_table[class_tokens[:, lp:lp + s]].astype(compute_dtype)
    suffix = suffix + pos[lp:lp + s]                          # (C, S, D)
    suf = jnp.broadcast_to(suffix[None], (b, c, s, d))

    # suffix tokens attend to the full prefix + causally among themselves.
    # The pass keeps the (B, C) pair structure explicit so the per-SAMPLE
    # prefix K/V projects once and broadcasts across all C classes inside
    # the attention einsums — no (L, B·C, lp, D) state materialization and
    # no per-pair prefix LN/projection work (both scale with C).
    x = _suffix_pass_grouped(t, suf, layer_states, cfg.text_heads,
                             act=cfg.act)
    x = clip_fns.layer_norm(x, t["ln_final"])
    eot_s = jnp.clip(eot - lp, 0, s - 1).astype(jnp.int32)    # (C,)
    pooled = jnp.take_along_axis(
        x, jnp.broadcast_to(eot_s[None, :, None, None], (b, c, 1, 1)),
        axis=2)[:, :, 0]                                      # (B, C, D)
    emb = jnp.einsum("bcd,de->bce", pooled, t["text_projection"],
                     preferred_element_type=jnp.float32, precision=_P)
    return emb.astype(compute_dtype)


def _suffix_pass_grouped(t, suf, layer_states, n_heads: int,
                         act: str = "quick_gelu"):
    """Transformer over class suffixes with per-sample prefix KV.

    ``suf``: (B, C, S, D) suffix token activations; ``layer_states``:
    (L, B, lp, D) collected block inputs of the per-sample prefix pass.
    Per layer, the prefix K/V is projected ONCE per sample from the
    ln_1'd state and enters the attention einsums with a free C axis —
    the broadcast never materializes. Suffix queries see [prefix | causal
    suffix]. Per-layer remat (B·C pairs would otherwise blow HBM).
    Numerically equivalent to running the generic KV-prefix transformer
    over B·C rows (tests/test_proto_clip.py pins values and grads against
    the full 77-token pass).
    """
    from .clip import _ACTS, layer_norm
    from ..ops.attention import default_impl

    b, c, s, d = suf.shape
    dh = d // n_heads
    scale = dh ** -0.5
    causal = causal_mask(s)                                    # (s, s)
    lp0 = layer_states.shape[2]
    # TPU path mask: all C suffixes of a sample run as ONE flat C·S-token
    # row. Class isolation is a block-diagonal causal mask — token (c, j)
    # sees the full prefix plus positions (c, ≤j) only.
    row_c = jnp.repeat(jnp.arange(c), s)
    row_j = jnp.tile(jnp.arange(s), c)
    suffix_cols = jnp.where(
        (row_c[:, None] == row_c[None, :]) &
        (row_j[None, :] <= row_j[:, None]), 0.0, -jnp.inf)     # (c·s, c·s)
    flat_mask = jnp.concatenate(
        [jnp.zeros((c * s, lp0), jnp.float32), suffix_cols], axis=1)
    # rows (= samples) per Pallas program: each row is a fat C·S-token
    # sequence, so few rows per program suffice (vs 64 when the pair
    # batch ran as B·C skinny S-token rows)
    fused_rows = int(os.environ.get("LLC_FUSED_ROWS_SUFFIX", "2"))

    def fused_body(h, xs):
        """TPU path: one flat (C·S)-token row PER SAMPLE through the
        row-batched fused prefix kernel. The per-sample prefix enters
        un-broadcast as pk=pv=ln_1(state) (B, lp, D): the kernel projects
        its K/V once per sample — the previous per-(sample, class) pair
        layout re-projected it C times (~half the pass FLOPs) and
        materialized a (B·C, lp, D) HBM broadcast (~200 MB/layer at the
        bench shapes, plus s→16 sublane padding on every matmul). The
        block-diagonal mask keeps the math identical to the einsum path
        below; dprefix flows straight back per sample, no broadcast-sum."""
        from ..ops.fused_block_attn import fused_prefix_attention_block
        blk, state = xs["blk"], xs["state"]
        pre = layer_norm(state, blk["ln_1"]).astype(h.dtype)   # (B, lp, D)
        hf = h.reshape(b, c * s, d)
        y = fused_prefix_attention_block(
            hf, pre, pre, blk["ln_1"]["scale"],
            blk["ln_1"]["bias"], blk["attn"]["w_qkv"],
            blk["attn"]["b_qkv"], blk["attn"]["w_out"],
            blk["attn"]["b_out"], n_heads, flat_mask, False,
            fused_rows, fused_rows)
        hn2 = layer_norm(y, blk["ln_2"])
        m = jax.lax.dot_general(
            hn2.reshape(b * c * s, d), blk["mlp"]["w_fc"],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_P) + blk["mlp"]["b_fc"]
        m = _ACTS[act](m.astype(h.dtype))
        m = jax.lax.dot_general(
            m, blk["mlp"]["w_proj"],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_P) + blk["mlp"]["b_proj"]
        out = y + m.astype(h.dtype).reshape(b, c * s, d)
        return out.reshape(b, c, s, d), None

    def body(h, xs):
        blk, state = xs["blk"], xs["state"]
        w_qkv, b_qkv = blk["attn"]["w_qkv"], blk["attn"]["b_qkv"]
        pre = layer_norm(state, blk["ln_1"])                   # (B, lp, D)
        kv_pre = jnp.einsum("bld,de->ble", pre, w_qkv[:, d:],
                            preferred_element_type=jnp.float32,
                            precision=_P) + b_qkv[d:]
        kv_pre = kv_pre.astype(pre.dtype)
        lp_ = kv_pre.shape[1]
        k_pre = kv_pre[..., :d].reshape(b, lp_, n_heads, dh)
        v_pre = kv_pre[..., d:].reshape(b, lp_, n_heads, dh)

        hn = layer_norm(h, blk["ln_1"])
        qkv = jnp.einsum("bcsd,de->bcse", hn, w_qkv,
                         preferred_element_type=jnp.float32,
                         precision=_P) + b_qkv
        qkv = qkv.astype(h.dtype)
        q = qkv[..., :d].reshape(b, c, s, n_heads, dh)
        k = qkv[..., d:2 * d].reshape(b, c, s, n_heads, dh)
        v = qkv[..., 2 * d:].reshape(b, c, s, n_heads, dh)
        sc_pre = jnp.einsum("bcshe,blhe->bchsl", q, k_pre,
                            preferred_element_type=jnp.float32,
                            precision=_P) * scale
        sc_suf = jnp.einsum("bcshe,bcthe->bchst", q, k,
                            preferred_element_type=jnp.float32,
                            precision=_P) * scale + causal
        probs = jax.nn.softmax(
            jnp.concatenate([sc_pre, sc_suf], axis=-1), axis=-1)
        p_pre = probs[..., :lp_].astype(v.dtype)
        p_suf = probs[..., lp_:].astype(v.dtype)
        ctx = (jnp.einsum("bchsl,blhe->bcshe", p_pre, v_pre,
                          preferred_element_type=jnp.float32,
                          precision=_P)
               + jnp.einsum("bchst,bcthe->bcshe", p_suf, v,
                            preferred_element_type=jnp.float32,
                            precision=_P))
        ctx = ctx.reshape(b, c, s, d).astype(h.dtype)
        out = jnp.einsum("bcsd,do->bcso", ctx, blk["attn"]["w_out"],
                         preferred_element_type=jnp.float32,
                         precision=_P) + blk["attn"]["b_out"]
        h = h + out.astype(h.dtype)

        h2 = layer_norm(h, blk["ln_2"])
        m = jnp.einsum("bcsd,de->bcse", h2, blk["mlp"]["w_fc"],
                       preferred_element_type=jnp.float32,
                       precision=_P) + blk["mlp"]["b_fc"]
        m = _ACTS[act](m.astype(h2.dtype))
        m = jnp.einsum("bcse,ed->bcsd", m, blk["mlp"]["w_proj"],
                       preferred_element_type=jnp.float32,
                       precision=_P) + blk["mlp"]["b_proj"]
        return h + m.astype(h.dtype), None

    layer_body = fused_body if default_impl() == "pallas" else body

    xs = {"blk": t["blocks"], "state": layer_states}
    # partial unroll (see clip._resolve_group): G layers per scan
    # iteration amortizes per-iteration scan overhead; the checkpoint
    # then spans G layers (recompute granularity = G, memory high-water
    # unchanged per iteration)
    from .clip import _resolve_group
    n_layers = layer_states.shape[0]
    g = _resolve_group(n_layers, None)
    if g > 1:
        xs = jax.tree.map(
            lambda a: a.reshape((n_layers // g, g) + a.shape[1:]), xs)

        def group_body(h, sl):
            for j in range(g):
                h, _ = layer_body(h, jax.tree.map(lambda a: a[j], sl))
            return h, None
    else:
        group_body = layer_body
    # remat policy for the suffix backward (env-tunable for ablation):
    #   full (default) — recompute the whole group (min memory, +1x fwd
    #        FLOPs in bwd); dots — save matmul outputs, recompute only
    #        elementwise; none — XLA autodiff saves everything
    policy = os.environ.get("LLC_SUFFIX_REMAT", "full")
    if policy == "none":
        wrapped = group_body
    elif policy == "dots":
        wrapped = jax.checkpoint(
            group_body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    else:
        wrapped = jax.checkpoint(group_body)
    h, _ = jax.lax.scan(wrapped, suf, xs)
    return h


def choose_suffix_len(max_token_pos: int, lp: int, context_length: int):
    """Static suffix length for prefix sharing, or None to disable.

    ``need`` = max EOT − lp + 1 tokens must fit ENTIRELY in the suffix
    window: a clamped window would pool a pre-EOT token for any class
    whose prompt fills the context — silently wrong features. The length
    buckets to 8 to limit recompiles as the vocabulary grows.
    """
    need = max_token_pos - lp + 1
    if need <= 0:
        return None
    cap = context_length - lp - 1
    s = min(max(-(-need // 8) * 8, 8), cap)
    return s if s >= need else None


def proto_logits(frozen, img_feats, txt_feats_bc):
    """logits = scale · Σ img⊙txt per class (reference forward:120-124)."""
    scale = jnp.exp(frozen["logit_scale"]).astype(jnp.float32)
    return scale * jnp.einsum("be,bce->bc",
                              img_feats.astype(jnp.float32),
                              txt_feats_bc.astype(jnp.float32),
                              precision=_P)
