"""The jitted online-learning engine: one fused train step, one eval step.

This replaces the reference's Python hot loop (``online_step`` →
``online_train``, ``methods/adapter_clip.py:34-113``) — per-element label
remaps, per-step BPE tokenization, eager per-block attention, host-side
scheduler stepping — with a single compiled XLA program per step taking
``(state, batch)`` and returning ``(state, metrics)``. Augmentation runs
inside the step (ops/preprocess.py); collectives are compiler-inserted when
the batch is sharded over the mesh's data axis.

State is an explicit pytree (flax.struct), so checkpointing, donation, and
sharding all follow from standard JAX machinery.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import CLIPConfig, PEFTConfig
from ..models import clip as clip_fns
from ..ops import preprocess

log = logging.getLogger("lifelong_clip_tpu")


def remat_fallback(build: Callable[[bool], Callable]) -> Callable:
    """Wrap a train-step factory with an HBM-OOM remat fallback.

    ``build(remat: bool) -> step`` builds the jitted step. The non-remat
    step is built eagerly; if its FIRST invocation fails because the
    program does not fit HBM (XLA's compile-time ``Ran out of memory in
    memory space hbm`` — surfaced as RESOURCE_EXHAUSTED locally or as
    the remote-compile helper's INTERNAL error through the tunnel), the
    step is rebuilt once with the depth-scan remat enabled and the call
    retried. Compile-time failures raise before any execution, so
    donated state buffers are untouched and the retry is safe; the remat
    executable then serves the rest of the run.

    This is the model-size complement of the static ``batchsize >= 256``
    threshold: ViT-L/14 at bs=64 books ~16.2 G of HLO temp un-remat'd
    (bench_all repro, r3) — a shape heuristic would chase constants,
    the fallback reacts to the compiler's own verdict.
    """
    fn = build(False)
    fell_back = False
    ran_once = False

    def step(*args):
        nonlocal fn, fell_back, ran_once
        try:
            out = fn(*args)
            ran_once = True
            return out
        except jax.errors.JaxRuntimeError as e:
            msg = str(e)
            # match the compile-time buffer-assignment failure text
            # specifically ("Ran out of memory in memory space hbm"), not
            # generic runtime RESOURCE_EXHAUSTED allocation failures: a
            # runtime OOM can fire AFTER donation consumed the state
            # buffers, and retrying on deleted arrays would mask the real
            # error. Also never retry once any call has succeeded — the
            # program provably fits, so a later OOM is memory pressure,
            # not program size.
            oom = "Ran out of memory" in msg
            if fell_back or ran_once or not oom:
                raise
            log.warning("train step exceeds HBM un-remat'd; rebuilding "
                        "with remat (%s)", msg.splitlines()[0][:160])
            fn = build(True)
            fell_back = True
            return fn(*args)

    return step


def dp_shard_map(fn, dp_mesh, in_specs, out_specs):
    """shard_map wrapper for the pure-DP road shared by every method
    family: batch rows local per shard, params replicated, reductions
    (``pmean``/``psum``) done INSIDE ``fn`` by the caller.

    ``check_vma=False`` throughout: the Pallas custom calls declare no
    varying-mesh-axes info, so shard_map's VMA typer cannot see that the
    per-shard outputs are batch-local — the wrapper takes responsibility
    for the layout (pinned by tests/test_sharding.py in interpret mode).
    """
    return jax.shard_map(fn, mesh=dp_mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def dp_batch_specs(keys, sharded=("images", "labels")):
    """PartitionSpec dict for a step's batch: rows sharded over the data
    axis for per-sample tensors, everything else (class tables, masks,
    slot maps) replicated."""
    from jax.sharding import PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS
    return {k: P(DATA_AXIS) if k in sharded else P() for k in keys}


def dp_fold_rng(dp_axis, *rngs):
    """Per-shard RNG streams: the state rng is replicated across shards,
    so fold the shard index in or every shard would draw identical
    augmentation policies / gate noise for different samples."""
    if dp_axis is None:
        return rngs if len(rngs) != 1 else rngs[0]
    shard = jax.lax.axis_index(dp_axis)
    out = tuple(jax.random.fold_in(r, shard) for r in rngs)
    return out if len(out) != 1 else out[0]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    trainable: Any          # PEFT / prompt / head params (optimized)
    frozen: Any             # backbone params (never optimized)
    opt_state: Any
    rng: jnp.ndarray

    @classmethod
    def create(cls, *, trainable, frozen, tx, rng):
        return cls(step=jnp.zeros((), jnp.int32), trainable=trainable,
                   frozen=frozen, opt_state=tx.init(trainable), rng=rng)


def peft_forward(frozen, trainable, images, tokens, clip_cfg: CLIPConfig,
                 peft_cfg: PEFTConfig, compute_dtype, attn_impl: str,
                 moe_rng=None, remat: bool = False):
    """CLIP forward with PEFT trees routed to their towers."""
    logits, img_f, txt_f = clip_fns.clip_forward(
        frozen, images, tokens, clip_cfg, peft_cfg=peft_cfg,
        peft_vision=trainable.get("vision"),
        peft_text=trainable.get("text"),
        compute_dtype=compute_dtype, attn_impl=attn_impl,
        # tower weights live in `frozen`, which the train step never
        # differentiates — skip base-weight grad work in the fused bwd
        base_grads=False, moe_rng=moe_rng, remat=remat)
    return logits, img_f, txt_f


def peft_forward_cached_text(frozen, trainable, images, txt_features,
                             clip_cfg: CLIPConfig, peft_cfg: PEFTConfig,
                             compute_dtype, attn_impl: str, moe_rng=None,
                             remat: bool = False):
    """Image-only-PEFT forward against precomputed normalized text features.

    When the text tower carries no trainable parameters its per-class
    features are constant for a given class set — the reference still
    re-runs the text encoder every step (models/adapter_clip.py:102-104);
    caching them removes the whole text tower (fwd) from the hot loop.
    """
    img = clip_fns.encode_image(
        frozen, images, clip_cfg,
        peft_cfg=peft_cfg if peft_cfg.on_vision() else None,
        peft=trainable.get("vision"), compute_dtype=compute_dtype,
        attn_impl=attn_impl, base_grads=False, moe_rng=moe_rng,
        remat=remat)
    img = clip_fns.normalize(img)
    scale = jnp.exp(frozen["logit_scale"]).astype(jnp.float32)
    logits = scale * jnp.einsum("be,ce->bc", img.astype(jnp.float32),
                                txt_features.astype(jnp.float32),
                                precision=jax.lax.Precision.HIGHEST)
    return logits, img, txt_features


def ce_on_probs_loss(logits, labels):
    """CE applied to softmaxed probs — the reference adapter-clip family's
    shipped training math (models/adapter_clip.py:94-100 returns probs,
    methods/adapter_clip.py:89 applies CrossEntropyLoss on them). Padded
    (-inf-masked) class slots are excluded from BOTH softmaxes, matching
    the reference's exactly-K-class table."""
    probs = jax.nn.softmax(logits, axis=-1)      # -inf slots -> exactly 0
    z = jnp.where(jnp.isfinite(logits), probs, -jnp.inf)
    return optax.softmax_cross_entropy_with_integer_labels(
        z, labels).mean()


def make_train_step(clip_cfg: CLIPConfig,
                    peft_cfg: PEFTConfig,
                    tx: optax.GradientTransformation,
                    *,
                    image_size: int,
                    mean, std,
                    augment: bool = True,
                    use_autoaug: bool = False,
                    autoaug_policy: str = "imagenet",
                    use_cutmix: bool = False,
                    compute_dtype=jnp.bfloat16,
                    # default (None -> pallas on TPU) routes vanilla/LoRA
                    # blocks through the fully-fused LN+qkv+SDPA+out kernel
                    # with a recompute backward — measured 12% faster
                    # fwd+bwd than XLA autodiff at ViT-B/16 bs=64
                    attn_impl: Optional[str] = None,
                    forward_fn: Optional[Callable] = None,
                    loss_fn: Optional[Callable] = None,
                    cached_text: bool = False,
                    donate: bool = True,
                    # checkpoint the depth scan: the backward recomputes
                    # block intermediates instead of saving them. At
                    # bs>=128 XLA's saved MLP intermediates spill HBM
                    # (BASELINE.md scaling table) — remat is the fix; at
                    # bs=64 it only adds recompute. Callers enable it for
                    # large-batch steps (see AdapterCLIP.setup_model).
                    remat: bool = False,
                    # pure-DP mesh: run the step inside shard_map over the
                    # data axis (batch sharded, params replicated, grads
                    # pmean'd) instead of GSPMD jit. This keeps the fused
                    # Pallas kernels on multi-chip DP — GSPMD cannot
                    # partition an opaque custom call, but each shard_map
                    # shard runs the kernel on its local batch rows (the
                    # layout tests/test_sharding.py pins in interpret
                    # mode). Requires the model axis to be 1 and the step
                    # batch to divide the data-axis size.
                    dp_mesh=None):
    """Build the jitted online train step.

    batch dict:
      images  (B, H, W, C) uint8 raw samples
      labels  (B,) int32 — already remapped to class-table slots
      tokens  (K, ctx) int32 — padded class token table for this step,
              OR (with ``cached_text=True``) precomputed normalized text
              features (K, E) under the same key
      mask    (K,) f32 — 0 on valid class slots, -inf on padding
    """
    pipeline = preprocess.make_train_pipeline(
        image_size, mean, std, use_autoaug=use_autoaug,
        autoaug_policy=autoaug_policy,
        out_dtype=compute_dtype) if augment else None
    fwd = forward_fn or functools.partial(
        peft_forward_cached_text if cached_text else peft_forward,
        clip_cfg=clip_cfg, peft_cfg=peft_cfg,
        compute_dtype=compute_dtype, attn_impl=attn_impl, remat=remat)
    if forward_fn is not None and remat:
        # custom forwards don't thread the fine-grained depth-scan remat;
        # checkpoint the whole forward so the backward recomputes instead
        # of saving block intermediates (the bs>=128 HBM spill)
        fwd = jax.checkpoint(forward_fn)

    def default_loss(logits, labels):
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    compute_loss = loss_fn or default_loss

    # train-time MoE gate noise (reference noisy_top_k_gating,
    # models/clip/model.py:571-576) — a fresh key per step from the state
    # rng; eval paths never pass one, so they gate on clean logits
    moe_noise = peft_cfg is not None and peft_cfg.method == "moe" \
        and forward_fn is None

    dp_axis = None
    if dp_mesh is not None:
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
        if dp_mesh.shape.get(MODEL_AXIS, 1) != 1:
            raise ValueError("dp_mesh is the pure-DP shard_map path; "
                             f"model axis must be 1, got {dict(dp_mesh.shape)}")
        dp_axis = DATA_AXIS

    def step(state: TrainState, batch):
        rng, aug_rng, mix_rng, moe_rng = jax.random.split(state.rng, 4)
        if dp_axis is not None:
            # per-shard augmentation / mix / gate-noise streams: the state
            # rng is replicated across shards, so fold the shard index in
            # or every shard would draw identical policies for different
            # samples. (CutMix then mixes within each shard — statistically
            # equivalent; the carried `rng` stays replicated.)
            shard = jax.lax.axis_index(dp_axis)
            aug_rng = jax.random.fold_in(aug_rng, shard)
            mix_rng = jax.random.fold_in(mix_rng, shard)
            moe_rng = jax.random.fold_in(moe_rng, shard)
        if pipeline is not None:
            images = pipeline(aug_rng, batch["images"])
        else:
            images = batch["images"].astype(compute_dtype)

        n_cls = batch["tokens"].shape[0]
        y_soft = jax.nn.one_hot(batch["labels"], n_cls)
        if use_cutmix:
            # 50% of steps apply batch CutMix (reference
            # methods/er_baseline.py:132-147)
            k1, k2 = jax.random.split(mix_rng)
            mixed, y_mixed, _ = preprocess.cutmix(k2, images, y_soft)
            do = jax.random.bernoulli(k1)
            images = jnp.where(do, mixed, images)
            y_soft = jnp.where(do, y_mixed, y_soft)

        def objective(trainable):
            kw = {"moe_rng": moe_rng} if moe_noise else {}
            logits, img_f, txt_f = fwd(state.frozen, trainable, images,
                                       batch["tokens"], **kw)
            logits = logits + batch["mask"][None, :]
            if use_cutmix:
                # soft-label CE by hand: masked class slots carry
                # log_softmax = -inf, and optax's y·log_softmax would turn
                # the 0·(-inf) padding terms into NaN
                ls = jax.nn.log_softmax(logits, axis=-1)
                per = -jnp.sum(jnp.where(y_soft > 0, y_soft * ls, 0.0),
                               axis=-1)
                loss = jnp.mean(per)
            else:
                loss = compute_loss(logits, batch["labels"])
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == batch["labels"]).astype(
                    jnp.float32))
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(
            objective, has_aux=True)(state.trainable)
        if dp_axis is not None:
            # per-shard loss is the mean over the LOCAL rows; pmean over
            # equal shards = the global batch mean, so these grads equal
            # the unsharded step's (the DP all-reduce GSPMD would insert)
            loss, acc, grads = jax.lax.pmean((loss, acc, grads), dp_axis)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = state.replace(step=state.step + 1, trainable=trainable,
                                  opt_state=opt_state, rng=rng)
        return new_state, {"loss": loss, "acc": acc}

    if dp_mesh is not None:
        from jax.sharding import PartitionSpec as P
        # state/tokens/mask replicated, batch rows sharded; outputs are
        # replicated by construction (pmean'd grads -> identical update on
        # every shard). check_vma=False: the Pallas custom calls declare no
        # varying-mesh-axes info, so shard_map's VMA typer can't see that
        # the per-shard outputs are batch-local — this wrapper takes
        # responsibility for the layout.
        batch_specs = {"images": P(dp_axis), "labels": P(dp_axis),
                       "tokens": P(), "mask": P()}
        step = jax.shard_map(step, mesh=dp_mesh,
                             in_specs=(P(), batch_specs),
                             out_specs=(P(), P()), check_vma=False)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_text_feature_fn(clip_cfg: CLIPConfig,
                         peft_cfg: PEFTConfig,
                         *,
                         compute_dtype=jnp.bfloat16,
                         attn_impl: Optional[str] = None):
    """Jitted class-token-table -> normalized text features.

    Run once per exposed-class change at eval time (the reference re-runs
    the text encoder on every train/eval step even for an unchanged class
    set — this cache is one of the big structural wins)."""

    @jax.jit
    def text_features(frozen, trainable, tokens):
        txt = clip_fns.encode_text(
            frozen, tokens, clip_cfg,
            peft_cfg=peft_cfg if peft_cfg.on_text() else None,
            peft=(trainable or {}).get("text"),
            compute_dtype=compute_dtype, attn_impl=attn_impl)
        return clip_fns.normalize(txt)

    return text_features


def make_eval_step(clip_cfg: CLIPConfig,
                   peft_cfg: PEFTConfig,
                   *,
                   image_size: int,
                   mean, std,
                   compute_dtype=jnp.bfloat16,
                   attn_impl: Optional[str] = None,
                   # pure-DP mesh: run the eval batch inside shard_map
                   # over the data axis — each shard scores its local
                   # rows with the fused Pallas kernels. Without this a
                   # meshed eval replicates the FULL batch on every chip
                   # (GSPMD cannot partition the kernel custom call).
                   # Requires the eval batch to divide the data axis.
                   dp_mesh=None):
    """Jitted eval step: images + cached text features -> (preds, logits).

    Mirrors reference ``online_evaluate`` (methods/adapter_clip.py:132-176)
    but against precomputed text features and with -inf masking of
    unexposed class slots.
    """

    def eval_step(frozen, trainable, images_u8, txt_features, mask):
        x = images_u8.astype(jnp.float32) / 255.0
        x = preprocess.resize_bilinear(x, image_size)
        x = preprocess.normalize(x, mean, std).astype(compute_dtype)
        img = clip_fns.encode_image(
            frozen, x, clip_cfg,
            peft_cfg=peft_cfg if peft_cfg.on_vision() else None,
            peft=(trainable or {}).get("vision"),
            compute_dtype=compute_dtype, attn_impl=attn_impl)
        img = clip_fns.normalize(img)
        scale = jnp.exp(frozen["logit_scale"]).astype(jnp.float32)
        logits = scale * jnp.einsum(
            "be,ce->bc", img.astype(jnp.float32),
            txt_features.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST)
        logits = logits + mask[None, :]
        return jnp.argmax(logits, axis=-1), logits

    if dp_mesh is not None:
        from jax.sharding import PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS
        eval_step = jax.shard_map(
            eval_step, mesh=dp_mesh,
            in_specs=(P(), P(), P(DATA_AXIS), P(), P()),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)), check_vma=False)
    return jax.jit(eval_step)
