"""GPipe-style pipeline parallelism over the transformer depth axis.

The reference implements data parallelism only (SURVEY §2.6; its NCCL
scaffold at ``methods/_trainer.py:110-112,451-574`` never even initializes
a process group). Pipeline parallelism is a capability add for towers too
deep/large for one chip (ViT-L/14-class and beyond at large batch):

  * the layer-stacked block parameters (leading dim = n_layers, the same
    layout ``lax.scan`` consumes in models/clip.py) shard over the mesh
    ``model`` axis — S stages hold L/S contiguous layers each;
  * activations flow stage-to-stage over ICI via ``lax.ppermute``;
  * the per-device batch splits into M microbatches to fill the pipeline
    (bubble fraction (S-1)/(M+S-1));
  * everything sits inside one ``jax.shard_map`` over the (data, model)
    mesh, so each model-axis group pipelines its own data shard — DP and
    PP compose with no extra code.

Autodiff gives the reverse schedule for free: ``ppermute``'s transpose is
the inverse permutation and the tick loop is a ``lax.scan``, so one
``jax.grad`` of the shard_mapped forward runs the standard backward
pipeline. Bubble ticks process garbage that never reaches an output, so
their cotangents are exactly zero — gradients are numerically equivalent
to the unpipelined sums up to reduction order (the psum epilogue and the
microbatch split can legitimately reorder the adds; equivalence-tested at
tight tolerances in tests/test_pipeline.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import CLIPConfig, PEFTConfig
from .mesh import DATA_AXIS, MODEL_AXIS


def _local_stack(h, blocks_local, peft_local, n_heads, mask, peft_cfg,
                 attn_impl, act, base_grads):
    """Scan this stage's local layers (models/clip.py:_block body)."""
    from ..models.clip import _block

    xs = {"blk": blocks_local}
    if peft_local is not None:
        xs["peft"] = peft_local

    def body(carry, sl):
        out = _block(carry, sl["blk"], n_heads, mask, peft_cfg,
                     sl.get("peft"), None, attn_impl, act,
                     base_grads=base_grads)
        return out, None

    h, _ = lax.scan(body, h, xs)
    return h


def pipelined_transformer(x,
                          blocks,
                          n_heads: int,
                          *,
                          mesh: Mesh,
                          n_microbatches: int,
                          mask=None,
                          peft_cfg: Optional[PEFTConfig] = None,
                          peft=None,
                          layer_prompts=None,
                          layer_prompt_valid=None,
                          attn_impl: Optional[str] = None,
                          act: str = "quick_gelu",
                          prompt_ln: bool = False,
                          remat: bool = False,
                          base_grads: bool = True):
    """Depth-pipelined drop-in for models/clip.py:transformer.

    ``x`` is the (B, T, D) activation with batch sharded over the mesh
    ``data`` axis; ``blocks``/``peft`` are layer-stacked pytrees sharded
    over ``model`` on their leading (layer) dim (see
    mesh.pp_param_spec/shard_params_pp). The per-device batch must be
    divisible by ``n_microbatches``.

    Prompt pools are out of scope for the pipelined path (the prompt
    methods run towers that fit one chip); pass layer_prompts=None.
    """
    assert layer_prompts is None and layer_prompt_valid is None, \
        "pipelined_transformer does not take per-layer prompts"
    del prompt_ln
    n_stages = mesh.shape[MODEL_AXIS]
    if n_stages == 1:
        from ..models.clip import transformer
        return transformer(x, blocks, n_heads, mask=mask, peft_cfg=peft_cfg,
                           peft=peft, attn_impl=attn_impl, act=act,
                           remat=remat, base_grads=base_grads)

    m = int(n_microbatches)
    run = functools.partial(_local_stack, n_heads=n_heads, mask=mask,
                            peft_cfg=peft_cfg, attn_impl=attn_impl, act=act,
                            base_grads=base_grads)
    if remat:
        run = jax.checkpoint(run)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def local(x_l, blocks_l, peft_l):
        if not peft_l:  # {} placeholder when no PEFT tree rides the mesh
            peft_l = None
        s = lax.axis_index(MODEL_AXIS)
        b = x_l.shape[0]
        assert b % m == 0, (
            f"per-device batch {b} not divisible by {m} microbatches")
        mb = x_l.reshape(m, b // m, *x_l.shape[1:])

        # the carried activations become device-varying over 'model' after
        # the first ppermute — mark the zero-init the same way so the scan
        # carry type is stable (shard_map VMA rules)
        carry = lax.pcast(jnp.zeros_like(mb[0]), ("model",), to="varying")
        outputs = lax.pcast(jnp.zeros_like(mb), ("model",), to="varying")

        def tick(state, t):
            carry, outputs = state
            # stage 0 ingests microbatch t; later stages consume the
            # activation handed over by the previous stage last tick
            inp = jnp.where(s == 0, mb[jnp.clip(t, 0, m - 1)], carry)
            out = run(inp, blocks_l, peft_l)
            # the last stage owns microbatch t-(S-1)'s final activation
            widx = t - (n_stages - 1)
            upd = lax.dynamic_update_index_in_dim(
                outputs, out, jnp.clip(widx, 0, m - 1), 0)
            outputs = jnp.where((s == n_stages - 1) & (widx >= 0),
                                upd, outputs)
            carry = lax.ppermute(out, MODEL_AXIS, perm)
            return (carry, outputs), None

        (carry, outputs), _ = lax.scan(
            tick, (carry, outputs), jnp.arange(m + n_stages - 1))
        # hand the finished activations back to every stage so the
        # (replicated) pool/projection/loss epilogue stays plain SPMD
        outputs = lax.psum(
            jnp.where(s == n_stages - 1, outputs, jnp.zeros_like(outputs)),
            MODEL_AXIS)
        return outputs.reshape(x_l.shape)

    peft_arg = peft if peft is not None else {}
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(MODEL_AXIS), P(MODEL_AXIS)),
        out_specs=P(DATA_AXIS))
    return fn(x, blocks, peft_arg)


def make_pp_forward(clip_cfg: CLIPConfig,
                    peft_cfg: PEFTConfig,
                    mesh: Mesh,
                    n_microbatches: int,
                    *,
                    compute_dtype=jnp.bfloat16,
                    attn_impl: Optional[str] = None):
    """``forward_fn`` for engine.make_train_step with a pipelined vision
    tower: vision blocks (and any vision PEFT stack) shard over the mesh
    ``model`` axis as pipeline stages; the small text tower runs replicated.
    """
    from ..models import clip as clip_fns

    depth_runner = functools.partial(
        pipelined_transformer, mesh=mesh, n_microbatches=n_microbatches)

    def fwd(frozen, trainable, images, tokens):
        img = clip_fns.encode_image(
            frozen, images, clip_cfg,
            peft_cfg=peft_cfg if peft_cfg.on_vision() else None,
            peft=trainable.get("vision"), compute_dtype=compute_dtype,
            attn_impl=attn_impl, base_grads=False,
            depth_runner=depth_runner)
        img = clip_fns.normalize(img)
        txt = clip_fns.encode_text(
            frozen, tokens, clip_cfg,
            peft_cfg=peft_cfg if peft_cfg.on_text() else None,
            peft=trainable.get("text"), compute_dtype=compute_dtype,
            attn_impl=attn_impl, base_grads=False)
        txt = clip_fns.normalize(txt)
        scale = jnp.exp(frozen["logit_scale"]).astype(jnp.float32)
        logits = scale * jnp.einsum("be,ce->bc", img.astype(jnp.float32),
                                    txt.astype(jnp.float32),
                                    precision=jax.lax.Precision.HIGHEST)
        return logits, img, txt

    return fwd
