"""Device mesh construction and sharding rules.

The reference's distributed layer is a hand-rolled NCCL scaffold
(``methods/_trainer.py:110-112,451-574``: gather-with-padding, rank-0
reservoir broadcast, barriers) that in practice never initializes a process
group (SURVEY §2.6). The TPU-native replacement is SPMD: one jitted train
step over a ``jax.sharding.Mesh`` with axes

  * ``data``  — batch sharding (DP); gradient all-reduce becomes a
                compiler-inserted ``psum`` over ICI,
  * ``model`` — optional tensor parallelism for wide layers (attention
                heads / MLP hidden of the towers), replicated by default
                since ViT-B/16 fits comfortably per chip.

Replay/reservoir determinism comes from shared seeded RNG streams instead
of rank-0 broadcast (see utils/memory.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. shape=None -> all devices on data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_partition_spec(path: Tuple[str, ...], leaf) -> P:
    """Tensor-parallel layout for tower weights over the model axis.

    Rules (applied when mesh model axis > 1):
      * fused qkv (D, 3D) and MLP up-proj (D, 4D): shard output dim
        (= heads / hidden) -> P(None, None, 'model') incl. layer-stack dim
      * attention out (D, D) and MLP down-proj (4D, D): shard input dim
        -> P(None, 'model', None)
      * MoE expert leaves (layers, experts, ...): shard the EXPERT axis —
        expert parallelism; every device runs its local experts on the
        full sequence and the gated combine's contraction over the expert
        axis becomes a compiler-inserted psum over ICI (ops/moe.py
        computes all experts densely, so EP falls out of GSPMD with no
        dispatch/all-to-all code)
      * everything else replicated.
    """
    name = path[-1] if path else ""
    joined = "/".join(path)
    if "experts" in path:
        return P(None, MODEL_AXIS)   # trailing dims replicated
    if name in ("w_qkv", "w_fc") or joined.endswith("attn/w_qkv"):
        return P(None, None, MODEL_AXIS)
    if name in ("b_qkv", "b_fc"):
        return P(None, MODEL_AXIS)
    if name in ("w_out", "w_proj"):
        return P(None, MODEL_AXIS, None)
    return P()


def shard_params(params, mesh: Mesh, tensor_parallel: bool = False,
                 expert_parallel: bool = False):
    """Place a parameter pytree on the mesh (replicated, TP, and/or EP
    layout). ``expert_parallel`` shards MoE expert leaves; requires the
    expert count to divide the model axis size's quotient (E % model == 0).
    """
    def place(path, leaf):
        spec = P()
        if mesh.shape[MODEL_AXIS] > 1:
            keys = tuple(str(getattr(k, "key", k)) for k in path)
            is_expert = "experts" in keys
            if is_expert and expert_parallel:
                spec = param_partition_spec(keys, leaf)
            elif tensor_parallel and not is_expert:
                spec = param_partition_spec(keys, leaf)
                # only shard stacked block tensors (3D leaves)
                if spec != P() and leaf.ndim != 3 and leaf.ndim != 2:
                    spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_params_pp(params, mesh: Mesh, match=("vision", "blocks")):
    """Pipeline-parallel placement: layer-stacked leaves shard their
    leading (layer) dim over the model axis — each model-axis device
    becomes a pipeline stage holding L/S contiguous layers (see
    parallel/pipeline.py). Everything else replicates.

    ``match``: a leaf is stage-sharded when every name in ``match``
    appears on its path (and its leading dim divides the stage count).
    Default targets the frozen vision tower's block stack; pass
    ``match=()`` for a tree that is layer-stacked throughout (e.g. the
    vision LoRA subtree).
    """
    n_stages = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        keys = tuple(str(getattr(k, "key", k)) for k in path)
        stacked = all(m in keys for m in match)
        if n_stages > 1 and stacked and leaf.ndim >= 1 \
                and leaf.shape[0] % n_stages == 0:
            return jax.device_put(
                leaf, NamedSharding(mesh, P(MODEL_AXIS)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
