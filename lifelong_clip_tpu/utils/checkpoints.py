"""Training checkpoints: save/resume of the full online-CL state.

The reference has NO outbound training checkpoints — a crash loses the run
(SURVEY §5.3/§5.4; its only persistence is result artifacts). This module
is a deliberate capability add: it persists everything an online run needs
to resume mid-stream:

  * the jitted TrainState (trainable params, optimizer state, RNG, step)
  * replay-memory contents + RNG state (utils/memory.py state_dict)
  * exposed-class vocabulary (exposure order defines slot layout)
  * stream cursor (task id + batch offset) and metric accumulators

Uses orbax when available; falls back to a pickle+npz scheme so resume
works even without the optional dependency.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np

try:  # pragma: no cover - optional
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _tree_to_numpy(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_checkpoint(path: str,
                    *,
                    state,
                    memory=None,
                    vocab=None,
                    cursor: Dict[str, Any] = None,
                    metrics=None,
                    extra: Dict[str, Any] = None):
    """Persist the run. ``state`` is the TrainState pytree; host-side
    bookkeeping rides along in a pickle sidecar."""
    os.makedirs(path, exist_ok=True)
    host = {
        "memory": memory.state_dict() if memory is not None else None,
        "vocab": vocab.state_dict() if vocab is not None else None,
        "cursor": cursor or {},
        "extra": extra or {},
    }
    if metrics is not None:
        host["metrics"] = {
            "task_acc": list(metrics.task_acc),
            "task_cls_acc": [a.tolist() for a in metrics.task_cls_acc],
            "eval_points": [(e.step, e.accuracy,
                             e.per_class_correct.tolist(),
                             e.per_class_total.tolist())
                            for e in metrics.eval_points],
        }
    with open(os.path.join(path, "host_state.pkl"), "wb") as f:
        pickle.dump(host, f)

    tree = _tree_to_numpy(state)
    if _HAVE_ORBAX and jax.tree.leaves(tree):
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(os.path.abspath(path), "train_state"),
                   tree, force=True)
    else:
        with open(os.path.join(path, "train_state.pkl"), "wb") as f:
            pickle.dump(tree, f)


def load_checkpoint(path: str, *, state_like=None):
    """Returns (train_state_tree, host_dict). ``state_like`` restores the
    original pytree structure/dtypes when using orbax."""
    with open(os.path.join(path, "host_state.pkl"), "rb") as f:
        host = pickle.load(f)
    orbax_path = os.path.join(os.path.abspath(path), "train_state")
    pkl_path = os.path.join(path, "train_state.pkl")
    if _HAVE_ORBAX and os.path.exists(orbax_path):
        ckptr = ocp.PyTreeCheckpointer()
        if state_like is not None:
            tree = ckptr.restore(orbax_path,
                                 item=_tree_to_numpy(state_like))
        else:
            tree = ckptr.restore(orbax_path)
    else:
        with open(pkl_path, "rb") as f:
            tree = pickle.load(f)
    return tree, host


def restore_trainer(trainer, path: str):
    """Restore a trainer in place: state + memory + vocab + metrics +
    cursor. Returns the cursor dict for the run loop to resume from.
    Eval-only trainers (continual-clip) have no TrainState — only the
    host-side books are restored for them."""
    state_like = getattr(trainer, "state", None)
    tree, host = load_checkpoint(path, state_like=state_like)
    if state_like is not None:
        trainer.state = jax.tree.map(
            lambda like, a: jax.numpy.asarray(a), trainer.state, tree)
    if host.get("memory") and trainer.memory is not None:
        trainer.memory.load_state_dict(host["memory"])
    if host.get("vocab") and trainer.vocab is not None:
        trainer.vocab.load_state_dict(host["vocab"])
    m = host.get("metrics")
    if m:
        from .metrics import EvalPoint
        trainer.metrics.task_acc = list(m["task_acc"])
        trainer.metrics.task_cls_acc = [np.asarray(a)
                                        for a in m["task_cls_acc"]]
        trainer.metrics.eval_points = [
            EvalPoint(s, acc, np.asarray(c), np.asarray(t))
            for s, acc, c, t in m["eval_points"]]
    restore_extra = getattr(trainer, "restore_extra", None)
    if restore_extra is not None:
        restore_extra(host.get("extra") or {})
    return host.get("cursor", {})
