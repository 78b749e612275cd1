"""Episodic replay memory for online continual learning.

Host-side index bookkeeping (O(memory_size) integers — the right place for
it; actual sample tensors are gathered on device at batch-build time).
Covers the reference's ``Memory`` (``utils/memory.py:8-100``): per-class
counts, CLIB loss-history EMA + class-balanced replacement, and the
reservoir policy the ER-family methods implement inline
(``methods/er_baseline.py:55-94``, ``methods/adapter_clip.py:210-247``).

Determinism: updates draw from a seeded ``numpy.random.Generator``. Under
multi-host SPMD every host runs the same seeded stream, so memories stay
identical without the reference's rank-0 broadcast + barrier dance
(``methods/adapter_clip.py:229-239``).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class ReplayMemory:
    """Reservoir / class-balanced episodic memory over dataset indices."""

    def __init__(self, memory_size: int, seed: int = 0):
        self.memory_size = memory_size
        self.rng = np.random.default_rng(seed)
        self.indices: List[int] = []     # dataset indices
        self.labels: List[int] = []      # class ids
        self.seen = 0
        # CLIB bookkeeping (reference utils/memory.py:29-75)
        self.loss_history: List[float] = []
        self.usage_count: List[int] = []

    def __len__(self) -> int:
        return len(self.indices)

    # -- reservoir policy (ER family) ---------------------------------------
    def reservoir_update(self, sample_idx: int, label: int) -> int:
        """Classic reservoir sampling; returns slot written or -1."""
        self.seen += 1
        if len(self.indices) < self.memory_size:
            self._append(sample_idx, label)
            return len(self.indices) - 1
        j = int(self.rng.integers(0, self.seen))
        if j < self.memory_size:
            self._replace(j, sample_idx, label)
            return j
        return -1

    # -- class-balanced random policy (Rainbow Memory, reference
    #    methods/rainbow_memory.py:91-108) ----------------------------------
    def balanced_random_update(self, sample_idx: int, label: int) -> int:
        self.seen += 1
        if len(self.indices) < self.memory_size:
            self._append(sample_idx, label)
            return len(self.indices) - 1
        labels = np.asarray(self.labels)
        counts = np.bincount(labels, minlength=max(labels.max(), label) + 1)
        heavy = int(counts.argmax())
        if counts[heavy] <= counts[label] and label != heavy:
            return -1  # incoming class already over-represented -> skip
        slots = np.nonzero(labels == heavy)[0]
        j = int(self.rng.choice(slots))
        self._replace(j, sample_idx, label)
        return j

    # -- CLIB: replace the sample whose removal hurts least (reference
    #    methods/clib.py:66-87) ---------------------------------------------
    def clib_update(self, sample_idx: int, label: int,
                    sample_loss: Optional[float] = None) -> int:
        self.seen += 1
        if len(self.indices) < self.memory_size:
            self._append(sample_idx, label, loss=sample_loss)
            return len(self.indices) - 1
        labels = np.asarray(self.labels)
        counts = np.bincount(labels, minlength=max(labels.max(), label) + 1)
        cls = int(counts.argmax())
        cand = np.nonzero(labels == cls)[0]
        losses = np.asarray(self.loss_history)[cand]
        j = int(cand[np.argmin(losses)])
        self._replace(j, sample_idx, label, loss=sample_loss)
        return j

    def update_loss_history(self, slots, losses, ema: float = 0.1):
        """EMA update of per-slot loss history (reference memory.py:64-75)."""
        for s, l in zip(np.atleast_1d(slots), np.atleast_1d(losses)):
            if 0 <= s < len(self.loss_history):
                self.loss_history[s] = ((1 - ema) * self.loss_history[s]
                                        + ema * float(l))

    # -- sampling -----------------------------------------------------------
    def sample(self, batch_size: int) -> np.ndarray:
        """Random replay batch of dataset indices (MemoryBatchSampler,
        reference utils/memory.py:115-128). Samples with replacement when
        memory is smaller than the batch."""
        if not self.indices:
            return np.empty((0,), np.int64)
        replace = len(self.indices) < batch_size
        pick = self.rng.choice(len(self.indices), size=batch_size,
                               replace=replace)
        return np.asarray(self.indices, np.int64)[pick]

    def class_balance_weights(self) -> np.ndarray:
        """Inverse-frequency weights per stored sample (memory.py:77-81)."""
        labels = np.asarray(self.labels)
        counts = np.bincount(labels)
        return 1.0 / counts[labels]

    def ordered_indices(self) -> np.ndarray:
        return np.asarray(self.indices, np.int64)

    # -- internals ----------------------------------------------------------
    def _append(self, sample_idx, label, loss=None):
        self.indices.append(int(sample_idx))
        self.labels.append(int(label))
        self.loss_history.append(float(loss) if loss is not None else 0.0)
        self.usage_count.append(0)

    def _replace(self, j, sample_idx, label, loss=None):
        self.indices[j] = int(sample_idx)
        self.labels[j] = int(label)
        self.loss_history[j] = float(loss) if loss is not None else 0.0
        self.usage_count[j] = 0

    # -- checkpoint state ----------------------------------------------------
    def state_dict(self):
        return {"memory_size": self.memory_size,
                "indices": list(self.indices),
                "labels": list(self.labels),
                "seen": self.seen,
                "loss_history": list(self.loss_history),
                "rng_state": self.rng.bit_generator.state}

    def load_state_dict(self, st):
        self.memory_size = st["memory_size"]
        self.indices = list(st["indices"])
        self.labels = list(st["labels"])
        self.seen = st["seen"]
        self.loss_history = list(st["loss_history"])
        self.usage_count = [0] * len(self.indices)
        self.rng.bit_generator.state = st["rng_state"]
