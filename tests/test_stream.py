"""Si-Blurry stream tests: protocol invariants + parity vs the reference
sampler (when the read-only reference tree is importable)."""

import os
import sys

import numpy as np
import pytest

from lifelong_clip_tpu.utils.stream import (iter_batches, si_blurry_stream,
                                            exposed_test_indices)

REFERENCE = "/root/reference"


def _fake_targets(n_classes=10, per_class=20, seed=0):
    rng = np.random.default_rng(seed)
    t = np.repeat(np.arange(n_classes), per_class)
    return rng.permutation(t)


def test_partition_is_exact():
    targets = _fake_targets()
    st = si_blurry_stream(targets, 10, n_tasks=5, n=50, m=10, rnd_seed=1)
    all_idx = np.concatenate(st.task_indices)
    assert len(all_idx) == len(targets)
    assert len(np.unique(all_idx)) == len(targets)  # every sample once


def test_disjoint_classes_stay_disjoint():
    targets = _fake_targets()
    st = si_blurry_stream(targets, 10, n_tasks=5, n=50, m=10, rnd_seed=1)
    disjoint = set()
    for cs in st.disjoint_classes:
        for c in cs:
            disjoint.add(c)
    for t, idx in enumerate(st.task_indices):
        task_disjoint = set(st.disjoint_classes[t])
        for i in idx:
            y = targets[i]
            if y in disjoint:
                assert y in task_disjoint  # never leaks across tasks


def test_blurry_fraction_moves():
    targets = _fake_targets(n_classes=10, per_class=100)
    st0 = si_blurry_stream(targets, 10, n_tasks=5, n=50, m=0, rnd_seed=1)
    st50 = si_blurry_stream(targets, 10, n_tasks=5, n=50, m=50, rnd_seed=1)
    # with m=0, blurry classes stay in their home task
    for t, idx in enumerate(st0.task_indices):
        home = set(st0.disjoint_classes[t]) | set(st0.blurry_classes[t])
        assert all(targets[i] in home for i in idx)
    # with m=50, foreign blurry samples appear in each task
    leaked = 0
    for t, idx in enumerate(st50.task_indices):
        home = set(st50.disjoint_classes[t]) | set(st50.blurry_classes[t])
        leaked += sum(1 for i in idx if targets[i] not in home)
    assert leaked > 0


def test_deterministic_by_seed():
    targets = _fake_targets()
    a = si_blurry_stream(targets, 10, 5, 50, 10, rnd_seed=7)
    b = si_blurry_stream(targets, 10, 5, 50, 10, rnd_seed=7)
    c = si_blurry_stream(targets, 10, 5, 50, 10, rnd_seed=8)
    for x, y in zip(a.task_indices, b.task_indices):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, y)
               for x, y in zip(a.task_indices, c.task_indices))


def test_varing_nm_runs():
    targets = _fake_targets(n_classes=20, per_class=10)
    st = si_blurry_stream(targets, 20, 5, 50, 10, rnd_seed=3,
                          varing_NM=True)
    all_idx = np.concatenate([x for x in st.task_indices if len(x)])
    assert len(np.unique(all_idx)) == len(all_idx)
    assert len(all_idx) == len(targets)


def test_iter_batches():
    batches = list(iter_batches(np.arange(10), 4))
    assert [len(b) for b in batches] == [4, 4, 2]
    batches = list(iter_batches(np.arange(10), 4, drop_last=True))
    assert [len(b) for b in batches] == [4, 4]


def test_test_indices_filter():
    targets = np.array([0, 1, 2, 3, 0, 1])
    idx = exposed_test_indices(targets, [0, 2])
    np.testing.assert_array_equal(idx, [0, 2, 4])


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree unavailable")
@pytest.mark.parametrize("varing", [False, True])
def test_parity_with_reference_sampler(varing):
    """Exact stream parity with the reference OnlineSampler for fixed seeds."""
    sys.path.insert(0, REFERENCE)
    try:
        from utils.online_sampler import OnlineSampler
    except Exception:
        pytest.skip("reference sampler not importable")
    finally:
        sys.path.pop(0)

    n_classes, per_class, n_tasks, n, m, seed = 10, 30, 5, 50, 10, 4
    targets = _fake_targets(n_classes, per_class, seed=2)

    class FakeDS:
        classes = list(range(n_classes))
        classes_names = [f"c{i}" for i in range(n_classes)]

        def __len__(self):
            return len(targets)

    ds = FakeDS()
    ds.targets = targets.tolist()
    ref = OnlineSampler(ds, n_tasks, m, n, seed, varing_NM=varing)
    ours = si_blurry_stream(targets, n_classes, n_tasks, n, m, seed,
                            varing_NM=varing)
    for t in range(n_tasks):
        ref.set_task(t)
        np.testing.assert_array_equal(np.asarray(list(iter(ref))),
                                      ours.task_indices[t],
                                      err_msg=f"task {t} stream differs")
