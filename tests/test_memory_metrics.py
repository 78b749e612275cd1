"""Replay memory + metrics unit tests."""

import numpy as np

from lifelong_clip_tpu.utils.memory import ReplayMemory
from lifelong_clip_tpu.utils.metrics import (OnlineMetrics,
                                             per_class_counts,
                                             topk_accuracy)
from lifelong_clip_tpu.utils.class_vocab import ClassVocabulary


def test_reservoir_fills_then_replaces():
    mem = ReplayMemory(10, seed=0)
    for i in range(10):
        assert mem.reservoir_update(i, i % 3) == i
    assert len(mem) == 10
    slots = [mem.reservoir_update(100 + i, 0) for i in range(200)]
    assert any(s >= 0 for s in slots) and any(s == -1 for s in slots)
    assert len(mem) == 10
    assert mem.seen == 210


def test_reservoir_uniformity():
    """Each of N seen samples should remain with prob ~size/N."""
    hits = 0
    trials, size, total = 200, 20, 100
    for t in range(trials):
        mem = ReplayMemory(size, seed=t)
        for i in range(total):
            mem.reservoir_update(i, 0)
        hits += sum(1 for i in mem.indices if i < size)
    mean_kept = hits / trials
    assert abs(mean_kept - size * size / total) < 2.0


def test_balanced_random_update_targets_heavy_class():
    mem = ReplayMemory(6, seed=0)
    for i in range(6):
        mem.balanced_random_update(i, 0 if i < 5 else 1)
    mem.balanced_random_update(100, 2)
    labels = np.asarray(mem.labels)
    assert (labels == 0).sum() == 4  # heavy class lost a slot
    assert 2 in labels


def test_clib_update_replaces_min_loss():
    mem = ReplayMemory(4, seed=0)
    for i, l in enumerate([0.9, 0.1, 0.5, 0.7]):
        mem.clib_update(i, 0, sample_loss=l)
    mem.clib_update(99, 1, sample_loss=1.0)
    assert 1 not in mem.indices  # slot of min-loss (idx 1) replaced
    assert 99 in mem.indices


def test_memory_sample_and_state_roundtrip():
    mem = ReplayMemory(8, seed=1)
    for i in range(20):
        mem.reservoir_update(i, i % 4)
    batch = mem.sample(4)
    assert batch.shape == (4,)
    st = mem.state_dict()
    mem2 = ReplayMemory(8, seed=99)
    mem2.load_state_dict(st)
    assert mem2.indices == mem.indices
    np.testing.assert_array_equal(mem2.sample(4), mem.sample(4))


def test_metrics_headline():
    m = OnlineMetrics(4)
    c = np.array([5, 5, 0, 0])
    t = np.array([10, 10, 0, 0])
    m.record_eval(100, c, t)
    m.record_eval(200, np.array([10, 10, 0, 0]), t)
    m.record_task_end(np.array([8, 8, 0, 0]), t)
    m.record_task_end(np.array([4, 8, 8, 0]),
                      np.array([10, 10, 10, 0]))
    s = m.summary()
    assert abs(s["A_auc"] - 0.75) < 1e-9
    assert abs(s["A_last"] - (20 / 30)) < 1e-9
    assert abs(s["A_avg"] - np.mean([0.8, 20 / 30])) < 1e-9
    assert s["F_last"] > 0  # class 0 dropped 0.8 -> 0.4


def test_per_class_counts():
    preds = np.array([0, 1, 1, 2])
    labels = np.array([0, 1, 2, 2])
    c, t = per_class_counts(preds, labels, 4)
    np.testing.assert_array_equal(c, [1, 1, 1, 0])
    np.testing.assert_array_equal(t, [1, 1, 2, 0])


def test_topk_accuracy():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = np.array([1, 2])
    assert topk_accuracy(logits, labels, 1) == 0.5
    assert topk_accuracy(logits, labels, 3) == 1.0


def test_class_vocab_exposure_and_remap():
    v = ClassVocabulary(["cat", "dog", "fish", "bird"], max_classes=4)
    assert v.expose([2, 0])   # new classes
    assert not v.expose([2])  # already seen
    assert v.exposed == [2, 0]
    np.testing.assert_array_equal(v.remap([0, 2, 2]), [1, 0, 0])
    mask = v.logit_mask()
    assert np.isfinite(mask[:2]).all() and np.isinf(mask[2:]).all()
    # batch-visible table
    tokens, m, y, gids = v.batch_table([0, 0, 2], capacity=3)
    assert tokens.shape == (3, 77)
    np.testing.assert_array_equal(y, [1, 1, 0])
    assert np.isfinite(m[:2]).all() and np.isinf(m[2]).all()
    # token rows are the exposed-class rows
    np.testing.assert_array_equal(tokens[0], v.token_table[0])


def test_class_vocab_state_roundtrip():
    v = ClassVocabulary([f"c{i}" for i in range(6)], max_classes=6)
    v.expose([3, 1, 5])
    st = v.state_dict()
    v2 = ClassVocabulary([f"c{i}" for i in range(6)], max_classes=6)
    v2.load_state_dict(st)
    assert v2.exposed == [3, 1, 5]
    np.testing.assert_array_equal(v2.token_table, v.token_table)


def test_confusion_matrix_matches_sklearn():
    """The cm artifact must use sklearn's layout (rows=true, cols=pred over
    sorted observed classes) — the reference saves sklearn's output
    (adapter_clip.py:167, _trainer.py:363-365)."""
    import numpy as np
    from lifelong_clip_tpu.utils.metrics import confusion_matrix
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 7, 200)
    preds = rng.integers(0, 9, 200)  # predictions include unseen classes
    got = confusion_matrix(labels, preds)
    try:
        from sklearn.metrics import confusion_matrix as sk_cm
    except ImportError:
        assert got.sum() == 200
        return
    np.testing.assert_array_equal(got, sk_cm(labels, preds))
