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


def test_balanced_random_update_zero_slot_winner():
    """Crash-edge intent patch: when the +1 incoming class ties at 1,
    wins the earliest-exposed tie-break, and holds ZERO stored slots, the
    reference indexes an empty cand_idx and dies — the patched eviction
    restricts the argmax to classes that actually have a slot."""
    mem = ReplayMemory(2, seed=0)
    mem.balanced_random_update(0, 5, class_order=[3, 5, 7])
    mem.balanced_random_update(1, 7, class_order=[3, 5, 7])
    j = mem.balanced_random_update(2, 3, class_order=[3, 5, 7])
    assert j in (0, 1)
    assert 3 in mem.labels and len(mem) == 2


def test_clib_update_evicts_min_others_loss_decrease():
    """Eviction targets the heavy class (counting the incoming label) and
    within it the slot with the smallest others_loss_decrease score —
    reference clib.py:75-81."""
    mem = ReplayMemory(4, seed=0)
    for i in range(4):
        mem.clib_update(i, 0, class_order=[0])
    # scores start at the class mean (0); make slot 2 the least useful
    mem.others_loss_decrease = [0.5, 0.3, -0.2, 0.4]
    mem.clib_update(99, 1, class_order=[0, 1])
    assert 2 not in mem.indices        # slot with min score replaced
    assert 99 in mem.indices
    # reference memory.py:58-59: first-of-class seed = mean of ALL old
    # scores (incl. the replaced slot's)
    j = mem.indices.index(99)
    np.testing.assert_allclose(mem.others_loss_decrease[j], 0.25)


def test_clib_eviction_counts_incoming_label():
    """label_frequency[incoming] += 1 (reference clib.py:76) can flip the
    eviction class: memory holds 2+2, the incoming label breaks the tie
    toward its own class."""
    mem = ReplayMemory(4, seed=0)
    for i, lab in enumerate([0, 0, 1, 1]):
        mem.clib_update(i, lab, class_order=[0, 1])
    mem.others_loss_decrease = [0.0, 1.0, -1.0, 1.0]
    mem.clib_update(99, 1, class_order=[0, 1])
    # class 1 (2+1 incoming) outweighs class 0 (2): slot 2 evicted, NOT
    # the globally-min... slot 2 IS global min here; pin the class pick
    # with a case where class 0 holds the global min instead
    assert mem.indices == [0, 1, 99, 3]

    mem2 = ReplayMemory(4, seed=0)
    for i, lab in enumerate([0, 0, 1, 1]):
        mem2.clib_update(i, lab, class_order=[0, 1])
    mem2.others_loss_decrease = [-5.0, 1.0, 0.5, 1.0]
    mem2.clib_update(99, 1, class_order=[0, 1])
    # global min is slot 0 (class 0), but the incoming label tips the
    # frequency argmax to class 1 -> slot 2 evicted
    assert mem2.indices == [0, 1, 99, 3]


def test_clib_loss_update_attributes_to_used_slots():
    """others_loss_decrease moves only at marked slots, by
    (1-ema)*(loss_diff - mean(old[used])/n_used), with replaced slots
    masked out of loss_diff — reference memory.py:65-75."""
    mem = ReplayMemory(4, seed=0)
    for i in range(4):
        mem.clib_update(i, 0, class_order=[0])
    mem.others_loss_decrease = [0.1, 0.2, 0.3, 0.4]
    mem.mark_used([1, 3])
    prev = np.array([1.0, 1.0, 1.0, 1.0])
    cur = np.array([0.5, 9.0, 0.5, 0.5])   # slot 1 was replaced: masked
    mem.clib_loss_update(cur, prev, dropped_slots=[1], ema_ratio=0.9)
    loss_diff = np.mean([0.5 - 1.0, 0.5 - 1.0, 0.5 - 1.0])  # slots 0,2,3
    difference = loss_diff - np.mean([0.2, 0.4]) / 2
    exp = np.array([0.1, 0.2 - 0.1 * difference, 0.3,
                    0.4 - 0.1 * difference])
    np.testing.assert_allclose(mem.others_loss_decrease, exp, rtol=1e-12)
    assert mem.previous_slots == []        # cleared after attribution
    assert mem.loss_history == list(cur)   # raw sweep stored, no EMA

    # no marked slots (the shipped reference state): a no-op on scores
    before = list(mem.others_loss_decrease)
    mem.clib_loss_update(cur, prev, dropped_slots=[])
    assert mem.others_loss_decrease == before


def test_clib_loss_update_all_slots_replaced_no_nan():
    """When EVERY tracked slot was replaced since the last sweep
    (batchsize*imp_update_period > memory_size), the masked mean is over
    an empty slice — the reference EMAs the resulting NaN permanently
    into the eviction scores; the intent patch attributes 0 instead
    (ADVICE r3, utils/memory.py)."""
    mem = ReplayMemory(4, seed=0)
    for i in range(4):
        mem.clib_update(i, 0, class_order=[0])
    mem.others_loss_decrease = [0.1, 0.2, 0.3, 0.4]
    mem.mark_used([0, 1])
    prev = np.array([1.0, 1.0, 1.0, 1.0])
    cur = np.array([0.5, 0.5, 0.5, 0.5])
    mem.clib_loss_update(cur, prev, dropped_slots=[0, 1, 2, 3],
                         ema_ratio=0.9)
    assert np.isfinite(mem.others_loss_decrease).all()
    # loss_diff == 0: scores still re-center by -mean(old[used])/n_used
    difference = 0.0 - np.mean([0.1, 0.2]) / 2
    exp = np.array([0.1 - 0.1 * difference, 0.2 - 0.1 * difference,
                    0.3, 0.4])
    np.testing.assert_allclose(mem.others_loss_decrease, exp, rtol=1e-12)


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
