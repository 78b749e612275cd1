"""CLIB machinery parity against the reference's ACTUAL code.

Drives the reference's ``utils/memory.py:Memory`` (real class) plus the
AST-extracted ``CLIB.update_memory`` / ``CLIB.adaptive_lr`` method bodies
from ``methods/clib.py`` — the eviction policy, the others_loss_decrease
attribution, and the adaptive-LR state machine — against this repo's
``ReplayMemory.clib_update/mark_used/clib_loss_update`` and
``CLIB._adaptive_lr`` on identical synthetic insert/sweep sequences, and
asserts identical memory contents, scores, and LR traces.

Two shipped reference defects are intent-patched in-harness, exactly as
production documents them (``ReplayMemory.clib_update`` docstring +
PARITY.md):
  * ``Memory.add_new_class`` is ``pass`` while ``replace_data`` indexes
    ``cls_list``/``cls_count`` — the first insertion crashes on a
    zero-element tensor truth test. The intended growth is spelled out in
    the commented lines memory.py:25-27; the patch enacts them.
  * ``Memory.previous_idx`` is never populated (the CLIB-lineage sampler
    that recorded trained-on slots was lost in vendoring), leaving
    ``update_loss_history`` a no-op; the harness records used slots the
    way production's ``mark_used`` does.
AST extraction (pattern from test_reference_parity.py) is used because
importing ``methods.clib`` drags in the reference's dataset/torchvision
stack; the extracted code is bound to a shell object carrying exactly the
attributes those methods touch.
"""

import ast
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"

from lifelong_clip_tpu.utils.memory import ReplayMemory  # noqa: E402


def _extract_methods(*names, patches=()):
    src = open(f"{REFERENCE}/methods/clib.py").read()
    tree = ast.parse(src)
    cls = next(n for n in tree.body
               if isinstance(n, ast.ClassDef) and n.name == "CLIB")
    out = {}
    for name in names:
        # later duplicate definitions override earlier ones (the
        # reference defines samplewise_loss_update twice)
        fns = [n for n in cls.body
               if isinstance(n, ast.FunctionDef) and n.name == name]
        fn_src = ast.get_source_segment(src, fns[-1])
        fn_src = "\n".join(l[4:] if l.startswith("    ") else l
                           for l in fn_src.splitlines())
        for old, new in patches:
            fn_src = fn_src.replace(old, new)
        ns = {"torch": torch, "copy": __import__("copy"), "np": np}
        from scipy.stats import ttest_ind
        ns["ttest_ind"] = ttest_ind
        exec(compile(fn_src, "<ref-clib>", "exec"), ns)
        out[name] = ns[name]
    return out


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REFERENCE)
    try:
        import utils.memory as ref_mem_mod
    except Exception:
        pytest.skip("reference tree unavailable")
    finally:
        sys.path.pop(0)

    class RefMemory(ref_mem_mod.Memory):
        # intent patch: the commented-out growth at memory.py:25-27
        def add_new_class(self, cls_list):
            self.cls_list = torch.tensor(cls_list)
            self.cls_count = torch.cat(
                [self.cls_count,
                 torch.zeros(len(self.cls_list) - len(self.cls_count))])
            self.cls_train_cnt = torch.cat(
                [self.cls_train_cnt,
                 torch.zeros(len(self.cls_list) - len(self.cls_train_cnt))])

    # third intent patch: update_memory's cand_idx.squeeze() yields a
    # 0-dim tensor when the eviction class has exactly one stored member,
    # and cand_idx[argmin] then raises IndexError (clib.py:78-80) — the
    # shipped crash is pinned by
    # test_shipped_update_memory_crashes_on_single_candidate below; the
    # evident intent (evict that sole candidate) needs a 1-dim index
    methods = _extract_methods(
        "update_memory", "adaptive_lr",
        patches=[("cand_idx = (self.memory.labels == "
                  "self.memory.cls_list[cls_to_replace]).nonzero()"
                  ".squeeze()",
                  "cand_idx = (self.memory.labels == "
                  "self.memory.cls_list[cls_to_replace]).nonzero()"
                  ".reshape(-1)")])
    methods_raw = _extract_methods("update_memory")
    return types.SimpleNamespace(Memory=RefMemory,
                                 update_memory_raw=methods_raw[
                                     "update_memory"], **methods)


def test_shipped_reference_memory_crashes_without_intent_patch(ref):
    """Teeth: the UNPATCHED reference Memory cannot store a sample —
    replace_data truth-tests a zero-element tensor (memory.py:42) because
    add_new_class never grows cls_list. Documents why the intent patch is
    required, not optional."""
    sys.path.insert(0, REFERENCE)
    try:
        import utils.memory as ref_mem_mod
    finally:
        sys.path.pop(0)
    raw = ref_mem_mod.Memory(data_source=None)
    raw.add_new_class(cls_list=[0])   # the shipped no-op
    with pytest.raises(RuntimeError):
        raw.replace_data([torch.tensor(0), torch.tensor(0)])


def test_shipped_update_memory_crashes_on_single_candidate(ref):
    """Teeth for the third intent patch: the UNPATCHED update_memory
    raises IndexError when the eviction class holds exactly one sample
    (cand_idx.squeeze() -> 0-dim; clib.py:78-80)."""
    shell = _ref_shell(ref, 2, [7, 2])
    ref.update_memory_raw(shell, torch.tensor([0]), torch.tensor([7]))
    ref.update_memory_raw(shell, torch.tensor([1]), torch.tensor([2]))
    with pytest.raises(IndexError):
        # counts [1, 1+1] -> evict from class 2, which has ONE member
        ref.update_memory_raw(shell, torch.tensor([2]), torch.tensor([2]))


def _ref_shell(ref, memory_size, exposed):
    s = types.SimpleNamespace()
    s.distributed = False
    s.memory_size = memory_size
    s.exposed_classes = list(exposed)
    s.dropped_idx = []
    s.memory_dropped_idx = []
    s.memory = ref.Memory(data_source=None)
    s.memory.add_new_class(list(exposed))
    return s


# non-sorted class ids and exposure order: catches implementations that
# sort by class id instead of exposure order
EXPOSED = [7, 2, 5, 1]
MEM = 6


def _stream():
    """(dataset_idx, label) inserts with enough volume to evict often."""
    rng = np.random.RandomState(0)
    labs = [7, 7, 2, 5, 2, 7, 1, 5, 2, 2, 1, 7, 5, 5, 1, 2, 7, 1]
    return [(100 + i, labs[i % len(labs)]) for i in range(18)], rng


def test_memory_machinery_matches_reference(ref):
    """Identical insert/train/sweep sequences through the reference's real
    Memory + extracted update_memory vs ours: same eviction slots, same
    contents, same others_loss_decrease trajectories. Dropped-slot lists
    are threaded exactly as CLIB.online_step does (every written slot
    appended, cleared at each sweep), exercising the dropped mask."""
    inserts, rng = _stream()
    shell = _ref_shell(ref, MEM, EXPOSED)
    ours = ReplayMemory(MEM, seed=0)
    ours_mem_dropped = []
    prev_ref = torch.empty(0)
    prev_ours = np.empty((0,), np.float64)

    for t, (idx, lab) in enumerate(inserts):
        before = len(ours)
        ref.update_memory(shell, torch.tensor([idx]), torch.tensor([lab]))
        slot = ours.clib_update(idx, lab, EXPOSED)
        ours_mem_dropped.append(slot)
        # the reference appends the same slot (append path: len-1;
        # eviction path: idx_to_replace)
        ref_slot = int(shell.memory_dropped_idx[-1])
        assert ref_slot == slot, (t, ref_slot, slot, before)

        if t % 2 == 1:
            n = len(ours)
            slots = rng.choice(n, size=min(3, n), replace=False)
            shell.memory.previous_idx = torch.cat(
                [shell.memory.previous_idx,
                 torch.tensor(slots, dtype=torch.float64)])
            ours.mark_used(slots)
            cur = rng.rand(n)
            shell.memory.update_loss_history(
                torch.tensor(cur), prev_ref, ema_ratio=0.90,
                dropped_idx=list(shell.memory_dropped_idx))
            shell.memory_dropped_idx = []
            ours.clib_loss_update(cur, prev_ours,
                                  dropped_slots=ours_mem_dropped,
                                  ema_ratio=0.90)
            ours_mem_dropped = []
            prev_ref = torch.tensor(cur)
            prev_ours = cur
            np.testing.assert_allclose(
                shell.memory.others_loss_decrease.numpy(),
                np.asarray(ours.others_loss_decrease),
                rtol=1e-6, atol=1e-7)

    np.testing.assert_array_equal(
        np.asarray(shell.memory.memory.numpy(), np.int64),
        np.asarray(ours.indices))


def _ours_lr_shell(lr, lr_step, lr_period, lr_length, imp_update_period=1):
    from lifelong_clip_tpu.methods.clib import CLIB
    s = CLIB.__new__(CLIB)
    s.cfg = types.SimpleNamespace(lr_period=lr_period, lr_length=lr_length,
                                  imp_update_period=imp_update_period,
                                  lr_step=lr_step)
    s._lr_high = lr
    s._lr_low = lr_step * lr
    s._lr_is_high = True
    s._high_hist, s._low_hist = [], []
    s._prev_losses = None
    s._train_count = 0
    s._imp_counter = 0
    s._loss_sweep = None
    s._dropped_idx = []
    s._mem_dropped_idx = []
    s._live_lr = lr
    s._set_lr = lambda v: setattr(s, "_live_lr", v)
    return s


def test_adaptive_lr_state_machine_matches_reference(ref):
    """60 sweeps with drifting losses and occasional drops: the LR trace,
    the high/low pair, the phase bit, and the decrease histories must
    match the reference's adaptive_lr exactly (incl. the t-test
    re-centering's second phase toggle and the dropped-slot mask)."""
    LR, STEP, PERIOD, LENGTH = 1e-3, 0.5, 3, 2
    n = 8
    rng = np.random.RandomState(1)

    rs = types.SimpleNamespace()
    rs.imp_update_counter = 0
    rs.imp_update_period = 1
    rs.train_count = 0
    rs.loss = torch.empty(0)
    rs.dropped_idx = []
    rs.prev_loss = None
    rs.lr_is_high = True
    rs.high_lr = LR
    rs.low_lr = STEP * LR
    rs.high_lr_loss = []
    rs.low_lr_loss = []
    rs.lr_step = STEP
    rs.optimizer = types.SimpleNamespace(
        param_groups=[{"lr": LR, "initial_lr": LR}])

    os_ = _ours_lr_shell(LR, STEP, PERIOD, LENGTH)

    recentered = 0
    for t in range(60):
        # drifting sweep: trends down so "decrease" histories differ by
        # phase; noise keeps the t-test from degenerate ties
        cur = 2.0 - 0.01 * t + 0.1 * rng.rand(n)
        drop = [int(rng.randint(n))] if t % 5 == 0 else []

        rs.imp_update_counter += 1
        rs.loss = torch.tensor(cur)
        rs.dropped_idx.extend(drop)
        before = (rs.high_lr, rs.low_lr)
        ref.adaptive_lr(rs, period=PERIOD, min_iter=LENGTH)

        os_._imp_counter += 1
        os_._loss_sweep = cur
        os_._dropped_idx.extend(drop)
        os_._adaptive_lr()

        assert rs.optimizer.param_groups[0]["lr"] == pytest.approx(
            os_._live_lr, rel=1e-12), t
        assert rs.lr_is_high == os_._lr_is_high, t
        assert rs.high_lr == pytest.approx(os_._lr_high, rel=1e-12), t
        assert rs.low_lr == pytest.approx(os_._lr_low, rel=1e-12), t
        np.testing.assert_allclose(np.asarray(rs.high_lr_loss, np.float64),
                                   np.asarray(os_._high_hist))
        np.testing.assert_allclose(np.asarray(rs.low_lr_loss, np.float64),
                                   np.asarray(os_._low_hist))
        if (rs.high_lr, rs.low_lr) != before:
            recentered += 1
    assert recentered >= 1, "scenario never re-centered; no teeth"
