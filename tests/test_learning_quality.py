"""Learning-quality gate: the framework must actually LEARN.

Every other e2e assert in the suite is isfinite/>=0, and the whole-run
parity tests compare trajectories — all of which would pass if training
silently stopped (e.g. a ``base_grads`` regression zeroing every gradient,
an optimizer wired to the wrong tree, a label remap off by one). This test
runs a real online-CL stream on the class-structured synthetic data
(data/registry.py:make_synthetic — designed fittable) and requires final
accuracy WELL above chance. VERDICT r3 weak #7 / next-round item 2.
"""

import sys

import pytest

sys.path.insert(0, "tests")

from test_engine import _TinyMixin, tiny_cfg  # noqa: E402
from lifelong_clip_tpu.data.registry import make_synthetic  # noqa: E402
from lifelong_clip_tpu.methods.er_baseline import ER  # noqa: E402


def test_er_learns_above_chance(devices):
    """ER (linear head over the frozen tiny tower) on an 8-class
    Si-Blurry stream: chance is 0.125; the measured config reaches
    A_last ~0.70 / A_auc ~0.59 (pinned with ~2x margin). A change that
    silently kills learning — zeroed grads, optimizer on the wrong tree,
    broken label remap, dead replay memory — lands back at chance and
    fails both floors."""

    class T(_TinyMixin, ER):
        pass

    train = make_synthetic(n_classes=8, per_class=64, image_size=32,
                           seed=0)
    test = make_synthetic(n_classes=8, per_class=8, image_size=32, seed=0,
                          train=False)
    cfg = tiny_cfg(method="er", online_iter=8, memory_size=128, lr=0.1)
    tr = T(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    chance = 1 / 8
    assert out["A_last"] > 2.8 * chance, (
        f"A_last {out['A_last']:.3f} barely above chance {chance} — "
        "training is not learning (measured healthy value ~0.70)")
    assert out["A_auc"] > 2.0 * chance, (
        f"A_auc {out['A_auc']:.3f} near chance — periodic evals never "
        "rose above the floor (measured healthy value ~0.59)")


def family_gate_run(method, lr, online_iter=8):
    """One family-gate run: the fittable synthetic stream under the gate
    config. Shared by the tests below AND tools/calibrate_learning_gates.py
    so the pinned floors always correspond to a reproducible command."""
    from test_sharding import _tiny_trainer_for
    cls, kw = _tiny_trainer_for(method)
    train = make_synthetic(n_classes=8, per_class=64, image_size=32,
                           seed=0)
    test = make_synthetic(n_classes=8, per_class=8, image_size=32, seed=0,
                          train=False)
    cfg = tiny_cfg(method=method, online_iter=online_iter, lr=lr, **kw)
    tr = cls(cfg, train_dataset=train, test_dataset=test)
    return tr.run()


# one representative per method family the ER gate does NOT cover
# (VERDICT r4 weak #3: a regression killing learning in the prompt paths
# passed everything). Floors pinned from tools/calibrate_learning_gates.py
# measurements (deterministic seeded CPU runs) at ~2/3 the healthy value,
# always above the 0.125 chance floor a collapsed run lands at. The
# prompt-only trainables over the RANDOM tiny tower are genuinely weaker
# learners than head-training ER (no trainable classifier for mvp-clip;
# text anchors are random directions), hence the higher-lr/iter configs.
FAMILY_GATES = [
    # (method, lr, online_iter, A_last floor, A_auc floor, measured)
    ("mvp-clip", 3e-2, 16, 0.22, 0.16, "0.344/0.202"),
    ("maple", 1e-2, 16, 0.19, 0.22, "0.250/0.307"),
    ("adapter-clip-proto_prompt", 1e-2, 8, 0.25, 0.22, "0.359/0.315"),
    ("l2p", 1e-2, 8, 0.30, 0.35, "0.438/0.534"),
]


@pytest.mark.parametrize("method,lr,online_iter,last_floor,auc_floor,"
                         "healthy", FAMILY_GATES)
def test_family_learns_above_chance(devices, method, lr, online_iter,
                                    last_floor, auc_floor, healthy):
    """Prompt-injection / compound-prompt / two-stage-proto / pool-prompt
    families must LEARN, not just run: each trains its gate config on the
    fittable stream and must land well above the 0.125 chance floor. A
    silent learning regression in any family (mvp mask/AFS/GSF, maple
    compound prompts, proto stage 2, l2p pool selection) fails here."""
    out = family_gate_run(method, lr, online_iter=online_iter)
    chance = 1 / 8
    assert out["A_last"] > last_floor, (
        f"{method}: A_last {out['A_last']:.3f} under the pinned floor "
        f"{last_floor} (chance {chance}, healthy {healthy}) — this "
        "family stopped learning")
    assert out["A_auc"] > auc_floor, (
        f"{method}: A_auc {out['A_auc']:.3f} under the pinned floor "
        f"{auc_floor} — periodic evals never rose above chance")
