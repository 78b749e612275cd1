"""Measure healthy A_last/A_auc for the per-family learning gates.

Runs tests/test_learning_quality.py:family_gate_run for each candidate
(method, lr) on 8 virtual CPU devices and prints the numbers the pinned
floors in FAMILY_GATES are derived from (floor ~= half the healthy value,
never below 2x chance). Re-run after any change to the gate config.

Usage: python tools/calibrate_learning_gates.py [method ...]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from test_learning_quality import family_gate_run  # noqa: E402

CANDIDATES = {
    # (lr, online_iter) pairs. Round-1 sweep (lr in 1e-3/3e-3/1e-2 at
    # iter=8): l2p 0.50/0.40 @3e-3, proto 0.36/0.32 @1e-2, maple
    # 0.30/0.19 @1e-2, mvp-clip only 0.16/0.18 @1e-2 — round 2 pushes
    # lr/iters for the two weak families.
    "mvp-clip": ((1e-2, 16), (3e-2, 8), (3e-2, 16)),
    "maple": ((1e-2, 16), (3e-2, 8)),
    "adapter-clip-proto_prompt": ((1e-2, 8),),
    "l2p": ((3e-3, 8), (1e-2, 8)),
}


def main():
    methods = sys.argv[1:] or list(CANDIDATES)
    for method in methods:
        for lr, it in CANDIDATES.get(method, ((3e-3, 8),)):
            out = family_gate_run(method, lr, online_iter=it)
            print(f"{method:28s} lr={lr:g} iter={it}  "
                  f"A_last={out['A_last']:.3f}  "
                  f"A_auc={out['A_auc']:.3f}", flush=True)


if __name__ == "__main__":
    main()
