"""Tunnel-latency / TPU-health probe (r2 vintage, was repo-root
mlp_probe.py): times a tiny cached jit in chained vs independent
dispatch. Run this FIRST when the tunneled TPU looks wedged — a healthy
tunnel shows ~1 ms/call chained and ~25 ms/call independent (the host
value-fetch round trip CLAUDE.md's timing rules are built on)."""

import time
import jax, jax.numpy as jnp

f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 128))
x = f(x); x.block_until_ready(); float(x.sum())
t0 = time.perf_counter(); n = 100
for _ in range(n):
    x = f(x)
_ = float(x.sum())
print("tiny chained call:", (time.perf_counter()-t0)/n*1e3, "ms/call")

# independent (non-chained) dispatches
y = jnp.zeros((8, 128))
t0 = time.perf_counter()
outs = [f(y) for _ in range(n)]
_ = float(outs[-1].sum())
print("tiny independent:", (time.perf_counter()-t0)/n*1e3, "ms/call")
