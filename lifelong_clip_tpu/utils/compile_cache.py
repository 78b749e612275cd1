"""Persistent XLA compilation cache.

First compiles of the ViT-B/16 online step cost 1–5 minutes through the
tunneled TPU; the reference has no analogue (eager torch doesn't compile),
so every CLI run here paid that cold start. Pointing JAX's persistent
compilation cache at a disk directory makes repeat runs (same program
shapes) load the compiled executable instead: the dominant start-up cost
of short online-CL experiments disappears after the first run.

Enabled by default from the CLI and the bench harnesses; opt out with
``LLC_COMPILE_CACHE=off`` or override the directory via the same variable.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("lifelong_clip_tpu")

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache",
                        "lifelong_clip_tpu", "xla")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache; returns the dir used
    (None if disabled). Safe to call more than once."""
    env = os.environ.get("LLC_COMPILE_CACHE", "")
    if env.lower() == "off":
        return None
    path = path or env or _DEFAULT
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache EVERYTHING: through the tunnel even a trivial
        # elementwise program costs ~0.4 s to compile, and a short CLI
        # run compiles ~70 of them — local cache reads are far cheaper
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        return path
    except Exception as e:  # never let cache setup break a run
        log.warning("compilation cache disabled: %s", e)
        return None
