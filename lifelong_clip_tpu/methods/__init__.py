"""Method registry (reference main.py:25-40 + methods/__init__.py:19-32)."""

from __future__ import annotations


def get_method(name: str):
    from .adapter_clip import AdapterCLIP
    from .continual_clip import ContinualCLIP

    registry = {
        "continual-clip": ContinualCLIP,
        "lora-clip": AdapterCLIP,
        "adapter-clip": AdapterCLIP,
        "moe-clip": AdapterCLIP,
    }
    # methods still to be wired into the TPU engine are registered lazily;
    # see SURVEY.md §2.2 for the full inventory being rebuilt.
    try:
        from .er_baseline import ER, FT
        registry.update({"er": ER, "Finetuning": FT})
    except ImportError:
        pass
    if name not in registry:
        raise NotImplementedError(
            f"method {name!r} not available yet; have: {sorted(registry)}")
    return registry[name]
