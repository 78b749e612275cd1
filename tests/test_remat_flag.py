"""--remat must reach EVERY method's train step (code-review finding, r3).

``make_train_step`` honors its ``remat`` flag (equality tested in
test_engine); the methods with CUSTOM jitted steps — mvp-clip, lwf's KD
step, ewc++'s double update, proto stage-1, and the three ViT-prompt
steps — wire the same ``cfg.remat or batchsize >= 256`` policy by
checkpointing their forwards. jax.checkpoint is a pure scheduling change,
so a full tiny run per method with ``remat=True`` pins that the flag (a)
reaches the step without trace errors and (b) trains to a finite result.
"""

import numpy as np
import pytest

from test_engine import synth, tiny_cfg  # noqa: F401
from test_methods_er_family import TinyEWC, TinyLwF
from test_mvp import TinyMVPFull
from test_proto_clip import TinyProto
from test_vit_prompt import TinyDual, TinyL2P, TinyMVPViT

_CASES = [
    ("mvp-clip", TinyMVPFull, dict(memory_size=0)),
    ("lwf", TinyLwF, dict(memory_size=32)),
    ("ewc++", TinyEWC, dict(memory_size=32)),
    ("adapter-clip-proto_prompt", TinyProto, dict(memory_size=0)),
    ("l2p", TinyL2P, dict(memory_size=0)),
    ("dualprompt", TinyDual, dict(memory_size=0)),
    ("mvp", TinyMVPViT, dict(memory_size=0)),
]


@pytest.mark.parametrize("method,cls,extra",
                         _CASES, ids=[c[0] for c in _CASES])
def test_remat_flag_reaches_custom_steps(synth, method, cls,  # noqa: F811
                                         extra):
    train, test = synth
    cfg = tiny_cfg(method=method, online_iter=1, remat=True, **extra)
    tr = cls(cfg, train_dataset=train, test_dataset=test)
    out = tr.run()
    assert np.isfinite(out["A_last"])
