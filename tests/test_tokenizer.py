"""Tokenizer unit tests: vocab integrity, round trips, framing.

Includes an optional byte-for-byte parity check against the reference
tokenizer when the read-only reference tree is present.
"""

import os
import sys

import numpy as np
import pytest

from lifelong_clip_tpu.utils import tokenizer as tok

REFERENCE = "/root/reference"


def test_vocab_size():
    tk = tok.default_tokenizer()
    assert len(tk.encoder) == tok.VOCAB_SIZE
    assert tk.sot == 49406 and tk.eot == 49407


def test_encode_decode_roundtrip():
    tk = tok.default_tokenizer()
    for text in ["a photo of a cat.", "hello world", "aquarium fish",
                 "the 3 quick brown foxes!"]:
        ids = tk.encode(text)
        # BPE decode restores words with spaces at word boundaries
        # (punctuation becomes its own word — same as the reference decode)
        assert tk.decode(ids).replace(" ", "") == text.lower().replace(
            " ", "")


def test_tokenize_shape_and_framing():
    arr = tok.tokenize(["a bad photo of a dog.", "x"])
    assert arr.shape == (2, 77) and arr.dtype == np.int32
    tk = tok.default_tokenizer()
    assert arr[0, 0] == tk.sot
    row = arr[0][arr[0] != 0]
    assert row[-1] == tk.eot
    # eot position is the argmax (text pooling relies on this)
    assert arr[0].argmax() == len(row) - 1


def test_truncation_keeps_eot():
    long = " ".join(["pneumonoultramicroscopic"] * 120)
    arr = tok.tokenize([long])
    tk = tok.default_tokenizer()
    assert arr.shape == (1, 77)
    assert arr[0, -1] == tk.eot


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree unavailable")
def test_parity_with_reference_tokenizer():
    sys.path.insert(0, REFERENCE)
    try:
        pytest.importorskip("ftfy")  # reference import requires ftfy
        from models.clip.tokenizer import SimpleTokenizer  # noqa
        ref = SimpleTokenizer()
    except Exception:
        pytest.skip("reference tokenizer not importable")
    finally:
        sys.path.pop(0)
    tk = tok.default_tokenizer()
    for text in ["a bad photo of a aquarium fish.", "television",
                 "willow tree", "sweet pepper", "lawn-mower 42!"]:
        assert tk.encode(text) == ref.encode(text)
