"""Synthetic golden transcripts: the weight-free analog of
goldens/2b-it.txt (greedy-decode parity, gemma_test.cc + run.cc).

Real goldens need real weights; this pins greedy token transcripts of the
deterministic 26-layer Gemma2-2B-shaped synthetic model instead, so ANY
silent numeric drift in the forward pass / kernels / cache across rounds
flips a token and fails here.  Argmax tokens are robust to reordered
float rounding unless two logits nearly tie, so legitimate
accumulation-order changes pass while real regressions don't.

To regenerate after an INTENTIONAL numerics change:

    python -m pytest tests/test_synth_goldens.py --regen-goldens
      (or: GEMMA_REGEN_GOLDENS=1 python -m pytest tests/test_synth_goldens.py)

and commit the updated tests/goldens/synth_2b_shaped.json with a note on
why the transcript moved.
"""

import json
import os
import pathlib

import numpy as np
import pytest

from gemma_tpu.engine.engine import GemmaEngine, RuntimeConfig

from tests.test_model import random_weights, to_params
from tests.test_parity_full import SEQ, gemma2_shaped_config

GOLDEN_PATH = pathlib.Path(__file__).parent / "goldens" / "synth_2b_shaped.json"

PROMPTS = [
    [2, 45, 871, 19, 203, 5, 77],
    [2, 1024, 333],
    [2, 7, 7, 7, 512, 90, 1500, 64, 12],
]


def generate_transcripts():
    config = gemma2_shaped_config()
    rng = np.random.default_rng(42)
    params = to_params(random_weights(config, rng), config)
    config.eos_id = -1  # random model: no accidental EOS retirement
    config.secondary_eos_id = -1
    engine = GemmaEngine(params, config,
                         RuntimeConfig(seq_len=SEQ, prefill_tbatch_size=16,
                                       decode_chunk=4))
    outs = engine.generate_batch([list(p) for p in PROMPTS],
                                 max_generated_tokens=12)
    return [[int(t) for t in o] for o in outs]


def test_synth_golden_transcripts():
    if os.environ.get("GEMMA_REGEN_GOLDENS"):
        GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN_PATH.write_text(json.dumps(
            {"prompts": PROMPTS, "outputs": generate_transcripts()},
            indent=1))
        pytest.skip(f"regenerated {GOLDEN_PATH}")
    if not GOLDEN_PATH.exists():
        pytest.fail(f"{GOLDEN_PATH} missing; run with GEMMA_REGEN_GOLDENS=1")
    golden = json.loads(GOLDEN_PATH.read_text())
    assert golden["prompts"] == PROMPTS, (
        "prompt set changed; regenerate the goldens")
    got = generate_transcripts()
    assert got == golden["outputs"], (
        "greedy transcripts drifted from the pinned goldens — a numeric "
        "change reached the forward pass; if intentional, regenerate with "
        "GEMMA_REGEN_GOLDENS=1 and explain in the commit")
