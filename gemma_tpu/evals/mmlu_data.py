"""Vendored MMLU eval data: structured records -> composed prompts.

The reference evaluates a fixed 83-question MMLU subset via composed
5-shot prompt strings (evals/mmlu.json, consumed by run_mmlu.cc:31-140).
We vendor the same subset structurally (data/mmlu_struct.json — public
MMLU benchmark data, Hendrycks et al. 2021; see tools/transcode_mmlu.py
for provenance) and recompose prompts here with the standard 5-shot
template.  Recomposition is byte-identical to the reference's strings
(tests/test_evals.py gates this against a reference checkout when one
is present).
"""

from __future__ import annotations

import json
import os

_DATA_PATH = os.path.join(os.path.dirname(__file__), "data",
                          "mmlu_struct.json")
_LETTERS = "ABCD"


def _qblock(rec: dict) -> str:
    lines = [rec["question"]]
    lines += [f"({_LETTERS[j]}) {c}" for j, c in enumerate(rec["choices"])]
    return "\n".join(lines)


def compose_prompt(rec: dict) -> str:
    """Standard 5-shot MMLU prompt (run_mmlu.cc's input format)."""
    parts = [f"The following are multiple choice questions (with answers) "
             f"about {rec['topic']}.\n\n"]
    for shot in rec["shots"]:
        parts.append(f"{_qblock(shot)}\n\nAnswer: {shot['answer']}\n\n")
    parts.append(f"{_qblock(rec)}\n\nAnswer:")
    return "".join(parts)


def load_samples(path: str | None = None) -> list[dict]:
    """Samples in run_mmlu's input schema ({"i", "prompt", "input_label"})."""
    with open(path or _DATA_PATH) as f:
        data = json.load(f)
    return [{"i": rec["i"], "prompt": compose_prompt(rec),
             "input_label": rec["input_label"]}
            for rec in data["samples"]]
