"""Transcode a gemma.cpp mmlu.json into the vendored structured form.

The reference ships its MMLU subset as fully-composed 5-shot prompt
strings (evals/mmlu.json; consumed by evals/run_mmlu.cc:31-140).  The
underlying data is the public MMLU benchmark (Hendrycks et al., 2021,
"Measuring Massive Multitask Understanding", MIT-licensed); the prompt
template is the standard published 5-shot format.  We vendor the subset
in a STRUCTURED schema (per-question fields, not composed strings) at
gemma_tpu/evals/data/mmlu_struct.json and recompose prompts at load
(gemma_tpu/evals/mmlu_data.py) — byte-identical to the reference
composition, which `--check` verifies.

Usage:
    python tools/transcode_mmlu.py /path/to/gemma.cpp/gemma/evals/mmlu.json \
        [--out gemma_tpu/evals/data/mmlu_struct.json] [--check]
"""

from __future__ import annotations

import argparse
import json
import os
import re

_HEADER = re.compile(
    r"The following are multiple choice questions \(with answers\) "
    r"about (.+?)\.\n\n")
_QBLOCK = re.compile(
    r"(.*?)\n\(A\) (.*?)\n\(B\) (.*?)\n\(C\) (.*?)\n\(D\) (.*)$", re.S)


def _split_qblock(block: str) -> dict:
    m = _QBLOCK.match(block)
    if m is None:
        raise ValueError(f"unrecognized question block: {block[:80]!r}")
    return {"question": m.group(1), "choices": [m.group(i)
                                                for i in range(2, 6)]}


def parse_prompt(prompt: str) -> dict:
    """Decompose one composed 5-shot prompt into structured records."""
    m = _HEADER.match(prompt)
    if m is None:
        raise ValueError(f"unrecognized header: {prompt[:80]!r}")
    topic, rest = m.group(1), prompt[m.end():]
    parts = re.split(r"\n\nAnswer: ([ABCD])\n\n", rest)
    final = parts[-1]
    if not final.endswith("\n\nAnswer:"):
        raise ValueError(f"unrecognized tail: {final[-40:]!r}")
    shots = [dict(_split_qblock(parts[i]), answer=parts[i + 1])
             for i in range(0, len(parts) - 1, 2)]
    target = _split_qblock(final[: -len("\n\nAnswer:")])
    return {"topic": topic, "shots": shots, **target}


def transcode(samples: list[dict]) -> dict:
    out = []
    for s in samples:
        rec = parse_prompt(s["prompt"])
        rec["i"] = int(s["i"])
        rec["input_label"] = int(s["input_label"])
        out.append(rec)
    return {
        "provenance": "MMLU benchmark (Hendrycks et al. 2021, MIT); "
                      "subset + 5-shot selection per gemma.cpp "
                      "evals/mmlu.json, stored structurally — prompts are "
                      "recomposed by gemma_tpu/evals/mmlu_data.py.",
        "samples": out,
    }


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="gemma.cpp mmlu.json path")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "gemma_tpu", "evals", "data",
        "mmlu_struct.json"))
    ap.add_argument("--check", action="store_true",
                    help="verify recomposed prompts match the input "
                         "byte-for-byte")
    ns = ap.parse_args(argv)
    with open(ns.input) as f:
        ref = json.load(f)["samples"]
    data = transcode(ref)
    if ns.check:
        from gemma_tpu.evals.mmlu_data import compose_prompt

        for rec, s in zip(data["samples"], ref):
            if compose_prompt(rec) != s["prompt"]:
                raise SystemExit(f"recomposition mismatch at i={rec['i']}")
        print(f"recomposition check: {len(ref)} prompts byte-exact")
    with open(ns.out, "w") as f:
        json.dump(data, f, indent=1, ensure_ascii=False)
        f.write("\n")
    print(f"wrote {len(data['samples'])} samples -> {ns.out}")


if __name__ == "__main__":
    main()
