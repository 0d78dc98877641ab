"""MMLU accuracy harness (maps evals/run_mmlu.cc:31-140).

    python -m gemma_tpu.evals.run_mmlu --weights model.sbs --input mmlu.json

Expects the reference's mmlu.json format: {"samples": [{"i", "prompt",
"input_label", ...}]}.  Output is constrained to answer-ish tokens via the
accept_token mechanism, mirroring the reference's TokenSet.
"""

from __future__ import annotations

import argparse
import json
import sys

from gemma_tpu.args import InferenceArgs, LoaderArgs, add_args, extract, load_gemma
from gemma_tpu.evals.benchmark_helper import GemmaEnv

ACCEPT_STRINGS = [
    "A", "B", "C", "D",
    " A", " B", " C", " D",
    "**", "**:", ":**", "The", "Answer", "is", ":", ".",
]

STEERING_SUFFIX = (
    "What is start of the line with the correct answer? "
    "Do not include any justifications or explanations. Reply only with a "
    "letter."
)


def accept_token_set(tokenizer) -> set[int]:
    tokens: set[int] = set()
    for s in ACCEPT_STRINGS:
        for t in tokenizer.encode(s):
            tokens.add(t)
    return tokens


def run(env: GemmaEnv, samples: list[dict], verbosity: int = 1) -> float:
    gemma = env.gemma
    accept = accept_token_set(gemma.tokenizer)
    accept |= {gemma.config.eos_id, gemma.config.secondary_eos_id}

    answers = correct = 0
    for sample in samples:
        label = int(sample["input_label"])
        correct_answer = ACCEPT_STRINGS[label]
        prompt = env.wrap_and_tokenize(sample["prompt"] + STEERING_SUFFIX)

        # Vectorized TokenSet constraint: the mask is applied to the logits
        # on device (no per-vocab Python callbacks, and decode stays
        # chunked) — equivalent to run_mmlu.cc's accept_token TokenSet.
        out = gemma.generate(
            prompt, max_generated_tokens=30, allowed_tokens=accept,
        )
        text = env.string_from_tokens(
            [t for t in out if not gemma.config.is_eos(t)])
        answers += 1
        got = correct_answer.strip() in text.strip().split()
        # Accept both "D" and " D"-style answers.
        if got or text.strip().startswith(correct_answer.strip()):
            correct += 1
        if verbosity >= 1:
            print(f"q{sample['i']}: correct={correct_answer.strip()!r} "
                  f"model={text.strip()!r} -> "
                  f"{correct}/{answers} = {correct / answers:.3f}",
                  file=sys.stderr)
    return correct / max(answers, 1)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    add_args(parser, LoaderArgs, InferenceArgs)
    parser.add_argument(
        "--input", default="", help="Path of mmlu.json (default: the "
        "gemma.cpp copy at <repo>/gemma/evals/mmlu.json if present)")
    ns = parser.parse_args(argv)
    if not ns.input:
        # The dataset is upstream eval DATA (not vendored here); point at
        # a checked-out gemma.cpp copy via GEMMA_CPP_DIR or /root/reference.
        import os

        for root in (os.environ.get("GEMMA_CPP_DIR", ""), "/root/reference"):
            cand = os.path.join(root, "gemma", "evals", "mmlu.json")
            if root and os.path.exists(cand):
                ns.input = cand
                break
        if not ns.input:
            parser.error("--input is required (no gemma.cpp mmlu.json found)")
    gemma = load_gemma(extract(ns, LoaderArgs), extract(ns, InferenceArgs))
    with open(ns.input) as f:
        samples = json.load(f)["samples"]
    acc = run(GemmaEnv(gemma), samples, verbosity=ns.verbosity)
    print(f"MMLU accuracy: {acc:.4f} over {len(samples)} questions")


if __name__ == "__main__":
    main()
