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
        "--input", default="", help="Path of an mmlu.json in the reference "
        "schema (default: the vendored structured subset, "
        "gemma_tpu/evals/data/mmlu_struct.json)")
    parser.add_argument(
        "--max_samples", type=int, default=0,
        help="Evaluate only the first N samples (0 = all)")
    ns = parser.parse_args(argv)
    gemma = load_gemma(extract(ns, LoaderArgs), extract(ns, InferenceArgs))
    if ns.input:
        with open(ns.input) as f:
            samples = json.load(f)["samples"]
    else:
        # Vendored data: same 83-question subset and byte-identical 5-shot
        # prompts as the reference's evals/mmlu.json (see mmlu_data.py).
        from gemma_tpu.evals.mmlu_data import load_samples

        samples = load_samples()
    if ns.max_samples:
        samples = samples[: ns.max_samples]
    acc = run(GemmaEnv(gemma), samples, verbosity=ns.verbosity)
    print(f"MMLU accuracy: {acc:.4f} over {len(samples)} questions")


if __name__ == "__main__":
    main()
