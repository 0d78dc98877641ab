"""Microbenchmarks of fixed prompts (maps evals/benchmarks.cc:32-60,
the google-benchmark latency harness).

    python -m gemma_tpu.evals.benchmarks --weights model.sbs
"""

from __future__ import annotations

import argparse
import time

from gemma_tpu.args import InferenceArgs, LoaderArgs, add_args, extract, load_gemma
from gemma_tpu.evals.benchmark_helper import GemmaEnv

PROMPTS = {
    "short": "What is the capital of Spain?",
    "factuality": "How does an inkjet printer work?",
    "creative": "Tell me a story about a magical bunny and their TRS-80.",
    "coding": "Write a python program to generate a fibonacci sequence.",
}


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    add_args(parser, LoaderArgs, InferenceArgs)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--prompt_lengths", default="",
                        help="comma-separated fixture lengths (32..512+) "
                             "from evals/prompts.py to benchmark prefill")
    ns = parser.parse_args(argv)
    inference = extract(ns, InferenceArgs)
    env = GemmaEnv(load_gemma(extract(ns, LoaderArgs), inference))

    prompts = dict(PROMPTS)
    if ns.prompt_lengths:
        from gemma_tpu.evals.prompts import get_prompt

        for ln in ns.prompt_lengths.split(","):
            prompts[f"prompt{ln}"] = get_prompt(int(ln))

    for name, prompt in prompts.items():
        times = []
        tokens = 0
        for _ in range(ns.reps):
            t0 = time.monotonic()
            result = env.query_model(
                prompt, max_generated_tokens=inference.max_generated_tokens)
            times.append(time.monotonic() - t0)
            tokens = result.tokens_generated
        best = min(times)
        print(f"BM_{name:<12} {best * 1e3:10.1f} ms "
              f"{tokens / best:8.1f} tok/s ({tokens} tokens, "
              f"best of {ns.reps})")


if __name__ == "__main__":
    main()
