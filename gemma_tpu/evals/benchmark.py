"""CLI benchmark: summarize / cross-entropy-on-file / TriviaQA
(maps evals/benchmark.cc:24-100+).

    python -m gemma_tpu.evals.benchmark --weights m.sbs --summarize_text f.txt
    python -m gemma_tpu.evals.benchmark --weights m.sbs --cross_entropy f.txt
    python -m gemma_tpu.evals.benchmark --weights m.sbs --trivia_qa qa.jsonl
"""

from __future__ import annotations

import argparse
import json
import time

from gemma_tpu.args import InferenceArgs, LoaderArgs, add_args, extract, load_gemma
from gemma_tpu.evals.benchmark_helper import GemmaEnv, log_speed_stats


def benchmark_summary(env: GemmaEnv, text: str, max_tokens: int) -> None:
    t0 = time.monotonic()
    result = env.query_model(
        "Here is some text to summarize:\n" + text + "\nSummarize this text.\n",
        max_generated_tokens=max_tokens)
    print(result.response)
    log_speed_stats(t0, result.tokens_generated)


def benchmark_cross_entropy(env: GemmaEnv, text: str, max_tokens: int) -> None:
    from gemma_tpu.evals.cross_entropy import compute_cross_entropy

    prompt = env.tokenize_and_prepend_bos(text)[:max_tokens]
    t0 = time.monotonic()
    bits = compute_cross_entropy(env.gemma.params, env.gemma.config, prompt)
    print(f"Cross entropy: {bits / len(text):f} bits/byte "
          f"({bits:.1f} bits over {len(prompt)} tokens)")
    log_speed_stats(t0, len(prompt))


def benchmark_trivia_qa(env: GemmaEnv, path: str, max_questions: int) -> None:
    answered = correct = 0
    with open(path) as f:
        for line in f:
            if answered >= max_questions:
                break
            sample = json.loads(line)
            result = env.query_model(sample["question"],
                                     max_generated_tokens=64)
            answered += 1
            aliases = sample.get("answer", {})
            if isinstance(aliases, dict):
                aliases = aliases.get("aliases", [])
            if any(a.lower() in result.response.lower() for a in aliases):
                correct += 1
            print(f"{answered}: {correct}/{answered} correct")
    print(f"TriviaQA accuracy: {correct / max(answered, 1):.4f}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    add_args(parser, LoaderArgs, InferenceArgs)
    parser.add_argument("--summarize_text", default="")
    parser.add_argument("--cross_entropy", default="")
    parser.add_argument("--trivia_qa", default="")
    parser.add_argument("--max_questions", type=int, default=20)
    ns = parser.parse_args(argv)
    env = GemmaEnv(load_gemma(extract(ns, LoaderArgs),
                              extract(ns, InferenceArgs)))
    max_tokens = ns.max_generated_tokens

    if ns.summarize_text:
        with open(ns.summarize_text) as f:
            benchmark_summary(env, f.read(), max_tokens)
    if ns.cross_entropy:
        with open(ns.cross_entropy) as f:
            benchmark_cross_entropy(env, f.read(), max_tokens)
    if ns.trivia_qa:
        benchmark_trivia_qa(env, ns.trivia_qa, ns.max_questions)


if __name__ == "__main__":
    main()
