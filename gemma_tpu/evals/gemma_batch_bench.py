"""Batched decode throughput benchmark (maps evals/gemma_batch_bench.cc:51-140).

Generates ~900 short prompts, runs them through generate_batch in
decode_qbatch-sized waves, and prints prefill tok/s, TTFT and decode tok/s.
Run twice to see autotuning gains (the winners persist across processes).

    python -m gemma_tpu.evals.gemma_batch_bench --weights model.sbs
"""

from __future__ import annotations

import argparse
import time

from gemma_tpu.args import InferenceArgs, LoaderArgs, add_args, extract, load_gemma
from gemma_tpu.engine.timing import TimingInfo
from gemma_tpu.evals.benchmark_helper import GemmaEnv, log_speed_stats

TOPICS = [
    "the history of the Roman Empire", "how photosynthesis works",
    "the rules of chess", "the water cycle", "black holes",
    "the French Revolution", "how vaccines work", "plate tectonics",
    "the stock market", "machine learning",
]
FORMS = [
    "Write a paragraph about {}.", "Explain {} to a child.",
    "Summarize {} in three sentences.", "List five facts about {}.",
    "Describe {} briefly.", "What is interesting about {}?",
    "Give a short overview of {}.", "Why does {} matter?",
    "Outline the basics of {}.",
]


def make_prompts(n: int = 900) -> list[str]:
    out = []
    for i in range(n):
        out.append(FORMS[i % len(FORMS)].format(TOPICS[(i // len(FORMS)) % len(TOPICS)]))
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    add_args(parser, LoaderArgs, InferenceArgs)
    parser.add_argument("--num_prompts", type=int, default=64)
    ns = parser.parse_args(argv)
    inference = extract(ns, InferenceArgs)
    gemma = load_gemma(extract(ns, LoaderArgs), inference)
    env = GemmaEnv(gemma)

    prompts = make_prompts(ns.num_prompts)
    qbatch = inference.decode_qbatch_size
    total_prefill = total_gen = 0
    t0 = time.monotonic()
    for wave in range(0, len(prompts), qbatch):
        batch = prompts[wave : wave + qbatch]
        token_prompts = [env.wrap_and_tokenize(p) for p in batch]
        timing = TimingInfo(verbosity=0)
        gemma.generate_batch(
            token_prompts,
            max_generated_tokens=inference.max_generated_tokens,
            timing_info=timing,
        )
        total_prefill += timing.prefill_tokens
        total_gen += timing.generated_tokens
        print(f"wave {wave // qbatch}: prefill "
              f"{timing.prefill_tokens_per_second:.1f} tok/s, TTFT "
              f"{timing.time_to_first_token:.3f}s, decode "
              f"{timing.generate_tokens_per_second:.1f} tok/s")
    log_speed_stats(t0, total_prefill + total_gen)


if __name__ == "__main__":
    main()
