"""Dump per-layer activations for a prompt to JSON
(maps evals/debug_prompt.cc:20-50 via the LayersOutputFunc observer).

    python -m gemma_tpu.evals.debug_prompt --weights m.sbs \
        --prompt "..." --layers_output acts.json
"""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np

from gemma_tpu.args import InferenceArgs, LoaderArgs, add_args, extract, load_gemma
from gemma_tpu.evals.benchmark_helper import GemmaEnv
from gemma_tpu.models.gemma import forward_collect


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    add_args(parser, LoaderArgs, InferenceArgs)
    parser.add_argument("--layers_output", required=True,
                        help="Output JSON path")
    ns = parser.parse_args(argv)
    inference = extract(ns, InferenceArgs)
    gemma = load_gemma(extract(ns, LoaderArgs), inference)
    env = GemmaEnv(gemma)

    prompt = env.wrap_and_tokenize(inference.prompt or "Hello")
    cache = gemma.new_cache(1, max(len(prompt), 2))
    tokens = jnp.asarray(prompt, jnp.int32)[None, :]
    positions = jnp.arange(len(prompt), dtype=jnp.int32)[None, :]
    _, _, collected = forward_collect(gemma.params, tokens, positions, cache,
                                      gemma.config)
    out = {
        key: np.asarray(value, np.float32).tolist()
        for key, value in collected.items()
    }
    with open(ns.layers_output, "w") as f:
        json.dump(out, f)
    print(f"wrote {len(out)} activation tensors to {ns.layers_output}")


if __name__ == "__main__":
    main()
