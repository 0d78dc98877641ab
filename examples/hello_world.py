"""Minimal generation example (maps examples/hello_world/run.cc:18-43).

    python examples/hello_world.py --weights model.sbs [--tokenizer t.model]
"""

import argparse

from gemma_tpu.gemma import Gemma


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", required=True)
    parser.add_argument("--tokenizer", default="")
    parser.add_argument("--prompt", default="Write a greeting to the world.")
    args = parser.parse_args()

    gemma = Gemma.load(args.weights, tokenizer_path=args.tokenizer or None)
    text, _, _ = gemma.generate_text(
        args.prompt, max_generated_tokens=256,
        stream=lambda piece: (print(piece, end="", flush=True), True)[1],
    )
    print()


if __name__ == "__main__":
    main()
