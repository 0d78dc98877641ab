"""Migrate pre-2025 multi-file checkpoints to single-file `.sbs`
(maps io/migrate_weights.cc:27-60: load + Gemma::Save).

    python -m gemma_tpu.tools.migrate_weights \
        --weights old.sbs [--tokenizer tok.model] --output_weights new.sbs
"""

from __future__ import annotations

import argparse

from gemma_tpu.gemma import Gemma


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--tokenizer", default="")
    p.add_argument("--output_weights", required=True)
    ns = p.parse_args(argv)

    gemma = Gemma.load(ns.weights, tokenizer_path=ns.tokenizer or None)
    gemma.save(ns.output_weights)
    print(f"wrote single-file model to {ns.output_weights}")


if __name__ == "__main__":
    main()
