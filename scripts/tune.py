"""Sweep GEMM tiles for a model's shapes on the current backend and merge
the winners into the packaged cache (gemma_tpu/ops/autotune_cache.json).

Usage: python scripts/tune.py [model ...] [--kinds sfp,bf16,...] [--ms 16,256]
       [--variants plain,top1,top1np,topk,gated]

Non-plain variants sweep the ACTUAL fused kernel (VERDICT r4 #2): top1/
top1np/topk at the logits-head shape, gated at the FFN gate shape.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gemma_tpu.models import configs as C
from gemma_tpu.ops import autotune as at


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("models", nargs="*", default=["gemma2_2b"])
    p.add_argument("--kinds", default="sfp")
    p.add_argument("--ms", default="16,256")
    p.add_argument("--variants", default="plain")
    p.add_argument("--no_head", action="store_true",
                   help="skip the [M, model_dim, vocab] logits shape "
                        "(prefill chunks never run it at M = batch*chunk; "
                        "only the last-token M = batch rows do)")
    args = p.parse_args()

    kinds = args.kinds.split(",")
    ms = tuple(int(x) for x in args.ms.split(","))
    variants = tuple(args.variants.split(","))
    for name in args.models or ["gemma2_2b"]:
        config = getattr(C, f"config_{name}")()
        print(f"=== {name} {kinds} M={ms} variants={variants} ===")
        at.tune_model(config, kinds=kinds, batch_sizes=ms,
                      variants=variants, include_head=not args.no_head)

    # Merge the user cache (where autotune persists) into the packaged one.
    with open(at._CACHE_PATH) as f:
        user = json.load(f)
    packaged = {}
    if os.path.exists(at._PACKAGED_CACHE):
        with open(at._PACKAGED_CACHE) as f:
            packaged = json.load(f)
    packaged.update(user)
    with open(at._PACKAGED_CACHE, "w") as f:
        json.dump(packaged, f, indent=1, sort_keys=True)
    print(f"wrote {len(packaged)} entries to {at._PACKAGED_CACHE}")


if __name__ == "__main__":
    main()
