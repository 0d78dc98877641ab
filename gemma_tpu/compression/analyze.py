"""Weight-distribution analysis for codec research
(maps compression/analyze.h:53-183).

    python -m gemma_tpu.compression.analyze --weights model.sbs [--tensor re]

Per tensor: min/max/mean/std, magnitude histogram (log2 buckets), fraction
exactly zero, and the SFP/NUQ distortion summary (via DistortionStats).
"""

from __future__ import annotations

import argparse
import re

import numpy as np


def analyze_tensor(name: str, values: np.ndarray, codec=None) -> str:
    x = values.reshape(-1).astype(np.float64)
    nonzero = x[x != 0]
    lines = [
        f"{name}: shape={values.shape} n={x.size}",
        f"  min={x.min():.4g} max={x.max():.4g} mean={x.mean():.4g} "
        f"std={x.std():.4g} zeros={np.mean(x == 0):.2%}",
    ]
    if nonzero.size:
        e = np.floor(np.log2(np.abs(nonzero))).astype(int)
        lo, hi = int(e.min()), int(e.max())
        hist, _ = np.histogram(e, bins=np.arange(lo, hi + 2))
        top = np.argsort(hist)[::-1][:6]
        buckets = ", ".join(
            f"2^{lo + int(i)}:{hist[int(i)] / e.size:.1%}" for i in sorted(top))
        lines.append(f"  |x| log2 buckets: {buckets}")
    if codec is not None:
        from gemma_tpu.compression import compress_tensor
        from gemma_tpu.compression.distortion import DistortionStats

        pt = compress_tensor(codec, name, values.astype(np.float32))
        stats = DistortionStats()
        stats.notify_array(values.astype(np.float32) , pt.to_f32())
        lines.append(f"  {pt.type.name} distortion: {stats.summary()}")
    return "\n".join(lines)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--tensor", default="", help="regex filter on names")
    p.add_argument("--codec", default="sfp",
                   help="codec for distortion stats ('' to skip)")
    ns = p.parse_args(argv)

    from gemma_tpu.compression import type_from_name
    from gemma_tpu.io.blob_store import BlobReader
    from gemma_tpu.io.model_store import ModelStore

    store = ModelStore(BlobReader(ns.weights))
    codec = type_from_name(ns.codec) if ns.codec else None
    pattern = re.compile(ns.tensor) if ns.tensor else None
    for name in store.tensors:
        if pattern and not pattern.search(name):
            continue
        pt = store.read_tensor(name)
        if pt is None:
            continue
        print(analyze_tensor(name, pt.to_f32(), codec=codec))


if __name__ == "__main__":
    main()
