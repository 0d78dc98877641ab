"""Round-trip reconstruction SNR per codec (the docs/PERF.md quality table).

Reproduces the round-2 i8-vs-sfp-vs-nuq evidence and adds the round-3 i4
serving layout (compression/int4.py): encode -> decode on synthetic weight
distributions, SNR = 10*log10(sum(x^2) / sum((x - x_hat)^2)) in dB.

Pure numpy/CPU (no TPU needed); the reference analog is the distortion
stats in compression/distortion.h + analyze.cc.

    python scripts/codec_snr.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from gemma_tpu.compression import Type, compress_tensor  # noqa: E402
from gemma_tpu.compression.int4 import decode_affine, encode_affine  # noqa: E402


def snr_db(x: np.ndarray, xq: np.ndarray) -> float:
    err = (x.astype(np.float64) - xq.astype(np.float64)) ** 2
    return 10.0 * np.log10(np.square(x, dtype=np.float64).sum() / err.sum())


def dists(rng):
    n, k = 64, 2048
    yield "normal(0, 0.03)", rng.normal(0, 0.03, (n, k)).astype(np.float32)
    yield "normal(0, 0.3)", rng.normal(0, 0.3, (n, k)).astype(np.float32)
    yield "laplace heavy-tail", rng.laplace(0, 0.1, (n, k)).astype(np.float32)
    mixed = rng.normal(0, 1, (n, k)).astype(np.float32)
    mixed *= (10.0 ** rng.uniform(-2, 0, (n, 1))).astype(np.float32)
    yield "mixed-scale rows", mixed


def roundtrip(kind: str, w: np.ndarray) -> np.ndarray:
    if kind == "i4":
        codes, scales, mins = encode_affine(w)
        return decode_affine(codes, scales, mins, w.shape[1])
    type_ = {"sfp": Type.SFP, "i8": Type.I8, "nuq": Type.NUQ}[kind]
    return compress_tensor(type_, "w", w).to_f32()


def main() -> None:
    rng = np.random.default_rng(7)
    kinds = ["sfp", "i8", "nuq", "i4"]
    print("| distribution | " + " | ".join(kinds) + " |")
    print("|---|" + "---|" * len(kinds))
    for name, w in dists(rng):
        row = [f"{snr_db(w, roundtrip(k, w)):.1f} dB" for k in kinds]
        print(f"| {name} | " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
