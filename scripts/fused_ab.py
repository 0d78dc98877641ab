"""Fused-decode A/B + prefill-chunk sweep on hardware (round-4 evidence).

1. GEMMA_FUSED_DECODE A/B: the headline decode config with the fused
   write+attend+RoPE kernel vs the composed write/attend/rope kernels —
   quantifies the round-3 fusion win (VERDICT r3 weak #7).  The env var
   must be set BEFORE the first trace, so each arm runs in a fresh
   subprocess.
2. Prefill chunk sweep: 256 vs 512 vs 1024-token chunks at batch 4 and
   batch 1 (the reference's prefill_tbatch tunable,
   gemma/gemma_args.h:199-207) — VERDICT r3 #4's lever for MXU
   utilization.

Usage: python scripts/fused_ab.py [decode|prefill|all]
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DECODE_ARM = """
import json, sys
from bench import measure_decode
from gemma_tpu.models.configs import config_gemma2_2b
fill = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
r = measure_decode(config_gemma2_2b(), "i8", "i8", 16, 1024, steps,
                   fill=fill)
print("RESULT " + json.dumps(r))
"""

PREFILL_ARM = """
import json, sys
from bench import measure_prefill
from gemma_tpu.models.configs import config_gemma2_2b
batch, chunk = int(sys.argv[1]), int(sys.argv[2])
r = measure_prefill(config_gemma2_2b(), "i8", batch, chunk, 2048, reps=8)
print("RESULT " + json.dumps(r))
"""


def run_arm(code, env_extra, args=()):
    env = dict(os.environ, **env_extra)
    r = subprocess.run([sys.executable, "-c", code, *map(str, args)],
                       capture_output=True, text=True, timeout=2400,
                       env=env)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"arm failed rc={r.returncode}: {r.stderr[-400:]}")


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("decode", "all"):
        fused = run_arm(DECODE_ARM, {"GEMMA_FUSED_DECODE": "1"})
        print(f"fused decode:    {fused}")
        composed = run_arm(DECODE_ARM, {"GEMMA_FUSED_DECODE": "0"})
        print(f"composed decode: {composed}")
        print(f"fusion win: {fused['tok_s'] / composed['tok_s']:.3f}x "
              f"tok/s ({composed['dt_ms'] - fused['dt_ms']:+.1f} ms "
              f"per 64-step loop)")
    if what in ("packed", "all"):
        # Packed-vs-unpacked fused decode (round 5): both arms run the
        # fused write+attend+RoPE kernel; the delta is the XLA glue the
        # packed kernel removes (q/kv slice+stack relayouts + the
        # att-out reshape/cast — ~2 launch-bound fusions per layer).
        # fill=0.5 runs 256 steps for a lower-noise read (the tunnel's
        # dispatch-latency variance is ~±3 ms per loop — ±1% at 64 steps,
        # under the expected ~2% glue delta); fill=1.0 must keep steps=64
        # so start_pos stays pinned at ring-full (measure_decode clamps
        # start_pos to seq - steps - 1).
        for fill, steps in ((0.5, 256), (1.0, 64)):
            packed = run_arm(DECODE_ARM, {"GEMMA_PACKED_DECODE": "1"},
                             (fill, steps))
            print(f"packed decode   fill={fill} steps={steps}: {packed}")
            unpacked = run_arm(DECODE_ARM, {"GEMMA_PACKED_DECODE": "0"},
                               (fill, steps))
            print(f"unpacked decode fill={fill} steps={steps}: {unpacked}")
            print(f"packed win fill={fill}: "
                  f"{packed['tok_s'] / unpacked['tok_s']:.3f}x tok/s "
                  f"({unpacked['dt_ms'] - packed['dt_ms']:+.1f} ms "
                  f"per {steps}-step loop)")
    if what in ("prefill", "all"):
        for batch in (4, 1):
            for chunk in (256, 512, 1024):
                r = run_arm(PREFILL_ARM, {}, (batch, chunk))
                print(f"prefill b{batch} chunk {chunk}: {r}")


if __name__ == "__main__":
    main()
