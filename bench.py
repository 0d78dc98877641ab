"""Headline benchmark: Gemma2 batched decode throughput on one chip.

Mirrors the reference's gemma_batch_bench (evals/gemma_batch_bench.cc:51-140:
decode_qbatch-sized batch, tokens/sec) with synthetic weights in the exact
production layout (see gemma_tpu/utils/synth.py).  The decode loop runs fully
on-device via lax.scan.

Headline config: Gemma2-2B with the TPU serving defaults — i8 weights
(output-scaled raw-code MXU dots; same 1 byte/elem as SFP but ~1.7x the
effective bandwidth, see docs/PERF.md — VERDICT r1 #1b) and the i8 KV cache
(ops/kv_quant.py).  The `extra` field carries the SFP continuity number
(the reference's serving codec), Gemma2-9B SFP decode, and 2B prefill.

vs_baseline: the reference publishes no absolute tokens/sec (BASELINE.md), so
the comparison anchor is the HBM-bandwidth speed-of-light for this chip:
batched decode is bandwidth-bound reading the full weight set (+KV) per step,
so SOL tok/s = batch / (bytes_per_step / HBM_BW).  vs_baseline = fraction of
speed-of-light achieved (1.0 = perfect).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# GB/s per chip (public figures; used only to normalize vs_baseline).
HBM_BW = {
    "v2": 700e9, "v3": 900e9, "v4": 1228e9,
    "v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9,
    "v6 lite": 1640e9, "v6e": 1640e9,
}


def device_hbm_bw() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, bw in sorted(HBM_BW.items(), key=lambda kv: -len(kv[0])):
        if key in kind:
            return bw
    return 819e9


def params_bytes(params) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += int(np.prod(leaf.shape)) * leaf.dtype.itemsize
    return total


def smoke_config():
    """Tiny stand-in for off-TPU smoke runs (interpret-mode kernels make
    real layer widths impractical on CPU)."""
    from gemma_tpu.compression import Type
    from gemma_tpu.models import configs as C

    lc = C.LayerConfig(model_dim=256, ff_hidden_dim=512, heads=4,
                       kv_heads=2, qkv_dim=64,
                       post_norm=C.PostNormType.SCALE)
    c = C.ModelConfig(model=C.Model.GEMMA2_2B, model_dim=256,
                      vocab_size=512, max_seq_len=256, num_layers=2,
                      att_cap=50.0, final_cap=30.0, weight=Type.SFP)
    c.layer_configs = [lc, lc]
    c.attention_window_sizes = [128, 256]
    return c


def measure_decode(config, kind: str, kv_kind: str, batch: int,
                   seq_len: int, steps: int, fill: float = 0.5,
                   need_prob: bool = True) -> dict:
    """Greedy decode throughput + fraction of HBM speed-of-light.

    `fill` sets the KV ring occupancy at measurement start.  The default
    (half-full) is the continuity config benched since round 1; at
    fill<1.0 the panel attention kernel still reads ALL allocated rows
    (docs/PERF.md §7), so the headline under-reports steady-state
    capability — the `ringfull` extra (fill≈1.0) is the number the kernel
    actually achieves once the ring is resident (VERDICT r4 weak #4)."""
    from gemma_tpu.models.gemma import forward
    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.utils.synth import synth_params

    params = jax.device_put(synth_params(config, kind=kind, seed=0))
    w_bytes = params_bytes(params)
    cache = KVCache.create(config, batch, seq_len, kind=kv_kind)
    # Keep pos+steps inside the ring so positions never wrap mid-loop.
    start_pos = min(int(seq_len * fill), seq_len - steps - 1)

    # Scan-over-layers decode (engine/scan_decode.py): opt-in via
    # GEMMA_SCAN_DECODE=1 — 8x smaller programs / 2x faster compiles but
    # 0.93x step time on v5e (scripts/scan_ablate.py), so the headline
    # stays on the unrolled step.
    fwd = forward
    if os.environ.get("GEMMA_SCAN_DECODE", "0") == "1":
        from gemma_tpu.engine.scan_decode import (build_scan_params,
                                                  forward_scan)

        sp = build_scan_params(params, config)
        if sp is not None:
            fwd, params = forward_scan, sp

    @jax.jit
    def decode_n(params, cache, first_tokens):
        def body(carry, _):
            prev, pos, cache = carry
            (tok, _), cache = fwd(params, prev[:, None], pos[:, None],
                                  cache, config, return_logits="top1",
                                  top1_need_prob=need_prob)
            tok = tok.astype(jnp.int32)
            return (tok, pos + 1, cache), tok

        pos0 = jnp.full((batch,), start_pos, jnp.int32)
        (_, _, cache), tokens = jax.lax.scan(
            body, (first_tokens, pos0, cache), None, length=steps)
        return tokens, cache

    from gemma_tpu.ops.autotune import _dispatch_overhead

    first = jnp.ones((batch,), jnp.int32)
    tokens, _ = decode_n(params, cache, first)
    np.asarray(tokens)  # full sync (block_until_ready unreliable on axon)

    overhead = _dispatch_overhead()
    dts = []
    for _ in range(2):
        t0 = time.monotonic()
        tokens, _ = decode_n(params, cache, first)
        np.asarray(tokens)
        dts.append(time.monotonic() - t0)
    # Subtract the fixed per-dispatch host->device latency (CLAUDE.md
    # methodology; ~24 ms on tunneled backends — 10% of a 32-step loop).
    dt = max(min(dts) - overhead, 1e-9)
    tok_s = batch * steps / dt

    # Speed-of-light: per decode step, the chip must read all weights once
    # (batch shares them) plus each query's live KV span.
    lc = config.layer_configs[0]
    kv_elt = {"f32": 4, "bf16": 2, "i8": 1}[kv_kind]
    kv_bytes_per_q = (len(config.layer_configs) * start_pos * 2
                      * lc.kv_heads * lc.qkv_dim * kv_elt)
    bytes_per_step = w_bytes + batch * kv_bytes_per_q
    sol = batch / (bytes_per_step / device_hbm_bw())
    del params, cache
    return {"tok_s": round(tok_s, 2), "sol": round(sol, 1),
            "vs_sol": round(tok_s / sol, 4), "dt_ms": round(dt * 1e3, 1),
            "w_gb": round(w_bytes / 1e9, 3)}


def measure_prefill(config, kind: str, batch: int, chunk: int,
                    seq_len: int, reps: int) -> dict:
    """Prefill throughput for one [batch, chunk] token chunk."""
    from gemma_tpu.models.gemma import forward
    from gemma_tpu.models.kv_cache import KVCache
    from gemma_tpu.utils.synth import synth_params

    params = jax.device_put(synth_params(config, kind=kind, seed=0))
    cache = KVCache.create(config, batch, seq_len)
    tokens = jnp.ones((batch, chunk), jnp.int32)
    positions = jnp.tile(jnp.arange(chunk, dtype=jnp.int32), (batch, 1))
    valid = jnp.ones((batch, chunk), bool)

    @jax.jit
    def run(params, cache):
        # All reps inside ONE executable (CLAUDE.md methodology: never
        # time separately-dispatched calls on the tunneled backend).
        def body(cache, _):
            _, cache = forward(params, tokens, positions, cache, config,
                               return_logits="none", valid=valid)
            return cache, ()

        cache, _ = jax.lax.scan(body, cache, None, length=reps)
        return cache

    from gemma_tpu.ops.autotune import _dispatch_overhead

    cache = run(params, cache)
    np.asarray(cache.kv[0, 0, 0, 0, 0])  # sync
    overhead = _dispatch_overhead()
    t0 = time.monotonic()
    cache = run(params, cache)
    np.asarray(cache.kv[0, 0, 0, 0, 0])
    dt = max(time.monotonic() - t0 - overhead, 1e-9) / reps
    del params, cache
    return {"tok_s": round(batch * chunk / dt, 1),
            "dt_ms": round(dt * 1e3, 2)}


def probe_backend(timeout_s: float = 300.0) -> str:
    """Resolve the JAX backend in a SUBPROCESS so a dead/hung TPU tunnel
    cannot take down (or hang) the bench process itself.

    Returns "tpu" (any non-cpu accelerator), "cpu", or "unavailable".
    BENCH_rN must never be an unparseable slot (VERDICT r3 weak #1): the
    caller downgrades "unavailable" to a CPU smoke run with an error field
    instead of dying at backend init.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; import sys; sys.exit(0 if jax.default_backend()"
             " != 'cpu' else 3)"],
            timeout=timeout_s, capture_output=True)
        if r.returncode == 0:
            return "tpu"
        if r.returncode == 3:
            return "cpu"
        print(f"backend probe rc={r.returncode}: "
              f"{r.stderr.decode(errors='replace')[-400:]}", file=sys.stderr)
        return "unavailable"
    except subprocess.TimeoutExpired:
        print(f"backend probe timed out after {timeout_s}s", file=sys.stderr)
        return "unavailable"
    except Exception as e:  # noqa: BLE001
        print(f"backend probe failed: {e}", file=sys.stderr)
        return "unavailable"


_RECORD: dict | None = None  # current best record, flushed on SIGTERM


def _emit(record: dict) -> None:
    """Print (and remember) the current record.  The driver takes the LAST
    parseable stdout line, so re-emitting after every extra means a kill at
    any point still leaves the freshest complete record on stdout
    (VERDICT r4 #1: BENCH_r03 rc=1 and BENCH_r04 rc=124 both parsed null
    because the old bench printed once, at the very end)."""
    global _RECORD
    _RECORD = record
    print(json.dumps(record), flush=True)


def _sigterm(signum, frame):  # noqa: ARG001
    """`timeout`'s SIGTERM lands between measurements (or mid-dispatch once
    the tunnel returns): flush the current record and exit cleanly."""
    if _RECORD is not None:
        rec = dict(_RECORD)
        rec["note"] = rec.get("note", "") + " [SIGTERM: remaining extras skipped]"
        print(json.dumps(rec), flush=True)
    sys.stdout.flush()
    os._exit(0)


def main() -> None:
    import signal

    signal.signal(signal.SIGTERM, _sigterm)
    t_start = time.monotonic()
    # Driver wall-clock budget in seconds (0 = unlimited): once exceeded,
    # remaining extras are recorded in "skipped" instead of risking a kill
    # mid-flight with nothing on stdout.
    deadline = float(os.environ.get("BENCH_DEADLINE", "0") or 0)

    from gemma_tpu.models.configs import config_gemma2_2b, config_gemma2_9b

    error = None
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # This environment pins JAX_PLATFORMS=axon via sitecustomize; honor
        # an explicit cpu request before the backend initializes.
        jax.config.update("jax_platforms", "cpu")
        on_tpu = False
    else:
        backend = probe_backend()
        if backend == "unavailable":
            # TPU unreachable: emit a structured record from a CPU smoke
            # run instead of rc=1 (BENCH_r03 died at backend init when the
            # axon tunnel was down).
            error = "tpu_unavailable"
            os.environ["JAX_PLATFORMS"] = "cpu"
            jax.config.update("jax_platforms", "cpu")
            on_tpu = False
        else:
            on_tpu = backend == "tpu"
    if on_tpu:
        batch, seq, steps = 16, 1024, 64
    else:  # smoke-test mode off-TPU
        batch, seq, steps = 4, 128, 4

    def cfg2b():
        return config_gemma2_2b() if on_tpu else smoke_config()

    extra: dict = {}
    skipped: list[str] = []

    print("measuring 2B i8 decode (serving default)...", file=sys.stderr)
    head = measure_decode(cfg2b(), "i8", "i8", batch, seq, steps)
    print(f"  {head}", file=sys.stderr)

    record = {
        "metric": "gemma2_2b_i8_decode_b16",
        "value": head["tok_s"],
        "unit": "tok/s",
        "vs_baseline": head["vs_sol"],
        "extra": extra,
    }
    if error:
        record["error"] = error
        record["note"] = "TPU unreachable; values are CPU smoke-mode only"
    _emit(record)  # headline on stdout BEFORE any extra can eat the clock

    def try_extra(name, fn):
        if deadline and time.monotonic() - t_start > deadline:
            skipped.append(name)
            record["skipped"] = skipped
            print(f"  {name}: skipped (past BENCH_DEADLINE)", file=sys.stderr)
            _emit(record)
            return
        try:
            r = fn()
            extra[name] = r
            print(f"  {name}: {r}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — extras must not sink the
            # headline JSON (e.g. 9B OOM on a smaller chip).
            print(f"  {name} failed: {str(e)[:120]}", file=sys.stderr)
        _emit(record)

    def slim(r):
        return {k: v for k, v in r.items() if k in ("tok_s", "vs_sol")}

    # Extras run FLAGSHIP-FIRST (VERDICT r4 #1b): the 27B/9B numbers are
    # the ones two rounds of driver kills erased; the 2B codec zoo and
    # prefill continuity numbers come last.
    print("measuring extras (flagship-first)...", file=sys.stderr)
    if on_tpu:
        from gemma_tpu.models.configs import config_gemma2_27b

        # 27B at the true 4.5-bit footprint (~15.3 GB): the only layouts
        # that fit one 16 GB chip (bf16 is 54 GB, byte codecs 27 GB).
        # Target (VERDICT r2 #1): >= 60 tok/s on one chip.
        try_extra("gemma2_27b_i4_decode_b4", lambda: slim(measure_decode(
            config_gemma2_27b(), "i4", "i8", 4, 512, 16)))
        try_extra("gemma2_27b_nuq4_decode_b4", lambda: slim(measure_decode(
            config_gemma2_27b(), "nuq4", "i8", 4, 512, 16)))
        # 9B i8 (9.3 GB; the serving default) + KV: batch 8, seq 512.
        try_extra("gemma2_9b_i8_decode_b8", lambda: slim(measure_decode(
            config_gemma2_9b(), "i8", "i8", 8, 512, 16)))
    # Steady-state decode: ring-full cache (the half-full headline makes
    # the panel kernel read 2x the live span — VERDICT r4 weak #4).
    try_extra("gemma2_2b_i8_decode_b16_ringfull", lambda: slim(
        measure_decode(cfg2b(), "i8", "i8", batch, seq, steps, fill=1.0)))
    # A/B for the top1 head's in-kernel tanh+exp (VERDICT r4 #2): same
    # tokens (monotonic argmax), prob skipped — prices what StreamToken's
    # prob costs at vocab=256K.
    try_extra("gemma2_2b_i8_decode_b16_noprob", lambda: slim(
        measure_decode(cfg2b(), "i8", "i8", batch, seq, steps,
                       need_prob=False)))
    try_extra("gemma2_2b_i4_decode_b16", lambda: slim(measure_decode(
        cfg2b(), "i4", "i8", batch, seq, steps)))
    try_extra("gemma2_2b_sfp_decode_b16", lambda: slim(measure_decode(
        cfg2b(), "sfp", "bf16", batch, seq, steps)))
    # North-star bit-exact-LUT codec (VERDICT r2 #2); slow by measured
    # gather ceiling (docs/PERF.md) but kept for continuity.
    try_extra("gemma2_2b_nuq4_decode_b16", lambda: slim(measure_decode(
        cfg2b(), "nuq4", "i8", batch, seq, steps)))
    # i8 prefill (VERDICT r2 #4): at M=256*4 rows the GEMMs are
    # MXU-bound, but i8's cheaper decode leaves more VPU headroom.
    try_extra("gemma2_2b_i8_prefill_b4x256", lambda: {
        "tok_s": measure_prefill(cfg2b(), "i8", 4, 256 if on_tpu else 32,
                                 seq, reps=16 if on_tpu else 2)["tok_s"]})
    try_extra("gemma2_2b_sfp_prefill_b4x256", lambda: {
        "tok_s": measure_prefill(cfg2b(), "sfp", 4, 256 if on_tpu else 32,
                                 seq, reps=16 if on_tpu else 2)["tok_s"]})
    # The chunk the engine auto-selects at serving batches (engine.py:
    # prefill_chunk — 512 at b>=2, the measured winner, docs/PERF.md §5).
    if on_tpu:
        try_extra("gemma2_2b_i8_prefill_b4x512", lambda: {
            "tok_s": measure_prefill(cfg2b(), "i8", 4, 512, 2048,
                                     reps=8)["tok_s"]})
    if on_tpu:
        try_extra("gemma2_9b_sfp_decode_b8", lambda: slim(measure_decode(
            config_gemma2_9b(), "sfp", "bf16", 8, 512, 16)))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the driver parses stdout; a
        # traceback with rc!=0 loses the round's bench slot entirely.
        import traceback

        traceback.print_exc()
        if _RECORD is not None:
            # The headline already landed; keep it as the last parseable
            # line (annotated) instead of clobbering it with a zero record.
            rec = dict(_RECORD)
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
            print(json.dumps(rec))
        else:
            print(json.dumps({
                "metric": "gemma2_2b_i8_decode_b16", "value": 0.0,
                "unit": "tok/s", "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            }))
        sys.exit(0)
