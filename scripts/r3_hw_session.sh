#!/bin/bash
# Round-3 hardware session: run when the axon TPU tunnel is up.
#
#   bash scripts/r3_hw_session.sh [stage...]
#
# Stages (default: all, in order):
#   parity aotmc tune16 tune27b tune9b tune256 ablate fusedab bench
# Each stage logs to /tmp/r3hw/<stage>.log.  A parity failure is RECORDED
# and the session continues (tunnel windows are scarce; sweeps/bench data
# is still worth collecting) — check parity.log before trusting kernels.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3hw
stages=${@:-"parity aotmc tune16 tune27b tune9b tune256 ablate fusedab bench"}

run() {  # run <name> <timeout-s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name ==="
    timeout "$tmo" python -u "$@" 2>&1 | tee "/tmp/r3hw/$name.log"
    return ${PIPESTATUS[0]}
}

for s in $stages; do
    case $s in
    parity)
        # Native-lowering parity for every round-3 kernel (fused
        # prologue/epilogue, top1 head, i4).  Record-and-continue on
        # failure (see header).
        run parity 3600 scripts/tpu_parity.py || echo "PARITY FAILED — investigate /tmp/r3hw/parity.log" ;;
    aotmc)
        # AOT-compile the round-3 SP/CP/PP shard_map bodies for a v5e 2x4
        # topology: catches Mosaic lowering failures CPU tests cannot see.
        run aotmc 3600 scripts/aot_multichip.py ;;
    tune16)
        # 2B decode shapes at M-bucket 16: the round-2 cache predates the
        # fused qkv_cat GEMM (16, 2304, 4096) and the i4 codec, so the
        # headline bench would otherwise run them on default tiles.
        run tune16 7200 scripts/tune.py gemma2_2b --kinds i8,i4,nuq4 --ms 16 ;;
    tune27b)
        # Re-sweep 27B decode shapes: the first sweep ran with the old
        # reps formula (4x too few loop iters for 0.5-byte codecs).
        # --ms 8 covers the b4 bench too (_m_bucket rounds 4 -> 8).
        run tune27b 10800 scripts/tune.py gemma2_27b --kinds i4,nuq4 --ms 8 ;;
    tune9b)
        run tune9b 5400 scripts/tune.py gemma2_9b --kinds i8,i4 --ms 8 ;;
    tune256)
        # Prefill M256 sweeps (VERDICT r2 #4: cache had no M256 i8).
        run tune256 10800 scripts/tune.py gemma2_2b --kinds i8,sfp,i4 --ms 256 ;;
    ablate)
        run ablate 3600 scripts/decode_ablate.py --kind i8 ;;
    fusedab)
        # A/B the fused write+attend+rope kernel vs composed kernels
        # (GEMMA_FUSED_DECODE=0): headline decode only.
        GEMMA_FUSED_DECODE=0 run fusedab 5400 bench.py ;;
    bench)
        run bench 10800 bench.py ;;
    *) echo "unknown stage $s"; exit 2 ;;
    esac
done
