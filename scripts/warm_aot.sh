#!/bin/bash
# Re-warm every AOT executable bench.py's driver run expects, in priority
# order (headline first).  Run on the real TPU after any container reset:
# .aot/ and .jax_cache/ are gitignored, so a fresh checkout starts cold and
# the driver's `python bench.py` would pay the full multi-minute compile and
# skip every AOT-gated extra (batched / v2 / LCM / ControlNet rows).
#
#   bash scripts/warm_aot.sh
#
# --warm-only: measurement rows go to scripts/warm_r4_sweep*.json; the
# committed round-4 sweep evidence (results_r4_sweep*.json) is never
# overwritten by a re-warm.
#
# ~45-60 min total on v5e (each config is a fresh process so the dumped
# executable is NOT a persistent-cache restore, which XLA cannot
# re-serialize — see scripts/perf_r4_sweep.py).
set -e
cd "$(dirname "$0")/.."
python scripts/perf_r4_sweep.py --warm-only --pipeline v1 1 8   # headline + best-batch
python scripts/perf_r4_sweep.py --warm-only --pipeline s10      # 10-step slope execs
python scripts/perf_r4_sweep.py --warm-only 1 8                 # v2 + LCM b1
python scripts/perf_r4_sweep.py --warm-only --pipeline lcm 8    # LCM best-batch
python scripts/perf_r4_sweep.py --warm-only --pipeline cn       # v1+ControlNet
echo "warm_aot: all executables dumped to .aot/"
