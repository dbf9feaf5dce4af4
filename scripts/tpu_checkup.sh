#!/bin/sh
# Post-outage / post-change TPU measurement queue: one command to
# re-measure the headline numbers and A/B the env-gated optimizations.
# Each step prints its own timing line; compare against BASELINE.md.
#
# Usage: sh scripts/tpu_checkup.sh [users items dim]   (default 50k MSD-ish)
set -x
U=${1:-50000}; I=${2:-40000}; D=${3:-512}

# 1. The driver's benchmark (safer2 ML-1M dim=32, users/s/chip + vs_baseline)
python bench.py

# 2. Synthetic MSD-shape epoch at the north-star dim
python scripts/bench_scale.py "$U" "$I" "$D" safer2

# 3. A/B: Woodbury-group overlap (commit 5028f36; narrow-bucket pipelines)
FRT_NO_WOOD_OVERLAP=1 python scripts/bench_scale.py "$U" "$I" "$D" safer2

# 4. A/B: eigenbasis-rotated direct path (kills the c1*G slab add)
FRT_NO_ROTATE=1 python scripts/bench_scale.py "$U" "$I" "$D" safer2

# 5. ML-1M dim=512 epoch (the BASELINE.md 78 ms row) via the profiler
python scripts/profile_epoch.py 2>/dev/null || true
