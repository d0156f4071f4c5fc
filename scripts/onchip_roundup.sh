#!/bin/bash
# One-shot on-chip measurement roundup for when the axon relay is up.
# Run from the repo root:  bash scripts/onchip_roundup.sh [outdir]
# Each stage is individually time-bounded so one wedge doesn't eat the rest.
set -u
OUT=${1:-/tmp/onchip_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
# `python scripts/x.py` puts scripts/ (not the repo root) on sys.path
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "exit=$? (log: $OUT/$name.log)"
  tail -5 "$OUT/$name.log"
}

run validate   590  python scripts/onchip_validate.py
run int4sweep  900  python scripts/int4_sweep.py
run vitab      900  python scripts/vit_attn_ab.py
run bench      3300 python bench.py
run decomp     900  python bench.py --only triad_decomposition
run train      1200 python bench.py --only train_step_multimodal
run cbbench    1800 python scripts/cb_bench.py --draft_k 8
run evalscale  3000 python scripts/eval_at_scale.py --n 512
run evalcb     3000 python scripts/eval_at_scale.py --n 512 --continuous_batching
run e2e        2400 python tools_e2e_smoke.py
echo "=== all done; logs in $OUT ==="
