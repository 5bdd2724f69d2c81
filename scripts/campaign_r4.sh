#!/bin/bash
# Round-4 one-session measurement campaign (VERDICT r3 items 1-gate, 2-sweep,
# 3, 4, 5, 7, 8).  Everything below runs SERIALLY in one session against the
# same chip so every claim references the same session's headline
# (docs/performance.md "cross-run variance" rule).  No kills: each step is a
# fresh process; a worker crash self-recovers in ~1-3 min and the next step's
# preflight catches a wedged tunnel.
set -u
LOG=${1:-/tmp/campaign_r4.log}
cd "$(dirname "$0")/.."
echo "=== campaign_r4 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

step() {
  echo "--- STEP: $* --- $(date -u +%T)" | tee -a "$LOG"
  "$@" 2>&1 | grep -viE "^warning.*axon|platform 'axon' is experimental" | tee -a "$LOG"
  echo "--- exit=$? --- $(date -u +%T)" | tee -a "$LOG"
}

# 1. headline (also the session's reference point for every later claim)
step python bench.py

# 2. ToMe sweep on B/16: r=14/16 previously hard-faulted the unrolled chain;
#    the chunked schedule (round 4) is the fix under test.  13 first so the
#    known-good r lands even if 14/16 still fault.
step python scripts/bench_tome.py --r 0,13,8,14,16

# 3. L/16 sweep (r=13 previously faulted) + DeiT flagship target
step python scripts/bench_tome.py --config vit_l_16 --batch 50 --r 0,13
step python scripts/bench_tome.py --config deit_b_16 --r 13

# 3b. int8 x ToMe composition (round-4 feature): both throughput levers
step python scripts/bench_tome.py --ops quant --r 0,13

# 4. training: regularizer overhead gate (<10%), MAE row, train-time ToMe row
step python scripts/bench_train.py --skip-parity --paths fused_train,reg,mae,tome:13

# 5. kernel A at dh=128 (floor thesis)
step python scripts/bench_kernels.py --which a,awide

# 6. serving selftest, plain + tome, same session
step python -m vit_tpu.cli.serve --weights /root/reference/Network \
  --allow-synth-weights --selftest 40 --staged --max-batch 100 --batch-pad 100
step python -m vit_tpu.cli.serve --weights /root/reference/Network \
  --allow-synth-weights --selftest 40 --staged --max-batch 100 --batch-pad 100 \
  --tome 13

# 7. best-tier serving: int8 x ToMe through the daemon (round-4 feature)
step python -m vit_tpu.cli.serve --weights /root/reference/Network \
  --allow-synth-weights --selftest 40 --staged --max-batch 100 --batch-pad 100 \
  --ops quant --tome 13

echo "=== campaign_r4 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
