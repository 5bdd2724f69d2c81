#!/bin/bash
# Round-5 one-session measurement campaign (VERDICT r4 items 1, 2, 4, 5, 7
# and the new composition rows).  Everything runs SERIALLY in one session
# against the same chip so every claim references the same session's headline
# (docs/performance.md "cross-run variance" rule).  No kills: each step is a
# fresh process; a worker crash self-recovers in ~1-3 min and the next step's
# preflight catches a wedged tunnel.
set -u
LOG=${1:-/tmp/campaign_r5.log}
cd "$(dirname "$0")/.."
echo "=== campaign_r5 start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

step() {
  echo "--- STEP: $* --- $(date -u +%T)" | tee -a "$LOG"
  "$@" 2>&1 | grep -viE "^warning.*axon|platform 'axon' is experimental" | tee -a "$LOG"
  echo "--- exit=$? --- $(date -u +%T)" | tee -a "$LOG"
}

# 1. headline + the new frontier-tier legs (tome_r13, quant_tome_r13) and the
#    stabilized int8 leg (30x5) — this run also warms the compile cache the
#    driver's end-of-round bench.py will reuse (VERDICT r4 items 4, 5)
step python bench.py

# 2. training re-baseline: fused_train reference point, the MAE row
#    RE-MEASURED after f3be090 moved the decoder onto the fused kernels
#    (VERDICT r4 item 2), and the train-time ToMe row at the validated
#    chunk=2 default (VERDICT r4 item 1's record row)
step python scripts/bench_train.py --skip-parity --paths fused_train,mae,tome:13

# 3. end-to-end b16_wide (heads=6, dh=128): what the fixed-T floor becomes at
#    full MXU lane occupancy (VERDICT r4 item 7; kernel A measured +17%)
step python scripts/bench_variants.py --configs vit_b_16_wide:100

# 3b. the teacher-leg delta (VERDICT r4 item 3's measured number): DeiT-B
#     student on fused_train, frozen B/16 teacher on xla vs fused vs W8A8
step python scripts/bench_train.py --skip-parity --paths distill:xla,distill:fused,distill:int8

# 3c. ToMe x drop-path ONLY (the DeiT/ToMe-paper recipe) via the
#     stochastic-depth lerp around the clean kernels.  MEASURED OUTCOME:
#     still hard-faults the worker at run time (the merged-token train
#     chain itself is at the envelope edge) — kept here as the minimal
#     repro; the full-recipe row of record is the xla tier (step 3d)
step python scripts/bench_train.py --skip-parity --paths tome_dp:13

# 3d. the full ToMe recipe at the xla tier (pure jnp, no envelope) —
#     measured clean: 80.5 / 85.0 ms/step
step python scripts/bench_train.py --skip-parity --paths tome_xla:13,tome_xla_reg:13

# 4. LAST because a worker fault here can wedge the tunnel for a long time:
#    ToMe x dropout/drop-path (the paper's full recipe).  The default chunk=2
#    chain hard-faulted the worker on first try — sweep chunks in SEPARATE
#    processes so one fault doesn't take down the rest, smallest events
#    first (the round-4 finding: the train chain's failing resource is
#    per-merge-event size).
step python scripts/bench_train.py --skip-parity --paths tome_reg:13:1
step python scripts/bench_train.py --skip-parity --paths tome_reg:13:2
step python scripts/bench_train.py --skip-parity --paths tome_reg:13:4

echo "=== campaign_r5 done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
