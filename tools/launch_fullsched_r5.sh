#!/bin/sh
# Round-5 full-schedule runs (VERDICT r5 items 1+5): the r4c config with
# the scene-aware eval z-cull fix (supervised_z_floor — the r4c 9.09 dB
# last view re-evaluates at 36.9 on the same checkpoint) live through
# BOTH eval and the expansion renders.  Two arms for the stage-3 A/B:
#   sh tools/launch_fullsched_r5.sh uniform
#   sh tools/launch_fullsched_r5.sh tail_deficit
# Out dirs are PERSISTENT (/root/repo/.runs, gitignored) so a later
# session can resume after a VM recycle.  Each attempt is wrapped in a
# generous timeout (ADVICE r4: the documented tunnel failure mode is a
# dispatch that HANGS; the run checkpoints every 5 epochs with resume,
# so killing and re-entering is safe).
cd /root/repo || exit 1
mkdir -p reports
BAL="${1:-uniform}"
# Session-2 insert: the tail_deficit arm is the queue's LAST long chip
# item — before burning ~90 min on it, land the two short bench items
# that the round is judged on (idempotent; ~20 min total):
#   1. the adaptive mask-regime A/B on the production checkpoint,
#   2. a bench.py re-validation with the pool-3 headline fix.
if [ "$BAL" = "tail_deficit" ]; then
    if [ ! -s reports/adaptive_pool_ab_r5.json ]; then
        timeout 3600 python tools/bench_adaptive_pool_ab.py \
            --json reports/adaptive_pool_ab_r5.json \
            > reports/adaptive_pool_ab_r5.stdout 2>&1
        git add reports/adaptive_pool_ab_r5.json reports/adaptive_pool_ab_r5.stdout
        git commit -q -m "adaptive mask-regime A/B on the production checkpoint" || true
    fi
    if [ "$(grep -c '"metric"' reports/bench_r5_validation.log 2>/dev/null || echo 0)" -lt 2 ]; then
        echo "=== chip_queue: bench r5 re-validation (pool-3 headline) $(date -u +%FT%TZ)" \
            >> reports/bench_r5_validation.log
        python bench.py >> reports/bench_r5_validation.log 2>&1
        git add reports/bench_r5_validation.log
        git commit -q -m "bench.py r5 re-validation (pool-3 adaptive headline)" || true
    fi
fi
OUT="/root/repo/.runs/fullsched_r5_${BAL}"
REP="/root/repo/reports/fullsched_r5.jsonl"
for i in $(seq 1 30); do
    timeout 10800 python tools/run_full_schedule.py \
        --out "$OUT" \
        --grid_init 150 --upsamp 1500 3000 4500 6500 \
        --stages 22 22 10 \
        --stage3_balance "$BAL" --stage3_gamma 2 \
        --report "$REP" \
        && break
    echo "attempt $i ($BAL) failed/stalled; resuming in 120 s" >&2
    sleep 120
done
if [ -s "$REP" ]; then
    git add "$REP"
    git commit -q -m "r5 full-schedule summary ($BAL arm, auto-recorded)" || true
fi
