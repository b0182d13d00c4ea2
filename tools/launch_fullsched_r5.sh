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
