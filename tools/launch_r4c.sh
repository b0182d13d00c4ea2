#!/bin/sh
# r4c full-schedule A/B (PERF.md round-4 root-cause section): the r4b
# config (c2f 150->300^3, 22/22/10, 512^2, stage3 tail_deficit gamma=2)
# with the two last-view fixes ON (trainer defaults since commits
# b6a860b + a31b8de: train_depth_cap_band=6 depth-anchored compaction
# window, replay-pool mask stamping).  Out dir is PERSISTENT
# (/root/repo/.runs, gitignored) so a later session can resume after a
# VM recycle: re-running this script resumes from the last checkpoint.
cd /root/repo || exit 1
mkdir -p reports
# per-attempt timeout (ADVICE r4): the documented tunnel failure mode is
# a dispatch that HANGS; the run checkpoints every 5 epochs with resume,
# so killing and re-entering is safe
for i in $(seq 1 30); do
    timeout 10800 python tools/run_full_schedule.py \
        --out /root/repo/.runs/fullsched_r4c \
        --grid_init 150 --upsamp 1500 3000 4500 6500 \
        --stages 22 22 10 \
        --stage3_balance tail_deficit --stage3_gamma 2 \
        --report /root/repo/reports/fullsched_r4c.jsonl \
        && break
    echo "attempt $i failed; resuming in 120 s" >&2
    sleep 120
done
# preserve the summary even if this run completes unattended between
# builder sessions (VM recycles wipe /tmp; reports/ is tracked)
if [ -s reports/fullsched_r4c.jsonl ]; then
    git add reports/fullsched_r4c.jsonl
    git commit -q -m "r4c full-schedule A/B summary (auto-recorded on run completion)" \
        || true
fi
