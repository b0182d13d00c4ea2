#!/bin/sh
# Ordered unattended chip work (round 5).  Run whenever the axon tunnel
# is alive (tools/tpu_gate.sh execs this when a probe dispatch
# succeeds).  Each stage is idempotent: completed stages are skipped on
# re-entry, results land in tracked reports/ and are committed so an
# unattended completion survives VM recycles.
#
# Round-5 session-2 reorder: the bench validation and the farm
# concurrency probe are the round's CRITICAL chip items (the driver's
# end-of-round bench run and VERDICT r5 item 3); the stage-3
# tail_deficit A/B arm (VERDICT item 5 "show a win or retire") runs
# LAST — if the round ends first, the knob is retired on the r4
# negative evidence instead.
#
# Stage progress snapshots go to reports/chip_queue_status.txt every
# stage so a stall is visible in tracked files (VERDICT r4 item 7).
cd /root/repo || exit 1
mkdir -p reports

note() {
    echo "$(date -u +%FT%TZ) $*" >> reports/chip_queue_status.txt
    git add reports/chip_queue_status.txt
    git commit -q -m "chip_queue: status ($*)" || true
}

# CPU-only (~1 min/arm) step-rate + phase-share analysis of whichever
# schedule arms have landed; idempotent per arm, so it runs right after
# the uniform arm AND again at queue end for the tail_deficit arm
analyze_arms() {
    for arm in uniform tail_deficit; do
        if grep -hq "\"stage3_balance\": \"$arm\"" reports/fullsched_r5.jsonl 2>/dev/null \
           && [ ! -s "reports/fullsched_r5_analysis_${arm}.txt" ]; then
            {
                echo "=== arm: $arm"
                env PALLAS_AXON_POOL_IPS= python tools/analyze_schedule_run.py \
                    "/root/repo/.runs/fullsched_r5_${arm}/log"
                env PALLAS_AXON_POOL_IPS= python tools/report_phases.py \
                    "/root/repo/.runs/fullsched_r5_${arm}/log"
            } > "reports/fullsched_r5_analysis_${arm}.txt" 2>&1
            git add "reports/fullsched_r5_analysis_${arm}.txt"
            git commit -q -m "r5 schedule run analysis ($arm arm)" || true
            note "analysis done ($arm)"
        fi
    done
}

# 1) r5 full schedule, uniform stage-3 arm: end-to-end validation of the
#    scene-aware eval z-cull fix (per-view targets: min >= 25, mean >= 32)
if ! grep -hq '"stage3_balance": "uniform"' reports/fullsched_r5.jsonl 2>/dev/null; then
    note "stage1 start: fullsched r5 uniform"
    sh tools/launch_fullsched_r5.sh uniform
    note "stage1 done"
fi

# 1b) saturation diag on the newest production checkpoint: measures the
#     adaptive ladder's expected rung residency on a CONVERGED field
#     (live counts, sat_frac at K=16, escalation-need histogram) — the
#     data behind the bench headline's field choice
CKPT=$(ls -t /root/repo/.runs/fullsched_*/log/*/fullsched_final.npz 2>/dev/null | head -1)
if [ -n "$CKPT" ] && [ ! -s reports/prod_field_diag_r5.json ]; then
    note "stage1b start: production field saturation diag"
    timeout 3600 python tools/bench_field_diag.py --ckpt "$CKPT" \
        --json reports/prod_field_diag_r5.json \
        > reports/prod_field_diag_r5.stdout 2>&1
    git add reports/prod_field_diag_r5.json reports/prod_field_diag_r5.stdout
    git commit -q -m "production-field saturation diag (adaptive rung residency)" || true
    note "stage1b done"
fi

analyze_arms

# 2) bench.py round-5 validation (repacking adaptive renderer).  NO outer
#    timeout: bench.py's own watchdog is the sole deadline (ADVICE r4
#    high — an outer timeout orphaned the grandchild and let two runs
#    contend for the one host core).
if ! grep -hq '"metric"' reports/bench_r5_validation.log 2>/dev/null; then
    note "stage2 start: bench r5 validation"
    echo "=== chip_queue: bench r5 validation $(date -u +%FT%TZ)" \
        >> reports/bench_r5_validation.log
    python bench.py >> reports/bench_r5_validation.log 2>&1
    git add reports/bench_r5_validation.log
    git commit -q -m "bench.py round-5 TPU validation log" || true
    note "stage2 done"
fi

# 3) farm concurrency residue measurement (VERDICT r5 item 3: replace
#    the /8 extrapolation with a measured host-contention factor)
if [ ! -s reports/farm_concurrency_r5.json ]; then
    note "stage3 start: farm concurrency probe"
    timeout 7200 python tools/farm_concurrency_probe.py --n 2 \
        --json reports/farm_concurrency_r5.json \
        > reports/farm_concurrency_r5.stdout 2>&1
    git add reports/farm_concurrency_r5.json reports/farm_concurrency_r5.stdout
    git commit -q -m "farm concurrency probe: measured host residue (2 pipelines, 1 chip)" || true
    note "stage3 done"
fi

# 4) stage-3 A/B second arm (VERDICT r5 item 5: show a win or retire
#    tail_deficit)
if ! grep -hq '"stage3_balance": "tail_deficit"' reports/fullsched_r5.jsonl 2>/dev/null; then
    note "stage4 start: fullsched r5 tail_deficit"
    sh tools/launch_fullsched_r5.sh tail_deficit
    note "stage4 done"
fi

# final pass: any arm that landed while this queue was running
analyze_arms
note "queue drained"
