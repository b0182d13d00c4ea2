#!/bin/sh
# Ordered unattended chip work (round 4).  Run whenever the axon tunnel
# is alive (the /tmp/tpu_gate.sh watcher execs this when a probe
# dispatch succeeds).  Each stage is idempotent: completed stages are
# skipped on re-entry, results land in tracked reports/ and are
# committed so an unattended completion survives VM recycles.
cd /root/repo || exit 1
mkdir -p reports

# 1) bench.py adaptive-headline validation (queued since the round-4
#    rewrite: 30-epoch fit + acc-gated ladder has only run under CPU
#    tests).  The JSON line in the log marks completion.
if ! grep -hq '"metric"' reports/bench_r4_validation.log 2>/dev/null; then
    echo "=== chip_queue: bench validation $(date -u +%FT%TZ)" \
        >> reports/bench_r4_validation.log
    timeout 2700 python bench.py >> reports/bench_r4_validation.log 2>&1
    git add reports/bench_r4_validation.log
    git commit -q -m "bench.py adaptive-headline TPU validation log" || true
fi

# 2) the r4c full-schedule A/B (resumable; launch_r4c.sh auto-commits
#    its summary to reports/fullsched_r4c.jsonl on completion)
if [ ! -s reports/fullsched_r4c.jsonl ]; then
    sh tools/launch_r4c.sh
fi
# 2b) r4c evidence: per-milestone step rates + phase shares (the
#     bootstrap_support_pool sub-timers land here — ROADMAP perf #2)
if [ -s reports/fullsched_r4c.jsonl ] && [ ! -s reports/fullsched_r4c_analysis.txt ]; then
    {
        env PALLAS_AXON_POOL_IPS= python tools/analyze_schedule_run.py \
            /root/repo/.runs/fullsched_r4c/log
        env PALLAS_AXON_POOL_IPS= python tools/report_phases.py \
            /root/repo/.runs/fullsched_r4c/log
    } > reports/fullsched_r4c_analysis.txt 2>&1
    git add reports/fullsched_r4c_analysis.txt
    git commit -q -m "r4c run analysis: step rates + phase shares (incl. support-pool sub-timers)" || true
fi

# 3) select-lowering sweep (PERF.md promise: sort|topk|rank first_k_live
#    lowerings at the production chunk)
if [ ! -s reports/select_sweep_r4.jsonl ]; then
    timeout 2700 python tools/profile_compact_eval.py \
        --selects sort topk rank --skip_counts \
        --report reports/select_sweep_r4.jsonl \
        > reports/select_sweep_r4.stdout 2>&1
    git add reports/select_sweep_r4.jsonl reports/select_sweep_r4.stdout
    git commit -q -m "select-lowering sweep numbers (first_k_live sort/topk/rank)" || true
fi

# 4) chunk-size sweep: the per-chunk cost has a K-independent floor
#    partly made of dispatch latency through the tunnel; if 32k/64k
#    chunks amortize it, bench.py's headline chunk should be retuned
if [ ! -s reports/chunk_sweep_r4.jsonl ]; then
    timeout 2700 python tools/profile_compact_eval.py \
        --chunks 32768 65536 --ks 16 32 64 --skip_counts \
        --report reports/chunk_sweep_r4.jsonl \
        > reports/chunk_sweep_r4.stdout 2>&1
    git add reports/chunk_sweep_r4.jsonl reports/chunk_sweep_r4.stdout
    git commit -q -m "chunk-size sweep at eval compact-K (dispatch-floor amortization)" || true
fi
