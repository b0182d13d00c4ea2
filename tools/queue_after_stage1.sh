#!/bin/sh
# One-shot waiter (round-5 session 2): the stage-1 uniform full-schedule
# run is in flight under its original launcher; when its report line
# lands in reports/fullsched_r5.jsonl (the launcher commits it), re-enter
# the reordered chip queue (diag -> bench -> farm probe -> tail_deficit
# arm -> analysis).  Exits instead of re-entering if another chip_queue
# is already running (PID file).
cd /root/repo || exit 1
PIDFILE=/tmp/chip_queue.pid
while ! grep -q '"stage3_balance": "uniform"' reports/fullsched_r5.jsonl 2>/dev/null; do
    sleep 60
done
sleep 30
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    exit 0
fi
echo $$ > "$PIDFILE"
exec sh tools/chip_queue.sh
