#!/bin/sh
# Tunnel liveness watcher — sole writer of /tmp/tpu_now.txt.
# Survives VM recycles only if relaunched — round-start one-liner
# (documented in CLAUDE.md):
#   nohup sh /root/repo/tools/tpu_watch.sh >/dev/null 2>&1 &
# Writes a heartbeat even while alive so staleness is detectable.
#
# Liveness evidence, in order of preference:
#   1. recent write activity under /root/repo/.runs — chip work is
#      PROGRESSING, which implies the tunnel is alive, costs nothing,
#      and avoids the false-dead a probe dispatch reads when the one
#      host core + the chip's dispatch queue are saturated by a
#      training run (observed round 5: probe said dead for 17 min
#      while the schedule run advanced 3000 steps);
#   2. a REAL probe dispatch (devices() alone succeeds during outages)
#      only when nothing is visibly progressing.
cd /root/repo || exit 1
while :; do
    if [ -n "$(find /root/repo/.runs -type f -newermt '-150 seconds' -print -quit 2>/dev/null)" ]; then
        echo "alive $(date -u +%FT%TZ) (run-progress)" > /tmp/tpu_now.txt
    elif timeout 150 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
        echo "alive $(date -u +%FT%TZ) (probe)" > /tmp/tpu_now.txt
    else
        echo "dead $(date -u +%FT%TZ)" > /tmp/tpu_now.txt
    fi
    sleep 180
done
