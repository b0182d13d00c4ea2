#!/bin/sh
# Tunnel liveness watcher — sole writer of /tmp/tpu_now.txt.
# Probes the axon tunnel with a REAL dispatch every 3 min (devices()
# alone succeeds during outages).  Survives VM recycles only if
# relaunched — round-start one-liner (documented in CLAUDE.md):
#   nohup sh /root/repo/tools/tpu_watch.sh >/dev/null 2>&1 &
# Writes a heartbeat even while alive so staleness is detectable.
cd /root/repo || exit 1
while :; do
    if timeout 150 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
        echo "alive $(date -u +%FT%TZ)" > /tmp/tpu_now.txt
    else
        echo "dead $(date -u +%FT%TZ)" > /tmp/tpu_now.txt
    fi
    sleep 180
done
