#!/bin/sh
# Tunnel gate: probe the axon tunnel with a REAL dispatch (devices()
# alone succeeds during outages); when it answers, exec the tracked
# chip-work queue.  Tracked copy: tools/tpu_gate.sh; run as: nohup sh tools/tpu_gate.sh &
cd /root/repo || exit 1
probe() {
    timeout 150 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1
}
# status goes to the gate's OWN marker — /tmp/tpu_now.txt belongs to
# tools/tpu_watch.sh (two writers race and the gate's one-shot "alive"
# goes stale after it exits the loop; ADVICE round 4).
while :; do
    if probe; then
        echo "alive $(date -u +%FT%TZ)" > /tmp/tpu_gate_probe.txt
        break
    fi
    echo "dead $(date -u +%FT%TZ)" > /tmp/tpu_gate_probe.txt
    sleep 180
done
exec sh tools/chip_queue.sh >> /tmp/chip_queue.log 2>&1
