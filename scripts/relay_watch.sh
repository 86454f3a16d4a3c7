#!/bin/bash
# Probe the TPU relay with a bounded device op every 180 s; exit 0 the
# moment it answers (CLAUDE.md probe protocol — init can hang for minutes
# under the outage, so every probe runs under timeout in a subprocess).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/relay_watch.log
while true; do
  if timeout 120 python - >>"$LOG" 2>&1 <<'EOF'
import jax, jax.numpy as jnp, time
t0 = time.time()
x = jnp.ones((8, 8)).sum()
x.block_until_ready()
assert float(x) == 64.0
print(f"RELAY UP {jax.devices()} probe={time.time()-t0:.1f}s", flush=True)
EOF
  then
    echo "RELAY UP at $(date -u +%FT%TZ)" | tee -a "$LOG"
    exit 0
  fi
  echo "relay down at $(date -u +%FT%TZ)" >> "$LOG"
  sleep 180
done
