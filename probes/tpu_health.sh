#!/bin/bash
# Poll the TPU tunnel until a trivial op completes; log transitions.
while true; do
  if timeout 120 python -u -c "
import jax, jax.numpy as jnp, numpy as np
assert np.asarray(jnp.arange(4, dtype=jnp.uint32) + 1)[0] == 1
print('TPU OK')" >/tmp/tpu_health_last.log 2>&1; then
    echo "$(date +%H:%M:%S) TPU OK" >> /tmp/tpu_health.log
    exit 0
  else
    echo "$(date +%H:%M:%S) tpu hung/err" >> /tmp/tpu_health.log
  fi
  sleep 60
done
