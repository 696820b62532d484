#!/bin/bash
# Serialized TPU kernel-health probe: retries the REAL traversal kernel
# (fresh or cached compile) against the CPU-exact expected trace until
# ALL mismatch counts are zero. Appends to /tmp/probe_loop.log and writes
# /tmp/kernel_healthy on success. Never run concurrently with any other
# TPU process.
cd "$(dirname "$0")/.."
LOG=/tmp/probe_loop.log
rm -f /tmp/kernel_healthy
if [ ! -f /tmp/expected_trace.npz ]; then
  echo "missing /tmp/expected_trace.npz — run scripts/make_expected_trace.py first" | tee -a "$LOG"
  exit 1
fi
probe() {
  timeout 560 python -u -c "
from raytracer_tpu.utils import jaxcache; jaxcache.enable()
import numpy as np, jax
import jax.numpy as jnp
from raytracer_tpu.scene.builder import reference_scene
from raytracer_tpu.ops.pallas_traverse import trace_closest_pallas
scene = reference_scene(assets_dir='assets/models', build_bvh=True)
rng = np.random.default_rng(3)
n = 2048
o = jnp.asarray(rng.uniform(-0.28, 0.28, (n,3)).astype(np.float32))
dd = rng.normal(size=(n,3)).astype(np.float32)
d = jnp.asarray(dd/np.linalg.norm(dd,axis=1,keepdims=True))
rc = trace_closest_pallas(o, d, scene.bvh4, 3e38, sort=False, interpret=False)
exp = np.load('/tmp/expected_trace.npz')
t, tri, mat, hit = (np.asarray(rc[k]) for k in ('t','tri_id','mat_id','hit'))
nrm = np.asarray(rc['normal'])
print('t mismatches', int((~np.isclose(t, exp['t'], rtol=1e-5)).sum()))
print('tri mismatches', int((tri != exp['tri']).sum()))
print('mat mismatches', int((mat != exp['mat']).sum()))
print('hit mismatches', int((hit != exp['hit']).sum()))
print('normal mismatches', int((~np.isclose(nrm, exp['normal'], rtol=1e-4, atol=1e-6)).any(axis=1).sum()))
" 2>&1 | grep -v WARNING
}
for i in $(seq 1 "${PROBE_ATTEMPTS:-12}"); do
  echo "--- attempt $i $(date +%H:%M:%S)" >> "$LOG"
  out=$(probe)
  echo "$out" >> "$LOG"
  # Healthy = all five mismatch lines PRESENT and all counts ZERO
  # (a miscompiled kernel printing 't mismatches 2048' must NOT pass).
  nlines=$(echo "$out" | grep -cE 'mismatches [0-9]+$')
  nzero=$(echo "$out" | grep -cE 'mismatches 0$')
  if [ "$nlines" = "5" ] && [ "$nzero" = "5" ]; then
    echo "KERNEL HEALTHY at $(date +%H:%M:%S)" | tee -a "$LOG"
    touch /tmp/kernel_healthy
    exit 0
  fi
  if [ "$nlines" = "5" ]; then
    echo "KERNEL MISCOMPILE (ran but wrong) at $(date +%H:%M:%S)" >> "$LOG"
  fi
  sleep "${PROBE_SLEEP:-120}"
done
echo "gave up $(date +%H:%M:%S)" | tee -a "$LOG"
exit 2
