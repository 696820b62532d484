#!/bin/bash
# Single serialized TPU job: wait for the compile/dispatch service to
# heal (probe = the REAL traversal kernel on 2 packets), then validate
# against the CPU-computed expected trace and run the bench. Appends to
# /tmp/recovery_run.log. Never run concurrently with other TPU users.
cd "$(dirname "$0")/.."
LOG=/tmp/recovery_run.log
probe() {
  timeout 500 python -u -c "
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
print('t mismatches', (~np.isclose(t, exp['t'], rtol=1e-5)).sum())
print('tri mismatches', (tri != exp['tri']).sum())
print('mat mismatches', (mat != exp['mat']).sum())
print('hit mismatches', (hit != exp['hit']).sum())
print('normal mismatches', (~np.isclose(nrm, exp['normal'], rtol=1e-4, atol=1e-6)).any(axis=1).sum())
" 2>&1 | grep -v WARNING
}
for i in $(seq 1 30); do
  echo "--- attempt $i $(date +%H:%M:%S)" >> "$LOG"
  out=$(probe)
  echo "$out" >> "$LOG"
  if echo "$out" | grep -q "t mismatches"; then
    echo "=== kernel healthy; traversal bench ===" >> "$LOG"
    timeout 500 python -u scripts/tpu_perf.py --trav 2>&1 | grep -v WARNING >> "$LOG"
    echo "=== bench.py ===" >> "$LOG"
    timeout 580 python -u bench.py >> "$LOG" 2>&1
    exit 0
  fi
  sleep 150
done
echo "gave up $(date +%H:%M:%S)" >> "$LOG"
