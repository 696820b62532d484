#!/bin/bash
# Waits for the TPU tunnel to recover (cheap probe), then runs the
# kernel-correctness diagnostics in sequence. Results land in
# /tmp/tpu_diag.log. Safe to re-run.
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_diag.log
for i in $(seq 1 40); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,128))@jnp.ones((128,8))).sum()))" >/dev/null 2>&1; then
    echo "probe ok at $(date +%H:%M:%S)" | tee -a "$LOG"
    echo "=== expected-trace comparison ===" | tee -a "$LOG"
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
" 2>&1 | grep -v WARNING | tee -a "$LOG"
    echo "=== mosaic probe ===" | tee -a "$LOG"
    timeout 500 python -u scripts/mosaic_probe.py 2>&1 | grep -v WARNING | tee -a "$LOG"
    exit 0
  fi
  echo "probe $i down $(date +%H:%M:%S)" >> "$LOG"
  sleep 90
done
echo "gave up $(date +%H:%M:%S)" | tee -a "$LOG"
