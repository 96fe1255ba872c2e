"""Steady-state serving latency/throughput of an exported sampler artifact.

Loads a jax.export artifact (default: the one check_serving_tpu.py writes to
/tmp/dsg_artifact) and times end-to-end request latency — seed+flags in,
decoded integer scene graphs out — with a real host fetch per call, the way
a serving process would run it.  Reports p50/p95 latency and graphs/s.

Usage:  python scripts/bench_serving_latency.py [artifact_dir] [n_calls]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

artifact = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dsg_artifact"
n_calls = int(sys.argv[2]) if len(sys.argv) > 2 else 20

from diffusesg_tpu.serving.export import load_artifact

fn, meta = load_artifact(artifact)
B, N = meta["batch_size"], meta["max_node_num"]
flags = np.zeros((B, N), bool)
flags[:, :min(40, N)] = True

# compile + warmup
t0 = time.time()
out = [np.asarray(r) for r in fn(np.int32(0), flags)]
print(f"warmup {time.time()-t0:.1f}s (incl. compile); "
      f"schedule: {meta['num_steps']} steps, batch {B}, N {N}", flush=True)

lat = []
for i in range(n_calls):
    t0 = time.time()
    out = fn(np.int32(i + 1), flags)
    _ = np.asarray(out[0][0, 0, 0])  # force a real fetch
    lat.append(time.time() - t0)
lat.sort()
p50 = lat[len(lat) // 2] * 1e3
p95 = lat[int(len(lat) * 0.95)] * 1e3
print(f"steady-state over {n_calls} calls: p50 {p50:.1f} ms, p95 {p95:.1f} ms, "
      f"{B / (sum(lat) / len(lat)):.1f} graphs/s at batch {B}")
