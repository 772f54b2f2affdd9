"""Weak-scaling measurement artifact (VERDICT r3 item 6).

The >=80% weak-scaling assertion in tests/test_scaling.py has never
executed (needs >=8 cores; CI/dev boxes have 4). This harness produces a
MEASURED artifact on any box by pinning each virtual CPU device to its
own physical core with taskset: n devices on n cores, fixed per-device
batch, fixed trip count — throughput/device vs n is the weak-scaling
curve. The workload is the fused-machine steps program sharded over the
mesh (identical structure to the production host-outer-loop driver;
collective-free by construction, asserted in test_scaling.py).

Run: python tools/weak_scaling_cpu.py   (CPU only; safe alongside TPU)
Writes tools/weak_scaling_r4.json.
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))

CHILD = r"""
import sys, time, json
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec
sys.path.insert(0, %(repo)r + "/tests")
n_dev = %(n_dev)d
from test_scaling import _params, _steps_fn, _x0_batch, PER_DEVICE_BATCH, N
from ilqgames_tpu.examples.three_player_intersection import make_problem
problem = make_problem(num_time_steps=N)
params = _params()
mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("batch",))
init_b, steps_b, shard = _steps_fn(problem, params, mesh)
B = n_dev * %(per_dev)d
x0 = jax.device_put(_x0_batch(problem, B), shard)
fc = init_b(x0)
out = steps_b(x0, fc)
jax.block_until_ready(out.cum_iters)
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    out = steps_b(x0, fc)
    jax.block_until_ready(out.cum_iters)
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"n_dev": n_dev, "wall_s": best,
                  "per_device_throughput": B / best / n_dev}))
"""

PER_DEV = 8


def run(n_dev):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # breaks axon discovery; not needed here
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_dev}")
    cores = ",".join(str(c) for c in range(n_dev))
    code = CHILD % {"repo": REPO, "n_dev": n_dev, "per_dev": PER_DEV}
    out = subprocess.run(
        ["taskset", "-c", cores, sys.executable, "-c", code],
        capture_output=True, text=True, env=env, timeout=1200)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_cores = os.cpu_count()
    rows = [run(n) for n in (1, 2, 4) if n <= n_cores]
    base = rows[0]["per_device_throughput"]
    for r in rows:
        r["efficiency_vs_1dev"] = round(r["per_device_throughput"] / base, 4)
    result = {
        "method": ("n virtual CPU devices pinned to n physical cores via "
                   "taskset; fixed per-device batch "
                   f"({PER_DEV}) and trip count; fused-machine sharded "
                   "steps program (tests/test_scaling.py::_steps_fn)"),
        "cpu_count": n_cores,
        "rows": rows,
    }
    path = os.path.join(HERE, "weak_scaling_r4.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
