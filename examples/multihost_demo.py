"""Multi-process (multi-host) NMF demonstration.

Validates the distributed path end-to-end on one machine by simulating two
hosts as two OS processes, each with 4 virtual CPU devices, joined via
jax.distributed into one 8-device global mesh.  On a real TPU pod, launch
the same worker body on every host WITHOUT the simulation env vars —
jax.distributed discovers the topology from the TPU environment and the
mesh spans the slice (ICI) and hosts (DCN).

Run:
    python examples/multihost_demo.py            # spawns both processes

Worker body (what each host runs):
    initialize_distributed(...)                  # env-driven on TPU pods
    mesh = make_mesh((num_hosts, local_devices))
    a_op = shard_host_matrix(A, mesh)            # local shards only
    res  = nmf_solve(a_op, W0_sharded, H0_sharded, opts)
"""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

WORKER = r'''
import os, sys
sys.path.insert(0, %(repo)r)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
from smallk_tpu.parallel.distributed import (
    initialize_distributed, shard_host_matrix,
)
initialize_distributed(coordinator_address="localhost:9345",
                       num_processes=2, process_id=pid)
import numpy as np, jax.numpy as jnp
from smallk_tpu.parallel.mesh import make_mesh, nmf_shardings
from smallk_tpu.common.options import NmfOptions, NmfAlgorithm
from smallk_tpu.common.rng import Random, random_matrix
from smallk_tpu.solvers.solve import nmf_solve

print(f"[p{pid}] {jax.device_count()} global devices, "
      f"{jax.local_device_count()} local", flush=True)
mesh = make_mesh((2, 4))  # hosts x local devices (terms x docs)
rng = Random(0)
m, n, k = 64, 48, 4
A = np.abs(random_matrix(m, n, rng, dtype=np.float32))
W0 = random_matrix(m, k, rng, dtype=np.float32).astype(np.float32)
H0 = random_matrix(k, n, rng, dtype=np.float32).astype(np.float32)
a_op = shard_host_matrix(A, mesh, dtype=jnp.float32)
_, w_sh, h_sh = nmf_shardings(mesh)
W0j = jax.make_array_from_process_local_data(w_sh, W0, W0.shape)
H0j = jax.make_array_from_process_local_data(h_sh, H0, H0.shape)
opts = NmfOptions(tol=0.005, algorithm=NmfAlgorithm.BPP, height=m,
                  width=n, k=k, min_iter=2, max_iter=20, verbose=False)
res = nmf_solve(a_op, W0j, H0j, opts)
res.W.block_until_ready()
print(f"[p{pid}] OK: {int(res.iterations)} BPP iterations on the "
      f"2x4 global mesh", flush=True)
'''


def main():
    worker_src = WORKER % {"repo": os.path.abspath(REPO)}
    procs = [
        subprocess.Popen([sys.executable, "-c", worker_src, str(pid)])
        for pid in range(2)
    ]
    codes = [p.wait() for p in procs]
    if any(codes):
        raise SystemExit(f"worker failures: {codes}")
    print("multihost demo OK")


if __name__ == "__main__":
    main()
