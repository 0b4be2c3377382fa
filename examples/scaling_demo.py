"""Multi-device scaling demonstration.

Runs the same sharded NMF-BPP solve over increasing mesh sizes and prints
iterations/sec per configuration.  On a CPU host this uses virtual
devices (run with XLA_FLAGS=--xla_force_host_platform_device_count=8);
on a TPU slice it uses the real chips.  The sharding layout is the
terms x docs mesh from smallk_tpu.parallel.mesh — on real hardware the
k x k Gram psums ride the ICI.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from smallk_tpu.common.options import NmfAlgorithm, NmfOptions  # noqa: E402
from smallk_tpu.common.rng import Random, random_matrix  # noqa: E402
from smallk_tpu.ops.aop import DenseAOp  # noqa: E402
from smallk_tpu.parallel.mesh import make_mesh, sharded_nmf_solve  # noqa: E402
from smallk_tpu.solvers.solve import nmf_solve  # noqa: E402


def main():
    devices = jax.devices()
    print(f"{len(devices)} device(s): {devices[0].platform}")

    m, n, k, iters = 4096, 4096, 16, 50
    rng = Random(0)
    A = np.abs(random_matrix(m, n, rng, dtype=np.float32))
    W0 = jnp.asarray(random_matrix(m, k, rng, dtype=np.float32))
    H0 = jnp.asarray(random_matrix(k, n, rng, dtype=np.float32))
    opts = NmfOptions(
        tol=1e-30, algorithm=NmfAlgorithm.BPP, height=m, width=n, k=k,
        min_iter=1, max_iter=iters, verbose=False,
    )
    a_op = DenseAOp(jnp.asarray(A))

    def timed(run):
        r = run()
        r.W.block_until_ready()
        t0 = time.perf_counter()
        r = run()
        r.W.block_until_ready()
        dt = time.perf_counter() - t0
        return int(r.iterations) / dt

    rate1 = timed(lambda: nmf_solve(a_op, W0, H0, opts))
    print(f"1 device: {rate1:.1f} iters/sec")

    nd = len(devices)
    shapes = []
    if nd >= 2:
        shapes.append((1, 2))
    if nd >= 4:
        shapes.append((2, 2))
    if nd >= 8:
        shapes.extend([(2, 4), (1, 8)])
    for shape in shapes:
        mesh = make_mesh(shape, devices=devices[: shape[0] * shape[1]])
        rate = timed(lambda: sharded_nmf_solve(a_op, W0, H0, opts, mesh))
        print(f"mesh {shape}: {rate:.1f} iters/sec "
              f"({rate / rate1:.2f}x vs 1 device)")


if __name__ == "__main__":
    main()
