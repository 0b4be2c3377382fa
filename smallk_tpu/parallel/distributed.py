"""Multi-host (multi-process) execution helpers.

The reference has no distributed support ("SmallK does not currently
support distributed computation", sphinx/source/pages_introduction.rst:78).
Here, multi-host TPU slices work through jax.distributed + GSPMD: each
host runs the same program, `initialize_distributed` wires the processes
together, and the mesh in parallel/mesh.py spans all hosts' devices (ICI
within a slice, DCN across slices).

Typical pod-slice run (same script on every host):

    from smallk_tpu.parallel import distributed, mesh
    distributed.initialize_distributed()          # env-driven on TPU pods
    m = mesh.make_mesh()                          # all global devices
    result = mesh.sharded_nmf_solve(a_op, W0, H0, opts, m)
"""

from __future__ import annotations

from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed.

    On Cloud TPU pods all arguments are discovered from the environment;
    pass them explicitly for manual CPU/GPU multi-process runs.
    Safe to call once per process, before first device use.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def shard_host_matrix(A, mesh, dtype=None):
    """Build the canonical sharded A-operand from per-host data.

    Every process passes its full host copy of A (or a scipy sparse
    matrix); jax.make_array_from_process_local_data places only the
    addressable shards, so no host ever materializes remote partitions on
    device.  Returns a DenseAOp backed by the global sharded array.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp

    from ..ops.aop import DenseAOp
    from .mesh import nmf_shardings

    a_sh, _, _ = nmf_shardings(mesh)
    if sp.issparse(A):
        A = A.toarray()
    A = np.asarray(A, dtype=np.dtype(dtype or jnp.float32))
    global_arr = jax.make_array_from_process_local_data(a_sh, A, A.shape)
    return DenseAOp(global_arr)


def process_count() -> int:
    import jax

    return jax.process_count()


def is_coordinator() -> bool:
    import jax

    return jax.process_index() == 0
