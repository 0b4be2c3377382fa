"""Round-5 probe: the formerly-crashing 50k x 250k k=64 60-iteration BPP
through the `nmf` CLI, unmodified (VERDICT r4 #3 done-criterion).

Round 4's bisect (ROUND_NOTES r4 §1b) showed every ~60-iteration single
XLA program at this shape is killed by the relay watchdog.  run_nmf now
auto-segments when the estimated dispatch time exceeds the environment
budget, so the same CLI invocation must complete.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/tpu_batch66.py
"""

import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sp

from smallk_tpu.io.matrix_market import write_matrix_market

m, n, k, nzc = 50_000, 250_000, 64, 80
gs = np.random.RandomState(3)
A = sp.csc_matrix(
    (gs.rand(n * nzc).astype(np.float32),
     gs.randint(0, m, n * nzc).astype(np.int32),
     np.arange(0, n * nzc + 1, nzc, dtype=np.int64)),
    shape=(m, n))
A.sum_duplicates()

td = tempfile.mkdtemp()
mtx = os.path.join(td, "a.mtx")
t0 = time.perf_counter()
write_matrix_market(mtx, A)
print(f"mtx write: {time.perf_counter()-t0:.0f}s "
      f"({os.path.getsize(mtx)/1e6:.0f} MB)", flush=True)

env = dict(os.environ)
env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
t0 = time.perf_counter()
proc = subprocess.run(
    [sys.executable, "-u", "-m", "smallk_tpu.cli.nmf_cli",
     "--matrixfile", mtx, "--k", str(k),
     "--algorithm", "BPP", "--miniter", "1", "--maxiter", "60",
     "--tol", "1e-30",
     "--outfile_W", os.path.join(td, "w.csv"),
     "--outfile_H", os.path.join(td, "h.csv")],
    env=env, capture_output=True, text=True, timeout=2400,
)
wall = time.perf_counter() - t0
print(proc.stdout[-2000:], flush=True)
print(proc.stderr[-1000:], flush=True)
print(f"nmf CLI rc={proc.returncode} wall={wall:.0f}s", flush=True)
assert proc.returncode == 0, "CLI failed"
assert os.path.exists(os.path.join(td, "w.csv"))
print("[done] 60-iteration 50kx250k k=64 BPP completed through the "
      "nmf CLI (auto-chunked)")
