"""TPU batch 17: where do the ~20 ms/node of hierclust orchestration go?

ROUND_NOTES item 1: in-loop solve time is 0.046-0.15 ms/iteration but the
end-to-end aggregate is ~0.56 ms/iteration; the gap is per-node overhead.
This script instruments the device-resident node solves phase by phase
(prep / dispatch / device / fetch / host-tree) on the batch15 workloads.

Findings (2026-08-17, v5e tunnel): EVERY host sync costs one ~26 ms
round trip regardless of payload (h2d of 4 B: 26 ms; the "d2h 0.05 ms"
microbench below is an artifact — jnp.zeros never leaves the host).
Per pair: ~12 ms true exec + 1 RTT.  This motivated the speculative
next-pop dispatch (hierclust.SPECULATE; batch19 measures the win).
NOTE: the timed solve_pair wrapper predates the dispatch/finish split —
clust_hier no longer calls solve_pair, so rerunning this script times
only the serial path; kept as evidence for the RTT decomposition.
"""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)

ACC = {}
CNT = {}


def acc(name, dt):
    ACC[name] = ACC.get(name, 0.0) + dt
    CNT[name] = CNT.get(name, 0) + 1


def main():
    from smallk_tpu.common.options import (
        ClustOptions, NmfAlgorithm, NmfOptions, NmfProgressAlgorithm,
    )
    from smallk_tpu.common.rng import Random
    from smallk_tpu.engines import hierclust as hc
    from smallk_tpu.engines.corpus import synthetic_term_doc_corpus

    # --- instrumented copies of the runner entry points -----------------
    def solve_pair_timed(self, subset_l, subset_r, W_parent):
        if (not hc.PAIR_BATCHING or self._A_ext is None
                or self.inits.initdir
                or len(subset_l) <= 3 or len(subset_r) <= 3):
            return None
        subsets = (np.asarray(subset_l), np.asarray(subset_r))
        n_b = max(hc._MIN_BUCKET,
                  hc._next_pow2(max(len(subset_l), len(subset_r))))
        if n_b >= self.n:
            return None
        nmf_opts = self.opts.nmf_opts

        t = time.perf_counter()
        idx = np.full((2, n_b), self.n, dtype=np.int32)
        for i, s in enumerate(subsets):
            idx[i, : len(s)] = s
        seeds = np.array(
            [self.inits.next_seed(), self.inits.next_seed()], np.int32
        )
        acc("prep_host", time.perf_counter() - t)

        t = time.perf_counter()
        Wp = jnp.asarray(W_parent, self.dtype)
        acc("prep_wp", time.perf_counter() - t)

        t = time.perf_counter()
        W_, H_, packed = hc._fused_gather_pair(
            self._A_ext, idx, seeds, Wp,
            n_full=self.n, opts=nmf_opts, init=self.init,
            fdtype=self.dtype,
        )
        acc("dispatch", time.perf_counter() - t)

        t = time.perf_counter()
        packed.block_until_ready()
        acc("device_exec", time.perf_counter() - t)

        t = time.perf_counter()
        ph = np.asarray(packed)
        acc("fetch_d2h", time.perf_counter() - t)

        t = time.perf_counter()
        out = []
        for i, s in enumerate(subsets):
            if self._record(ph[i, 0] > 0.5, int(ph[i, 1])):
                left = hc._unpack_left(ph[i], len(s))
                out.append(hc._NodeSolve(
                    W_[i], H_[i], left, float(ph[i, 2]), True))
            else:
                out.append(self.solve(s, W_parent[:, i]))
        acc("post_host", time.perf_counter() - t)
        acc("pair_total", 0.0)  # count pairs
        return out

    orig_solve = hc._Rank2Runner.solve

    def solve_timed(self, subset=None, w_parent=None, max_attempts=3):
        t = time.perf_counter()
        out = orig_solve(self, subset, w_parent, max_attempts)
        acc("serial_solve", time.perf_counter() - t)
        return out

    hc._Rank2Runner.solve_pair = solve_pair_timed
    hc._Rank2Runner.solve = solve_timed

    # d2h / h2d latency vs payload size: is the per-node fetch cost
    # bandwidth or latency?  (decides whether shrinking the packed vector
    # helps, or only FEWER fetches do)
    print("\n== transfer latency vs size ==", flush=True)
    for size in (4, 64, 1024, 4096, 16384, 65536, 1048576):
        x = jnp.zeros((size // 4,), jnp.float32)
        x.block_until_ready()
        ts, th = [], []
        host = np.zeros((size // 4,), np.float32)
        for _ in range(5):
            t = time.perf_counter()
            np.asarray(x)
            ts.append(time.perf_counter() - t)
            t = time.perf_counter()
            jnp.asarray(host).block_until_ready()
            th.append(time.perf_counter() - t)
        print(f"  {size:>8}B: d2h min {min(ts)*1e3:7.2f} ms   "
              f"h2d min {min(th)*1e3:7.2f} ms", flush=True)

    nmf_opts = NmfOptions(
        tol=1e-4, algorithm=NmfAlgorithm.RANK2,
        prog_est_algorithm=NmfProgressAlgorithm.PG_RATIO, k=2,
        min_iter=1, max_iter=5000, verbose=False, dtype="float32",
        a_dtype="bfloat16", stall_patience=100,
    )

    for tag, (m, n, kc, leaves, seed) in {
        "12c reuters-shape": (12411, 7984, 16, 12, 11),
        "100 leaves": (12411, 7984 * 2, 128, 100, 21),
    }.items():
        A, _ = synthetic_term_doc_corpus(m, n, kc, seed=seed)
        copts = ClustOptions(nmf_opts=nmf_opts, num_clusters=leaves,
                             verbose=False)
        hc.clust_hier(A, copts, Random(1))  # compile
        ACC.clear()
        CNT.clear()
        t1 = time.perf_counter()
        _, st = hc.clust_hier(A, copts, Random(2))
        wall = time.perf_counter() - t1
        known = sum(ACC.values())
        print(f"\n=== {tag}: wall {wall:.3f}s, {st.nmf_count} solves, "
              f"{st.iter_count} iters ===", flush=True)
        for name in sorted(ACC, key=lambda k: -ACC[k]):
            print(f"  {name:>14}: {ACC[name]*1e3:8.1f} ms total "
                  f"({CNT[name]} calls, "
                  f"{ACC[name]/max(CNT[name],1)*1e3:6.2f} ms/call)")
        print(f"  {'UNACCOUNTED':>14}: {(wall-known)*1e3:8.1f} ms "
              f"(host tree bookkeeping, trial-split logic, loop)")


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
