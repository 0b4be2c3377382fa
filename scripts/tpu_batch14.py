"""TPU batch 14: thin-matmul Pallas kernels vs XLA on the bench shapes;
correctness on device; vmap compatibility (hierclust pair batching)."""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)

from smallk_tpu.ops.pallas_matmul import thin_mm_nt, thin_mm_tn

HI = jax.lax.Precision.HIGHEST
f32 = jnp.float32


def timeit(f, *a, reps=50):
    g = jax.jit(f)
    r = g(*a)
    jax.block_until_ready(r)
    t1 = time.perf_counter()
    for _ in range(reps):
        r = g(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t1) / reps * 1000


def section(name, fn):
    print(f"== {name} ==", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print("[failed; continuing]", flush=True)


def vs_xla():
    m, n = 12411, 7984
    rng = np.random.RandomState(0)
    for adt, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        A = jnp.asarray(rng.rand(m, n).astype(np.float32)).astype(adt)
        for k in (2, 8, 32, 128):
            W = jnp.asarray(rng.rand(m, k).astype(np.float32))
            H = jnp.asarray(rng.rand(k, n).astype(np.float32))
            t_ker = timeit(thin_mm_tn, W, A)
            t_xla = timeit(
                lambda W, A: jnp.matmul(W.T, A, precision=HI,
                                        preferred_element_type=f32), W, A)
            # on-device correctness vs XLA HIGHEST
            d = float(jnp.max(jnp.abs(
                thin_mm_tn(W, A)
                - jnp.matmul(W.T, A, precision=HI,
                             preferred_element_type=f32))))
            print(f"  tn {tag} k={k}: kernel {t_ker:.3f} ms vs XLA "
                  f"{t_xla:.3f} ms (maxdiff {d:.2e})", flush=True)
            t_ker = timeit(thin_mm_nt, A, H)
            t_xla = timeit(
                lambda A, H: jnp.matmul(A, H.T, precision=HI,
                                        preferred_element_type=f32), A, H)
            d = float(jnp.max(jnp.abs(
                thin_mm_nt(A, H)
                - jnp.matmul(A, H.T, precision=HI,
                             preferred_element_type=f32))))
            print(f"  nt {tag} k={k}: kernel {t_ker:.3f} ms vs XLA "
                  f"{t_xla:.3f} ms (maxdiff {d:.2e})", flush=True)


def hierclust_width():
    """The gathered-node widths hierclust actually uses."""
    m = 12411
    rng = np.random.RandomState(1)
    for n in (512, 2048, 4096):
        A = jnp.asarray(rng.rand(m, n).astype(np.float32))
        W = jnp.asarray(rng.rand(m, 2).astype(np.float32))
        t_ker = timeit(thin_mm_tn, W, A)
        t_xla = timeit(
            lambda W, A: jnp.matmul(W.T, A, precision=HI,
                                    preferred_element_type=f32), W, A)
        print(f"  rank-2 tn width {n}: kernel {t_ker:.3f} ms vs XLA "
              f"{t_xla:.3f} ms", flush=True)


def vmap_check():
    m, n, k = 2048, 1024, 2
    rng = np.random.RandomState(2)
    A2 = jnp.asarray(rng.rand(2, m, n).astype(np.float32))
    W2 = jnp.asarray(rng.rand(2, m, k).astype(np.float32))
    out = jax.vmap(lambda A, W: thin_mm_tn(W, A))(A2, W2)
    ref = jnp.einsum("bmk,bmn->bkn", W2, A2)
    print(f"  vmap tn OK, maxdiff {float(jnp.max(jnp.abs(out-ref))):.2e}",
          flush=True)


section("kernel vs XLA (bench shape)", vs_xla)
section("rank-2 node widths", hierclust_width)
section("vmap compatibility", vmap_check)
print("[done]", flush=True)
