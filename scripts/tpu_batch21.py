"""TPU batch 21: can result fetches overlap through the tunnel?

hierclust is now RTT-bound: ~26 ms per split for ONE packed-result
fetch (batch17/19).  If `copy_to_host_async` actually starts the
transfer early — or if several in-flight fetches' round trips overlap —
a depth-D speculation pipeline would amortize the RTT away and leave
the loop exec-bound (~12 ms/split).  This probes the transfer semantics
directly.
"""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
jax.device_get(jnp.zeros((1,)))
print(f"[warmup] {time.time()-t0:.0f}s", flush=True)


@jax.jit
def work(x, s):
    # ~10 ms of real device work producing a small result
    def body(i, acc):
        return acc + (x * (s + i)).sum(axis=0)

    return jax.lax.fori_loop(0, 60, body, jnp.zeros((x.shape[1],), x.dtype))


def main():
    x = jnp.asarray(np.random.rand(4096, 2048), jnp.float32)
    jax.block_until_ready(work(x, 0.5))
    t = time.perf_counter()
    jax.block_until_ready(work(x, 1.5))
    base = time.perf_counter() - t
    print(f"one work(): {base*1e3:.1f} ms (incl 1 sync RTT)", flush=True)

    # 1) does copy_to_host_async make the later np.asarray cheap?
    r = work(x, 2.5)
    has_async = hasattr(r, "copy_to_host_async")
    print(f"copy_to_host_async exists: {has_async}", flush=True)
    if has_async:
        r.copy_to_host_async()
        time.sleep(0.3)  # give the transfer time to land
        t = time.perf_counter()
        np.asarray(r)
        print(f"asarray after async copy + 300ms: "
              f"{(time.perf_counter()-t)*1e3:.2f} ms", flush=True)
    r2 = work(x, 3.5)
    time.sleep(0.3)
    t = time.perf_counter()
    np.asarray(r2)
    print(f"asarray after plain 300ms wait:  "
          f"{(time.perf_counter()-t)*1e3:.2f} ms", flush=True)

    # 2) do D in-flight fetches overlap?
    for D in (1, 4, 8):
        rs = [work(x, 10.0 + i) for i in range(D)]
        if has_async:
            for r in rs:
                r.copy_to_host_async()
        t = time.perf_counter()
        for r in rs:
            np.asarray(r)
        dt = time.perf_counter() - t
        print(f"D={D}: fetch-all {dt*1e3:7.1f} ms "
              f"({dt/D*1e3:.1f} ms/result)", flush=True)

    # 3) dispatch-fetch pipeline: dispatch i+1 before fetching i
    D = 16
    t = time.perf_counter()
    prev = None
    for i in range(D):
        cur = work(x, 20.0 + i)
        if has_async:
            cur.copy_to_host_async()
        if prev is not None:
            np.asarray(prev)
        prev = cur
    np.asarray(prev)
    dt = time.perf_counter() - t
    print(f"pipelined dispatch+fetch x{D}: {dt/D*1e3:.1f} ms/step",
          flush=True)
    t = time.perf_counter()
    for i in range(D):
        np.asarray(work(x, 40.0 + i))
    dt = time.perf_counter() - t
    print(f"serial dispatch+fetch x{D}:    {dt/D*1e3:.1f} ms/step",
          flush=True)

    # 4) background fetcher THREAD: does a blocking np.asarray in a
    # worker overlap the main thread's dispatches + fetches?  (If the
    # tunnel releases the GIL during transfers, a depth-1 speculation
    # pipeline plus one fetcher thread removes the per-split RTT.)
    import queue
    import threading

    inq, outq = queue.Queue(), queue.Queue()

    def fetcher():
        while True:
            item = inq.get()
            if item is None:
                return
            key, arr = item
            outq.put((key, np.asarray(arr)))

    th = threading.Thread(target=fetcher, daemon=True)
    th.start()
    t = time.perf_counter()
    prev = None
    got = 0
    for i in range(D):
        cur = work(x, 60.0 + i)
        inq.put((i, cur))
        # main thread does ~3 ms of fake host work per step
        time.sleep(0.003)
        while not outq.empty():
            outq.get()
            got += 1
    while got < D:
        outq.get()
        got += 1
    dt = time.perf_counter() - t
    print(f"threaded dispatch+fetch x{D}:  {dt/D*1e3:.1f} ms/step",
          flush=True)
    inq.put(None)
    th.join(timeout=5)


try:
    main()
except Exception:
    traceback.print_exc()
print("[done]", flush=True)
