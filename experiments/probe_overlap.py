"""Can the axon dev tunnel OVERLAP transfers with device compute?

The round-5 wall plan (stream the turbo pipeline: upload x-strips while
earlier chunks compute, fetch finalized rows while later chunks compute)
only pays off if the tunnel runtime actually runs H2D/D2H concurrently
with dispatched programs. This probe measures:
  1. per-dispatch overhead of a tiny jitted call (N back-to-back)
  2. H2D of ~84 MB, cold and repeated (today's tunnel rate)
  3. H2D issued WHILE a long compute runs: serial sum vs measured total
  4. D2H via copy_to_host_async issued before a long compute, read after
  5. many small H2D strips vs one big H2D (per-transfer overhead)

Run: python experiments/probe_overlap.py
(block_until_ready is unreliable on this backend; every sync here fetches
real bytes.)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # a compute knob: matmul chain sized to ~1-2 s on v5e
    n = 4096
    a = jnp.asarray(np.random.RandomState(0).rand(n, n).astype(np.float32))
    _ = np.asarray(a[:1, :1])

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def burn(x, iters):
        def body(c, _):
            c = jnp.tanh(c @ x) * 0.999
            return c, None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c[:1, :1]

    iters = int(os.environ.get("PROBE_ITERS", 600))
    t0 = time.perf_counter()
    r = burn(a, iters)
    _ = np.asarray(r)
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = burn(a, iters)
        _ = np.asarray(r)
        ts.append(round(time.perf_counter() - t0, 3))
    t_burn = min(ts)
    print(f"burn({iters}) compile {t_compile:.1f}s, steady {ts} s", flush=True)

    # ---- 1. dispatch overhead: tiny jitted op, N sequential round trips
    @jax.jit
    def tiny(x):
        return x + 1

    x1 = jnp.zeros((8,), jnp.float32)
    _ = np.asarray(tiny(x1))
    N = 20
    t0 = time.perf_counter()
    y = x1
    for _ in range(N):
        y = tiny(y)
    _ = np.asarray(y)
    per = (time.perf_counter() - t0) / N
    print(f"dispatch overhead: {per*1000:.1f} ms/call "
          f"(chained {N} tiny calls, one final fetch)", flush=True)
    # and with a fetch per call (worst case)
    t0 = time.perf_counter()
    for _ in range(N):
        _ = np.asarray(tiny(x1))
    per_f = (time.perf_counter() - t0) / N
    print(f"dispatch+fetch round trip: {per_f*1000:.1f} ms/call", flush=True)

    # ---- 2. plain H2D rate today
    host84 = np.random.RandomState(1).randint(
        0, 255, size=(84 * 1000 * 1000 // 2,), dtype=np.uint16)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(host84)
        _ = np.asarray(d[:1])
        dt = time.perf_counter() - t0
        rates.append(round(host84.nbytes / 1e6 / dt, 1))
        del d
    print(f"H2D 84 MB: {rates} MB/s", flush=True)
    t_h2d = host84.nbytes / 1e6 / max(rates)

    # ---- 3. H2D while compute runs
    # launch burn (async), then device_put, then sync both
    t0 = time.perf_counter()
    r = burn(a, iters)
    d = jax.device_put(host84)
    _ = np.asarray(d[:1])
    t_put = time.perf_counter() - t0
    _ = np.asarray(r)
    t_both = time.perf_counter() - t0
    serial = t_burn + t_h2d
    print(f"H2D-during-compute: put synced at {t_put:.2f}s, both done "
          f"{t_both:.2f}s vs serial {serial:.2f}s -> overlap "
          f"{'YES' if t_both < serial * 0.85 else 'NO/partial'}", flush=True)
    del d

    # ---- 4. async D2H while compute runs
    big = jnp.asarray(np.random.RandomState(2).randint(
        0, 255, size=(33 * 1000 * 1000,), dtype=np.uint8))
    _ = np.asarray(big[:1])
    t0 = time.perf_counter()
    outs = np.asarray(big)
    t_d2h = time.perf_counter() - t0
    print(f"D2H 33 MB sync: {t_d2h:.2f}s ({big.nbytes/1e6/t_d2h:.1f} MB/s)",
          flush=True)
    t0 = time.perf_counter()
    try:
        big.copy_to_host_async()
        r = burn(a, iters)
        _ = np.asarray(r)
        t_mid = time.perf_counter() - t0
        outs = np.asarray(big)
        t_all = time.perf_counter() - t0
        serial = t_burn + t_d2h
        print(f"D2H-during-compute: burn done {t_mid:.2f}s, fetch done "
              f"{t_all:.2f}s vs serial {serial:.2f}s -> overlap "
              f"{'YES' if t_all < serial * 0.85 else 'NO/partial'}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print("copy_to_host_async unavailable:", repr(e)[:100], flush=True)

    # ---- 5. strip H2D: 9 strips of ~9.3 MB vs one 84 MB
    strips = np.split(host84[: (host84.size // 9) * 9], 9)
    t0 = time.perf_counter()
    ds = [jax.device_put(s) for s in strips]
    for d in ds:
        _ = np.asarray(d[:1])
    dt = time.perf_counter() - t0
    print(f"H2D 9 strips ({strips[0].nbytes/1e6:.1f} MB each): {dt:.2f}s "
          f"({sum(s.nbytes for s in strips)/1e6/dt:.1f} MB/s aggregate)",
          flush=True)

    # ---- 6. pipelined strips: dispatch compute between strip uploads, the
    # shape of the streamed turbo sweep (put k+1 while chunk k computes)
    piter = max(iters // 9, 1)
    t0 = time.perf_counter()
    ds = []
    for s in strips:
        d = jax.device_put(s)
        _ = np.asarray(d[:1])
        ds.append(d)
    rs = [burn(a, piter) for _ in range(9)]
    for r in rs:
        _ = np.asarray(r)
    t_serial = time.perf_counter() - t0
    del ds, rs
    t0 = time.perf_counter()
    ds = [jax.device_put(strips[0])]
    rs = []
    for k in range(9):
        rs.append(burn(a, piter))
        if k + 1 < 9:
            ds.append(jax.device_put(strips[k + 1]))
    for d in ds:
        _ = np.asarray(d[:1])
    for r in rs:
        _ = np.asarray(r)
    t_pipe = time.perf_counter() - t0
    print(f"pipelined strips+compute: serial {t_serial:.2f}s vs pipelined "
          f"{t_pipe:.2f}s -> overlap "
          f"{'YES' if t_pipe < t_serial * 0.8 else 'NO/partial'}", flush=True)

    _ = outs


if __name__ == "__main__":
    main()
