"""Microbenchmark: is a half-res 128-channel conv faster than the full-res
16-channel conv it can replace via space-to-depth?

Hypothesis: XLA pads narrow-channel convs to the MXU's 128 lanes, so a
(96,96,160,16)->16 3^3 conv costs ~like a 128-wide one. Space-to-depth
(2x2x2 block -> channels) re-expresses it exactly as a (48,48,80,128)->128
3^3 conv: same math, 1/8 the padded MXU work.

Timing on axon: chain iterations inside one jit with a data dependency
(lax.scan) and fetch only a scalar; block_until_ready is unreliable through
the tunnel and big D2H fetches pollute the measurement.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, x, iters, label):
    """fn: x -> y (y may have different shape; a slice of y feeds back)."""

    @jax.jit
    def chained(x):
        def body(c, _):
            y = fn(c)
            # feed a slice of y back into the carry so iterations are
            # data-dependent (no DCE, no parallel execution)
            c = c + y[tuple(slice(0, s) for s in c.shape)].astype(c.dtype) * 1e-6
            return c, None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.float32(c.mean())

    r = chained(x)  # compile + run once
    float(r)
    t0 = time.perf_counter()
    float(chained(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms/iter", flush=True)
    return dt


def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    iters = 20

    # cross-check: full r=2 student forward, B=1 (round-1 note: ~27 ms)
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _bone_turbo_student
    net = _bone_turbo_student(dtype=jnp.bfloat16)
    xs = jnp.asarray(rng.rand(1, 96, 96, 160, 1), dt)
    params = net.init(jax.random.PRNGKey(0), xs, deep_supervision=False)
    timed(lambda x: net.apply(params, x, deep_supervision=False), xs, 10,
          "student forward B=1 (96,96,160)")

    # full-res stage-0 conv: (96,96,160,16) -> 16
    x16 = jnp.asarray(rng.rand(1, 96, 96, 160, 16), dt)
    w16 = jnp.asarray(rng.rand(3, 3, 3, 16, 16) * 0.1, dt)
    t_plain = timed(lambda x: conv3d(x, w16), x16, iters,
                    "full-res 16->16 3^3 (96,96,160)")

    # space-to-depth equivalent: (48,48,80,128) -> 128
    x128 = jnp.asarray(rng.rand(1, 48, 48, 80, 128), dt)
    w128 = jnp.asarray(rng.rand(3, 3, 3, 128, 128) * 0.1, dt)
    t_s2d = timed(lambda x: conv3d(x, w128), x128, iters,
                  "half-res 128->128 3^3 (48,48,80)")

    # first conv 1->16 at full res vs s2d 8->128 at half res
    x1 = jnp.asarray(rng.rand(1, 96, 96, 160, 1), dt)
    w1 = jnp.asarray(rng.rand(3, 3, 3, 1, 16) * 0.1, dt)
    t_first = timed(lambda x: conv3d(x, w1), x1, iters,
                    "full-res 1->16 3^3 (96,96,160)")
    x8 = jnp.asarray(rng.rand(1, 48, 48, 80, 8), dt)
    w8 = jnp.asarray(rng.rand(3, 3, 3, 8, 128) * 0.1, dt)
    t_first_s2d = timed(lambda x: conv3d(x, w8), x8, iters,
                        "half-res 8->128 3^3 (48,48,80)")

    # stage-1 32->32 at (48,48,80) vs s2d 256-channel at (24,24,40)
    x32 = jnp.asarray(rng.rand(1, 48, 48, 80, 32), dt)
    w32 = jnp.asarray(rng.rand(3, 3, 3, 32, 32) * 0.1, dt)
    t_s1 = timed(lambda x: conv3d(x, w32), x32, iters,
                 "stage1 32->32 3^3 (48,48,80)")
    x256 = jnp.asarray(rng.rand(1, 24, 24, 40, 256), dt)
    w256 = jnp.asarray(rng.rand(3, 3, 3, 256, 256) * 0.1, dt)
    t_s1_s2d = timed(lambda x: conv3d(x, w256), x256, iters,
                     "stage1-s2d 256->256 3^3 (24,24,40)")

    # batched (B=8), the sweep's operating point
    xb = jnp.asarray(rng.rand(8, 96, 96, 160, 16), dt)
    t_b = timed(lambda x: conv3d(x, w16), xb, 5, "B=8 full-res 16->16")
    xbs = jnp.asarray(rng.rand(8, 48, 48, 80, 128), dt)
    t_bs = timed(lambda x: conv3d(x, w128), xbs, 5, "B=8 half-res 128->128")

    print(f"\nspeedups: stage0 {t_plain / t_s2d:.2f}x, first "
          f"{t_first / t_first_s2d:.2f}x, stage1 {t_s1 / t_s1_s2d:.2f}x, "
          f"B=8 {t_b / t_bs:.2f}x", flush=True)


if __name__ == "__main__":
    main()
