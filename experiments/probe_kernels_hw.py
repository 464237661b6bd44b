"""Standalone hardware probes for the three Pallas kernels, small shapes,
full tracebacks — isolates Mosaic lowering failures from the 512^3 sweep
(whose remote compile takes minutes and truncates errors)."""
import sys
import traceback

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

K = 61
C8 = 8 * K  # 488


def probe_stats():
    from fast_nnunet_tpu.ops.pallas_stats import spatial_sum_sumsq
    x = jnp.asarray(np.random.RandomState(0).rand(8, 24, 24, 40, 128),
                    jnp.bfloat16)
    s, q = jax.jit(spatial_sum_sumsq)(x)
    xf = np.asarray(x, np.float32).reshape(8, -1, 128)
    np.testing.assert_allclose(np.asarray(s), xf.sum(1), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(q), (xf * xf).sum(1), rtol=2e-2)
    return "stats OK"


def probe_finalize(dtype=jnp.bfloat16, c8p=C8):
    from fast_nnunet_tpu.ops.pallas_finalize import grouped_argmax
    rng = np.random.RandomState(1)
    acc = jnp.asarray(rng.rand(48, 32, 256, c8p), dtype)
    cls = jax.jit(lambda a: grouped_argmax(a, K, 24))(acc)
    a = np.asarray(acc, np.float32)[:24, ..., :C8].reshape(24, 32, 256, 8, K)
    ref = a.argmax(-1).astype(np.uint8).transpose(0, 3, 1, 2)
    agree = (np.asarray(cls) == ref).mean()
    assert agree > 0.999, agree
    return f"finalize({np.dtype(jnp.dtype(dtype)).name if dtype != jnp.bfloat16 else 'bf16'},{c8p}) OK agree={agree:.4f}"


def probe_finalize_cyclic():
    from fast_nnunet_tpu.ops.pallas_finalize import grouped_argmax
    rng = np.random.RandomState(2)
    acc = jnp.asarray(rng.rand(48, 32, 256, 512), jnp.float32)
    cls, acc2 = jax.jit(lambda a: grouped_argmax(
        a, K, 24, row_base=jnp.int32(5), n_zero=jnp.int32(10)))(acc)
    a = np.asarray(acc, np.float32)
    virt = np.stack([a[(5 + i) % 48] for i in range(24)])
    ref = virt[..., :C8].reshape(24, 32, 256, 8, K).argmax(-1).astype(
        np.uint8).transpose(0, 3, 1, 2)
    agree = (np.asarray(cls) == ref).mean()
    assert agree > 0.999, agree
    a2 = np.asarray(acc2)
    for i in range(10):
        assert (a2[(5 + i) % 48] == 0).all(), i
    assert (a2[(5 + 11) % 48] != 0).any()
    return f"finalize_cyclic OK agree={agree:.4f}"


def probe_s2d_accumulate():
    from fast_nnunet_tpu.ops.pallas_s2d import fused_head_gauss_accumulate
    rng = np.random.RandomState(3)
    B, p0h, pyh, pzh, F8 = 4, 48, 48, 80, 128
    c8p = 512
    acc = jnp.zeros((p0h, 96, 160, c8p), jnp.float32)
    feats = jnp.asarray(rng.rand(B, p0h, pyh, pzh, F8) - 0.5, jnp.bfloat16)
    g = jnp.asarray(rng.rand(p0h, pyh, pzh, 8), jnp.float32)
    w = jnp.asarray(rng.rand(F8, C8) - 0.5, jnp.bfloat16)
    b = jnp.asarray(rng.rand(C8) - 0.5, jnp.bfloat16)
    coords = jnp.asarray([[0, 0], [0, 80], [48, 0], [48, 80]], jnp.int32)
    out = jax.jit(lambda *a: fused_head_gauss_accumulate(*a))(
        acc, feats, g, w, b, coords, jnp.int32(4), jnp.int32(0))
    # reference
    ref = np.zeros((p0h, 96, 160, c8p), np.float32)
    y = (np.asarray(feats, np.float32) @ np.asarray(w, np.float32)
         + np.asarray(b, np.float32))
    yk = y.reshape(B, p0h, pyh, pzh, 8, K)
    contrib = (yk * np.asarray(g)[None, ..., None]).reshape(
        B, p0h, pyh, pzh, C8)
    for i, (cy, cz) in enumerate(np.asarray(coords)):
        ref[:, cy:cy + pyh, cz:cz + pzh, :C8] += contrib[i]
    err = np.abs(np.asarray(out) - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert err < 5e-2, err
    return f"s2d_accumulate OK rel_err={err:.4f}"


if __name__ == "__main__":
    which = sys.argv[1:] or ["stats", "finalize", "finalize_f32",
                             "finalize_cyclic", "s2dk"]
    fns = {"stats": probe_stats,
           "finalize": probe_finalize,
           "finalize_f32": lambda: probe_finalize(jnp.float32, 512),
           "finalize_cyclic": probe_finalize_cyclic,
           "s2dk": probe_s2d_accumulate}
    for w in which:
        try:
            print(fns[w]())
        except Exception:
            print(f"--- {w} FAILED ---")
            traceback.print_exc()
