"""Static HLO cost attribution for the s2d sweep: lower + compile the exact
sweep program (warm persistent cache makes this a fetch), then rank ops by
the backend's own `estimated_cycles` annotations and print the BODIES of the
top fusions — names like `fusion.858` in a profiler trace are opaque until
you read what XLA fused into them.

Usage: [BENCH_PALLAS_S2D=1 BENCH_PALLAS_FINALIZE=1] \
           python experiments/hlo_cost.py [--size 512] [--top 25] [--out f]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--classes", type=int, default=61)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default="/tmp/hlo_sweep.txt")
    ap.add_argument("--body_lines", type=int, default=24)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _bone_turbo_student, _bone_turbo_student_kwargs
    from fast_nnunet_tpu.inference.engine import SlidingWindowEngine
    from fast_nnunet_tpu.ops.sliding_window import tile_coords_from_steps
    from fast_nnunet_tpu.models.s2d import make_s2d_engine_net

    K = args.classes
    net = _bone_turbo_student(num_classes=K, dtype=jnp.bfloat16)
    patch = (96, 96, 160)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, *patch, 1), jnp.bfloat16),
                      deep_supervision=False)
    s2d = make_s2d_engine_net(net, _bone_turbo_student_kwargs(), K,
                              dtype=jnp.bfloat16)
    params = s2d.convert_params(params)
    engine = SlidingWindowEngine(
        s2d, patch, K, tile_step_size=0.5, use_gaussian=True, mirror_axes=(),
        compute_dtype=jnp.bfloat16, acc_dtype=jnp.float32,
        sweep_acc_dtype=jnp.bfloat16, shape_bucket=32, tile_batch=8,
        max_accumulator_bytes=4 * 1024 ** 3, use_s2d_sweep=True,
        use_pallas_s2d=os.environ.get("BENCH_PALLAS_S2D", "0") == "1",
        use_pallas_finalize=os.environ.get("BENCH_PALLAS_FINALIZE", "0") == "1")

    spatial = (args.size,) * 3
    vol_shape, steps = engine.s2d_sweep_plan(spatial)
    starts_x = tuple(steps[0])
    coords_yz = tile_coords_from_steps(steps[1:])
    coords_full = np.concatenate(
        [np.zeros((len(coords_yz), 1), np.int32), coords_yz], axis=1)
    use_pallas = engine.use_pallas_s2d
    if use_pallas:
        coords_b, valid_b = engine._batched_coords_phase(coords_full)
    else:
        coords_b, valid_b = engine._batched_coords(coords_full)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[params])
    sweep = engine._build_sweep_runner_s2d(
        vol_shape, starts_x, len(coords_b), 1, 1, use_pallas=use_pallas)

    vol = jax.ShapeDtypeStruct(vol_shape + (1,), jnp.bfloat16)
    lowered = sweep.lower(stacked, vol, jnp.asarray(coords_b),
                          jnp.asarray(valid_b))
    print("lowered; compiling (warm cache = fetch) ...", flush=True)
    txt = lowered.compile().as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt) >> 20} MB)")

    # rank by estimated_cycles
    costs = []
    for m in re.finditer(
            r'^\s*(?:ROOT )?%?([\w.\-]+) = [^\n]*?"estimated_cycles":"?(\d+)',
            txt, re.MULTILINE):
        costs.append((int(m.group(2)), m.group(1)))
    costs.sort(reverse=True)
    total = sum(c for c, _ in costs)
    print(f"\n{len(costs)} annotated ops, total estimated cycles {total:,}")
    body_of = {}
    for m in re.finditer(r"^%?([\w.\-]+)(?:\.clone)? \(.*?\{$", txt,
                         re.MULTILINE):
        start = m.start()
        body_of[m.group(1)] = txt[start:start + 6000]
    for c, name in costs[:args.top]:
        print(f"\n### {name}: {c:,} cycles ({100.0 * c / total:.1f}%)")
        # a fusion instruction references its computation; find it
        mm = re.search(rf"%?{re.escape(name)} = [^\n]*", txt)
        if mm:
            print("  inst:", mm.group(0)[:400])
        comp = re.search(rf"calls=%?([\w.\-]+)", mm.group(0)) if mm else None
        if comp and comp.group(1) in body_of:
            lines = body_of[comp.group(1)].splitlines()[:args.body_lines]
            print("  body:")
            for ln in lines:
                print("   ", ln[:220])


if __name__ == "__main__":
    main()
