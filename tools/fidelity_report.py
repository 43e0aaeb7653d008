"""Fidelity artifact: the BENCHMARKED path vs the executable spec path.

bench.py measures the banded/posed Pallas splat + two-phase Pallas fill +
bf16 nets; the e2e oracle (tests/test_oracle_e2e.py) proves the
scatter + XLA-fill + f32 configuration against the reference's own
pipeline code. This tool closes the gap (VERDICT r2 "next round" #3): it
renders the SAME scene through both configurations on the real chip and
records per-frame SSIM / max-abs-diff of the final uint8 frames into
FIDELITY_r{N}.json.

Notes:
  * both paths share one set of weights; the spec path runs f32 nets, so
    the measured delta includes the bf16 cost of the production path —
    exactly the number VERDICT asked to bound;
  * weights + scene come from the deterministic synthetic-training recipe
    (tools/make_bench_weights.py) when its checkpoint exists — the same
    configuration bench.py measures. Without it the report falls back to
    random weights + a noise image, whose depth is adversarial for the
    banded renderer (README "Performance": chunks exceed the per-chunk
    window budget and are clipped); `splat_overflow_frames` records that
    context either way.

Usage: python tools/fidelity_report.py [size] [n_steps] [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else "FIDELITY_r03.json"

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from kbe_tpu.config import EffectConfig, ZoomSettings
    from kbe_tpu.ops.image_ops import ssim
    from kbe_tpu.pipeline.kenburns import KenBurnsPipeline, build_effect_fn
    from kbe_tpu.train.checkpoint import (find_bench_weights,
                                          load_pipeline_params)
    from kbe_tpu.train.data import demo_scene_image

    h = w = size
    zoom = ZoomSettings.default_3d(w, h)

    ckpt = find_bench_weights()
    if ckpt:
        image = jnp.asarray(demo_scene_image(h, w), jnp.float32)[None]
        scene = f"trained-synthetic weights ({os.path.basename(ckpt)}) + " \
                "procedural demo scene (tools/make_bench_weights.py)"
    else:
        rng = np.random.default_rng(0)
        image = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
        scene = "random weights + noise image (no bench checkpoint; " \
                "adversarial depth for the banded renderer — see README)"

    # the production (benchmarked) configuration — bench.py's exact setup
    bench_effect = EffectConfig(num_steps=n_steps)
    pipe = KenBurnsPipeline.create(jax.random.PRNGKey(0), h, w,
                                   effect=bench_effect, dtype=jnp.bfloat16)
    params = load_pipeline_params(ckpt) if ckpt else pipe.params
    bench_fn = jax.jit(build_effect_fn(h, w, zoom, pipe.camera,
                                       bench_effect, dtype=jnp.bfloat16,
                                       with_stats=True))

    # the spec configuration: exact scatter splat + pure-XLA fill + f32
    # nets (the path the e2e oracle proves against the reference)
    spec_effect = EffectConfig(num_steps=n_steps, splat_method="scatter",
                               fill_impl="xla")
    spec_fn = jax.jit(build_effect_fn(h, w, zoom, pipe.camera, spec_effect,
                                      dtype=jnp.float32))

    # dtype-isolating row: the SAME production kernels (posed/banded +
    # Pallas fill) with f32 nets — any delta vs spec here is the kernels'
    # own, while bench-vs-this isolates the bf16 net cost
    kern_fn = jax.jit(build_effect_fn(h, w, zoom, pipe.camera,
                                      bench_effect, dtype=jnp.float32,
                                      with_stats=True))

    t0 = time.time()
    bench_frames, stats = jax.block_until_ready(bench_fn(params, image))
    t_bench = time.time() - t0
    t0 = time.time()
    spec_frames = jax.block_until_ready(spec_fn(params, image))
    t_spec = time.time() - t0
    t0 = time.time()
    kern_frames, kstats = jax.block_until_ready(kern_fn(params, image))
    t_kern = time.time() - t0

    sf = np.asarray(spec_frames, np.float64) / 255.0

    def vs_spec(frames):
        bf = np.asarray(frames, np.float64) / 255.0
        ssims = [float(ssim(jnp.asarray(bf[i][None], jnp.float32),
                            jnp.asarray(sf[i][None], jnp.float32)))
                 for i in range(n_steps)]
        return {
            "mean_ssim": float(np.mean(ssims)),
            "min_ssim": float(np.min(ssims)),
            "per_frame_ssim": [round(s, 5) for s in ssims],
            "max_abs_diff_uint8": float(np.max(np.abs(bf - sf)) * 255.0),
            "mean_abs_diff_uint8": float(np.mean(np.abs(bf - sf)) * 255.0),
        }

    bench_row = vs_spec(bench_frames)
    kern_row = vs_spec(kern_frames)
    report = {
        "size": size,
        "n_steps": n_steps,
        "spec_path": "splat=scatter fill=xla dtype=float32",
        "bench_path": "splat=posed/banded fill=pallas dtype=bfloat16 "
                      "(bench.py's configuration)",
        **bench_row,
        "kernels_f32_path": {
            "config": "splat=posed/banded fill=pallas dtype=float32 — "
                      "same kernels, f32 nets; isolates the bf16 net "
                      "cost from the kernel fidelity",
            **kern_row,
            "splat_overflow_frames": int(kstats["splat_overflow_frames"]),
        },
        "splat_overflow_frames": int(stats["splat_overflow_frames"]),
        "scene": scene,
        "wall_s": {"bench_path": round(t_bench, 1),
                   "spec_path": round(t_spec, 1),
                   "kernels_f32_path": round(t_kern, 1)},
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
