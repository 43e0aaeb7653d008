"""Mixed-precision sweep: SSIM-vs-spec and front-end cost per dtype policy.

VERDICT r4 #3: the benchmarked bf16 path measures 0.986 mean SSIM while the
same kernels with f32 nets measure 0.9967 — the gap is the nets. This tool
measures the candidate mixed-precision boundaries at one size so the bench
configuration can be chosen on data:

  * all-bf16        — round-4 bench config (now with the f32 geometry
                      boundary in the pipeline: disparity cast to f32
                      right after refine, killing downstream accumulation)
  * depth-f32       — semantics/disparity/refine f32, inpaint stack bf16
                      (the geometry that positions every splat is exact;
                      only disoccluded-region colors carry bf16 error)
  * all-f32         — upper bound (the kernels-f32 row of FIDELITY_r04)

Each row reports mean/min SSIM vs the spec path (scatter + XLA fill + f32)
and the measured end-to-end latency at the sweep size.

Usage: python tools/dtype_sweep.py [size] [n_steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

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
    assert ckpt, "run tools/make_bench_weights.py first"
    params = jax.device_put(load_pipeline_params(ckpt))
    image = jnp.asarray(demo_scene_image(h, w), jnp.float32)[None]

    effect = EffectConfig(num_steps=n_steps)
    pipe = KenBurnsPipeline.create(jax.random.PRNGKey(0), 64, 64,
                                   effect=effect)

    spec_effect = EffectConfig(num_steps=n_steps, splat_method="scatter",
                               fill_impl="xla")
    spec_fn = jax.jit(build_effect_fn(h, w, zoom, pipe.camera, spec_effect,
                                      dtype=jnp.float32))
    sf = np.asarray(jax.block_until_ready(spec_fn(params, image)),
                    np.float64) / 255.0

    configs = {
        "all_bf16": dict(dtype=jnp.bfloat16),
        "depth_f32": dict(dtype=jnp.bfloat16, depth_dtype=jnp.float32),
        "all_f32": dict(dtype=jnp.float32),
    }
    for name, kw in configs.items():
        fn = jax.jit(build_effect_fn(h, w, zoom, pipe.camera, effect,
                                     with_stats=True, **kw))
        frames, stats = fn(params, image)
        float(jnp.sum(frames[:, ::64, ::64, 0].astype(jnp.float32)))  # sync
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            frames, stats = fn(params, image)
            float(jnp.sum(frames[:, ::64, ::64, 0].astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        bf = np.asarray(frames, np.float64) / 255.0
        ssims = [float(ssim(jnp.asarray(bf[i][None], jnp.float32),
                            jnp.asarray(sf[i][None], jnp.float32)))
                 for i in range(n_steps)]
        print(json.dumps({
            "config": name, "size": size, "n_steps": n_steps,
            "mean_ssim": round(float(np.mean(ssims)), 5),
            "min_ssim": round(float(np.min(ssims)), 5),
            "per_frame_ssim": [round(s, 5) for s in ssims],
            "max_abs_diff_uint8": float(np.max(np.abs(bf - sf)) * 255.0),
            "latency_s": round(min(times), 3),
            "overflow": int(stats["splat_overflow_frames"]),
        }), flush=True)


if __name__ == "__main__":
    main()
