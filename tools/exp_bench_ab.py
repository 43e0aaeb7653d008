"""A/B the full 1024^2/75-step bench program across effect-config deltas.

Usage: python tools/exp_bench_ab.py size steps key=value...
e.g.  python tools/exp_bench_ab.py 1024 75 fill_phase0=0
Runs bench.py's exact configuration with the given EffectConfig overrides
and prints fps/latency — for attributing frame-loop regressions to a
single config knob without editing bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 75
    overrides = {}
    for kv in sys.argv[3:]:
        k, v = kv.split("=")
        overrides[k] = float(v) if "." in v else int(v)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from kbe_tpu.config import EffectConfig, ZoomSettings
    from kbe_tpu.pipeline.kenburns import KenBurnsPipeline, build_effect_fn
    from kbe_tpu.train.checkpoint import (find_bench_weights,
                                          load_pipeline_params)
    from kbe_tpu.train.data import demo_scene_image

    effect = EffectConfig(num_steps=steps, **overrides)
    pipe = KenBurnsPipeline.create(jax.random.PRNGKey(0), 64, 64)
    zoom = ZoomSettings.default_3d(size, size)
    fn = jax.jit(build_effect_fn(size, size, zoom, pipe.camera, effect,
                                 dtype=jnp.bfloat16,
                                 depth_dtype=jnp.float32, with_stats=True))
    ckpt = find_bench_weights()
    assert ckpt
    params = jax.device_put(load_pipeline_params(ckpt))
    image = jnp.asarray(demo_scene_image(size, size), jnp.float32)[None]

    def run_once():
        frames, stats = fn(params, image)
        return float(jnp.sum(frames[:, ::128, ::128, 0]
                             .astype(jnp.float32)))

    t0 = time.time()
    run_once()
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({"size": size, "steps": steps,
                      "overrides": overrides,
                      "fps": round(steps / best, 3),
                      "latency_s": round(best, 4),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
