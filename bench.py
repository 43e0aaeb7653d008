"""Benchmark: full 3D Ken Burns effect throughput on one chip.

Headline metric (BASELINE.md): KBE frames/sec/chip at 1024^2 — the
reference's fixed effect is 75 frames per video and the north-star target
is 75 x 1024^2 frames end-to-end (depth -> refine -> inpaint-extend ->
render+fill all 75 poses) in < 1 s on one chip, i.e. baseline 75 frames/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
1024^2 headline, with extra keys: per-size frames/s ("fps_512",
"fps_1024"), end-to-end latency seconds, and the measurement size actually
used ("size" — 1024 unless that size failed to run, in which case
"fallback" records the error class and the headline value is 0.0 rather
than silently reporting a smaller size).

Environment knobs: KBE_BENCH_SIZE (default 1024; "both" also measures
512), KBE_BENCH_STEPS (75), KBE_BENCH_REPEATS (3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _enable_compile_cache():
    """Persistent XLA compilation cache next to the repo.

    The 1024^2 effect program (75-pose loop with Pallas kernels + the
    inpaint bootstrap nets) takes minutes to compile cold; the cache makes
    any repeat invocation — including a fresh process — start from the
    compiled binary instead.
    """
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax: flag names differ; cold compile still works


def run_bench(size: int, steps: int, repeats: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kbe_tpu.config import EffectConfig, ZoomSettings
    from kbe_tpu.pipeline.kenburns import KenBurnsPipeline, build_effect_fn
    from kbe_tpu.train.checkpoint import (find_bench_weights,
                                          load_pipeline_params)
    from kbe_tpu.train.data import demo_scene_image

    effect = EffectConfig(num_steps=steps)
    pipe = KenBurnsPipeline.create(jax.random.PRNGKey(0), size, size,
                                   effect=effect, dtype=jnp.bfloat16)
    zoom = ZoomSettings.default_3d(size, size)
    fn = jax.jit(build_effect_fn(size, size, zoom, pipe.camera, effect,
                                 dtype=jnp.bfloat16, with_stats=True))

    # Weights + scene: the deterministic synthetic-training recipe
    # (tools/make_bench_weights.py) when present — the reference's
    # benchmark-by-demo regime (trained weights, realistic image). The
    # fallback (random weights + noise image) is an adversarial outlier
    # for the banded renderer and is flagged in the JSON.
    ckpt = find_bench_weights()
    if ckpt:
        # device_put ONCE: the restored checkpoint is host numpy; leaving
        # it as args would re-upload ~350 MB through the tunnel per call
        params = jax.device_put(load_pipeline_params(ckpt))
        image = jnp.asarray(demo_scene_image(size, size),
                            jnp.float32)[None]
        weights = "trained-synthetic"
    else:
        params = pipe.params
        rng = np.random.default_rng(0)
        image = jnp.asarray(rng.uniform(0, 1, (1, size, size, 3)),
                            jnp.float32)
        weights = "random (adversarial depth; run "\
            "tools/make_bench_weights.py)"

    overflow = [0]

    def run_once():
        frames, stats = fn(params, image)
        overflow[0] = int(stats["splat_overflow_frames"])
        # NOTE: block_until_ready does not actually block on the axon
        # tunnel backend — force synchronization with a scalar host fetch.
        return float(jnp.sum(frames[:, ::128, ::128, 0]))

    run_once()  # compile + warmup

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    best = min(times)
    return steps / best, best, {"weights": weights,
                                "splat_overflow_frames": overflow[0]}


def main():
    _enable_compile_cache()
    size_env = os.environ.get("KBE_BENCH_SIZE", "1024")
    steps = int(os.environ.get("KBE_BENCH_STEPS", "75"))
    repeats = int(os.environ.get("KBE_BENCH_REPEATS", "3"))

    sizes = [512, 1024] if size_env == "both" else [int(size_env)]
    headline_size = sizes[-1]

    baseline_fps = 75.0  # north star: 75 frames < 1 s on one chip
    out = {}
    fps = 0.0
    for size in sizes:
        try:
            f, latency, info = run_bench(size, steps, repeats)
            out[f"fps_{size}"] = round(f, 3)
            out[f"latency_s_{size}"] = round(latency, 4)
            out[f"splat_overflow_frames_{size}"] = \
                info["splat_overflow_frames"]
            out["weights"] = info["weights"]
            if size == headline_size:
                fps = f
            if os.environ.get("KBE_BENCH_STAGES"):
                # stage split: a 2-step run isolates the fixed front-end
                # (CNNs + inpaint bootstrap) from the per-frame loop cost
                _, lat2, _ = run_bench(size, 2, repeats)
                per_frame = max(latency - lat2, 0.0) / max(steps - 2, 1)
                out[f"frame_ms_{size}"] = round(per_frame * 1e3, 2)
                out[f"frontend_ms_{size}"] = round(
                    max(lat2 - 2 * per_frame, 0.0) * 1e3, 1)
        except Exception as e:  # report, never silently shrink the size
            out[f"fallback_{size}"] = type(e).__name__
            if size == headline_size:
                fps = 0.0

    out.update({
        "metric": f"kbe_frames_per_sec_{headline_size}",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / baseline_fps, 4),
        "size": headline_size,
    })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
