"""Benchmark: full 3D Ken Burns effect throughput on one chip.

Headline metric (BASELINE.md): KBE frames/sec/chip at 1024^2 — the
reference's fixed effect is 75 frames per video and the north-star target
is 75 x 1024^2 frames end-to-end (depth -> refine -> inpaint-extend ->
render+fill all 75 poses) in < 1 s on one chip, i.e. baseline 75 frames/s.

Output protocol (designed to survive a driver timeout): a complete JSON
line is printed after EVERY completed measurement, progressively richer —
512^2 first, then the 1024^2 headline. Each line carries the full schema
{"metric", "value", "unit", "vs_baseline"} plus per-size keys ("fps_512",
"fps_1024", latencies) and a "phase" marker showing what the process was
doing when the line was emitted. The LAST printed line is authoritative;
if the process is killed mid-compile the previously printed lines still
record everything measured so far. SIGTERM/SIGINT (what `timeout` sends
first) additionally trigger a final salvage emission.

The headline "value" is 0.0 until the 1024^2 measurement lands — a
smaller size is never silently promoted to the headline.

Environment knobs: KBE_BENCH_SIZE (default "both" = 512 then 1024),
KBE_BENCH_STEPS (75), KBE_BENCH_REPEATS (3), KBE_BENCH_BUDGET_S (default
1380: skip starting any new measurement once this much wall-clock is
spent, emitting what exists instead of being killed mid-run).

COLD-RUN REALITY (round 5): the axon TPU backend BYPASSES persistent-
compilation-cache READS for nontrivial programs (entries are written to
.jax_cache but never loaded — verified with JAX_DEBUG_LOG_MODULES; a
second process recompiles from scratch). Every driver run is therefore
a cold compile: ~6-8 min for the 512^2 program + ~5 min for 1024^2 on a
responsive compile service (one outlier of 42 min was observed). The
512-first ordering + per-measurement emission + SIGTERM salvage exist
exactly so a budget-killed run still lands real numbers.
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_T0 = time.time()
_BASELINE_FPS = 75.0  # north star: 75 frames < 1 s on one chip
_OUT = {
    "metric": "kbe_frames_per_sec_1024",
    "value": 0.0,
    "unit": "frames/s/chip",
    "vs_baseline": 0.0,
    "size": 1024,
    "phase": "starting",
}


def emit():
    _OUT["elapsed_s"] = round(time.time() - _T0, 1)
    print(json.dumps(_OUT), flush=True)


def _on_term(signum, frame):
    _OUT["phase"] = f"killed_by_signal_{signum}_during_{_OUT['phase']}"
    emit()
    os._exit(0)


def _budget() -> float:
    return float(os.environ.get("KBE_BENCH_BUDGET_S", "1380"))


def _remaining() -> float:
    return _budget() - (time.time() - _T0)


def _enable_compile_cache():
    """Persistent XLA compilation cache next to the repo.

    The 1024^2 effect program (75-pose loop with Pallas kernels + the
    inpaint bootstrap nets) takes minutes to compile cold; the cache makes
    any repeat invocation — including a fresh process — start from the
    compiled binary instead. The round-end freeze protocol (README) keeps
    this cache warm for the program as last committed.
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
    # production precision policy (tools/dtype_sweep.py, round 5): f32
    # depth path (the geometry that positions every splat) + bf16 inpaint
    # stack — 0.9961 mean SSIM vs spec at 512^2 against 0.9860 all-bf16,
    # for ~6% latency
    fn = jax.jit(build_effect_fn(size, size, zoom, pipe.camera, effect,
                                 dtype=jnp.bfloat16,
                                 depth_dtype=jnp.float32, with_stats=True))

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
        return float(jnp.sum(frames[:, ::128, ::128, 0]
                             .astype(jnp.float32)))

    _OUT["phase"] = f"compiling_{size}"
    run_once()  # compile + warmup

    _OUT["phase"] = f"timing_{size}"
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    best = min(times)
    return steps / best, best, {"weights": weights,
                                "splat_overflow_frames": overflow[0]}


def main():
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    _enable_compile_cache()
    size_env = os.environ.get("KBE_BENCH_SIZE", "both")
    steps = int(os.environ.get("KBE_BENCH_STEPS", "75"))
    repeats = int(os.environ.get("KBE_BENCH_REPEATS", "3"))

    if size_env == "both":
        sizes = [512, 1024]
    else:
        sizes = [int(size_env)]
    headline_size = 1024 if 1024 in sizes else sizes[-1]
    _OUT["metric"] = f"kbe_frames_per_sec_{headline_size}"
    _OUT["size"] = headline_size

    for size in sizes:
        if size != headline_size and _remaining() < 120.0:
            # protect the headline: skip warmup sizes when budget is tight
            _OUT[f"skipped_{size}"] = "budget"
            continue
        if _remaining() <= 0.0:
            _OUT["phase"] = f"budget_exhausted_before_{size}"
            break
        try:
            f, latency, info = run_bench(size, steps, repeats)
            _OUT[f"fps_{size}"] = round(f, 3)
            _OUT[f"latency_s_{size}"] = round(latency, 4)
            _OUT[f"splat_overflow_frames_{size}"] = \
                info["splat_overflow_frames"]
            _OUT["weights"] = info["weights"]
            if size == headline_size:
                _OUT["value"] = round(f, 3)
                _OUT["vs_baseline"] = round(f / _BASELINE_FPS, 4)
            _OUT["phase"] = f"done_{size}"
            emit()
            if os.environ.get("KBE_BENCH_STAGES") and _remaining() > 60.0:
                # stage split: a 2-step run isolates the fixed front-end
                # (CNNs + inpaint bootstrap) from the per-frame loop cost
                _, lat2, _ = run_bench(size, 2, repeats)
                per_frame = max(latency - lat2, 0.0) / max(steps - 2, 1)
                _OUT[f"frame_ms_{size}"] = round(per_frame * 1e3, 2)
                _OUT[f"frontend_ms_{size}"] = round(
                    max(lat2 - 2 * per_frame, 0.0) * 1e3, 1)
                emit()
        except Exception as e:  # report, never silently shrink the size
            _OUT[f"fallback_{size}"] = type(e).__name__
            _OUT["phase"] = f"failed_{size}"
            emit()

    _OUT["phase"] = "complete"
    emit()


if __name__ == "__main__":
    main()
