"""Deterministic bench/demo weights via brief synthetic supervised training.

The reference always benchmarks-by-demo with its released trained weights
(reference download.sh:11-33); this environment is offline, so no real
checkpoint can flow through the system. The substitute (VERDICT r3 next #6):
a seeded, deterministic-recipe training run on the procedural RGBD
generator — a few hundred supervised steps for each net of the inference
stack — saved as ONE orbax checkpoint under ``.bench_weights/``.

The point is COHERENT outputs, not metric chasing: random-weight nets emit
noise depth, which is an *adversarial* input for the banded splat renderer
(per-chunk displacement spread -> window-budget overflow -> clipped splats)
and for the disocclusion fill (thin scattered holes in every tile). Trained
nets emit piecewise-smooth depth — the regime the reference's production
weights produce and the one bench.py is meant to measure.

Regenerate with: ``python tools/make_bench_weights.py`` (~10 min on one
chip, cached compiles). bench.py / tools/fidelity_report.py pick the
checkpoint up automatically when present; the directory is gitignored
(weights are ~350 MB — too big for git history) and reproducible from this
recipe.

Env knobs: KBE_BW_STEPS_DEPTH (300), KBE_BW_STEPS_REFINE (150),
KBE_BW_STEPS_INPAINT (300), KBE_BW_DIR (.bench_weights).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from kbe_tpu.config import CameraConfig
    from kbe_tpu.models import Semantics
    from kbe_tpu.train.checkpoint import save_checkpoint
    from kbe_tpu.train.data import synthetic_batches
    from kbe_tpu.train.trainer_depth import TrainerDepth
    from kbe_tpu.train.trainer_inpaint import TRAIN_CAMERA, TrainerInpaint

    steps_depth = int(os.environ.get("KBE_BW_STEPS_DEPTH", "300"))
    steps_refine = int(os.environ.get("KBE_BW_STEPS_REFINE", "150"))
    steps_inpaint = int(os.environ.get("KBE_BW_STEPS_INPAINT", "300"))
    out_dir = os.environ.get("KBE_BW_DIR", os.path.join(REPO,
                                                        ".bench_weights"))

    camera = CameraConfig(512.0, 74.0)

    # ---- depth estimation (disparity grid-net), 384x512 images ----
    h, w = 384, 512
    sem = Semantics()
    sem_params = sem.init(jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3)))
    trainer = TrainerDepth(
        {"model_to_train": "both", "lr_estimation": 1e-4,
         "lr_refine": 1e-5, "gamma_lr": 0.99995, "init": "xavier",
         "estimation_size": 512},
        semantics_params=sem_params,
        logs_path="/tmp/kbe_runs/bench_weights_depth")
    dstate, rstate = trainer.init_state((h, w), "refine")

    step_fn = jax.jit(trainer.disparity_train_step)
    t0 = time.time()
    for i, batch in enumerate(synthetic_batches(
            2, h, w, mode="disparity", camera=camera, seed=2,
            steps=steps_depth)):
        dstate, metrics = step_fn(dstate, {k: jnp.asarray(v)
                                           for k, v in batch.items()})
        if i % 50 == 0:
            print(f"[depth {i}/{steps_depth}] total="
                  f"{float(metrics['total']):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    # ---- refinement U-net at full res (frozen estimation) ----
    rh, rw = 768, 1024
    rstep_fn = jax.jit(trainer.refine_train_step)
    t0 = time.time()
    for i, batch in enumerate(synthetic_batches(
            1, rh, rw, mode="refine", camera=camera, seed=3,
            steps=steps_refine)):
        rstate, metrics = rstep_fn(dstate, rstate,
                                   {k: jnp.asarray(v)
                                    for k, v in batch.items()})
        if i % 50 == 0:
            print(f"[refine {i}/{steps_refine}] total="
                  f"{float(metrics['total']):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    # ---- inpainting (context + grid-net), supervised ----
    ih, iw = 384, 512
    itrainer = TrainerInpaint(
        {"model_to_train": "inpainting", "lr_inpaint": 1e-4,
         "gamma_lr": 0.99997, "init": "xavier"},
        camera=TRAIN_CAMERA,
        logs_path="/tmp/kbe_runs/bench_weights_inpaint")
    istate = itrainer.init_state((ih, iw))
    istep_fn = jax.jit(itrainer.supervised_step)
    t0 = time.time()
    for i, batch in enumerate(synthetic_batches(
            1, ih, iw, mode="inpainting", camera=TRAIN_CAMERA, seed=4,
            steps=steps_inpaint)):
        b = {k: (jnp.asarray(v) if k != "zoom"
                 else {kk: jnp.asarray(vv) for kk, vv in v.items()})
             for k, v in batch.items()}
        istate, metrics = istep_fn(istate, b)
        if i % 50 == 0:
            print(f"[inpaint {i}/{steps_inpaint}] total="
                  f"{float(metrics['total']):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    payload = {
        "semantics": jax.device_get(sem_params),
        "disparity": jax.device_get(dstate.params),
        "refine": jax.device_get(rstate.params),
        "context": jax.device_get(istate.context),
        "inpaint": jax.device_get(istate.net),
        # the bench pipeline runs a single shared inpaint net (the
        # reference's default: --inpaint-depth is optional)
    }
    path = save_checkpoint(out_dir, "pipeline",
                           payload, steps_depth + steps_refine
                           + steps_inpaint)
    print(f"saved {path}")


if __name__ == "__main__":
    main()
