"""Compile-time diagnostic: wall-clock of jit-compiling the effect
program per configuration — isolates which config knob owns the compile
budget (the driver's cold bench run lives or dies on this).

Usage: python tools/diag_compile.py [size] [steps] [variant...]
Variants: prod (bench config), nophase0, xlafill, f32
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    variants = sys.argv[3:] or ["prod", "nophase0"]

    import jax
    import jax.numpy as jnp

    from kbe_tpu.config import EffectConfig, ZoomSettings
    from kbe_tpu.pipeline.kenburns import KenBurnsPipeline, build_effect_fn

    h = w = size
    zoom = ZoomSettings.default_3d(w, h)
    pipe = KenBurnsPipeline.create(jax.random.PRNGKey(0), 64, 64)

    cfg = {
        "prod": dict(effect=EffectConfig(num_steps=steps),
                     dtype=jnp.bfloat16, depth_dtype=jnp.float32),
        "nophase0": dict(effect=EffectConfig(num_steps=steps,
                                             fill_phase0=0),
                         dtype=jnp.bfloat16, depth_dtype=jnp.float32),
        "xlafill": dict(effect=EffectConfig(num_steps=steps,
                                            fill_impl="xla"),
                        dtype=jnp.bfloat16, depth_dtype=jnp.float32),
        "f32": dict(effect=EffectConfig(num_steps=steps),
                    dtype=jnp.float32),
    }
    image = jnp.zeros((1, h, w, 3), jnp.float32)
    for name in variants:
        kw = cfg[name]
        fn = build_effect_fn(h, w, zoom, pipe.camera, kw["effect"],
                             dtype=kw["dtype"],
                             depth_dtype=kw.get("depth_dtype"),
                             with_stats=True)
        t0 = time.time()
        lowered = jax.jit(fn).lower(pipe.params, image)
        t1 = time.time()
        lowered.compile()
        t2 = time.time()
        print(f"{name:10s} size={size} steps={steps} "
              f"trace+lower={t1 - t0:6.1f}s compile={t2 - t1:7.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
