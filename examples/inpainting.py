"""Inpainting analysis — script equivalent of the reference's
``notebooks/Inpainting.ipynb``: runs InpaintEval over a dataset (or
synthetic RGBD scenes), prints PSNR/SSIM (+FID), and saves visualizations
of the masked view, the inpainted view, and the halfway view C.

Usage:
  JAX_PLATFORMS=cpu python examples/inpainting.py \
      [--dataset name:path:focal:baseline] [--checkpoint dir] \
      [--out /tmp/inpaint_eval.png] [--view-c]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", action="append", default=[])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default="/tmp/inpaint_eval.png")
    p.add_argument("--view-c", action="store_true")
    p.add_argument("--batches", type=int, default=2)
    p.add_argument("--fid", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from kbe_tpu.models import Inpaint
    from kbe_tpu.models.gridnet import ContextNet
    from kbe_tpu.train.data import synthetic_batches
    from kbe_tpu.train.eval_inpaint import InpaintEval
    from kbe_tpu.train.trainer_inpaint import TRAIN_CAMERA

    h, w = 192, 256
    rng = jax.random.PRNGKey(0)
    ctx, net = ContextNet(), Inpaint()
    params = {
        "context": ctx.init(rng, jnp.zeros((1, h, w, 3)),
                            jnp.zeros((1, h, w, 1))),
        "net": net.init(rng, jnp.zeros((1, h, w, 68)),
                        jnp.zeros((1, h, w, 1))),
    }
    if args.checkpoint:
        from kbe_tpu.train.checkpoint import load_checkpoint

        params, _ = load_checkpoint(args.checkpoint, params)

    ev = InpaintEval(params, camera=TRAIN_CAMERA)

    if args.dataset:
        from cli.train import parse_dataset
        from kbe_tpu.train.data import KBEDataset

        ds = KBEDataset([parse_dataset(d) for d in args.dataset],
                        mode="inpainting")
        _, val_idx = ds.split()
        batches = list(ds.batches(val_idx, 1, shuffle=False, epochs=1))
    else:
        print("No dataset — using synthetic RGBD scenes.")
        batches = list(synthetic_batches(1, h, w, mode="inpainting",
                                         camera=TRAIN_CAMERA,
                                         steps=args.batches))

    metrics = ev.eval(iter(batches), compute_fid=args.fid)
    print("Inpaint metrics:", {k: round(float(v), 4)
                               for k, v in metrics.items()})

    import imageio.v2 as iio

    views = ev.get_inpaint(batches[0], output_render_c=args.view_c)
    if args.view_c:
        panel = np.concatenate([
            views["image_a"][0],
            views["inpaint_image_b"][0],
            np.clip(views["render_c"][0, ..., :3], 0, 1)], axis=1)
    else:
        panel = np.concatenate([
            views["image"][0],
            views["image"][0] * views["masks"][0],
            views["inpaint_image"][0]], axis=1)
    iio.imwrite(args.out, (np.clip(panel, 0, 1) * 255).astype(np.uint8))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
