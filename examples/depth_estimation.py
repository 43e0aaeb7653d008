"""Depth estimation analysis — script equivalent of the reference's
``notebooks/Depth_estimation.ipynb``: runs DepthEval over a dataset (or
synthetic RGBD scenes), prints the 7 depth metrics, and saves a
side-by-side visualization (input / estimation / refined / GT).

Usage:
  JAX_PLATFORMS=cpu python examples/depth_estimation.py \
      [--dataset name:path:focal:baseline] [--checkpoint dir] \
      [--out /tmp/depth_eval.png]
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
    p.add_argument("--out", default="/tmp/depth_eval.png")
    p.add_argument("--batches", type=int, default=2)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from kbe_tpu.config import CameraConfig
    from kbe_tpu.models import Disparity, Refine, Semantics
    from kbe_tpu.train.data import synthetic_batches
    from kbe_tpu.train.eval_depth import DepthEval

    h, w = 192, 256
    camera = CameraConfig(512.0, 74.0)

    rng = jax.random.PRNGKey(0)
    sem, disp, ref = Semantics(), Disparity(), Refine()
    params = {
        "semantics": sem.init(rng, jnp.zeros((1, h // 2, w // 2, 3))),
        "disparity": disp.init(rng, jnp.zeros((1, h // 2, w // 2, 3)),
                               jnp.zeros((1, h // 32, w // 32, 512))),
        "refine": ref.init(rng, jnp.zeros((1, h, w, 3)),
                           jnp.zeros((1, h // 4, w // 4, 1))),
    }
    if args.checkpoint:
        from kbe_tpu.train.checkpoint import load_checkpoint

        params, _ = load_checkpoint(args.checkpoint, params)

    ev = DepthEval(params)

    if args.dataset:
        from cli.train import parse_dataset
        from kbe_tpu.train.data import KBEDataset

        ds = KBEDataset([parse_dataset(d) for d in args.dataset],
                        mode="eval")
        _, val_idx = ds.split()
        batches = list(ds.batches(val_idx, 1, shuffle=False, epochs=1))
    else:
        print("No dataset — using synthetic RGBD scenes.")
        batches = list(synthetic_batches(1, h, w, camera=camera,
                                         steps=args.batches))

    metrics = ev.eval(iter(batches))
    print("Depth metrics:", {k: round(v, 4) for k, v in metrics.items()})

    views = ev.get_depths(batches[0])
    import imageio.v2 as iio

    def norm(x):
        x = np.asarray(x[0, ..., 0] if x.ndim == 4 else x[0])
        lo, hi = x.min(), x.max()
        g = (x - lo) / (hi - lo + 1e-7)
        return np.stack([g] * 3, -1)

    import cv2

    est = cv2.resize(norm(views["estimation"]), (w, h))
    panel = np.concatenate([
        np.asarray(views["image"][0]), est, norm(views["refined"]),
        cv2.resize(norm(views["gt"]), (w, h))], axis=1)
    iio.imwrite(args.out, (np.clip(panel, 0, 1) * 255).astype(np.uint8))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
