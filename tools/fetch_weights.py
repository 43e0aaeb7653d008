"""Fetch the reference's released torch checkpoints and convert to orbax.

Equivalent of the reference's download.sh (download.sh:11-33): pulls the
six published .tar weights from their Google Drive file ids, then converts
each through kbe_tpu/utils/torch_convert.py into orbax checkpoints our
CLI loads directly (cli/kbe.py --checkpoint, cli/train.py --model-path).

Requires network access (this development environment has none — the
converter itself is exercised offline by tests/test_parity_full.py against
reference nets with seeded weights).

Usage:
    python tools/fetch_weights.py [--out models/trained] [--skip-download]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

# file ids from the reference download.sh:11-33
WEIGHTS = {
    "disparity-refinement.tar": "1pnkRqUKS2T4QZ161RCToykeK0Z3BL271",
    "inpainting-color.tar": "1OV46pzDl29fft13ZNJEvkAC6AjU3fvyc",
    "inpainting-depth.tar": "1s8lPOMVK4eTb5gA5_huBmbUMAeOBG-CA",
    "inpainting-pretrained.tar": "1185R-YeKRyBulMQmW-91sfx5-y8ShloW",
    "disparity-estimation-no-mask.tar":
        "1qlzhkfC58zsnEPZdQDukHEBIEKJB-6Mc",
    "disparity-estimation-mask.tar":
        "13Y6-hdM8MEDBRmv0owwjtYScBiu5aOw3",
}

# torchvision Mask-RCNN (the reference loads it via the torchvision hub,
# training/train_depth.py:55); fetched directly so the --mask-source
# maskrcnn recipe works without torchvision installed.
MASKRCNN_URL = ("https://download.pytorch.org/models/"
                "maskrcnn_resnet50_fpn_coco-bf2d0c1e.pth")

CONVERTERS = {
    "disparity-refinement.tar": "refine",
    "inpainting-color.tar": "inpaint",
    "inpainting-depth.tar": "inpaint",
    "inpainting-pretrained.tar": "inpaint",
    "disparity-estimation-no-mask.tar": "disparity",
    "disparity-estimation-mask.tar": "disparity",
}


def download(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, fid in WEIGHTS.items():
        dst = os.path.join(out_dir, name)
        if os.path.exists(dst) and os.path.getsize(dst) > 1 << 20:
            print(f"{name}: already present")
            continue
        url = ("https://docs.google.com/uc?export=download&confirm=t"
               f"&id={fid}")
        print(f"downloading {name} ...")
        subprocess.run(["wget", "--no-check-certificate", "-q", url,
                        "-O", dst], check=True)
    dst = os.path.join(out_dir, "maskrcnn_resnet50_fpn_coco.pth")
    if not (os.path.exists(dst) and os.path.getsize(dst) > 1 << 20):
        print("downloading maskrcnn_resnet50_fpn_coco.pth ...")
        subprocess.run(["wget", "-q", MASKRCNN_URL, "-O", dst],
                       check=True)


def convert(out_dir: str) -> None:
    import jax

    from kbe_tpu.train.checkpoint import save_checkpoint
    from kbe_tpu.utils import torch_convert as tc

    for name, kind in CONVERTERS.items():
        src = os.path.join(out_dir, name)
        if not os.path.exists(src):
            print(f"{name}: missing, skipping conversion")
            continue
        stem = name[:-4]
        if kind == "disparity":
            params = tc.convert_disparity(src)
        elif kind == "refine":
            params = tc.convert_refine(src)
        else:
            ctx, net = tc.convert_inpaint(src)
            params = {"context": ctx, "net": net}
        path = save_checkpoint(out_dir, stem + "-flax", params, 0)
        print(f"{name} -> {path}")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="models/trained")
    p.add_argument("--skip-download", action="store_true",
                   help="only convert .tar files already in --out")
    args = p.parse_args()
    if not args.skip_download:
        download(args.out)
    convert(args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
