"""Training CLI.

Flag-compatible with the reference ``train.py`` (train.py:53-98): four
training modes (estimation / refinement / inpainting / inpainting_ref),
mask-loss modes, learning rates, batch size, gamma-lr, partial-conv, plus
--dataset/--synthetic for data sources (the reference hard-codes its
dataset dicts at train.py:21-33; pass ``--dataset name:path:focal:baseline``
here, repeatable).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def parse_dataset(spec: str):
    name, path, focal, baseline = spec.split(":")
    return {"name": name, "path": path,
            "params": {"focal": float(focal), "baseline": float(baseline)}}


def build_parser():
    p = argparse.ArgumentParser(description="kbe_tpu training")
    p.add_argument("--training-mode", required=True,
                   choices=["estimation", "refinement", "inpainting",
                            "inpainting_ref"])
    p.add_argument("--mask-loss", default="none",
                   choices=["none", "same", "other"])
    p.add_argument("--mask-loss-dataset", default=None)
    p.add_argument("--mask-source", default="depth",
                   choices=["depth", "image", "maskrcnn"],
                   help="instance-mask source for the mask loss: segment "
                        "the GT disparity ('depth'), the image colors "
                        "('image'), or run the TPU-native Mask-RCNN "
                        "('maskrcnn', needs --maskrcnn-weights) — the "
                        "reference's in-loop recipe "
                        "(training/train_depth.py:55,151-163).")
    p.add_argument("--maskrcnn-weights", default=None,
                   help="torchvision maskrcnn_resnet50_fpn state-dict "
                        "(.pth) converted on load by "
                        "utils/torch_convert.convert_maskrcnn; required "
                        "for --mask-source maskrcnn.")
    p.add_argument("--n-epochs", type=int, default=50)
    p.add_argument("--lr-estimation", type=float, default=1e-4)
    p.add_argument("--lr-refinement", type=float, default=1e-5)
    p.add_argument("--lr-inpaint", type=float, default=1e-4)
    p.add_argument("--lr-discriminator", type=float, default=5e-5)
    p.add_argument("--save-name", default="3dkbe")
    p.add_argument("--model-path", default=None,
                   help="pretrained weights to warm-start from: a "
                        "reference torch .tar or one of our orbax "
                        "checkpoint dirs. Used by refinement (estimation "
                        "net), inpainting_ref (inpainting net), and as "
                        "initial weights for estimation/inpainting.")
    p.add_argument("--continue-training", action="store_true",
                   help="resume the latest checkpoint under "
                        "--checkpoint-dir/--save-name, restoring "
                        "optimizer/scheduler state and step count")
    p.add_argument("--init", default="xavier",
                   choices=["xavier", "normal", "orthogonal", "he",
                            "none"],
                   help="conv weight init for from-scratch nets "
                        "(reference weights_init, utils/utils.py:101-114)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--gamma-lr", type=float, default=0.99999)
    p.add_argument("--partial-conv", action="store_true")
    p.add_argument("--dataset", action="append", default=[],
                   help="name:path:focal:baseline (repeatable)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on procedural RGBD data (no datasets "
                        "available)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--logs-path", default="runs/train_0")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all devices")
    return p


def resolve_mask_source(args, max_instances: int = 8,
                        infer_size: int = 512):
    """'depth'/'image' pass through to KBEDataset's built-in segmenters;
    'maskrcnn' loads converted torchvision weights and returns the
    jitted instance-mask callable (reference recipe:
    training/train_depth.py:55,151-163).

    ``max_instances`` must match the consuming KBEDataset's capacity.
    Inference always runs on a fixed ``infer_size``-square canvas
    (aspect-preserving resize + zero pad) so the jitted net compiles
    exactly once regardless of the dataset's crop sizes; masks are
    resized back to the input resolution.
    """
    if args.mask_source != "maskrcnn":
        return args.mask_source
    if not args.maskrcnn_weights:
        raise SystemExit("--mask-source maskrcnn requires "
                         "--maskrcnn-weights <torchvision .pth>")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kbe_tpu.models.maskrcnn import MaskRCNN, maskrcnn_instance_masks
    from kbe_tpu.utils.torch_convert import convert_maskrcnn

    params = convert_maskrcnn(args.maskrcnn_weights)
    module = MaskRCNN()
    fn = jax.jit(lambda im: maskrcnn_instance_masks(params, im, module))

    def source(image01, disparity=None):
        img = np.asarray(image01[0] if image01.ndim == 4 else image01)
        h, w = img.shape[0], img.shape[1]
        s = infer_size / max(h, w)
        rh, rw = max(1, round(h * s)), max(1, round(w * s))
        small = np.asarray(jax.image.resize(jnp.asarray(img), (rh, rw, 3),
                                            "bilinear"))
        canvas = np.zeros((infer_size, infer_size, 3), np.float32)
        canvas[:rh, :rw] = small
        masks = np.asarray(fn(canvas[None])[0])  # (K, S, S, 1)
        masks = masks[:max_instances, :rh, :rw]
        back = jax.image.resize(jnp.asarray(masks),
                                (masks.shape[0], h, w, 1), "nearest")
        out = np.asarray(back)
        if image01.ndim == 4:
            out = out[None]
        return out

    return source


def make_data(args, mode: str, camera):
    from kbe_tpu.train.data import KBEDataset, Prefetcher, synthetic_batches

    with_masks = args.mask_loss != "none" and mode == "disparity"
    if args.synthetic or not args.dataset:
        if not args.synthetic:
            print("No --dataset given; falling back to --synthetic data.")
        size = {"disparity": (384, 512), "refine": (768, 1024),
                "inpainting": (384, 512)}[mode]
        # pass the trainer mode through: the generator halves disparity
        # only for "disparity" (the estimation net outputs at 1/2 input
        # res); "refine" needs full-res GT (MODE_RATIOS {1,1},
        # reference utils/data_loader.py:138-143)
        train_iter = synthetic_batches(args.batch_size, *size, mode=mode,
                                       camera=camera,
                                       steps=args.max_steps,
                                       with_instance_masks=with_masks)
        val_factory = lambda: synthetic_batches(
            args.batch_size, *size, mode=mode,
            camera=camera, seed=1, steps=4)
        return train_iter, val_factory, size

    ds_mode = {"disparity": "disparity", "refine": "refine",
               "inpainting": "inpainting"}[mode]
    max_instances = 8  # KBEDataset capacity, threaded into the segmenter
    dataset = KBEDataset([parse_dataset(d) for d in args.dataset],
                         mode=ds_mode,
                         imagenet_path=args.mask_loss_dataset,
                         mask_source=(resolve_mask_source(
                             args, max_instances=max_instances)
                             if with_masks else None),
                         max_instances=max_instances)
    train_idx, val_idx = dataset.split()
    train_iter = Prefetcher(dataset.batches(train_idx, args.batch_size,
                                            epochs=args.n_epochs))
    val_factory = lambda: dataset.batches(val_idx, args.batch_size,
                                          shuffle=False, epochs=1)
    probe = dataset.load_item(0)
    size = probe["image"].shape[:2]
    return train_iter, val_factory, size


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.mask_loss == "other" and args.mask_loss_dataset is None \
            and args.dataset and not args.synthetic:
        print("--mask-loss other requires --mask-loss-dataset "
              "(the synthetic generator supplies its own aux batch)",
              file=sys.stderr)
        return 1
    if args.training_mode in ("refinement", "inpainting_ref") \
            and args.model_path is None and not args.continue_training:
        print(f"NOTE: --model-path not given for {args.training_mode}; "
              "starting from random init (the reference requires a "
              "pretrained estimation net here).")

    import jax
    import jax.numpy as jnp

    from kbe_tpu.config import CameraConfig
    from kbe_tpu.train.checkpoint import (latest_checkpoint,
                                          load_checkpoint,
                                          load_pretrained_params,
                                          save_checkpoint)

    mesh = None
    if args.data_parallel:
        from kbe_tpu.parallel import data_mesh

        mesh = data_mesh()

    ckpt_cb = lambda state, step: save_checkpoint(
        args.checkpoint_dir, args.save_name, state, step)

    if args.training_mode in ("estimation", "refinement"):
        from kbe_tpu.models import Semantics
        from kbe_tpu.train.trainer_depth import TrainerDepth

        camera = CameraConfig(512.0, 74.0)
        mode = ("disparity" if args.training_mode == "estimation"
                else "refine")
        train_iter, val_factory, size = make_data(args, mode, camera)
        sem = Semantics()
        sem_params = sem.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, *size, 3)))
        trainer = TrainerDepth(
            {"model_to_train": mode,
             "lr_estimation": args.lr_estimation,
             "lr_refine": args.lr_refinement,
             "gamma_lr": args.gamma_lr,
             "n_epochs": args.n_epochs,
             "mask_loss": args.mask_loss,
             "init": args.init,
             "save_name": args.save_name},
            semantics_params=sem_params, logs_path=args.logs_path,
            mesh=mesh)
        pretrained = {}
        if args.model_path:
            # refinement mode warm-starts the (frozen) estimation net
            # from --model-path (reference train.py:110-135)
            pretrained["disparity"] = load_pretrained_params(
                args.model_path, "disparity")
        resume_state, resume_step = None, 0
        if args.continue_training:
            ck = latest_checkpoint(args.checkpoint_dir, args.save_name)
            if ck is None:
                print("--continue-training: no checkpoint found under "
                      f"{args.checkpoint_dir}/{args.save_name}-*",
                      file=sys.stderr)
                return 1
            if mode == "disparity":
                tmpl = trainer.init_state(size)
                resume_state, resume_step = load_checkpoint(ck, tmpl)
            else:
                d_t, r_t = trainer.init_state(
                    size, mode,
                    disparity_params=pretrained.get("disparity"))
                r_res, resume_step = load_checkpoint(ck, r_t)
                resume_state = (d_t, r_res)
            resume_step = int(resume_step) + 1
            print(f"resuming from {ck} at iteration {resume_step}")
        trainer.train(train_iter, val_factory, size,
                      max_steps=args.max_steps, checkpoint_cb=ckpt_cb,
                      pretrained=pretrained, resume_state=resume_state,
                      resume_step=resume_step)
        return 0

    from kbe_tpu.train.trainer_inpaint import TRAIN_CAMERA, TrainerInpaint

    train_iter, val_factory, size = make_data(args, "inpainting",
                                              TRAIN_CAMERA)
    adversarial = args.training_mode == "inpainting_ref"
    trainer = TrainerInpaint(
        {"model_to_train": ("partial inpainting" if args.partial_conv
                            else "inpainting"),
         "lr_inpaint": args.lr_inpaint,
         "lr_D": args.lr_discriminator,
         "gamma_lr": args.gamma_lr,
         "n_epochs": args.n_epochs,
         "adversarial": adversarial,
         "init": args.init,
         "save_name": args.save_name},
        logs_path=args.logs_path, mesh=mesh)
    pretrained_params = None
    if args.model_path:
        # inpainting_ref warm-starts from a trained inpainting net
        # (reference train.py:146-176)
        pretrained_params = load_pretrained_params(args.model_path,
                                                   "inpaint")
    resume_state, resume_step = None, 0
    if args.continue_training:
        ck = latest_checkpoint(args.checkpoint_dir, args.save_name)
        if ck is None:
            print("--continue-training: no checkpoint found under "
                  f"{args.checkpoint_dir}/{args.save_name}-*",
                  file=sys.stderr)
            return 1
        tmpl = trainer.init_state(size, pretrained_params)
        if adversarial:
            tmpl = (tmpl, trainer.init_disc_state(size))
        resume_state, resume_step = load_checkpoint(ck, tmpl)
        resume_step = int(resume_step) + 1
        print(f"resuming from {ck} at iteration {resume_step}")
    trainer.train(train_iter, val_factory, size, max_steps=args.max_steps,
                  checkpoint_cb=ckpt_cb, pretrained_params=pretrained_params,
                  resume_state=resume_state, resume_step=resume_step)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
