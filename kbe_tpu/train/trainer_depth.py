"""Depth (disparity + refinement) trainer.

TPU-native re-design of reference training/train_depth.py: the per-batch
work — semantics forward (frozen), disparity/refine forward, scheduled
losses, global-norm clip, Adam with per-step exponential LR decay — is one
jitted ``train_step`` (optionally data-parallel over a mesh); the host loop
only feeds numpy batches, logs scalars and checkpoints.

Reference semantics preserved:
  - modes 'disparity' / 'refine' / 'both' (train_depth.py:97-113; in
    'both' the estimation net stays frozen under the refine loss — the
    reference steps its optimizer with zero grads, train_depth.py:219-244)
  - loss schedule gamma_ord/grad/mask(iter) (:145-149)
  - grad-clip 1.0 (:171), Adam + lr0 * gamma^iter (:57-60 stepped per
    iteration at :173)
  - optional instance-mask flatness loss; the reference computes masks with
    a Mask-RCNN inside the loop (:151-163) — here the data pipeline (or any
    segmenter callback) supplies ``instance_masks``, keeping the hot loop
    jit-pure. 'other' mode runs the separate ImageNet mask step with
    grad-clip 0.1 (:261-288)
  - checkpoint + validation every 500 iters (:121-126), 7 depth metrics
    (:291-333)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kbe_tpu.models import Disparity, Refine, Semantics
from kbe_tpu.ops.resize import resize_to_max
from kbe_tpu.train.losses import (
    compute_loss_grad,
    compute_loss_ord,
    compute_masked_grad_loss,
    depth_loss_schedule,
)
from kbe_tpu.train.metrics import compute_depth_metrics
from kbe_tpu.utils.logging import MetricsWriter


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def exp_decay_schedule(lr0: float, gamma: float) -> optax.Schedule:
    """lr0 * gamma^step — LambdaLR(gamma**epoch) stepped per iteration."""
    return lambda step: lr0 * jnp.power(gamma, step)


def make_optimizer(lr0: float, gamma: float,
                   clip: float = 1.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adam(exp_decay_schedule(lr0, gamma)),
    )


@dataclasses.dataclass
class TrainerDepth:
    """Depth trainer.

    ``hparams`` keys (matching the reference CLI, train.py:114-122):
    lr_estimation, lr_refine, gamma_lr, n_epochs, model_to_train
    ('disparity'|'refine'|'both'), mask_loss ('none'|'same'|'other'),
    save_name.
    """

    hparams: Dict[str, Any]
    semantics_params: Any
    rng: jax.Array = dataclasses.field(
        default_factory=lambda: jax.random.PRNGKey(111))
    dtype: Any = jnp.float32
    logs_path: str = "runs/train_depth"
    checkpoint_dir: str = "checkpoints"
    mesh: Any = None

    def __post_init__(self):
        self.semantics = Semantics(dtype=self.dtype)
        # 'disparity_rows' (default: the reference architecture) lets
        # sharding/integration tests train a narrow lattice — identical
        # step/collective semantics at a fraction of the compile cost
        rows = self.hparams.get("disparity_rows")
        self.disparity = (Disparity(dtype=self.dtype, rows=tuple(rows))
                          if rows else Disparity(dtype=self.dtype))
        self.refine = Refine(dtype=self.dtype)
        self.writer = MetricsWriter(self.logs_path)
        self.iter_nb = 0
        self.mode = self.hparams.get("model_to_train", "disparity")

        self.tx_disparity = make_optimizer(
            self.hparams.get("lr_estimation", 1e-4),
            self.hparams.get("gamma_lr", 0.99995))
        self.tx_refine = make_optimizer(
            self.hparams.get("lr_refine", 1e-6),
            self.hparams.get("gamma_lr", 0.99995))
        self.tx_imagenet = make_optimizer(
            self.hparams.get("lr_estimation", 1e-4),
            self.hparams.get("gamma_lr", 0.99995), clip=0.1)
        self._jitted = {}

    # ------------------------------------------------------------ states

    def init_state(self, image_shape, mode: Optional[str] = None,
                   disparity_params: Any = None, refine_params: Any = None):
        """Create TrainState(s). ``image_shape``: (H, W) of training images
        (disparity mode trains at half dataset res, data_loader.py:138-139).
        ``disparity_params``/``refine_params`` warm-start from pretrained
        weights (the reference's --model-path, train.py:110-176); freshly
        initialized nets get the reference's conv init selector applied
        (hparams['init'], default xavier gain 1.4, utils/utils.py:101-114).
        """
        from kbe_tpu.models.init import apply_weights_init

        mode = mode or self.mode
        init_type = self.hparams.get("init", "xavier")
        h, w = image_shape
        img = jnp.zeros((1, h, w, 3))
        # semantics output size: ceil-mode halving at each of 4 pools
        sh, sw = h, w
        for _ in range(4):
            sh, sw = (sh + 1) // 2, (sw + 1) // 2
        sem = jnp.zeros((1, sh, sw, 512))
        k1, k2, k3, k4 = jax.random.split(self.rng, 4)
        dparams = disparity_params
        if dparams is None:
            dparams = apply_weights_init(self.disparity.init(k1, img, sem),
                                         k3, init_type)
        dstate = TrainState(dparams, self.tx_disparity.init(dparams),
                            jnp.zeros((), jnp.int32))
        if mode == "disparity":
            return dstate
        disp = jnp.zeros((1, (h // 2 + 1) // 2, (w // 2 + 1) // 2, 1))
        rparams = refine_params
        if rparams is None:
            rparams = apply_weights_init(self.refine.init(k2, img, disp),
                                         k4, init_type)
        rstate = TrainState(rparams, self.tx_refine.init(rparams),
                            jnp.zeros((), jnp.int32))
        return dstate, rstate

    # ------------------------------------------------------------- steps

    def _disparity_forward(self, params, image):
        sem = jax.lax.stop_gradient(
            self.semantics.apply(self.semantics_params, image))
        disp = self.disparity.apply(params, image, sem)
        return jnp.maximum(disp, 0.0)

    def disparity_train_step(self, state: TrainState, batch):
        """One estimation step. ``batch``: image (B,H,W,3) in [-1,1]-style
        dataset space, disparity_gt, mask (sparse validity), optional
        instance_masks (B,M,h,w,1) for the 'same' mask loss."""

        def loss_fn(params):
            disp = self._disparity_forward(params, batch["image"])
            l_ord = compute_loss_ord(disp, batch["disparity"], batch["mask"],
                                     mode="logrmse")
            l_grad = compute_loss_grad(disp, batch["disparity"],
                                       batch["mask"])
            g_ord, g_grad, g_mask = depth_loss_schedule(state.step)
            loss = g_ord * l_ord + g_grad * l_grad
            l_mask = jnp.zeros(())
            if "instance_masks" in batch:
                # (B, M, h, w, 1) zero-padded instance masks; per-sample
                # sum over instances (train_depth.py:157-161).
                per = jax.vmap(
                    lambda d, masks: compute_masked_grad_loss(
                        d[None], masks, (1,), 0.5))(
                            disp, batch["instance_masks"])
                l_mask = jnp.sum(per)
                loss = loss + g_mask * l_mask
            return loss, {"ord": l_ord, "grad": l_grad, "mask": l_mask,
                          "total": loss}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx_disparity.update(grads, state.opt_state,
                                                      state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    def imagenet_mask_step(self, state: TrainState, batch):
        """Separate mask-loss backward on an auxiliary natural-image batch
        ('other' mode; kappa=1, weight 1e-4, clip 0.1,
        train_depth.py:261-288)."""

        def loss_fn(params):
            disp = self._disparity_forward(params, batch["image"])
            per = jax.vmap(lambda d, m: compute_masked_grad_loss(
                d[None], m, (1,), 1.0))(disp, batch["instance_masks"])
            return 0.0001 * jnp.sum(per)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx_imagenet.update(grads, state.opt_state,
                                                     state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {"mask": loss}

    def refine_train_step(self, dstate: TrainState, rstate: TrainState,
                          batch):
        """One refinement step: frozen estimation at <=512 px, refine at
        full res; loss = 1e-4 * ord_L1 + grad (train_depth.py:219-231)."""

        def loss_fn(rparams):
            resized = resize_to_max(
                batch["image"], self.hparams.get("estimation_size", 512))
            disp_est = jax.lax.stop_gradient(
                self._disparity_forward(dstate.params, resized))
            disp = self.refine.apply(rparams, batch["image"], disp_est)
            l_ord = compute_loss_ord(disp, batch["disparity"], batch["mask"],
                                     mode="L1")
            l_grad = compute_loss_grad(disp, batch["disparity"],
                                       batch["mask"])
            loss = 0.0001 * l_ord + l_grad
            return loss, {"ord": l_ord, "grad": l_grad, "total": loss}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            rstate.params)
        updates, opt_state = self.tx_refine.update(grads, rstate.opt_state,
                                                   rstate.params)
        params = optax.apply_updates(rstate.params, updates)
        return TrainState(params, opt_state, rstate.step + 1), metrics

    # -------------------------------------------------------- validation

    def validation_step(self, dstate: TrainState, batch,
                        rstate: Optional[TrainState] = None):
        resized = resize_to_max(batch["image"],
                                self.hparams.get("estimation_size", 512))
        disp = self._disparity_forward(dstate.params, resized)
        if rstate is not None:
            disp = self.refine.apply(rstate.params, batch["image"], disp)
            disp = jnp.maximum(disp, 0.0)
            gt, mask = batch["disparity"], batch["mask"]
        else:
            gt = resize_to_max(batch["disparity"], 256)
            mask = resize_to_max(batch["mask"], 256)
        mask = jnp.clip(mask, 0.0, 1.0)
        return compute_depth_metrics(disp, gt, mask)

    def validation(self, dstate, val_iter, rstate=None) -> Dict[str, float]:
        fn = self._get_jitted("val", partial(self.validation_step))
        acc, n = None, 0
        for batch in val_iter:
            m = fn(dstate, _to_jnp(batch), rstate)
            m = {k: float(v) for k, v in m.items()}
            acc = m if acc is None else {k: acc[k] + m[k] for k in m}
            n += 1
        if acc is None:
            return {}
        metrics = {k: v / n for k, v in acc.items()}
        self.writer.scalars(metrics, self.iter_nb, prefix="Validation/")
        return metrics

    # -------------------------------------------------------- host loop

    def _get_jitted(self, name, fn):
        if name not in self._jitted:
            if self.mesh is not None and name in ("disp", "refine"):
                from kbe_tpu.parallel.dp import data_parallel_step

                self._jitted[name] = data_parallel_step(fn, self.mesh,
                                                        donate_state=False)
            else:
                self._jitted[name] = jax.jit(fn)
        return self._jitted[name]

    def train(self, train_iter: Iterable, val_iter_factory: Callable,
              image_shape, max_steps: Optional[int] = None,
              checkpoint_cb: Optional[Callable] = None,
              pretrained: Optional[Dict[str, Any]] = None,
              resume_state: Any = None, resume_step: int = 0):
        """Run the training loop. ``train_iter`` yields dict batches of
        numpy arrays; ``val_iter_factory()`` returns a fresh validation
        iterator.

        ``pretrained``: optional {'disparity': params, 'refine': params}
        warm start (reference --model-path). ``resume_state``/
        ``resume_step``: continue-training from a full checkpointed
        TrainState (optimizer + scheduler step included — reference
        load_models(continue_training=True), utils/utils.py:202-217).
        """
        pretrained = pretrained or {}
        self.iter_nb = resume_step
        if self.mode == "disparity":
            state = resume_state if resume_state is not None else \
                self.init_state(
                    image_shape,
                    disparity_params=pretrained.get("disparity"))
            step_fn = self._get_jitted("disp", self.disparity_train_step)
            other_fn = self._get_jitted("imagenet", self.imagenet_mask_step)
            for batch in train_iter:
                if max_steps is not None and self.iter_nb >= max_steps:
                    break
                if (self.iter_nb + 1) % 500 == 0:
                    if checkpoint_cb:
                        checkpoint_cb(state, self.iter_nb)
                    self.validation(state, val_iter_factory())
                aux = batch.pop("imagenet", None)
                state, metrics = step_fn(state, _to_jnp(batch))
                self.writer.scalars(
                    {k: float(v) for k, v in metrics.items()},
                    self.iter_nb, prefix="Estimation/")
                if (self.hparams.get("mask_loss") == "other"
                        and aux is not None):
                    state, m2 = other_fn(state, _to_jnp(aux))
                    self.writer.scalar("Estimation/mask_other",
                                       float(m2["mask"]), self.iter_nb)
                self.iter_nb += 1
            self.validation(state, val_iter_factory())
            return state

        if resume_state is not None:
            dstate, rstate = resume_state
        else:
            dstate, rstate = self.init_state(
                image_shape, self.mode,
                disparity_params=pretrained.get("disparity"),
                refine_params=pretrained.get("refine"))
        # NOTE: dstate must be an argument, not a closure — closed-over
        # device arrays are baked into the XLA program as constants.
        step_fn = self._get_jitted("refine", self.refine_train_step)
        step_fn = partial(step_fn, dstate)
        for batch in train_iter:
            if max_steps is not None and self.iter_nb >= max_steps:
                break
            if (self.iter_nb + 1) % 500 == 0:
                if checkpoint_cb:
                    checkpoint_cb(rstate, self.iter_nb)
                self.validation(dstate, val_iter_factory(), rstate)
            batch.pop("imagenet", None)
            rstate, metrics = step_fn(rstate, _to_jnp(batch))
            self.writer.scalars({k: float(v) for k, v in metrics.items()},
                                self.iter_nb, prefix="Refine/")
            self.iter_nb += 1
        self.validation(dstate, val_iter_factory(), rstate)
        return dstate, rstate


def _to_jnp(batch):
    return jax.tree_util.tree_map(jnp.asarray, batch)
