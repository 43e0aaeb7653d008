"""Inpainting trainer: supervised and adversarial (semi-supervised).

TPU-native re-design of reference training/train_inpaint.py. Each variant
is one jitted step:

  supervised (:114-169): random-zoom visibility masks (the CUDA
    generate_mask call inside the loop becomes our in-graph op), full
    partial-conv loss recipe + ord + grad, weighted sum (LOSS_WEIGHTS),
    clip 1.0, Adam with lr0*gamma^iter.

  adversarial (:171-287): warp view A -> B with normalized payload +
    context channels, inpaint B, MPD discriminator with spectral norm;
    G updates only when (iter % stopG) > 1000 pretrain steps and every 5th
    iter (balanceSteps 5, restart every stopG=10000, :94-97,232); G loss =
    10 * pixel losses + adversarial; D trains every iter on 0.5 *
    (fake_detached + real), clip 1.0. The G LR schedule steps 5x per G step
    (:252-253) — expressed here as a G-step-count-based schedule.

The D/G interleaving condition is deterministic host-side counter logic —
two compiled step variants (with/without the G update) are selected per
iteration, keeping each XLA program branch-free.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kbe_tpu.config import CameraConfig
from kbe_tpu.models import Inpaint, MPDDiscriminator, PartialInpaint
from kbe_tpu.models.discriminator import adversarial_loss
from kbe_tpu.models.gridnet import ContextNet
from kbe_tpu.models.layers import denormalize_sample, normalize_sample
from kbe_tpu.models.vgg import VGG16Features
from kbe_tpu.ops.geometry import disparity_to_depth
from kbe_tpu.train.losses import (
    LOSS_WEIGHTS,
    compute_loss_grad,
    compute_loss_ord,
    inpainting_loss,
    inpainting_loss_adv,
)
from kbe_tpu.train.metrics import compute_inpaint_metrics
from kbe_tpu.train.trainer_depth import TrainState, make_optimizer
from kbe_tpu.train.view_synthesis import masks_a_from_b, render_view_b
from kbe_tpu.utils.logging import MetricsWriter

# training/train_inpaint.py:115 — training camera
TRAIN_CAMERA = CameraConfig(focal=512.0, baseline=74.0)


class InpaintState(NamedTuple):
    context: Any
    net: Any
    opt_state: Any
    step: jax.Array


class DiscState(NamedTuple):
    variables: Any  # {'params', 'batch_stats'}
    opt_state: Any
    step: jax.Array


@dataclasses.dataclass
class TrainerInpaint:
    """``hparams`` keys: lr_inpaint, lr_D, gamma_lr, n_epochs, adversarial,
    model_to_train ('inpainting'|'partial inpainting'), save_name."""

    hparams: Dict[str, Any]
    vgg_params: Any = None  # VGG16Features params for perceptual/style loss
    camera: CameraConfig = TRAIN_CAMERA
    rng: jax.Array = dataclasses.field(
        default_factory=lambda: jax.random.PRNGKey(0))
    dtype: Any = jnp.float32
    logs_path: str = "runs/train_inpaint"
    mesh: Any = None

    # GAN balancing (train_inpaint.py:94-97)
    balance_steps: int = 5
    pretrain_steps: int = 1000
    stop_g: int = 10000

    def __post_init__(self):
        self.partial = self.hparams.get(
            "model_to_train", "inpainting") == "partial inpainting"
        self.context_def = ContextNet(dtype=self.dtype)
        # 'inpaint_rows' (default: the reference architecture) lets
        # sharding/integration tests train a narrow grid-net — identical
        # step/collective semantics at a fraction of the 1-core cost
        rows = self.hparams.get("inpaint_rows")
        net_cls = PartialInpaint if self.partial else Inpaint
        self.net_def = (net_cls(dtype=self.dtype, rows=tuple(rows))
                        if rows else net_cls(dtype=self.dtype))
        self.vgg_def = VGG16Features(dtype=self.dtype)
        self.disc_def = MPDDiscriminator(spectral_norm=True,
                                         dtype=self.dtype)
        self.tx = make_optimizer(self.hparams.get("lr_inpaint", 1e-4),
                                 self.hparams.get("gamma_lr", 0.99997))
        self.tx_d = make_optimizer(self.hparams.get("lr_D", 1e-4),
                                   self.hparams.get("gamma_lr", 0.99997))
        self.writer = MetricsWriter(self.logs_path)
        self.iter_nb = 0
        self._jitted = {}

    # ------------------------------------------------------------ states

    def init_state(self, image_shape,
                   pretrained_params: Any = None) -> InpaintState:
        """``pretrained_params``: optional {'context', 'net'} warm start
        (reference --model-path into inpainting_ref, train.py:146-176).
        Fresh nets get the reference conv init selector (hparams['init'],
        default xavier gain 1.4, utils/utils.py:101-114)."""
        from kbe_tpu.models.init import apply_weights_init

        h, w = image_shape
        if pretrained_params is not None:
            ctx = pretrained_params["context"]
            net = pretrained_params["net"]
        else:
            k1, k2, k3 = jax.random.split(self.rng, 3)
            init_type = self.hparams.get("init", "xavier")
            ctx = apply_weights_init(
                self.context_def.init(k1, jnp.zeros((1, h, w, 3)),
                                      jnp.zeros((1, h, w, 1))),
                k3, init_type)
            net = apply_weights_init(
                self.net_def.init(k2, jnp.zeros((1, h, w, 68)),
                                  jnp.zeros((1, h, w, 1))),
                jax.random.fold_in(k3, 1), init_type)
        params = {"context": ctx, "net": net}
        return InpaintState(ctx, net, self.tx.init(params),
                            jnp.zeros((), jnp.int32))

    def init_disc_state(self, image_shape) -> DiscState:
        h, w = image_shape
        variables = self.disc_def.init(
            {"params": jax.random.PRNGKey(7)}, jnp.zeros((1, h, w, 3)),
            jnp.zeros((1, h, w, 1)), train=True)
        _, trainable = self._split_disc_params(variables["params"])
        return DiscState(variables, self.tx_d.init(trainable),
                         jnp.zeros((), jnp.int32))

    @staticmethod
    def _split_disc_params(params):
        """(frozen_vgg, trainable_rest) split of MPD params.

        The reference freezes the perceptual VGG16 extractor inside the
        discriminator (models/discriminator.py:218-220 ``.eval()`` +
        ``requires_grad = False``): D updates never touch it, and the D
        backward never computes its kernel grads (the heads sit on TOP of
        the features, so without VGG param grads the whole VGG backward is
        dead code). G still backprops THROUGH the frozen convs to its own
        output, as in torch."""
        core = dict(params["core"])
        vgg = core.pop("vgg", None)
        return vgg, {**params, "core": core}

    @staticmethod
    def _merge_disc_params(vgg, trainable):
        if vgg is None:
            return trainable
        return {**trainable, "core": {**trainable["core"], "vgg": vgg}}

    # ----------------------------------------------------------- shared

    def _vgg_features(self):
        if self.vgg_params is None:
            return None
        return partial(self.vgg_def.apply, self.vgg_params)

    def _forward(self, ctx_params, net_params, image01, disparity, masks):
        """Standard-net forward with in-forward normalization on masked
        inputs (the `tensorImage is not None, tensorContext is None`
        branch, models/pointcloud_inpainting.py:124-131). Returns
        denormalized (image, disparity) — unclamped image (training mode),
        thresholded disparity."""
        img_m = image01 * masks
        disp_m = disparity * masks
        img_n, img_stats = normalize_sample(img_m)
        disp_n, disp_stats = normalize_sample(disp_m)
        context = self.context_def.apply(ctx_params, img_n, disp_n)
        data = jnp.concatenate([img_n, disp_n, context], axis=-1)
        if self.partial:
            out_i, out_d, _ = self.net_def.apply(net_params, data, masks)
        else:
            out_i, out_d = self.net_def.apply(net_params, data, masks)
        image = denormalize_sample(out_i, img_stats)
        disp = jnp.maximum(denormalize_sample(out_d, disp_stats), 0.0)
        return image, disp

    # -------------------------------------------------- supervised step

    def supervised_step(self, state: InpaintState, batch):
        """``batch``: image (B,H,W,3) in [-1,1], disparity, depth, zoom
        window arrays (see view_synthesis.batch_full_shift)."""
        masks, _ = masks_a_from_b(batch["image"], batch["disparity"],
                                  batch["depth"], batch["zoom"], self.camera)
        masks = jax.lax.stop_gradient(masks)
        image01 = (batch["image"] + 1.0) / 2.0
        vgg = self._vgg_features()

        def loss_fn(params):
            out_img, out_disp = self._forward(params["context"],
                                              params["net"], image01,
                                              batch["disparity"], masks)
            loss_dict = inpainting_loss(vgg, image01 * masks, masks, out_img,
                                        image01)
            loss_dict["ord"] = compute_loss_ord(out_disp, batch["disparity"],
                                                masks)
            loss_dict["grad"] = compute_loss_grad(out_disp,
                                                  batch["disparity"], masks)
            total = sum(LOSS_WEIGHTS[k] * v for k, v in loss_dict.items())
            loss_dict["total"] = total
            return total, loss_dict

        params = {"context": state.context, "net": state.net}
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = self.tx.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        return InpaintState(params["context"], params["net"], opt_state,
                            state.step + 1), metrics

    # ------------------------------------------------- adversarial step

    def _adv_forward(self, params, batch):
        """Shared A->B warp + inpaint forward. Returns everything both the
        G and D losses need, in denormalized space."""
        image01 = (batch["image"] + 1.0) / 2.0
        img_n, img_stats = normalize_sample(image01)
        disp_n, disp_stats = normalize_sample(batch["disparity"])
        ctx = self.context_def.apply(params["context"], img_n, disp_n)
        render, mask_b, _, _ = render_view_b(
            img_n, disp_n, batch["depth"], batch["zoom"], self.camera,
            context=ctx)
        img_b_n = render[..., 0:3]
        disp_b_n = render[..., 3:4]
        ctx_b = render[..., 4:]
        data = jnp.concatenate([img_b_n, disp_b_n, ctx_b], axis=-1)
        if self.partial:
            out_i, out_d, _ = self.net_def.apply(params["net"], data, mask_b)
        else:
            out_i, out_d = self.net_def.apply(params["net"], data, mask_b)
        inpaint_img = denormalize_sample(out_i, img_stats)
        inpaint_disp = jnp.maximum(denormalize_sample(out_d, disp_stats),
                                   0.0)
        image_b = denormalize_sample(img_b_n, img_stats)
        disp_b = denormalize_sample(disp_b_n, disp_stats)
        return {
            "inpaint_img": inpaint_img,
            "inpaint_disp": inpaint_disp,
            "image_b": image_b,
            "disp_b": disp_b,
            "mask_b": mask_b,
            "image_a": image01,
            "disp_a": batch["disparity"],
        }

    def adversarial_step(self, g_state: InpaintState, d_state: DiscState,
                         batch, do_g_update: bool):
        """One GAN iteration. ``do_g_update`` is static (host decides by
        counter, train_inpaint.py:232)."""
        metrics = {}
        g_params = {"context": g_state.context, "net": g_state.net}

        if do_g_update:
            def g_loss_fn(params):
                out = self._adv_forward(params, batch)
                preds = self.disc_def.apply(
                    d_state.variables, out["inpaint_img"],
                    out["inpaint_disp"], train=False)
                loss_adv = adversarial_loss(preds, is_real=True)
                loss_dict = inpainting_loss_adv(
                    out["image_b"], out["mask_b"], out["inpaint_img"],
                    out["inpaint_disp"], out["disp_b"])
                loss_valid = sum(LOSS_WEIGHTS[k] * v
                                 for k, v in loss_dict.items())
                total = 10.0 * loss_valid + loss_adv
                loss_dict = dict(loss_dict)
                loss_dict.update(total_g=total, adv_g=loss_adv)
                return total, (loss_dict, out)

            (_, (g_metrics, out)), grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_params)
            # 5 scheduler steps per G step (train_inpaint.py:252-253) is
            # what the per-iteration opt_state step count already gives,
            # since D steps every iteration.
            updates, opt_state = self.tx.update(grads, g_state.opt_state,
                                                g_params)
            g_params = optax.apply_updates(g_params, updates)
            g_state = InpaintState(g_params["context"], g_params["net"],
                                   opt_state, g_state.step + 1)
            metrics.update(g_metrics)
        else:
            out = self._adv_forward(g_params, batch)

        fake_img = jax.lax.stop_gradient(out["inpaint_img"])
        fake_disp = jax.lax.stop_gradient(out["inpaint_disp"])

        vgg_frozen, d_trainable = self._split_disc_params(
            d_state.variables["params"])

        def d_loss_fn(d_params):
            variables = {**d_state.variables,
                         "params": self._merge_disc_params(vgg_frozen,
                                                           d_params)}
            fake_preds, upd1 = self.disc_def.apply(
                variables, fake_img, fake_disp, train=True,
                mutable=["batch_stats"])
            variables = {**variables, **upd1}
            real_preds, upd2 = self.disc_def.apply(
                variables, out["image_a"], out["disp_a"], train=True,
                mutable=["batch_stats"])
            loss = 0.5 * (adversarial_loss(fake_preds, False)
                          + adversarial_loss(real_preds, True))
            return loss, {**upd1, **upd2}

        (d_loss, new_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_trainable)
        d_updates, d_opt = self.tx_d.update(d_grads, d_state.opt_state,
                                            d_trainable)
        d_params = self._merge_disc_params(
            vgg_frozen, optax.apply_updates(d_trainable, d_updates))
        d_state = DiscState({**d_state.variables, **new_stats,
                             "params": d_params}, d_opt, d_state.step + 1)
        metrics["loss_d"] = d_loss
        return g_state, d_state, metrics

    # -------------------------------------------------------- validation

    def validation_step(self, state: InpaintState, batch):
        masks, _ = masks_a_from_b(batch["image"], batch["disparity"],
                                  batch["depth"], batch["zoom"], self.camera)
        image01 = (batch["image"] + 1.0) / 2.0
        out_img, out_disp = self._forward(state.context, state.net, image01,
                                          batch["disparity"], masks)
        return compute_inpaint_metrics(out_img, out_disp, image01,
                                       batch["disparity"])

    def validation(self, state, val_iter) -> Dict[str, float]:
        fn = self._jit("val", self.validation_step)
        acc, n = None, 0
        for batch in val_iter:
            m = {k: float(v) for k, v in fn(state, _to_jnp(batch)).items()}
            acc = m if acc is None else {k: acc[k] + m[k] for k in m}
            n += 1
        if not acc:
            return {}
        metrics = {k: v / n for k, v in acc.items()}
        self.writer.scalars(metrics, self.iter_nb,
                            prefix="Validation inpaint/")
        return metrics

    # -------------------------------------------------------- host loop

    def _jit(self, name, fn, **kw):
        if name not in self._jitted:
            if self.mesh is not None and name in ("sup", "adv"):
                from kbe_tpu.parallel.mesh import batch_sharding, \
                    replicated_sharding

                rep = replicated_sharding(self.mesh)
                bat = batch_sharding(self.mesh)
                if name == "sup":
                    self._jitted[name] = jax.jit(
                        fn, in_shardings=(rep, bat),
                        out_shardings=(rep, rep), **kw)
                else:
                    # (g_state, d_state, batch, static do_g): states
                    # replicated, batch sharded -> XLA inserts the psum
                    # gradient all-reduces for both G and D (the DP GAN
                    # config of SURVEY §2.9)
                    self._jitted[name] = jax.jit(
                        fn, in_shardings=(rep, rep, bat),
                        out_shardings=(rep, rep, rep), **kw)
            else:
                self._jitted[name] = jax.jit(fn, **kw)
        return self._jitted[name]

    # -------------------------------------------------- FID validation

    def validation_adv(self, state: InpaintState, val_iter) -> float:
        """FID between adversarially-inpainted view-B images and the real
        view-A images over the validation set, at the reference's
        500-iteration cadence (training/train_inpaint.py:332-418)."""
        import numpy as np

        from kbe_tpu.train.fid import FID

        if not hasattr(self, "_fid"):
            self._fid = FID(params=self.hparams.get("inception_params"))
        fwd = self._jit(
            "advfwd",
            lambda st, b: self._adv_forward(
                {"context": st.context, "net": st.net}, b))
        reals, fakes = [], []
        for batch in val_iter:
            out = fwd(state, _to_jnp(batch))
            reals.append(np.asarray(out["image_a"], np.float32))
            fakes.append(np.asarray(
                jnp.clip(out["inpaint_img"], 0.0, 1.0), np.float32))
        if not reals:
            return float("nan")
        score = self._fid.fid(np.concatenate(reals), np.concatenate(fakes))
        self.writer.scalar("Validation inpaint/FID", float(score),
                           self.iter_nb)
        return float(score)

    def _want_g_update(self) -> bool:
        return ((self.iter_nb % self.stop_g) > self.pretrain_steps
                and self.iter_nb % self.balance_steps == 0)

    def train(self, train_iter: Iterable, val_iter_factory: Callable,
              image_shape, max_steps: Optional[int] = None,
              checkpoint_cb: Optional[Callable] = None,
              pretrained_params: Any = None, resume_state: Any = None,
              resume_step: int = 0):
        """``pretrained_params``: {'context','net'} warm start.
        ``resume_state``/``resume_step``: continue-training from a full
        checkpoint (InpaintState or (InpaintState, DiscState))."""
        self.iter_nb = resume_step
        if self.hparams.get("adversarial"):
            if resume_state is not None:
                state, d_state = resume_state
            else:
                state = self.init_state(image_shape, pretrained_params)
                d_state = self.init_disc_state(image_shape)
            step = self._jit("adv", partial(self.adversarial_step),
                             static_argnums=(3,))
            for batch in train_iter:
                if max_steps is not None and self.iter_nb >= max_steps:
                    break
                if (self.iter_nb + 1) % 500 == 0:
                    if checkpoint_cb:
                        checkpoint_cb((state, d_state), self.iter_nb)
                    # FID validation at the reference cadence
                    # (train_inpaint.py:332-418)
                    self.validation_adv(state, val_iter_factory())
                state, d_state, metrics = step(state, d_state,
                                               _to_jnp(batch),
                                               self._want_g_update())
                self.writer.scalars(
                    {k: float(v) for k, v in metrics.items()},
                    self.iter_nb, prefix="Inpaint/")
                self.iter_nb += 1
            return state, d_state

        state = resume_state if resume_state is not None else \
            self.init_state(image_shape, pretrained_params)
        step = self._jit("sup", self.supervised_step)
        for batch in train_iter:
            if max_steps is not None and self.iter_nb >= max_steps:
                break
            if (self.iter_nb + 1) % 500 == 0:
                if checkpoint_cb:
                    checkpoint_cb(state, self.iter_nb)
                self.validation(state, val_iter_factory())
            state, metrics = step(state, _to_jnp(batch))
            self.writer.scalars({k: float(v) for k, v in metrics.items()},
                                self.iter_nb, prefix="Inpaint/")
            self.iter_nb += 1
        return state


def _to_jnp(batch):
    return jax.tree_util.tree_map(jnp.asarray, batch)
