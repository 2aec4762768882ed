"""Cascaded continuous-time Gaussian diffusion (the ``Imagen`` equivalent).

TPU-native re-design of the reference wrapper
(``/root/reference/imagen_pytorch3D.py:1741-2443``):

  * per-unet continuous-time noise schedulers, pred objectives, dynamic
    thresholding flags (ctor, :1816-1904)
  * ``p_losses`` with noise/x_start/v objectives, p2 weighting, min_bound
    clamping (:2276-2387)
  * ancestral ``p_sample_loop`` — here ONE ``lax.scan`` over the step axis
    (vs. the reference's Python loop, :2058-2160), with optional trajectory
    capture kept out of the carry so memory stays bounded
  * cascade ``sample()`` with ``start_at_unet_number`` /
    ``stop_at_unet_number`` (:2162-2274)
  * dynamic thresholding with the z-score ``min_bound`` clamp semantics
    (:2006-2026)

Design: this class is a stateless *orchestrator* — Flax modules + frozen
scheduler dataclasses. All compute methods are pure functions of explicit
``params`` and PRNG keys, so they jit/pjit/vmap cleanly. The reference's
GPU-swap machinery (``one_unet_in_gpu``, :1948-1962) is intentionally absent:
all stages stay resident (SURVEY.md §2.2, model staging row).
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from diffusioniqt_tpu.core.schedules import (
    GaussianDiffusionContinuousTimes,
    right_pad_dims_to,
)
from diffusioniqt_tpu.utils.misc import cast_tuple, default, exists, pad_tuple_to_length


def normalize_neg_one_to_one(img):
    return img * 2 - 1


def unnormalize_zero_to_one(img):
    return (img + 1) * 0.5


def identity(t):
    return t


_LOSSES = {
    "l1": lambda pred, target: jnp.abs(pred - target),
    "l2": lambda pred, target: (pred - target) ** 2,
    "huber": lambda pred, target: jnp.where(
        jnp.abs(pred - target) < 1.0,
        0.5 * (pred - target) ** 2,
        jnp.abs(pred - target) - 0.5,
    ),
}


class Imagen:
    """Cascaded DDPM over one or more U-Nets.

    ``unets`` are (uninitialised) Flax modules; parameters are threaded
    explicitly through every method as a list aligned with ``unets``.
    """

    def __init__(
        self,
        unets,
        *,
        image_sizes: Sequence[int],
        min_bound: float = 0.0,
        channels: int = 3,
        timesteps: Union[int, Sequence[int]] = 1000,
        cond_drop_prob: float = 0.1,
        loss_type: str = "l2",
        noise_schedules: Union[str, Sequence[str]] = "cosine",
        pred_objectives: Union[str, Sequence[str]] = "noise",
        lowres_noise_schedule: str = "linear",
        lowres_sample_noise_level: float = 0.2,
        per_sample_random_aug_noise_level: bool = False,
        auto_normalize_img: bool = False,
        p2_loss_weight_gamma: Union[float, Sequence[float]] = 0.5,
        p2_loss_weight_k: float = 1.0,
        dynamic_thresholding: Union[bool, Sequence[bool]] = True,
        dynamic_thresholding_percentile: float = 0.95,
        only_train_unet_number: Optional[int] = None,
        norm: str = "z-score",
        batch_sample: bool = False,
        lpips_fn=None,
        spatial_dims: int = 3,
        non_uniform_times: bool = False,
        non_uniform_gamma: float = 10.0,
    ):
        unets = list(unets) if isinstance(unets, (list, tuple)) else [unets]
        num_unets = len(unets)

        self.channels = channels
        self.norm = norm
        self.min_bound = float(min_bound)
        self.batch_sample = batch_sample
        self.only_train_unet_number = only_train_unet_number
        self.lpips_fn = lpips_fn
        self.spatial_dims = spatial_dims  # 3 = volumes, 2 = slices
        # exp-weighted non-uniform sampling times (the reference carries the
        # capability, commented out at imagen_pytorch3D.py:2098)
        self.non_uniform_times = non_uniform_times
        self.non_uniform_gamma = non_uniform_gamma

        if loss_type not in _LOSSES:
            raise NotImplementedError(f"unknown loss type {loss_type}")
        self.loss_type = loss_type
        self.loss_fn = _LOSSES[loss_type]

        # noise schedules default 'cosine','cosine','linear',... (reference
        # :1818-1822)
        noise_schedules = cast_tuple(noise_schedules)
        noise_schedules = pad_tuple_to_length(noise_schedules, 2, "cosine")
        noise_schedules = pad_tuple_to_length(noise_schedules, num_unets, "linear")
        timesteps = cast_tuple(timesteps, num_unets)

        self.noise_schedulers = [
            GaussianDiffusionContinuousTimes(noise_schedule=s, timesteps=t)
            for t, s in zip(timesteps, noise_schedules)
        ]
        self.lowres_noise_schedule = GaussianDiffusionContinuousTimes(
            noise_schedule=lowres_noise_schedule
        )

        self.pred_objectives = cast_tuple(pred_objectives, num_unets)
        self.image_sizes = cast_tuple(tuple(image_sizes))
        assert num_unets == len(self.image_sizes)
        self.sample_channels = cast_tuple(self.channels, num_unets)

        # cascade conditioning: first unet unconditioned, rest lowres-cond
        # (reference :1848-1858)
        self.unets = []
        for ind, one_unet in enumerate(unets):
            is_first = ind == 0
            one_unet = one_unet.cast_model_parameters(
                lowres_cond=not is_first,
                channels=self.channels,
                channels_out=self.channels,
            )
            self.unets.append(one_unet)

        self.lowres_sample_noise_level = lowres_sample_noise_level
        self.per_sample_random_aug_noise_level = per_sample_random_aug_noise_level

        self.cond_drop_prob = cond_drop_prob
        self.can_classifier_guidance = cond_drop_prob > 0.0

        self.normalize_img = (
            normalize_neg_one_to_one if auto_normalize_img else identity
        )
        self.unnormalize_img = (
            unnormalize_zero_to_one if auto_normalize_img else identity
        )

        self.dynamic_thresholding = cast_tuple(dynamic_thresholding, num_unets)
        self.dynamic_thresholding_percentile = dynamic_thresholding_percentile

        self.p2_loss_weight_k = p2_loss_weight_k
        self.p2_loss_weight_gamma = cast_tuple(p2_loss_weight_gamma, num_unets)
        assert all(g <= 2 for g in self.p2_loss_weight_gamma)

    # ------------------------------------------------------------------
    @property
    def num_unets(self) -> int:
        return len(self.unets)

    def get_unet(self, unet_number: int):
        assert 0 < unet_number <= self.num_unets
        return self.unets[unet_number - 1]

    def init_params(self, key: jax.Array, batch_size: int = 1) -> List[Any]:
        """Initialise parameters for every unet at its configured image size."""
        params = []
        for ind, (unet, size) in enumerate(zip(self.unets, self.image_sizes)):
            k = jax.random.fold_in(key, ind)
            b = batch_size
            if getattr(unet, "batch_sample", False):
                # batch_sample geometry needs a multiple of factor^3 sub-volumes
                f3 = unet.batch_sample_factor ** 3
                b = -(-b // f3) * f3  # round up to a whole sub-volume group
            x = jnp.zeros(
                (b,) + (size,) * self.spatial_dims + (self.channels,),
                jnp.float32,
            )
            t = jnp.zeros((b,), jnp.float32)
            lowres = x if getattr(unet, "lowres_cond", False) else None
            params.append(
                jax.jit(unet.init)(k, x, t, t, lowres_cond_img=lowres)
            )
        return params

    # ------------------------------------------------------------------
    def _forward_with_cond_scale(self, unet, unet_params, x, t, noise_cond,
                                 cond_scale=1.0, **kwargs):
        """CFG forward (reference ``forward_with_cond_scale``, :1540-1552)."""
        logits = unet.apply(unet_params, x, t, noise_cond, **kwargs)
        if cond_scale == 1.0:
            return logits
        null_logits = unet.apply(unet_params, x, t, noise_cond,
                                 cond_drop_prob=1.0, **kwargs)
        return null_logits + (logits - null_logits) * cond_scale

    def _threshold_x_start(self, x_start, dynamic_threshold: bool):
        """Dynamic thresholding with min_bound clamp semantics (reference
        :2006-2026)."""
        if dynamic_threshold:
            b = x_start.shape[0]
            s = jnp.quantile(
                jnp.abs(x_start.reshape(b, -1)),
                self.dynamic_thresholding_percentile,
                axis=-1,
            )
            s = jnp.clip(s, min=(1.0 if self.norm == "min-max" else self.min_bound))
            s = right_pad_dims_to(x_start, s)
            return jnp.clip(x_start, -s, s) / s
        if self.norm == "min-max":
            return jnp.clip(x_start, -1.0, 1.0)
        return jnp.clip(x_start, min=self.min_bound)

    def p_mean_variance(
        self,
        unet,
        unet_params,
        x,
        t,
        *,
        noise_scheduler,
        t_next=None,
        lowres_cond_img=None,
        cond_images=None,
        self_cond=None,
        cond_scale: float = 1.0,
        model_output=None,
        pred_objective: str = "noise",
        dynamic_threshold: bool = True,
    ):
        """Posterior mean/variance + predicted x0 (reference :1976-2030)."""
        assert not (cond_scale != 1.0 and not self.can_classifier_guidance)

        pred = default(
            model_output,
            lambda: self._forward_with_cond_scale(
                unet, unet_params, x, t, noise_scheduler.get_condition(t),
                cond_scale=cond_scale, lowres_cond_img=lowres_cond_img,
                cond_images=cond_images, self_cond=self_cond,
            ),
        )

        if pred_objective == "noise":
            x_start = noise_scheduler.predict_start_from_noise(x, t, pred)
        elif pred_objective == "x_start":
            x_start = pred
        elif pred_objective == "v":
            x_start = noise_scheduler.predict_start_from_v(x, t, pred)
        else:
            raise ValueError(f"unknown objective {pred_objective}")

        x_start = self._threshold_x_start(x_start, dynamic_threshold)
        mean_and_variance = noise_scheduler.q_posterior(
            x_start=x_start, x_t=x, t=t, t_next=t_next
        )
        return mean_and_variance, x_start

    def p_sample(
        self, unet, unet_params, key, x, t, *, noise_scheduler, t_next=None,
        **kwargs,
    ):
        """One ancestral step (reference :2032-2056)."""
        b = x.shape[0]
        (model_mean, _, model_log_variance), x_start = self.p_mean_variance(
            unet, unet_params, x, t, noise_scheduler=noise_scheduler,
            t_next=t_next, **kwargs,
        )
        noise = jax.random.normal(key, x.shape, x.dtype)
        is_last = (t_next == 0).astype(jnp.float32)
        nonzero_mask = (1.0 - is_last).reshape(b, *((1,) * (x.ndim - 1)))
        pred = model_mean + nonzero_mask * jnp.exp(0.5 * model_log_variance) * noise
        return pred, x_start

    # ------------------------------------------------------------------
    def p_sample_loop(
        self,
        unet,
        unet_params,
        key: jax.Array,
        shape: Tuple[int, ...],
        *,
        noise_scheduler: GaussianDiffusionContinuousTimes,
        lowres_cond_img=None,
        cond_images=None,
        inpaint_images=None,
        inpaint_masks=None,
        inpaint_resample_times: int = 5,
        init_images=None,
        skip_steps: Optional[int] = None,
        cond_scale: float = 1.0,
        pred_objective: str = "noise",
        dynamic_threshold: bool = True,
        return_trajectory: bool = False,
        use_self_cond: bool = False,
    ):
        """Full ancestral sampling as one ``lax.scan`` (reference :2058-2160).

        Returns ``img`` or ``(img, noisy_traj, x0_traj)`` when
        ``return_trajectory`` — matching the reference's returned per-step
        lists but stacked on a leading step axis.
        """
        batch = shape[0]
        key, init_key = jax.random.split(key)
        img = jax.random.normal(init_key, shape, jnp.float32)
        if exists(init_images):
            img = img + init_images

        if self.non_uniform_times:
            # exp-weighted schedule (core.schedules, reference :268-288):
            # host-side numpy draw, static at trace time like the uniform grid
            t_cur, t_next = noise_scheduler.get_sampling_timesteps_non_uniform(
                batch, gamma=self.non_uniform_gamma
            )
        else:
            t_cur, t_next = noise_scheduler.get_sampling_timesteps(batch)
        # skip-steps subsampling (reference :2103-2107) — static reshaping
        # of the (t, t_next) pairs; applies identically to the uniform and
        # non-uniform grids (the reference subsamples the pair list, so a
        # non-unit stride leaves the same "gaps" either way)
        if skip_steps is not None and skip_steps > 1:
            n_pairs = int(t_cur.shape[0])
            idx = list(range(0, n_pairs, skip_steps))
            if idx[-1] != n_pairs - 1:
                idx = idx + [n_pairs - 1]
            t_cur = t_cur[jnp.asarray(idx)]
            t_next = t_next[jnp.asarray(idx)]

        has_inpainting = exists(inpaint_images) and exists(inpaint_masks)
        resample_times = inpaint_resample_times if has_inpainting else 1

        unet_self_cond = use_self_cond or getattr(unet, "self_cond", False)

        def resample_step(carry, t_pair, r_index):
            img, x_start, key = carry
            times, times_next = t_pair
            key, k_inpaint, k_sample, k_renoise = jax.random.split(key, 4)

            if has_inpainting:
                noised_inpaint, *_ = noise_scheduler.q_sample(
                    inpaint_images, times,
                    jax.random.normal(k_inpaint, img.shape),
                )
                img = img * (1 - inpaint_masks) + noised_inpaint * inpaint_masks

            self_cond = x_start if unet_self_cond else None
            img, x_start = self.p_sample(
                unet, unet_params, k_sample, img, times,
                noise_scheduler=noise_scheduler, t_next=times_next,
                lowres_cond_img=lowres_cond_img, cond_images=cond_images,
                cond_scale=cond_scale, self_cond=self_cond,
                pred_objective=pred_objective,
                dynamic_threshold=dynamic_threshold,
            )

            if has_inpainting and r_index != 0:
                renoised = noise_scheduler.q_sample_from_to(
                    img, times_next, times,
                    jax.random.normal(k_renoise, img.shape),
                )
                is_last = right_pad_dims_to(img, (times_next == 0).astype(img.dtype))
                img = img * is_last + renoised * (1 - is_last)

            return (img, x_start, key)

        def scan_step(carry, t_pair):
            for r in reversed(range(resample_times)):
                carry = resample_step(carry, t_pair, r)
            img, x_start, key = carry
            ys = (img, x_start) if return_trajectory else None
            return (img, x_start, key), ys

        init_carry = (img, jnp.zeros_like(img), key)
        (img, x_start, _), traj = jax.lax.scan(
            scan_step, init_carry, (t_cur, t_next)
        )

        if self.norm == "min-max":
            img = jnp.clip(img, -1.0, 1.0)
        else:
            img = jnp.clip(img, min=self.min_bound)
        img = self.unnormalize_img(img)

        if return_trajectory:
            noisy_traj, x0_traj = traj
            return img, noisy_traj, x0_traj
        return img

    # ------------------------------------------------------------------
    def sample(
        self,
        params: List[Any],
        key: jax.Array,
        *,
        batch_size: int = 1,
        cond_images=None,
        inpaint_images=None,
        inpaint_masks=None,
        inpaint_resample_times: int = 5,
        init_images=None,
        skip_steps=None,
        cond_scale: Union[float, Sequence[float]] = 1.0,
        start_at_unet_number: int = 1,
        start_image_or_video=None,
        stop_at_unet_number: Optional[int] = None,
        return_all_outputs: bool = False,
        return_trajectory: bool = False,
        lowres_sample_noise_level: Optional[float] = None,
    ):
        """Cascade sampling (reference ``Imagen.sample``, :2162-2274).

        The reference exposes this kwarg as both ``return_all_outputs`` (3D)
        and ``return_all_unet_outputs`` (trainer/elucidated); here one
        consistent name with an alias accepted by the Trainer wrapper.
        """
        num_unets = self.num_unets
        cond_scale = cast_tuple(cond_scale, num_unets)
        init_images = cast_tuple(init_images, num_unets)
        skip_steps = cast_tuple(skip_steps, num_unets)

        img = None
        if start_at_unet_number > 1:
            assert start_at_unet_number <= num_unets
            assert start_image_or_video is not None, (
                "starting image must be supplied if only doing upscaling"
            )
            img = jnp.asarray(start_image_or_video)

        outputs = []
        traj = None
        for unet_number in range(1, num_unets + 1):
            if unet_number < start_at_unet_number:
                continue
            index = unet_number - 1
            unet = self.unets[index]
            key, sub = jax.random.split(key)

            lowres_cond_img = None
            if getattr(unet, "lowres_cond", False):
                lowres_cond_img = img

            size = self.image_sizes[index]
            shape = (batch_size,) + (size,) * self.spatial_dims + (self.channels,)

            result = self.p_sample_loop(
                unet,
                params[index],
                sub,
                shape,
                noise_scheduler=self.noise_schedulers[index],
                lowres_cond_img=lowres_cond_img,
                cond_images=cond_images,
                inpaint_images=inpaint_images,
                inpaint_masks=inpaint_masks,
                inpaint_resample_times=inpaint_resample_times,
                init_images=init_images[index],
                skip_steps=skip_steps[index],
                cond_scale=cond_scale[index],
                pred_objective=self.pred_objectives[index],
                dynamic_threshold=self.dynamic_thresholding[index],
                return_trajectory=return_trajectory,
            )
            if return_trajectory:
                img, noisy_traj, x0_traj = result
                traj = (noisy_traj, x0_traj)
            else:
                img = result
            outputs.append(img)

            if stop_at_unet_number == unet_number:
                break

        out = outputs if return_all_outputs else outputs[-1]
        if return_trajectory:
            return out, traj[0], traj[1]
        return out

    # ------------------------------------------------------------------
    def p_losses(
        self,
        unet,
        unet_params,
        key: jax.Array,
        x_start,
        times,
        *,
        noise_scheduler,
        lowres_cond_img=None,
        cond_images=None,
        noise=None,
        pred_objective: str = "noise",
        p2_loss_weight_gamma: float = 0.0,
        deterministic: bool = True,
        rngs=None,
    ):
        """Training loss (reference ``p_losses``, :2276-2387). Returns
        ``(loss, pred, x_noisy, lowres_cond_img_noisy)``."""
        key, noise_key = jax.random.split(key)
        noise = default(noise, lambda: jax.random.normal(noise_key, x_start.shape))

        x_start = self.normalize_img(x_start)
        if exists(lowres_cond_img):
            lowres_cond_img = self.normalize_img(lowres_cond_img)

        x_noisy, log_snr, alpha, sigma = noise_scheduler.q_sample(
            x_start, times, noise
        )
        # the 3D reference does NOT noise the lowres conditioning during
        # training (:2303-2304)
        lowres_cond_img_noisy = lowres_cond_img
        noise_cond = noise_scheduler.get_condition(times)

        apply_kwargs = dict(
            lowres_cond_img=lowres_cond_img_noisy,
            cond_images=cond_images,
            cond_drop_prob=self.cond_drop_prob,
            deterministic=deterministic,
        )
        if rngs is not None:
            pred = unet.apply(unet_params, x_noisy, times, noise_cond,
                              rngs=rngs, **apply_kwargs)
        else:
            pred = unet.apply(unet_params, x_noisy, times, noise_cond,
                              **apply_kwargs)

        if pred_objective == "noise":
            target = noise
        elif pred_objective == "x_start":
            target = x_start
        elif pred_objective == "v":
            target = alpha * noise - sigma * x_start
        else:
            raise ValueError(f"unknown objective {pred_objective}")

        if pred_objective == "x_start":
            pred = jnp.clip(pred, min=self.min_bound)  # reference :2361-2362

        losses = self.loss_fn(pred, target)
        losses = losses.reshape(losses.shape[0], -1).mean(axis=-1)

        if p2_loss_weight_gamma > 0:
            loss_weight = (
                self.p2_loss_weight_k + jnp.exp(log_snr)
            ) ** -p2_loss_weight_gamma
            losses = losses * loss_weight

        loss = losses.mean()
        if self.lpips_fn is not None:
            loss = loss + 0.1 * self.lpips_fn(pred, target)

        return loss, pred, x_noisy, lowres_cond_img_noisy

    def forward(
        self,
        params: List[Any],
        key: jax.Array,
        images,
        lowres_img=None,
        *,
        unet_number: Optional[int] = None,
        cond_images=None,
        deterministic: bool = True,
        rngs=None,
    ):
        """Sample times + dispatch to p_losses (reference ``forward``,
        :2389-2443)."""
        assert not (self.num_unets > 1 and unet_number is None)
        unet_number = default(unet_number, 1)
        assert (
            self.only_train_unet_number is None
            or self.only_train_unet_number == unet_number
        )
        index = unet_number - 1
        unet = self.unets[index]

        noise_scheduler = self.noise_schedulers[index]
        p2_gamma = self.p2_loss_weight_gamma[index]
        pred_objective = self.pred_objectives[index]
        target_image_size = self.image_sizes[index]

        b = images.shape[0]
        assert images.shape[1] >= target_image_size
        assert lowres_img is not None, "lowres image must be provided"

        key, t_key = jax.random.split(key)
        if self.batch_sample:
            # one shared diffusion time across the 27 sub-volumes
            # (reference :2428-2431)
            times = jnp.broadcast_to(
                noise_scheduler.sample_random_times(t_key, 1), (b,)
            )
        else:
            times = noise_scheduler.sample_random_times(t_key, b)

        return self.p_losses(
            unet,
            params[index],
            key,
            images,
            times,
            noise_scheduler=noise_scheduler,
            lowres_cond_img=lowres_img,
            cond_images=cond_images,
            pred_objective=pred_objective,
            p2_loss_weight_gamma=p2_gamma,
            deterministic=deterministic,
            rngs=rngs,
        )


def imagen_from_config(cfg, unets) -> Imagen:
    """Build the Imagen wrapper exactly as the reference entry scripts do
    (reference train.py:118-133 / test.py:110-125). ``Train.lpips`` wires the
    slice-wise VGG-LPIPS auxiliary loss into ``p_losses`` (reference
    imagen_pytorch3D.py:1775-1778, 2372-2385)."""
    lpips_fn = None
    if getattr(cfg.train, "medlpips", False):
        # 3D MedicalNet perceptual loss (reference percept_loss.py:104-126;
        # note the reference's own wiring dead-ends at
        # imagen_pytorch3D.py:1779-1783 — here it actually feeds p_losses)
        from diffusioniqt_tpu.metrics.medicalnet import (
            MedicalNetPerceptual,
            medicalnet_perceptual_from_checkpoint,
        )

        weights = getattr(cfg.train, "medlpips_weights", "") or None
        lpips_fn = (medicalnet_perceptual_from_checkpoint(weights)
                    if weights else MedicalNetPerceptual())
    elif getattr(cfg.train, "lpips", False):
        from diffusioniqt_tpu.metrics.lpips import make_lpips_fn

        lpips_fn = make_lpips_fn(
            weights_path=getattr(cfg.train, "lpips_weights", "") or None
        )
    return Imagen(
        unets,
        lpips_fn=lpips_fn,
        image_sizes=(cfg.train.patch_size_sub, cfg.train.patch_size_sub),
        min_bound=cfg.data.min_bound,
        channels=cfg.train.channels,
        pred_objectives=cfg.train.pred_obj,
        timesteps=cfg.train.timesteps,
        dynamic_thresholding=cfg.train.dynamic_threshold,
        p2_loss_weight_gamma=0.0,
        auto_normalize_img=False,
        cond_drop_prob=0.0,
        norm=cfg.data.norm,
        batch_sample=cfg.train.batch_sample,
        non_uniform_times=getattr(cfg.train, "non_uniform_sampling", False),
        non_uniform_gamma=getattr(cfg.train, "non_uniform_gamma", 10.0),
    )
