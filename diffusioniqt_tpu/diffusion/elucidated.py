"""Elucidated (Karras EDM) cascaded diffusion — ``ElucidatedImagen`` equivalent.

TPU-native re-design of ``/root/reference/elucidated_imagen.py``:
  * per-unet EDM hyperparameters (:96-106, :245-259) via core.edm.EDMParams
  * preconditioned network forward, Table-1 c_skip/c_out/c_in/c_noise
    (:314-358)
  * rho-spaced sigma schedule (:365-379)
  * stochastic Heun sampler with churn + 2nd-order correction (:381-532) —
    compiled as a single ``lax.scan`` with a ``lax.cond`` for the correction
  * training: log-normal sigma draw + EDM loss weight (:706-710, :821-882),
    including the noised-lowres conditioning augmentation (:779-819)

Same stateless-orchestrator design as diffusion.gaussian.Imagen.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from diffusioniqt_tpu.core.edm import EDMParams
from diffusioniqt_tpu.core.schedules import (
    GaussianDiffusionContinuousTimes,
    right_pad_dims_to,
)
from diffusioniqt_tpu.diffusion.gaussian import (
    identity,
    normalize_neg_one_to_one,
    unnormalize_zero_to_one,
)
from diffusioniqt_tpu.ops.volume import resize_volume
from diffusioniqt_tpu.utils.misc import cast_tuple, default, exists


class ElucidatedImagen:
    """Cascaded EDM diffusion over one or more U-Nets."""

    def __init__(
        self,
        unets,
        *,
        image_sizes: Sequence[int],
        channels: int = 3,
        cond_drop_prob: float = 0.1,
        lowres_sample_noise_level: float = 0.2,
        per_sample_random_aug_noise_level: bool = False,
        lowres_noise_aug: bool = True,
        auto_normalize_img: bool = True,
        dynamic_thresholding: Union[bool, Sequence[bool]] = True,
        dynamic_thresholding_percentile: float = 0.95,
        only_train_unet_number: Optional[int] = None,
        lowres_noise_schedule: str = "linear",
        norm: str = "min-max",
        min_bound: float = -1.0,
        spatial_dims: int = 3,
        num_sample_steps: Union[int, Sequence[int]] = 32,
        sigma_min: Union[float, Sequence[float]] = 0.002,
        sigma_max: Union[float, Sequence[float]] = 80.0,
        sigma_data: Union[float, Sequence[float]] = 0.5,
        rho: Union[float, Sequence[float]] = 7.0,
        P_mean: Union[float, Sequence[float]] = -1.2,
        P_std: Union[float, Sequence[float]] = 1.2,
        S_churn: Union[float, Sequence[float]] = 80.0,
        S_tmin: Union[float, Sequence[float]] = 0.05,
        S_tmax: Union[float, Sequence[float]] = 50.0,
        S_noise: Union[float, Sequence[float]] = 1.003,
        max_steps_per_launch: Optional[int] = None,
    ):
        unets = list(unets) if isinstance(unets, (list, tuple)) else [unets]
        num_unets = len(unets)

        self.channels = channels
        self.norm = norm
        self.min_bound = float(min_bound)
        self.spatial_dims = spatial_dims
        self.only_train_unet_number = only_train_unet_number
        self.cond_drop_prob = cond_drop_prob
        self.can_classifier_guidance = cond_drop_prob > 0.0

        self.image_sizes = cast_tuple(tuple(image_sizes))
        assert num_unets == len(self.image_sizes)

        self.unets = []
        for ind, one_unet in enumerate(unets):
            is_first = ind == 0
            one_unet = one_unet.cast_model_parameters(
                lowres_cond=not is_first,
                channels=self.channels,
                channels_out=self.channels,
            )
            self.unets.append(one_unet)

        self.lowres_noise_schedule = GaussianDiffusionContinuousTimes(
            noise_schedule=lowres_noise_schedule
        )
        self.lowres_sample_noise_level = lowres_sample_noise_level
        self.per_sample_random_aug_noise_level = per_sample_random_aug_noise_level
        # Whether the lowres conditioning image is noised at all — the
        # upstream text-to-image behavior (reference elucidated_imagen.py
        # :779-819 train aug, :620-633 sample-time q_sample). The 3D IQT
        # path passes the conditioning CLEAN in both phases, mirroring the
        # Gaussian wrapper (reference imagen_pytorch3D.py:2303-2304): in
        # IQT the lowres image is the entire signal, and corrupting it
        # measurably degrades trained quality (QUALITY.md round 5).
        self.lowres_noise_aug = lowres_noise_aug

        self.normalize_img = (
            normalize_neg_one_to_one if auto_normalize_img else identity
        )
        self.unnormalize_img = (
            unnormalize_zero_to_one if auto_normalize_img else identity
        )
        self.input_image_range = (0.0 if auto_normalize_img else -1.0, 1.0)

        self.dynamic_thresholding = cast_tuple(dynamic_thresholding, num_unets)
        self.dynamic_thresholding_percentile = dynamic_thresholding_percentile

        # launch-duration cap for eager sampling (see one_unet_sample)
        self.max_steps_per_launch = max_steps_per_launch
        self._segment_fn_cache: dict = {}

        hp_fields = (num_sample_steps, sigma_min, sigma_max, sigma_data, rho,
                     P_mean, P_std, S_churn, S_tmin, S_tmax, S_noise)
        hp_fields = [cast_tuple(f, num_unets) for f in hp_fields]
        self.hparams = [
            EDMParams(
                num_sample_steps=ns, sigma_min=smin, sigma_max=smax,
                sigma_data=sd, rho=r, P_mean=pm, P_std=ps, S_churn=sc,
                S_tmin=st0, S_tmax=st1, S_noise=sn,
            )
            for ns, smin, smax, sd, r, pm, ps, sc, st0, st1, sn in zip(*hp_fields)
        ]

    # ------------------------------------------------------------------
    @property
    def num_unets(self) -> int:
        return len(self.unets)

    def init_params(self, key: jax.Array, batch_size: int = 1) -> List[Any]:
        params = []
        for ind, (unet, size) in enumerate(zip(self.unets, self.image_sizes)):
            k = jax.random.fold_in(key, ind)
            b = batch_size
            if getattr(unet, "batch_sample", False):
                f3 = unet.batch_sample_factor ** 3
                b = -(-b // f3) * f3  # round up to a whole sub-volume group
            x = jnp.zeros(
                (b,) + (size,) * self.spatial_dims + (self.channels,),
                jnp.float32,
            )
            t = jnp.zeros((b,), jnp.float32)
            lowres = x if getattr(unet, "lowres_cond", False) else None
            params.append(jax.jit(unet.init)(k, x, t, t, lowres_cond_img=lowres))
        return params

    # ------------------------------------------------------------------
    def threshold_x_start(self, x_start, dynamic_threshold: bool = True):
        """Reference :291-310, with the z-score min_bound extension used by
        the IQT configs."""
        if not dynamic_threshold:
            if self.norm == "min-max":
                return jnp.clip(x_start, -1.0, 1.0)
            return jnp.clip(x_start, min=self.min_bound)
        b = x_start.shape[0]
        s = jnp.quantile(
            jnp.abs(x_start.reshape(b, -1)),
            self.dynamic_thresholding_percentile,
            axis=-1,
        )
        s = jnp.clip(s, min=(1.0 if self.norm == "min-max" else self.min_bound))
        s = right_pad_dims_to(x_start, s)
        return jnp.clip(x_start, -s, s) / s

    def preconditioned_network_forward(
        self,
        unet,
        unet_params,
        noised_images,
        sigma,
        hp: EDMParams,
        *,
        clamp: bool = False,
        dynamic_threshold: bool = True,
        cond_scale: float = 1.0,
        lowres_cond_img=None,
        lowres_noise_times=None,
        cond_images=None,
        text_embeds=None,
        text_mask=None,
        self_cond=None,
        deterministic: bool = True,
        rngs=None,
    ):
        """EDM eq. (7) (reference :329-358)."""
        import inspect

        batch = noised_images.shape[0]
        sigma = jnp.asarray(sigma, jnp.float32)
        if sigma.ndim == 0:
            sigma = jnp.broadcast_to(sigma, (batch,))
        padded_sigma = right_pad_dims_to(noised_images, sigma)

        c_noise = hp.c_noise(sigma)
        apply_kwargs = dict(
            lowres_cond_img=lowres_cond_img,
            cond_images=cond_images,
            self_cond=self_cond,
            deterministic=deterministic,
        )
        # text / lowres-noise conditioning for unets that accept them
        # (the video unet; the 3D IQT unet is unconditional)
        unet_params_sig = inspect.signature(type(unet).__call__).parameters
        if "lowres_noise_times" in unet_params_sig:
            apply_kwargs["lowres_noise_times"] = lowres_noise_times
        if "text_embeds" in unet_params_sig and text_embeds is not None:
            apply_kwargs["text_embeds"] = text_embeds
            apply_kwargs["text_mask"] = text_mask
        net_in = hp.c_in(padded_sigma) * noised_images
        if rngs is not None:
            net_out = unet.apply(unet_params, net_in, c_noise, c_noise,
                                 rngs=rngs, **apply_kwargs)
        else:
            net_out = unet.apply(unet_params, net_in, c_noise, c_noise,
                                 **apply_kwargs)
        if cond_scale != 1.0:
            # classifier-free guidance: second, null-conditioned eval and
            # mix — the reference routes every EDM model eval through
            # unet.forward_with_cond_scale (elucidated_imagen.py:489,508;
            # CFG mix imagen_pytorch.py forward_with_cond_scale). Applied
            # to the RAW network output, before the c_skip/c_out
            # preconditioning recombination, exactly as the reference
            # guides the inner forward.
            null_out = unet.apply(unet_params, net_in, c_noise, c_noise,
                                  cond_drop_prob=1.0, **apply_kwargs)
            net_out = null_out + (net_out - null_out) * cond_scale

        out = hp.c_skip(padded_sigma) * noised_images + hp.c_out(padded_sigma) * net_out
        if not clamp:
            return out
        return self.threshold_x_start(out, dynamic_threshold)

    # ------------------------------------------------------------------
    def one_unet_sample(
        self,
        unet,
        unet_params,
        key: jax.Array,
        shape: Tuple[int, ...],
        *,
        hp: EDMParams,
        clamp: bool = True,
        dynamic_threshold: bool = True,
        cond_scale: float = 1.0,
        lowres_cond_img=None,
        lowres_noise_times=None,
        cond_images=None,
        text_embeds=None,
        text_mask=None,
        inpaint_images=None,
        inpaint_masks=None,
        inpaint_resample_times: int = 5,
        init_images=None,
        skip_steps: Optional[int] = None,
        sigma_min: Optional[float] = None,
        sigma_max: Optional[float] = None,
    ):
        """Stochastic Heun sampling loop as one lax.scan (reference :381-532)."""
        import dataclasses as _dc

        if sigma_min is not None or sigma_max is not None:
            hp = _dc.replace(
                hp,
                sigma_min=sigma_min or hp.sigma_min,
                sigma_max=sigma_max or hp.sigma_max,
            )

        sigmas = hp.sample_schedule()  # (N+1,)
        gammas = hp.gammas(sigmas)

        sigma_cur = sigmas[:-1]
        sigma_next = sigmas[1:]
        gamma_cur = gammas[:-1]

        initial_step = default(skip_steps, 0)
        if initial_step > 0:
            sigma_cur = sigma_cur[initial_step:]
            sigma_next = sigma_next[initial_step:]
            gamma_cur = gamma_cur[initial_step:]

        key, init_key = jax.random.split(key)
        images = sigma_cur[0] * jax.random.normal(init_key, shape, jnp.float32)
        if exists(init_images):
            images = images + init_images

        has_inpainting = exists(inpaint_images) and exists(inpaint_masks)
        resample_times = inpaint_resample_times if has_inpainting else 1
        if has_inpainting:
            inpaint_images = self.normalize_img(inpaint_images)
            inpaint_images = resize_volume(inpaint_images, shape[1])
            inpaint_masks = resize_volume(
                inpaint_masks.astype(jnp.float32), shape[1]
            )

        unet_self_cond = getattr(unet, "self_cond", False)

        # conditioning arrays travel as ARGUMENTS of the (possibly jitted)
        # step functions, never as closure captures: a jitted closure would
        # bake them — and the params — in as compile-time constants
        arrays = dict(
            lowres_cond_img=lowres_cond_img,
            lowres_noise_times=lowres_noise_times,
            cond_images=cond_images,
            text_embeds=text_embeds,
            text_mask=text_mask,
            inpaint_images=inpaint_images if has_inpainting else None,
            inpaint_masks=inpaint_masks if has_inpainting else None,
        )

        def resample_step(unet_params, arrs, carry, sig, sig_next, gamma,
                          r_index, correct):
            images, x_start, key = carry
            key, k_eps, k_repaint = jax.random.split(key, 3)

            eps = hp.S_noise * jax.random.normal(k_eps, shape, jnp.float32)
            sigma_hat = sig + gamma * sig
            added_noise = jnp.sqrt(jnp.maximum(sigma_hat ** 2 - sig ** 2, 0.0)) * eps
            images_hat = images + added_noise

            if has_inpainting:
                images_hat = (
                    images_hat * (1 - arrs["inpaint_masks"])
                    + (arrs["inpaint_images"] + added_noise)
                    * arrs["inpaint_masks"]
                )

            fwd = dict(
                hp=hp, clamp=clamp, dynamic_threshold=dynamic_threshold,
                cond_scale=cond_scale,
                lowres_cond_img=arrs["lowres_cond_img"],
                lowres_noise_times=arrs["lowres_noise_times"],
                cond_images=arrs["cond_images"],
                text_embeds=arrs["text_embeds"],
                text_mask=arrs["text_mask"],
            )
            self_cond = x_start if unet_self_cond else None
            model_output = self.preconditioned_network_forward(
                unet, unet_params, images_hat, sigma_hat,
                self_cond=self_cond, **fwd,
            )
            denoised_over_sigma = (images_hat - model_output) / sigma_hat
            images_next = images_hat + (sig_next - sigma_hat) * denoised_over_sigma

            if correct:
                # 2nd-order correction (reference :500-516) — applied on
                # every step except the final sigma_next == 0 one. That
                # distinction is static (the schedule always ends in the
                # appended 0), so it is hoisted to trace time: the scan body
                # carries no lax.cond and the jaxpr FLOP walk is exact.
                sc = model_output if unet_self_cond else None
                model_output_next = self.preconditioned_network_forward(
                    unet, unet_params, images_next, sig_next,
                    self_cond=sc, **fwd,
                )
                denoised_prime = (images_next - model_output_next) / sig_next
                images = images_hat + 0.5 * (sig_next - sigma_hat) * (
                    denoised_over_sigma + denoised_prime
                )
                x_start = model_output_next
            else:
                images, x_start = images_next, model_output

            if has_inpainting and r_index != 0:
                repaint_noise = jax.random.normal(k_repaint, shape, jnp.float32)
                images = images + (sig - sig_next) * repaint_noise

            return (images, x_start, key)

        def heun_segment(unet_params, carry, triples, arrs):
            """A run of always-corrected Heun steps as one lax.scan."""

            def body(carry, step):
                sig, sig_next, gamma = step
                for r in reversed(range(resample_times)):
                    carry = resample_step(unet_params, arrs, carry, sig,
                                          sig_next, gamma, r, correct=True)
                return carry, None

            carry, _ = jax.lax.scan(body, carry, triples)
            return carry

        def final_step(unet_params, carry, last, arrs):
            """The sigma_next == 0 Euler step + output clamp/unnormalize."""
            sig, sig_next, gamma = last
            for r in reversed(range(resample_times)):
                carry = resample_step(unet_params, arrs, carry, sig,
                                      sig_next, gamma, r, correct=False)
            images = carry[0]
            if self.norm == "min-max":
                images = jnp.clip(images, -1.0, 1.0)
            else:
                images = jnp.clip(images, min=self.min_bound)
            if has_inpainting:
                images = (
                    images * (1 - arrs["inpaint_masks"])
                    + arrs["inpaint_images"] * arrs["inpaint_masks"]
                )
            return self.unnormalize_img(images)

        init_carry = (images, jnp.zeros_like(images), key)
        triples = (sigma_cur[:-1], sigma_next[:-1], gamma_cur[:-1])
        last = (sigma_cur[-1], sigma_next[-1], gamma_cur[-1])
        n_heun = int(sigma_cur.shape[0]) - 1

        seg = self.max_steps_per_launch
        traced = isinstance(images, jax.core.Tracer)
        if seg is None or traced:
            # single launch: inline — either the enclosing jit compiles it,
            # or the caller opted out of launch capping entirely
            carry = heun_segment(unet_params, init_carry, triples, arrays)
            return final_step(unet_params, carry, last, arrays)

        # Segmented execution: the TPU runtime behind the axon tunnel kills
        # any single device launch running longer than a few seconds (the
        # worker crashes — measured: a 64-step Heun launch at batch 216 dies
        # while 8 steps survive, and a 160-step GAUSSIAN launch dies the
        # same way, so it is launch duration, not this sampler). Running the
        # Heun loop as ceil(N/seg)-launch segments with the scan carry
        # threaded across launches is numerically IDENTICAL to one scan
        # (same ops, same RNG stream) and bounds every launch. The jitted
        # segment is cached on the instance — at most two lengths compile
        # (seg and the remainder).
        cache_key = (shape, hp, clamp, bool(dynamic_threshold), cond_scale,
                     resample_times, id(unet), has_inpainting)
        fns = self._segment_fn_cache.get(cache_key)
        if fns is None:
            fns = (jax.jit(heun_segment), jax.jit(final_step))
            self._segment_fn_cache[cache_key] = fns
        seg_fn, fin_fn = fns

        carry = init_carry
        for start in range(0, n_heun, seg):
            stop = min(start + seg, n_heun)
            seg_triples = tuple(t[start:stop] for t in triples)
            carry = seg_fn(unet_params, carry, seg_triples, arrays)
        return fin_fn(unet_params, carry, last, arrays)

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
        sigma_min=None,
        sigma_max=None,
        cond_scale: Union[float, Sequence[float]] = 1.0,
        lowres_sample_noise_level: Optional[float] = None,
        start_at_unet_number: int = 1,
        start_image_or_video=None,
        stop_at_unet_number: Optional[int] = None,
        return_all_outputs: bool = False,
        video_frames: Optional[int] = None,
        text_embeds=None,
        text_mask=None,
    ):
        """Cascade EDM sampling (reference :536-702). ``video_frames``
        switches to (B, F, size, size, C) video shapes (reference :604-610)."""

        def _resize(img, size):
            if video_frames is not None:
                out_shape = (img.shape[0], img.shape[1], size, size,
                             img.shape[-1])
                return jax.image.resize(img, out_shape, "nearest")
            return resize_volume(img, size)
        num_unets = self.num_unets
        cond_scale = cast_tuple(cond_scale, num_unets)
        init_images = cast_tuple(init_images, num_unets)
        init_images = [
            self.normalize_img(im) if exists(im) else None for im in init_images
        ]
        skip_steps = cast_tuple(skip_steps, num_unets)
        sigma_min = cast_tuple(sigma_min, num_unets)
        sigma_max = cast_tuple(sigma_max, num_unets)

        lowres_sample_noise_level = default(
            lowres_sample_noise_level, self.lowres_sample_noise_level
        )

        img = None
        if start_at_unet_number > 1:
            assert start_image_or_video is not None
            prev_size = self.image_sizes[start_at_unet_number - 2]
            img = _resize(jnp.asarray(start_image_or_video), prev_size)

        outputs = []
        for unet_number in range(1, num_unets + 1):
            if unet_number < start_at_unet_number:
                continue
            index = unet_number - 1
            unet = self.unets[index]
            hp = self.hparams[index]
            size = self.image_sizes[index]
            key, k_lowres, k_sample = jax.random.split(key, 3)

            lowres_cond_img = None
            lowres_noise_times = None
            if getattr(unet, "lowres_cond", False):
                level = (lowres_sample_noise_level if self.lowres_noise_aug
                         else 0.0)
                lowres_noise_times = self.lowres_noise_schedule.get_times(
                    batch_size, level
                )
                lowres_cond_img = _resize(img, size)
                lowres_cond_img = self.normalize_img(lowres_cond_img)
                if self.lowres_noise_aug:
                    lowres_cond_img, *_ = self.lowres_noise_schedule.q_sample(
                        lowres_cond_img, lowres_noise_times,
                        jax.random.normal(k_lowres, lowres_cond_img.shape),
                    )

            unet_init = init_images[index]
            if exists(unet_init):
                unet_init = _resize(unet_init, size)

            if video_frames is not None:
                shape = (batch_size, video_frames, size, size, self.channels)
            else:
                shape = (batch_size,) + (size,) * self.spatial_dims + (self.channels,)
            img = self.one_unet_sample(
                unet, params[index], k_sample, shape, hp=hp,
                clamp=True, dynamic_threshold=self.dynamic_thresholding[index],
                cond_scale=cond_scale[index], lowres_cond_img=lowres_cond_img,
                lowres_noise_times=(
                    self.lowres_noise_schedule.get_condition(lowres_noise_times)
                ),
                cond_images=cond_images, text_embeds=text_embeds,
                text_mask=text_mask, inpaint_images=inpaint_images,
                inpaint_masks=inpaint_masks,
                inpaint_resample_times=inpaint_resample_times,
                init_images=unet_init, skip_steps=skip_steps[index],
                sigma_min=sigma_min[index], sigma_max=sigma_max[index],
            )
            outputs.append(img)
            if stop_at_unet_number == unet_number:
                break

        return outputs if return_all_outputs else outputs[-1]

    # ------------------------------------------------------------------
    def forward(
        self,
        params: List[Any],
        key: jax.Array,
        images,
        lowres_img=None,
        *,
        unet_number: Optional[int] = None,
        cond_images=None,
        text_embeds=None,
        text_mask=None,
        deterministic: bool = True,
        rngs=None,
        return_outputs: bool = False,
    ):
        """EDM training loss (reference :712-882). Returns the scalar loss,
        or ``(loss, denoised, noised_images, lowres_noisy)`` with
        ``return_outputs`` (the Gaussian ``p_losses`` return convention, for
        qualitative validation dumps).

        When ``lowres_img`` is None and the unet is lowres-conditioned, the
        conditioning image is built by down-up-resizing ``images`` through the
        previous stage size (reference :779-782) — the upstream imagen-style
        self-supervised SR setup. Passing ``lowres_img`` uses the IQT paired
        setup instead.
        """
        assert not (self.num_unets > 1 and unet_number is None)
        unet_number = default(unet_number, 1)
        assert (
            self.only_train_unet_number is None
            or self.only_train_unet_number == unet_number
        )
        index = unet_number - 1
        unet = self.unets[index]
        hp = self.hparams[index]
        target_image_size = self.image_sizes[index]
        prev_image_size = self.image_sizes[index - 1] if index > 0 else None
        batch_size = images.shape[0]

        key, k_aug_t, k_aug_n, k_sigma, k_noise = jax.random.split(key, 5)

        lowres_cond_img = lowres_aug_times = None
        if lowres_img is not None:
            lowres_cond_img = lowres_img
        elif prev_image_size is not None:
            lowres_cond_img = resize_volume(
                images, prev_image_size, clamp_range=self.input_image_range
            )
            lowres_cond_img = resize_volume(
                lowres_cond_img, target_image_size,
                clamp_range=self.input_image_range,
            )

        if lowres_cond_img is not None:
            if not self.lowres_noise_aug:
                # IQT: the conditioning stays clean; t=0 noise condition
                lowres_aug_times = jnp.zeros((batch_size,), jnp.float32)
            elif self.per_sample_random_aug_noise_level:
                lowres_aug_times = self.lowres_noise_schedule.sample_random_times(
                    k_aug_t, batch_size
                )
            else:
                t1 = self.lowres_noise_schedule.sample_random_times(k_aug_t, 1)
                lowres_aug_times = jnp.broadcast_to(t1, (batch_size,))

        images = resize_volume(images, target_image_size)
        images = self.normalize_img(images)

        lowres_cond_img_noisy = None
        if lowres_cond_img is not None:
            lowres_cond_img = self.normalize_img(lowres_cond_img)
            if self.lowres_noise_aug:
                lowres_cond_img_noisy, *_ = self.lowres_noise_schedule.q_sample(
                    lowres_cond_img, lowres_aug_times,
                    jax.random.normal(k_aug_n, lowres_cond_img.shape),
                )
            else:
                lowres_cond_img_noisy = lowres_cond_img

        sigmas = hp.noise_distribution(k_sigma, batch_size)
        padded_sigmas = right_pad_dims_to(images, sigmas)

        noise = jax.random.normal(k_noise, images.shape, jnp.float32)
        noised_images = images + padded_sigmas * noise

        denoised = self.preconditioned_network_forward(
            unet, params[index], noised_images, sigmas, hp,
            lowres_cond_img=lowres_cond_img_noisy,
            lowres_noise_times=(
                self.lowres_noise_schedule.get_condition(lowres_aug_times)
            ),
            cond_images=cond_images, text_embeds=text_embeds,
            text_mask=text_mask, deterministic=deterministic, rngs=rngs,
        )

        losses = ((denoised - images) ** 2).reshape(batch_size, -1).mean(axis=-1)
        losses = losses * hp.loss_weight(sigmas)
        loss = losses.mean()
        if return_outputs:
            return loss, denoised, noised_images, lowres_cond_img_noisy
        return loss


def elucidated_imagen_from_config(cfg, unets) -> ElucidatedImagen:
    """Build the EDM wrapper from the shared YAML config (framework-native
    ``Train.elucidated`` switch). The reference ships ElucidatedImagen
    (``/root/reference/elucidated_imagen.py``) but never wires it into its
    entry scripts; here the same train/test/test_all entries drive either
    sampler. EDM hyperparameters default to the reference's Hparams
    (elucidated_imagen.py:96-106)."""
    return ElucidatedImagen(
        unets,
        image_sizes=(cfg.train.patch_size_sub, cfg.train.patch_size_sub),
        channels=cfg.train.channels,
        cond_drop_prob=0.0,
        auto_normalize_img=False,
        dynamic_thresholding=cfg.train.dynamic_threshold,
        norm=cfg.data.norm,
        min_bound=cfg.data.min_bound,
        num_sample_steps=cfg.train.edm_num_sample_steps,
        sigma_min=cfg.train.edm_sigma_min,
        sigma_max=cfg.train.edm_sigma_max,
        sigma_data=cfg.train.edm_sigma_data,
        rho=cfg.train.edm_rho,
        S_churn=cfg.train.edm_s_churn,
        lowres_noise_aug=cfg.train.edm_lowres_noise_aug,
        max_steps_per_launch=cfg.train.edm_steps_per_launch,
    )
