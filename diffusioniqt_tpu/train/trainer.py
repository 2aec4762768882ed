"""ImagenTrainer — optax/orbax training orchestration.

TPU-native re-design of the reference trainer
(``/root/reference/trainer.py:236-1128``). Capability map:

  * per-unet Adam(lr=1e-4, betas=(0.9, 0.99), eps=1e-8) + optional
    warmup/cosine schedule (:350-382) — optax chain
  * EMA with ema-pytorch semantics (:361-362, :947-1005) — train.ema
  * gradient accumulation (:267, :1116-1124) — ``lax.scan`` over microbatches
    inside ONE jitted step (no Python-side accumulate context)
  * mixed precision — bf16 compute dtype inside the model; no GradScaler
    needed on TPU (SURVEY.md §2.2)
  * data-parallel training — a ``jax.sharding.Mesh`` + NamedSharding over the
    batch axis replaces Accelerate/DDP (:296-301); gradients are reduced by
    XLA's collectives automatically
  * checkpoint save/load incl. optimizer/EMA/step state + rolling retention
    (:813-945, :767-809) — orbax
  * chunked EMA sampling (:201-219, :982-1005, :1083-1097)
  * validation with SSIM/PSNR (:685-765)

One trainer instance trains one unet at a time (reference lock semantics,
:271), but all unets stay resident — no device-swap machinery.
"""

from __future__ import annotations

import os
import shutil
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusioniqt_tpu.config import Config
from diffusioniqt_tpu.diffusion.elucidated import ElucidatedImagen
from diffusioniqt_tpu.diffusion.gaussian import Imagen
from diffusioniqt_tpu.metrics.image import PSNR, SSIM
from diffusioniqt_tpu.ops.volume import subvolumes_to_volume, volume_to_subvolumes
from diffusioniqt_tpu.train.ema import EMAState, ema_update
from diffusioniqt_tpu.utils.misc import cast_tuple, default, exists


def _cycle(iterable):
    while True:
        for item in iterable:
            yield item


class ImagenTrainer:
    """Trains one unet of a (possibly cascaded) Imagen/ElucidatedImagen."""

    def __init__(
        self,
        configs: Optional[Config] = None,
        imagen=None,
        *,
        use_ema: bool = True,
        lr: float = 1e-4,
        eps: float = 1e-8,
        beta1: float = 0.9,
        beta2: float = 0.99,
        max_grad_norm: Optional[float] = None,
        warmup_steps: Optional[int] = None,
        cosine_decay_max_steps: Optional[int] = None,
        only_train_unet_number: Optional[int] = None,
        gradient_accumulation_steps: int = 4,
        checkpoint_path: Optional[str] = None,
        checkpoint_every: Optional[int] = None,
        max_checkpoints_keep: int = 20,
        split_valid_from_train: bool = False,
        ema_decay: float = 0.9999,
        ema_update_after_step: int = 100,
        ema_update_every: int = 10,
        seed: int = 42,
        mesh=None,
        **kwargs,
    ):
        assert imagen is not None, "an Imagen/ElucidatedImagen instance is required"
        assert isinstance(imagen, (Imagen, ElucidatedImagen))
        self.imagen = imagen
        self.is_elucidated = isinstance(imagen, ElucidatedImagen)
        self.configs = configs
        self.num_unets = imagen.num_unets
        self.mesh = mesh

        self.use_ema = use_ema
        self.ema_kwargs = dict(
            beta=ema_decay, update_after_step=ema_update_after_step,
        )
        self.ema_update_every = ema_update_every

        self.only_train_unet_number = only_train_unet_number
        self.gradient_accumulation_steps = gradient_accumulation_steps
        self.max_grad_norm = max_grad_norm

        # per-unet optimizers (reference :348-382)
        lrs = cast_tuple(lr, self.num_unets)
        epses = cast_tuple(eps, self.num_unets)
        warmups = cast_tuple(warmup_steps, self.num_unets)
        cosines = cast_tuple(cosine_decay_max_steps, self.num_unets)

        self._txs = []
        for unet_lr, unet_eps, w, c in zip(lrs, epses, warmups, cosines):
            if c is not None:
                schedule = optax.warmup_cosine_decay_schedule(
                    init_value=0.0 if w else unet_lr,
                    peak_value=unet_lr,
                    warmup_steps=w or 0,
                    decay_steps=c,
                    end_value=unet_lr * 0.001,
                )
            elif w is not None:
                schedule = optax.linear_schedule(0.0, unet_lr, w)
            else:
                schedule = unet_lr
            chain = []
            if max_grad_norm is not None:
                chain.append(optax.clip_by_global_norm(max_grad_norm))
            chain.append(
                optax.adam(learning_rate=schedule, b1=beta1, b2=beta2,
                           eps=unet_eps)
            )
            self._txs.append(optax.chain(*chain))

        # state (lazy init)
        self.params: Optional[List[Any]] = None
        self.opt_states: Optional[List[Any]] = None
        self.ema_states: Optional[List[Optional[EMAState]]] = None
        self.steps = [0] * self.num_unets

        self._key = jax.random.PRNGKey(seed)
        self.prepared = False

        # data
        self.train_dl = None
        self.valid_dl = None
        self._train_iter = None
        self._valid_iter = None
        self.split_valid_from_train = split_valid_from_train

        # checkpointing
        assert not (exists(checkpoint_path) ^ exists(checkpoint_every))
        self.checkpoint_path = checkpoint_path
        self.checkpoint_every = checkpoint_every
        self.max_checkpoints_keep = max_checkpoints_keep

        # jit caches
        self._train_step_fns: Dict[Tuple, Any] = {}
        self._valid_loss_fns: Dict[Tuple, Any] = {}
        self._sample_fns: Dict[Tuple, Any] = {}
        self._ema_update_fn = jax.jit(
            partial(ema_update, **self.ema_kwargs)
        )

        if self.checkpoint_path is not None:
            os.makedirs(self.checkpoint_path, exist_ok=True)
            self.load_from_checkpoint_folder()

    # ------------------------------------------------------------------
    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def prepare(self, batch_size: int = 1):
        """Initialise parameters, optimizer and EMA state. With a mesh,
        parameters are placed with DP/TP shardings (parallel.sharding) and
        the train step compiles to one SPMD program — the reference's
        Accelerate/DDP equivalent (trainer.py:296-301, SURVEY.md §2.2)."""
        if self.prepared:
            return
        self.params = self.imagen.init_params(self._next_key(), batch_size)
        if self.mesh is not None:
            from diffusioniqt_tpu.parallel.sharding import param_shardings

            self._param_shards = [
                param_shardings(p, self.mesh) for p in self.params
            ]
            if jax.process_count() > 1:
                # deterministic init: every process holds identical full
                # params. Build the global arrays directly from the local
                # copies — device_put of uncommitted values to a
                # multi-process sharding inserts a per-leaf cross-host
                # assert_equal allgather (hundreds of Gloo/ICI rendezvous
                # before training even starts)
                def _global(leaf, sh):
                    a = np.asarray(leaf)
                    return jax.make_array_from_process_local_data(
                        sh, a, a.shape)

                self.params = [
                    jax.tree_util.tree_map(_global, p, s)
                    for p, s in zip(self.params, self._param_shards)
                ]
            else:
                self.params = [
                    jax.device_put(p, s)
                    for p, s in zip(self.params, self._param_shards)
                ]
        else:
            self._param_shards = None
        self.opt_states = [
            tx.init(p) for tx, p in zip(self._txs, self.params)
        ]
        self.ema_states = [
            EMAState.create(p) if self.use_ema else None for p in self.params
        ]
        self.prepared = True

    def validate_unet_number(self, unet_number: Optional[int]) -> int:
        if self.num_unets == 1:
            unet_number = default(unet_number, 1)
        assert 0 < unet_number <= self.num_unets
        assert (
            self.only_train_unet_number is None
            or self.only_train_unet_number == unet_number
        ), "you can only train one unet at a time"
        return unet_number

    def get_lr(self, unet_number: int) -> float:
        """Current learning rate (reference :452-458)."""
        self.validate_unet_number(unet_number)
        return float(
            optax.tree_utils.tree_get(
                self.opt_states[unet_number - 1], "learning_rate",
                default=jnp.asarray(0.0),
            )
        )

    def num_steps_taken(self, unet_number: int) -> int:
        return self.steps[unet_number - 1]

    # ------------------------------------------------------------------
    # data registration (reference :540-598)
    def add_train_dataloader(self, dl):
        self.train_dl = dl
        self._train_iter = None

    def add_valid_dataloader(self, dl):
        self.valid_dl = dl
        self._valid_iter = None

    def add_train_dataset(self, dataset, *, batch_size: int,
                          prefetch: int = 2):
        from diffusioniqt_tpu.data.loader import DataLoader

        self.add_train_dataloader(
            DataLoader(dataset, batch_size=batch_size, shuffle=True,
                       prefetch=prefetch,
                       worker_map=self._transfer_map(prefetch))
        )

    def _transfer_map(self, prefetch: int):
        """Loader worker-thread map: cast to ``Train.transfer_dtype`` and
        start the H2D copy ahead of consumption, so the transfer overlaps
        the previous step's device compute (H2D through the axon tunnel is
        ~9-24 MB/s — serial fp32 batch transfers dominate the train step
        without this; PERF.md round 3). Single-process only: on multi-host
        meshes ``train_step`` must slice the host batch first."""
        td = self.configs.train.transfer_dtype if self.configs else None
        if td is None or prefetch <= 0 or jax.process_count() > 1:
            return None
        tdt = jnp.dtype(td)

        def to_device(batch):
            return tuple(
                jnp.asarray(np.asarray(a).astype(tdt)) for a in batch
            )

        return to_device

    def add_valid_dataset(self, dataset, *, batch_size: int):
        from diffusioniqt_tpu.data.loader import DataLoader

        self.add_valid_dataloader(
            DataLoader(dataset, batch_size=batch_size, shuffle=False)
        )

    def _maybe_batch_sample_split(self, hr, lr):
        """96^3 -> 27x32^3 conversion done by the reference trainer
        (:724-728)."""
        cfg = self.configs
        if cfg is not None and cfg.train.batch_sample and hr.shape[1] != cfg.train.patch_size_sub:
            hr = volume_to_subvolumes(hr, cfg.train.batch_sample_factor)
            lr = volume_to_subvolumes(lr, cfg.train.batch_sample_factor)
        return hr, lr

    # ------------------------------------------------------------------
    def _build_train_step(self, unet_index: int, accum: int):
        """One jitted train step: scan over microbatches accumulating grads,
        single optimizer update."""
        imagen = self.imagen
        tx = self._txs[unet_index]

        # a base (non-lowres-conditioned) cascade stage must not receive the
        # paired lowres batch: UNet3D concatenates any lowres_cond_img it is
        # given, which would break the stage's channel count. The reference
        # never trains such a stage through its entries (its unet 1 is
        # NullUnet); gating here makes two-stage cascade training work
        # (reference trainer.py:271,462-497 semantics, VERDICT round-3 #6).
        stage_lowres_cond = getattr(
            imagen.unets[unet_index], "lowres_cond", True)

        def loss_fn(unet_params, key, hr, lr_img):
            params = list(self.params)
            params[unet_index] = unet_params
            if not stage_lowres_cond:
                lr_img = None
            if self.is_elucidated:
                loss = imagen.forward(
                    params, key, hr, lr_img, unet_number=unet_index + 1,
                    deterministic=False, rngs={"dropout": key},
                )
                return loss
            loss, *_ = imagen.forward(
                params, key, hr, lr_img, unet_number=unet_index + 1,
                deterministic=False, rngs={"dropout": key},
            )
            return loss

        grad_fn = jax.value_and_grad(loss_fn)

        def train_step(unet_params, opt_state, key, hr_chunks, lr_chunks):
            # inputs pre-chunked host-side: (accum, microbatch, ...)
            keys = jax.random.split(key, accum)

            def body(carry, xs):
                loss_sum, grad_sum = carry
                k, hr_c, lr_c = xs
                loss, grads = grad_fn(unet_params, k, hr_c, lr_c)
                grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
                return (loss_sum + loss, grad_sum), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, unet_params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                body, (jnp.zeros(()), zero_grads), (keys, hr_chunks, lr_chunks)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, grad_sum)
            updates, opt_state = tx.update(grads, opt_state, unet_params)
            unet_params = optax.apply_updates(unet_params, updates)
            return unet_params, opt_state, loss_sum / accum

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            p_shard = self._param_shards[unet_index]
            b_shard = NamedSharding(self.mesh, P(None, "data"))
            rep = NamedSharding(self.mesh, P())
            return jax.jit(
                train_step,
                donate_argnums=(0, 1),
                in_shardings=(p_shard, None, rep, b_shard, b_shard),
                out_shardings=(p_shard, None, None),
            )
        return jax.jit(train_step, donate_argnums=(0, 1))

    def train_step(self, unet_number: Optional[int] = None,
                   max_batch_size: Optional[int] = None,
                   batch: Optional[Tuple] = None, sync: bool = True,
                   **kwargs) -> float:
        """One optimization step. Pulls a batch from the registered training
        dataloader unless ``batch=(hr, lr)`` is given (channels-last).

        ``sync=False`` returns the loss as a device scalar instead of a
        float, so consecutive steps pipeline: the next batch's host prep and
        H2D transfer overlap the current step's device compute (on the axon
        tunnel this is a ~4x wall-clock lever; convert the returned losses
        with ``float()`` at logging boundaries only)."""
        unet_number = self.validate_unet_number(unet_number)
        index = unet_number - 1

        if batch is None:
            assert self.train_dl is not None, (
                "training dataloader has not been registered with the trainer"
            )
            if self._train_iter is None:
                self._train_iter = _cycle(self.train_dl)
            batch = next(self._train_iter)

        td = self.configs.train.transfer_dtype if self.configs else None
        if td is not None and not isinstance(batch[0], jax.Array):
            # halve H2D bytes on slow links: cast on host (numpy+ml_dtypes),
            # transfer narrow. Inputs are cast to the compute dtype on-device
            # anyway; only loss targets see the quantization. (Batches from
            # a prefetching loader arrive as device arrays already — see
            # _transfer_map — and skip this path.)
            tdt = jnp.dtype(td)
            hr = jnp.asarray(np.asarray(batch[0]).astype(tdt))
            lr_img = jnp.asarray(np.asarray(batch[1]).astype(tdt))
        else:
            hr, lr_img = jnp.asarray(batch[0]), jnp.asarray(batch[1])
        if self.mesh is not None and jax.process_count() > 1:
            # split_batches semantics (reference trainer.py:256): every
            # process sees the same global batch (deterministic loader seed)
            # and keeps only its slice. Sliced PATCH-major — before the
            # batch_sample 27-way split — so a process share can never cut
            # through a sub-volume group (raises on indivisible batches)
            from diffusioniqt_tpu.parallel.multihost import local_batch_slice

            sl = local_batch_slice(hr.shape[0])
            hr, lr_img = hr[sl], lr_img[sl]

        hr, lr_img = self._maybe_batch_sample_split(hr, lr_img)

        if not self.prepared:
            self.prepare()

        # microbatching: gradient accumulation and/or max_batch_size chunking
        accum = self.gradient_accumulation_steps
        b = hr.shape[0]
        if max_batch_size is not None:
            accum = max(accum, -(-b // max_batch_size))
        if b % accum != 0:
            accum = 1  # fall back to a single chunk on ragged batches
        multihost = jax.process_count() > 1
        if self.mesh is not None:
            # on a multi-host mesh each process holds only its local batch
            # shard; divisibility is against the local device count
            data_size = self.mesh.shape.get("data", 1)
            if multihost:
                data_size = max(data_size // jax.process_count(), 1)
            assert b % data_size == 0, (
                f"batch {b} not divisible by data-parallel size {data_size}"
            )
            while accum > 1 and (b // accum) % data_size != 0:
                accum -= 1  # each microbatch must shard evenly over 'data'

        # pre-chunk host-side: (accum, microbatch, ...) — with a mesh, each
        # microbatch's leading axis shards over 'data'
        mb = b // accum
        hr = hr[: mb * accum].reshape((accum, mb) + hr.shape[1:])
        lr_img = lr_img[: mb * accum].reshape((accum, mb) + lr_img.shape[1:])
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            b_shard = NamedSharding(self.mesh, P(None, "data"))
            if multihost:
                # every process holds a (accum, local_mb, ...) slice; the
                # global array is assembled without cross-host transfers
                # (reference gets this from the Accelerate launcher,
                # trainer.py:296-301; VERDICT round-2 missing #4)
                hr = jax.make_array_from_process_local_data(
                    b_shard, np.asarray(hr))
                lr_img = jax.make_array_from_process_local_data(
                    b_shard, np.asarray(lr_img))
            else:
                hr = jax.device_put(hr, b_shard)
                lr_img = jax.device_put(lr_img, b_shard)

        cache_key = (index, accum, hr.shape)
        if cache_key not in self._train_step_fns:
            self._train_step_fns[cache_key] = self._build_train_step(index, accum)

        params, opt_state, loss = self._train_step_fns[cache_key](
            self.params[index], self.opt_states[index], self._next_key(),
            hr, lr_img,
        )
        self.params[index] = params
        self.opt_states[index] = opt_state
        self.steps[index] += 1

        if self.use_ema and self.steps[index] % self.ema_update_every == 0:
            # drive the warm-up ramp by trainer steps (ema-pytorch counts
            # every trainer update, not every gated application)
            self.ema_states[index] = self._ema_update_fn(
                self.ema_states[index], params,
                jnp.asarray(self.steps[index], jnp.int32),
            )

        if (
            self.checkpoint_path is not None
            and self.checkpoint_every
            and self.steps[index] % self.checkpoint_every == 0
        ):
            self.save_to_checkpoint_folder()

        return float(loss) if sync else loss

    def update(self, unet_number: Optional[int] = None):
        """No-op kept for API parity: the reference's ``update`` applies the
        optimizer, but its train.py calls it a second time after
        ``train_step`` already updated, stepping Adam on zero grads
        (reference train.py:159-162, SURVEY.md §3 quirks). Here the optimizer
        update happens exactly once inside ``train_step``."""
        return None

    # ------------------------------------------------------------------
    def _build_valid_loss(self, unet_index: int):
        imagen = self.imagen

        def valid_loss(params_list, key, hr, lr_img):
            if self.is_elucidated:
                # return_outputs gives real (denoised, noised, lowres_noisy)
                # for the qualitative dumps — NOT the ground truth
                loss, pred, x_noisy, lowres_noisy = imagen.forward(
                    params_list, key, hr, lr_img, unet_number=unet_index + 1,
                    return_outputs=True,
                )
            else:
                loss, pred, x_noisy, lowres_noisy = imagen.forward(
                    params_list, key, hr, lr_img, unet_number=unet_index + 1,
                )
            return loss, pred, x_noisy, lowres_noisy

        return jax.jit(valid_loss)

    def valid_step(self, unet_number: Optional[int] = None,
                   max_batch_size: Optional[int] = None, **kwargs):
        """Validation sweep (reference ``valid_step``/``step_with_dl_iter``
        eval branch, :685-765). Deterministic: reseeds to 42 every call like
        the reference (:699-700). Returns
        (loss, preds, x_noisy, [hrs, lowres_noisy], ssim, psnr)."""
        unet_number = self.validate_unet_number(unet_number)
        index = unet_number - 1
        assert self.valid_dl is not None
        if not self.prepared:
            self.prepare()

        repeat = self.configs.eval.repeat if self.configs else 1
        # EDM's preconditioned output is always a denoised x0 estimate
        pred_is_x_start = (
            self.is_elucidated
            or self.imagen.pred_objectives[index] == "x_start"
        )

        multihost = self.mesh is not None and jax.process_count() > 1

        key = jax.random.PRNGKey(42)  # reference quirk: fixed seed per call
        sharded = False
        losses, preds, noisy, hrs, lowres_list = [], [], [], [], []
        ssims, psnrs = [], []
        # reuse the jit object across valid_step calls — a fresh jax.jit
        # wrapper retraces the flagship valid loss on every validation
        # boundary otherwise
        fn = self._valid_loss_fns.get(index)
        if fn is None:
            fn = self._valid_loss_fns[index] = self._build_valid_loss(index)
        for r in range(repeat):
            for batch in self.valid_dl:
                hr, lr_img = jnp.asarray(batch[0]), jnp.asarray(batch[1])
                hr, lr_img = self._maybe_batch_sample_split(hr, lr_img)
                # host copy BEFORE mesh placement: on a multi-process mesh
                # the placed array may not be fully addressable
                hr_np = np.asarray(hr)
                if self.mesh is not None:
                    hr, lr_img, sharded = self._put_valid_batch(hr, lr_img)
                key, sub = jax.random.split(key)
                loss, pred, x_noisy, lowres_noisy = fn(
                    self.params, sub, hr, lr_img
                )
                losses.append(float(loss))
                if sharded and multihost:
                    # data-sharded outputs are not fully addressable on any
                    # one process; gather shards back to every host for the
                    # metric math and qualitative dumps below
                    from jax.experimental import multihost_utils

                    pred, x_noisy, lowres_noisy = (
                        multihost_utils.process_allgather(o, tiled=True)
                        for o in (pred, x_noisy, lowres_noisy)
                    )
                # host copies once: all downstream metric math and dumps
                # run on the numpy copies
                pred = np.asarray(pred)
                x_noisy = np.asarray(x_noisy)
                lowres_noisy = np.asarray(lowres_noisy)
                if pred_is_x_start:
                    if self.configs is not None and self.configs.train.batch_sample:
                        pred_m = subvolumes_to_volume(
                            pred, self.configs.train.batch_sample_factor
                        )
                        hr_m = subvolumes_to_volume(
                            hr_np, self.configs.train.batch_sample_factor
                        )
                    else:
                        pred_m, hr_m = pred, hr_np
                    ssims.append(float(SSIM(pred_m, hr_m)))
                    psnrs.append(float(PSNR(pred_m, hr_m)))
                if r < 2:
                    preds.append(pred)
                    noisy.append(x_noisy)
                    hrs.append(hr_np)
                    lowres_list.append(lowres_noisy)

        loss = float(np.mean(losses))
        preds = np.concatenate(preds) if preds else np.zeros((0,))
        noisy = np.concatenate(noisy) if noisy else np.zeros((0,))
        hrs = np.concatenate(hrs) if hrs else np.zeros((0,))
        lowres_arr = np.concatenate(lowres_list) if lowres_list else np.zeros((0,))
        ssim = float(np.mean(ssims)) if ssims else float("nan")
        psnr_v = float(np.mean(psnrs)) if psnrs else float("nan")
        return loss, preds, noisy, [hrs, lowres_arr], ssim, psnr_v

    def valid_step_sample(self, unet_number: Optional[int] = None,
                          use_ema_unets: bool = True,
                          max_batch_size: Optional[int] = None, **kwargs):
        """Sampling-based validation (reference ``valid_step2``,
        trainer.py:629-683): run the full sampler on each validation batch's
        lowres input and score SSIM/PSNR against ground truth. The validation
        batch itself is chunked by ``max_batch_size`` (reference
        ``imagen_sample_in_chunks``, trainer.py:201-219) so large validation
        sets cannot OOM a chip. Returns (losses, preds, [hrs, lrs], ssim,
        psnr)."""
        unet_number = self.validate_unet_number(unet_number)
        assert self.valid_dl is not None
        if not self.prepared:
            self.prepare()

        repeat = self.configs.eval.repeat if self.configs else 1
        losses, preds, hrs, lrs, ssims, psnrs = [], [], [], [], [], []
        for _ in range(repeat):
            for batch in self.valid_dl:
                hr, lr_img = jnp.asarray(batch[0]), jnp.asarray(batch[1])
                hr, lr_img = self._maybe_batch_sample_split(hr, lr_img)
                out = self.sample(
                    batch_size=hr.shape[0],
                    max_batch_size=max_batch_size,
                    start_image_or_video=lr_img,
                    start_at_unet_number=unet_number,
                    use_non_ema=not use_ema_unets,
                    **kwargs,
                )
                losses.append(float(jnp.mean(jnp.abs(hr - out))))
                ssims.append(float(SSIM(out, hr)))
                psnrs.append(float(PSNR(out, hr)))
                preds.append(np.asarray(out))
                hrs.append(np.asarray(hr))
                lrs.append(np.asarray(lr_img))
        return (
            np.asarray(losses),
            np.concatenate(preds),
            [np.concatenate(hrs), np.concatenate(lrs)],
            float(np.mean(ssims)),
            float(np.mean(psnrs)),
        )

    # ------------------------------------------------------------------
    def _sampling_params(self, use_ema: bool) -> List[Any]:
        if use_ema and self.use_ema:
            return [
                es.params if es is not None else p
                for es, p in zip(self.ema_states, self.params)
            ]
        return list(self.params)

    def _sample_group_size(self) -> int:
        """Sub-volumes per indivisible sampling group (27 when
        batch_sample, else 1). EDM wrappers carry no batch_sample flag, so
        also honour the flagship unet's own geometry."""
        unet = self.imagen.unets[-1]
        if (getattr(self.imagen, "batch_sample", False)
                or getattr(unet, "batch_sample", False)):
            return int(getattr(unet, "batch_sample_factor", 3)) ** 3
        return 1

    # kwargs of Imagen.sample that carry arrays (traced); everything else is
    # static and becomes part of the jit-cache key. Any other array-valued
    # kwarg (text_embeds, text_mask, ...) is detected by type below — an
    # array must never land in the hashable cache key.
    _SAMPLE_ARRAY_KWARGS = (
        "start_image_or_video", "cond_images", "inpaint_images",
        "inpaint_masks", "init_images", "text_embeds", "text_mask",
    )

    def _call_imagen_sample(self, params, key, batch_size: int, kwargs):
        """Jit-cached ``Imagen.sample`` call.

        ``Imagen.sample`` builds its ``lax.scan`` sampler from fresh closures
        every call; executed eagerly, XLA's executable cache misses and the
        20-step loop recompiles per call (~2 min/volume-chunk on the tunnel
        — measured 495 s vs 42 s for a 192^3 volume). Wrapping the call in a
        ``jax.jit`` keyed on the static kwargs compiles once per
        (flags, shapes) combination, the same way the reference's torch
        sampler reuses its CUDA graphs across ``test.py`` windows."""
        arrays = {
            k: v for k, v in kwargs.items()
            if v is not None and (
                k in self._SAMPLE_ARRAY_KWARGS
                or isinstance(v, (jax.Array, np.ndarray))
            )
        }
        static = {k: v for k, v in kwargs.items() if k not in arrays}
        static = {k: tuple(v) if isinstance(v, list) else v
                  for k, v in static.items()}
        cache_key = (batch_size, tuple(sorted(static.items(), key=str)))
        fn = self._sample_fns.get(cache_key)
        if fn is None:
            def raw(params, key, arrays):
                return self.imagen.sample(
                    params, key, batch_size=batch_size, **static, **arrays
                )

            if (self.is_elucidated
                    and getattr(self.imagen, "max_steps_per_launch", None)):
                # the EDM sampler segments its Heun loop into capped device
                # launches internally (the axon runtime kills launches
                # longer than a few seconds); an outer jit would fuse it
                # all back into one launch, so orchestrate eagerly — the
                # segment programs are jit-cached inside one_unet_sample
                fn = raw
            else:
                fn = jax.jit(raw)
            self._sample_fns[cache_key] = fn
        return fn(params, key, arrays)

    @classmethod
    def _map_array_kwargs(cls, kwargs, fn):
        """Apply ``fn`` to every batch-major array-valued sample kwarg.

        The reference splits ALL tensor kwargs when chunking
        (``split_args_and_kwargs``, reference trainer.py:176-197) — not just
        the start images. Array kwargs may be pytrees (``init_images`` is a
        per-unet list); every leaf is batch-major."""
        out = dict(kwargs)
        for k, v in kwargs.items():
            if v is None:
                continue
            if (k in cls._SAMPLE_ARRAY_KWARGS
                    or isinstance(v, (jax.Array, np.ndarray))):
                out[k] = jax.tree_util.tree_map(fn, v)
        return out

    def _put_valid_batch(self, hr, lr_img):
        """Place one validation batch onto the mesh.

        Shards over the 'data' axis whenever the batch splits into whole
        sub-volume groups per data shard — replication makes every device
        recompute the FULL validation batch and requires it to fit in one
        device's HBM, neither of which scales (reference evaluates
        validation on the rank-0 GPU only, trainer.py:685-765; the
        TPU-native equivalent is DP-sharding the batch). Falls back to
        replication on ragged batches. Multi-process safe: every process
        sees the same deterministic batch (fixed-seed contract), so each
        device's shard is sliced locally via ``make_array_from_callback``
        with no cross-host transfer. Returns ``(hr, lr_img, sharded)``."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = self.mesh.shape.get("data", 1)
        group = self._sample_group_size()
        b = int(hr.shape[0])
        sharded = data > 1 and b % (data * group) == 0
        spec = P("data") if sharded else P()
        placed = []
        for a in (hr, lr_img):
            host = np.asarray(a)
            sh = NamedSharding(self.mesh, spec)
            placed.append(jax.make_array_from_callback(
                host.shape, sh, lambda idx, h=host: h[idx]))
        return placed[0], placed[1], sharded

    def _mesh_sample(self, params, key, batch_size: int, kwargs):
        """Shard one sampling call's patch batch over the mesh 'data' axis.

        Sampling is embarrassingly parallel over patches (the TPU-native
        equivalent of running the reference's ``test.py`` loop on N GPUs);
        the batch is padded by group repetition so it shards evenly, then
        the padding is sliced off. Numerically identical to single-device
        sampling (tests/test_sample_mesh.py)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = self.mesh.shape.get("data", 1)
        group = self._sample_group_size()
        # round UP: a ragged chunk (e.g. the remainder of max_batch_size
        # slicing) must still be fully covered by whole groups
        pad_groups = -(-batch_size // group)
        while (pad_groups * group) % data:
            pad_groups += 1
        padded = pad_groups * group
        assert padded >= batch_size

        if padded != batch_size:
            # pad EVERY batch-major array kwarg (text_embeds, cond_images,
            # ...) by group repetition, not just the start images
            reps = -(-padded // batch_size)
            kwargs = self._map_array_kwargs(
                kwargs,
                lambda a: jnp.concatenate([a] * reps, axis=0)[:padded],
            )
        b_shard = NamedSharding(self.mesh, P("data"))
        sub_kwargs = dict(kwargs)
        if jax.process_count() > 1:
            # device_put of a host-local array onto a process-spanning mesh
            # is invalid. Every process computes the SAME full batch (the
            # deterministic loader contract, reference trainer.py:256), so
            # each contributes its slice and the global batch is assembled
            # without cross-host transfers; the key is replicated the same
            # way so the jit sees only global inputs.
            from diffusioniqt_tpu.parallel.multihost import local_batch_slice

            sl = local_batch_slice(padded)
            sub_kwargs = self._map_array_kwargs(
                sub_kwargs,
                lambda a: jax.make_array_from_process_local_data(
                    b_shard, np.asarray(a)[sl]),
            )
            rep = NamedSharding(self.mesh, P())
            key = jax.make_array_from_process_local_data(
                rep, np.asarray(key))
        else:
            start = sub_kwargs.get("start_image_or_video", None)
            if start is not None:
                sub_kwargs["start_image_or_video"] = jax.device_put(
                    start, b_shard)
        with self.mesh:
            out = self._call_imagen_sample(params, key, padded, sub_kwargs)
        if jax.process_count() > 1:
            # the data-sharded output is not fully addressable on any one
            # process; callers slice and np.asarray it eagerly, so gather
            # every process's shard back to all hosts (inference-scale only)
            from jax.experimental import multihost_utils

            out = jax.tree_util.tree_map(
                lambda o: multihost_utils.process_allgather(o, tiled=True),
                out,
            )
        if padded == batch_size:
            return out
        return self._map_sample_outputs(
            out, kwargs,
            batch_fn=lambda o: o[:batch_size],
            step_fn=lambda o: o[:, :batch_size],  # trajectories are (T, B, ...)
        )

    @staticmethod
    def _map_sample_outputs(out, kwargs, *, batch_fn, step_fn):
        """Apply ``batch_fn`` to batch-major sample outputs and ``step_fn``
        to step-major ``(T, B, ...)`` trajectories, following the return
        structure of ``Imagen.sample`` for the given kwargs flags."""
        if kwargs.get("return_trajectory", False):
            head, noisy_traj, x0_traj = out
            if kwargs.get("return_all_outputs", False):
                head = [batch_fn(o) for o in head]
            else:
                head = batch_fn(head)
            return head, step_fn(noisy_traj), step_fn(x0_traj)
        if kwargs.get("return_all_outputs", False):
            return [batch_fn(o) for o in out]
        return batch_fn(out)

    def sample(self, *, batch_size: int = 1,
               max_batch_size: Optional[int] = None,
               use_non_ema: bool = False, **kwargs):
        """EMA sampling, chunked by max_batch_size (reference trainer.sample,
        :1083-1097 + ``imagen_sample_in_chunks`` :201-219). Accepts both the
        3D (``return_all_outputs``) and trainer (``return_all_unet_outputs``)
        kwarg spellings (SURVEY.md §1 API-drift fix). With a mesh, the patch
        batch is sharded over the 'data' axis (multi-chip full-volume
        inference — the v5e-8 volumes/hour path, BASELINE.md)."""
        if not self.prepared:
            self.prepare()
        if "return_all_unet_outputs" in kwargs:
            kwargs["return_all_outputs"] = kwargs.pop("return_all_unet_outputs")
        kwargs.pop("return_pil_images", None)
        params = self._sampling_params(use_ema=not use_non_ema)
        key = kwargs.pop("key", None)
        if key is None:
            key = self._next_key()

        group = self._sample_group_size()
        if max_batch_size is not None and group > 1:
            # a chunk boundary inside a 27-sub-volume batch_sample group
            # would merge sub-volumes of different volumes for attention /
            # halo context — align chunks to whole groups (floor, min 1)
            max_batch_size = max(max_batch_size // group, 1) * group
        if max_batch_size is None or batch_size <= max_batch_size:
            if self.mesh is not None:
                return self._mesh_sample(params, key, batch_size, kwargs)
            return self._call_imagen_sample(params, key, batch_size, kwargs)

        # chunked sampling — every batch-major array kwarg is sliced per
        # chunk (reference ``split_args_and_kwargs``, trainer.py:176-197)
        chunks = -(-batch_size // max_batch_size)
        outs = []
        for i in range(chunks):
            sl = slice(i * max_batch_size, min((i + 1) * max_batch_size, batch_size))
            sub_kwargs = self._map_array_kwargs(kwargs, lambda a: a[sl])
            key, sub = jax.random.split(key)
            if self.mesh is not None:
                outs.append(
                    self._mesh_sample(params, sub, sl.stop - sl.start, sub_kwargs)
                )
            else:
                outs.append(
                    self._call_imagen_sample(
                        params, sub, sl.stop - sl.start, sub_kwargs
                    )
                )
        if kwargs.get("return_trajectory", False):
            heads = [o[0] for o in outs]
            if kwargs.get("return_all_outputs", False):
                head = [jnp.concatenate(p, axis=0) for p in zip(*heads)]
            else:
                head = jnp.concatenate(heads, axis=0)
            # trajectories are step-major (T, B, ...): concat on batch axis 1
            return (
                head,
                jnp.concatenate([o[1] for o in outs], axis=1),
                jnp.concatenate([o[2] for o in outs], axis=1),
            )
        if isinstance(outs[0], (list, tuple)):
            return [jnp.concatenate(parts, axis=0) for parts in zip(*outs)]
        return jnp.concatenate(outs, axis=0)

    # ------------------------------------------------------------------
    # checkpointing (reference :767-945)
    def _state_tree(self) -> Dict[str, Any]:
        # the PRNG key is part of trainer state: resume must reproduce the
        # noise/time sampling stream (the torch reference loses its stream
        # on resume — fixed here by design)
        tree: Dict[str, Any] = {
            "steps": np.asarray(self.steps),
            "key": np.asarray(self._key),
        }
        for i in range(self.num_unets):
            entry = {
                "params": self.params[i],
                "opt_state": self.opt_states[i],
            }
            if self.use_ema and self.ema_states[i] is not None:
                entry["ema"] = {
                    "params": self.ema_states[i].params,
                    "step": self.ema_states[i].step,
                }
            tree[f"unet{i}"] = entry
        return tree

    @staticmethod
    def _is_url(path: str) -> bool:
        """fsspec-style URL (gs://, s3://, memory://, ...) — the reference
        routes these through fsspec (trainer.py:99-110, 274-280)."""
        import re

        return bool(re.match(r"^[a-z0-9]+://", path))

    def _host_state_tree(self) -> Dict[str, Any]:
        """State tree with every leaf materialisable on this process.

        On a multi-host mesh params/opt/EMA are global (mesh-spanning)
        jax.Arrays that a single process cannot serialise: fully-replicated
        leaves (the DP case) read their local copy; process-sharded leaves
        are allgathered. COLLECTIVE when any leaf needs the allgather —
        every process must call ``save`` together on multi-host runs."""
        tree = self._state_tree()
        if jax.process_count() <= 1:
            return tree
        from jax.experimental import multihost_utils

        def to_host(leaf):
            if not isinstance(leaf, jax.Array):
                return leaf
            if leaf.is_fully_addressable or leaf.is_fully_replicated:
                # includes host-local arrays (EMA step, optimizer counts):
                # orbax rejects single-device jax.Arrays in multi-host
                # saves, numpy round-trips them as replicated host values
                return np.asarray(leaf)
            return np.asarray(
                multihost_utils.process_allgather(leaf, tiled=True))

        return jax.tree_util.tree_map(to_host, tree)

    def save(self, path: str):
        """Save a full trainer bundle (model + optimizer + EMA + steps).

        Local paths use orbax; fsspec URLs (gs://, memory://, ...) are
        written as one msgpack blob via fsspec, matching the reference's
        cloud-checkpoint capability (trainer.py:274-280).

        Multi-host: collective — call from EVERY process (the state
        gather may involve collectives); only the main process writes,
        and a barrier keeps the others from racing ahead
        (the reference's wait_for_everyone-then-save, trainer.py:813-820)."""
        assert self.prepared, "nothing to save — trainer not prepared"
        multihost = jax.process_count() > 1
        tree = self._host_state_tree()
        main = jax.process_index() == 0
        if self._is_url(path):
            if main:
                import fsspec
                from flax import serialization

                fs, _ = fsspec.core.url_to_fs(path)
                parent = path.rsplit("/", 1)[0]
                try:
                    fs.makedirs(fs._strip_protocol(parent), exist_ok=True)
                except Exception:
                    pass  # bucket-less filesystems (memory://) need no mkdir
                with fsspec.open(path, "wb") as fh:
                    fh.write(serialization.to_bytes(tree))
            if multihost:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(
                    "diffusioniqt_trainer_save")
            return
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        if main and os.path.exists(path):
            shutil.rmtree(path)
        if multihost:
            # orbax's Checkpointer.save is itself collective (it runs
            # save_start/save_end barriers across processes) — EVERY
            # process must enter it; orbax writes from the primary and
            # non-primary processes only participate in the barriers
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(
                "diffusioniqt_trainer_save_pre")
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, tree)

    def load(self, path: str, strict: bool = True, noop_if_not_exist: bool = False):
        if self._is_url(path):
            import fsspec
            from flax import serialization

            fs, fpath = fsspec.core.url_to_fs(path)
            if not fs.exists(fpath):
                if noop_if_not_exist:
                    return
                raise FileNotFoundError(path)
            if not self.prepared:
                self.prepare()
            with fsspec.open(path, "rb") as fh:
                data = fh.read()
            try:
                restored = serialization.from_bytes(self._state_tree(), data)
            except Exception:
                if strict:
                    raise
                from diffusioniqt_tpu.utils.checkpoints import restore_parts

                raw = serialization.msgpack_restore(data)
                restored = restore_parts(self._state_tree(), raw)
            self._restore_state(restored)
            return
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        if not os.path.exists(path):
            if noop_if_not_exist:
                return
            raise FileNotFoundError(path)
        if not self.prepared:
            self.prepare()
        try:
            with ocp.PyTreeCheckpointer() as ckptr:
                item = self._state_tree()
                # explicit restore_args from the PREPARED state: every leaf
                # restores onto the current backend's sharding. Without
                # this, orbax falls back to the sharding recorded in the
                # checkpoint file, which is None/invalid when restoring on
                # a different topology (e.g. CPU inference from a
                # TPU-trained checkpoint) and raises.
                restore_args = ocp.checkpoint_utils.construct_restore_args(
                    item)
                restored = ckptr.restore(path, item=item,
                                         restore_args=restore_args)
        except Exception:
            if strict:
                raise
            # partial restore: keep current leaves where the checkpoint
            # mismatches (reference restore_parts, trainer.py:222-233)
            from diffusioniqt_tpu.utils.checkpoints import restore_parts

            with ocp.PyTreeCheckpointer() as ckptr:
                raw = ckptr.restore(path)
            restored = restore_parts(self._state_tree(), raw)
        self._restore_state(restored)

    def _restore_state(self, restored) -> None:
        self.steps = [int(s) for s in np.asarray(restored["steps"])]
        if "key" in restored:  # absent in pre-round-3 checkpoints
            self._key = jnp.asarray(restored["key"], jnp.uint32)

        from jax.sharding import NamedSharding

        def place_like(cur, new):
            # checkpoints round-trip as host arrays; re-place each leaf with
            # the prepared leaf's MESH sharding so resume keeps its SPMD
            # layout. Leaves the prepared state holds uncommitted (e.g.
            # optimizer step counts from an eager tx.init) come back as
            # host arrays — orbax restores them committed to device 0,
            # which would poison the train-step jit with a mixed device
            # set. Multi-host assumes trainer state is replicated across
            # processes (DP; every process restores the same bundle) —
            # cross-process TP-sharded state is not resumable from a bundle.
            if self.mesh is None or not isinstance(cur, jax.Array):
                return new
            if isinstance(new, jax.Array) and not new.is_fully_addressable:
                return new  # already a placed global array (restore_parts)
            if not isinstance(cur.sharding, NamedSharding):
                return np.asarray(new)  # uncommitted; jit places it
            a = np.asarray(new)
            if jax.process_count() > 1:
                return jax.make_array_from_process_local_data(
                    cur.sharding, a, a.shape)
            return jax.device_put(a, cur.sharding)

        for i in range(self.num_unets):
            entry = restored[f"unet{i}"]
            self.params[i] = jax.tree_util.tree_map(
                place_like, self.params[i], entry["params"])
            self.opt_states[i] = jax.tree_util.tree_map(
                place_like, self.opt_states[i], entry["opt_state"])
            if self.use_ema and "ema" in entry:
                ema_params = entry["ema"]["params"]
                if self.ema_states[i] is not None:
                    ema_params = jax.tree_util.tree_map(
                        place_like, self.ema_states[i].params, ema_params)
                self.ema_states[i] = EMAState(
                    params=ema_params, step=entry["ema"]["step"]
                )

    # rolling checkpoint folder (reference :767-809); local dirs or fsspec URLs
    @property
    def all_checkpoints_sorted(self) -> List[str]:
        if self.checkpoint_path is None:
            return []
        if self._is_url(self.checkpoint_path):
            import fsspec

            fs, fpath = fsspec.core.url_to_fs(self.checkpoint_path)
            scheme = self.checkpoint_path.split("://", 1)[0]
            entries = [
                f"{scheme}://{p}"
                for p in fs.ls(fpath, detail=False)
                if p.rsplit("/", 1)[-1].startswith("checkpoint.")
            ] if fs.exists(fpath) else []
        else:
            entries = [
                os.path.join(self.checkpoint_path, d)
                for d in os.listdir(self.checkpoint_path)
                if d.startswith("checkpoint.")
            ]
        return sorted(
            entries, key=lambda x: int(x.split(".")[-1]), reverse=True
        )

    def save_to_checkpoint_folder(self):
        is_url = self._is_url(self.checkpoint_path)
        total_steps = sum(self.steps)
        sep = "/" if is_url else os.sep
        path = f"{self.checkpoint_path.rstrip(sep)}{sep}checkpoint.{total_steps}"
        self.save(path)  # collective on multi-host; main process writes
        if jax.process_index() != 0:
            return
        if self.max_checkpoints_keep > 0:
            for stale in self.all_checkpoints_sorted[self.max_checkpoints_keep:]:
                if self._is_url(stale):
                    import fsspec

                    fs, fpath = fsspec.core.url_to_fs(stale)
                    try:
                        fs.rm(fpath, recursive=True)
                    except Exception:
                        pass
                else:
                    shutil.rmtree(stale, ignore_errors=True)

    def load_from_checkpoint_folder(self, last_total_steps: int = -1):
        if last_total_steps != -1:
            sep = "/" if self._is_url(self.checkpoint_path) else os.sep
            self.load(
                f"{self.checkpoint_path.rstrip(sep)}{sep}"
                f"checkpoint.{last_total_steps}"
            )
            return
        ckpts = self.all_checkpoints_sorted
        if not ckpts:
            return
        self.load(ckpts[0])
