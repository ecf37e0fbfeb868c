"""ppt-v1 pipeline: task-prompted SD-inpainting (9-channel UNet).

TPU-native counterpart of the reference ``StableDiffusionInpaintPipeline``
(/root/reference/powerpaint/pipelines/pipeline_PowerPaint.py:156-1071),
re-architected per SURVEY.md §7:

- ONE jit-compiled ``generate``: batched text encode (promptA/B + negatives
  as 4 rows of one CLIP forward, vs 4 sequential forwards in the reference),
  VAE encode, ``lax.scan`` denoise loop with CFG folded into the batch axis,
  VAE decode;
- A/B fitting-degree blend ``emb = A*t + (1-t)*B`` (pipeline_PowerPaint.py:423,499);
- 9-channel concat [latent, mask, masked_image_latents] per step (:996);
- strength<1 truncates the schedule and re-noises the init image (:713-720);
- 4-channel UNets additionally blend the known region each step (:1025-1035).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import PowerPaintConfig
from powerpaint_tpu.models.clip_text import CLIPTextModel
from powerpaint_tpu.models.unet import UNet2DConditionModel
from powerpaint_tpu.models.vae import AutoencoderKL
from powerpaint_tpu import schedulers as sched_registry
from powerpaint_tpu.schedulers import ddim
from powerpaint_tpu.text.prompts import TaskPrompts, add_task
from powerpaint_tpu.text.tokenizer import TokenizerWrapper


from powerpaint_tpu.io.aot import AotDispatcher, AotPipelineMixin
from powerpaint_tpu.pipelines.async_dispatch import AsyncDispatchMixin, finish
from powerpaint_tpu.pipelines.common import (
    StepCallbackMixin,
    check_output_type,
    norm_embeds,
)
from powerpaint_tpu.io.lora import LoraMixin


@dataclasses.dataclass
class InpaintPipeline(AotPipelineMixin, AsyncDispatchMixin, LoraMixin,
                      StepCallbackMixin):
    config: PowerPaintConfig
    params: dict  # {'unet': ..., 'vae': ..., 'text_encoder': ...}
    tokenizer: TokenizerWrapper
    dtype: jnp.dtype = jnp.bfloat16
    # multi-chip serving: shard the image batch over the mesh's "data" axis
    # and transformer weights over "model" (parallel/mesh.py rules).
    # num_images_per_prompt should be a multiple of the data-axis size.
    mesh: "Optional[object]" = None
    # optional per-step host callback (i, latents) -> None, invoked through
    # jax.debug.callback (the reference's `callback` arg,
    # pipeline_PowerPaint.py:1039; off by default per SURVEY.md §7).
    # Set at construction — it is baked into the compiled program.
    step_callback: "Optional[object]" = None
    # sequence-parallel (context-parallel) mode for ONE huge canvas on a
    # mesh (SURVEY.md §5.7: 4x outpaint -> 2048px -> 65k latent tokens):
    # instead of sharding the batch, shard latent ROWS over the data axis;
    # GSPMD handles convs/GroupNorm (halo exchange / cross-shard psums)
    # and self-attention with >= sp_min_seq tokens rides the ring-attention
    # kernel (ops/ring_attention.py) via ops.attention.ring_context.
    sequence_parallel: bool = False
    sp_min_seq: int = 2048

    def __post_init__(self):
        cfg = self.config
        self.unet = UNet2DConditionModel(cfg.unet, dtype=self.dtype)
        self.vae = AutoencoderKL(cfg.vae, dtype=self.dtype)
        self.text_encoder = CLIPTextModel(cfg.text_encoder, dtype=self.dtype)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from powerpaint_tpu.parallel.mesh import (
                DATA_AXIS,
                param_shardings,
            )

            p_shard = {
                k: param_shardings(self.mesh, v)
                for k, v in self.params.items()
            }
            self.params = jax.device_put(self.params, p_shard)
            batch = NamedSharding(self.mesh, P(DATA_AXIS))
            repl = NamedSharding(self.mesh, P())
            statics = ("num_steps", "strength_steps", "out_mode", "eta",
                       "sampler", "encoder_cache_interval", "clip_skip",
                       "with_callback")
            if self.sequence_parallel:
                # latent ROWS over the data axis; batch stays whole
                rows = NamedSharding(self.mesh, P(None, DATA_AXIS))
                self._generate = jax.jit(
                    self._generate_fn_sp,
                    static_argnames=statics,
                    in_shardings=(p_shard, repl, repl, repl, rows, rows,
                                  repl, repl, None, None, None),
                    out_shardings=rows,
                )
            else:
                # args: params, ids, tradoff, tradoff_nag, image_u8,
                #       mask_u8, guidance, seeds, latents, pos_embeds,
                #       neg_embeds
                self._generate = jax.jit(
                    self._generate_fn,
                    static_argnames=statics,
                    in_shardings=(p_shard, repl, repl, repl, batch, batch,
                                  repl, batch, None, None, None),
                    out_shardings=batch,
                )
        else:
            self._generate = jax.jit(
                self._generate_fn,
                static_argnames=("num_steps", "strength_steps", "out_mode",
                                 "eta", "sampler", "encoder_cache_interval",
                                 "clip_skip", "with_callback"),
            )
        self._generate = AotDispatcher(self._generate, n_static_tail=8)
        # per-call step callback slot (read at RUNTIME by the traced
        # trampoline — swapping it never retraces)
        self._active_callback = self.step_callback
        self._active_callback_steps = 1

    # ------------------------------------------------------------------ jit

    def _encode_text(self, params, ids, clip_skip: int = 0):
        return self.text_encoder.apply({"params": params}, ids,
                                       clip_skip=clip_skip)

    def _denoise_loop(
        self,
        params,
        mod,  # scheduler module (schedulers registry interface)
        sched,
        latents: jnp.ndarray,  # (B, h, w, 4)
        mask_lat: jnp.ndarray,  # (2B, h, w, 1) CFG-doubled
        masked_lat: jnp.ndarray,  # (2B, h, w, 4)
        cond: jnp.ndarray,  # (2B, 77, 768) [neg; pos]
        guidance_scale: jnp.ndarray,
        *,
        image_latents: Optional[jnp.ndarray] = None,
        known_mask: Optional[jnp.ndarray] = None,
        noise: Optional[jnp.ndarray] = None,
        eta: float = 0.0,
        eta_rng: Optional[jax.Array] = None,
        step_keys: Optional[jax.Array] = None,
        encoder_cache_interval: int = 1,
        with_callback: bool = False,
    ) -> jnp.ndarray:
        unet_params = params["unet"]
        is_9ch = self.config.unet.in_channels == 9
        b = latents.shape[0]

        def unet_in(latents, i):
            lmi = jnp.concatenate([latents, latents], axis=0)
            lmi = mod.scale_model_input(sched, lmi, i)
            if is_9ch:
                lmi = jnp.concatenate([lmi, mask_lat, masked_lat], axis=-1)
            return lmi

        def full_fwd(lmi, t):
            return self.unet.apply(
                {"params": unet_params}, lmi, t, cond,
                emit_encoder_cache=True,
            )

        caching = encoder_cache_interval > 1
        cache0 = None
        if caching:
            # encoder propagation (Faster Diffusion, arXiv 2312.09608):
            # zero-init carry; step 0 is always a key step and overwrites it
            lmi0 = unet_in(latents, jnp.int32(0))
            shapes = jax.eval_shape(
                full_fwd,
                jax.ShapeDtypeStruct(lmi0.shape, lmi0.dtype),
                jnp.int32(0),
            )[1]
            cache0 = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            )

        def eps_at(latents, i, cache):
            lmi = unet_in(latents, i)
            t = sched.timesteps[i]
            if not caching:
                eps = self.unet.apply(
                    {"params": unet_params}, lmi, t, cond
                )
                return eps, cache
            key_step = (i % encoder_cache_interval) == 0
            return jax.lax.cond(
                key_step,
                lambda: full_fwd(lmi, t),
                lambda: (
                    self.unet.apply(
                        {"params": unet_params}, lmi, t, cond,
                        encoder_cache=cache,
                    ),
                    cache,
                ),
            )

        def body(carry, i):
            latents, state, cache = carry
            eps, cache = eps_at(latents, i, cache)
            eps = eps.astype(jnp.float32)
            eps_u, eps_t = eps[:b], eps[b:]
            eps = eps_u + guidance_scale * (eps_t - eps_u)
            if with_callback:
                jax.debug.callback(self._run_step_callback, i, latents)
            if mod is ddim and eta > 0.0 and eta_rng is not None:
                step_noise = jax.random.normal(
                    jax.random.fold_in(eta_rng, i), latents.shape, jnp.float32
                )
                latents, state = ddim.step(
                    sched, state, eps, i, latents, eta=eta, noise=step_noise
                )
            elif getattr(mod, "stochastic", False) and step_keys is not None:
                # ancestral/SDE/LCM step noise: per-image threefry keys so
                # batched requests reproduce standalone runs bit-exactly
                step_noise = jax.vmap(
                    lambda k: jax.random.normal(
                        jax.random.fold_in(k, i), latents.shape[1:],
                        jnp.float32,
                    )
                )(step_keys)
                latents, state = mod.step(
                    sched, state, eps, i, latents, noise=step_noise
                )
            else:
                latents, state = mod.step(sched, state, eps, i, latents)
            if not is_9ch and image_latents is not None:
                # blend known region with re-noised image latents (:1025-1035)
                # — in the sampler's own latent space (VP for ddim/pndm/
                # unipc/dpm, unscaled-sigma for euler)
                init_proper = jnp.where(
                    i < sched.num_steps - 1,
                    mod.add_noise_at(sched, image_latents, noise, i + 1),
                    image_latents,
                )
                m = known_mask[:b]
                latents = (1.0 - m) * init_proper + m * latents
            return (latents, state, cache), None

        state = mod.init_state(sched, latents.shape, latents.dtype)
        (latents, _, _), _ = jax.lax.scan(
            body, (latents, state, cache0), jnp.arange(sched.num_steps)
        )
        return latents

    def _generate_fn_sp(
        self,
        params,
        ids: jnp.ndarray,
        tradoff: jnp.ndarray,
        tradoff_nag: jnp.ndarray,
        image_u8: jnp.ndarray,
        mask_u8: jnp.ndarray,
        guidance_scale: jnp.ndarray,
        seeds: jnp.ndarray,
        latents_in: Optional[jnp.ndarray],
        pos_embeds_in: Optional[jnp.ndarray],
        neg_embeds_in: Optional[jnp.ndarray],
        num_steps: int,
        strength_steps: int,
        out_mode: str = "uint8",
        eta: float = 0.0,
        sampler: str = "ddim",
        encoder_cache_interval: int = 1,
        clip_skip: int = 0,
        with_callback: bool = False,
    ):
        """Sequence-parallel generate: same math as ``_generate_fn``, with
        ring attention enabled for long self-attention at trace time."""
        from powerpaint_tpu.ops.attention import ring_context

        with ring_context(self.mesh, min_seq=self.sp_min_seq):
            return self._generate_fn(
                params, ids, tradoff, tradoff_nag, image_u8, mask_u8,
                guidance_scale, seeds, latents_in, pos_embeds_in,
                neg_embeds_in, num_steps, strength_steps, out_mode, eta,
                sampler, encoder_cache_interval, clip_skip, with_callback,
            )

    def _generate_fn(
        self,
        params,
        ids: jnp.ndarray,  # (P, 4, 77) [A, B, negA, negB] per prompt
        tradoff: jnp.ndarray,  # scalar or (P,)
        tradoff_nag: jnp.ndarray,  # scalar or (P,)
        image_u8: jnp.ndarray,  # (B, H, W, 3) uint8 — normalized ON DEVICE
        mask_u8: jnp.ndarray,  # (B, H, W, 1) uint8 {0, 255}
        guidance_scale: jnp.ndarray,  # scalar or (B,)
        seeds: jnp.ndarray,  # (B,) int32 — per-image noise seeds
        latents_in: Optional[jnp.ndarray],
        pos_embeds_in: Optional[jnp.ndarray],  # (B|1, 77, D) passthrough
        neg_embeds_in: Optional[jnp.ndarray],  # (B|1, 77, D) passthrough
        num_steps: int,
        strength_steps: int,
        out_mode: str = "uint8",
        eta: float = 0.0,
        sampler: str = "ddim",
        encoder_cache_interval: int = 1,
        clip_skip: int = 0,
        with_callback: bool = False,
    ):
        # uint8 at the host<->device boundary: 4x less transfer than fp32
        # and the masked image is derived on device instead of shipped
        init_image = image_u8.astype(jnp.float32) / 127.5 - 1.0
        mask = (mask_u8 >= 128).astype(jnp.float32)
        masked_image = init_image * (1.0 - mask)
        mod, make = sched_registry.get(sampler)
        # strength<1 truncates to the last `strength_steps` timesteps —
        # sampler-agnostic: each scheduler rebuilds its tables on the
        # truncated grid (reference get_timesteps, pipeline_PowerPaint.py:713-720)
        keep = strength_steps if strength_steps < num_steps else None
        sched = make(self.config.scheduler, num_steps, keep_steps=keep)
        b, h, w, _ = init_image.shape
        h8, w8 = h // 8, w // 8

        # --- text (P prompts batched as one 4P-row CLIP forward; P=1 for
        # single-prompt calls, P=B for micro-batched serving) ---
        if ids.ndim == 2:
            ids = ids[None]
        P = ids.shape[0]
        embeds = self._encode_text(
            params["text_encoder"], ids.reshape(P * 4, ids.shape[-1]),
            clip_skip,
        ).reshape(P, 4, ids.shape[-1], -1)
        t = jnp.reshape(tradoff, (-1, 1, 1))
        tn = jnp.reshape(tradoff_nag, (-1, 1, 1))
        pos = embeds[:, 0] * t + (1.0 - t) * embeds[:, 1]
        neg = embeds[:, 2] * tn + (1.0 - tn) * embeds[:, 3]
        # precomputed-embedding passthrough (reference prompt_embeds /
        # negative_prompt_embeds, pipeline_PowerPaint.py:742-743) — the
        # unused encode above becomes dead code XLA eliminates
        if pos_embeds_in is not None:
            pos = pos_embeds_in.astype(pos.dtype)
        if neg_embeds_in is not None:
            neg = neg_embeds_in.astype(neg.dtype)
        if pos.shape[0] != b:  # single prompt, many images
            pos = jnp.repeat(pos, b // pos.shape[0], 0)
        if neg.shape[0] != b:
            neg = jnp.repeat(neg, b // neg.shape[0], 0)
        cond = jnp.concatenate([neg, pos], axis=0)
        guidance_scale = jnp.reshape(guidance_scale, (-1, 1, 1, 1))

        # --- per-image rng: each image's noise depends only on ITS seed, so
        # a micro-batched request reproduces its standalone result ---
        keys = jax.vmap(jax.random.PRNGKey)(seeds)

        def img_keys(k):
            return (jax.random.fold_in(k, 0), jax.random.fold_in(k, 1),
                    jax.random.fold_in(k, 2))

        k_noise, k_vae, k_img = jax.vmap(img_keys)(keys)
        rng_eta = jax.random.PRNGKey(0)  # unused unless eta>0
        if eta > 0.0:
            rng_eta = jax.random.fold_in(keys[0], 3)
        step_keys = None
        if getattr(mod, "stochastic", False):
            # per-image noise stream for stochastic samplers (euler_a /
            # dpm_sde / lcm); fold index 4 is reserved for it (0-2: img
            # keys, 3: ddim eta)
            step_keys = jax.vmap(lambda k: jax.random.fold_in(k, 4))(keys)

        def vae_sample(images, ks):
            """Per-image-keyed VAE latent sampling (vs one batch key)."""
            moments = self.vae.apply(
                {"params": params["vae"]}, images, method="encode"
            )
            mean, logvar = moments
            std = jnp.exp(0.5 * logvar.astype(jnp.float32))
            noise = jax.vmap(
                lambda k: jax.random.normal(k, mean.shape[1:], jnp.float32)
            )(ks)
            z = mean.astype(jnp.float32) + std * noise
            return z * self.config.vae.scaling_factor

        masked_lat = vae_sample(masked_image, k_vae)
        mask_lat = jax.image.resize(mask, (b, h8, w8, 1), method="nearest")
        mask_lat2 = jnp.concatenate([mask_lat, mask_lat], axis=0)
        masked_lat2 = jnp.concatenate([masked_lat, masked_lat], axis=0)

        noise = jax.vmap(
            lambda k: jax.random.normal(k, (h8, w8, 4), jnp.float32)
        )(k_noise)
        image_latents = None
        if strength_steps < num_steps or self.config.unet.in_channels == 4:
            image_latents = vae_sample(init_image, k_img)
        if latents_in is not None:
            latents = latents_in * sched.init_noise_sigma
        elif strength_steps < num_steps:
            latents = mod.add_noise_at(sched, image_latents, noise, 0)
        else:
            latents = noise * sched.init_noise_sigma

        latents = self._denoise_loop(
            params, mod, sched, latents, mask_lat2, masked_lat2, cond,
            guidance_scale, image_latents=image_latents, known_mask=mask_lat,
            noise=noise, eta=eta, eta_rng=rng_eta, step_keys=step_keys,
            encoder_cache_interval=encoder_cache_interval,
            with_callback=with_callback,
        )

        if out_mode == "latent":
            # raw denoised latents, undecoded (diffusers output_type=
            # "latent" contract, pipeline_PowerPaint.py:1044-1055): feed
            # back via the latents= argument for chained refinement
            return latents.astype(jnp.float32)
        z = (latents / self.config.vae.scaling_factor).astype(self.dtype)
        if self.config.vae.asymmetric:
            # AsymmetricAutoencoderKL decode-with-condition (reference
            # pipeline_PowerPaint.py:1045-1051): the decoder sees the
            # original image + hole mask and reconstructs the known region
            # from its condition tower
            image = self.vae.apply(
                {"params": params["vae"]}, z, init_image, mask,
                method="decode_with_condition",
            )
        else:
            image = self.vae.apply(
                {"params": params["vae"]}, z, method="decode"
            )
        if out_mode == "uint8":
            img01 = jnp.clip(image.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
            return jnp.round(img01 * 255.0).astype(jnp.uint8)
        return image.astype(jnp.float32)

    # ----------------------------------------------------------------- host

    @staticmethod
    def _apply_target_hw(image, mask, height, width, multi):
        """Resolve the reference ``height``/``width`` call arguments: both
        must be given together; single-request form only (the batched
        serving form requires pre-sized inputs — shapes are the compile
        key)."""
        from powerpaint_tpu.core.validation import InputValidationError
        from powerpaint_tpu.tasks.preprocess import (
            resize_to,
            to_numpy_image,
            to_numpy_mask,
        )

        if height is None or width is None:
            raise InputValidationError(
                "height and width must be provided together"
            )
        if multi and isinstance(image, (list, tuple)):
            pairs = [
                resize_to(to_numpy_image(im), to_numpy_mask(m),
                          int(height), int(width))
                for im, m in zip(image, mask)
            ]
            return [p[0] for p in pairs], [p[1] for p in pairs]
        img, m = resize_to(
            to_numpy_image(image),
            None if mask is None else to_numpy_mask(mask),
            int(height), int(width),
        )
        return img, m

    def encode_task(self, prompts: TaskPrompts) -> np.ndarray:
        return self.tokenizer(
            [
                prompts.promptA,
                prompts.promptB,
                prompts.negative_promptA,
                prompts.negative_promptB,
            ]
        )

    def __call__(
        self,
        image,
        mask,
        prompt="",
        negative_prompt="",
        task: str = "text-guided",
        fitting_degree=1.0,
        num_inference_steps: int = 45,
        guidance_scale=7.5,
        strength: float = 1.0,
        eta: float = 0.0,
        scheduler: str = "ddim",
        seed=0,
        num_images_per_prompt: int = 1,
        latents: Optional[np.ndarray] = None,
        output_type: str = "uint8",
        encoder_cache_interval: int = 1,
        clip_skip: int = 0,
        prompt_embeds: Optional[np.ndarray] = None,
        negative_prompt_embeds: Optional[np.ndarray] = None,
        callback=None,
        callback_steps: int = 1,
        height: Optional[int] = None,
        width: Optional[int] = None,
        cross_attention_kwargs: Optional[dict] = None,
    ):
        """Full inpainting call (reference __call__ surface,
        pipeline_PowerPaint.py:978-1071 + app.py predict routing).

        Micro-batched serving form: ``image`` (B,H,W,3) / ``mask`` (B,H,W)
        stacks with ``prompt``/``negative_prompt``/``fitting_degree``/
        ``guidance_scale``/``seed`` as per-request lists — one jitted
        generate for B independent requests (serve/batcher.py).  Each
        image's noise depends only on its own seed, so batched results
        match standalone runs.

        ``cross_attention_kwargs={"scale": s}``: per-call LoRA scale
        (reference :748, threaded through text encode at :330,360-361)."""
        if cross_attention_kwargs:
            call_kw = {k: v for k, v in locals().items()
                       if k not in ("self", "cross_attention_kwargs")}
            return self._with_lora_scale(
                cross_attention_kwargs, lambda: self(**call_kw)
            )
        from powerpaint_tpu.core.validation import (
            check_call_args,
            check_image_mask,
        )
        from powerpaint_tpu.tasks.preprocess import to_numpy_image, to_numpy_mask

        multi = isinstance(prompt, (list, tuple))
        if height is not None or width is not None:
            # reference height/width call args (pipeline_PowerPaint.py:
            # 729-730): resize inputs to the exact target resolution
            image, mask = self._apply_target_hw(image, mask, height, width,
                                                multi)
        prompts = list(prompt) if multi else [prompt]
        negatives = (
            list(negative_prompt)
            if isinstance(negative_prompt, (list, tuple))
            else [negative_prompt] * len(prompts)
        )
        fittings = (
            list(fitting_degree)
            if isinstance(fitting_degree, (list, tuple))
            else [fitting_degree] * len(prompts)
        )
        guidances = (
            list(guidance_scale)
            if isinstance(guidance_scale, (list, tuple))
            else [guidance_scale] * len(prompts)
        )

        if self.sequence_parallel and self.mesh is not None:
            # every level of the latent pyramid must divide the mesh axis:
            # non-divisible levels make GSPMD pad shardings inside the
            # denoise scan, which XLA:CPU miscompiles (and which wastes
            # devices everywhere) — reject early with a clear message
            from powerpaint_tpu.core.validation import InputValidationError
            from powerpaint_tpu.parallel.mesh import DATA_AXIS

            n_axis = self.mesh.shape[DATA_AXIS]
            n_levels = len(self.config.unet.block_out_channels)
            h_img = np.asarray(image).shape[-3]
            deepest = (h_img // 8) >> (n_levels - 1)
            if deepest % n_axis != 0:
                raise InputValidationError(
                    f"sequence_parallel: image height {h_img} gives a "
                    f"deepest latent level of {deepest} rows, not divisible "
                    f"by the {n_axis}-way mesh axis; use a multiple of "
                    f"{8 * (1 << (n_levels - 1)) * n_axis}"
                )

        img0 = np.asarray(image)
        if multi and img0.ndim == 4:
            img_b = np.stack([to_numpy_image(im) for im in image])
            mask_b = np.stack([
                ((to_numpy_mask(m) >= 0.5).astype(np.uint8) * 255)[..., None]
                for m in mask
            ])
        else:
            img = to_numpy_image(image)
            msk = to_numpy_mask(mask)
            check_image_mask(img, msk)
            n = num_images_per_prompt if not multi else len(prompts)
            img_b = np.tile(img[None], (n, 1, 1, 1))
            mask_u8 = (msk >= 0.5).astype(np.uint8)[None, ..., None] * 255
            mask_b = np.tile(mask_u8, (n, 1, 1, 1))
        b = img_b.shape[0]

        for f, g in zip(fittings, guidances):
            check_call_args(
                task=task, num_inference_steps=num_inference_steps,
                guidance_scale=float(g), strength=strength,
                fitting_degree=float(f),
            )
        from powerpaint_tpu.core.validation import check_scheduler

        check_scheduler(scheduler, self.config.scheduler,
                        num_inference_steps)

        ids = np.stack([
            self.encode_task(add_task(p, n, task, "ppt-v1"))
            for p, n in zip(prompts, negatives)
        ])  # (P, 4, 77)

        if isinstance(seed, (list, tuple)):
            seeds = np.asarray(seed, np.int32)
        else:
            # one request, N images: per-image seeds derive from the base
            seeds = np.asarray(seed, np.int64) + np.arange(b, dtype=np.int64)
            seeds = seeds.astype(np.int32)
        assert seeds.shape == (b,), (seeds.shape, b)

        from powerpaint_tpu.core.metrics import GLOBAL as _telemetry

        strength_steps = min(
            int(num_inference_steps * strength), num_inference_steps
        )
        from powerpaint_tpu.core.validation import check_clip_skip

        check_output_type(output_type)
        check_clip_skip(clip_skip,
                        self.config.text_encoder.num_hidden_layers)

        # per-call callback (reference `callback`/`callback_steps`,
        # pipeline_PowerPaint.py:746,1039): observation-only — a host
        # trampoline reads the current callback at runtime, so only the
        # with/without-callback distinction recompiles (two variants max)
        self._active_callback = callback or self.step_callback
        self._active_callback_steps = max(1, int(callback_steps))
        with_cb = self._active_callback is not None

        _telemetry.reset_stages()
        with _telemetry.stage("generate"):
            out = self._generate(
                self.params,
                jnp.asarray(ids if multi else ids[0]),
                jnp.asarray(np.asarray(fittings, np.float32)
                            if multi else np.float32(fittings[0])),
                jnp.asarray(np.asarray(fittings, np.float32)
                            if multi else np.float32(fittings[0])),
                jnp.asarray(img_b),
                jnp.asarray(mask_b),
                jnp.asarray(np.asarray(guidances, np.float32)
                            if multi else np.float32(guidances[0])),
                jnp.asarray(seeds),
                None if latents is None else jnp.asarray(latents),
                norm_embeds(prompt_embeds),
                norm_embeds(negative_prompt_embeds),
                num_inference_steps,
                strength_steps,
                output_type,
                float(eta),
                scheduler,
                int(encoder_cache_interval),
                int(clip_skip),
                with_cb,
            )
            out = finish(out)
        _telemetry.count("images", out.shape[0])
        _telemetry.count("denoise_steps", strength_steps)
        return out
