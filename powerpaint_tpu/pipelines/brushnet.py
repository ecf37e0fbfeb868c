"""ppt-v2 pipeline: BrushNet dual-branch inpainting with preserved cross-attn.

TPU-native counterpart of the reference
``StableDiffusionPowerPaintBrushNetPipeline``
(/root/reference/powerpaint/pipelines/pipeline_PowerPaint_Brushnet_CA.py:131-1497):

- TWO text encoders (asymmetric conditioning, :1252-1268): the BrushNet
  branch sees the fitting-degree-blended TASK-token embeddings
  (text_encoder_brushnet); the frozen base UNet sees the plain promptU;
- 5-channel conditioning latents = vae(masked image)*sf ++ mask/8
  (:1338-1345), where the mask channel is 1.0 on PRESERVED pixels (the
  reference derives it as ``(normalized mask).sum(1) < 0``, :1312 — i.e.
  dark pixels of the mask image);
- per step: one BrushNet forward (2B CFG batch, task embeds) -> 28 taps ->
  one base-UNet forward (2B, plain embeds) with per-block injection
  (:1383-1466), UniPC step;
- ``control_guidance_start/end`` step gating precomputed into a per-step
  conditioning-scale table (:1370-1376) — static, gathered inside the scan.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import PowerPaintConfig
from powerpaint_tpu.models.brushnet import BrushNetModel
from powerpaint_tpu.models.clip_text import CLIPTextModel
from powerpaint_tpu.models.unet import UNet2DConditionModel
from powerpaint_tpu.models.vae import AutoencoderKL
from powerpaint_tpu.schedulers import unipc
from powerpaint_tpu.tasks.preprocess import to_numpy_image, to_numpy_mask
from powerpaint_tpu.text.prompts import add_task, v2_prompt_suffix
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
class BrushNetPipeline(AotPipelineMixin, AsyncDispatchMixin, LoraMixin,
                       StepCallbackMixin):
    config: PowerPaintConfig
    params: dict  # unet, vae, brushnet, text_encoder (plain),
    #               text_encoder_brushnet (task tokens)
    tokenizer: TokenizerWrapper
    dtype: jnp.dtype = jnp.bfloat16
    # multi-chip serving (see pipelines/inpaint.py): batch over "data",
    # transformer weights over "model"
    mesh: "Optional[object]" = None
    # sequence-parallel mode for one huge canvas on a mesh: latent rows
    # sharded over "data", ring attention on long self-attention in BOTH
    # the base UNet and the BrushNet branch (see pipelines/inpaint.py)
    sequence_parallel: bool = False
    sp_min_seq: int = 2048

    def __post_init__(self):
        cfg = self.config
        assert cfg.brushnet is not None
        self.unet = UNet2DConditionModel(cfg.unet, dtype=self.dtype)
        self.brushnet = BrushNetModel(cfg.brushnet, dtype=self.dtype)
        self.vae = AutoencoderKL(cfg.vae, dtype=self.dtype)
        self.text_task = CLIPTextModel(cfg.text_encoder, dtype=self.dtype)
        self.text_plain = CLIPTextModel(
            cfg.text_encoder.replace(num_external_tokens=0), dtype=self.dtype
        )
        # optional CLIP image tower for ip_adapter_image (reference
        # encode_image, pipeline_PowerPaint_Brushnet_CA.py:629-654);
        # shared across adapters (one tower, per-adapter projections)
        self._encode_ip_image = None
        if cfg.image_encoder is not None and "image_encoder" in self.params:
            from powerpaint_tpu.models.clip_vision import (
                CLIPVisionModelWithProjection,
            )

            enc = CLIPVisionModelWithProjection(
                cfg.image_encoder, dtype=self.dtype
            )
            self._encode_ip_image = jax.jit(
                lambda p, x: enc.apply({"params": p}, x)
            )
        statics = ("num_steps", "out_mode", "guess_mode",
                   "branch_cache_interval", "clip_skip", "with_callback",
                   "custom_timesteps", "sampler")
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from powerpaint_tpu.parallel.mesh import DATA_AXIS, param_shardings

            p_shard = {
                k: param_shardings(self.mesh, v)
                for k, v in self.params.items()
            }
            self.params = jax.device_put(self.params, p_shard)
            batch = NamedSharding(self.mesh, P(DATA_AXIS))
            repl = NamedSharding(self.mesh, P())
            # args: params, ids_task, ids_plain, tradoff, tradoff_nag,
            #       image_u8, mask_u8, guidance, cond_scale_table, seeds,
            #       latents, pos_t_embeds, neg_t_embeds, ip_embeds, ip_scale
            if self.sequence_parallel:
                rows = NamedSharding(self.mesh, P(None, DATA_AXIS))
                self._generate = jax.jit(
                    self._generate_fn_sp, static_argnames=statics,
                    in_shardings=(p_shard, repl, repl, repl, repl, rows,
                                  rows, repl, repl, repl, None, None, None,
                                  None, None),
                    out_shardings=rows,
                )
            else:
                self._generate = jax.jit(
                    self._generate_fn, static_argnames=statics,
                    in_shardings=(p_shard, repl, repl, repl, repl, batch,
                                  batch, repl, repl, batch, None, None,
                                  None, None, None),
                    out_shardings=batch,
                )
        else:
            self._generate = jax.jit(
                self._generate_fn, static_argnames=statics
            )
        self._generate = AotDispatcher(self._generate, n_static_tail=8)
        # per-call step callback slot (see pipelines/inpaint.py)
        self._active_callback = None
        self._active_callback_steps = 1

    def _generate_fn_sp(
        self,
        params,
        ids_task: jnp.ndarray,
        ids_plain: jnp.ndarray,
        tradoff: jnp.ndarray,
        tradoff_nag: jnp.ndarray,
        image_u8: jnp.ndarray,
        mask_u8: jnp.ndarray,
        guidance_scale: jnp.ndarray,
        cond_scale_table: jnp.ndarray,
        seeds: jnp.ndarray,
        latents_in: Optional[jnp.ndarray],
        pos_t_in: Optional[jnp.ndarray],
        neg_t_in: Optional[jnp.ndarray],
        ip_embeds: Optional[jnp.ndarray],
        ip_scale: jnp.ndarray,
        num_steps: int,
        out_mode: str = "uint8",
        guess_mode: bool = False,
        branch_cache_interval: int = 1,
        clip_skip: int = 0,
        with_callback: bool = False,
        custom_timesteps=None,
        sampler: str = "unipc",
    ):
        """Sequence-parallel generate: same math as ``_generate_fn`` with
        ring attention enabled at trace time (see pipelines/inpaint.py)."""
        from powerpaint_tpu.ops.attention import ring_context

        with ring_context(self.mesh, min_seq=self.sp_min_seq):
            return self._generate_fn(
                params, ids_task, ids_plain, tradoff, tradoff_nag,
                image_u8, mask_u8, guidance_scale, cond_scale_table, seeds,
                latents_in, pos_t_in, neg_t_in, ip_embeds, ip_scale,
                num_steps, out_mode, guess_mode, branch_cache_interval,
                clip_skip, with_callback, custom_timesteps, sampler,
            )

    def _generate_fn(
        self,
        params,
        ids_task: jnp.ndarray,  # (P, 4, 77) [A, B, negA, negB] per prompt
        ids_plain: jnp.ndarray,  # (P, 2, 77) [U, negU] per prompt
        tradoff: jnp.ndarray,  # scalar or (P,)
        tradoff_nag: jnp.ndarray,  # scalar or (P,)
        image_u8: jnp.ndarray,  # (B, H, W, 3) uint8 (unmasked pixels)
        mask_u8: jnp.ndarray,  # (B, H, W, 1) uint8, 255 = hole
        guidance_scale: jnp.ndarray,  # scalar or (B,)
        cond_scale_table: jnp.ndarray,  # (S,) brushnet scale per step
        seeds: jnp.ndarray,  # (B,) int32 per-image noise seeds
        latents_in: Optional[jnp.ndarray],
        pos_t_in: Optional[jnp.ndarray],  # (B|1, 77, D) task-blend override
        neg_t_in: Optional[jnp.ndarray],
        ip_embeds: Optional[jnp.ndarray],  # (2B, ip_dim) [uncond | cond]
        ip_scale: jnp.ndarray,
        num_steps: int,
        out_mode: str = "uint8",
        guess_mode: bool = False,
        branch_cache_interval: int = 1,
        clip_skip: int = 0,
        with_callback: bool = False,
        custom_timesteps=None,
        sampler: str = "unipc",
    ):
        # device-side prep (uint8 boundary): pixel-space pre-mask
        # (app.py:342-345) and keep-mask channel
        hole = (mask_u8 >= 128).astype(jnp.float32)
        keep_mask = 1.0 - hole
        imgf = image_u8.astype(jnp.float32) * keep_mask
        masked_image = imgf / 127.5 - 1.0
        # the reference ships UniPC (app.py:197); any registry sampler is
        # accepted — notably "lcm" for LCM-LoRA-merged few-step sampling
        if sampler == "unipc":
            mod = unipc
            sched = unipc.make_unipc_schedule(
                self.config.scheduler, num_steps,
                custom_timesteps=custom_timesteps,
            )
        else:
            from powerpaint_tpu import schedulers as sched_registry

            mod, make = sched_registry.get(sampler)
            sched = make(self.config.scheduler, num_steps)
        b, h, w, _ = masked_image.shape  # noqa: E501
        h8, w8 = h // 8, w // 8

        # --- text: task embeds (A/B blend) + plain embeds, P prompts ---
        if ids_task.ndim == 2:
            ids_task = ids_task[None]
        if ids_plain.ndim == 2:
            ids_plain = ids_plain[None]
        P = ids_task.shape[0]
        emb_task = self.text_task.apply(
            {"params": params["text_encoder_brushnet"]},
            ids_task.reshape(P * 4, ids_task.shape[-1]),
        ).reshape(P, 4, ids_task.shape[-1], -1)
        t = jnp.reshape(tradoff, (-1, 1, 1))
        tn = jnp.reshape(tradoff_nag, (-1, 1, 1))
        pos_t = emb_task[:, 0] * t + (1.0 - t) * emb_task[:, 1]
        neg_t = emb_task[:, 2] * tn + (1.0 - tn) * emb_task[:, 3]
        # precomputed-embedding passthrough: the reference's prompt_embeds/
        # negative_prompt_embeds feed THIS (task-blended) pair
        # (pipeline_PowerPaint_Brushnet_CA.py:1252-1264); the unused encode
        # above becomes dead code XLA eliminates
        if pos_t_in is not None:
            pos_t = pos_t_in.astype(pos_t.dtype)
        if neg_t_in is not None:
            neg_t = neg_t_in.astype(neg_t.dtype)
        # clip_skip applies to the plain-U encoder (the reference's
        # encode_prompt surface, :452,537-553)
        emb_plain = self.text_plain.apply(
            {"params": params["text_encoder"]},
            ids_plain.reshape(P * 2, ids_plain.shape[-1]),
            clip_skip=clip_skip,
        ).reshape(P, 2, ids_plain.shape[-1], -1)
        eU, nU = emb_plain[:, 0], emb_plain[:, 1]
        if pos_t.shape[0] != b:  # single prompt, many images
            pos_t = jnp.repeat(pos_t, b // pos_t.shape[0], 0)
        if neg_t.shape[0] != b:
            neg_t = jnp.repeat(neg_t, b // neg_t.shape[0], 0)
        if P != b:
            eU = jnp.repeat(eU, b // P, 0)
            nU = jnp.repeat(nU, b // P, 0)
        cond_task = jnp.concatenate([neg_t, pos_t], axis=0)
        cond_plain = jnp.concatenate([nU, eU], axis=0)
        g_flat = jnp.reshape(guidance_scale, (-1,))
        guidance_scale = jnp.reshape(g_flat, (-1, 1, 1, 1))

        # --- per-image rng (see pipelines/inpaint.py) ---
        keys = jax.vmap(jax.random.PRNGKey)(seeds)
        k_noise = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
        k_vae = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        step_keys = None
        if getattr(mod, "stochastic", False):
            # per-image step-noise keys (lcm etc.) — fold index 4 reserved,
            # as in pipelines/inpaint.py
            step_keys = jax.vmap(lambda k: jax.random.fold_in(k, 4))(keys)

        # --- conditioning latents (5ch), CFG-doubled ---
        moments = self.vae.apply(
            {"params": params["vae"]}, masked_image, method="encode"
        )
        mean, logvar = moments
        std = jnp.exp(0.5 * logvar.astype(jnp.float32))
        vnoise = jax.vmap(
            lambda k: jax.random.normal(k, mean.shape[1:], jnp.float32)
        )(k_vae)
        cond_lat = (
            mean.astype(jnp.float32) + std * vnoise
        ) * self.config.vae.scaling_factor
        mask8 = jax.image.resize(keep_mask, (b, h8, w8, 1), method="nearest")
        cond5 = jnp.concatenate([cond_lat, mask8], axis=-1)
        cond5 = jnp.concatenate([cond5, cond5], axis=0)

        if latents_in is not None:
            latents = latents_in * sched.init_noise_sigma
        else:
            latents = jax.vmap(
                lambda k: jax.random.normal(k, (h8, w8, 4), jnp.float32)
            )(k_noise) * sched.init_noise_sigma

        # LCM guidance-scale embedding (reference :1352-1356): when the
        # UNet has a time_cond_proj_dim, condition every step on w-1
        timestep_cond = None
        if self.config.unet.time_cond_proj_dim:
            from powerpaint_tpu.models.layers import guidance_scale_embedding

            gb = (jnp.repeat(g_flat, b, 0) if g_flat.shape[0] == 1
                  else g_flat)
            w = jnp.concatenate([gb, gb], axis=0) - 1.0  # CFG-doubled
            timestep_cond = guidance_scale_embedding(
                w, self.config.unet.time_cond_proj_dim
            )

        def branch_taps(latents, i):
            lmi = jnp.concatenate([latents, latents], axis=0)
            lmi = mod.scale_model_input(sched, lmi, i)
            t = sched.timesteps[i]
            if guess_mode:
                # run the branch on the conditional half only; zero taps for
                # the uncond half (reference :1404-1427)
                down, mid, up = self.brushnet.apply(
                    {"params": params["brushnet"]},
                    mod.scale_model_input(sched, latents, i), t,
                    cond_task[b:], cond5[:b],
                    conditioning_scale=cond_scale_table[i], guess_mode=True,
                )
                pad = lambda x: jnp.concatenate(  # noqa: E731
                    [jnp.zeros_like(x), x], axis=0
                )
                down = tuple(pad(x) for x in down)
                mid = pad(mid)
                up = tuple(pad(x) for x in up)
            else:
                down, mid, up = self.brushnet.apply(
                    {"params": params["brushnet"]}, lmi, t, cond_task, cond5,
                    conditioning_scale=cond_scale_table[i],
                )
            return down, mid, up

        caching = branch_cache_interval > 1
        cache0 = None
        if caching:
            # BrushNet branch propagation (the encoder-propagation argument
            # of Faster Diffusion applied to the whole conditioning branch:
            # its 28 taps drift slowly between adjacent steps) — key steps
            # recompute, others reuse the carried taps
            shapes = jax.eval_shape(
                branch_taps,
                jax.ShapeDtypeStruct(latents.shape, latents.dtype),
                jnp.int32(0),
            )
            cache0 = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            )

        def body(carry, i):
            latents, state, cache = carry
            lmi = jnp.concatenate([latents, latents], axis=0)
            lmi = mod.scale_model_input(sched, lmi, i)
            t = sched.timesteps[i]
            if caching:
                key_step = (i % branch_cache_interval) == 0
                down, mid, up = jax.lax.cond(
                    key_step,
                    lambda: branch_taps(latents, i),
                    lambda: cache,
                )
                cache = (down, mid, up)
            else:
                down, mid, up = branch_taps(latents, i)
            eps = self.unet.apply(
                {"params": params["unet"]}, lmi, t, cond_plain,
                down_block_add_samples=down,
                mid_block_add_sample=mid,
                up_block_add_samples=up,
                image_embeds=ip_embeds,
                ip_scale=ip_scale,
                timestep_cond=timestep_cond,
            ).astype(jnp.float32)
            eps_u, eps_t = eps[:b], eps[b:]
            eps = eps_u + guidance_scale * (eps_t - eps_u)
            if with_callback:
                jax.debug.callback(self._run_step_callback, i, latents)
            if getattr(mod, "stochastic", False) and step_keys is not None:
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
            return (latents, state, cache), None

        state = mod.init_state(sched, latents.shape, latents.dtype)
        (latents, _, _), _ = jax.lax.scan(
            body, (latents, state, cache0), jnp.arange(sched.num_steps)
        )

        if out_mode == "latent":  # diffusers output_type="latent" contract
            return latents.astype(jnp.float32)
        image = self.vae.apply(
            {"params": params["vae"]},
            (latents / self.config.vae.scaling_factor).astype(self.dtype),
            method="decode",
        )
        if out_mode == "uint8":
            img01 = jnp.clip(image.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
            return jnp.round(img01 * 255.0).astype(jnp.uint8)
        return image.astype(jnp.float32)

    # ----------------------------------------------------------------- host

    def _encode_one_ip_image(self, image) -> np.ndarray:
        """CLIP-encode one IP-Adapter reference image (reference
        encode_image, :629-654): bicubic resize to the tower's input, CLIP
        normalize, projected embedding."""
        from PIL import Image as _Image

        from powerpaint_tpu.core.safety import _CLIP_MEAN, _CLIP_STD

        s = self.config.image_encoder.image_size
        pix = np.asarray(
            _Image.fromarray(to_numpy_image(image)).resize(
                (s, s), _Image.BICUBIC
            ),
            dtype=np.float32,
        )
        pix = (pix / 255.0 - _CLIP_MEAN) / _CLIP_STD
        return np.asarray(
            self._encode_ip_image(
                self.params["image_encoder"], jnp.asarray(pix[None])
            ),
            dtype=np.float32,
        )

    def __call__(
        self,
        image,
        mask,
        prompt: str = "",
        negative_prompt: str = "",
        task: str = "text-guided",
        fitting_degree: float = 1.0,
        num_inference_steps: int = 45,
        guidance_scale: float = 7.5,
        brushnet_conditioning_scale: float = 1.0,
        control_guidance_start: float = 0.0,
        control_guidance_end: float = 1.0,
        seed: int = 0,
        num_images_per_prompt: int = 1,
        guess_mode: bool = False,
        branch_cache_interval: int = 1,
        latents: Optional[np.ndarray] = None,
        ip_adapter_image: Optional[np.ndarray] = None,
        ip_adapter_image_embeds: Optional[np.ndarray] = None,
        ip_adapter_scale: float = 1.0,
        output_type: str = "uint8",
        clip_skip: int = 0,
        prompt_embeds: Optional[np.ndarray] = None,
        negative_prompt_embeds: Optional[np.ndarray] = None,
        callback=None,
        callback_steps: int = 1,
        height: Optional[int] = None,
        width: Optional[int] = None,
        timesteps=None,
        cross_attention_kwargs: Optional[dict] = None,
        scheduler: str = "unipc",
    ):
        """``ip_adapter_image_embeds``: raw CLIP image embeds, shape
        (ip_adapter_dim,) or (B, ip_adapter_dim) — the reference's
        ``ip_adapter_image_embeds`` surface
        (pipeline_PowerPaint_Brushnet_CA.py:689-706); the unconditional
        half is zeros exactly as the reference's ``encode_image``
        (:650-654). Requires params converted with io.convert
        ``convert_ip_adapter`` merged into the UNet tree.

        ``timesteps``: explicit descending timestep list (arbitrary
        spacing — reference :1265-1269 via retrieve_timesteps); overrides
        ``num_inference_steps``.  ``cross_attention_kwargs={"scale": s}``:
        per-call LoRA scale (reference :1240,1297)."""
        if cross_attention_kwargs:
            call_kw = {k: v for k, v in locals().items()
                       if k not in ("self", "cross_attention_kwargs")}
            return self._with_lora_scale(
                cross_attention_kwargs, lambda: self(**call_kw)
            )
        from powerpaint_tpu.core.validation import (
            InputValidationError,
            check_call_args,
            check_image_mask,
        )

        from powerpaint_tpu.core.validation import check_scheduler

        scheduler = scheduler.lower()
        # resolve + dry-build on the host: unknown names AND bad
        # name/step combinations (lcm steps > original grid) become 400s
        sched_mod = check_scheduler(
            scheduler, self.config.scheduler,
            num_inference_steps if timesteps is None else 1,
        )
        custom_ts = None
        if timesteps is not None:
            if scheduler != "unipc":
                raise InputValidationError(
                    "explicit timesteps= lists are only supported with the "
                    "unipc scheduler on the v2 pipeline"
                )
            from powerpaint_tpu.schedulers.common import (
                custom_timesteps_array,
            )

            try:
                custom_ts = tuple(
                    int(t) for t in
                    custom_timesteps_array(self.config.scheduler, timesteps)
                )
            except ValueError as e:
                raise InputValidationError(str(e)) from e
            num_inference_steps = len(custom_ts)
        check_output_type(output_type)
        from powerpaint_tpu.core.validation import check_clip_skip

        check_clip_skip(clip_skip,
                        self.config.text_encoder.num_hidden_layers)
        multi = isinstance(prompt, (list, tuple))
        if height is not None or width is not None:
            from powerpaint_tpu.pipelines.inpaint import InpaintPipeline

            image, mask = InpaintPipeline._apply_target_hw(
                image, mask, height, width, multi
            )
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
        for f, g in zip(fittings, guidances):
            check_call_args(
                task=task, num_inference_steps=num_inference_steps,
                guidance_scale=float(g), fitting_degree=float(f),
                control_guidance_start=control_guidance_start,
                control_guidance_end=control_guidance_end,
            )

        # v2 prompt routing (app.py:309-313 + add_task v2 branch)
        ids_task_rows, ids_plain_rows = [], []
        for pr, ng in zip(prompts, negatives):
            p = add_task(v2_prompt_suffix(pr, task), ng, task, "ppt-v2")
            ids_task_rows.append(self.tokenizer(
                [p.promptA, p.promptB, p.negative_promptA,
                 p.negative_promptB]
            ))
            ids_plain_rows.append(
                self.tokenizer([p.promptU, p.negative_promptU])
            )
        ids_task = np.stack(ids_task_rows)  # (P, 4, 77)
        ids_plain = np.stack(ids_plain_rows)  # (P, 2, 77)

        if self.sequence_parallel and self.mesh is not None:
            # every latent pyramid level must divide the mesh axis — see
            # pipelines/inpaint.py (same XLA:CPU padded-sharding hazard)
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
            mask_u8 = ((msk >= 0.5).astype(np.uint8) * 255)[None, ..., None]
            mask_b = np.tile(mask_u8, (n, 1, 1, 1))
        b = img_b.shape[0]

        # per-step gating table (reference :1370-1376)
        S = num_inference_steps
        keeps = np.array(
            [
                1.0
                - float(
                    i / S < control_guidance_start
                    or (i + 1) / S > control_guidance_end
                )
                for i in range(S)
            ],
            np.float32,
        )
        cond_scale_table = keeps * brushnet_conditioning_scale
        imap = getattr(sched_mod, "iteration_step_map", None)
        if imap is not None:
            # samplers with >1 model eval per user step (heun): expand the
            # per-user-step gating table onto the iteration axis
            cond_scale_table = cond_scale_table[imap(S)]

        if ip_adapter_image is not None:
            if ip_adapter_image_embeds is not None:
                from powerpaint_tpu.core.validation import (
                    InputValidationError,
                )

                raise InputValidationError(
                    "provide either ip_adapter_image or "
                    "ip_adapter_image_embeds, not both"  # reference :853
                )
            if self._encode_ip_image is None:
                from powerpaint_tpu.core.validation import (
                    InputValidationError,
                )

                raise InputValidationError(
                    "ip_adapter_image needs an image encoder: set "
                    "config.image_encoder and params['image_encoder']"
                )
            imgs = (list(ip_adapter_image)
                    if isinstance(ip_adapter_image, (list, tuple))
                    else [ip_adapter_image])
            ip_adapter_image_embeds = [
                self._encode_one_ip_image(im) for im in imgs
            ]
            if not isinstance(ip_adapter_image, (list, tuple)):
                ip_adapter_image_embeds = ip_adapter_image_embeds[0]

        ip_embeds = None
        if ip_adapter_image_embeds is not None:
            # one embedding per adapter (reference multi-IP-Adapter lists,
            # :658-675); single-adapter calls keep the bare-array form
            multi_ip = isinstance(ip_adapter_image_embeds, (list, tuple))
            embeds_list = (list(ip_adapter_image_embeds) if multi_ip
                           else [ip_adapter_image_embeds])

            def cfg_pair(e):
                e = np.asarray(e, np.float32)
                if e.ndim == 1:
                    e = e[None]
                if e.shape[0] == 1:
                    e = np.tile(e, (img_b.shape[0], 1))
                # CFG pair: unconditional half is zeros (reference :650-654)
                return jnp.asarray(
                    np.concatenate([np.zeros_like(e), e], axis=0)
                )

            pairs = [cfg_pair(e) for e in embeds_list]
            ip_embeds = tuple(pairs) if multi_ip else pairs[0]

        if isinstance(seed, (list, tuple)):
            seeds = np.asarray(seed, np.int32)
        else:
            seeds = (np.asarray(seed, np.int64)
                     + np.arange(b, dtype=np.int64)).astype(np.int32)
        assert seeds.shape == (b,), (seeds.shape, b)

        self._active_callback = callback
        self._active_callback_steps = max(1, int(callback_steps))

        out = self._generate(
            self.params,
            jnp.asarray(ids_task if multi else ids_task[0]),
            jnp.asarray(ids_plain if multi else ids_plain[0]),
            jnp.asarray(np.asarray(fittings, np.float32)
                        if multi else np.float32(fittings[0])),
            jnp.asarray(np.asarray(fittings, np.float32)
                        if multi else np.float32(fittings[0])),
            jnp.asarray(img_b),
            jnp.asarray(mask_b),
            jnp.asarray(np.asarray(guidances, np.float32)
                        if multi else np.float32(guidances[0])),
            jnp.asarray(cond_scale_table),
            jnp.asarray(seeds),
            None if latents is None else jnp.asarray(latents),
            norm_embeds(prompt_embeds),
            norm_embeds(negative_prompt_embeds),
            ip_embeds,
            (tuple(jnp.float32(s) for s in ip_adapter_scale)
             if isinstance(ip_adapter_scale, (list, tuple))
             else jnp.float32(ip_adapter_scale)),
            num_inference_steps,
            output_type,
            guess_mode,
            int(branch_cache_interval),
            int(clip_skip),
            callback is not None,
            custom_ts,
            scheduler,
        )
        return finish(out)
