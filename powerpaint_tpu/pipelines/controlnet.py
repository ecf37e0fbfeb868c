"""ppt-v1 + ControlNet pipeline (canny / depth / HED / pose conditioned).

TPU-native counterpart of the reference
``StableDiffusionControlNetInpaintPipeline``
(/root/reference/powerpaint/pipelines/pipeline_PowerPaint_ControlNet.py:225-1771):
per step one ControlNet forward (noisy 4-ch latent + control image) producing
12 down + 1 mid residuals added onto the base UNet's skip connections, plus
the v1 9-channel inpaint concat (:1686-1715).  Control image is [0,1]
(no normalization, :1564), CFG-doubled.  The no-control path is just
``pipelines.inpaint`` (reference ``predict_woControl``).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.models.controlnet import ControlNetModel
from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
from powerpaint_tpu.schedulers import ddim
from powerpaint_tpu.schedulers.common import make_schedule
from powerpaint_tpu.tasks.preprocess import to_numpy_image, to_numpy_mask
from powerpaint_tpu.text.prompts import add_task


@dataclasses.dataclass
class ControlNetPipeline(InpaintPipeline):
    """Extends the v1 pipeline with a ControlNet branch."""

    def __post_init__(self):
        super().__post_init__()
        assert self.config.controlnet is not None
        self.controlnet = ControlNetModel(
            self.config.controlnet, dtype=self.dtype
        )
        self._generate_cn = jax.jit(
            self._generate_cn_fn,
            static_argnames=("num_steps", "out_uint8", "guess_mode")
        )

    def _generate_cn_fn(
        self,
        params,
        ids: jnp.ndarray,  # (4, 77)
        tradoff: jnp.ndarray,
        tradoff_nag: jnp.ndarray,
        image_u8: jnp.ndarray,  # (B, H, W, 3) uint8
        mask_u8: jnp.ndarray,  # (B, H, W, 1) uint8, 255 = hole
        control_u8: jnp.ndarray,  # (B, H, W, 3) uint8 control map
        guidance_scale: jnp.ndarray,
        cond_scale_table: jnp.ndarray,  # (S,)
        rng: jax.Array,
        num_steps: int,
        out_uint8: bool = True,
        guess_mode: bool = False,
    ):
        init_image = image_u8.astype(jnp.float32) / 127.5 - 1.0
        mask = (mask_u8 >= 128).astype(jnp.float32)
        masked_image = init_image * (1.0 - mask)
        control_image = control_u8.astype(jnp.float32) / 255.0
        sched = make_schedule(self.config.scheduler, num_steps)
        b, h, w, _ = init_image.shape
        h8, w8 = h // 8, w // 8

        embeds = self._encode_text(params["text_encoder"], ids)
        eA, eB, nA, nB = jnp.split(embeds, 4, axis=0)
        pos = eA * tradoff + (1.0 - tradoff) * eB
        neg = nA * tradoff_nag + (1.0 - tradoff_nag) * nB
        cond = jnp.concatenate(
            [jnp.repeat(neg, b, 0), jnp.repeat(pos, b, 0)], axis=0
        )

        rng_noise, rng_vae = jax.random.split(rng)
        masked_lat = self.vae.apply(
            {"params": params["vae"]}, masked_image, rng_vae, method="sample"
        ).astype(jnp.float32)
        mask_lat = jax.image.resize(mask, (b, h8, w8, 1), method="nearest")
        mask_lat2 = jnp.concatenate([mask_lat, mask_lat], axis=0)
        masked_lat2 = jnp.concatenate([masked_lat, masked_lat], axis=0)
        control2 = jnp.concatenate([control_image, control_image], axis=0)

        latents = jax.random.normal(
            rng_noise, (b, h8, w8, 4), jnp.float32
        ) * sched.init_noise_sigma

        def body(carry, i):
            latents, state = carry
            lmi4 = jnp.concatenate([latents, latents], axis=0)
            lmi4 = ddim.scale_model_input(sched, lmi4, i)
            t = sched.timesteps[i]
            if guess_mode:
                # ControlNet on the conditional half only, zero residuals for
                # the uncond half (reference :1669-1701)
                down, mid = self.controlnet.apply(
                    {"params": params["controlnet"]},
                    ddim.scale_model_input(sched, latents, i), t,
                    cond[b:], control_image,
                    conditioning_scale=cond_scale_table[i], guess_mode=True,
                )
                pad = lambda x: jnp.concatenate(
                    [jnp.zeros_like(x), x], axis=0
                )
                down = tuple(pad(x) for x in down)
                mid = pad(mid)
            else:
                down, mid = self.controlnet.apply(
                    {"params": params["controlnet"]}, lmi4, t, cond, control2,
                    conditioning_scale=cond_scale_table[i],
                )
            lmi9 = jnp.concatenate([lmi4, mask_lat2, masked_lat2], axis=-1)
            eps = self.unet.apply(
                {"params": params["unet"]}, lmi9, t, cond,
                down_block_additional_residuals=down,
                mid_block_additional_residual=mid,
            ).astype(jnp.float32)
            eps_u, eps_t = eps[:b], eps[b:]
            eps = eps_u + guidance_scale * (eps_t - eps_u)
            latents, state = ddim.step(sched, state, eps, i, latents)
            return (latents, state), None

        state = ddim.init_state(sched, latents.shape, latents.dtype)
        (latents, _), _ = jax.lax.scan(
            body, (latents, state), jnp.arange(sched.num_steps)
        )
        image = self.vae.apply(
            {"params": params["vae"]},
            (latents / self.config.vae.scaling_factor).astype(self.dtype),
            method="decode",
        )
        if out_uint8:
            img01 = jnp.clip(image.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
            return jnp.round(img01 * 255.0).astype(jnp.uint8)
        return image.astype(jnp.float32)

    def __call__(  # type: ignore[override]
        self,
        image,
        mask,
        control_image=None,
        prompt: str = "",
        negative_prompt: str = "",
        task: str = "text-guided",
        fitting_degree: float = 1.0,
        num_inference_steps: int = 45,
        guidance_scale: float = 7.5,
        controlnet_conditioning_scale: float = 1.0,
        control_guidance_start: float = 0.0,
        control_guidance_end: float = 1.0,
        seed: int = 0,
        guess_mode: bool = False,
        output_type: str = "uint8",
        **kwargs,
    ):
        if control_image is None:
            # no-control path == plain v1 (reference predict_woControl)
            return super().__call__(
                image, mask, prompt=prompt, negative_prompt=negative_prompt,
                task=task, fitting_degree=fitting_degree,
                num_inference_steps=num_inference_steps,
                guidance_scale=guidance_scale, seed=seed,
                output_type=output_type, **kwargs,
            )

        from powerpaint_tpu.core.validation import (
            check_call_args,
            check_control_image,
            check_image_mask,
        )

        img = to_numpy_image(image)
        msk = to_numpy_mask(mask)
        check_image_mask(img, msk)
        check_call_args(
            task=task, num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, fitting_degree=fitting_degree,
            control_guidance_start=control_guidance_start,
            control_guidance_end=control_guidance_end,
        )
        ctrl_u8 = to_numpy_image(control_image)
        check_control_image(ctrl_u8, img)
        mask_u8 = ((msk >= 0.5).astype(np.uint8) * 255)[None, ..., None]

        # reference passes promptA/B swapped with tradoff=1.0 for controlnet
        # (app.py:439-440); both are identical strings so behavior matches
        p = add_task(prompt, negative_prompt, task, "ppt-v1")
        ids = self.encode_task(p)

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
        out = self._generate_cn(
            self.params,
            jnp.asarray(ids),
            jnp.float32(fitting_degree),
            jnp.float32(fitting_degree),
            jnp.asarray(img[None]),
            jnp.asarray(mask_u8),
            jnp.asarray(ctrl_u8[None]),
            jnp.float32(guidance_scale),
            jnp.asarray(keeps * controlnet_conditioning_scale),
            jax.random.PRNGKey(seed),
            num_steps=num_inference_steps,
            out_uint8=output_type == "uint8",
            guess_mode=guess_mode,
        )
        return np.asarray(out)
