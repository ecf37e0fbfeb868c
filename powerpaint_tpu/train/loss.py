"""Denoising training losses (v1 inpainting UNet, v2 BrushNet branch).

Standard epsilon-prediction diffusion objective on the same model inputs
the inference pipelines build (pipelines/inpaint.py / brushnet.py):

    L = E_{t ~ U[0,T), eps ~ N} || eps_hat(x_t, t, cond) - eps ||^2
    x_t = sqrt(acp_t) z0 + sqrt(1 - acp_t) eps

v1: the UNet sees concat(x_t, mask/8, vae(masked image)) — 9 channels —
and the task-token text embedding (the PowerPaint recipe trains the task
rows jointly, arXiv 2312.03594 §4).

v2: the frozen base UNet consumes the trainable BrushNet branch's 28 taps;
gradients flow through the base into the branch (the BrushNet training
setup — base weights get no updates via the optimizer mask).

The VAE is always frozen (stop_gradient around encoding, as SD training
does); min-SNR-gamma loss weighting (arXiv 2303.09556) is available via
``snr_gamma`` — the standard stabilizer for short fine-tunes.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from powerpaint_tpu.core.config import PowerPaintConfig
from powerpaint_tpu.models.brushnet import BrushNetModel
from powerpaint_tpu.models.clip_text import CLIPTextModel
from powerpaint_tpu.models.unet import UNet2DConditionModel
from powerpaint_tpu.models.vae import AutoencoderKL
from powerpaint_tpu.schedulers.common import alphas_cumprod


def _vae_sample(vae, params, images, key, scaling):
    moments = vae.apply({"params": params}, images, method="encode")
    mean, logvar = moments
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    noise = jax.random.normal(key, mean.shape, jnp.float32)
    z = mean.astype(jnp.float32) + std * noise
    return jax.lax.stop_gradient(z * scaling)


def _weight(acp_t: jnp.ndarray, snr_gamma: Optional[float]) -> jnp.ndarray:
    if snr_gamma is None:
        return jnp.ones_like(acp_t)
    snr = acp_t / (1.0 - acp_t)
    return jnp.minimum(snr, snr_gamma) / snr


def make_v1_loss(
    config: PowerPaintConfig,
    *,
    dtype=jnp.float32,
    snr_gamma: Optional[float] = None,
) -> Callable:
    """loss(params, batch, rng) -> (scalar, metrics) for the 9-channel v1
    stack.  ``params`` needs unet/vae/text_encoder; batch needs
    image_u8/mask_u8/ids (train/data.py)."""
    unet = UNet2DConditionModel(config.unet, dtype=dtype)
    vae = AutoencoderKL(config.vae, dtype=dtype)
    text = CLIPTextModel(config.text_encoder, dtype=dtype)
    acp = jnp.asarray(alphas_cumprod(config.scheduler), jnp.float32)
    T = config.scheduler.num_train_timesteps
    sf = config.vae.scaling_factor

    def loss_fn(params, batch, rng) -> tuple:
        img = batch["image_u8"].astype(jnp.float32) / 127.5 - 1.0
        mask = (batch["mask_u8"] >= 128).astype(jnp.float32)
        masked = img * (1.0 - mask)
        b, h, w, _ = img.shape
        h8, w8 = h // 8, w // 8
        k_lat, k_mlat, k_t, k_eps = jax.random.split(rng, 4)

        z0 = _vae_sample(vae, params["vae"], img, k_lat, sf)
        mlat = _vae_sample(vae, params["vae"], masked, k_mlat, sf)
        mask8 = jax.image.resize(mask, (b, h8, w8, 1), method="nearest")

        t = jax.random.randint(k_t, (b,), 0, T)
        eps = jax.random.normal(k_eps, z0.shape, jnp.float32)
        a = acp[t][:, None, None, None]
        x_t = jnp.sqrt(a) * z0 + jnp.sqrt(1.0 - a) * eps

        ctx = text.apply({"params": params["text_encoder"]}, batch["ids"])
        sample = jnp.concatenate(
            [x_t, mask8, mlat], axis=-1).astype(dtype)
        eps_hat = unet.apply(
            {"params": params["unet"]}, sample, t, ctx
        ).astype(jnp.float32)

        per = jnp.mean((eps_hat - eps) ** 2, axis=(1, 2, 3))
        loss = jnp.mean(_weight(acp[t], snr_gamma) * per)
        return loss, {"loss": loss, "mse": jnp.mean(per)}

    return loss_fn


def make_v2_loss(
    config: PowerPaintConfig,
    *,
    dtype=jnp.float32,
    snr_gamma: Optional[float] = None,
) -> Callable:
    """v2 BrushNet-branch objective: trainable branch taps injected into
    the (frozen) base UNet; batch needs image_u8/mask_u8/ids/ids_plain."""
    assert config.brushnet is not None
    unet = UNet2DConditionModel(config.unet, dtype=dtype)
    brushnet = BrushNetModel(config.brushnet, dtype=dtype)
    vae = AutoencoderKL(config.vae, dtype=dtype)
    text_task = CLIPTextModel(config.text_encoder, dtype=dtype)
    text_plain = CLIPTextModel(
        config.text_encoder.replace(num_external_tokens=0), dtype=dtype
    )
    acp = jnp.asarray(alphas_cumprod(config.scheduler), jnp.float32)
    T = config.scheduler.num_train_timesteps
    sf = config.vae.scaling_factor

    def loss_fn(params, batch, rng) -> tuple:
        img = batch["image_u8"].astype(jnp.float32) / 127.5 - 1.0
        hole = (batch["mask_u8"] >= 128).astype(jnp.float32)
        keep = 1.0 - hole
        masked = img * keep
        b, h, w, _ = img.shape
        h8, w8 = h // 8, w // 8
        k_lat, k_mlat, k_t, k_eps = jax.random.split(rng, 4)

        z0 = _vae_sample(vae, params["vae"], img, k_lat, sf)
        cond_lat = _vae_sample(vae, params["vae"], masked, k_mlat, sf)
        # 5-ch conditioning: mask channel is 1.0 on PRESERVED pixels
        # (pipelines/brushnet.py / reference :1312)
        keep8 = jax.image.resize(keep, (b, h8, w8, 1), method="nearest")
        cond5 = jnp.concatenate([cond_lat, keep8], axis=-1)

        t = jax.random.randint(k_t, (b,), 0, T)
        eps = jax.random.normal(k_eps, z0.shape, jnp.float32)
        a = acp[t][:, None, None, None]
        x_t = (jnp.sqrt(a) * z0 + jnp.sqrt(1.0 - a) * eps).astype(dtype)

        ctx_task = text_task.apply(
            {"params": params["text_encoder_brushnet"]}, batch["ids"])
        ctx_plain = text_plain.apply(
            {"params": params["text_encoder"]}, batch["ids_plain"])

        down, mid, up = brushnet.apply(
            {"params": params["brushnet"]}, x_t, t, ctx_task,
            cond5.astype(dtype), conditioning_scale=1.0,
        )
        eps_hat = unet.apply(
            {"params": params["unet"]}, x_t, t, ctx_plain,
            down_block_add_samples=down,
            mid_block_add_sample=mid,
            up_block_add_samples=up,
        ).astype(jnp.float32)

        per = jnp.mean((eps_hat - eps) ** 2, axis=(1, 2, 3))
        loss = jnp.mean(_weight(acp[t], snr_gamma) * per)
        return loss, {"loss": loss, "mse": jnp.mean(per)}

    return loss_fn


def make_lora_loss(base_loss: Callable, frozen_params: Dict,
                   *, scale: float = 1.0, target: str = "unet") -> Callable:
    """Wrap a loss so the OPTIMIZED tree is a LoRA factor tree: the merged
    params are rebuilt inside the trace each step (adds of down@up — cheap
    next to the forward), so gradients flow only into the factors."""
    from powerpaint_tpu.train.lora import apply_lora

    def loss_fn(lora_tree, batch, rng):
        merged = dict(frozen_params)
        merged[target] = apply_lora(frozen_params[target], lora_tree,
                                    scale=scale)
        return base_loss(merged, batch, rng)

    return loss_fn
