"""Latent-consistency distillation (LCM / LCM-LoRA, arXiv 2310.04378).

Turns the v1 inpainting stack into a few-step consistency model — the
training-side counterpart of schedulers/lcm.py.  The LCM-LoRA recipe
(low-rank student on a frozen teacher, stop-gradient target, no EMA
network) needs nothing but pieces this framework already has: the frozen
teacher forward, the traceable LoRA merge (train/lora.py), the coarse
k-spaced timestep grid, and the consistency boundary scalings.

One training step:
  1. sample z0/eps/t as usual, but t from the COARSE grid (the same grid
     schedulers/lcm.py samples at inference);
  2. teacher runs CFG at a sampled guidance w in [w_min, w_max] and takes
     one DDIM solver step t -> t_prev (k grid points down);
  3. the student (teacher + LoRA) maps BOTH points to the consistency
     output f(x, t) = c_skip(t) x + c_out(t) x0_pred(x, t);
  4. huber( f_student(x_t, t), stopgrad(f_student(x_hat_{t_prev}, t_prev)) ).

At convergence f is constant along the teacher's probability-flow
trajectory, which is exactly what schedulers/lcm.py assumes when it jumps
to x0 and renoises.  Exported LoRAs load through io/lora (and diffusers)
and serve with ``scheduler="lcm"``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import PowerPaintConfig
from powerpaint_tpu.models.clip_text import CLIPTextModel
from powerpaint_tpu.models.unet import UNet2DConditionModel
from powerpaint_tpu.models.vae import AutoencoderKL
from powerpaint_tpu.schedulers.common import alphas_cumprod
from powerpaint_tpu.schedulers.lcm import SIGMA_DATA
from powerpaint_tpu.train.lora import apply_lora
from powerpaint_tpu.train.loss import _vae_sample


def boundary_scalings(t: jnp.ndarray, timestep_scaling: float
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """c_skip(t), c_out(t) — identical to schedulers/lcm.py's tables."""
    s = t.astype(jnp.float32) * timestep_scaling
    c_skip = SIGMA_DATA ** 2 / (s ** 2 + SIGMA_DATA ** 2)
    c_out = s / jnp.sqrt(s ** 2 + SIGMA_DATA ** 2)
    return c_skip, c_out


def ddim_solver_step(x_t, eps, acp, t, t_prev):
    """One deterministic DDIM step t -> t_prev given an eps estimate (the
    teacher solver of the LCM recipe; algebra identical to
    schedulers/ddim.step with eta=0)."""
    a_t = acp[t][:, None, None, None]
    a_p = acp[t_prev][:, None, None, None]
    x0 = (x_t - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    return jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps


def _huber(x, c: float):
    return jnp.sqrt(x * x + c * c) - c


def make_lcm_distill_loss(
    config: PowerPaintConfig,
    frozen_params: Dict,
    *,
    dtype=jnp.float32,
    w_range: Tuple[float, float] = (4.0, 12.0),
    huber_c: float = 0.001,
    num_ddim_sections: Optional[int] = None,
) -> Callable:
    """loss(lora_tree, batch, rng) -> (scalar, metrics) — LCM-LoRA
    consistency distillation on the v1 inpainting stack.

    ``frozen_params``: the teacher tree (unet/vae/text_encoder).  The
    optimized tree is a train/lora.init_lora_tree factor tree over the
    teacher UNet.  ``num_ddim_sections`` is the coarse grid size (default:
    scheduler.original_inference_steps, the grid schedulers/lcm.py samples
    at inference)."""
    unet = UNet2DConditionModel(config.unet, dtype=dtype)
    vae = AutoencoderKL(config.vae, dtype=dtype)
    text = CLIPTextModel(config.text_encoder, dtype=dtype)
    sched_cfg = config.scheduler
    acp = jnp.asarray(alphas_cumprod(sched_cfg), jnp.float32)
    T = sched_cfg.num_train_timesteps
    origin = num_ddim_sections or sched_cfg.original_inference_steps
    k = T // origin
    # coarse ascending grid: k-1, 2k-1, ..., T-1 (schedulers/lcm.py)
    grid = jnp.asarray(np.arange(1, origin + 1) * k - 1, jnp.int32)
    sf = config.vae.scaling_factor
    ts_scale = sched_cfg.timestep_scaling

    # the empty-prompt row for the teacher's unconditional branch is
    # static per loss instance: callers pass it via batch["ids_uncond"]

    def consistency_out(params_unet, sample9, t, ctx):
        eps = unet.apply({"params": params_unet},
                         sample9.astype(dtype), t, ctx).astype(jnp.float32)
        a_t = acp[t][:, None, None, None]
        x_t = sample9[..., :4].astype(jnp.float32)
        x0 = (x_t - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        c_skip, c_out = boundary_scalings(t, ts_scale)
        c_skip = c_skip[:, None, None, None]
        c_out = c_out[:, None, None, None]
        return c_out * x0 + c_skip * x_t

    def loss_fn(lora_tree, batch, rng):
        img = batch["image_u8"].astype(jnp.float32) / 127.5 - 1.0
        mask = (batch["mask_u8"] >= 128).astype(jnp.float32)
        masked = img * (1.0 - mask)
        b, h, w_, _ = img.shape
        h8, w8 = h // 8, w_ // 8
        k_lat, k_mlat, k_i, k_eps, k_w = jax.random.split(rng, 5)

        z0 = _vae_sample(vae, frozen_params["vae"], img, k_lat, sf)
        mlat = _vae_sample(vae, frozen_params["vae"], masked, k_mlat, sf)
        mask8 = jax.image.resize(mask, (b, h8, w8, 1), method="nearest")

        # coarse-grid pairs over the FULL grid incl. the boundary: t =
        # grid[i], t_prev = grid[i-1], and for i == 0 t_prev = 0 where
        # f(x, 0) = x is the structural identity (c_skip(0)=1, c_out(0)=0)
        # that anchors the consistency chain to the data prediction — the
        # diffusers LCM recipe's clamped start_timesteps - k
        i = jax.random.randint(k_i, (b,), 0, origin)
        t = grid[i]
        t_prev = jnp.where(i > 0, grid[jnp.maximum(i - 1, 0)], 0)
        eps = jax.random.normal(k_eps, z0.shape, jnp.float32)
        a = acp[t][:, None, None, None]
        x_t = jnp.sqrt(a) * z0 + jnp.sqrt(1.0 - a) * eps

        ctx_c = text.apply({"params": frozen_params["text_encoder"]},
                           batch["ids"])
        ctx_u = text.apply({"params": frozen_params["text_encoder"]},
                           batch["ids_uncond"])

        def nine(x):
            return jnp.concatenate([x, mask8, mlat], axis=-1)

        # ---- teacher: CFG eps at sampled w, one DDIM step down the grid
        w = jax.random.uniform(k_w, (b,), jnp.float32,
                               w_range[0], w_range[1])
        wb = w[:, None, None, None]
        teacher = frozen_params["unet"]
        e_c = unet.apply({"params": teacher}, nine(x_t).astype(dtype), t,
                         ctx_c).astype(jnp.float32)
        e_u = unet.apply({"params": teacher}, nine(x_t).astype(dtype), t,
                         ctx_u).astype(jnp.float32)
        e_cfg = e_u + wb * (e_c - e_u)
        x_prev = ddim_solver_step(x_t, e_cfg, acp, t, t_prev)
        x_prev = jax.lax.stop_gradient(x_prev)

        # ---- student (teacher + LoRA): consistency outputs at both points
        student = apply_lora(frozen_params["unet"], lora_tree)
        f_online = consistency_out(student, nine(x_t), t, ctx_c)
        f_target = consistency_out(student, nine(x_prev), t_prev, ctx_c)
        f_target = jax.lax.stop_gradient(f_target)

        per = jnp.mean(_huber(f_online - f_target, huber_c), axis=(1, 2, 3))
        loss = jnp.mean(per)
        return loss, {"loss": loss,
                      "consistency_gap": jnp.mean(
                          jnp.abs(f_online - f_target))}

    return loss_fn


def make_lcm_distill_loss_v2(
    config: PowerPaintConfig,
    frozen_params: Dict,
    *,
    dtype=jnp.float32,
    w_range: Tuple[float, float] = (4.0, 12.0),
    huber_c: float = 0.001,
    num_ddim_sections: Optional[int] = None,
) -> Callable:
    """LCM-LoRA distillation of the v2 BrushNet stack: the LoRA student
    sits on the BASE UNet; the BrushNet branch (and both text encoders)
    stay frozen and feed taps to teacher and student alike.  Batch needs
    image_u8/mask_u8/ids/ids_plain/ids_uncond (train/data.py,
    version='ppt-v2')."""
    from powerpaint_tpu.models.brushnet import BrushNetModel

    assert config.brushnet is not None
    unet = UNet2DConditionModel(config.unet, dtype=dtype)
    brushnet = BrushNetModel(config.brushnet, dtype=dtype)
    vae = AutoencoderKL(config.vae, dtype=dtype)
    text_task = CLIPTextModel(config.text_encoder, dtype=dtype)
    text_plain = CLIPTextModel(
        config.text_encoder.replace(num_external_tokens=0), dtype=dtype
    )
    sched_cfg = config.scheduler
    acp = jnp.asarray(alphas_cumprod(sched_cfg), jnp.float32)
    T = sched_cfg.num_train_timesteps
    origin = num_ddim_sections or sched_cfg.original_inference_steps
    k = T // origin
    grid = jnp.asarray(np.arange(1, origin + 1) * k - 1, jnp.int32)
    sf = config.vae.scaling_factor
    ts_scale = sched_cfg.timestep_scaling

    def loss_fn(lora_tree, batch, rng):
        img = batch["image_u8"].astype(jnp.float32) / 127.5 - 1.0
        hole = (batch["mask_u8"] >= 128).astype(jnp.float32)
        keep = 1.0 - hole
        masked = img * keep
        b, h, w_, _ = img.shape
        h8, w8 = h // 8, w_ // 8
        k_lat, k_mlat, k_i, k_eps, k_w = jax.random.split(rng, 5)

        z0 = _vae_sample(vae, frozen_params["vae"], img, k_lat, sf)
        cond_lat = _vae_sample(vae, frozen_params["vae"], masked, k_mlat,
                               sf)
        keep8 = jax.image.resize(keep, (b, h8, w8, 1), method="nearest")
        cond5 = jnp.concatenate([cond_lat, keep8], axis=-1).astype(dtype)

        # full grid incl. the t_prev = 0 boundary anchor (see v1 loss)
        i = jax.random.randint(k_i, (b,), 0, origin)
        t = grid[i]
        t_prev = jnp.where(i > 0, grid[jnp.maximum(i - 1, 0)], 0)
        eps = jax.random.normal(k_eps, z0.shape, jnp.float32)
        a = acp[t][:, None, None, None]
        x_t = jnp.sqrt(a) * z0 + jnp.sqrt(1.0 - a) * eps

        ctx_task = text_task.apply(
            {"params": frozen_params["text_encoder_brushnet"]},
            batch["ids"])
        ctx_plain = text_plain.apply(
            {"params": frozen_params["text_encoder"]}, batch["ids_plain"])
        ctx_u = text_plain.apply(
            {"params": frozen_params["text_encoder"]}, batch["ids_uncond"])

        def eps_at(params_unet, x, tt, ctx):
            down, mid, up = brushnet.apply(
                {"params": frozen_params["brushnet"]}, x.astype(dtype), tt,
                ctx_task, cond5, conditioning_scale=1.0,
            )
            return unet.apply(
                {"params": params_unet}, x.astype(dtype), tt, ctx,
                down_block_add_samples=down, mid_block_add_sample=mid,
                up_block_add_samples=up,
            ).astype(jnp.float32)

        # teacher CFG + one DDIM grid step
        w = jax.random.uniform(k_w, (b,), jnp.float32,
                               w_range[0], w_range[1])[:, None, None, None]
        teacher = frozen_params["unet"]
        e_cfg = (lambda e_u, e_c: e_u + w * (e_c - e_u))(
            eps_at(teacher, x_t, t, ctx_u),
            eps_at(teacher, x_t, t, ctx_plain),
        )
        x_prev = jax.lax.stop_gradient(
            ddim_solver_step(x_t, e_cfg, acp, t, t_prev))

        student = apply_lora(frozen_params["unet"], lora_tree)

        def f_at(x, tt):
            e = eps_at(student, x, tt, ctx_plain)
            a_t = acp[tt][:, None, None, None]
            x0 = (x - jnp.sqrt(1.0 - a_t) * e) / jnp.sqrt(a_t)
            c_skip, c_out = boundary_scalings(tt, ts_scale)
            return (c_out[:, None, None, None] * x0
                    + c_skip[:, None, None, None] * x)

        f_online = f_at(x_t, t)
        f_target = jax.lax.stop_gradient(f_at(x_prev, t_prev))
        per = jnp.mean(_huber(f_online - f_target, huber_c), axis=(1, 2, 3))
        loss = jnp.mean(per)
        return loss, {"loss": loss,
                      "consistency_gap": jnp.mean(
                          jnp.abs(f_online - f_target))}

    return loss_fn


def uncond_ids(tokenizer) -> np.ndarray:
    """(77,) ids of the empty prompt (the teacher's CFG uncond row)."""
    return np.asarray(tokenizer([""])[0])
