"""Parameter-tree creation / loading entry points.

``init_params`` builds a randomly initialized stack (tests, benchmarks —
the reference has no public training code; real weights arrive through
io/convert.py's safetensors converters).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from powerpaint_tpu.core.config import PowerPaintConfig
from powerpaint_tpu.models.brushnet import BrushNetModel
from powerpaint_tpu.models.clip_text import CLIPTextModel
from powerpaint_tpu.models.controlnet import ControlNetModel
from powerpaint_tpu.models.unet import UNet2DConditionModel
from powerpaint_tpu.models.vae import AutoencoderKL


def init_params(
    config: PowerPaintConfig,
    rng: jax.Array,
    *,
    sample_hw: int = 64,
    dtype: jnp.dtype = jnp.bfloat16,
    jit: bool = True,
) -> Dict[str, dict]:
    """Random-init full param tree: unet, vae, text_encoder (+brushnet,
    +controlnet, +text_encoder_brushnet when configured).

    ``jit=False`` runs the initializers eagerly — for tiny test/dryrun
    configs the XLA compile of a jitted init costs orders of magnitude
    more than the init itself (round-4 verdict measured >150 s of XLA:CPU
    compile inside ``jax.jit(unet.init)`` on a 1-CPU host before the
    dryrun's first pipeline even ran)."""
    h = w = sample_hw
    keys = jax.random.split(rng, 6)
    ctx_dim = config.unet.cross_attention_dim

    unet = UNet2DConditionModel(config.unet, dtype=dtype)
    vae = AutoencoderKL(config.vae, dtype=dtype)
    text = CLIPTextModel(config.text_encoder, dtype=dtype)

    sample = jnp.zeros((1, h, w, config.unet.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, config.text_encoder.max_position_embeddings, ctx_dim))
    ids = jnp.zeros((1, config.text_encoder.max_position_embeddings), jnp.int32)
    img = jnp.zeros((1, h * 8, w * 8, 3))

    init_jit = jax.jit if jit else (lambda f: f)

    ip_embeds = (
        jnp.zeros((1, config.unet.ip_adapter_dim))
        if config.unet.ip_adapter_dim else None
    )
    t_cond = (
        jnp.zeros((1, config.unet.time_cond_proj_dim))
        if config.unet.time_cond_proj_dim else None
    )
    params = {
        "unet": init_jit(unet.init)(
            keys[0], sample, t, ctx, image_embeds=ip_embeds,
            timestep_cond=t_cond,
        )["params"],
        "vae": init_jit(vae.init)(
            keys[1], img, jax.random.PRNGKey(0)
        )["params"],
        "text_encoder": init_jit(text.init)(keys[2], ids)["params"],
    }

    if config.brushnet is not None:
        bn = BrushNetModel(config.brushnet, dtype=dtype)
        bn_sample = jnp.zeros((1, h, w, config.brushnet.base.in_channels))
        bn_cond = jnp.zeros((1, h, w, config.brushnet.conditioning_channels))
        params["brushnet"] = init_jit(bn.init)(
            keys[3], bn_sample, t, ctx, bn_cond
        )["params"]
        # v2 has TWO text encoders: the task-token one (brushnet) and the
        # frozen plain one (reference pipeline_PowerPaint_Brushnet_CA.py:183-184)
        params["text_encoder_brushnet"] = params["text_encoder"]
        plain_cfg = config.text_encoder.replace(num_external_tokens=0)
        plain = CLIPTextModel(plain_cfg, dtype=dtype)
        params["text_encoder"] = init_jit(plain.init)(keys[4], ids)["params"]

    if config.controlnet is not None:
        cn = ControlNetModel(config.controlnet, dtype=dtype)
        cn_sample = jnp.zeros((1, h, w, 4))
        cn_cond = jnp.zeros((1, h * 8, w * 8, 3))
        params["controlnet"] = init_jit(cn.init)(
            keys[5], cn_sample, t, ctx, cn_cond
        )["params"]

    return params
