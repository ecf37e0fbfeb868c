"""Weight-converter tests: literal diffusers-key pinning + round-trip through
a synthetic torch-layout state dict for every model family."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu.io import convert as C
from powerpaint_tpu.models.brushnet import BrushNetModel
from powerpaint_tpu.models.clip_text import CLIPTextModel
from powerpaint_tpu.models.controlnet import ControlNetModel
from powerpaint_tpu.models.unet import UNet2DConditionModel
from powerpaint_tpu.models.vae import AutoencoderKL
from powerpaint_tpu.testing import (
    tiny_text,
    tiny_unet,
    tiny_v1_controlnet_config,
    tiny_v2_config,
    tiny_vae,
)

# ---------------------------------------------------------------------------
# literal key pinning (the diffusers/transformers naming contract)
# ---------------------------------------------------------------------------

PINNED = {
    "conv_in.weight": ("conv_in", "kernel"),
    "time_embedding.linear_1.weight": ("time_embedding", "linear_1", "kernel"),
    "down_blocks.0.resnets.1.norm1.weight":
        ("down_blocks_0", "resnets_1", "norm1", "scale"),
    "down_blocks.0.resnets.1.time_emb_proj.weight":
        ("down_blocks_0", "resnets_1", "time_emb_proj", "kernel"),
    "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight":
        ("down_blocks_0", "attentions_0", "blocks_0", "attn1", "to_q", "kernel"),
    "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.bias":
        ("down_blocks_0", "attentions_0", "blocks_0", "attn2", "to_out", "bias"),
    "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight":
        ("down_blocks_0", "attentions_0", "blocks_0", "ff", "proj_in", "kernel"),
    "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight":
        ("down_blocks_0", "attentions_0", "blocks_0", "ff", "proj_out", "kernel"),
    "down_blocks.0.downsamplers.0.conv.weight":
        ("down_blocks_0", "downsamplers_0", "conv", "kernel"),
    "mid_block.attentions.0.proj_in.weight":
        ("mid_block", "attentions_0", "proj_in", "kernel"),
    "up_blocks.3.upsamplers.0.conv.bias": None,  # no upsampler on final block
    "conv_norm_out.weight": ("conv_norm_out", "scale"),
    "text_model.encoder.layers.3.self_attn.q_proj.weight":
        ("layers_3", "self_attn", "q_proj", "kernel"),
    "text_model.encoder.layers.3.mlp.fc1.bias": ("layers_3", "fc1", "bias"),
    "text_model.final_layer_norm.weight": ("final_layer_norm", "scale"),
    "text_model.embeddings.token_embedding.weight": ("token_embedding", "kernel"),
    "encoder.mid_block.attentions.0.group_norm.weight":
        ("encoder", "mid_block", "attentions_0", "group_norm", "scale"),
    "brushnet_down_blocks.11.weight": ("brushnet_down_blocks_11", "kernel"),
    "controlnet_cond_embedding.blocks.2.weight":
        ("controlnet_cond_embedding", "blocks_2", "kernel"),
}


def test_pinned_key_mapping():
    for torch_key, expected in PINNED.items():
        if expected is None:
            continue
        assert C.torch_key_to_flax_path(torch_key) == expected, torch_key


# ---------------------------------------------------------------------------
# inverse mapping (test-only): flax path -> torch key + tensor layout
# ---------------------------------------------------------------------------

_LIST_MODULES = (
    "resnets", "attentions", "blocks", "downsamplers", "upsamplers",
    "down_blocks", "up_blocks", "layers", "brushnet_down_blocks",
    "brushnet_up_blocks", "controlnet_down_blocks",
)


def flax_path_to_torch_key(path, clip=False):
    parts = []
    for p in path:
        m = re.match(r"^(.*)_(\d+)$", p)
        if m and m.group(1) in _LIST_MODULES:
            name, idx = m.group(1), m.group(2)
            if name == "blocks" and not parts[-1:] == ["controlnet_cond_embedding"]:
                name = "transformer_blocks"
            parts.extend([name, idx])
        else:
            parts.append(p)
    key = ".".join(parts)
    key = key.replace("ff.proj_in", "ff.net.0.proj")
    key = key.replace("ff.proj_out", "ff.net.2")
    key = key.replace("to_out.kernel", "to_out.0.weight")
    key = key.replace("to_out.bias", "to_out.0.bias")
    key = key.replace(".kernel", ".weight")
    key = key.replace(".scale", ".weight")
    if clip:
        if key in ("token_embedding", "position_embedding",
                   "external_embedding"):
            key = "text_model.embeddings." + key + ".weight"
        elif key.startswith("layers."):
            key = "text_model.encoder." + key
        else:
            key = "text_model." + key
    return key


def tree_to_torch_sd(tree, clip=False):
    sd = {}
    for path, shape in C.tree_paths(tree).items():
        node = tree
        for p in path:
            node = node[p]
        arr = np.asarray(node, dtype=np.float32)
        name = path[-1]
        if name == "kernel":
            if arr.ndim == 4:
                arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
            elif arr.ndim == 2 and "embedding" not in path[-2]:
                arr = np.transpose(arr)
        # contiguous, like real torch checkpoints (safetensors writes the raw
        # buffer and silently corrupts transposed views otherwise)
        sd[flax_path_to_torch_key(path, clip=clip)] = np.ascontiguousarray(arr)
    return sd


def _roundtrip(tree, converter, clip=False):
    sd = tree_to_torch_sd(tree, clip=clip)
    back = converter(sd)
    problems = C.validate_against(back, tree)
    assert not problems, problems[:10]
    for path in C.tree_paths(tree):
        a = tree
        b = back
        for p in path:
            a, b = a[p], b[p]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg="/".join(path))


def test_unet_roundtrip():
    cfg = tiny_unet(9)
    m = UNet2DConditionModel(cfg, dtype=jnp.float32)
    params = jax.jit(m.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 9)), jnp.array([0]),
        jnp.zeros((1, 77, cfg.cross_attention_dim)),
    )["params"]
    _roundtrip(params, C.convert_unet)


def test_vae_roundtrip():
    cfg = tiny_vae()
    m = AutoencoderKL(cfg, dtype=jnp.float32)
    params = jax.jit(m.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(1)
    )["params"]

    def conv(sd):
        # diffusers puts quant convs at top level; simulate that layout
        sd = dict(sd)
        remap = {}
        for k in list(sd):
            if k.startswith("encoder.quant_conv."):
                remap[k.replace("encoder.", "")] = sd.pop(k)
            elif k.startswith("decoder.post_quant_conv."):
                remap[k.replace("decoder.", "")] = sd.pop(k)
        sd.update(remap)
        return C.convert_vae(sd)

    _roundtrip(params, conv)


def test_clip_roundtrip_with_task_tokens():
    cfg = tiny_text(num_external=30)
    m = CLIPTextModel(cfg, dtype=jnp.float32)
    params = jax.jit(m.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
    )["params"]

    def conv(sd):
        # split external rows into EmbeddingLayerWithFixes layout:
        # wrapped table + trainable_embeddings.P_* (10 rows each)
        sd = dict(sd)
        ext = sd.pop("text_model.embeddings.external_embedding.weight")
        tok = sd.pop("text_model.embeddings.token_embedding.weight")
        sd["text_model.embeddings.token_embedding.wrapped.weight"] = tok
        for i, name in enumerate(C.TASK_TOKEN_ORDER):
            sd[
                "text_model.embeddings.token_embedding."
                f"trainable_embeddings.{name}"
            ] = ext[i * 10 : (i + 1) * 10]
        return C.convert_clip_text(sd)

    _roundtrip(params, conv, clip=True)


def test_brushnet_roundtrip():
    cfg = tiny_v2_config().brushnet
    m = BrushNetModel(cfg, dtype=jnp.float32)
    params = jax.jit(m.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)), jnp.array([0]),
        jnp.zeros((1, 77, cfg.base.cross_attention_dim)),
        jnp.zeros((1, 16, 16, 5)),
    )["params"]
    _roundtrip(params, C.convert_brushnet)


def test_controlnet_roundtrip():
    cfg = tiny_v1_controlnet_config().controlnet
    m = ControlNetModel(cfg, dtype=jnp.float32)
    params = jax.jit(m.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)), jnp.array([0]),
        jnp.zeros((1, 77, cfg.base.cross_attention_dim)),
        jnp.zeros((1, 128, 128, 3)),
    )["params"]
    _roundtrip(params, C.convert_controlnet)


def test_brushnet_from_unet_surgery():
    """from_unet contract (reference BrushNet_CA.py:525-542): identical
    inputs through both branches -> brushnet sees [x|x|0] exactly as the
    base conv_in sees x duplicated; blocks share weights; taps still zero."""
    import jax
    import jax.numpy as jnp

    from powerpaint_tpu.io.convert import brushnet_params_from_unet
    from powerpaint_tpu.testing import tiny_v2_config

    cfg = tiny_v2_config()
    rng = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(cfg.unet, dtype=jnp.float32)
    u_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, 16, 16, 4)), jnp.array([0]),
        jnp.zeros((1, 77, cfg.unet.cross_attention_dim)),
    )["params"]
    bn = BrushNetModel(cfg.brushnet, dtype=jnp.float32)
    template = jax.jit(bn.init)(
        rng, jnp.zeros((1, 16, 16, 4)), jnp.array([0]),
        jnp.zeros((1, 77, cfg.unet.cross_attention_dim)),
        jnp.zeros((1, 16, 16, 5)),
    )["params"]

    bn_params = brushnet_params_from_unet(u_params, template)

    ck = np.asarray(bn_params["conv_in_condition"]["kernel"])
    uk = np.asarray(u_params["conv_in"]["kernel"])
    np.testing.assert_array_equal(ck[:, :, :4, :], uk)
    np.testing.assert_array_equal(ck[:, :, 4:8, :], uk)
    assert np.abs(ck[:, :, 8:, :]).max() == 0.0
    np.testing.assert_array_equal(
        np.asarray(bn_params["mid_block"]["resnets_0"]["conv1"]["kernel"]),
        np.asarray(u_params["mid_block"]["resnets_0"]["conv1"]["kernel"]),
    )
    # zero convs still zero -> taps vanish
    x = jax.random.normal(rng, (1, 16, 16, 4))
    ctx = jax.random.normal(rng, (1, 77, cfg.unet.cross_attention_dim))
    cond = jax.random.normal(rng, (1, 16, 16, 5))
    down, mid, up = bn.apply({"params": bn_params}, x, jnp.array([5]), ctx, cond)
    for t in list(down) + [mid] + list(up):
        assert float(jnp.abs(t).max()) == 0.0
