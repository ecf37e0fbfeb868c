"""IP-Adapter: decoupled cross-attention K/V path, converter, v2 pipeline.

Reference surface: pipeline_PowerPaint_Brushnet_CA.py:650-707 (encode/prepare
image embeds, added_cond_kwargs), unet_2d_condition.py:1030-1040
('ip_image_proj'), diffusers IPAdapterAttnProcessor semantics (decoupled
to_k_ip/to_v_ip, scaled sum BEFORE the output projection).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from powerpaint_tpu.io import convert as C
from powerpaint_tpu.io.params import init_params
from powerpaint_tpu.testing import tiny_unet, tiny_v2_config


def test_attention_decoupled_ip_matches_torch_oracle():
    """sdpa(text) + scale * sdpa_ip(image tokens), combined pre-to_out."""
    torch = pytest.importorskip("torch")
    from torch import nn
    import torch.nn.functional as F

    from powerpaint_tpu.models.transformer import Attention

    torch.manual_seed(0)
    torch.set_grad_enabled(False)
    dim, ctx_dim, heads, n_ip, scale = 16, 24, 4, 4, 0.7

    to_q = nn.Linear(dim, dim, bias=False)
    to_k = nn.Linear(ctx_dim, dim, bias=False)
    to_v = nn.Linear(ctx_dim, dim, bias=False)
    to_k_ip = nn.Linear(ctx_dim, dim, bias=False)
    to_v_ip = nn.Linear(ctx_dim, dim, bias=False)
    to_out = nn.Linear(dim, dim)

    x = torch.randn(2, 64, dim)
    ctx = torch.randn(2, 77, ctx_dim)
    ip = torch.randn(2, n_ip, ctx_dim)

    def heads_split(t):
        b, s, c = t.shape
        return t.reshape(b, s, heads, c // heads).transpose(1, 2)

    q = heads_split(to_q(x))
    txt = F.scaled_dot_product_attention(q, heads_split(to_k(ctx)),
                                         heads_split(to_v(ctx)))
    img = F.scaled_dot_product_attention(q, heads_split(to_k_ip(ip)),
                                         heads_split(to_v_ip(ip)))
    h = (txt + scale * img).transpose(1, 2).reshape(2, 64, dim)
    want = to_out(h)

    def lin(m):
        return {"kernel": m.weight.numpy().T}

    tree = {
        "to_q": lin(to_q), "to_k": lin(to_k), "to_v": lin(to_v),
        "to_k_ip": lin(to_k_ip), "to_v_ip": lin(to_v_ip),
        "to_out": {"kernel": to_out.weight.numpy().T,
                   "bias": to_out.bias.numpy()},
    }
    m = Attention(heads, dim // heads, dtype=jnp.float32)
    got = m.apply({"params": tree}, jnp.asarray(x.numpy()),
                  jnp.asarray(ctx.numpy()), jnp.asarray(ip.numpy()), scale)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=3e-5, rtol=1e-4)


def _synthetic_ip_sd(cfg, rng):
    """IP-Adapter checkpoint in the original nested layout."""
    n_attn2 = len(C.ip_adapter_attn2_paths(cfg))
    sd = {
        "image_proj": {
            "proj.weight": rng.standard_normal(
                (cfg.ip_adapter_tokens * cfg.cross_attention_dim,
                 cfg.ip_adapter_dim), dtype=np.float32),
            "proj.bias": rng.standard_normal(
                (cfg.ip_adapter_tokens * cfg.cross_attention_dim,),
                dtype=np.float32),
            "norm.weight": rng.standard_normal(
                (cfg.cross_attention_dim,), dtype=np.float32),
            "norm.bias": rng.standard_normal(
                (cfg.cross_attention_dim,), dtype=np.float32),
        },
        "ip_adapter": {},
    }
    # per-attn2 channel width varies by block; look it up from the paths
    widths = []
    for path in C.ip_adapter_attn2_paths(cfg):
        blk = path[0]
        if blk.startswith("down_blocks"):
            ch = cfg.block_out_channels[int(blk.split("_")[-1])]
        elif blk.startswith("up_blocks"):
            ch = tuple(reversed(cfg.block_out_channels))[
                int(blk.split("_")[-1])]
        else:
            ch = cfg.block_out_channels[-1]
        widths.append(ch)
    for i in range(n_attn2):
        kid = 2 * i + 1
        for name in ("to_k_ip", "to_v_ip"):
            sd["ip_adapter"][f"{kid}.{name}.weight"] = rng.standard_normal(
                (widths[i], cfg.cross_attention_dim), dtype=np.float32)
    return sd


def test_convert_ip_adapter_merges_into_unet_tree():
    from powerpaint_tpu.models.unet import UNet2DConditionModel

    cfg = tiny_unet(4).replace(ip_adapter_dim=8, ip_adapter_tokens=4)
    rng = np.random.default_rng(0)
    sd = _synthetic_ip_sd(cfg, rng)
    ip_tree = C.convert_ip_adapter(sd, cfg)

    # structural target: a UNet initialized WITH the ip path
    m = UNet2DConditionModel(cfg, dtype=jnp.float32)
    with_ip = jax.jit(m.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)), jnp.array([0]),
        jnp.zeros((1, 77, cfg.cross_attention_dim)),
        image_embeds=jnp.zeros((1, cfg.ip_adapter_dim)),
    )["params"]
    without_ip = jax.jit(m.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)), jnp.array([0]),
        jnp.zeros((1, 77, cfg.cross_attention_dim)),
    )["params"]

    merged = C.merge_ip_adapter(without_ip, ip_tree)
    problems = C.validate_against(merged, with_ip)
    assert not problems, problems[:10]

    # flat safetensors layout converts identically
    flat = {}
    for k, v in sd.items():
        for k2, v2 in v.items():
            flat[f"{k}.{k2}"] = v2
    ip_tree2 = C.convert_ip_adapter(flat, cfg)
    for path, shape in C.tree_paths(ip_tree).items():
        assert C.tree_paths(ip_tree2)[path] == shape


def test_v2_pipeline_ip_adapter_changes_output():
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v2_config()
    cfg = cfg.replace(unet=cfg.unet.replace(ip_adapter_dim=8,
                                            ip_adapter_tokens=4))
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    pipe = BrushNetPipeline(cfg, params, tok, dtype=jnp.float32)

    img = (np.random.default_rng(0)
           .integers(0, 255, (64, 64, 3)).astype(np.uint8))
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    embeds = np.random.default_rng(1).standard_normal((8,), dtype=np.float32)

    kw = dict(prompt="a dog", num_inference_steps=2, seed=3)
    base = pipe(img, mask, **kw)
    with_ip = pipe(img, mask, ip_adapter_image_embeds=embeds, **kw)
    scale0 = pipe(img, mask, ip_adapter_image_embeds=embeds,
                  ip_adapter_scale=0.0, **kw)

    assert not np.array_equal(base, with_ip), "image embeds must change output"
    np.testing.assert_allclose(
        scale0.astype(np.int32), base.astype(np.int32), atol=1,
        err_msg="ip_scale=0 must reduce to the no-adapter output",
    )


def test_v2_pipeline_multi_ip_adapter():
    """Multi-IP-Adapter (reference adapter LISTS,
    pipeline_PowerPaint_Brushnet_CA.py:658-675): two adapters with their
    own projections/decoupled K-V and per-adapter scales; zeroing one
    scale reduces to the single-adapter result."""
    from powerpaint_tpu.models.unet import UNet2DConditionModel
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v2_config()
    cfg = cfg.replace(unet=cfg.unet.replace(ip_adapter_dim=8,
                                            ip_adapter_tokens=4))
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    rng = np.random.default_rng(5)
    sd0 = _synthetic_ip_sd(cfg.unet, rng)
    sd1 = _synthetic_ip_sd(cfg.unet, rng)
    merged = C.merge_ip_adapter(params["unet"],
                                C.convert_ip_adapter(sd0, cfg.unet, 0))
    merged = C.merge_ip_adapter(merged,
                                C.convert_ip_adapter(sd1, cfg.unet, 1))
    # structural check against an init'd two-adapter UNet
    m = UNet2DConditionModel(cfg.unet, dtype=jnp.float32)
    two = jax.jit(m.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)), jnp.array([0]),
        jnp.zeros((1, 77, cfg.unet.cross_attention_dim)),
        image_embeds=(jnp.zeros((1, cfg.unet.ip_adapter_dim)),
                      jnp.zeros((1, cfg.unet.ip_adapter_dim))),
    )["params"]
    problems = C.validate_against(merged, two)
    assert not problems, problems[:10]

    params = dict(params, unet=merged)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    pipe = BrushNetPipeline(cfg, params, tok, dtype=jnp.float32)

    img = (np.random.default_rng(0)
           .integers(0, 255, (64, 64, 3)).astype(np.uint8))
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    e0 = np.random.default_rng(1).standard_normal((8,), dtype=np.float32)
    e1 = np.random.default_rng(2).standard_normal((8,), dtype=np.float32)
    kw = dict(prompt="a dog", num_inference_steps=2, seed=3)

    single = pipe(img, mask, ip_adapter_image_embeds=e0, **kw)
    both = pipe(img, mask, ip_adapter_image_embeds=[e0, e1],
                ip_adapter_scale=[1.0, 1.0], **kw)
    second_off = pipe(img, mask, ip_adapter_image_embeds=[e0, e1],
                      ip_adapter_scale=[1.0, 0.0], **kw)

    assert not np.array_equal(single, both), "second adapter must matter"
    np.testing.assert_allclose(
        second_off.astype(np.int32), single.astype(np.int32), atol=1,
        err_msg="scale [1,0] must reduce to the single-adapter output",
    )
