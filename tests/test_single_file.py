"""Single-file (original-SD ``model.diffusion_model.*``) checkpoint
loading — FromSingleFileMixin parity (reference pipeline_PowerPaint.py:157).

The UNet mapping is verified NUMERICALLY: the composed mini torch UNet's
diffusers-style state dict is inverse-renamed to LDM keys in this test,
pushed through ``convert_single_file``, and the resulting tree must equal
the direct ``convert_unet`` tree.  VAE mapping is pinned key-by-key; the
CLIP portion reuses the real transformers model.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")

import powerpaint_tpu.io.convert as C  # noqa: E402

from test_composed_oracle import TorchMiniUNet, mini_cfg  # noqa: E402
from test_torch_parity import sd_numpy  # noqa: E402


def _res_inv(sub: str) -> str:
    return (sub.replace("norm1", "in_layers.0")
            .replace("conv1", "in_layers.2")
            .replace("time_emb_proj", "emb_layers.1")
            .replace("norm2", "out_layers.0")
            .replace("conv2", "out_layers.3")
            .replace("conv_shortcut", "skip_connection"))


def diffusers_unet_to_ldm(sd, cfg):
    """Inverse rename (test-side only) for the 3-level mini config."""
    n = len(cfg.block_out_channels)
    per = cfg.layers_per_block + 1
    has_attn_down = [bt == "CrossAttnDownBlock2D"
                     for bt in cfg.down_block_types]
    has_attn_up = [bt == "CrossAttnUpBlock2D" for bt in cfg.up_block_types]
    out = {}
    for k, v in sd.items():
        p = k.split(".")
        if k.startswith("conv_in."):
            out[f"input_blocks.0.0.{p[1]}"] = v
        elif k.startswith("time_embedding."):
            idx = {"linear_1": "0", "linear_2": "2"}[p[1]]
            out[f"time_embed.{idx}.{p[2]}"] = v
        elif k.startswith("down_blocks."):
            lvl, kind, j = int(p[1]), p[2], p[3]
            if kind == "resnets":
                sub = _res_inv(".".join(p[4:]))
                out[f"input_blocks.{1 + per * lvl + int(j)}.0.{sub}"] = v
            elif kind == "attentions":
                out[f"input_blocks.{1 + per * lvl + int(j)}.1."
                    + ".".join(p[4:])] = v
            else:  # downsamplers.0.conv
                out[f"input_blocks.{per * (lvl + 1)}.0.op.{p[-1]}"] = v
        elif k.startswith("mid_block."):
            kind, j = p[1], p[2]
            idx = {"resnets": {"0": "0", "1": "2"},
                   "attentions": {"0": "1"}}[kind][j]
            sub = ".".join(p[3:])
            if kind == "resnets":
                sub = _res_inv(sub)
            out[f"middle_block.{idx}.{sub}"] = v
        elif k.startswith("up_blocks."):
            lvl, kind, j = int(p[1]), p[2], p[3]
            if kind == "resnets":
                sub = _res_inv(".".join(p[4:]))
                out[f"output_blocks.{per * lvl + int(j)}.0.{sub}"] = v
            elif kind == "attentions":
                out[f"output_blocks.{per * lvl + int(j)}.1."
                    + ".".join(p[4:])] = v
            else:  # upsamplers.0.conv
                slot = "2" if has_attn_up[lvl] else "1"
                out[f"output_blocks.{per * lvl + per - 1}.{slot}.conv."
                    f"{p[-1]}"] = v
        elif k.startswith("conv_norm_out."):
            out[f"out.0.{p[1]}"] = v
        elif k.startswith("conv_out."):
            out[f"out.2.{p[1]}"] = v
        else:
            raise KeyError(k)
    assert len(out) == len(sd)
    return out


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], path + "/" + k)
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=path + "/" + k)


def test_single_file_unet_matches_direct_conversion():
    cfg = mini_cfg(9)
    tm = TorchMiniUNet(cfg)
    dsd = sd_numpy(tm)
    want = C.convert_unet(dsd)
    ldm = {f"model.diffusion_model.{k}": v
           for k, v in diffusers_unet_to_ldm(dsd, cfg).items()}
    got = C.convert_single_file(ldm)
    assert set(got) == {"unet"}
    _tree_equal(got["unet"], want)


def test_single_file_clip_matches_transformers():
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=128, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
    )
    model = transformers.CLIPTextModel(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    want = C.convert_clip_text(sd)
    ldm = {f"cond_stage_model.transformer.{k}": v for k, v in sd.items()}
    got = C.convert_single_file(ldm)
    _tree_equal(got["text_encoder"], want)


def test_ldm_vae_key_mapping():
    """Key-level pinning of the LDM->diffusers VAE rename: reversed
    decoder levels, attn 1x1-conv -> linear squeeze, resnet renames."""
    mk = lambda *s: np.zeros(s, np.float32)  # noqa: E731
    sd = {
        "encoder.conv_in.weight": mk(16, 3, 3, 3),
        "encoder.down.1.block.0.norm1.weight": mk(16),
        "encoder.down.1.block.0.nin_shortcut.weight": mk(32, 16, 1, 1),
        "encoder.down.0.downsample.conv.weight": mk(16, 16, 3, 3),
        "encoder.mid.block_1.conv1.weight": mk(32, 32, 3, 3),
        "encoder.mid.attn_1.q.weight": mk(32, 32, 1, 1),
        "encoder.mid.attn_1.proj_out.weight": mk(32, 32, 1, 1),
        "encoder.mid.attn_1.norm.weight": mk(32),
        "encoder.norm_out.weight": mk(32),
        "decoder.up.0.block.1.conv2.weight": mk(16, 16, 3, 3),
        "decoder.up.3.block.0.conv1.weight": mk(32, 32, 3, 3),
        "decoder.up.1.upsample.conv.weight": mk(16, 16, 3, 3),
        "quant_conv.weight": mk(8, 8, 1, 1),
        "post_quant_conv.weight": mk(4, 4, 1, 1),
    }
    got = C.ldm_vae_to_diffusers(sd)
    assert "encoder.conv_in.weight" in got
    assert "encoder.down_blocks.1.resnets.0.norm1.weight" in got
    assert ("encoder.down_blocks.1.resnets.0.conv_shortcut.weight" in got)
    assert "encoder.down_blocks.0.downsamplers.0.conv.weight" in got
    assert "encoder.mid_block.resnets.0.conv1.weight" in got
    assert got["encoder.mid_block.attentions.0.to_q.weight"].shape == (32, 32)
    assert got["encoder.mid_block.attentions.0.to_out.0.weight"].shape == \
        (32, 32)
    assert "encoder.mid_block.attentions.0.group_norm.weight" in got
    assert "encoder.conv_norm_out.weight" in got
    # decoder.up.0 (lowest res in LDM) -> up_blocks.3 (diffusers reversed)
    assert "decoder.up_blocks.3.resnets.1.conv2.weight" in got
    assert "decoder.up_blocks.0.resnets.0.conv1.weight" in got
    assert "decoder.up_blocks.2.upsamplers.0.conv.weight" in got
    assert "quant_conv.weight" in got and "post_quant_conv.weight" in got
    assert len(got) == len(sd)


def test_textual_inversion_registration():
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)  # 30 task rows first, like the real pipelines
    base_rows = tok.num_external_tokens
    text_params = {"external_embedding": np.ones((base_rows, 8), np.float32)}

    rows = np.arange(3 * 8, dtype=np.float32).reshape(3, 8)
    new_params = C.load_textual_inversion(
        tok, text_params, {"<my-style>": rows}
    )
    assert tok.num_external_tokens == base_rows + 3
    info = tok.get_token_info("<my-style>")
    assert info["end"] - info["start"] == 3
    assert new_params["external_embedding"].shape == (base_rows + 3, 8)
    np.testing.assert_array_equal(
        new_params["external_embedding"][base_rows:], rows
    )
    # expansion inserts 3 consecutive ids
    ids = tok("a photo of <my-style>")[0]
    got = [i for i in ids.tolist()
           if info["start"] <= i < info["end"]]
    assert got == list(range(info["start"], info["end"]))
    # original params untouched
    assert text_params["external_embedding"].shape == (base_rows, 8)


def test_pipeline_textual_inversion_end_to_end():
    import jax.numpy as jnp

    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
    from powerpaint_tpu.testing import tiny_v1_config
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    pipe = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)
    img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    base = pipe(img, mask, prompt="a photo", num_inference_steps=2, seed=4)

    d = cfg.text_encoder.hidden_size
    rows = np.random.RandomState(1).randn(2, d).astype(np.float32)
    pipe.add_textual_inversion({"<sty>": rows})
    with_tok = pipe(img, mask, prompt="a photo <sty>",
                    num_inference_steps=2, seed=4)
    without = pipe(img, mask, prompt="a photo", num_inference_steps=2,
                   seed=4)
    assert (with_tok != without).any()
    diff = np.abs(without.astype(np.int32) - base.astype(np.int32))
    assert diff.max() <= 1  # unrelated prompts unaffected by registration
