"""LoRA loading/merging (io/lora.py) — format coverage + torch oracle.

Reference capability: pipelines are ``LoraLoaderMixin``s
(pipeline_PowerPaint.py:26,157) accepting diffusers-peft, old
attn-processor, and kohya/A1111 key formats.  Here: parse all three,
resolve module paths against the real tiny UNet/CLIP trees, verify the
merged delta against a torch-computed ``x @ (W + s*(alpha/r)*BA).T``
oracle, and check exact unmerge round-trips.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from powerpaint_tpu.io.lora import (  # noqa: E402
    lora_delta,
    merge_lora,
    parse_lora,
    resolve_module,
)
from powerpaint_tpu.io.params import init_params  # noqa: E402
from powerpaint_tpu.testing import tiny_v1_config  # noqa: E402


@pytest.fixture(scope="module")
def params():
    cfg = tiny_v1_config()
    return init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                       dtype=jnp.float32)


def _np(x):
    return np.asarray(x, np.float32)


def test_parse_lora_formats():
    rng = np.random.RandomState(0)
    a, b = rng.randn(4, 32).astype(np.float32), rng.randn(32, 4).astype(np.float32)
    sd = {
        # peft / new diffusers
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight": a,
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight": b,
        # kohya
        "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn2_to_k.lora_down.weight": a,
        "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn2_to_k.lora_up.weight": b,
        "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn2_to_k.alpha": np.float32(8.0),
        # old attn-processor
        "up_blocks.1.attentions.0.transformer_blocks.0.attn1.processor.to_q_lora.down.weight": a,
        "up_blocks.1.attentions.0.transformer_blocks.0.attn1.processor.to_q_lora.up.weight": b,
        # text encoder, kohya
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight": a,
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight": b,
    }
    recs = parse_lora(sd)
    keys = set(recs)
    assert ("unet",
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q") in keys
    assert ("unet",
            "mid_block_attentions_0_transformer_blocks_0_attn2_to_k") in keys
    assert ("unet",
            "up_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q") in keys
    assert ("text_encoder",
            "text_model_encoder_layers_0_self_attn_q_proj") in keys
    assert recs[("unet",
                 "mid_block_attentions_0_transformer_blocks_0_attn2_to_k")][
        "alpha"] == 8.0


def test_resolve_kohya_against_real_trees(params):
    unet = params["unet"]
    assert resolve_module(
        unet, "down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
    ) == ("down_blocks_0", "attentions_0", "blocks_0", "attn1", "to_q")
    assert resolve_module(
        unet, "mid_block_attentions_0_transformer_blocks_0_attn2_to_out_0"
    ) == ("mid_block", "attentions_0", "blocks_0", "attn2", "to_out")
    assert resolve_module(
        unet, "up_blocks_1_attentions_0_transformer_blocks_0_ff_net_0_proj"
    ) == ("up_blocks_1", "attentions_0", "blocks_0", "ff", "proj_in")
    assert resolve_module(
        unet, "up_blocks_1_attentions_0_transformer_blocks_0_ff_net_2"
    ) == ("up_blocks_1", "attentions_0", "blocks_0", "ff", "proj_out")
    te = params["text_encoder"]
    assert resolve_module(
        te, "text_model_encoder_layers_0_self_attn_q_proj"
    ) == ("layers_0", "self_attn", "q_proj")
    assert resolve_module(unet, "not_a_real_module") is None


def test_merge_matches_torch_oracle(params):
    torch = pytest.importorskip("torch")
    unet = params["unet"]
    path = ("down_blocks_0", "attentions_0", "blocks_0", "attn1", "to_q")
    node = unet
    for p in path:
        node = node[p]
    W_flax = _np(node["kernel"])          # (I, O)
    I, O = W_flax.shape
    rng = np.random.RandomState(1)
    r, alpha, scale = 4, 2.0, 0.7
    down = rng.randn(r, I).astype(np.float32)   # A: (r, I)
    up = rng.randn(O, r).astype(np.float32)     # B: (O, r)
    sd = {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight": down,
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight": up,
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.alpha": np.float32(alpha),
    }
    merged, unmatched = merge_lora(params, sd, scale)
    assert unmatched == []
    node2 = merged["unet"]
    for p in path:
        node2 = node2[p]
    x = rng.randn(3, I).astype(np.float32)
    got = x @ _np(node2["kernel"])
    tw = torch.tensor(W_flax.T)  # torch linear weight (O, I)
    tw = tw + scale * (alpha / r) * torch.tensor(up) @ torch.tensor(down)
    want = (torch.tensor(x) @ tw.T).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # the original tree is untouched (functional merge)
    np.testing.assert_array_equal(_np(node["kernel"]), W_flax)


def test_unmerge_roundtrip(params):
    rng = np.random.RandomState(2)
    unet = params["unet"]
    path = ("mid_block", "attentions_0", "blocks_0", "attn2", "to_k")
    node = unet
    for p in path:
        node = node[p]
    I, O = _np(node["kernel"]).shape
    sd = {
        "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn2_to_k.lora_down.weight":
            rng.randn(2, I).astype(np.float32),
        "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn2_to_k.lora_up.weight":
            rng.randn(O, 2).astype(np.float32),
    }
    merged, _ = merge_lora(params, sd, 1.0)
    back, _ = merge_lora(merged, sd, -1.0)
    node2 = back["unet"]
    for p in path:
        node2 = node2[p]
    np.testing.assert_allclose(_np(node2["kernel"]), _np(node["kernel"]),
                               atol=1e-6)


def test_conv_lora_delta_shape():
    rng = np.random.RandomState(3)
    r, I, O, k = 2, 8, 16, 3
    rec = {"down": rng.randn(r, I, k, k).astype(np.float32),
           "up": rng.randn(O, r, 1, 1).astype(np.float32), "alpha": None}
    d = lora_delta(rec, (k, k, I, O), 1.0)
    assert d.shape == (k, k, I, O)
    # spot-check one element against the einsum definition
    want = 0.0
    for rr in range(r):
        want += rec["up"][5, rr, 0, 0] * rec["down"][rr, 3, 1, 2]
    np.testing.assert_allclose(d[1, 2, 3, 5], want, rtol=1e-6)


def test_pipeline_lora_mixin(params):
    """Pipelines expose load/set_scale/unload (diffusers LoraLoaderMixin
    analog) and generation output actually changes."""
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
    from powerpaint_tpu.testing import tiny_v1_config
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v1_config()
    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    pipe = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)
    img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    base = pipe(img, mask, prompt="x", num_inference_steps=2, seed=1)

    unet = params["unet"]
    node = unet
    for p in ("down_blocks_0", "attentions_0", "blocks_0", "attn1", "to_q"):
        node = node[p]
    I, O = _np(node["kernel"]).shape
    rng = np.random.RandomState(4)
    sd = {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight":
            rng.randn(4, I).astype(np.float32),
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight":
            rng.randn(O, 4).astype(np.float32),
    }
    unmatched = pipe.load_lora_weights(sd, scale=1.0)
    assert unmatched == []
    styled = pipe(img, mask, prompt="x", num_inference_steps=2, seed=1)
    assert (styled != base).any()
    pipe.unload_lora_weights()
    restored = pipe(img, mask, prompt="x", num_inference_steps=2, seed=1)
    # (W + d) - d reintroduces float rounding at the ulp level; allow 1 lsb
    # in the uint8 output
    diff = np.abs(restored.astype(np.int32) - base.astype(np.int32))
    assert diff.max() <= 1, diff.max()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_lora_load_preserves_mesh_shardings():
    """load_lora_weights on a mesh pipeline must re-commit merged kernels
    with their TP shardings (merge_lora leaves host numpy arrays behind;
    a bare re-upload would silently replicate TP-sharded weights and
    re-transfer them every call)."""
    from powerpaint_tpu.parallel.mesh import build_mesh
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
    from powerpaint_tpu.testing import tiny_v1_config
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v1_config()
    cfg = cfg.replace(
        unet=cfg.unet.replace(
            block_out_channels=(32, 64, 64, 64), attention_head_dim=2
        )
    )
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    mesh = build_mesh(jax.devices()[:8], model_parallel=2)
    pipe = InpaintPipeline(cfg, params, tok, dtype=jnp.float32, mesh=mesh)

    def shardings(tree):
        return {
            "/".join(str(getattr(k, "key", k)) for k in kp): leaf.sharding
            for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    before = shardings(pipe.params["unet"])
    node = pipe.params["unet"]
    for p in ("down_blocks_0", "attentions_0", "blocks_0", "attn1", "to_q"):
        node = node[p]
    I, O = np.asarray(node["kernel"]).shape
    rng = np.random.RandomState(4)
    sd = {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight":
            rng.randn(4, I).astype(np.float32),
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight":
            rng.randn(O, 4).astype(np.float32),
    }
    assert pipe.load_lora_weights(sd, scale=1.0) == []
    # every leaf back on device (no host numpy -> no per-call re-upload)
    assert all(isinstance(leaf, jax.Array)
               for leaf in jax.tree.leaves(pipe.params))
    after = shardings(pipe.params["unet"])
    assert before == after
    # and the sharded pipeline still generates
    img = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe(img, mask, prompt="x", num_inference_steps=2, seed=1,
               num_images_per_prompt=4)
    assert out.shape == (4, 32, 32, 3)
