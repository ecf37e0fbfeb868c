"""Native DPT-hybrid depth model vs the installed transformers torch DPT
(round-3 verdict #5).

A random-init tiny hybrid ``DPTForDepthEstimation`` is converted through
``io/convert.convert_dpt`` and must produce the same depth map as our
NHWC Flax ``models/dpt.DPTDepthModel`` — pinning the architecture AND the
converter together (the models/annotators.py HED/pose oracle pattern).
The production SD config runs under --run-slow.

Reference consumer: /root/reference/app.py:116-123, 202-221
(get_depth_map on Intel/dpt-hybrid-midas).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from powerpaint_tpu.io.convert import (  # noqa: E402
    convert_dpt,
    dpt_config_from_hf,
    validate_against,
)
from powerpaint_tpu.models.dpt import DPTDepthModel  # noqa: E402


def _tiny_hybrid_config():
    bit = transformers.BitConfig(
        embedding_size=8, hidden_sizes=[8, 16, 32], depths=[1, 1, 1],
        num_groups=2, layer_type="bottleneck", global_padding="SAME",
        embedding_dynamic_padding=True,  # the hybrid-midas backbone value
        out_features=["stage1", "stage2", "stage3"],
    )
    return transformers.DPTConfig(
        is_hybrid=True, backbone_config=bit, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        image_size=64, patch_size=16,
        neck_hidden_sizes=[8, 16, 32, 32],
        reassemble_factors=[1, 1, 1, 0.5],
        fusion_hidden_size=16,
        backbone_out_indices=[0, 1, 0, 1],
        backbone_featmap_shape=[1, 32, 4, 4],
        readout_type="project",
    )


def _randomize(model, seed=0):
    """HF zero-inits cls/pos embeddings; give every param a nontrivial
    value so the oracle actually exercises each path."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))
    return model


def _compare(hf_cfg, hw, atol, seed=0):
    model = transformers.DPTForDepthEstimation(hf_cfg)
    _randomize(model.eval(), seed)
    rng = np.random.RandomState(seed)
    x = rng.rand(1, hw, hw, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        ref = model(
            pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).predicted_depth.numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    tree = convert_dpt(sd)
    cfg = dpt_config_from_hf(hf_cfg)
    net = DPTDepthModel(cfg, jnp.float32)
    expected = net.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)))
    validate_against(expected["params"], tree)
    got = np.asarray(net.apply({"params": tree}, jnp.asarray(x)))

    assert got.shape == ref.shape, (got.shape, ref.shape)
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(got / scale, ref / scale, atol=atol)


def test_dpt_hybrid_tiny_oracle():
    _compare(_tiny_hybrid_config(), hw=64, atol=2e-5)


def test_pos_embed_resize_matches_torch_helper():
    """Our grid-mismatch position-embedding resize (models/dpt.py hybrid
    encoder) vs torch DPTViTHybridEmbeddings._resize_pos_embed — the
    torch model itself refuses non-`image_size` inputs so this path is
    pinned against the helper directly."""
    from transformers.models.dpt.modeling_dpt import DPTViTHybridEmbeddings

    hf_cfg = _tiny_hybrid_config()
    emb = DPTViTHybridEmbeddings(hf_cfg)
    g = torch.Generator().manual_seed(0)
    pos = torch.randn(1, 17, 32, generator=g)  # 4x4 grid + cls, D=32
    ref = emb._resize_pos_embed(pos, 8, 8).numpy()

    p = pos.numpy()
    grid = p[:, 1:].reshape(1, 4, 4, 32)
    grid = jax.image.resize(jnp.asarray(grid), (1, 8, 8, 32),
                            method="bilinear")
    got = np.concatenate(
        [p[:, :1], np.asarray(grid).reshape(1, 64, 32)], axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.slow
def test_dpt_hybrid_production_config_oracle():
    """Full Intel/dpt-hybrid-midas architecture (BiT R50-ish + ViT-B) at
    384px — the exact production config, random weights."""
    cfg = transformers.DPTConfig(
        is_hybrid=True,
        neck_hidden_sizes=[256, 512, 768, 768],
        reassemble_factors=[1, 1, 1, 0.5],
        backbone_featmap_shape=[1, 1024, 24, 24],
    )
    _compare(cfg, hw=384, atol=5e-4, seed=2)


def test_depth_preprocessor_native(tmp_path):
    """Full preprocessor semantics through the native path (the reference
    get_depth_map contract): uint8, 3 identical channels, min/max
    normalized to [0, 255], requested output size."""
    from powerpaint_tpu.tasks.control import (
        DPTDepthPreprocessor,
        get_control_image,
        register_preprocessor,
    )

    hf_cfg = _tiny_hybrid_config()
    model = _randomize(transformers.DPTForDepthEstimation(hf_cfg).eval())
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    pre = DPTDepthPreprocessor(
        params=convert_dpt(sd), config=dpt_config_from_hf(hf_cfg),
        output_size=(48, 48))
    img = (np.random.RandomState(0).rand(48, 48, 3) * 255).astype(np.uint8)
    depth = pre(img)
    assert depth.shape == (48, 48, 3) and depth.dtype == np.uint8
    assert depth.min() == 0 and depth.max() == 255
    assert np.array_equal(depth[..., 0], depth[..., 1])

    register_preprocessor("depth", pre)
    np.testing.assert_array_equal(get_control_image("depth", img), depth)


def test_bicubic_resize_matches_torch():
    """resize_bicubic (the post-upsample) vs torch F.interpolate
    bicubic/align_corners=False — the reference's exact upsample op
    (app.py:207-212)."""
    from powerpaint_tpu.tasks.control import resize_bicubic

    x = np.random.RandomState(3).rand(2, 17, 23).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x)[:, None], size=(40, 64), mode="bicubic",
        align_corners=False)[:, 0].numpy()
    got = np.asarray(resize_bicubic(jnp.asarray(x), 40, 64))
    np.testing.assert_allclose(got, ref, atol=2e-6)
