"""AsymmetricAutoencoderKL decode-with-condition (reference
pipeline_PowerPaint.py:27, 1045-1051)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu.io import convert as C
from powerpaint_tpu.models.vae import AutoencoderKL
from powerpaint_tpu.testing import tiny_vae

# condition tower matching the tiny VAE's decoder feature shapes on 32^2
COND_SPEC = ((3, 1, 16), (4, 2, 32), (4, 2, 32), (4, 2, 32))


def asym_cfg():
    return tiny_vae().replace(asymmetric=True, condition_layers=COND_SPEC)


@pytest.fixture(scope="module")
def vae_and_params():
    cfg = asym_cfg()
    m = AutoencoderKL(cfg, dtype=jnp.float32)
    params = jax.jit(m.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(1)
    )["params"]
    return m, params


def test_condition_tower_params_exist(vae_and_params):
    _, params = vae_and_params
    enc = params["decoder"]["condition_encoder"]
    assert set(enc) == {f"layers_{i}" for i in range(len(COND_SPEC))}
    for i, (k, s, ch) in enumerate(COND_SPEC):
        assert enc[f"layers_{i}"]["kernel"].shape[:2] == (k, k)
        assert enc[f"layers_{i}"]["kernel"].shape[-1] == ch


def test_decode_with_condition_semantics(vae_and_params):
    m, params = vae_and_params
    rng = jax.random.PRNGKey(2)
    z = jax.random.normal(rng, (1, 4, 4, 4), jnp.float32)
    imgA = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
    imgB = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3))

    def dec(img, mask):
        return np.asarray(m.apply(
            {"params": params}, z, img, mask, method="decode_with_condition"
        ))

    # all-hole mask: the condition tower sees (1-mask)*image == 0, so the
    # image must not influence the output at all
    ones = jnp.ones((1, 32, 32, 1), jnp.float32)
    np.testing.assert_allclose(dec(imgA, ones), dec(imgB, ones), atol=1e-6)

    # known region present: image content must reach the output
    half = ones.at[:, :, :16].set(0.0)  # left half preserved
    assert not np.allclose(dec(imgA, half), dec(imgB, half), atol=1e-4)

    # changing the image only INSIDE the hole changes nothing (it is
    # masked out before the condition tower)
    imgA_hole = imgA.at[:, :, 16:].set(7.0)
    np.testing.assert_allclose(dec(imgA, half), dec(imgA_hole, half),
                               atol=1e-6)


def test_convert_asymmetric_vae_roundtrip(vae_and_params):
    from tests.test_convert import tree_to_torch_sd

    _, params = vae_and_params
    sd = tree_to_torch_sd(params)
    # relocate quant convs to diffusers' top-level layout
    remap = {}
    for k in list(sd):
        if k.startswith("encoder.quant_conv."):
            remap[k.replace("encoder.", "")] = sd.pop(k)
        elif k.startswith("decoder.post_quant_conv."):
            remap[k.replace("decoder.", "")] = sd.pop(k)
    sd.update(remap)

    assert C.infer_condition_layers(sd) == COND_SPEC
    back = C.convert_asymmetric_vae(sd)
    problems = C.validate_against(back, params)
    assert not problems, problems[:10]


def test_v1_pipeline_asymmetric_decode():
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
    from powerpaint_tpu.testing import tiny_v1_config
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v1_config().replace(vae=asym_cfg())
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    p = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = p(img, mask, prompt="x", num_inference_steps=2, seed=0)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out.astype(np.float32)).all()
