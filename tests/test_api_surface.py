"""Per-call API parity surface: clip_skip, prompt_embeds passthrough,
per-call step callbacks (reference pipeline_PowerPaint.py:742-746,1039 and
pipeline_PowerPaint_Brushnet_CA.py:452,537-547,1451-1466)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from powerpaint_tpu.io.params import init_params  # noqa: E402
from powerpaint_tpu.pipelines.inpaint import InpaintPipeline  # noqa: E402
from powerpaint_tpu.testing import tiny_v1_config, tiny_v2_config  # noqa: E402
from powerpaint_tpu.text.tokenizer import (  # noqa: E402
    HashTokenizer,
    TokenizerWrapper,
    add_task_tokens,
)


def _tok():
    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    return tok


@pytest.fixture(scope="module")
def v1():
    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    return InpaintPipeline(cfg, params, _tok(), dtype=jnp.float32)


@pytest.fixture(scope="module")
def img_mask():
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    return img, mask


def test_clip_skip_layer_tap():
    """clip_skip=n == run L-n layers + final LN (HF hidden_states[-(n+1)]
    semantics) — verified against a manually truncated model."""
    from powerpaint_tpu.models.clip_text import CLIPTextModel
    from powerpaint_tpu.testing import tiny_text

    cfg = tiny_text(0)
    model = CLIPTextModel(cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 900, (2, 77)))
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    full = model.apply({"params": params}, ids)
    skip1 = model.apply({"params": params}, ids, clip_skip=1)
    assert not np.allclose(np.asarray(full), np.asarray(skip1))

    truncated = CLIPTextModel(cfg.replace(num_hidden_layers=1),
                              dtype=jnp.float32)
    sub = {k: v for k, v in params.items()
           if not k.startswith("layers_") or k == "layers_0"}
    want = truncated.apply({"params": sub}, ids)
    np.testing.assert_allclose(np.asarray(skip1), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_v1_clip_skip_changes_output(v1, img_mask):
    img, mask = img_mask
    a = v1(img, mask, prompt="x", num_inference_steps=2, seed=3)
    b = v1(img, mask, prompt="x", num_inference_steps=2, seed=3, clip_skip=1)
    assert (a != b).any()


def test_v1_prompt_embeds_passthrough(v1, img_mask):
    """Feeding the pipeline's own embeds back through prompt_embeds must
    reproduce the text path exactly."""
    img, mask = img_mask
    from powerpaint_tpu.text.prompts import add_task

    p = add_task("a dog", "", "text-guided", "ppt-v1")
    ids = v1.encode_task(p)
    emb = np.asarray(
        v1._encode_text(v1.params["text_encoder"], jnp.asarray(ids))
    )
    f = 1.0
    pos = emb[0] * f + (1 - f) * emb[1]
    neg = emb[2] * f + (1 - f) * emb[3]

    a = v1(img, mask, prompt="a dog", num_inference_steps=2, seed=5)
    b = v1(img, mask, prompt="", num_inference_steps=2, seed=5,
           prompt_embeds=pos, negative_prompt_embeds=neg)
    # eager-computed embeds vs the fused in-program encode can differ at
    # the ulp level (different XLA programs); allow 1 lsb in uint8
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    c = v1(img, mask, prompt="", num_inference_steps=2, seed=5)
    assert np.abs(c.astype(np.int32) - b.astype(np.int32)).max() > 1


def test_v1_per_call_callback(v1, img_mask):
    img, mask = img_mask
    seen = []
    v1(img, mask, prompt="x", num_inference_steps=4, seed=1,
       callback=lambda i, lat: seen.append((i, np.asarray(lat).shape)))
    assert [s[0] for s in seen] == [0, 1, 2, 3]
    assert all(s[1][-1] == 4 for s in seen)  # latent channels

    seen2 = []
    v1(img, mask, prompt="x", num_inference_steps=4, seed=1,
       callback=lambda i, lat: seen2.append(i), callback_steps=2)
    assert seen2 == [0, 2]

    # no callback -> no retrace penalty beyond the two cached variants,
    # and identical output to the callback run
    a = v1(img, mask, prompt="x", num_inference_steps=4, seed=1)
    b = v1(img, mask, prompt="x", num_inference_steps=4, seed=1,
           callback=lambda i, lat: None)
    np.testing.assert_array_equal(a, b)


def test_v2_surface(img_mask):
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline

    cfg = tiny_v2_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    # randomize the (zero-initialized) tap convs so the BrushNet branch
    # actually contributes — otherwise task-embed changes are invisible
    key = jax.random.PRNGKey(7)
    for name, sub in params["brushnet"].items():
        if name.startswith("brushnet_"):
            key, k = jax.random.split(key)
            sub["kernel"] = 0.05 * jax.random.normal(
                k, sub["kernel"].shape, jnp.float32
            )
    pipe = BrushNetPipeline(cfg, params, _tok(), dtype=jnp.float32)
    img, mask = img_mask

    a = pipe(img, mask, prompt="x", num_inference_steps=2, seed=3)
    b = pipe(img, mask, prompt="x", num_inference_steps=2, seed=3,
             clip_skip=1)
    assert (a != b).any()

    seen = []
    pipe(img, mask, prompt="x", num_inference_steps=3, seed=3,
         callback=lambda i, lat: seen.append(i))
    assert seen == [0, 1, 2]

    # task-embed passthrough reproduces the string path
    d = cfg.text_encoder.hidden_size
    emb = np.random.RandomState(2).randn(1, 77, d).astype(np.float32)
    e1 = pipe(img, mask, prompt="x", num_inference_steps=2, seed=3,
              prompt_embeds=emb, negative_prompt_embeds=emb * 0)
    assert (e1 != a).any()


def test_v1_output_type_latent(v1, img_mask):
    """output_type='latent' returns undecoded denoised latents (reference
    pipeline_PowerPaint.py:1044-1055 via the diffusers contract)."""
    img, mask = img_mask
    lat = v1(img, mask, prompt="x", num_inference_steps=2, seed=3,
             output_type="latent")
    assert lat.shape == (1, 8, 8, 4) and lat.dtype == np.float32
    assert np.isfinite(lat).all()
    lat2 = v1(img, mask, prompt="x", num_inference_steps=2, seed=4,
              output_type="latent")
    assert not np.array_equal(lat, lat2)
    # manual decode of the latents reproduces the float32 output
    f32 = v1(img, mask, prompt="x", num_inference_steps=2, seed=3,
             output_type="float32")
    z = jnp.asarray(lat / v1.config.vae.scaling_factor, jnp.float32)
    dec = np.asarray(v1.vae.apply(
        {"params": v1.params["vae"]}, z, method="decode"
    ))
    np.testing.assert_allclose(dec, f32, atol=1e-4)


def test_v1_output_type_invalid(v1, img_mask):
    from powerpaint_tpu.core.validation import InputValidationError

    img, mask = img_mask
    with pytest.raises(InputValidationError, match="output_type"):
        v1(img, mask, prompt="x", num_inference_steps=2, output_type="pil")


def test_v1_height_width(v1, img_mask):
    """height/width call args resize inputs to the exact target
    (reference pipeline_PowerPaint.py:729-730)."""
    img, mask = img_mask
    out = v1(img, mask, prompt="x", num_inference_steps=2, seed=3,
             height=48, width=56)
    assert out.shape == (1, 48, 56, 3)

    from powerpaint_tpu.core.validation import InputValidationError

    with pytest.raises(InputValidationError, match="together"):
        v1(img, mask, prompt="x", num_inference_steps=2, height=48)
    with pytest.raises(InputValidationError, match="multiples of 8"):
        v1(img, mask, prompt="x", num_inference_steps=2, height=50,
           width=56)


def test_v2_output_type_latent_and_hw(img_mask):
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline

    img, mask = img_mask
    cfg = tiny_v2_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    pipe = BrushNetPipeline(cfg, params, _tok(), dtype=jnp.float32)
    lat = pipe(img, mask, prompt="x", num_inference_steps=2, seed=3,
               output_type="latent")
    assert lat.shape == (1, 8, 8, 4) and lat.dtype == np.float32
    out = pipe(img, mask, prompt="x", num_inference_steps=2, seed=3,
               height=48, width=56)
    assert out.shape == (1, 48, 56, 3)


def test_cn_output_type_latent_and_hw(img_mask):
    from powerpaint_tpu.pipelines.controlnet import ControlNetPipeline
    from powerpaint_tpu.testing import tiny_v1_controlnet_config

    img, mask = img_mask
    cfg = tiny_v1_controlnet_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    pipe = ControlNetPipeline(cfg, params, _tok(), dtype=jnp.float32)
    ctrl = np.zeros_like(img)
    lat = pipe(img, mask, control_image=ctrl, prompt="x",
               num_inference_steps=2, seed=3, output_type="latent")
    assert lat.shape == (1, 8, 8, 4) and lat.dtype == np.float32
    out = pipe(img, mask, control_image=ctrl, prompt="x",
               num_inference_steps=2, seed=3, height=48, width=56)
    assert out.shape == (1, 48, 56, 3)


def test_cross_attention_kwargs_lora_scale(img_mask):
    """cross_attention_kwargs={"scale": s} is the per-call LoRA scale
    (reference pipeline_PowerPaint.py:748,887-902): transient re-merge,
    restored after the call."""
    from powerpaint_tpu.core.validation import InputValidationError

    img, mask = img_mask
    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    pipe = InpaintPipeline(cfg, params, _tok(), dtype=jnp.float32)
    base = pipe(img, mask, prompt="x", num_inference_steps=2, seed=1)

    with pytest.raises(InputValidationError, match="requires a loaded LoRA"):
        pipe(img, mask, prompt="x", num_inference_steps=2, seed=1,
             cross_attention_kwargs={"scale": 0.5})
    with pytest.raises(InputValidationError, match="unsupported"):
        pipe(img, mask, prompt="x", num_inference_steps=2, seed=1,
             cross_attention_kwargs={"ip_adapter_masks": None})

    unet = params["unet"]
    node = unet
    for p in ("down_blocks_0", "attentions_0", "blocks_0", "attn1", "to_q"):
        node = node[p]
    i_dim, o_dim = np.asarray(node["kernel"]).shape
    rng = np.random.RandomState(4)
    sd = {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
        ".lora_A.weight": rng.randn(4, i_dim).astype(np.float32),
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
        ".lora_B.weight": rng.randn(o_dim, 4).astype(np.float32),
    }
    assert pipe.load_lora_weights(sd, scale=1.0) == []
    styled = pipe(img, mask, prompt="x", num_inference_steps=2, seed=1)
    assert (styled != base).any()

    # matching scale: fast path, bit-identical
    same = pipe(img, mask, prompt="x", num_inference_steps=2, seed=1,
                cross_attention_kwargs={"scale": 1.0})
    assert np.array_equal(same, styled)

    # different scale changes the output...
    half = pipe(img, mask, prompt="x", num_inference_steps=2, seed=1,
                cross_attention_kwargs={"scale": 0.25})
    assert (half != styled).any()
    # ...and the loaded scale is restored afterwards (<= 1 lsb rounding)
    again = pipe(img, mask, prompt="x", num_inference_steps=2, seed=1)
    diff = np.abs(again.astype(np.int32) - styled.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_v2_custom_timesteps(img_mask):
    """Explicit descending timestep list (reference v2 `timesteps` via
    retrieve_timesteps, pipeline_PowerPaint_Brushnet_CA.py:87-127) — the
    table-based UniPC supports arbitrary spacing (the torch
    UniPCMultistepScheduler raises on it)."""
    from powerpaint_tpu.core.validation import InputValidationError
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline
    from powerpaint_tpu.schedulers.common import spaced_timesteps

    img, mask = img_mask
    cfg = tiny_v2_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    pipe = BrushNetPipeline(cfg, params, _tok(), dtype=jnp.float32)
    default = pipe(img, mask, prompt="x", num_inference_steps=3, seed=2)

    # the default grid passed explicitly reproduces the default bit-exactly
    ts = [int(t) for t in spaced_timesteps(cfg.scheduler, 3)]
    exact = pipe(img, mask, prompt="x", num_inference_steps=99, seed=2,
                 timesteps=ts)  # num_inference_steps overridden by the list
    assert np.array_equal(exact, default)

    # an irregular grid runs and changes the result
    odd = pipe(img, mask, prompt="x", seed=2, timesteps=[801, 301, 11])
    assert odd.shape == default.shape
    assert not np.array_equal(odd, default)

    with pytest.raises(InputValidationError, match="descending"):
        pipe(img, mask, prompt="x", seed=2, timesteps=[11, 301])
    with pytest.raises(InputValidationError, match="lie in"):
        pipe(img, mask, prompt="x", seed=2, timesteps=[5000, 301])


def test_clip_skip_out_of_range_raises(v1, img_mask):
    """clip_skip beyond the encoder depth would silently never fire the
    layer-capture condition (clip_text.py); it must be a typed input
    error instead (the diffusers reference raises an IndexError)."""
    from powerpaint_tpu.core.validation import InputValidationError

    img, mask = img_mask
    depth = v1.config.text_encoder.num_hidden_layers
    for bad in (depth, depth + 5, -1):
        with pytest.raises(InputValidationError, match="clip_skip"):
            v1(img, mask, prompt="x", num_inference_steps=2, seed=3,
               clip_skip=bad)
