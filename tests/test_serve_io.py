"""Serving (HTTP + CLI) and checkpoint IO tests on the tiny stack."""

import base64
import io
import json
import os
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from powerpaint_tpu.io.params import init_params
from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
from powerpaint_tpu.testing import tiny_v1_config
from powerpaint_tpu.text.tokenizer import (
    HashTokenizer,
    TokenizerWrapper,
    add_task_tokens,
)


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    return InpaintPipeline(cfg, params, tok, dtype=jnp.float32)


def _png_b64(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_http_server_inpaint(pipe):
    from powerpaint_tpu.serve.app import make_server

    server = make_server(pipe, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health"
        ) as r:
            assert json.loads(r.read())["status"] == "ok"

        rng = np.random.RandomState(0)
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        mask[16:48, 16:48] = 255
        payload = {
            "image_b64": _png_b64(img),
            "mask_b64": _png_b64(mask),
            "prompt": "a dog",
            "task": "text-guided",
            "steps": 2,
            "short_side": 64,
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inpaint",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = Image.open(io.BytesIO(r.read()))
            assert out.size[0] >= 56 and out.size[1] >= 56

        # malformed request -> 400, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/inpaint",
            data=json.dumps({"prompt": "x"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad)
        assert exc.value.code == 400
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert r.status == 200
    finally:
        server.shutdown()


def test_cli_one_shot(tmp_path):
    from powerpaint_tpu.serve.cli import main

    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255
    ip = tmp_path / "in.png"
    mp = tmp_path / "mask.png"
    op = tmp_path / "out.png"
    Image.fromarray(img).save(ip)
    Image.fromarray(mask).save(mp)

    rc = main([
        "--tiny", "--image", str(ip), "--mask", str(mp),
        "--output", str(op), "--prompt", "a dog", "--steps", "2",
        "--weight_dtype", "float32", "--short_side", "64",
    ])
    assert rc == 0
    assert os.path.exists(op)
    out = np.asarray(Image.open(op))
    assert out.shape[2] == 3


def test_cli_missing_image_errors():
    from powerpaint_tpu.serve.cli import main

    assert main(["--tiny"]) == 2


def test_native_checkpoint_roundtrip(tmp_path, pipe):
    from powerpaint_tpu.io.checkpoint import load_native, save_native

    save_native(str(tmp_path / "ckpt"), pipe.config, pipe.params)
    config, params = load_native(str(tmp_path / "ckpt"))
    assert config == pipe.config
    orig = jax.tree_util.tree_leaves(pipe.params)
    loaded = jax.tree_util.tree_leaves(params)
    assert len(orig) == len(loaded)
    for a, b in zip(orig, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_ppt_v1_detects_native_layout(tmp_path, pipe):
    """load_ppt_v1 on a save_native dir (the train CLI's output) builds a
    working pipeline — the train -> serve roundtrip."""
    from powerpaint_tpu.io.checkpoint import load_ppt_v1, save_native

    save_native(str(tmp_path / "native"), pipe.config, pipe.params)
    loaded = load_ppt_v1(str(tmp_path / "native"), dtype=jnp.float32)
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    a = pipe(img, mask, prompt="x", num_inference_steps=2, seed=1)
    b = loaded(img, mask, prompt="x", num_inference_steps=2, seed=1)
    np.testing.assert_array_equal(a, b)


def _write_v1_torch_layout(root, params):
    """Write a synthetic reference-layout (torch-format) ppt-v1 checkpoint
    tree under ``root`` from a flax param tree."""
    from safetensors.numpy import save_file

    from tests.test_convert import tree_to_torch_sd

    for sub in ("unet", "text_encoder", "vae"):
        os.makedirs(root / sub)
    save_file(tree_to_torch_sd(params["unet"]),
              str(root / "unet" / "model.safetensors"))
    # vae quant convs at diffusers top level
    vae_sd = tree_to_torch_sd(params["vae"])
    fixed = {}
    for k, v in vae_sd.items():
        k2 = k.replace("encoder.quant_conv.", "quant_conv.")
        k2 = k2.replace("decoder.post_quant_conv.", "post_quant_conv.")
        fixed[k2] = v
    save_file(fixed, str(root / "vae" / "model.safetensors"))
    clip_sd = tree_to_torch_sd(params["text_encoder"], clip=True)
    ext = clip_sd.pop("text_model.embeddings.external_embedding.weight")
    tok_w = clip_sd.pop("text_model.embeddings.token_embedding.weight")
    clip_sd["text_model.embeddings.token_embedding.wrapped.weight"] = tok_w
    for i, name in enumerate(("P_ctxt", "P_shape", "P_obj")):
        clip_sd[
            f"text_model.embeddings.token_embedding.trainable_embeddings.{name}"
        ] = ext[i * 10:(i + 1) * 10]
    save_file(clip_sd, str(root / "text_encoder" / "model.safetensors"))


def test_load_ppt_v1_from_torch_layout(tmp_path):
    """Full loader path: synthetic reference-layout checkpoint dir ->
    InpaintPipeline with identical outputs to the source params."""
    from powerpaint_tpu.io.checkpoint import load_ppt_v1

    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)

    root = tmp_path / "ppt-v1"
    _write_v1_torch_layout(root, params)

    loaded = load_ppt_v1(str(root), config=cfg, dtype=jnp.float32)
    # loaded pipeline must produce identical outputs to the source stack
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    src = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[8:40, 8:40] = 1.0
    a = src(img, mask, prompt="t", num_inference_steps=2, seed=1)
    b = loaded(img, mask, prompt="t", num_inference_steps=2, seed=1)
    np.testing.assert_array_equal(a, b)


def test_load_ppt_v1_auto_registers_safety_checker(tmp_path):
    """ppt-v1 default-ON safety parity (reference runs the checker by
    default, pipeline_PowerPaint.py:520-533): a ``safety_checker/`` dir
    with converted weights in the checkpoint tree auto-registers the CLIP
    checker; without it nothing registers (the v2 / weightless default,
    app.py:163)."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    from safetensors.numpy import save_file

    from powerpaint_tpu.core import safety
    from powerpaint_tpu.io.checkpoint import load_ppt_v1

    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    root = tmp_path / "ppt-v1"
    _write_v1_torch_layout(root, params)

    safety.register_safety_checker(None)
    try:
        # no safety_checker/ dir -> stays unregistered
        load_ppt_v1(str(root), config=cfg, dtype=jnp.float32)
        assert safety.get_safety_checker() is None

        # write a real (tiny) StableDiffusionSafetyChecker state dict:
        # CLIP tower under the doubled vision_model. prefix + concept
        # tables, as diffusers serializes it
        torch.manual_seed(0)
        hf = transformers.CLIPVisionModelWithProjection(
            transformers.CLIPVisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, image_size=32, patch_size=8,
                projection_dim=16,
            )
        ).eval()
        sd = {}
        for k, v in hf.state_dict().items():
            k2 = "vision_model." + k if k.startswith("vision_model.") else k
            sd[k2] = v.numpy()
        # nonzero concept rows (zero rows make the cosine NaN) with
        # thresholds of -2: every image scores cos >= -1 > -2 -> flagged
        cr = np.random.RandomState(1)
        sd["concept_embeds"] = cr.randn(3, 16).astype(np.float32)
        sd["concept_embeds_weights"] = np.full((3,), -2.0, np.float32)
        sd["special_care_embeds"] = cr.randn(2, 16).astype(np.float32)
        sd["special_care_embeds_weights"] = np.full((2,), 2.0, np.float32)
        os.makedirs(root / "safety_checker")
        save_file(sd, str(root / "safety_checker" / "model.safetensors"))

        load_ppt_v1(str(root), config=cfg, dtype=jnp.float32)
        checker = safety.get_safety_checker()
        assert checker is not None
        # thresholds of -2 flag everything -> the registered checker is live
        imgs = (np.random.RandomState(0).rand(2, 40, 40, 3) * 255
                ).astype(np.uint8)
        out, flags = safety.apply_safety_checker(imgs)
        assert flags == [True, True] and (out == 0).all()

        # an already-registered checker is never clobbered
        sentinel = checker
        load_ppt_v1(str(root), config=cfg, dtype=jnp.float32)
        assert safety.get_safety_checker() is sentinel
    finally:
        safety.register_safety_checker(None)


def test_load_ppt_v1_missing_dir_raises(tmp_path):
    from powerpaint_tpu.io.checkpoint import load_ppt_v1

    with pytest.raises(FileNotFoundError):
        load_ppt_v1(str(tmp_path))


def test_load_ppt_v1_asymmetric_vae(tmp_path):
    """Loader detects AsymmetricAutoencoderKL checkpoints (condition tower
    keys) and builds the conditional-decoder config automatically."""
    from safetensors.numpy import save_file

    from tests.test_convert import tree_to_torch_sd
    from tests.test_asymmetric_vae import asym_cfg
    from powerpaint_tpu.io.checkpoint import load_ppt_v1
    from powerpaint_tpu.models.vae import AutoencoderKL

    cfg = tiny_v1_config().replace(vae=asym_cfg())
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)

    root = tmp_path / "ppt-v1-asym"
    for sub in ("unet", "text_encoder", "vae"):
        os.makedirs(root / sub)
    save_file(tree_to_torch_sd(params["unet"]),
              str(root / "unet" / "model.safetensors"))
    vae_sd = tree_to_torch_sd(params["vae"])
    fixed = {}
    for k, v in vae_sd.items():
        k2 = k.replace("encoder.quant_conv.", "quant_conv.")
        k2 = k2.replace("decoder.post_quant_conv.", "post_quant_conv.")
        fixed[k2] = v
    save_file(fixed, str(root / "vae" / "model.safetensors"))
    clip_sd = tree_to_torch_sd(params["text_encoder"], clip=True)
    ext = clip_sd.pop("text_model.embeddings.external_embedding.weight")
    tok_w = clip_sd.pop("text_model.embeddings.token_embedding.weight")
    clip_sd["text_model.embeddings.token_embedding.wrapped.weight"] = tok_w
    for i, name in enumerate(("P_ctxt", "P_shape", "P_obj")):
        clip_sd[
            f"text_model.embeddings.token_embedding.trainable_embeddings.{name}"
        ] = ext[i * 10:(i + 1) * 10]
    save_file(clip_sd, str(root / "text_encoder" / "model.safetensors"))

    loaded = load_ppt_v1(str(root), config=tiny_v1_config(),
                         dtype=jnp.float32)
    assert loaded.config.vae.asymmetric
    assert loaded.config.vae.condition_layers == cfg.vae.condition_layers
    assert loaded.config.vae.up_channels == cfg.vae.up_channels

    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = loaded(img, mask, prompt="t", num_inference_steps=2, seed=1)
    assert out.shape == (1, 32, 32, 3)


def test_load_safety_checker(tmp_path):
    from safetensors.numpy import save_file

    from powerpaint_tpu.core.config import CLIPVisionConfig
    from powerpaint_tpu.io.checkpoint import load_safety_checker
    from powerpaint_tpu.models.clip_vision import StableDiffusionSafetyChecker

    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=8, projection_dim=16)
    m = StableDiffusionSafetyChecker(cfg, num_concepts=3, num_special=2,
                                     dtype=jnp.float32)
    params = jax.jit(m.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )["params"]

    # write the diffusers torch layout (doubled vision_model prefix)
    from tests.test_convert import tree_to_torch_sd

    sd = {}
    for k, v in tree_to_torch_sd(params).items():
        if k.startswith("vision_model."):
            k = "vision_model." + k  # the checkpoint's doubled prefix
        if k.endswith("embeddings.position_embedding"):
            k += ".weight"  # transformers nn.Embedding naming
        sd[k] = v
    d = tmp_path / "safety_checker"
    os.makedirs(d)
    save_file(sd, str(d / "model.safetensors"))

    checker = load_safety_checker(str(d))
    imgs = (np.random.RandomState(0).rand(1, 40, 40, 3) * 255).astype(
        np.uint8)
    flags = checker(imgs)
    assert isinstance(flags[0], bool)


def test_http_server_first_request_hook(pipe):
    """--aot-cache serve-mode contract (ADVICE round 2): the
    on_first_success hook fires exactly once, after the first successful
    request, and never fails a request."""
    import threading as _threading

    from powerpaint_tpu.serve.app import make_server

    calls = []
    server = make_server(pipe, port=0,
                         on_first_success=lambda: calls.append(1))
    port = server.server_address[1]
    t = _threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(0)
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        mask[16:48, 16:48] = 255
        payload = {
            "image_b64": _png_b64(img),
            "mask_b64": _png_b64(mask),
            "prompt": "a dog",
            "steps": 2,
            "short_side": 64,
        }

        # a FAILED request must not consume the hook
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/inpaint", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(bad)
        assert calls == []

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inpaint",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            r.read()
        assert calls == [1]
        with urllib.request.urlopen(req) as r:
            r.read()
        assert calls == [1]  # only once
    finally:
        server.shutdown()


def test_http_num_images_gallery(pipe):
    """num_images > 1 returns the JSON gallery form (reference result
    gallery, app.py:731-744): one PNG per image, per-image seeds."""
    from powerpaint_tpu.serve.app import make_server

    server = make_server(pipe, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(0)
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        mask[16:48, 16:48] = 255
        payload = {
            "image_b64": _png_b64(img),
            "mask_b64": _png_b64(mask),
            "prompt": "a dog",
            "task": "text-guided",
            "steps": 2,
            "short_side": 64,
            "num_images": 2,
            "seed": 9,
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inpaint",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "application/json"
            body = json.loads(r.read())
        assert len(body["images"]) == 2
        ims = [
            np.asarray(Image.open(io.BytesIO(base64.b64decode(b))))
            for b in body["images"]
        ]
        assert ims[0].shape == ims[1].shape
        # per-image seeds: the two gallery entries differ inside the mask
        assert not np.array_equal(ims[0], ims[1])
    finally:
        server.shutdown()


def test_http_bad_scheduler_combo_is_400(pipe):
    """lcm with more steps than the coarse grid (and unknown sampler
    names) must be a 400 validation response, not a 500 — the host-side
    check_scheduler dry-build (core/validation.py)."""
    from powerpaint_tpu.serve.app import make_server

    server = make_server(pipe, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(0)
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        mask[16:48, 16:48] = 255
        base = {
            "image_b64": _png_b64(img),
            "mask_b64": _png_b64(mask),
            "prompt": "a dog",
            "short_side": 64,
        }
        for extra in ({"scheduler": "lcm", "steps": 60},
                      {"scheduler": "nope", "steps": 2}):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/inpaint",
                data=json.dumps({**base, **extra}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req)
            assert exc.value.code == 400, extra
    finally:
        server.shutdown()
