"""ControlNet first-class guarantees (round-3): per-image seeds make
batched == standalone, micro-batcher admits control requests, HTTP API
carries control fields (reference ControlNet UI surface, app.py:527-539)."""

import base64
import io as _io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from powerpaint_tpu.io.params import init_params  # noqa: E402
from powerpaint_tpu.pipelines.controlnet import ControlNetPipeline  # noqa: E402
from powerpaint_tpu.tasks.control import canny  # noqa: E402
from powerpaint_tpu.testing import tiny_v1_controlnet_config  # noqa: E402
from powerpaint_tpu.text.tokenizer import (  # noqa: E402
    HashTokenizer,
    TokenizerWrapper,
    add_task_tokens,
)


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_v1_controlnet_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    # perturb the (zero-init) controlnet output convs so control actually
    # influences the result
    import jax.random as jr

    key = jr.PRNGKey(9)
    cn = params["controlnet"]
    cn = cn[0] if isinstance(cn, (tuple, list)) else cn

    def perturb(tree, key):
        for name, sub in list(tree.items()):
            if name.startswith("controlnet_") and isinstance(sub, dict) \
                    and "kernel" in sub:
                key, k = jr.split(key)
                sub["kernel"] = 0.05 * jr.normal(
                    k, sub["kernel"].shape, jnp.float32
                )
            elif isinstance(sub, dict):
                key = perturb(sub, key)
        return key

    perturb(cn, key)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    return ControlNetPipeline(cfg, params, tok, dtype=jnp.float32)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    imgs = [(rng.rand(64, 64, 3) * 255).astype(np.uint8) for _ in range(3)]
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    ctrls = [canny(im) for im in imgs]
    return imgs, mask, ctrls


def test_batched_cn_equals_standalone(pipe, inputs):
    """The v1 determinism contract now holds for control requests: each
    image's noise depends only on ITS seed."""
    imgs, mask, ctrls = inputs
    solo = [
        pipe(imgs[i], mask, control_image=ctrls[i], prompt=f"p{i}",
             seed=10 + i, num_inference_steps=2)[0]
        for i in range(3)
    ]
    batched = pipe(
        imgs, [mask] * 3, control_image=ctrls,
        prompt=["p0", "p1", "p2"], seed=[10, 11, 12],
        num_inference_steps=2,
    )
    for i in range(3):
        # the noise streams are identical by construction (per-image keys);
        # batch-1 vs batch-3 are different XLA programs, so allow ulp-level
        # conv-reduction differences (1 uint8 lsb)
        diff = np.abs(batched[i].astype(np.int32) - solo[i].astype(np.int32))
        assert diff.max() <= 1, (i, diff.max(), (diff > 0).mean())


def test_cn_per_call_surface(pipe, inputs):
    imgs, mask, ctrls = inputs
    a = pipe(imgs[0], mask, control_image=ctrls[0], prompt="x",
             num_inference_steps=2, seed=1)
    b = pipe(imgs[0], mask, control_image=ctrls[0], prompt="x",
             num_inference_steps=2, seed=1, clip_skip=1)
    assert (a != b).any()
    seen = []
    pipe(imgs[0], mask, control_image=ctrls[0], prompt="x",
         num_inference_steps=3, seed=1,
         callback=lambda i, lat: seen.append(i))
    assert seen == [0, 1, 2]


def test_batcher_admits_control(pipe, inputs):
    from powerpaint_tpu.serve.batcher import MicroBatcher

    imgs, mask, ctrls = inputs
    solo = [
        pipe(imgs[i], mask, control_image=ctrls[i], prompt=f"p{i}",
             seed=20 + i, num_inference_steps=2)[0]
        for i in range(3)
    ]
    batcher = MicroBatcher(pipe, max_batch=4, window_ms=300.0)
    try:
        results = [None] * 3
        errs = []

        def worker(i):
            try:
                results[i] = batcher.submit(
                    imgs[i], mask, control_image=ctrls[i], prompt=f"p{i}",
                    seed=20 + i, num_inference_steps=2,
                )
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errs, errs
        for i in range(3):
            diff = np.abs(results[i].astype(np.int32)
                          - solo[i].astype(np.int32))
            assert diff.max() <= 1, (i, diff.max())
    finally:
        batcher.close()


def _b64_png(arr):
    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_http_control_request(pipe, inputs):
    from powerpaint_tpu.serve.app import make_server

    imgs, mask, ctrls = inputs
    mask_u8 = (mask * 255).astype(np.uint8)
    server = make_server(pipe, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        payload = {
            "image_b64": _b64_png(imgs[0]),
            "mask_b64": _b64_png(mask_u8),
            "prompt": "a cat",
            "steps": 2,
            "seed": 7,
            "short_side": 64,
            "bucket": False,
            "scheduler": "ddim",
            "strength": 1.0,
            "control_type": "canny",
            "control_image_b64": _b64_png(imgs[0]),
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inpaint",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "image/png"
            body = resp.read()
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

        # unsupported field on this pipeline -> 400, not a crash
        bad = dict(payload)
        bad["branch_cache_interval"] = 2
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inpaint",
            data=json.dumps(bad).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=600)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_multi_height_width_resizes_controls(pipe, inputs):
    """The multi-request form must resize control images with the canvas
    (height/width), exactly like the single-request form — otherwise the
    cond embedding lands on a different latent grid and the jitted
    generate dies on a shape mismatch."""
    imgs, mask, ctrls = inputs
    big = [np.repeat(np.repeat(im, 2, 0), 2, 1) for im in imgs[:2]]
    big_mask = np.repeat(np.repeat(mask, 2, 0), 2, 1)
    big_ctrl = [np.repeat(np.repeat(c, 2, 0), 2, 1) for c in ctrls[:2]]
    out = pipe(big, [big_mask] * 2, control_image=big_ctrl,
               prompt=["p0", "p1"], seed=[1, 2], num_inference_steps=2,
               height=64, width=64)
    assert out[0].shape == (64, 64, 3)


def test_multi_forwards_prompt_embeds(pipe, inputs):
    """__call__ accepts prompt_embeds/negative_prompt_embeds in the
    multi-request form and actually uses them (they were once silently
    dropped to None)."""
    imgs, mask, ctrls = inputs
    base = pipe(imgs[:2], [mask] * 2, control_image=ctrls[:2],
                prompt=["p0", "p1"], seed=[1, 2], num_inference_steps=2)
    d = pipe.config.text_encoder.hidden_size
    rng = np.random.RandomState(7)
    pe = rng.randn(2, 77, d).astype(np.float32)
    ne = rng.randn(2, 77, d).astype(np.float32)
    out = pipe(imgs[:2], [mask] * 2, control_image=ctrls[:2],
               prompt=["p0", "p1"], seed=[1, 2], num_inference_steps=2,
               prompt_embeds=pe, negative_prompt_embeds=ne)
    assert (out[0] != base[0]).any()


def test_multi_per_branch_length_validation(pipe, inputs):
    """Wrong-length per-branch lists must raise, not zip-truncate."""
    from powerpaint_tpu.core.validation import InputValidationError

    imgs, mask, ctrls = inputs
    with pytest.raises(InputValidationError,
                       match="controlnet_conditioning_scale"):
        pipe(imgs[:2], [mask] * 2, control_image=ctrls[:2],
             prompt=["p0", "p1"], seed=[1, 2], num_inference_steps=2,
             controlnet_conditioning_scale=[1.0, 1.0, 1.0])
