"""Gradio UI wiring (serve/app.py::_launch_gradio) under a fake gradio.

gradio is not installed in this container, so the Blocks UI — the direct
counterpart of the reference's app.py:563-749 — would otherwise be
import-dead code.  A minimal fake gradio module records the component
graph and event handlers; the test then drives the recorded handlers
(tab selection -> visibility updates, Run -> infer) against a real tiny
pipeline, covering the whole UI code path except gradio's own rendering.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class _Component:
    """Records constructor kwargs and event registrations."""

    def __init__(self, *a, **kw):
        self.args = a
        self.kw = kw
        self.events = []  # (kind, fn, inputs, outputs)

    # context-manager components (Blocks/Row/Column/Tab/Accordion)
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def select(self, fn, inputs=None, outputs=None):
        self.events.append(("select", fn, inputs, outputs))

    def click(self, fn, inputs=None, outputs=None):
        self.events.append(("click", fn, inputs, outputs))

    def queue(self):
        return self

    def launch(self, **kw):
        self.launched = kw


def _fake_gradio():
    g = types.ModuleType("gradio")
    g.components = []

    def mk(name):
        def ctor(*a, **kw):
            c = _Component(*a, **kw)
            c.kind = name
            g.components.append(c)
            return c

        return ctor

    for name in ("Blocks", "Markdown", "Row", "Column", "Image", "Radio",
                 "Textbox", "Slider", "Checkbox", "Tab", "Button",
                 "Accordion", "Gallery"):
        setattr(g, name, mk(name))
    g.update = lambda **kw: dict(kw)
    return g


@pytest.fixture
def tiny_cn_pipe():
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.pipelines.controlnet import ControlNetPipeline
    from powerpaint_tpu.testing import tiny_v1_controlnet_config
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v1_controlnet_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    # un-zero the zero-init convs (the reference's zero-init contract makes
    # a fresh ControlNet a no-op) so the control branch visibly acts
    cn = params["controlnet"]
    cn["controlnet_mid_block"]["kernel"] = (
        jnp.ones_like(cn["controlnet_mid_block"]["kernel"]) * 0.05
    )
    ck = cn["controlnet_cond_embedding"]["conv_out"]["kernel"]
    cn["controlnet_cond_embedding"]["conv_out"]["kernel"] = (
        jnp.ones_like(ck) * 0.05
    )
    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    return ControlNetPipeline(cfg, params, tok, dtype=jnp.float32)


def _launch(monkeypatch, pipe):
    fake = _fake_gradio()
    monkeypatch.setitem(sys.modules, "gradio", fake)
    # the UI hardcodes the reference's 640/512 short sides; shrink for CPU
    from powerpaint_tpu.tasks import preprocess

    monkeypatch.setattr(
        preprocess, "resize_short_side",
        lambda img, short: preprocess.__dict__["crop_to_multiple_of_8"](img),
    )
    from powerpaint_tpu.serve.app import _launch_gradio

    args = types.SimpleNamespace(port=7861, share=False)
    assert _launch_gradio(pipe, args) == 0
    return fake


def _handlers(fake):
    tabs = [c for c in fake.components if c.kind == "Tab"]
    btn = [c for c in fake.components if c.kind == "Button"][0]
    assert len(tabs) == 4 and btn.events, "UI graph incomplete"
    selects = {t.args[0]: t.events[0][1] for t in tabs}
    infer = btn.events[0][1]
    return selects, infer


def test_tab_selection_visibility(monkeypatch, tiny_cn_pipe):
    fake = _launch(monkeypatch, tiny_cn_pipe)
    selects, _ = _handlers(fake)

    # each tab's select handler returns [task_name, 7 visibility updates]
    out = selects["Shape-guided object inpainting"]()
    assert out[0] == "shape-guided"
    assert out[1] == {"visible": True}  # fitting slider shown
    assert out[2] == {"visible": False}  # expansion hidden

    out = selects["Image outpainting"]()
    assert out[0] == "image-outpainting"
    assert out[2] == {"visible": True} and out[3] == {"visible": True}

    out = selects["Text-guided object inpainting"]()
    assert out[0] == "text-guided"
    # ControlNet sub-UI visible: the pipeline has a _generate_cn branch
    assert out[4] == {"visible": True}

    out = selects["Object removal inpainting"]()
    assert out[0] == "object-removal"
    assert all(o == {"visible": False} for o in out[1:])


def test_infer_text_guided_and_outpaint(monkeypatch, tiny_cn_pipe):
    fake = _launch(monkeypatch, tiny_cn_pipe)
    _, infer = _handlers(fake)

    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255

    results, masks = infer(
        img, mask, "text-guided", "a dog", "", 1.0, 1.0, 1.0,
        False, "canny", 0.5, None, 2, 7.5, 3,
    )
    assert results[0].shape == img.shape and results[0].dtype == np.uint8
    assert masks[0].shape == img.shape  # red overlay
    # composited result preserves far-outside pixels
    assert np.array_equal(results[0][:2, :2], img[:2, :2])

    # outpainting builds its own canvas (1.5x expansion) and mask
    results, masks = infer(
        img, None, "image-outpainting", "a dog", "", 1.0, 1.5, 1.5,
        False, "canny", 0.5, None, 2, 7.5, 3,
    )
    h, w = results[0].shape[:2]
    assert h > 64 and w > 64


def test_infer_controlnet_branch(monkeypatch, tiny_cn_pipe):
    fake = _launch(monkeypatch, tiny_cn_pipe)
    _, infer = _handlers(fake)

    rng = np.random.RandomState(1)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255

    out_ctrl, _ = infer(
        img, mask, "text-guided", "a dog", "", 1.0, 1.0, 1.0,
        True, "canny", 0.5, img, 2, 7.5, 3,
    )
    out_plain, _ = infer(
        img, mask, "text-guided", "a dog", "", 1.0, 1.0, 1.0,
        False, "canny", 0.5, None, 2, 7.5, 3,
    )
    # the canny-conditioned result differs from the unconditioned one
    assert not np.array_equal(out_ctrl[0], out_plain[0])
