"""Golden-asset harness: true-mask recovery + activation dump (runs on
random weights; the SSIM gate itself needs converted checkpoints)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

ASSETS = "/root/reference/assets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ASSETS), reason="reference assets not mounted"
)


def _cases():
    from golden_assets import CASES, extract_case

    return [(task, name, extract_case(name, task))
            for task, name, _, _ in CASES]


def test_masks_match_edited_regions():
    """The recovered mask must cover exactly the region where the reference
    result differs from the preserved original — pixels OUTSIDE the mask
    (plus a blur margin) must match between original and result."""
    cases = _cases()
    for task, name, c in cases:
        assert c.original.shape == c.reference.shape, name
        assert 0.05 < c.mask.mean() < 0.6, (name, c.mask.mean())
        if c.clean is None and task != "image-outpainting":
            continue
        base = c.original.astype(np.float32)
        ref = c.reference.astype(np.float32)
        # dilate the mask by ~8px (reference composites with a blurred mask)
        from numpy.lib.stride_tricks import sliding_window_view

        k, pad = 17, 8
        dil = sliding_window_view(
            np.pad(c.mask, pad, mode="edge"), (k, k)
        ).max((-2, -1))
        outside = dil < 0.5
        assert outside.mean() > 0.2, name  # enough unmasked area to check
        d = np.abs(base - ref).mean(-1)[outside]
        assert d.mean() < 8.0, (name, d.mean())  # jpeg-noise level only


def test_extraction_is_deterministic():
    from golden_assets import extract_case

    a = extract_case("gradio_objremoval", "object-removal")
    b = extract_case("gradio_objremoval", "object-removal")
    np.testing.assert_array_equal(a.mask, b.mask)


def test_dump_activations_runs_end_to_end(tmp_path):
    """--dump-activations works on random weights (the localization tool
    for when real checkpoints land)."""
    from golden_eval import dump_activations

    from powerpaint_tpu.controller import PowerPaint
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
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    pp = PowerPaint(InpaintPipeline(cfg, params, tok, dtype=jnp.float32))

    out = tmp_path / "acts.npz"
    dump_activations(pp, str(out))
    data = np.load(out)
    keys = list(data.keys())
    assert "__output__" in keys
    # per-block coverage: down, mid, up and conv_in/out captured
    joined = "\n".join(keys)
    for want in ("down_blocks_0", "mid_block", "up_blocks_0", "__call__"):
        assert want in joined, want
    assert all(np.isfinite(data[k]).all() for k in keys[:10])


def test_control_case_extraction():
    """ControlNet golden cases: painted input, control source, result all
    extract with sane masks; the outside-mask region matches the result."""
    from golden_assets import CONTROL_CASES, extract_control_case

    for ct in CONTROL_CASES:
        c = extract_control_case(ct)
        assert c.original.shape == c.reference.shape, ct
        assert c.control_source.shape == c.reference.shape, ct
        assert 0.05 < c.mask.mean() < 0.7, (ct, c.mask.mean())
        assert c.conditioning_scale == 0.6
