"""Async dispatch (pipelines/async_dispatch.py) + pipelined micro-batcher.

The reference serves strictly sequentially (eager torch); here dispatch
and fetch are decoupled so a serving loop overlaps request N+1's host
work + upload with request N's device compute.  These tests pin the
contract: submit() == __call__ bit-exact, results are stable across
repeated fetches, and the batcher's fetch-thread handoff preserves
per-request routing and error propagation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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
    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    return InpaintPipeline(cfg, params, tok, dtype=jnp.float32)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    return img, mask


def test_submit_matches_call(pipe, inputs):
    img, mask = inputs
    ref = pipe(img, mask, prompt="a dog", num_inference_steps=2, seed=7)
    pending = pipe.submit(img, mask, prompt="a dog",
                          num_inference_steps=2, seed=7)
    out = pending.result()
    np.testing.assert_array_equal(ref, out)
    # repeated fetch returns the same (cached) host array
    assert pending.result() is out
    assert pending.done()


def test_submit_overlapping_dispatches(pipe, inputs):
    """Several in-flight dispatches complete independently and match
    their synchronous counterparts (per-seed noise keys: no cross-talk)."""
    img, mask = inputs
    pendings = [
        pipe.submit(img, mask, prompt="a dog", num_inference_steps=2,
                    seed=s)
        for s in (1, 2, 3)
    ]
    refs = [
        pipe(img, mask, prompt="a dog", num_inference_steps=2, seed=s)
        for s in (1, 2, 3)
    ]
    for p, r in zip(pendings, refs):
        np.testing.assert_array_equal(p.result(), r)


def test_call_still_returns_numpy(pipe, inputs):
    img, mask = inputs
    out = pipe(img, mask, prompt="a dog", num_inference_steps=2, seed=1)
    assert isinstance(out, np.ndarray) and out.dtype == np.uint8


def test_batcher_pipelined_groups(pipe, inputs):
    """Back-to-back groups with different compiled programs flow through
    the dispatch->fetch pipeline in order, each matching standalone."""
    from powerpaint_tpu.serve.batcher import MicroBatcher

    img, mask = inputs
    batcher = MicroBatcher(pipe, max_batch=2, window_ms=5.0)
    try:
        import threading

        results = {}

        def work(seed, steps):
            results[(seed, steps)] = batcher.submit(
                img, mask, prompt="a dog", seed=seed,
                num_inference_steps=steps,
            )

        # two distinct step counts -> two groups -> two pipelined batches
        ts = [threading.Thread(target=work, args=(s, n))
              for s, n in ((1, 2), (2, 2), (3, 3))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        for (seed, steps), got in results.items():
            ref = pipe(img, mask, prompt="a dog", seed=seed,
                       num_inference_steps=steps)[0]
            # batch-B and batch-1 compile different XLA programs -> tiny
            # float diffs at the uint8 boundary (test_batcher.py contract)
            diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
            assert diff.max() <= 2, (seed, steps, diff.max())
    finally:
        batcher.close()


def test_batcher_error_propagates_from_fetch_path(pipe, inputs):
    from powerpaint_tpu.serve.batcher import MicroBatcher

    img, mask = inputs
    batcher = MicroBatcher(pipe, max_batch=2, window_ms=5.0)
    try:
        with pytest.raises(Exception):
            batcher.submit(img, mask, prompt="a dog", seed=0,
                           num_inference_steps=2, task="not-a-task")
        # the batcher survives a failed request
        ok = batcher.submit(img, mask, prompt="a dog", seed=0,
                            num_inference_steps=2)
        assert ok.shape == img.shape
    finally:
        batcher.close()


def test_sync_pipe_fallback(inputs):
    """A pipeline without submit() still works through the batcher."""
    from powerpaint_tpu.serve.batcher import MicroBatcher

    img, mask = inputs

    class SyncPipe:
        def __call__(self, image, mask, **kwargs):
            if isinstance(image, list):
                return np.stack([i + 1 for i in image])
            n = kwargs.get("num_images_per_prompt", 1)
            return np.tile((image + 1)[None], (n, 1, 1, 1))

    batcher = MicroBatcher(SyncPipe(), max_batch=2, window_ms=5.0)
    try:
        out = batcher.submit(img, mask, prompt="x", seed=0)
        np.testing.assert_array_equal(out, img + 1)
    finally:
        batcher.close()


def test_submit_rejects_callback(pipe, inputs):
    """The per-call callback slot is read at device-execution time, so an
    overlapping submit() would misroute step callbacks across requests —
    the async surface refuses them up front."""
    from powerpaint_tpu.core.validation import InputValidationError

    img, mask = inputs
    with pytest.raises(InputValidationError, match="callback"):
        pipe.submit(img, mask, prompt="a dog", num_inference_steps=2,
                    seed=1, callback=lambda i, lat: None)
