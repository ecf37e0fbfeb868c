"""Serving micro-batcher: concurrent requests coalesce into one generate
and reproduce their standalone results."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu.io.params import init_params
from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
from powerpaint_tpu.serve.batcher import MicroBatcher
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


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    image = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    return image, mask


def test_multi_prompt_batch_matches_standalone(pipe, inputs):
    """The pipeline's multi-request form: per-image prompt/seed/guidance;
    each slot must reproduce the standalone single-request result."""
    image, mask = inputs
    reqs = [
        dict(prompt="a red ball", seed=3, guidance_scale=7.5,
             fitting_degree=1.0),
        dict(prompt="a blue cube", seed=9, guidance_scale=5.0,
             fitting_degree=0.6),
        dict(prompt="", seed=42, guidance_scale=12.0, fitting_degree=1.0),
    ]
    single = [
        pipe(image, mask, num_inference_steps=2, **r)[0] for r in reqs
    ]
    batched = pipe(
        [image] * 3, [mask] * 3,
        prompt=[r["prompt"] for r in reqs],
        seed=[r["seed"] for r in reqs],
        guidance_scale=[r["guidance_scale"] for r in reqs],
        fitting_degree=[r["fitting_degree"] for r in reqs],
        num_inference_steps=2,
    )
    assert batched.shape[0] == 3
    for i in range(3):
        diff = np.abs(batched[i].astype(np.int32)
                      - single[i].astype(np.int32))
        assert diff.max() <= 2, (i, diff.max())
    # distinct requests produce distinct outputs
    assert not np.array_equal(batched[0], batched[1])


def test_micro_batcher_concurrent_requests(pipe, inputs):
    image, mask = inputs
    batcher = MicroBatcher(pipe, max_batch=4, window_ms=200.0)
    try:
        reqs = [
            dict(prompt="a red ball", seed=3, num_inference_steps=2),
            dict(prompt="a blue cube", seed=9, num_inference_steps=2),
            dict(prompt="grass", seed=1, num_inference_steps=2),
        ]
        single = [pipe(image, mask, **r)[0] for r in reqs]

        results = [None] * 3
        errors = []

        def worker(i):
            try:
                results[i] = batcher.submit(image, mask, **reqs[i])
            except BaseException as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        for i in range(3):
            assert results[i] is not None
            diff = np.abs(results[i].astype(np.int32)
                          - single[i].astype(np.int32))
            assert diff.max() <= 2, (i, diff.max())
    finally:
        batcher.close()


def test_micro_batcher_separates_incompatible_groups(pipe, inputs):
    """Different step counts cannot share a compiled program — they must
    still run (as separate batches) and return correct shapes."""
    image, mask = inputs
    batcher = MicroBatcher(pipe, max_batch=4, window_ms=50.0)
    try:
        results = {}

        def worker(name, steps):
            results[name] = batcher.submit(
                image, mask, prompt="x", seed=0, num_inference_steps=steps
            )

        threads = [
            threading.Thread(target=worker, args=("a", 2)),
            threading.Thread(target=worker, args=("b", 3)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert results["a"].shape == (32, 32, 3)
        assert results["b"].shape == (32, 32, 3)
    finally:
        batcher.close()


def test_micro_batcher_v2_pipeline(inputs):
    """v2 (BrushNet) requests batch too, reproducing standalone results."""
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline
    from powerpaint_tpu.testing import tiny_v2_config

    cfg = tiny_v2_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    pipe = BrushNetPipeline(cfg, params, tok, dtype=jnp.float32)

    image, mask = inputs
    reqs = [
        dict(prompt="a red ball", seed=3, num_inference_steps=2),
        dict(prompt="a blue cube", seed=9, num_inference_steps=2),
    ]
    single = [pipe(image, mask, **r)[0] for r in reqs]

    batcher = MicroBatcher(pipe, max_batch=4, window_ms=200.0)
    try:
        results = [None] * 2

        def worker(i):
            results[i] = batcher.submit(image, mask, **reqs[i])

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=600)
        for i in range(2):
            assert results[i] is not None
            diff = np.abs(results[i].astype(np.int32)
                          - single[i].astype(np.int32))
            assert diff.max() <= 2, (i, diff.max())
    finally:
        batcher.close()
