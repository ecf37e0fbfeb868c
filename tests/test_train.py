"""Training subsystem: losses go down, freezing masks hold, LoRA factors
round-trip through the io/lora loader, sharded == single-device updates,
and checkpoints resume exactly."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu.io.params import init_params
from powerpaint_tpu.testing import tiny_v1_config, tiny_v2_config
from powerpaint_tpu.text.tokenizer import (
    HashTokenizer,
    TokenizerWrapper,
    add_task_tokens,
)
from powerpaint_tpu.train import (
    SyntheticSource,
    batches,
    make_v1_loss,
    make_v2_loss,
)
from powerpaint_tpu.train.step import (
    init_train_state,
    make_optimizer,
    make_train_step,
    trainable_mask,
)


def _tok():
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    return tok


@pytest.fixture(scope="module")
def v1_setup():
    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = _tok()
    data = batches(SyntheticSource(hw=32, seed=1), tok, batch_size=2,
                   version="ppt-v1", seed=2)
    return cfg, params, tok, data


def test_batches_shapes(v1_setup):
    _, _, _, data = v1_setup
    b = next(data)
    assert b["image_u8"].shape == (2, 32, 32, 3)
    assert b["mask_u8"].shape == (2, 32, 32, 1)
    assert b["ids"].shape[0] == 2 and b["ids"].ndim == 2
    assert b["mask_u8"].max() == 255 and b["image_u8"].dtype == np.uint8


def test_v1_loss_decreases(v1_setup):
    cfg, params, tok, data = v1_setup
    loss_fn = make_v1_loss(cfg, dtype=jnp.float32)
    labels = trainable_mask(params, "v1")
    tx = make_optimizer(2e-3, labels=labels)
    state = init_train_state(params, tx)
    step = make_train_step(loss_fn, tx, donate=False)

    # own deterministic batch, overfit it (the shared module iterator's
    # position depends on which tests ran first on this xdist worker, and
    # an 12-step loss-decrease bound is batch-dependent)
    own = batches(SyntheticSource(hw=32, seed=11), _tok(), batch_size=2,
                  version="ppt-v1", seed=12)
    batch = next(own)
    rng = jax.random.PRNGKey(0)
    # deterministic before/after comparison: same eval rng (the training
    # steps themselves draw fresh t/eps per step, so per-step loss is noisy)
    eval_rng = jax.random.PRNGKey(42)
    eval_loss = jax.jit(lambda p: loss_fn(p, batch, eval_rng)[0])
    before = float(eval_loss(state.params))
    for _ in range(12):
        state, metrics = step(state, batch, rng)
    after = float(eval_loss(state.params))
    assert np.isfinite(before) and np.isfinite(after)
    assert after < before * 0.9, (before, after)


def test_v1_mask_freezes_vae(v1_setup):
    cfg, params, tok, data = v1_setup
    loss_fn = make_v1_loss(cfg, dtype=jnp.float32)
    labels = trainable_mask(params, "v1")
    tx = make_optimizer(1e-2, labels=labels)
    state = init_train_state(params, tx)
    step = make_train_step(loss_fn, tx, donate=False)
    state2, _ = step(state, next(data), jax.random.PRNGKey(1))
    # VAE untouched, UNet moved
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params["vae"], state2.params["vae"])
    moved = jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["unet"], state2.params["unet"]))
    assert max(moved) > 0


def test_task_tokens_mode_trains_only_external_rows(v1_setup):
    cfg, params, tok, data = v1_setup
    loss_fn = make_v1_loss(cfg, dtype=jnp.float32)
    labels = trainable_mask(params, "task_tokens")
    tx = make_optimizer(1e-2, weight_decay=0.0, labels=labels)
    state = init_train_state(params, tx)
    step = make_train_step(loss_fn, tx, donate=False)
    state2, _ = step(state, next(data), jax.random.PRNGKey(1))
    te0, te1 = state.params["text_encoder"], state2.params["text_encoder"]
    assert float(jnp.abs(te0["external_embedding"]
                         - te1["external_embedding"]).max()) > 0
    for k in te0:
        if k == "external_embedding":
            continue
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), te0[k], te1[k])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params["unet"], state2.params["unet"])


def test_v2_mode_trains_branch_not_base():
    cfg = tiny_v2_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = _tok()
    data = batches(SyntheticSource(hw=32, seed=3), tok, batch_size=2,
                   version="ppt-v2", seed=4)
    loss_fn = make_v2_loss(cfg, dtype=jnp.float32)
    labels = trainable_mask(params, "v2")
    tx = make_optimizer(2e-3, labels=labels)
    state = init_train_state(params, tx)
    step = make_train_step(loss_fn, tx, donate=False)

    batch = next(data)
    rng = jax.random.PRNGKey(0)
    eval_rng = jax.random.PRNGKey(42)
    eval_loss = jax.jit(lambda p: loss_fn(p, batch, eval_rng)[0])
    before = float(eval_loss(state.params))
    state2 = state
    for _ in range(8):
        state2, metrics = step(state2, batch, rng)
    after = float(eval_loss(state2.params))
    assert after < before, (before, after)
    # base UNet + plain text encoder + VAE frozen; brushnet moved
    for name in ("unet", "text_encoder", "vae"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            state.params[name], state2.params[name])
    moved = max(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["brushnet"], state2.params["brushnet"])))
    assert moved > 0


def test_lora_training_and_roundtrip(v1_setup):
    from powerpaint_tpu.io.lora import merge_lora
    from powerpaint_tpu.train.loss import make_lora_loss
    from powerpaint_tpu.train.lora import (
        apply_lora,
        export_lora_sd,
        init_lora_tree,
    )

    cfg, params, tok, data = v1_setup
    lora = init_lora_tree(params["unet"], rank=2, rng=jax.random.PRNGKey(5))
    # up starts at zero -> merged == base
    merged0 = apply_lora(params["unet"], lora)
    diffs = jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), params["unet"], merged0))
    assert max(diffs) == 0.0

    base_loss = make_v1_loss(cfg, dtype=jnp.float32)
    loss_fn = make_lora_loss(base_loss, params)
    tx = make_optimizer(5e-3, weight_decay=0.0)
    state = init_train_state(lora, tx)
    step = make_train_step(loss_fn, tx, donate=False)
    # own deterministic batch: the shared iterator's position depends on
    # xdist scheduling, and the 8-step loss-decrease assertion below is
    # batch-dependent (seen flaky under -n 4)
    own = batches(SyntheticSource(hw=32, seed=41), _tok(), batch_size=2,
                  version="ppt-v1", seed=42)
    batch = next(own)
    rng = jax.random.PRNGKey(0)
    eval_rng = jax.random.PRNGKey(42)
    eval_loss = jax.jit(lambda lt: loss_fn(lt, batch, eval_rng)[0])
    before = float(eval_loss(state.params))
    for _ in range(8):
        state, metrics = step(state, batch, rng)
    assert float(eval_loss(state.params)) < before

    # export -> io/lora.merge_lora == apply_lora (format round-trip)
    sd = export_lora_sd(state.params, target="unet")
    assert any(k.endswith(".lora_A.weight") for k in sd)
    merged_io, unmatched = merge_lora({"unet": params["unet"]}, sd)
    assert unmatched == [], unmatched
    merged_tr = apply_lora(params["unet"], state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        merged_io["unet"], merged_tr)


def test_sharded_train_step_matches_single_device(v1_setup):
    from powerpaint_tpu.parallel.mesh import build_mesh
    from powerpaint_tpu.train.step import replicate_state, shard_batch

    cfg, params, tok, _ = v1_setup
    loss_fn = make_v1_loss(cfg, dtype=jnp.float32)
    labels = trainable_mask(params, "v1")
    tx = make_optimizer(1e-3, labels=labels)
    step = make_train_step(loss_fn, tx, donate=False)

    # own deterministic batch (the shared module iterator's position
    # depends on which tests ran on this xdist worker)
    data = batches(SyntheticSource(hw=32, seed=21), _tok(), batch_size=2,
                   version="ppt-v1", seed=22)
    batch = next(data)
    batch = {k: np.concatenate([v] * 4, axis=0) for k, v in batch.items()}
    rng = jax.random.PRNGKey(9)

    s_single = init_train_state(params, tx)
    s1, m1 = step(s_single, batch, rng)

    mesh = build_mesh(jax.devices()[:8], model_parallel=1)
    s_repl = replicate_state(mesh, init_train_state(params, tx))
    s2, m2 = step(s_repl, shard_batch(mesh, batch), rng)

    # 8-way psum reassociates the batch reduction: allow fp32 drift
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    a = np.asarray(s1.params["text_encoder"]["external_embedding"])
    b = np.asarray(s2.params["text_encoder"]["external_embedding"])
    # post-Adam comparison: on elements whose gradient is ~0, a last-ulp
    # reassociation difference flips the normalized update's sign, moving
    # the element by up to 2*lr — bound by the step size, and require the
    # bulk to agree tightly
    diff = np.abs(a - b)
    assert diff.max() <= 2.1e-3, diff.max()  # 2 * lr + slack
    frac_tight = np.mean(diff <= 1e-5 + 1e-3 * np.abs(b))
    assert frac_tight >= 0.99, frac_tight


def test_fsdp_train_step_matches_replicated(v1_setup):
    """ZeRO/FSDP placement: params + moments sharded over the data axis,
    same update as the replicated run, and the output state KEEPS the
    sharded layout (the with_sharding_constraint in make_train_step)."""
    from powerpaint_tpu.parallel.mesh import DATA_AXIS, build_mesh
    from powerpaint_tpu.train.step import (
        fsdp_state,
        replicate_state,
        shard_batch,
    )

    cfg, params, tok, _ = v1_setup
    loss_fn = make_v1_loss(cfg, dtype=jnp.float32)
    labels = trainable_mask(params, "v1")
    tx = make_optimizer(1e-3, labels=labels)

    data = batches(SyntheticSource(hw=32, seed=31), _tok(), batch_size=2,
                   version="ppt-v1", seed=32)
    batch = next(data)
    batch = {k: np.concatenate([v] * 4, axis=0) for k, v in batch.items()}
    rng = jax.random.PRNGKey(11)

    mesh = build_mesh(jax.devices()[:8], model_parallel=1)
    sharded_batch = shard_batch(mesh, batch)

    step_repl = make_train_step(loss_fn, tx, donate=False)
    s_repl, m_repl = step_repl(
        replicate_state(mesh, init_train_state(params, tx)), sharded_batch,
        rng)

    placed, shardings = fsdp_state(mesh, init_train_state(params, tx))
    # big leaves are actually split over "data" (1/8 per chip), small ones
    # replicated
    big = placed.params["unet"]["mid_block"]["resnets_0"]["conv1"]["kernel"]
    assert DATA_AXIS in tuple(big.sharding.spec), big.sharding
    shard_bytes = big.addressable_shards[0].data.nbytes
    assert shard_bytes * 8 == big.nbytes
    step_fsdp = make_train_step(loss_fn, tx, donate=False,
                                state_shardings=shardings)
    s_fsdp, m_fsdp = step_fsdp(placed, sharded_batch, rng)

    np.testing.assert_allclose(float(m_repl["loss"]), float(m_fsdp["loss"]),
                               rtol=1e-5)
    # output state kept the FSDP layout (no silent re-replication)
    out_big = s_fsdp.params["unet"]["mid_block"]["resnets_0"]["conv1"][
        "kernel"]
    assert out_big.sharding == big.sharding
    # same update as replicated DP (same math, different placement); Adam
    # near-zero-gradient elements get the usual 2*lr reassociation bound
    a = np.asarray(s_repl.params["text_encoder"]["external_embedding"])
    b = np.asarray(s_fsdp.params["text_encoder"]["external_embedding"])
    d = np.abs(a - b)
    assert d.max() <= 2.1e-3, d.max()
    assert np.mean(d <= 1e-5 + 1e-3 * np.abs(b)) >= 0.99
    # moments sharded too: find one adam mu leaf bigger than the threshold
    mus = [x for x in jax.tree_util.tree_leaves(s_fsdp.opt_state)
           if hasattr(x, "sharding") and x.size >= 2**14]
    assert mus and any(DATA_AXIS in tuple(x.sharding.spec) for x in mus)


def test_trainer_checkpoint_exact_resume(v1_setup, tmp_path):
    from powerpaint_tpu.train.trainer import (
        Trainer,
        load_train_state,
        save_train_state,
    )

    cfg, params, tok, _ = v1_setup
    loss_fn = make_v1_loss(cfg, dtype=jnp.float32)
    labels = trainable_mask(params, "task_tokens")
    tx = make_optimizer(1e-3, labels=labels)
    step = make_train_step(loss_fn, tx, donate=False)

    def fresh_data():
        return batches(SyntheticSource(hw=32, seed=8), _tok(),
                       batch_size=2, version="ppt-v1", seed=9)

    ckpt = os.path.join(tmp_path, "state.npz")
    # run 4 steps (checkpoint written at the end of fit), then 2 more
    t1 = Trainer(step, init_train_state(params, tx), fresh_data(), seed=3)
    t1.fit(4, log_every=1, ckpt_path=ckpt)
    hist_a = t1.fit(2, log_every=1)

    # restore the step-4 state bit-exactly
    template = init_train_state(params, tx)
    restored = load_train_state(ckpt, template)
    assert int(restored.step) == 4

    # resume: same data stream (advanced past the 4 consumed batches) and
    # same seed -> the next 2 steps reproduce t1's metrics and params
    t2 = Trainer(step, restored, fresh_data(), seed=3)
    for _ in range(4):
        next(t2.data)
    hist_b = t2.fit(2, log_every=1)
    assert [m["loss"] for m in hist_a] == [m["loss"] for m in hist_b]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        t1.state.params, t2.state.params)

    # save/load round-trips the optimizer moments too
    save_train_state(ckpt, t1.state)
    again = load_train_state(ckpt, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        t1.state.opt_state, again.opt_state)


def test_gradient_accumulation_matches_big_batch():
    """accumulate_steps=2 over micro-batches A,B == one update on the
    concatenated batch: MultiSteps averages the micro-gradients, and for a
    mean loss over equal-size halves that IS the big-batch gradient, so
    Adam produces the identical parameter update (exact, deterministic
    loss — no rng in the gradient path)."""
    from powerpaint_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    def loss_fn(params, batch, rng):
        pred = batch["x"] @ params["w"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"loss": loss}

    rng = np.random.RandomState(0)
    w0 = {"w": jnp.asarray(rng.randn(4, 3), jnp.float32)}
    mk = lambda n, seed: {
        "x": np.random.RandomState(seed).randn(n, 4).astype(np.float32),
        "y": np.random.RandomState(seed + 1).randn(n, 3).astype(np.float32),
    }
    a, b = mk(2, 10), mk(2, 20)
    big = {k: np.concatenate([a[k], b[k]]) for k in a}

    tx1 = make_optimizer(1e-2, weight_decay=0.0, clip_norm=None)
    s1 = init_train_state(w0, tx1)
    step1 = make_train_step(loss_fn, tx1, donate=False)
    s1, _ = step1(s1, big, jax.random.PRNGKey(0))

    tx2 = make_optimizer(1e-2, weight_decay=0.0, clip_norm=None,
                         accumulate_steps=2)
    s2 = init_train_state(w0, tx2)
    step2 = make_train_step(loss_fn, tx2, donate=False)
    s2, _ = step2(s2, a, jax.random.PRNGKey(0))
    # first micro-step: gradients buffered, params UNCHANGED
    np.testing.assert_array_equal(np.asarray(s2.params["w"]),
                                  np.asarray(w0["w"]))
    s2, _ = step2(s2, b, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(s2.params["w"]),
                               np.asarray(s1.params["w"]),
                               rtol=1e-6, atol=1e-7)


def test_prefetch_preserves_stream_and_propagates_errors():
    from powerpaint_tpu.train.data import prefetch

    assert list(prefetch(iter(range(7)), size=3)) == list(range(7))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom(), size=2)
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="producer failed"):
        next(it)
