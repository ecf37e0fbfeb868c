"""Sharded training step: optimizer, freezing masks, EMA, one jit.

TPU-native training analog of the inference pipelines' execution model:
the WHOLE update — forward, backward, optimizer, EMA — is one jitted
program.  Parallelism is inherited from input shardings (GSPMD): shard the
batch over the mesh's "data" axis and replicate (or tensor-shard, via
parallel/mesh.param_shardings) the state; XLA inserts the gradient
all-reduce because the loss is a mean over the batch axis.

Freezing is an optimizer-level mask (optax.multi_transform with
set_to_zero on frozen leaves): the reference recipe's "frozen base UNet /
trainable branch" (BrushNet) and "trainable task-token rows" (PowerPaint
v1) map to label trees built by ``trainable_mask``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jnp.ndarray  # () int32
    params: Any  # the OPTIMIZED tree (model params, or a LoRA factor tree)
    opt_state: Any
    ema: Any  # EMA of params, or None


def _path_str(kp) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in kp)


def trainable_mask(params: dict, mode: str):
    """Label tree ("train"/"freeze") for optax.multi_transform.

    - "all": everything trains (LoRA factor trees, ad-hoc subsets)
    - "v1": UNet + text encoder (incl. task-token rows); VAE frozen —
      the PowerPaint v1 fine-tune (arXiv 2312.03594 §4)
    - "task_tokens": ONLY text_encoder/external_embedding — the
      textual-inversion-style token-only mode
    - "v2": BrushNet branch + its task text encoder; base UNet, plain
      text encoder and VAE frozen — the BrushNet training setup
    """
    preds = {
        "all": lambda p: True,
        "v1": lambda p: p.startswith(("unet/", "text_encoder/")),
        "task_tokens": lambda p: p == "text_encoder/external_embedding",
        "v2": lambda p: p.startswith(
            ("brushnet/", "text_encoder_brushnet/")),
    }
    if mode not in preds:
        raise ValueError(f"unknown mode {mode!r}; one of {sorted(preds)}")
    pred = preds[mode]
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: "train" if pred(_path_str(kp)) else "freeze", params
    )


def make_optimizer(
    learning_rate: float = 1e-5,
    *,
    weight_decay: float = 1e-2,
    clip_norm: Optional[float] = 1.0,
    labels=None,
    schedule: Optional[Callable] = None,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW (+clip, +freeze labels, +gradient accumulation).

    ``accumulate_steps=N`` averages gradients over N micro-batches before
    applying one optimizer update (optax.MultiSteps) — the large-effective-
    batch recipe when the per-chip batch is memory-bound.  The clip/Adam
    see the ACCUMULATED gradient, so N micro-steps on the same data equal
    one step on the N-fold batch.
    """
    lr = schedule if schedule is not None else learning_rate
    inner = optax.adamw(lr, weight_decay=weight_decay)
    if clip_norm:
        inner = optax.chain(optax.clip_by_global_norm(clip_norm), inner)
    if labels is not None:
        inner = optax.multi_transform(
            {"train": inner, "freeze": optax.set_to_zero()}, labels
        )
    if accumulate_steps > 1:
        inner = optax.MultiSteps(inner, every_k_schedule=accumulate_steps)
    return inner


def init_train_state(
    params, tx: optax.GradientTransformation, *, ema: bool = False
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema=jax.tree.map(jnp.asarray, params) if ema else None,
    )


def make_train_step(
    loss_fn: Callable,  # (params, batch, rng) -> (loss, metrics)
    tx: optax.GradientTransformation,
    *,
    ema_decay: Optional[float] = None,
    donate: bool = True,
    state_shardings=None,
) -> Callable:
    """(state, batch, rng) -> (state', metrics), jitted.  Works on one
    device or any mesh — parallelism comes from the ARGUMENT shardings
    (see shard_batch/replicate_state/fsdp_state).

    ``state_shardings`` (a sharding pytree matching TrainState, e.g. from
    parallel/mesh.fsdp_shardings) pins the OUTPUT state's layout: without
    it GSPMD may resolve the updated params to replicated (undoing FSDP's
    memory saving on every step); with it the update is computed where the
    storage lives and the reduce-scatter/all-gather pattern stays ZeRO."""

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema
        if ema is not None and ema_decay is not None:
            d = jnp.float32(ema_decay)
            ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                               ema, params)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        out = TrainState(state.step + 1, params, opt_state, ema)
        if state_shardings is not None:
            out = jax.lax.with_sharding_constraint(out, state_shardings)
        return out, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ------------------------------------------------------------- mesh helpers


def shard_batch(mesh, batch):
    """Device-put batch arrays sharded on the data axis (leading dim)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from powerpaint_tpu.parallel.mesh import DATA_AXIS

    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), batch)


def replicate_state(mesh, state: TrainState,
                    *, tensor_parallel: bool = False) -> TrainState:
    """Replicate the train state over the mesh (or tensor-shard the params
    per parallel/mesh.param_shardings when ``tensor_parallel``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def put_repl(tree):
        return jax.tree.map(lambda x: jax.device_put(x, repl), tree)

    params = state.params
    if tensor_parallel:
        from powerpaint_tpu.parallel.mesh import param_shardings

        params = jax.device_put(params, param_shardings(mesh, params))
    else:
        params = put_repl(params)
    return TrainState(
        step=jax.device_put(state.step, repl),
        params=params,
        opt_state=put_repl(state.opt_state),
        ema=None if state.ema is None else put_repl(state.ema),
    )


def fsdp_state(mesh, state: TrainState):
    """Place a train state FULLY SHARDED (ZeRO-3): params, optimizer
    moments and EMA each split over the mesh's data axis, ~1/N of the
    state bytes per chip.

    Returns ``(placed_state, shardings)``; pass the shardings to
    ``make_train_step(..., state_shardings=...)`` so the updated state
    keeps this layout step over step (donation then reuses the buffers).
    Batches still go through ``shard_batch`` — FSDP composes with the
    same data-axis batch split as plain DP, and the update trajectory is
    bit-comparable to the replicated one (GSPMD only moves WHERE tensors
    live, not the math; see tests/test_train.py).
    """
    from powerpaint_tpu.parallel.mesh import fsdp_shardings

    shardings = fsdp_shardings(mesh, state)
    return jax.device_put(state, shardings), shardings
