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
) -> optax.GradientTransformation:
    lr = schedule if schedule is not None else learning_rate
    inner = optax.adamw(lr, weight_decay=weight_decay)
    if clip_norm:
        inner = optax.chain(optax.clip_by_global_norm(clip_norm), inner)
    if labels is not None:
        return optax.multi_transform(
            {"train": inner, "freeze": optax.set_to_zero()}, labels
        )
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
) -> Callable:
    """(state, batch, rng) -> (state', metrics), jitted.  Works on one
    device or any mesh — parallelism comes from the ARGUMENT shardings
    (see shard_batch/replicate_state)."""

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
        return TrainState(state.step + 1, params, opt_state, ema), metrics

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
