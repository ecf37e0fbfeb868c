"""Training loop + exact-resume checkpointing.

The loop is host-side and thin (the jitted step owns all compute); the
checkpoint format is a flat .npz of the train-state leaves (step, params,
optimizer moments, EMA) restored against a template state — exact resume,
no pickle, no structure ambiguity.  Final model weights additionally go
through io/checkpoint.save_native (orbax) for serving.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, Iterator, List, Optional

import jax
import numpy as np

from powerpaint_tpu.train.step import TrainState


def save_train_state(path: str, state: TrainState) -> None:
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__n_leaves__"] = np.int64(len(leaves))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"  # np.savez appends .npz unless present
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_train_state(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (same model/optimizer
    config).  Leaf order is the deterministic pytree flatten order."""
    treedef = jax.tree_util.tree_structure(template)
    t_leaves = jax.tree_util.tree_leaves(template)
    with np.load(path) as z:
        n = int(z["__n_leaves__"])
        if n != len(t_leaves):
            raise ValueError(
                f"checkpoint has {n} leaves, template {len(t_leaves)} — "
                "model/optimizer config mismatch"
            )
        leaves = []
        for i, t in enumerate(t_leaves):
            arr = z[f"leaf_{i}"]
            if tuple(arr.shape) != tuple(np.shape(t)):
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != template "
                    f"{np.shape(t)}"
                )
            leaves.append(arr.astype(np.asarray(t).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


@dataclasses.dataclass
class Trainer:
    """Minimal production loop: metrics history, periodic checkpoints,
    exact resume.

    ``step_fn`` comes from train/step.make_train_step; ``data`` yields
    train/data.batches dicts; ``mesh`` (optional) enables data-parallel
    sharding of each batch (state must already be placed — see
    step.replicate_state).
    """

    step_fn: Callable
    state: TrainState
    data: Iterator[Dict[str, np.ndarray]]
    seed: int = 0
    mesh: Optional[object] = None

    def fit(
        self,
        num_steps: int,
        *,
        log_every: int = 10,
        ckpt_path: Optional[str] = None,
        ckpt_every: int = 0,
        on_log: Optional[Callable[[int, Dict[str, float]], None]] = None,
    ) -> List[Dict[str, float]]:
        from powerpaint_tpu.train.step import shard_batch

        rng = jax.random.PRNGKey(self.seed)
        history: List[Dict[str, float]] = []
        t0 = time.time()
        for _ in range(num_steps):
            batch = next(self.data)
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch)
            self.state, metrics = self.step_fn(self.state, batch, rng)
            step = int(self.state.step)
            if log_every and (step % log_every == 0 or step == 1):
                m = {k: float(v) for k, v in metrics.items()}
                m["step"] = step
                m["wall_s"] = round(time.time() - t0, 2)
                history.append(m)
                if on_log:
                    on_log(step, m)
            if ckpt_path and ckpt_every and step % ckpt_every == 0:
                save_train_state(ckpt_path, self.state)
        if ckpt_path:
            save_train_state(ckpt_path, self.state)
        return history
