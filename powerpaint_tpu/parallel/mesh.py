"""Device mesh + sharding rules (GSPMD/pjit).

The reference is single-process single-GPU (SURVEY.md §2 note); parallelism
is a new first-class subsystem here (§5.8):

- axis "data": CFG-pair/batch data parallelism — the denoise batch axis
  (2·B for classifier-free guidance) is sharded across ICI;
- axis "model": tensor parallelism over attention heads + MLP hidden dim of
  every transformer block (q/k/v/ff column-parallel, out/ff row-parallel),
  XLA inserting the all-reduces;
- spatial axis sharding (sequence-parallel analog for images) is applied by
  pipelines via ``with_sharding_constraint`` on the latent H axis when
  canvases are large (outpaint).

Params are replicated on "data" and sharded on "model" per the regex rules
below; everything else is replicated.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(
    devices: Optional[Sequence] = None,
    model_parallel: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by tp={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# (path regex, PartitionSpec) — first match wins.  Paths are '/'-joined flax
# param tree keys, e.g. "down_blocks_0/attentions_0/blocks_0/attn1/to_q/kernel"
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # column-parallel: split output features over MODEL
    (r".*/(to_q|to_k|to_v)/kernel$", P(None, MODEL_AXIS)),
    (r".*/(q_proj|k_proj|v_proj)/kernel$", P(None, MODEL_AXIS)),
    (r".*/ff/proj_in/kernel$", P(None, MODEL_AXIS)),
    (r".*/fc1/kernel$", P(None, MODEL_AXIS)),
    # row-parallel: split input features over MODEL (XLA adds the psum)
    (r".*/to_out/kernel$", P(MODEL_AXIS, None)),
    (r".*/out_proj/kernel$", P(MODEL_AXIS, None)),
    (r".*/ff/proj_out/kernel$", P(MODEL_AXIS, None)),
    (r".*/fc2/kernel$", P(MODEL_AXIS, None)),
    # column-parallel biases
    (r".*/(to_q|to_k|to_v|q_proj|k_proj|v_proj)/bias$", P(MODEL_AXIS)),
    (r".*/ff/proj_in/bias$", P(MODEL_AXIS)),
    (r".*/fc1/bias$", P(MODEL_AXIS)),
)


def param_spec(path: str) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.match(pattern, path):
            return spec
    return P()


def param_shardings(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """NamedSharding tree matching ``params`` via the TP rules."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        # dict keys have .key, tuple/list entries have .idx (int)
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )

    specs = {path_str(kp): param_spec(path_str(kp)) for kp, _ in flat}

    def assign(kp, leaf):
        spec = specs[path_str(kp)]
        # drop specs that don't divide evenly (tiny test configs)
        shape = leaf.shape
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis]
            if dim >= len(shape) or shape[dim] % size:
                ok = False
        return NamedSharding(mesh, spec if ok else P())

    return jax.tree_util.tree_map_with_path(assign, params)


def fsdp_shardings(
    mesh: Mesh,
    tree,
    axis: str = DATA_AXIS,
    min_leaf_size: int = 2**14,
):
    """FSDP/ZeRO sharding tree: every large leaf split over ``axis``.

    TPU-native fully-sharded data parallelism: params, optimizer moments
    and EMA live sharded over the data axis (each chip stores 1/N), and
    GSPMD inserts the all-gather before use in the forward/backward and
    the reduce-scatter on the gradients — the ZeRO-3 recipe expressed as
    shardings instead of hand-written collectives (scaling-book recipe;
    the reference is single-GPU and has no analog).

    Each leaf's LARGEST mesh-divisible dimension is split (ties go to the
    trailing dim, which is the conv O / dense out features axis in this
    codebase's HWIO/[in,out] layouts); leaves smaller than
    ``min_leaf_size`` elements (norm scales, biases) stay replicated —
    gathering them would cost more latency than the memory saved.
    """
    n = mesh.shape[axis]

    def assign(leaf):
        shape = tuple(np.shape(leaf))
        if int(np.prod(shape, dtype=np.int64)) < min_leaf_size:
            return NamedSharding(mesh, P())
        best = None
        for d, size in enumerate(shape):
            if size % n == 0 and (best is None or size >= shape[best]):
                best = d
        if best is None:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(assign, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (CFG-doubled) batch axis over DATA."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    shardings = param_shardings(mesh, params)
    return jax.device_put(params, shardings)
