"""Trainable LoRA factors on Flax param trees + export to loadable formats.

Training-side counterpart of io/lora.py (which loads/merges existing LoRA
checkpoints).  Factors live in a sparse tree mirroring the target params —
``{module_path...: {"down": (I, r), "up": (r, O)}}`` in FLAX kernel
orientation — with the standard LoRA init (down ~ N(0, 1/sqrt(I)),
up = 0, so training starts exactly at the base model).  ``apply_lora`` is
jax-traceable (adds of down @ up), so gradients flow into the factors when
the merged tree feeds a loss (train/loss.py::make_lora_loss).

``export_lora_sd`` emits the peft/diffusers key format
(``unet.<module>.lora_A.weight`` etc., torch layouts) that io/lora.py —
and any diffusers install — can load; the flax->diffusers module-path
inversion covers the attention/FF projections LoRA targets.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# attention q/k/v/out + feed-forward projections (the standard SD LoRA
# target set; all are 2-D Dense kernels)
DEFAULT_TARGETS = (
    r".*/(attn1|attn2)/(to_q|to_k|to_v|to_out)$|"
    r".*/ff/(proj_in|proj_out)$|"
    r".*/(q_proj|k_proj|v_proj|out_proj)$|.*/(fc1|fc2)$"
)


def _walk_modules(tree: dict, prefix: Tuple[str, ...] = ()):
    """Yield (path, node) for nodes that look like Dense modules."""
    if not isinstance(tree, dict):
        return
    if "kernel" in tree and getattr(tree["kernel"], "ndim", 0) == 2:
        yield prefix, tree
        return
    for k, v in tree.items():
        yield from _walk_modules(v, prefix + (str(k),))


def init_lora_tree(
    params: dict,
    rank: int,
    rng: jax.Array,
    *,
    targets: str = DEFAULT_TARGETS,
) -> dict:
    """Sparse factor tree over every Dense kernel whose '/'-joined path
    matches ``targets``."""
    pat = re.compile(targets)
    out: dict = {}
    n = 0
    for path, node in _walk_modules(params):
        if not pat.fullmatch("/".join(path)):
            continue
        kernel = node["kernel"]
        i, o = kernel.shape
        key = jax.random.fold_in(rng, n)
        n += 1
        down = jax.random.normal(key, (i, rank), jnp.float32) / np.sqrt(i)
        up = jnp.zeros((rank, o), jnp.float32)
        cur = out
        for p in path[:-1]:
            cur = cur.setdefault(p, {})
        cur[path[-1]] = {"down": down, "up": up}
    if n == 0:
        raise ValueError(f"no Dense kernels matched {targets!r}")
    return out


def apply_lora(params: dict, lora: dict, *, scale: float = 1.0) -> dict:
    """Merged params = params + scale * down @ up at every factor site.
    Copy-on-write (dict spines rebuilt, untouched leaves shared);
    jax-traceable, so usable inside a jitted loss."""

    def rec(p: dict, l: dict) -> dict:
        out = dict(p)
        for k, sub in l.items():
            if "down" in sub and not isinstance(sub["down"], dict):
                mod = dict(p[k])
                kern = mod["kernel"]
                delta = (sub["down"].astype(jnp.float32)
                         @ sub["up"].astype(jnp.float32)) * scale
                mod["kernel"] = (kern.astype(jnp.float32)
                                 + delta).astype(kern.dtype)
                out[k] = mod
            else:
                out[k] = rec(p[k], sub)
        return out

    return rec(params, lora)


# ----------------------------------------------------------------- export

_LIST_NAMES = ("down_blocks", "up_blocks", "attentions", "resnets",
               "motion_modules", "layers", "net", "transformer_blocks")


def _flax_part_to_diffusers(part: str) -> str:
    if part == "to_out":
        return "to_out.0"
    m = re.fullmatch(r"blocks_(\d+)", part)
    if m:  # our transformer-block list name
        return f"transformer_blocks.{m.group(1)}"
    m = re.fullmatch(r"(.+)_(\d+)", part)
    if m and m.group(1) in _LIST_NAMES:
        return f"{m.group(1)}.{m.group(2)}"
    return part


def flax_path_to_diffusers(path: Tuple[str, ...]) -> str:
    """'/'-path in our tree -> dotted diffusers module name (inverse of
    io/convert.torch_key_to_flax_path for the LoRA target set)."""
    parts = list(path)
    # ff/proj_in -> ff.net.0.proj ; ff/proj_out -> ff.net.2
    for j in range(len(parts) - 1):
        if parts[j] == "ff" and parts[j + 1] == "proj_in":
            parts[j: j + 2] = ["ff", "net", "0", "proj"]
            break
        if parts[j] == "ff" and parts[j + 1] == "proj_out":
            parts[j: j + 2] = ["ff", "net", "2"]
            break
    return ".".join(_flax_part_to_diffusers(p) for p in parts)


def export_lora_sd(
    lora: dict, *, target: str = "unet", scale: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Factor tree -> peft/diffusers state dict (torch layouts: lora_A
    (r, I), lora_B (O, r), alpha = rank so loaders' alpha/rank factor is
    1).  Round-trips through io/lora.merge_lora (tested)."""
    sd: Dict[str, np.ndarray] = {}

    def rec(node: dict, path: Tuple[str, ...]):
        if "down" in node and not isinstance(node["down"], dict):
            down = np.asarray(node["down"], np.float32)  # (I, r)
            up = np.asarray(node["up"], np.float32)  # (r, O)
            rank = down.shape[1]
            base = f"{target}.{flax_path_to_diffusers(path)}"
            sd[f"{base}.lora_A.weight"] = (down * scale).T  # (r, I)
            sd[f"{base}.lora_B.weight"] = up.T  # (O, r)
            sd[f"{base}.alpha"] = np.float32(rank)
            return
        for k, v in node.items():
            rec(v, path + (k,))

    rec(lora, ())
    return sd


def lora_param_count(lora: dict) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(lora))


def save_lora_npz(path: str, lora: dict, *, target: str = "unet",
                  scale: float = 1.0) -> None:
    np.savez(path, **export_lora_sd(lora, target=target, scale=scale))


def load_lora_npz(path: str) -> Dict[str, np.ndarray]:
    """Returns a plain state dict loadable by io/lora.merge_lora."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def zero_lora_like(lora: dict) -> Optional[dict]:
    return jax.tree.map(jnp.zeros_like, lora)
