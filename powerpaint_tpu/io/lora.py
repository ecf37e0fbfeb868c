"""LoRA checkpoint loading: merge A·B deltas into Flax param trees.

The reference pipelines are ``LoraLoaderMixin``s
(/root/reference/powerpaint/pipelines/pipeline_PowerPaint.py:26,157 and
pipeline_PowerPaint_Brushnet_CA.py:135) — a user can stylize inpainting
with any SD1.5 LoRA and thread ``lora_scale`` through text encoding
(pipeline_PowerPaint.py:330,360-361,887-902).  The TPU-native equivalent:
merge ``scale * (alpha/rank) * up@down`` into the affected kernels of the
functional param trees ONCE on the host, so the compiled program is
unchanged (no per-layer branching, no extra matmuls per step).  Per-call
scale changes re-merge (pure-functional trees make this safe: ``merge``
returns a new tree and never mutates).

Supported key formats (the same set diffusers' loader accepts):
- peft/diffusers: ``unet.<module>.lora_A.weight`` / ``lora_B.weight``
  (+ optional ``.alpha``), ``text_encoder.<module>...``
- old diffusers attn-processor: ``<module>.processor.to_q_lora.down.weight``
- kohya/A1111 (civitai): ``lora_unet_<module_with_underscores>.lora_down
  .weight`` / ``lora_up.weight`` / ``alpha`` — module paths are resolved
  against the ACTUAL target tree (tree-guided longest-match), so the
  underscore ambiguity (``down_blocks`` vs ``down`` + ``blocks``) never
  needs a hardcoded vocabulary.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from powerpaint_tpu.io.convert import torch_key_to_flax_path

__all__ = ["parse_lora", "merge_lora", "lora_delta", "LoraMixin"]


# --------------------------------------------------------------------------
# parsing: state dict -> {(target, base_name): {"down","up","alpha"}}
# --------------------------------------------------------------------------

_SUFFIXES = (
    (".lora_A.weight", "down"),
    (".lora_B.weight", "up"),
    (".lora_down.weight", "down"),
    (".lora_up.weight", "up"),
    (".lora.down.weight", "down"),
    (".lora.up.weight", "up"),
    (".down.weight", "down"),   # old attn-processor ...to_q_lora.down.weight
    (".up.weight", "up"),
    (".alpha", "alpha"),
)


def parse_lora(sd: Dict[str, np.ndarray]) -> Dict[Tuple[str, str], dict]:
    """Group raw LoRA keys into per-module records.

    Returns ``{(target, base): {"down": A, "up": B, "alpha": float|None}}``
    where ``target`` is "unet" / "text_encoder" / "text_encoder_2" and
    ``base`` is the module path still in the source format (dotted or
    kohya-underscored; resolution happens at merge time against the tree).
    """
    out: Dict[Tuple[str, str], dict] = {}
    for key, val in sd.items():
        for suffix, kind in _SUFFIXES:
            if key.endswith(suffix):
                base = key[: -len(suffix)]
                break
        else:
            continue
        # old attn-processor spelling: <mod>.processor.to_q_lora -> <mod>.to_q
        base = re.sub(r"\.processor\.to_out_lora$", ".to_out.0", base)
        base = re.sub(r"\.processor\.to_(q|k|v)_lora$", r".to_\1", base)
        base = re.sub(r"_lora$", "", base)
        if base.startswith("lora_unet_"):
            target, base = "unet", base[len("lora_unet_"):]
        elif base.startswith("lora_te2_"):
            target, base = "text_encoder_2", base[len("lora_te2_"):]
        elif base.startswith("lora_te1_"):
            target, base = "text_encoder", base[len("lora_te1_"):]
        elif base.startswith("lora_te_"):
            target, base = "text_encoder", base[len("lora_te_"):]
        elif base.startswith("unet."):
            target, base = "unet", base[len("unet."):]
        elif base.startswith("text_encoder_2."):
            target, base = "text_encoder_2", base[len("text_encoder_2."):]
        elif base.startswith("text_encoder."):
            target, base = "text_encoder", base[len("text_encoder."):]
        else:
            target = "unet"  # bare module paths are UNet LoRAs
        rec = out.setdefault((target, base), {"down": None, "up": None,
                                              "alpha": None})
        if kind == "alpha":
            rec["alpha"] = float(np.asarray(val).reshape(()))
        else:
            rec[kind] = np.asarray(val)
    return {k: v for k, v in out.items()
            if v["down"] is not None and v["up"] is not None}


# --------------------------------------------------------------------------
# path resolution against the target tree
# --------------------------------------------------------------------------


def _resolve_dotted(tree: dict, dotted: str) -> Optional[Tuple[str, ...]]:
    """Dotted diffusers module path -> flax tree path (must exist)."""
    path = torch_key_to_flax_path(dotted + ".weight")[:-1]
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return path


def _resolve_kohya(tree: dict, name: str) -> Optional[Tuple[str, ...]]:
    """Kohya underscore-joined module path -> flax tree path, by matching
    tokens against the actual tree (longest child key first).  Handles the
    diffusers->flax renames via aliases: ``transformer_blocks_k`` ->
    ``blocks_k``, ``to_out_0`` -> ``to_out``, ``ff_net_0_proj`` ->
    ``ff.proj_in``, ``ff_net_2`` -> ``ff.proj_out``, and skips the CLIP
    ``text_model``/``encoder`` prefixes our tree strips."""
    tokens = name.split("_")

    def child_aliases(key: str) -> List[Tuple[Tuple[str, ...], Tuple[str, ...]]]:
        """[(token_seq_to_consume, tree_keys_to_descend)]"""
        out = [(tuple(key.split("_")), (key,))]
        m = re.fullmatch(r"blocks_(\d+)", key)
        if m:
            out.append((("transformer", "blocks", m.group(1)), (key,)))
        if key == "to_out":
            out.append((("to", "out", "0"), (key,)))
        if key == "ff":
            out.append((("ff", "net", "0", "proj"), ("ff", "proj_in")))
            out.append((("ff", "net", "2"), ("ff", "proj_out")))
        return out

    def rec(node, toks) -> Optional[Tuple[str, ...]]:
        if not toks:
            return () if isinstance(node, dict) else None
        if not isinstance(node, dict):
            return None
        # skip prefixes our CLIP tree strips
        for skip in (("text", "model"), ("encoder",)):
            if tuple(toks[: len(skip)]) == skip and toks[len(skip):]:
                # only skip when the skipped token is NOT a real child here
                got = rec(node, toks[len(skip):])
                if got is not None:
                    return got
        # longest consumed token sequence first
        cands = []
        for key in node:
            for consume, descend in child_aliases(key):
                if tuple(toks[: len(consume)]) == consume:
                    cands.append((len(consume), consume, descend))
        cands.sort(key=lambda c: -c[0])
        for _, consume, descend in cands:
            sub = node
            ok = True
            for d in descend:
                if not isinstance(sub, dict) or d not in sub:
                    ok = False
                    break
                sub = sub[d]
            if not ok:
                continue
            got = rec(sub, toks[len(consume):])
            if got is not None:
                return tuple(descend) + got
        return None

    return rec(tree, tokens)


def resolve_module(tree: dict, base: str) -> Optional[Tuple[str, ...]]:
    if "." in base:
        return _resolve_dotted(tree, base)
    got = _resolve_dotted(tree, base)
    if got is not None:
        return got
    return _resolve_kohya(tree, base)


# --------------------------------------------------------------------------
# delta computation + merge
# --------------------------------------------------------------------------


def lora_delta(rec: dict, kernel_shape: Tuple[int, ...],
               scale: float) -> np.ndarray:
    """scale * (alpha/rank) * up @ down, shaped like the flax kernel.

    Linear: down (r, I), up (O, r) -> delta (I, O).
    Conv:   down (r, I, kh, kw), up (O, r, 1, 1) -> delta (kh, kw, I, O).
    """
    down = np.asarray(rec["down"], np.float32)
    up = np.asarray(rec["up"], np.float32)
    rank = down.shape[0]
    alpha = rec["alpha"] if rec["alpha"] is not None else float(rank)
    s = scale * alpha / rank
    if down.ndim == 2:
        delta = (up @ down).T * s  # (I, O)
    elif down.ndim == 4:
        delta = np.einsum("or,rikl->oikl", up[:, :, 0, 0], down) * s
        delta = np.transpose(delta, (2, 3, 1, 0))  # OIHW -> HWIO
    else:
        raise ValueError(f"unsupported LoRA tensor rank {down.ndim}")
    if tuple(delta.shape) != tuple(kernel_shape):
        raise ValueError(
            f"LoRA delta shape {delta.shape} != kernel {kernel_shape}"
        )
    return delta


def merge_lora(
    params: dict,
    sd: Dict[str, np.ndarray],
    scale: float = 1.0,
    *,
    strict: bool = False,
) -> Tuple[dict, List[str]]:
    """Merge a LoRA state dict into pipeline params (functional).

    ``params``: ``{"unet": tree, "text_encoder": tree, ...}`` — only
    present targets are touched.  Returns ``(new_params, unmatched)`` where
    ``unmatched`` lists module paths that resolved to nothing (raise if
    ``strict``).  Merge with ``-scale`` to unmerge exactly.
    """
    import jax

    records = parse_lora(sd)
    if not records:
        raise ValueError("no LoRA A/B pairs found in state dict")
    # copy-on-write: shallow-copy dict spine, replace only touched leaves
    new_params = jax.tree.map(lambda x: x, params)
    unmatched: List[str] = []
    for (target, base), rec in records.items():
        tree = new_params.get(target)
        if tree is None:
            unmatched.append(f"{target}:{base} (no such target)")
            continue
        path = resolve_module(tree, base)
        if path is None:
            unmatched.append(f"{target}:{base}")
            continue
        node = tree
        for p in path[:-1]:
            node = node[p]
        leaf_parent = node[path[-1]]
        if not isinstance(leaf_parent, dict) or "kernel" not in leaf_parent:
            unmatched.append(f"{target}:{base} (no kernel at {path})")
            continue
        kernel = np.asarray(leaf_parent["kernel"])
        delta = lora_delta(rec, kernel.shape, scale)
        leaf_parent["kernel"] = kernel + delta.astype(kernel.dtype)
    if strict and unmatched:
        raise ValueError(f"unmatched LoRA modules: {unmatched}")
    return new_params, unmatched


class LoraMixin:
    """Pipeline-facing LoRA surface (the functional analog of diffusers
    ``LoraLoaderMixin.load_lora_weights``): merges deltas into
    ``self.params`` and remembers them so the scale can be changed
    (re-merge) or the LoRA unloaded exactly."""

    def _commit_params(self) -> None:
        """Re-commit ``self.params`` to the device after a host-side merge:
        ``merge_lora`` leaves touched kernels as numpy arrays, which would
        otherwise be re-uploaded host->device on EVERY subsequent call (and
        on a mesh would silently lose the TP shardings ``__post_init__``
        placed)."""
        import jax

        mesh = getattr(self, "mesh", None)
        if mesh is not None:
            from powerpaint_tpu.parallel.mesh import param_shardings

            p_shard = {
                k: param_shardings(mesh, v) for k, v in self.params.items()
            }
            self.params = jax.device_put(self.params, p_shard)
        else:
            import jax.numpy as jnp

            # jnp.asarray is a no-op for leaves already on device
            self.params = jax.tree.map(jnp.asarray, self.params)

    def load_lora_weights(self, sd_or_path, scale: float = 1.0,
                          strict: bool = False) -> List[str]:
        if isinstance(sd_or_path, str):
            from powerpaint_tpu.io.convert import load_state_dict

            sd = load_state_dict(sd_or_path)
        else:
            sd = sd_or_path
        self.params, unmatched = merge_lora(
            self.params, sd, scale, strict=strict
        )
        self._commit_params()
        loras = getattr(self, "_loaded_loras", None)
        if loras is None:
            loras = self._loaded_loras = []
        loras.append((sd, scale))
        return unmatched

    def set_lora_scale(self, scale: float) -> None:
        """Re-merge the most recent LoRA at a different scale.

        Dtype honesty: the (un)merge arithmetic happens in the kernel
        dtype, so on bf16 trees a scale round-trip is exact only to ~1 ulp
        (``_with_lora_scale`` avoids this entirely by snapshot-restore)."""
        if not getattr(self, "_loaded_loras", None):
            raise RuntimeError("no LoRA loaded")
        sd, old = self._loaded_loras[-1]
        self.params, _ = merge_lora(self.params, sd, scale - old)
        self._commit_params()
        self._loaded_loras[-1] = (sd, scale)

    def _with_lora_scale(self, cross_attention_kwargs: dict, fn):
        """Per-call ``cross_attention_kwargs={"scale": s}`` (the only key
        the reference threads through it — the LoRA text/attn scale,
        pipeline_PowerPaint.py:748,887-902): transiently re-merge the
        loaded LoRA at ``s``, run ``fn``, restore.  The re-merge is
        host-side and skipped entirely when ``s`` already matches, so
        repeated calls at one scale pay nothing after the first."""
        from powerpaint_tpu.core.validation import InputValidationError

        unknown = set(cross_attention_kwargs) - {"scale"}
        if unknown:
            raise InputValidationError(
                f"unsupported cross_attention_kwargs keys: {sorted(unknown)}"
                " (only 'scale' — the per-call LoRA scale — is meaningful"
                " on merged-weight trees)"
            )
        scale = float(cross_attention_kwargs["scale"])
        if not getattr(self, "_loaded_loras", None):
            raise InputValidationError(
                "cross_attention_kwargs['scale'] requires a loaded LoRA "
                "(load_lora_weights)"
            )
        old = self._loaded_loras[-1][1]
        if scale == old:
            return fn()
        # snapshot-restore, NOT delta-arithmetic restore: merge trees are
        # copy-on-write, so keeping the pre-call tree reference makes the
        # restore bit-exact (merging back with -delta would reintroduce a
        # rounding ulp per toggle — a random-walk drift on bf16 weights
        # under a serving loop that alternates scales)
        saved_params = self.params
        saved_entry = self._loaded_loras[-1]
        self.set_lora_scale(scale)
        try:
            return fn()
        finally:
            self.params = saved_params
            self._loaded_loras[-1] = saved_entry

    def unload_lora_weights(self) -> None:
        """Undo every loaded LoRA (reverse order).  Exact in fp32; on bf16
        trees the add/subtract round-trip is accurate to ~1 ulp of the
        kernel dtype (fl(fl(k+d)-d) != k in general)."""
        for sd, scale in reversed(getattr(self, "_loaded_loras", [])):
            self.params, _ = merge_lora(self.params, sd, -scale)
        self._commit_params()
        self._loaded_loras = []

    def add_textual_inversion(self, sd_or_path, token: Optional[str] = None
                              ) -> None:
        """Register a USER textual-inversion embedding (reference
        ``TextualInversionLoaderMixin``, pipeline_PowerPaint.py:375,466):
        appends the learned rows to the external-embedding table, updates
        the encoder config, and rebuilds the jitted program (the embedding
        table shape is baked into the trace)."""
        from powerpaint_tpu.io.convert import (
            load_state_dict,
            load_textual_inversion,
        )

        sd = (load_state_dict(sd_or_path) if isinstance(sd_or_path, str)
              else sd_or_path)
        key = ("text_encoder_brushnet"
               if "text_encoder_brushnet" in self.params
               else "text_encoder")
        self.params[key] = load_textual_inversion(
            self.tokenizer, self.params[key], sd, token=token
        )
        n = self.params[key]["external_embedding"].shape[0]
        self.config = self.config.replace(
            text_encoder=self.config.text_encoder.replace(
                num_external_tokens=n
            )
        )
        self.__post_init__()  # rebuild models + jit for the new table
