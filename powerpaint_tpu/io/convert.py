"""torch/diffusers checkpoint -> Flax param-tree converters.

The deliverable that gates everything (SURVEY.md §5.4): maps the five
checkpoint families the reference loads (SD-inpaint UNet, fine-tuned CLIP
with task tokens, RealisticVision base, BrushNet, ControlNet —
reference app.py:84-200) into this framework's NHWC Flax trees.

Key transformations (torch -> flax):
- conv ``weight`` (O, I, kH, kW)      -> ``kernel`` (kH, kW, I, O)
- linear ``weight`` (O, I)            -> ``kernel`` (I, O)
- norm ``weight``/``bias``            -> ``scale``/``bias``
- list modules ``resnets.0``          -> ``resnets_0``
- ``transformer_blocks.{k}``          -> ``blocks_{k}``
- ``ff.net.0.proj`` / ``ff.net.2``    -> ``ff.proj_in`` / ``ff.proj_out``
- ``to_out.0``                        -> ``to_out``
- CLIP ``text_model.*`` prefix stripped; EmbeddingLayerWithFixes's
  ``token_embedding.wrapped`` + ``trainable_embeddings.P_*`` (the learned
  task vectors, reference utils.py:371-380) -> ``token_embedding`` +
  ``external_embedding`` rows in registration order.

Tensors are accepted as numpy arrays (via ``safetensors.numpy``) or torch
tensors.  ``load_safetensors_file`` never imports torch.
"""

from __future__ import annotations

import os

import jax
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------


def load_safetensors_file(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """torch.load fallback for .bin/.pth state dicts (reference app.py:193)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        return load_safetensors_file(path)
    return load_torch_file(path)


# ---------------------------------------------------------------------------
# key mapping
# ---------------------------------------------------------------------------

_NORM_HINTS = (
    "norm", "layer_norm", "final_layer_norm", "conv_norm_out", "group_norm",
)


def _is_norm_param(parts: List[str]) -> bool:
    parent = parts[-2] if len(parts) >= 2 else ""
    return any(h in parent for h in _NORM_HINTS)


def torch_key_to_flax_path(key: str) -> Tuple[str, ...]:
    """diffusers/transformers state-dict key -> flax tree path (no tensor
    transform; see convert_tensor)."""
    k = key
    # CLIP prefixes
    k = k.replace("text_model.embeddings.", "")
    k = k.replace("text_model.encoder.", "")
    k = k.replace("text_model.", "")
    k = k.replace("token_embedding.wrapped.", "token_embedding.")
    # diffusers structure idioms
    k = k.replace("ff.net.0.proj", "ff.proj_in")
    k = k.replace("ff.net.2", "ff.proj_out")
    k = k.replace("to_out.0", "to_out")
    k = k.replace("transformer_blocks.", "blocks.")
    k = k.replace(".mlp.", ".")
    parts = k.split(".")

    out: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        # merge list indices: "resnets", "0" -> "resnets_0"
        if i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i+1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    # param name normalization
    if out[-1] == "weight":
        out[-1] = "scale" if _is_norm_param(out) else "kernel"
    return tuple(out)


def convert_tensor(path: Tuple[str, ...], arr: np.ndarray) -> np.ndarray:
    name = path[-1]
    if name == "kernel":
        if arr.ndim == 4:  # conv OIHW -> HWIO
            return np.transpose(arr, (2, 3, 1, 0))
        if arr.ndim == 2:
            # embeddings keep (num, dim); linear transposes (O,I) -> (I,O)
            if "embedding" in path[-2]:
                return arr
            return np.transpose(arr)
    return arr


def _insert(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def state_dict_to_tree(
    sd: Dict[str, np.ndarray],
    *,
    key_filter: Optional[str] = None,
    strip_prefix: str = "",
) -> dict:
    """Generic conversion of a full state dict into a nested flax tree."""
    tree: dict = {}
    for key, arr in sd.items():
        if strip_prefix and key.startswith(strip_prefix):
            key = key[len(strip_prefix):]
        if key_filter and not re.match(key_filter, key):
            continue
        path = torch_key_to_flax_path(key)
        _insert(tree, path, convert_tensor(path, arr))
    return tree


# ---------------------------------------------------------------------------
# per-family converters
# ---------------------------------------------------------------------------


def convert_unet(sd: Dict[str, np.ndarray]) -> dict:
    """diffusers UNet2DConditionModel state dict -> models.unet tree."""
    return state_dict_to_tree(sd)


def convert_brushnet(sd: Dict[str, np.ndarray]) -> dict:
    tree = state_dict_to_tree(sd)
    # flatten brushnet zero-conv lists: brushnet_down_blocks_{i}/{kernel,bias}
    return tree


def convert_controlnet(sd: Dict[str, np.ndarray]) -> dict:
    return state_dict_to_tree(sd)


def convert_t2i_adapter(sd: Dict[str, np.ndarray]) -> dict:
    """diffusers T2IAdapter (full_adapter, SD1.5) -> models.adapter tree
    (``adapter.conv_in`` / ``adapter.body.{i}.in_conv`` /
    ``adapter.body.{i}.resnets.{j}.block1|block2``)."""
    return state_dict_to_tree(sd)


def convert_vae(sd: Dict[str, np.ndarray]) -> dict:
    """diffusers AutoencoderKL -> models.vae tree (quant convs live inside
    encoder/decoder here)."""
    tree = state_dict_to_tree(sd)
    enc = tree.get("encoder", {})
    dec = tree.get("decoder", {})
    if "quant_conv" in tree:
        enc["quant_conv"] = tree.pop("quant_conv")
    if "post_quant_conv" in tree:
        dec["post_quant_conv"] = tree.pop("post_quant_conv")
    return {"encoder": enc, "decoder": dec}


def infer_condition_layers(
    sd: Dict[str, np.ndarray],
) -> Tuple[Tuple[int, int, int], ...]:
    """(kernel, stride, out_ch) spec of an AsymmetricAutoencoderKL's
    ``decoder.condition_encoder`` inferred from checkpoint tensor shapes:
    3x3 convs are stride 1, 4x4 convs are stride 2 (the tower's published
    construction, Asymmetric VQGAN arXiv 2306.04632)."""
    spec = []
    i = 0
    while f"decoder.condition_encoder.layers.{i}.weight" in sd:
        w = sd[f"decoder.condition_encoder.layers.{i}.weight"]  # OIHW
        k = int(w.shape[2])
        spec.append((k, 1 if k == 3 else 2, int(w.shape[0])))
        i += 1
    return tuple(spec)


def convert_asymmetric_vae(sd: Dict[str, np.ndarray]) -> dict:
    """diffusers AsymmetricAutoencoderKL -> models.vae tree (asymmetric
    config).  Same layout as convert_vae plus the condition tower."""
    return convert_vae(sd)


TASK_TOKEN_ORDER = ("P_ctxt", "P_shape", "P_obj")


def convert_clip_text(
    sd: Dict[str, np.ndarray],
    task_token_order: Tuple[str, ...] = TASK_TOKEN_ORDER,
) -> dict:
    """transformers CLIPTextModel (optionally with EmbeddingLayerWithFixes
    trainable task embeddings) -> models.clip_text tree."""
    trainables = {}
    plain = {}
    for k, v in sd.items():
        if k.endswith("position_ids"):  # transformers buffer, not a param
            continue
        m = re.search(r"trainable_embeddings\.([A-Za-z_0-9]+)$", k)
        if m:
            trainables[m.group(1)] = v
        else:
            plain[k] = v
    tree = state_dict_to_tree(plain)
    # transformers nests position_embedding under embeddings too
    if "position_embedding" in tree and isinstance(
        tree["position_embedding"], dict
    ):
        tree["position_embedding"] = tree["position_embedding"]["kernel"]
    if "token_embedding" in tree and isinstance(tree["token_embedding"], dict):
        emb = tree["token_embedding"]
        tree["token_embedding"] = emb.get("kernel", emb.get("scale"))
    if trainables:
        rows = [trainables[name] for name in task_token_order]
        tree["external_embedding"] = np.concatenate(rows, axis=0)
    # drop the (vocab-extended) rows if the table already includes externals
    return tree


def convert_clip_vision(sd: Dict[str, np.ndarray]) -> dict:
    """transformers CLIPVisionModel(WithProjection) -> models.clip_vision
    tree.  Scope names mirror the torch module tree, so this is the generic
    mapping plus flattening the embedding tables."""
    tree = state_dict_to_tree(
        {k: v for k, v in sd.items() if not k.endswith("position_ids")}
    )
    vm = tree.get("vision_model", tree)
    emb = vm.get("embeddings", {})
    if isinstance(emb.get("position_embedding"), dict):
        emb["position_embedding"] = emb["position_embedding"]["kernel"]
    return tree


def infer_clip_vision_config(sd: Dict[str, np.ndarray]):
    """Build a CLIPVisionConfig from checkpoint tensor shapes (hidden size,
    depth, patch/image size, projection dim) — works for both ViT-L
    (safety checker) and ViT-H (IP-Adapter image encoder) towers."""
    from powerpaint_tpu.core.config import CLIPVisionConfig

    def get(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(names)

    prefix = (
        "vision_model.vision_model."
        if "vision_model.vision_model.embeddings.class_embedding" in sd
        else "vision_model."
    )
    patch_w = get(prefix + "embeddings.patch_embedding.weight")  # (C,3,p,p)
    hidden = int(patch_w.shape[0])
    patch = int(patch_w.shape[-1])
    pos = get(prefix + "embeddings.position_embedding.weight")
    grid = int(round((pos.shape[0] - 1) ** 0.5))
    layers = 0
    while f"{prefix}encoder.layers.{layers}.layer_norm1.weight" in sd:
        layers += 1
    fc1 = get(prefix + "encoder.layers.0.mlp.fc1.weight",
              prefix + "encoder.layers.0.fc1.weight")
    heads = max(1, hidden // 64)
    proj = sd.get("visual_projection.weight")
    proj_dim = int(proj.shape[0]) if proj is not None else hidden
    return CLIPVisionConfig(
        hidden_size=hidden, intermediate_size=int(fc1.shape[0]),
        num_hidden_layers=layers, num_attention_heads=heads,
        image_size=grid * patch, patch_size=patch, projection_dim=proj_dim,
    )


def infer_vae_decoder_config(sd: Dict[str, np.ndarray]) -> dict:
    """Decoder channel/layer counts from an (asymmetric) VAE state dict —
    the asymmetric checkpoints use a LARGER decoder than encoder."""
    n_blocks = 0
    while f"decoder.up_blocks.{n_blocks}.resnets.0.conv1.weight" in sd:
        n_blocks += 1
    chans = []
    layers = 0
    for i in range(n_blocks):
        w = sd[f"decoder.up_blocks.{i}.resnets.0.conv1.weight"]
        chans.append(int(w.shape[0]))
        k = 0
        while f"decoder.up_blocks.{i}.resnets.{k}.conv1.weight" in sd:
            k += 1
        layers = max(layers, k - 1)
    return {
        "up_block_out_channels": tuple(reversed(chans)),
        "layers_per_up_block": layers,
    }


def convert_safety_checker(sd: Dict[str, np.ndarray]) -> dict:
    """diffusers StableDiffusionSafetyChecker state dict -> flax tree
    (vision tower + visual_projection + concept tables).  The torch module
    nests CLIPVisionModel (itself prefixed vision_model.) under an
    attribute also named vision_model -> collapse the doubled level."""
    sd = {
        k.replace("vision_model.vision_model.", "vision_model."): v
        for k, v in sd.items()
    }
    return convert_clip_vision(sd)


# ---------------------------------------------------------------------------
# IP-Adapter (reference loads via diffusers load_ip_adapter; consumed by the
# v2 pipeline, pipeline_PowerPaint_Brushnet_CA.py:650-707)
# ---------------------------------------------------------------------------


def ip_adapter_attn2_paths(unet_cfg) -> List[Tuple[str, ...]]:
    """Ordered flax paths of every cross-attention (attn2) module, matching
    diffusers' ``attn_processors`` traversal order — the reference UNet fork
    registers down_blocks and up_blocks BEFORE mid_block
    (unet_2d_condition.py:310-311,381), so checkpoint ids 1,3,5,... map to
    [down attn2s..., up attn2s..., mid attn2]."""
    from powerpaint_tpu.core.config import (
        CROSS_ATTN_DOWN,
        CROSS_ATTN_UP,
        MID_CROSS_ATTN,
    )

    paths: List[Tuple[str, ...]] = []
    for i, bt in enumerate(unet_cfg.down_block_types):
        if bt == CROSS_ATTN_DOWN:
            for j in range(unet_cfg.layers_per_block):
                for k in range(unet_cfg.transformer_layers_per_block):
                    paths.append(
                        (f"down_blocks_{i}", f"attentions_{j}",
                         f"blocks_{k}", "attn2")
                    )
    for i, bt in enumerate(unet_cfg.up_block_types):
        if bt == CROSS_ATTN_UP:
            for j in range(unet_cfg.layers_per_block + 1):
                for k in range(unet_cfg.transformer_layers_per_block):
                    paths.append(
                        (f"up_blocks_{i}", f"attentions_{j}",
                         f"blocks_{k}", "attn2")
                    )
    if unet_cfg.mid_block_type == MID_CROSS_ATTN:
        for k in range(unet_cfg.transformer_layers_per_block):
            paths.append(("mid_block", "attentions_0", f"blocks_{k}", "attn2"))
    return paths


def convert_ip_adapter(sd: Dict, unet_cfg, adapter_index: int = 0) -> dict:
    """IP-Adapter checkpoint -> partial UNet tree (encoder_hid_proj +
    per-attn2 to_k_ip/to_v_ip).  Accepts both layouts: the original nested
    {'image_proj': {...}, 'ip_adapter': {'1.to_k_ip.weight': ...}} and flat
    'image_proj.proj.weight' / 'ip_adapter.1.to_k_ip.weight' safetensors
    keys.  ``adapter_index`` > 0 emits the multi-adapter scope names
    (``encoder_hid_proj_a`` / ``to_k_ip_a`` — diffusers' ModuleList slots,
    pipeline_PowerPaint_Brushnet_CA.py:658-675).  Merge into UNet params
    with ``merge_ip_adapter``; convert several files with increasing
    indices for adapter stacks."""
    flat: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if isinstance(v, dict):
            for k2, v2 in v.items():
                flat[f"{k}.{k2}"] = v2
        else:
            flat[k] = v

    def get(*names):
        for n in names:
            if n in flat:
                return np.asarray(flat[n])
        raise KeyError(f"ip-adapter checkpoint missing any of {names}")

    sfx = "" if adapter_index == 0 else f"_{adapter_index}"
    tree: dict = {
        f"encoder_hid_proj{sfx}": {
            "image_embeds": {
                "kernel": np.transpose(
                    get("image_proj.proj.weight",
                        "image_proj.image_embeds.weight")
                ),
                "bias": get("image_proj.proj.bias",
                            "image_proj.image_embeds.bias"),
            },
            "norm": {
                "scale": get("image_proj.norm.weight"),
                "bias": get("image_proj.norm.bias"),
            },
        }
    }
    for idx, path in enumerate(ip_adapter_attn2_paths(unet_cfg)):
        kid = 2 * idx + 1
        for name in ("to_k_ip", "to_v_ip"):
            w = get(f"ip_adapter.{kid}.{name}.weight",
                    f"ip_adapter.{kid}.{name}.{adapter_index}.weight")
            _insert(tree, path + (name + sfx, "kernel"), np.transpose(w))
    return tree


def merge_ip_adapter(unet_tree: dict, ip_tree: dict) -> dict:
    """Deep-merge converted IP-Adapter weights into a UNet param tree (the
    functional analog of diffusers ``load_ip_adapter``); returns a new tree."""
    import copy as _copy

    out = _copy.deepcopy(unet_tree)

    def rec(dst: dict, src: dict) -> None:
        for k, v in src.items():
            if isinstance(v, dict):
                rec(dst.setdefault(k, {}), v)
            else:
                dst[k] = v

    rec(out, ip_tree)
    return out


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------


def tree_paths(tree: dict, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], tuple]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def validate_against(
    converted: dict, expected: dict, *, allow_missing: bool = False
) -> List[str]:
    """Compare converted tree against an init-produced tree; returns a list
    of problems (empty = exact structural + shape match)."""
    got = tree_paths(converted)
    want = tree_paths(expected)
    problems = []
    for path, shape in want.items():
        if path not in got:
            if not allow_missing:
                problems.append(f"missing {'/'.join(path)} {shape}")
        elif got[path] != shape:
            problems.append(
                f"shape mismatch {'/'.join(path)}: got {got[path]}, want {shape}"
            )
    for path in got:
        if path not in want:
            problems.append(f"unexpected {'/'.join(path)} {got[path]}")
    return problems


# ---------------------------------------------------------------------------
# BrushNet from_unet weight surgery
# ---------------------------------------------------------------------------


def brushnet_params_from_unet(unet_params: dict, template: dict) -> dict:
    """Initialize BrushNet params from a base UNet (reference
    ``BrushNetModel.from_unet``, BrushNet_CA.py:525-542):

    - conv_in_condition kernel (3,3,4+5,C) = [unet conv_in | unet conv_in | 0]
      over input channels, bias copied;
    - time embedding and all down/mid/up block weights copied;
    - zero convs keep the template's zero init (torch ``strict=False``).

    ``template`` is a freshly initialized BrushNet tree (e.g. from
    ``BrushNetModel.init``) supplying the zero convs and structure.
    """
    import copy as _copy

    out = _copy.deepcopy(template)

    uk = np.asarray(unet_params["conv_in"]["kernel"])  # (3,3,4,C)
    ck = np.zeros_like(np.asarray(out["conv_in_condition"]["kernel"]))
    n_in = uk.shape[2]
    ck[:, :, :n_in, :] = uk
    ck[:, :, n_in : 2 * n_in, :] = uk
    out["conv_in_condition"]["kernel"] = ck
    out["conv_in_condition"]["bias"] = np.asarray(
        unet_params["conv_in"]["bias"]
    )

    for key in unet_params:
        if key in out and (
            key.startswith(("down_blocks", "up_blocks"))
            or key in ("mid_block", "time_embedding")
        ):
            out[key] = jax.tree.map(lambda x: x, unet_params[key])
    return out


# ---------------------------------------------------------------------------
# single-file original-SD checkpoints (FromSingleFileMixin parity)
# ---------------------------------------------------------------------------
#
# The reference pipelines inherit diffusers ``FromSingleFileMixin``
# (pipeline_PowerPaint.py:157, pipeline_PowerPaint_Brushnet_CA.py:137): a
# user can load an original-layout ``v1-5.ckpt``/``.safetensors`` whose keys
# are ``model.diffusion_model.*`` (LDM UNet), ``first_stage_model.*`` (LDM
# VAE) and ``cond_stage_model.transformer.*`` (CLIP).  We map those to
# diffusers-style keys and reuse the existing per-family converters.


def _ldm_resnet(sub: str) -> str:
    return (sub.replace("in_layers.0", "norm1")
            .replace("in_layers.2", "conv1")
            .replace("emb_layers.1", "time_emb_proj")
            .replace("out_layers.0", "norm2")
            .replace("out_layers.3", "conv2")
            .replace("skip_connection", "conv_shortcut")
            .replace("nin_shortcut", "conv_shortcut"))


def ldm_unet_to_diffusers(
    sd: Dict[str, np.ndarray], levels: int = 4, layers_per_block: int = 2
) -> Dict[str, np.ndarray]:
    """``model.diffusion_model.*`` keys -> diffusers UNet keys."""
    out: Dict[str, np.ndarray] = {}
    per = layers_per_block + 1  # input blocks per level (res,res,downsample)
    for key, v in sd.items():
        parts = key.split(".")
        if key.startswith("time_embed."):
            n = {"0": "linear_1", "2": "linear_2"}[parts[1]]
            out[f"time_embedding.{n}.{parts[2]}"] = v
        elif key.startswith("input_blocks.0.0."):
            out[f"conv_in.{parts[3]}"] = v
        elif key.startswith("input_blocks."):
            i = int(parts[1])
            lvl, j = (i - 1) // per, (i - 1) % per
            sub = ".".join(parts[3:])
            if j < layers_per_block:
                if parts[2] == "0":  # resnet
                    out[f"down_blocks.{lvl}.resnets.{j}.{_ldm_resnet(sub)}"] = v
                else:  # spatial transformer (names already diffusers-like)
                    out[f"down_blocks.{lvl}.attentions.{j}.{sub}"] = v
            else:  # downsampler: input_blocks.{3,6,9}.0.op
                sub = sub.replace("op.", "") if sub.startswith("op.") else \
                    ".".join(parts[4:])
                out[f"down_blocks.{lvl}.downsamplers.0.conv.{parts[-1]}"] = v
        elif key.startswith("middle_block."):
            sub = ".".join(parts[2:])
            if parts[1] == "0":
                out[f"mid_block.resnets.0.{_ldm_resnet(sub)}"] = v
            elif parts[1] == "1":
                out[f"mid_block.attentions.0.{sub}"] = v
            else:
                out[f"mid_block.resnets.1.{_ldm_resnet(sub)}"] = v
        elif key.startswith("output_blocks."):
            i = int(parts[1])
            lvl, j = i // per, i % per
            sub = ".".join(parts[3:])
            is_upsampler = sub.startswith("conv.") and (
                parts[2] != "0"
                and (i % per == per - 1 or i == levels * per - 1)
            )
            if parts[2] == "0":
                out[f"up_blocks.{lvl}.resnets.{j}.{_ldm_resnet(sub)}"] = v
            elif is_upsampler:
                out[f"up_blocks.{lvl}.upsamplers.0.conv.{parts[-1]}"] = v
            else:
                out[f"up_blocks.{lvl}.attentions.{j}.{sub}"] = v
        elif key.startswith("out.0."):
            out[f"conv_norm_out.{parts[2]}"] = v
        elif key.startswith("out.2."):
            out[f"conv_out.{parts[2]}"] = v
    return out


def ldm_vae_to_diffusers(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """``first_stage_model.*`` keys -> diffusers AutoencoderKL keys.

    Decoder up levels are REVERSED (LDM ``decoder.up.0`` is the lowest
    resolution; diffusers ``decoder.up_blocks.0`` the highest); LDM mid
    attention q/k/v/proj_out are 1x1 convs -> squeezed to linears."""
    n_up = 1 + max(
        (int(k.split(".")[2]) for k in sd if k.startswith("decoder.up.")),
        default=-1,
    )
    out: Dict[str, np.ndarray] = {}

    def attn(name: str, v):
        m = {"q": "to_q", "k": "to_k", "v": "to_v", "proj_out": "to_out.0",
             "norm": "group_norm"}
        mod, param = name.split(".", 1)
        v = v[:, :, 0, 0] if (v.ndim == 4 and mod in ("q", "k", "v",
                                                      "proj_out")) else v
        return f"{m[mod]}.{param}", v

    for key, v in sd.items():
        parts = key.split(".")
        side = parts[0]
        if side in ("quant_conv", "post_quant_conv"):
            out[key] = v
        elif parts[1] in ("conv_in", "conv_out"):
            out[key] = v
        elif parts[1] == "norm_out":
            out[f"{side}.conv_norm_out.{parts[2]}"] = v
        elif parts[1] in ("down", "up"):
            lvl = int(parts[2])
            blk = (f"down_blocks.{lvl}" if parts[1] == "down"
                   else f"up_blocks.{n_up - 1 - lvl}")
            if parts[3] == "block":
                sub = _ldm_resnet(".".join(parts[5:]))
                out[f"{side}.{blk}.resnets.{parts[4]}.{sub}"] = v
            elif parts[3] == "downsample":
                out[f"{side}.{blk}.downsamplers.0.{'.'.join(parts[4:])}"] = v
            elif parts[3] == "upsample":
                out[f"{side}.{blk}.upsamplers.0.{'.'.join(parts[4:])}"] = v
        elif parts[1] == "mid":
            if parts[2] == "block_1":
                sub = _ldm_resnet(".".join(parts[3:]))
                out[f"{side}.mid_block.resnets.0.{sub}"] = v
            elif parts[2] == "block_2":
                sub = _ldm_resnet(".".join(parts[3:]))
                out[f"{side}.mid_block.resnets.1.{sub}"] = v
            elif parts[2] == "attn_1":
                name, v = attn(".".join(parts[3:]), v)
                out[f"{side}.mid_block.attentions.0.{name}"] = v
    return out


def convert_single_file(sd: Dict[str, np.ndarray]) -> Dict[str, dict]:
    """Original-SD single-file state dict -> ``{"unet": tree, "vae": tree,
    "text_encoder": tree}`` (present components only).  EMA weights
    (``model_ema.*``) are ignored, as in diffusers' loader default."""
    unet_sd = {k[len("model.diffusion_model."):]: v for k, v in sd.items()
               if k.startswith("model.diffusion_model.")}
    vae_sd = {k[len("first_stage_model."):]: v for k, v in sd.items()
              if k.startswith("first_stage_model.")}
    te_sd = {k[len("cond_stage_model.transformer."):]: v
             for k, v in sd.items()
             if k.startswith("cond_stage_model.transformer.")}
    out: Dict[str, dict] = {}
    if unet_sd:
        out["unet"] = convert_unet(ldm_unet_to_diffusers(unet_sd))
    if vae_sd:
        out["vae"] = convert_vae(ldm_vae_to_diffusers(vae_sd))
    if te_sd:
        out["text_encoder"] = convert_clip_text(te_sd)
    return out


# ---------------------------------------------------------------------------
# user textual-inversion embeddings (TextualInversionLoaderMixin parity)
# ---------------------------------------------------------------------------


def load_textual_inversion(
    tokenizer,
    text_params: dict,
    sd: Dict[str, np.ndarray],
    token: Optional[str] = None,
) -> dict:
    """Register a user TI embedding (reference
    ``TextualInversionLoaderMixin.maybe_convert_prompt`` usage,
    pipeline_PowerPaint.py:375,466): multi-vector embeddings expand
    ``<token>`` -> ``<token>_0 .. <token>_{n-1}`` exactly like the task
    tokens, and the learned rows are appended to ``external_embedding``
    (the functional analog of resizing the torch embedding table).

    Accepts both published layouts: ``{"<token>": (n, D)}`` (A1111 .pt
    ``string_to_param`` flattened) and ``{"emb_params": ...}`` /
    ``{"clip_l": ...}`` safetensors.  Returns a NEW text-encoder tree."""
    import copy as _copy

    rows = None
    for key in (token, "emb_params", "clip_l", "string_to_param"):
        if key is not None and key in sd:
            rows = np.asarray(sd[key], np.float32)
            break
    if rows is None and len(sd) == 1:
        (token_in_file, rows), = sd.items()
        rows = np.asarray(rows, np.float32)
        token = token or str(token_in_file)
    if rows is None:
        raise ValueError(f"no embedding tensor found (keys: {sorted(sd)})")
    if token is None:
        raise ValueError("token name required for this file layout")
    rows = rows.reshape(-1, rows.shape[-1])

    tokenizer.add_placeholder_token(token, num_vec_per_token=rows.shape[0])
    out = _copy.copy(text_params)
    ext = np.asarray(out.get("external_embedding",
                             np.zeros((0, rows.shape[1]), np.float32)))
    out["external_embedding"] = np.concatenate([ext, rows], axis=0)
    return out


# ---------------------------------------------------------------------------
# annotator checkpoints (HED, OpenPose body)
# ---------------------------------------------------------------------------


def convert_hed(sd: Dict[str, np.ndarray]) -> dict:
    """``network-bsds500.pth`` (the HED checkpoint the reference's
    controlnet_aux HEDdetector downloads from lllyasviel/ControlNet,
    app.py:119) -> models.annotators.HEDNetwork tree.

    The published file names its submodules ``moduleVggOne`` etc.; the torch
    deployment remaps ``module`` -> ``net`` at load time, which we mirror.
    """
    remapped = {k.replace("module", "net"): v for k, v in sd.items()}
    return state_dict_to_tree(remapped)


def convert_bodypose(sd: Dict[str, np.ndarray]) -> dict:
    """``body_pose_model.pth`` (CMU body cascade, downloaded by the
    reference's controlnet_aux OpenposeDetector, app.py:118) ->
    models.annotators.BodyPoseModel tree.

    The checkpoint uses flat Caffe layer names (``conv1_1.weight``,
    ``Mconv7_stage6_L2.bias``); torch deployments prefix them with
    ``model0.``/``model{s}_{b}.`` module paths, which we strip if present.
    """
    flat = {}
    for k, v in sd.items():
        parts = k.split(".")
        if len(parts) == 3 and parts[0].startswith("model"):
            k = ".".join(parts[1:])
        flat[k] = v
    return state_dict_to_tree(flat)


def convert_dpt(sd: Dict[str, np.ndarray],
                deconv_resize_indices: Tuple[int, ...] = ()) -> dict:
    """HF ``DPTForDepthEstimation`` hybrid state dict (Intel/dpt-hybrid-midas
    layout, the checkpoint the reference loads at app.py:116) ->
    models.dpt.DPTDepthModel tree.

    ``deconv_resize_indices``: reassemble stages whose ``resize`` is a
    ConvTranspose2d (factor > 1 — non-hybrid DPT-large layouts; hybrid-midas
    has none).  Their torch weights are (I, O, kH, kW) and need the
    transpose-conv axis order instead of the OIHW one.
    """
    remapped: Dict[str, np.ndarray] = {}
    deconv_keys = set()
    for k, v in sd.items():
        if (k.startswith("dpt.layernorm") or k.startswith("dpt.pooler")
                or k.endswith("num_batches_tracked")):
            continue  # final LN/pooler are unused by the depth head
        k2 = k
        k2 = k2.replace("dpt.embeddings.backbone.bit.embedder.convolution.",
                        "backbone.stem_conv.")
        k2 = k2.replace("dpt.embeddings.backbone.bit.embedder.norm.",
                        "backbone.stem_norm.")
        m = re.match(
            r"dpt\.embeddings\.backbone\.bit\.encoder\.stages\.(\d+)"
            r"\.layers\.(\d+)\.(.*)", k2)
        if m:
            s, l, rest = m.groups()
            rest = rest.replace("downsample.conv.", "downsample_conv.")
            rest = rest.replace("downsample.norm.", "downsample_norm.")
            k2 = f"backbone.stage{s}_unit{l}.{rest}"
        k2 = k2.replace("dpt.embeddings.projection.", "vit.projection.")
        k2 = k2.replace("dpt.embeddings.cls_token", "vit.cls_token")
        k2 = k2.replace("dpt.embeddings.position_embeddings",
                        "vit.position_embeddings")
        k2 = k2.replace("dpt.encoder.layer.", "vit.layer.")
        k2 = k2.replace(".attention.attention.", ".attention.")
        k2 = k2.replace(".attention.output.dense.", ".attention_out.")
        k2 = k2.replace(".intermediate.dense.", ".intermediate.")
        k2 = k2.replace(".output.dense.", ".output.")
        m = re.match(
            r"neck\.reassemble_stage\.readout_projects\.(\d+)\.0\.(.*)", k2)
        if m:
            k2 = f"readout_project_{m.group(1)}.{m.group(2)}"
        m = re.match(
            r"neck\.reassemble_stage\.layers\.(\d+)\.projection\.(.*)", k2)
        if m:
            k2 = f"reassemble_projection_{m.group(1)}.{m.group(2)}"
        m = re.match(
            r"neck\.reassemble_stage\.layers\.(\d+)\.resize\.(.*)", k2)
        if m:
            k2 = f"reassemble_resize_{m.group(1)}.{m.group(2)}"
            if int(m.group(1)) in deconv_resize_indices:
                deconv_keys.add(k2)
        k2 = k2.replace("neck.convs.", "neck_conv.")
        k2 = k2.replace("neck.fusion_stage.layers.", "fusion.")
        if k2.startswith("head.head."):
            k2 = k2[len("head."):]
        remapped[k2] = v

    tree: dict = {}
    for key, arr in remapped.items():
        path = torch_key_to_flax_path(key)
        if key in deconv_keys and arr.ndim == 4:
            # ConvTranspose2d (I, O, kH, kW) -> flax (kH, kW, I, O)
            arr = np.transpose(arr, (2, 3, 0, 1))
        else:
            arr = convert_tensor(path, arr)
        _insert(tree, path, arr)
    return tree


def dpt_config_from_hf(hf_config) -> "object":
    """HF ``DPTConfig(is_hybrid=True)`` -> models.dpt.DPTConfig (shape
    fields only)."""
    from powerpaint_tpu.models.dpt import DPTConfig as _DPTCfg

    bit = hf_config.backbone_config
    return _DPTCfg(
        embedding_size=bit.embedding_size,
        bit_hidden_sizes=tuple(bit.hidden_sizes[:len(bit.depths)]),
        bit_depths=tuple(bit.depths),
        bit_num_groups=bit.num_groups,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        vit_out_layers=tuple(hf_config.backbone_out_indices[2:]),
        neck_hidden_sizes=tuple(hf_config.neck_hidden_sizes),
        reassemble_factors=tuple(hf_config.reassemble_factors),
        fusion_hidden_size=hf_config.fusion_hidden_size,
    )
