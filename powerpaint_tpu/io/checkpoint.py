"""Checkpoint-directory loading (reference HF layouts) + orbax native format.

Mirrors the reference's loading topology (app.py:84-200, README.md:82-97):

ppt-v1 (``checkpoints/ppt-v1``):
    unet/*.safetensors           fine-tuned 9-ch SD-inpaint UNet
    text_encoder/*.safetensors   fine-tuned CLIP WITH task-token rows
    vae/, tokenizer/             from the base SD1.5 checkpoint

ppt-v2 (``checkpoints/ppt-v2``):
    realisticVisionV60B1_v51VAE/{unet,vae,text_encoder,tokenizer}/
    PowerPaint_Brushnet/diffusion_pytorch_model.safetensors   (brushnet)
    PowerPaint_Brushnet/pytorch_model.bin                     (task text enc)

Native format: orbax checkpoint of the converted NHWC trees + config JSON —
load once from torch files, save native, then restore in seconds.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import (
    PowerPaintConfig,
    ppt_v1_config,
    ppt_v2_config,
)
from powerpaint_tpu.io import convert as C
from powerpaint_tpu.text.tokenizer import (
    TokenizerWrapper,
    add_task_tokens,
    load_tokenizer,
)


def _find_weights(*candidates: str) -> Optional[str]:
    for pattern in candidates:
        hits = sorted(glob.glob(pattern))
        if hits:
            return hits[0]
    return None


def _load_dir_weights(d: str) -> Optional[Dict[str, np.ndarray]]:
    path = _find_weights(
        os.path.join(d, "*.safetensors"),
        os.path.join(d, "*.bin"),
        os.path.join(d, "*.pth"),
    )
    return C.load_state_dict(path) if path else None


def _to_device_tree(tree: dict, dtype) -> dict:
    return jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), tree)


def _sync_text_config(config: PowerPaintConfig, clip_tree: dict):
    """Adjust vocab/external-token counts to the actual converted table so
    tokenizer ids and embedding rows always agree."""
    vocab, hidden = clip_tree["token_embedding"].shape
    n_ext = (
        clip_tree["external_embedding"].shape[0]
        if "external_embedding" in clip_tree else 0
    )
    return config.replace(
        text_encoder=config.text_encoder.replace(
            vocab_size=int(vocab), num_external_tokens=int(n_ext)
        )
    )


def _build_tokenizer(base_dir: str, vocab_size: int, n_ext: int):
    tokenizer = load_tokenizer(base_dir)
    from powerpaint_tpu.text.tokenizer import HashTokenizer

    if isinstance(tokenizer.base, HashTokenizer):
        tokenizer = TokenizerWrapper(HashTokenizer(vocab_size=vocab_size))
    if n_ext:
        add_task_tokens(tokenizer)
    return tokenizer


def load_ppt_v1(
    root: str,
    *,
    base_dir: Optional[str] = None,
    config: Optional[PowerPaintConfig] = None,
    dtype=jnp.bfloat16,
):
    """Build an InpaintPipeline from a ppt-v1 checkpoint tree.

    ``root`` holds the fine-tuned unet/ + text_encoder/; ``base_dir``
    (default: root) holds vae/ + tokenizer/ from the SD1.5 base.  ``root``
    may also be a single original-SD ``.ckpt``/``.safetensors`` FILE
    (FromSingleFileMixin parity — io/convert.py::convert_single_file)."""
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline

    if os.path.isfile(root):
        return load_single_file(root, base_dir=base_dir, config=config,
                                dtype=dtype)
    if _is_native(root):
        # our own orbax format (save_native / train CLI output)
        return _load_native_pipeline(root, base_dir=base_dir, dtype=dtype,
                                     expect="v1")
    base_dir = base_dir or root
    config = config or ppt_v1_config()

    unet_sd = _load_dir_weights(os.path.join(root, "unet"))
    text_sd = _load_dir_weights(os.path.join(root, "text_encoder"))
    vae_sd = _load_dir_weights(os.path.join(base_dir, "vae"))
    missing = [
        n for n, sd in
        (("unet", unet_sd), ("text_encoder", text_sd), ("vae", vae_sd))
        if sd is None
    ]
    if missing:
        raise FileNotFoundError(
            f"checkpoint dir {root!r} missing weights for: {missing}"
        )

    params = {
        "unet": C.convert_unet(unet_sd),
        "text_encoder": C.convert_clip_text(text_sd),
        "vae": C.convert_vae(vae_sd),
    }
    # AsymmetricAutoencoderKL checkpoints carry a condition tower and a
    # larger decoder (reference pipeline_PowerPaint.py:27, 1045-1051)
    cond_spec = C.infer_condition_layers(vae_sd)
    if cond_spec:
        config = config.replace(
            vae=config.vae.replace(
                asymmetric=True, condition_layers=cond_spec,
                **C.infer_vae_decoder_config(vae_sd),
            )
        )
    config = _sync_text_config(config, params["text_encoder"])
    params = _to_device_tree(params, dtype)

    tokenizer = _build_tokenizer(
        base_dir, config.text_encoder.vocab_size,
        config.text_encoder.num_external_tokens,
    )
    # ppt-v1 runs the safety checker by DEFAULT (reference
    # pipeline_PowerPaint.py:520-533; v2 loads with safety_checker=None,
    # app.py:163): auto-register when converted weights ship in the
    # checkpoint tree.  Weightless containers stay unregistered (PARITY.md).
    _maybe_register_safety(root, base_dir)
    return InpaintPipeline(config, params, tokenizer, dtype=dtype)


def _maybe_register_safety(*roots: Optional[str]) -> None:
    """Register the CLIP safety checker if a ``safety_checker/`` dir with
    weights exists under any of ``roots`` and no checker is registered yet
    (the v1 default-ON semantics)."""
    from powerpaint_tpu.core import safety

    if safety.get_safety_checker() is not None:
        return
    for r in roots:
        if not r:
            continue
        d = os.path.join(r, "safety_checker")
        if os.path.isdir(d) and _find_weights(
            os.path.join(d, "*.safetensors"),
            os.path.join(d, "*.bin"),
            os.path.join(d, "*.pth"),
        ):
            safety.register_safety_checker(load_safety_checker(d))
            return


def load_single_file(
    path: str,
    *,
    base_dir: Optional[str] = None,
    config: Optional[PowerPaintConfig] = None,
    dtype=jnp.bfloat16,
):
    """Build an InpaintPipeline from ONE original-SD checkpoint file
    (``model.diffusion_model.*`` layout — the diffusers
    ``FromSingleFileMixin`` surface, reference pipeline_PowerPaint.py:157).

    Single files carry no tokenizer vocab; pass ``base_dir`` pointing at a
    directory with ``tokenizer/`` for real CLIP BPE, else the hash
    tokenizer stands in (weight-free flows only)."""
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline

    config = config or ppt_v1_config()
    sd = C.load_state_dict(path)
    params = C.convert_single_file(sd)
    missing = [n for n in ("unet", "text_encoder", "vae")
               if n not in params]
    if missing:
        raise FileNotFoundError(
            f"single-file checkpoint {path!r} missing components: {missing}"
        )
    # single-file UNets are 4- or 9-channel; infer from conv_in
    cin = params["unet"]["conv_in"]["kernel"].shape[2]
    if cin != config.unet.in_channels:
        config = config.replace(unet=config.unet.replace(in_channels=cin))
    config = _sync_text_config(config, params["text_encoder"])
    params = _to_device_tree(params, dtype)
    tokenizer = _build_tokenizer(
        base_dir or os.path.dirname(path) or ".",
        config.text_encoder.vocab_size,
        config.text_encoder.num_external_tokens,
    )
    return InpaintPipeline(config, params, tokenizer, dtype=dtype)


def load_ppt_v2(
    root: str,
    *,
    dtype=jnp.bfloat16,
):
    """Build a BrushNetPipeline from the ppt-v2 two-directory layout."""
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline

    if _is_native(root):
        return _load_native_pipeline(root, base_dir=None, dtype=dtype,
                                     expect="v2")
    config = ppt_v2_config()
    base = os.path.join(root, "realisticVisionV60B1_v51VAE")
    bn_dir = os.path.join(root, "PowerPaint_Brushnet")
    if not os.path.isdir(base):
        base = root  # flat layout fallback

    unet_sd = _load_dir_weights(os.path.join(base, "unet"))
    vae_sd = _load_dir_weights(os.path.join(base, "vae"))
    text_sd = _load_dir_weights(os.path.join(base, "text_encoder"))
    bn_path = _find_weights(
        os.path.join(bn_dir, "diffusion_pytorch_model*.safetensors"),
        os.path.join(bn_dir, "*.safetensors"),
    )
    bn_text_path = _find_weights(
        os.path.join(bn_dir, "pytorch_model*.bin"),
        os.path.join(bn_dir, "text_encoder", "*.safetensors"),
        os.path.join(bn_dir, "text_encoder", "*.bin"),
    )
    missing = [
        n for n, v in (
            ("base unet", unet_sd), ("vae", vae_sd),
            ("base text_encoder", text_sd), ("brushnet", bn_path),
            ("brushnet text_encoder", bn_text_path),
        ) if v is None
    ]
    if missing:
        raise FileNotFoundError(
            f"checkpoint dir {root!r} missing weights for: {missing}"
        )

    params = {
        "unet": C.convert_unet(unet_sd),
        "vae": C.convert_vae(vae_sd),
        "text_encoder": C.convert_clip_text(text_sd),
        "brushnet": C.convert_brushnet(C.load_state_dict(bn_path)),
        "text_encoder_brushnet": C.convert_clip_text(
            C.load_state_dict(bn_text_path)
        ),
    }
    # task tokens live in the BRUSHNET text encoder (reference app.py:181)
    config = _sync_text_config(config, params["text_encoder_brushnet"])

    # optional IP-Adapter weights (diffusers load_ip_adapter analog)
    ip_path = _find_weights(
        os.path.join(root, "ip_adapter*.safetensors"),
        os.path.join(root, "ip_adapter*.bin"),
        os.path.join(root, "ip-adapter*.safetensors"),
        os.path.join(root, "ip-adapter*.bin"),
    )
    if ip_path:
        ip_sd = C.load_state_dict(ip_path)
        dim = None
        for k, v in ip_sd.items():
            if k.endswith("image_proj.proj.weight") or k == "proj.weight":
                dim = int(np.asarray(v).shape[1])
        if dim is None and "image_proj" in ip_sd:
            dim = int(np.asarray(ip_sd["image_proj"]["proj.weight"]).shape[1])
        tokens = config.unet.ip_adapter_tokens
        config = config.replace(
            unet=config.unet.replace(ip_adapter_dim=dim or 1024,
                                     ip_adapter_tokens=tokens)
        )
        params["unet"] = C.merge_ip_adapter(
            params["unet"], C.convert_ip_adapter(ip_sd, config.unet)
        )

    # optional CLIP image encoder for ip_adapter_image
    enc_sd = _load_dir_weights(os.path.join(root, "image_encoder"))
    if enc_sd is None:
        enc_sd = _load_dir_weights(os.path.join(base, "image_encoder"))
    if enc_sd is not None:
        config = config.replace(
            image_encoder=C.infer_clip_vision_config(enc_sd)
        )
        params["image_encoder"] = C.convert_clip_vision(enc_sd)

    params = _to_device_tree(params, dtype)

    tokenizer = _build_tokenizer(
        base, config.text_encoder.vocab_size,
        config.text_encoder.num_external_tokens,
    )
    return BrushNetPipeline(config, params, tokenizer, dtype=dtype)


def load_safety_checker(d: str, *, dtype=None):
    """Build a registrable CLIPSafetyChecker from a checkpoint dir
    (diffusers ``safety_checker/`` layout)."""
    from powerpaint_tpu.core.safety import CLIPSafetyChecker

    sd = _load_dir_weights(d)
    if sd is None:
        raise FileNotFoundError(f"no safety-checker weights under {d!r}")
    cfg = C.infer_clip_vision_config(sd)
    params = _to_device_tree(
        C.convert_safety_checker(sd), dtype or jnp.float32
    )
    return CLIPSafetyChecker(cfg, params, dtype=dtype)


# ---------------------------------------------------------------------------
# native orbax checkpoints
# ---------------------------------------------------------------------------


def _is_native(root: str) -> bool:
    return (os.path.isdir(root)
            and os.path.exists(os.path.join(root, "config.json"))
            and os.path.exists(os.path.join(root, "params")))


def _load_native_pipeline(root: str, *, base_dir=None, dtype=jnp.bfloat16,
                          expect: str = "v1"):
    """Serve weights saved with save_native (e.g. the train CLI's output):
    config + params from orbax; tokenizer from ``base_dir`` if it carries a
    vocab, else the hash tokenizer the training run used."""
    config, params = load_native(root, dtype=dtype)
    is_v2 = config.brushnet is not None
    if (expect == "v2") != is_v2:
        raise ValueError(
            f"native checkpoint {root!r} is ppt-{'v2' if is_v2 else 'v1'}; "
            f"use --version ppt-{'v2' if is_v2 else 'v1'}"
        )
    tokenizer = _build_tokenizer(
        base_dir or root, config.text_encoder.vocab_size,
        config.text_encoder.num_external_tokens,
    )
    if is_v2:
        from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline

        return BrushNetPipeline(config, params, tokenizer, dtype=dtype)
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline

    return InpaintPipeline(config, params, tokenizer, dtype=dtype)


def save_native(path: str, config: PowerPaintConfig, params: dict) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(config.to_json())
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), params, force=True)
    ckptr.wait_until_finished()


def load_native(path: str, *, dtype=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "config.json")) as f:
        config = PowerPaintConfig.from_json(f.read())
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, "params"))
    if dtype is not None:
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), params)
    return config, params
