"""CLI — the L5 surface (reference app.py:546-556 flags + one-shot mode).

Two modes:
- one-shot: ``python -m powerpaint_tpu.serve.cli --image in.png --mask m.png
  --task text-guided --prompt "a dog" --output out.png``
- serve: ``--serve`` launches the web UI (requires gradio; gated).

Flags mirror the reference: --version ppt-v1|ppt-v2, --checkpoint_dir,
--weight_dtype, --port/--share (serve mode).  Without a checkpoint dir a
random-weight stack runs (smoke/demo mode) — outputs are noise but the full
path executes.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("powerpaint_tpu")
    p.add_argument("--version", choices=["ppt-v1", "ppt-v2"],
                   default="ppt-v1")
    p.add_argument("--checkpoint_dir", default=None,
                   help="reference-layout checkpoint root (or native orbax "
                        "dir saved by this framework)")
    p.add_argument("--weight_dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--lora", action="append", default=[], metavar="PATH[:SCALE]",
                   help="merge a LoRA checkpoint (diffusers/kohya format) "
                        "into the loaded weights; repeatable")
    p.add_argument("--textual_inversion", action="append", default=[],
                   metavar="PATH[:TOKEN]",
                   help="register a user textual-inversion embedding; "
                        "repeatable")
    p.add_argument("--clip_skip", type=int, default=0,
                   help="skip the last N CLIP layers when encoding")
    p.add_argument("--serve", action="store_true", help="launch web UI")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--share", action="store_true")
    p.add_argument("--micro-batch", dest="micro_batch", type=int, default=4,
                   help="coalesce up to N concurrent HTTP requests into one "
                        "batched generate (v1; 0/1 disables)")
    # one-shot args (reference Gradio widget parameters, app.py:664-690)
    p.add_argument("--image", help="input image path")
    p.add_argument("--mask", help="mask image path (white = repaint)")
    p.add_argument("--output", default="output.png")
    p.add_argument("--task", default="text-guided",
                   choices=["text-guided", "shape-guided", "object-removal",
                            "image-outpainting"])
    p.add_argument("--prompt", default="")
    p.add_argument("--negative_prompt", default="")
    p.add_argument("--fitting_degree", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=45)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--seed", type=int, default=0)
    # literal copy of powerpaint_tpu.schedulers.SCHEDULERS: the registry
    # imports jax, which --help must not pay for; synced by
    # tests/test_new_samplers.py::test_cli_scheduler_choices_match_registry
    p.add_argument("--scheduler", default=None,
                   choices=["ddim", "pndm", "unipc", "dpm", "euler",
                            "euler_a", "heun", "lms", "deis", "dpm_sde",
                            "lcm"],
                   help="sampler (default: ddim for v1, unipc for v2 — the "
                        "reference defaults); lcm pairs with an LCM-LoRA "
                        "merged via --lora")
    p.add_argument("--control_type", default=None,
                   choices=[None, "canny", "depth", "hed", "pose"])
    p.add_argument("--horizontal_expansion", type=float, default=1.0)
    p.add_argument("--vertical_expansion", type=float, default=1.0)
    p.add_argument("--short_side", type=int, default=640,
                   help="resize short side before inference (640 tasks / "
                        "512 outpaint in the reference)")
    p.add_argument("--tiny", action="store_true",
                   help="use the tiny test config (fast smoke runs)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of the generate call")
    p.add_argument("--aot-cache", dest="aot_cache", default=None,
                   metavar="FILE",
                   help="AOT executable cache (io/aot.py): load the "
                        "serialized generate executable if FILE exists "
                        "(first image without tracing/compiling), else dump "
                        "it there after the first call")
    return p


def build_pipeline(args):
    import jax
    import jax.numpy as jnp

    from powerpaint_tpu.core.config import ppt_v1_config, ppt_v2_config
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    dtype = jnp.bfloat16 if args.weight_dtype == "bfloat16" else jnp.float32

    if args.checkpoint_dir:
        from powerpaint_tpu.io.checkpoint import load_ppt_v1, load_ppt_v2

        if args.version == "ppt-v1":
            return _apply_adapters(
                load_ppt_v1(args.checkpoint_dir, dtype=dtype), args
            )
        return _apply_adapters(
            load_ppt_v2(args.checkpoint_dir, dtype=dtype), args
        )

    # random-weight demo stack
    if args.tiny:
        from powerpaint_tpu.testing import tiny_v1_config, tiny_v2_config

        cfg = tiny_v1_config() if args.version == "ppt-v1" else tiny_v2_config()
        vocab = 1024
    else:
        cfg = ppt_v1_config() if args.version == "ppt-v1" else ppt_v2_config()
        vocab = 49408
    params = init_params(cfg, jax.random.PRNGKey(0),
                         sample_hw=8 if args.tiny else 64, dtype=dtype)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=vocab))
    add_task_tokens(tok)
    if args.version == "ppt-v1":
        from powerpaint_tpu.pipelines.inpaint import InpaintPipeline

        pipe = InpaintPipeline(cfg, params, tok, dtype=dtype)
    else:
        from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline

        pipe = BrushNetPipeline(cfg, params, tok, dtype=dtype)
    return _apply_adapters(pipe, args)


def _apply_adapters(pipe, args):
    """--lora / --textual_inversion post-load hooks."""
    for spec in getattr(args, "lora", []):
        path, _, scale = spec.rpartition(":")
        if not path or not _is_float(scale):
            path, scale = spec, "1.0"
        unmatched = pipe.load_lora_weights(path, scale=float(scale))
        msg = f"lora: merged {path} (scale {scale})"
        if unmatched:
            msg += f"; {len(unmatched)} unmatched modules"
        print(msg)
    for spec in getattr(args, "textual_inversion", []):
        path, _, token = spec.rpartition(":")
        if not path:
            path, token = spec, None
        pipe.add_textual_inversion(path, token=token or None)
        print(f"textual inversion: registered {spec}")
    return pipe


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def run_one_shot(args) -> int:
    import numpy as np
    from PIL import Image

    from powerpaint_tpu.tasks.preprocess import (
        crop_to_multiple_of_8,
        outpaint_canvas,
        resize_short_side,
        to_numpy_image,
        to_numpy_mask,
    )
    from powerpaint_tpu.tasks.postprocess import blend_result

    if not args.image:
        print("error: --image is required (or use --serve)", file=sys.stderr)
        return 2

    image = to_numpy_image(Image.open(args.image))
    short = 512 if args.task == "image-outpainting" else args.short_side
    image = resize_short_side(image, short)

    if args.task == "image-outpainting":
        image, mask = outpaint_canvas(
            image, args.horizontal_expansion, args.vertical_expansion
        )
    else:
        if not args.mask:
            print("error: --mask is required for this task", file=sys.stderr)
            return 2
        mask = to_numpy_mask(Image.open(args.mask))
        if mask.shape[:2] != image.shape[:2]:
            mask = resize_short_side(mask, short)
    image = crop_to_multiple_of_8(image)
    mask = mask[: image.shape[0], : image.shape[1]]

    pipe = build_pipeline(args)

    import os

    aot_loaded = False
    if args.aot_cache and os.path.exists(args.aot_cache):
        try:
            pipe.aot_load(args.aot_cache)
            aot_loaded = True
            print(f"aot: loaded {args.aot_cache}")
        except Exception as e:  # version/topology mismatch -> jit fallback
            print(f"aot: ignoring {args.aot_cache}: {e}", file=sys.stderr)

    kwargs = {}
    if args.scheduler is not None:
        # all three pipelines accept scheduler= (v2 gained it in round 3;
        # its default stays unipc, the reference's app.py:197)
        kwargs["scheduler"] = args.scheduler
    if args.control_type:
        from powerpaint_tpu.tasks.control import get_control_image

        kwargs["control_image"] = get_control_image(args.control_type, image)

    from powerpaint_tpu.core.metrics import jax_profile_trace

    t0 = time.time()
    with jax_profile_trace(args.profile):
        out = pipe(
            image, mask,
            prompt=args.prompt,
            negative_prompt=args.negative_prompt,
            task=args.task,
            fitting_degree=args.fitting_degree,
            num_inference_steps=args.steps,
            guidance_scale=args.guidance_scale,
            seed=args.seed,
            clip_skip=args.clip_skip,
            **kwargs,
        )
    dt = time.time() - t0
    if args.aot_cache and not aot_loaded:
        try:
            pipe.aot_dump(args.aot_cache)
            print(f"aot: dumped {args.aot_cache}")
        except Exception as e:
            print(f"aot: dump failed: {e}", file=sys.stderr)
    final = blend_result(out[0], image, mask)
    Image.fromarray(final).save(args.output)
    print(f"wrote {args.output} ({final.shape[1]}x{final.shape[0]}) "
          f"in {dt:.1f}s ({args.steps} steps)")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.serve:
        from powerpaint_tpu.serve.app import launch

        return launch(args)
    return run_one_shot(args)


if __name__ == "__main__":
    sys.exit(main())
