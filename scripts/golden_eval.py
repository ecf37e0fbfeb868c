"""Golden-asset fidelity evaluation (BASELINE.json: SSIM >= 0.99).

Runs the four tasks on the reference's published input/result asset pairs
(/root/reference/assets, README.md:99-154) and reports SSIM between our
output and the reference's recorded result.  Requires converted real
checkpoints (--checkpoint_dir); without weights this script exits with a
clear message (the container has no model weights — converters are tested
synthetically in tests/test_convert.py).

Usage:
    python scripts/golden_eval.py --checkpoint_dir checkpoints/ppt-v1 \
        --version ppt-v1 [--steps 45] [--out golden_report.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

ASSETS = "/root/reference/assets"

# (task, input asset, reference result asset, prompt, fitting)
CASES = [
    ("text-guided", "gradio_text_objinpaint.jpg",
     "gradio_text_objinpaint_result.jpg", "a cute dog sitting", 1.0),
    ("object-removal", "gradio_objremoval.jpg",
     "gradio_objremoval_result.jpg", "", 1.0),
    ("shape-guided", "shapeguided_s1_rabbit.jpg",
     "shapeguided_s1_rabbit_result.jpg", "a rabbit", 0.55),
    ("image-outpainting", "gradio_outpaint.jpg",
     "gradio_outpaint_result.jpg", "", 1.0),
]


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Grayscale global SSIM (windowless variant; sufficient for a
    regression gate against recorded outputs)."""
    a = a.astype(np.float64).mean(-1)
    b = b.astype(np.float64).mean(-1)
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    return float(
        ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
        / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2))
    )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--version", default="ppt-v1")
    p.add_argument("--steps", type=int, default=45)
    p.add_argument("--out", default="golden_report.json")
    args = p.parse_args()

    if not os.path.isdir(args.checkpoint_dir):
        print(
            f"checkpoint dir {args.checkpoint_dir!r} not found — golden "
            "evaluation needs converted real weights (io/checkpoint.py)",
            file=sys.stderr,
        )
        return 2

    from PIL import Image

    from powerpaint_tpu.controller import PowerPaint

    pp = PowerPaint.from_checkpoint(args.checkpoint_dir, args.version)
    report = {}
    for task, inp, ref, prompt, fitting in CASES:
        img = np.asarray(Image.open(os.path.join(ASSETS, inp)).convert("RGB"))
        ref_img = np.asarray(
            Image.open(os.path.join(ASSETS, ref)).convert("RGB")
        )
        h, w = img.shape[:2]
        # center-box mask for tasks without a recorded mask asset
        mask = np.zeros((h, w), np.float32)
        mask[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] = 1.0
        res = pp.infer(
            img, mask, task=task, prompt=prompt, fitting_degree=fitting,
            num_inference_steps=args.steps, seed=0,
        )
        out = res.result
        if out.shape != ref_img.shape:
            ref_img = np.asarray(
                Image.fromarray(ref_img).resize((out.shape[1], out.shape[0]))
            )
        report[task] = {"ssim": round(ssim(out, ref_img), 4)}
        print(task, report[task])

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    worst = min(v["ssim"] for v in report.values())
    print(f"worst-case SSIM: {worst}")
    return 0 if worst >= 0.99 else 1


if __name__ == "__main__":
    sys.exit(main())
