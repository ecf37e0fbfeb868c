"""Find the LCM few-step PSNR floors for the quality gate (round-3
verdict #4): distill an LCM-LoRA on the tiny v1 stack, then measure PSNR
of 4- and 8-step scheduler='lcm' sampling vs the 20-step exact output.

CPU-runnable; the measured floors get pinned (with slack) in
tests/test_lcm_quality.py and quoted in PARITY.md.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float32) - b.astype(np.float32)) ** 2))
    return 10 * np.log10(4.0 / mse) if mse > 0 else np.inf


def main(n_distill=int(sys.argv[1]) if len(sys.argv) > 1 else 300):
    import optax

    from powerpaint_tpu.io.lora import merge_lora
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
    from powerpaint_tpu.testing import tiny_v1_config
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )
    from powerpaint_tpu.train import SyntheticSource, batches
    from powerpaint_tpu.train.distill import make_lcm_distill_loss, uncond_ids
    from powerpaint_tpu.train.lora import export_lora_sd, init_lora_tree

    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)

    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0

    pipe = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)
    exact = np.asarray(pipe(img, mask, prompt="a cat",
                            num_inference_steps=20, seed=3,
                            output_type="float32"))

    # distill
    data = batches(SyntheticSource(hw=32, seed=5), tok, batch_size=4,
                   version="ppt-v1", seed=6)
    uc = uncond_ids(tok)
    loss_fn = make_lcm_distill_loss(cfg, params, dtype=jnp.float32,
                                    w_range=(6.0, 9.0))
    lora = init_lora_tree(params["unet"], rank=8, rng=jax.random.PRNGKey(7))
    opt = optax.adam(3e-3)
    opt_state = opt.init(lora)
    vg = jax.jit(jax.value_and_grad(lambda lt, b, r: loss_fn(lt, b, r)[0]))
    t0 = time.time()
    key = jax.random.PRNGKey(11)
    losses = []
    for i in range(n_distill):
        b = next(data)
        b = dict(b)
        b["ids_uncond"] = np.tile(uc[None], (b["ids"].shape[0], 1))
        key, sub = jax.random.split(key)
        l, g = vg(lora, b, sub)
        updates, opt_state = opt.update(g, opt_state)
        lora = optax.apply_updates(lora, updates)
        losses.append(float(l))
        if i % 50 == 0:
            print(f"step {i} loss {float(l):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    sd = export_lora_sd(jax.device_get(lora), target="unet")
    merged, unmatched = merge_lora(params, sd)
    assert unmatched == []
    pipe_lcm = InpaintPipeline(cfg, merged, tok, dtype=jnp.float32)

    rows = {"n_distill": n_distill,
            "loss_first": losses[0], "loss_last": losses[-1]}
    for steps in (2, 4, 8):
        out = np.asarray(pipe_lcm(
            img, mask, prompt="a cat", num_inference_steps=steps,
            guidance_scale=1.0, seed=3, scheduler="lcm",
            output_type="float32"))
        rows[f"psnr_lcm{steps}_vs_exact20"] = round(psnr(out, exact), 2)
        print(steps, rows[f"psnr_lcm{steps}_vs_exact20"], flush=True)
    # control: un-distilled base weights through the same few-step path
    for steps in (4,):
        out = np.asarray(pipe(
            img, mask, prompt="a cat", num_inference_steps=steps,
            guidance_scale=1.0, seed=3, scheduler="lcm",
            output_type="float32"))
        rows[f"psnr_lcm{steps}_undistilled"] = round(psnr(out, exact), 2)
    print(json.dumps(rows, indent=1))
    with open(os.path.join(REPO, "scripts", "results_lcm_quality.json"),
              "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
