"""Training CLI: fine-tune PowerPaint stacks on a folder of images.

    python -m powerpaint_tpu.train.cli \
        --mode lora --data /path/to/images --steps 2000 \
        --checkpoint_dir checkpoints/ppt-v1 --out runs/style_lora

Modes (see train/step.trainable_mask):
  v1           full v1 fine-tune (UNet + text encoder + task tokens)
  task_tokens  only the P_ctxt/P_shape/P_obj rows (textual-inversion style)
  v2           BrushNet branch + its text encoder (base frozen)
  lora         rank-r adapters on attention/FF; exports a state dict
               loadable by io/lora (and by diffusers)

Without --checkpoint_dir a random-init stack is used (smoke runs); without
--data the procedural SyntheticSource is used.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("powerpaint_tpu.train")
    p.add_argument("--mode", default="lora",
                   choices=["v1", "task_tokens", "v2", "lora",
                            "lcm_distill"])
    p.add_argument("--version", default=None,
                   choices=[None, "ppt-v1", "ppt-v2"],
                   help="model generation (default: ppt-v2 for --mode v2, "
                        "else ppt-v1)")
    p.add_argument("--checkpoint_dir", default=None,
                   help="reference checkpoint layout to start from "
                        "(io/checkpoint); random init if omitted")
    p.add_argument("--data", default=None,
                   help="image folder (optional <stem>.txt captions); "
                        "synthetic data if omitted")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=None,
                   help="default: 1e-5 (v1/v2), 5e-4 (task_tokens), "
                        "1e-4 (lora)")
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--accumulate", type=int, default=1,
                   help="gradient accumulation: average N micro-batch "
                        "gradients per optimizer update (effective batch "
                        "= batch_size * N)")
    p.add_argument("--snr_gamma", type=float, default=None,
                   help="min-SNR loss weighting (5.0 is the common value)")
    p.add_argument("--lora_rank", type=int, default=8)
    p.add_argument("--ema", type=float, default=None,
                   help="EMA decay (e.g. 0.9999); off by default")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/train",
                   help="output dir: state.npz (resumable), metrics.jsonl, "
                        "final weights (orbax) or lora.npz")
    p.add_argument("--resume", action="store_true",
                   help="resume from <out>/state.npz")
    p.add_argument("--log_every", type=int, default=25)
    p.add_argument("--ckpt_every", type=int, default=250)
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel over N devices (0 = single device)")
    p.add_argument("--fsdp", action="store_true",
                   help="with --mesh: fully shard params/optimizer/EMA "
                        "over the data axis (ZeRO-3) instead of "
                        "replicating — ~1/N state bytes per chip")
    p.add_argument("--tiny", action="store_true",
                   help="tiny config smoke run (CPU-friendly)")
    p.add_argument("--weight_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype (params/optimizer stay fp32)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )
    from powerpaint_tpu.train.data import (
        FolderSource,
        SyntheticSource,
        batches,
        prefetch,
    )
    from powerpaint_tpu.train.loss import (
        make_lora_loss,
        make_v1_loss,
        make_v2_loss,
    )
    from powerpaint_tpu.train.lora import init_lora_tree, save_lora_npz
    from powerpaint_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
        replicate_state,
        trainable_mask,
    )
    from powerpaint_tpu.train.trainer import (
        Trainer,
        load_train_state,
        save_train_state,
    )

    version = args.version or ("ppt-v2" if args.mode == "v2" else "ppt-v1")
    dtype = jnp.bfloat16 if args.weight_dtype == "bfloat16" else jnp.float32

    # ---- model stack
    if args.checkpoint_dir:
        from powerpaint_tpu.io.checkpoint import load_ppt_v1, load_ppt_v2

        pipe = (load_ppt_v1 if version == "ppt-v1" else load_ppt_v2)(
            args.checkpoint_dir, dtype=dtype)
        cfg, params, tok = pipe.config, pipe.params, pipe.tokenizer
    else:
        from powerpaint_tpu.io.params import init_params

        if args.tiny:
            from powerpaint_tpu.testing import tiny_v1_config, tiny_v2_config

            cfg = tiny_v1_config() if version == "ppt-v1" else tiny_v2_config()
        else:
            from powerpaint_tpu.core.config import (
                ppt_v1_config,
                ppt_v2_config,
            )

            cfg = ppt_v1_config() if version == "ppt-v1" else ppt_v2_config()
        params = init_params(cfg, jax.random.PRNGKey(args.seed),
                             sample_hw=8, dtype=dtype)
        # the hash vocab MUST match the config's vocab_size: reloading the
        # saved native checkpoint rebuilds the tokenizer from the config
        # (io/checkpoint._load_native_pipeline), and a different bucket
        # count would hash prompts to ids the training never touched
        tok = TokenizerWrapper(
            HashTokenizer(vocab_size=cfg.text_encoder.vocab_size))
        add_task_tokens(tok)

    # ---- data
    hw = 32 if args.tiny else args.resolution
    src = (FolderSource(args.data, hw=hw, seed=args.seed) if args.data
           else SyntheticSource(hw=hw, seed=args.seed))
    data = prefetch(
        batches(src, tok, args.batch_size, version=version, seed=args.seed),
        size=2,
    )

    # ---- loss + optimizer + state
    base_loss = (make_v2_loss if version == "ppt-v2" else make_v1_loss)(
        cfg, dtype=dtype, snr_gamma=args.snr_gamma)
    lr_default = {"v1": 1e-5, "v2": 1e-5, "task_tokens": 5e-4,
                  "lora": 1e-4, "lcm_distill": 1e-4}[args.mode]
    lr = args.lr if args.lr is not None else lr_default

    if args.mode in ("lora", "lcm_distill"):
        lora = init_lora_tree(params["unet"], rank=args.lora_rank,
                              rng=jax.random.PRNGKey(args.seed + 1))
        if args.mode == "lcm_distill":
            from powerpaint_tpu.train.distill import (
                make_lcm_distill_loss,
                make_lcm_distill_loss_v2,
            )

            mk = (make_lcm_distill_loss_v2 if version == "ppt-v2"
                  else make_lcm_distill_loss)
            loss_fn = mk(cfg, params, dtype=dtype)
        else:
            loss_fn = make_lora_loss(base_loss, params)
        tx = make_optimizer(lr, weight_decay=args.weight_decay,
                            accumulate_steps=args.accumulate)
        state = init_train_state(lora, tx, ema=args.ema is not None)
    else:
        labels = trainable_mask(params, args.mode)
        loss_fn = base_loss
        tx = make_optimizer(lr, weight_decay=args.weight_decay,
                            labels=labels,
                            accumulate_steps=args.accumulate)
        state = init_train_state(params, tx, ema=args.ema is not None)

    os.makedirs(args.out, exist_ok=True)
    ckpt = os.path.join(args.out, "state.npz")
    if args.resume:
        state = load_train_state(ckpt, state)
        print(f"resumed from {ckpt} at step {int(state.step)}")

    mesh = None
    state_shardings = None
    if args.mesh:
        from powerpaint_tpu.parallel.mesh import build_mesh

        mesh = build_mesh(jax.devices()[: args.mesh], model_parallel=1)
        if args.fsdp:
            from powerpaint_tpu.train.step import fsdp_state

            state, state_shardings = fsdp_state(mesh, state)
        else:
            state = replicate_state(mesh, state)

    step_fn = make_train_step(loss_fn, tx, ema_decay=args.ema,
                              state_shardings=state_shardings)

    metrics_path = os.path.join(args.out, "metrics.jsonl")

    def on_log(step, m):
        print(json.dumps(m), flush=True)
        with open(metrics_path, "a") as fh:
            fh.write(json.dumps(m) + "\n")

    trainer = Trainer(step_fn, state, data, seed=args.seed, mesh=mesh)
    trainer.fit(args.steps, log_every=args.log_every, ckpt_path=ckpt,
                ckpt_every=args.ckpt_every, on_log=on_log)

    # ---- final artifacts
    final = trainer.state.ema if trainer.state.ema is not None \
        else trainer.state.params
    if args.mode in ("lora", "lcm_distill"):
        out = os.path.join(args.out, "lora.npz")
        save_lora_npz(out, jax.device_get(final))
        hint = (" — serve with scheduler='lcm', guidance_scale=1"
                if args.mode == "lcm_distill" else "")
        print(f"wrote {out} (loadable via io/lora or --lora on the "
              f"CLI){hint}")
    else:
        from powerpaint_tpu.io.checkpoint import save_native

        out = os.path.join(args.out, "weights")
        save_native(out, cfg, jax.device_get(final))
        print(f"wrote {out} (orbax; serve with --checkpoint_dir {out})")
    save_train_state(ckpt, jax.device_get(trainer.state))
    print(f"wrote {ckpt} (resume with --resume)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
