"""Training subsystem (new capability beyond the reference snapshot).

The reference repo ships inference only (training lives on its private
dev branch — reference README.md:158-160).  This package provides the
TPU-native training counterpart for every fine-tuning mode the PowerPaint
recipe needs (arXiv 2312.03594 §4: task-prompt tokens trained jointly with
the inpainting UNet; BrushNet branch trained with the base frozen):

- ``modes``: "v1" (UNet + text encoder + task tokens), "task_tokens"
  (textual-inversion-style: only the learned task-prompt rows), "v2"
  (BrushNet branch + its text encoder; base UNet/VAE frozen), and LoRA
  (low-rank adapters on attention/FF projections, exportable to the
  diffusers/kohya formats io/lora.py loads).
- Data-parallel (and tensor-parallel, via parallel/mesh.py's rules)
  sharded train step under one ``jit``; bf16 compute with fp32 master
  params is the caller's choice of module/param dtype.
- orbax checkpointing of the full train state (params, optimizer moments,
  EMA, step) with exact resume.
"""

from powerpaint_tpu.train.data import (  # noqa: F401
    SyntheticSource,
    batches,
    build_prompt_ids,
)
from powerpaint_tpu.train.loss import make_v1_loss, make_v2_loss  # noqa: F401
from powerpaint_tpu.train.lora import (  # noqa: F401
    apply_lora,
    export_lora_sd,
    init_lora_tree,
)
from powerpaint_tpu.train.masks import random_mask  # noqa: F401
from powerpaint_tpu.train.step import (  # noqa: F401
    TrainState,
    make_train_step,
    trainable_mask,
)
from powerpaint_tpu.train.trainer import (  # noqa: F401
    Trainer,
    load_train_state,
    save_train_state,
)
