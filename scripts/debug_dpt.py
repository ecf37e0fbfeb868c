"""Bisect the DPT oracle mismatch: compare torch vs flax intermediates."""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import torch
import transformers

from powerpaint_tpu.io.convert import convert_dpt, dpt_config_from_hf
from powerpaint_tpu.models.dpt import (
    BitBackbone,
    DPTDepthModel,
    DPTHybridEncoder,
)

sys.path.insert(0, os.path.join(REPO, "tests"))
from test_dpt_oracle import _randomize, _tiny_hybrid_config  # noqa: E402

hf_cfg = _tiny_hybrid_config()
model = _randomize(transformers.DPTForDepthEstimation(hf_cfg).eval())
rng = np.random.RandomState(0)
hw = 64
x = rng.rand(1, hw, hw, 3).astype(np.float32) * 2 - 1
xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

# torch intermediates via hooks
acts = {}


def hook(name):
    def fn(mod, inp, out):
        acts[name] = out
    return fn


emb = model.dpt.embeddings
emb.backbone.register_forward_hook(hook("bit"))
emb.register_forward_hook(hook("emb"))
for i, layer in enumerate(model.dpt.encoder.layer):
    layer.register_forward_hook(hook(f"vit{i}"))
model.neck.reassemble_stage.register_forward_hook(hook("reassemble"))
model.neck.register_forward_hook(hook("neck"))

with torch.no_grad():
    ref = model(pixel_values=xt).predicted_depth.numpy()

sd = {k: v.numpy() for k, v in model.state_dict().items()}
tree = convert_dpt(sd)
cfg = dpt_config_from_hf(hf_cfg)


def cmp(name, ours, theirs_nchw, tokens=False):
    t = theirs_nchw.numpy() if hasattr(theirs_nchw, "numpy") else theirs_nchw
    o = np.asarray(ours)
    if not tokens and t.ndim == 4:
        t = t.transpose(0, 2, 3, 1)
    err = np.abs(o - t).max()
    rel = err / (np.abs(t).max() + 1e-9)
    print(f"{name:24s} ours{o.shape} theirs{t.shape} maxabs {err:.3e} rel {rel:.3e}")


# our backbone
bb = BitBackbone(cfg)
f4, f8, f16 = bb.apply({"params": tree["backbone"]}, jnp.asarray(x))
bit_maps = acts["bit"].feature_maps
cmp("bit f4", f4, bit_maps[0])
cmp("bit f8", f8, bit_maps[1])
cmp("bit f16", f16, bit_maps[2])

# our vit
enc = DPTHybridEncoder(cfg)
touts = enc.apply({"params": tree["vit"]}, f16)
emb_out = acts["emb"].last_hidden_states
# replicate the embedding math ourselves for comparison of token inputs
for i in cfg.vit_out_layers:
    cmp(f"vit layer {i}", touts[list(cfg.vit_out_layers).index(i)],
        acts[f"vit{i}"][0] if isinstance(acts[f"vit{i}"], tuple)
        else acts[f"vit{i}"], tokens=True)

net = DPTDepthModel(cfg)
got = np.asarray(net.apply({"params": tree}, jnp.asarray(x)))
cmp("depth", got, ref, tokens=True)

# neck outputs
neck_out = acts["neck"]
print("neck outputs:", [tuple(t.shape) for t in neck_out])
