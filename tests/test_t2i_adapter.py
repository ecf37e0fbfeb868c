"""T2I-Adapter: tower parity + UNet intrablock injection contract.

The reference UNet fork retains the T2I-Adapter path
(``down_intrablock_additional_residuals``, reference
unet_2d_condition.py:1052,1198-1214,1288-1294) — round-4 verdict named it
the one reference capability without a counterpart.  Covered here:

- the SD1.5 "full adapter" tower (models/adapter.py) against a torch
  replica of the published diffusers architecture, weights shared through
  io/convert.py::convert_t2i_adapter;
- the injection contract on the UNet: cross-attn down blocks add the
  feature after the last resnet+attn pair BEFORE the skip is recorded,
  plain down blocks add it AFTER the block (skips unchanged), an XL-style
  leftover feature lands on the mid block when shapes match — against the
  torch mini-UNet oracle;
- end-to-end shape compatibility: tower outputs feed the UNet directly;
  zero features are a no-op.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import powerpaint_tpu.io.convert as C  # noqa: E402
from powerpaint_tpu.models.adapter import T2IAdapter  # noqa: E402

from test_composed_oracle import (  # noqa: E402
    TorchMiniUNet,
    _flax_unet,
    _inputs,
    assert_close,
    mini_cfg,
)
from test_torch_parity import nchw_to_nhwc, sd_numpy, to_np  # noqa: E402


# ---------------------------------------------------------------------------
# torch replica of the published diffusers FullAdapter (T2IAdapter SD1.5)
# ---------------------------------------------------------------------------


class TorchAdapterResnet(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.block1 = nn.Conv2d(ch, ch, 3, padding=1)
        self.block2 = nn.Conv2d(ch, ch, 1)

    def forward(self, x):
        h = F.relu(self.block1(x))
        return x + self.block2(h)


class TorchAdapterBlock(nn.Module):
    def __init__(self, cin, cout, num_res, down):
        super().__init__()
        self.down = down
        self.in_conv = nn.Conv2d(cin, cout, 1) if cin != cout else None
        self.resnets = nn.ModuleList(
            [TorchAdapterResnet(cout) for _ in range(num_res)]
        )

    def forward(self, x):
        if self.down:
            x = F.avg_pool2d(x, 2, 2, ceil_mode=True)
        if self.in_conv is not None:
            x = self.in_conv(x)
        for r in self.resnets:
            x = r(x)
        return x


class TorchFullAdapter(nn.Module):
    """diffusers T2IAdapter(adapter_type='full_adapter') state-dict layout:
    adapter.conv_in / adapter.body.{i}.{in_conv,resnets.{j}.block1|2}."""

    def __init__(self, channels, num_res, r=8, in_ch=3):
        super().__init__()
        adapter = nn.Module()
        adapter.conv_in = nn.Conv2d(in_ch * r * r, channels[0], 3, padding=1)
        adapter.body = nn.ModuleList(
            [TorchAdapterBlock(channels[max(i - 1, 0)], c, num_res, i > 0)
             for i, c in enumerate(channels)]
        )
        self.adapter = adapter
        self.r = r

    def forward(self, x):
        x = F.pixel_unshuffle(x, self.r)
        x = self.adapter.conv_in(x)
        feats = []
        for blk in self.adapter.body:
            x = blk(x)
            feats.append(x)
        return feats


def test_adapter_tower_matches_torch():
    channels = (16, 32, 32)
    tm = TorchFullAdapter(channels, num_res=2, r=8).eval()
    g = torch.Generator().manual_seed(0)
    cond = torch.rand(2, 3, 64, 64, generator=g)
    with torch.no_grad():
        want = tm(cond)

    tree = C.convert_t2i_adapter(sd_numpy(tm))
    m = T2IAdapter(channels=channels, num_res_blocks=2, downscale_factor=8,
                   dtype=jnp.float32)
    got = m.apply({"params": tree}, jnp.asarray(nchw_to_nhwc(cond)))
    assert [f.shape[1:3] for f in got] == [(8, 8), (4, 4), (2, 2)]
    for i, (a, b) in enumerate(zip(got, want)):
        assert_close(a, b, msg=f"adapter feature {i}")


def test_unet_intrablock_injection_matches_torch():
    """Placement contract on the 3-level mini UNet (2 cross-attn + 1 plain
    down block): features added inside cross-attn blocks (pre-skip),
    after the plain block (post-skip), mid leftover when shapes match."""
    cfg = mini_cfg(9)
    tm = TorchMiniUNet(cfg).eval()
    sample, t, ctx = _inputs(cfg, seed=5)
    g = torch.Generator().manual_seed(6)
    ch = cfg.block_out_channels
    # one feature per down block at its working resolution, plus an
    # XL-style mid-shaped leftover (4x4 after two downsamples)
    feats = [
        0.3 * torch.randn(2, ch[0], 16, 16, generator=g),
        0.3 * torch.randn(2, ch[1], 8, 8, generator=g),
        0.3 * torch.randn(2, ch[2], 4, 4, generator=g),
        0.3 * torch.randn(2, ch[2], 4, 4, generator=g),
    ]
    with torch.no_grad():
        want = tm(sample, t, ctx, intrablock=list(feats))
        want_plain = tm(sample, t, ctx)
    assert not np.allclose(to_np(want), to_np(want_plain), atol=1e-3)

    tree = C.convert_unet(sd_numpy(tm))
    m = _flax_unet(cfg)
    got = m.apply(
        {"params": tree}, jnp.asarray(nchw_to_nhwc(sample)),
        jnp.asarray(to_np(t)), jnp.asarray(to_np(ctx)),
        down_intrablock_additional_residuals=tuple(
            jnp.asarray(nchw_to_nhwc(f)) for f in feats
        ),
    )
    assert_close(got, want, msg="T2I-Adapter intrablock injection")


def test_adapter_feeds_unet_and_zero_is_noop():
    """Tower output shapes feed the UNet directly; zero features leave the
    output bit-identical to the no-adapter forward."""
    cfg = mini_cfg(9)
    m = _flax_unet(cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 16, 16, 9))
    t = jnp.array([500])
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    params = m.init(rng, sample, t, ctx)["params"]

    adapter = T2IAdapter(channels=cfg.block_out_channels, num_res_blocks=1,
                         downscale_factor=8, dtype=jnp.float32)
    cond = jnp.linspace(0, 1, 128 * 128 * 3).reshape(1, 128, 128, 3)
    a_params = adapter.init(jax.random.PRNGKey(1), cond)["params"]
    feats = adapter.apply({"params": a_params}, cond)
    assert [f.shape[-1] for f in feats] == list(cfg.block_out_channels)
    assert [f.shape[1] for f in feats] == [16, 8, 4]

    base = m.apply({"params": params}, sample, t, ctx)
    out = m.apply({"params": params}, sample, t, ctx,
                  down_intrablock_additional_residuals=feats)
    assert not np.allclose(np.asarray(out), np.asarray(base), atol=1e-4)
    zeros = tuple(jnp.zeros_like(f) for f in feats)
    out0 = m.apply({"params": params}, sample, t, ctx,
                   down_intrablock_additional_residuals=zeros)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(base))
