"""PRODUCTION-config composed torch oracle (opt-in ``slow`` tests).

The mini composed oracles (test_composed_oracle.py) pin the wiring at
channels 32/64/64, head_dim 4, 8 GN groups.  The production shape paths —
block_out_channels (320, 640, 1280, 1280), the heads=8 / head_dim=40
attention split, 32-group GroupNorm, the full 28-tap BrushNet schedule
(12 down + 1 mid + 15 up) — had never been compared against torch end to
end; shape-dependent wiring/padding bugs are exactly what would survive to
real-weight day.  Here the SAME config-generic torch minis are built at
the published SD1.5 architecture (reference
powerpaint/models/unet_2d_condition.py:1203-1348 and
BrushNet_CA.py:822-934 at production config) and compared at 8x8 latent,
fp32, batch 1 — big enough to exercise every channel/head split, small
enough to run in minutes on CPU.

Run with:  pytest tests/test_composed_oracle_prod.py --run-slow
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import powerpaint_tpu.io.convert as C  # noqa: E402
from powerpaint_tpu.core.config import (  # noqa: E402
    BrushNetConfig,
    ControlNetConfig,
    UNetConfig,
)

from test_composed_oracle import (  # noqa: E402
    TorchMiniBrushNet,
    TorchMiniControlNet,
    TorchMiniUNet,
    assert_close,
)
from test_torch_parity import nchw_to_nhwc, sd_numpy, to_np  # noqa: E402

pytestmark = pytest.mark.slow

# fp32 end-to-end at 1280 channels accumulates more rounding than the mini
# nets; outputs are O(1) so 2e-3 absolute still pins the wiring exactly
# (a misplaced tap or mis-sliced skip shows up at O(0.1)).
ATOL = 2e-3
HW = 8  # latent side; conditioning images are 8x this (64x64)


def prod_cfg(in_channels=9) -> UNetConfig:
    """The published SD1.5 UNet architecture — UNetConfig's defaults
    (config.py:65-111) ARE production; only the latent side is shrunk."""
    return UNetConfig(sample_size=HW, in_channels=in_channels)


def _inputs(cfg, seed=0, batch=1):
    g = torch.Generator().manual_seed(seed)
    sample = torch.randn(batch, cfg.in_channels, HW, HW, generator=g)
    t = torch.tensor([500] * batch)
    ctx = torch.randn(batch, 77, cfg.cross_attention_dim, generator=g)
    return sample, t, ctx


def _flax_unet(cfg):
    from powerpaint_tpu.models.unet import UNet2DConditionModel

    return UNet2DConditionModel(cfg, dtype=jnp.float32)


def test_prod_unet_plain_forward():
    """9-channel inpainting UNet at full production dims: every conv
    320/640/1280, heads=8 (head_dim 40/80/160), 32-group GN."""
    cfg = prod_cfg(9)
    with torch.no_grad():
        tm = TorchMiniUNet(cfg).eval()
        sample, t, ctx = _inputs(cfg)
        want = tm(sample, t, ctx)

        tree = C.convert_unet(sd_numpy(tm))
    m = _flax_unet(cfg)
    got = m.apply({"params": tree}, jnp.asarray(nchw_to_nhwc(sample)),
                  jnp.asarray(to_np(t)), jnp.asarray(to_np(ctx)))
    assert_close(got, want, atol=ATOL, msg="prod plain UNet forward")


def test_prod_brushnet_full_injection():
    """Full 28-tap BrushNet at production dims: torch branch -> 12+1+15
    taps -> torch UNet vs the flax pair, injection order end to end."""
    from powerpaint_tpu.models.brushnet import BrushNetModel

    cfg = prod_cfg(4)
    with torch.no_grad():
        tb = TorchMiniBrushNet(cfg).eval()
        tm = TorchMiniUNet(cfg).eval()
        sample, t, ctx = _inputs(cfg, seed=3)
        g = torch.Generator().manual_seed(4)
        cond = torch.randn(1, 5, HW, HW, generator=g)
        d_taps, m_tap, u_taps = tb(sample, t, ctx, cond, scale=0.8)
        assert len(d_taps) == 12 and len(u_taps) == 15
        want = tm(sample, t, ctx, down_taps=d_taps, mid_tap=m_tap,
                  up_taps=u_taps)

        bn_tree = C.convert_brushnet(sd_numpy(tb))
        un_tree = C.convert_unet(sd_numpy(tm))
    bcfg = BrushNetConfig(base=cfg)
    bn = BrushNetModel(bcfg, dtype=jnp.float32)
    fd, fm, fu = bn.apply(
        {"params": bn_tree}, jnp.asarray(nchw_to_nhwc(sample)),
        jnp.asarray(to_np(t)), jnp.asarray(to_np(ctx)),
        jnp.asarray(nchw_to_nhwc(cond)), conditioning_scale=0.8,
    )
    for i, (a, b) in enumerate(zip(fd, d_taps)):
        assert_close(a, b, atol=ATOL, msg=f"prod down tap {i}")
    assert_close(fm, m_tap, atol=ATOL, msg="prod mid tap")
    for i, (a, b) in enumerate(zip(fu, u_taps)):
        assert_close(a, b, atol=ATOL, msg=f"prod up tap {i}")

    m = _flax_unet(cfg)
    got = m.apply(
        {"params": un_tree}, jnp.asarray(nchw_to_nhwc(sample)),
        jnp.asarray(to_np(t)), jnp.asarray(to_np(ctx)),
        down_block_add_samples=fd, mid_block_add_sample=fm,
        up_block_add_samples=fu,
    )
    assert_close(got, want, atol=ATOL,
                 msg="prod BrushNet-injected UNet forward")


def test_prod_controlnet_branch_and_injection():
    """ControlNet branch (cond embedding at 64x64 -> half-UNet -> zero
    convs) + residual placement on the 9-ch UNet, production dims."""
    from powerpaint_tpu.models.controlnet import ControlNetModel

    cfg = prod_cfg(9)
    cn_base = prod_cfg(4)
    with torch.no_grad():
        tcn = TorchMiniControlNet(cn_base, embed=(16, 32, 96, 256)).eval()
        tm = TorchMiniUNet(cfg).eval()
        g = torch.Generator().manual_seed(7)
        sample9 = torch.randn(1, 9, HW, HW, generator=g)
        sample4 = sample9[:, :4]
        t = torch.tensor([500])
        ctx = torch.randn(1, 77, cfg.cross_attention_dim, generator=g)
        cond = torch.rand(1, 3, HW * 8, HW * 8, generator=g)
        d_res, m_res = tcn(sample4, t, ctx, cond, scale=0.7)
        want = tm(sample9, t, ctx, cn_down=d_res, cn_mid=m_res)

        cn_tree = C.convert_controlnet(sd_numpy(tcn))
        un_tree = C.convert_unet(sd_numpy(tm))
    ccfg = ControlNetConfig(
        base=cn_base,
        conditioning_embedding_out_channels=(16, 32, 96, 256),
    )
    cn = ControlNetModel(ccfg, dtype=jnp.float32)
    fd, fm = cn.apply(
        {"params": cn_tree}, jnp.asarray(nchw_to_nhwc(sample4)),
        jnp.asarray(to_np(t)), jnp.asarray(to_np(ctx)),
        jnp.asarray(nchw_to_nhwc(cond)), conditioning_scale=0.7,
    )
    for i, (a, b) in enumerate(zip(fd, d_res)):
        assert_close(a, b, atol=ATOL, msg=f"prod cn down residual {i}")
    assert_close(fm, m_res, atol=ATOL, msg="prod cn mid residual")

    m = _flax_unet(cfg)
    got = m.apply(
        {"params": un_tree}, jnp.asarray(nchw_to_nhwc(sample9)),
        jnp.asarray(to_np(t)), jnp.asarray(to_np(ctx)),
        down_block_additional_residuals=fd,
        mid_block_additional_residual=fm,
    )
    assert_close(got, want, atol=ATOL,
                 msg="prod ControlNet-injected UNet forward")
