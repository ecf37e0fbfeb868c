"""Composed-model torch oracle: full mini-UNet / mini-BrushNet wiring.

Round-2 verdict: block-level torch parity existed but the COMPOSED graph
(skip-slice order, upsampler output_size, 28-tap BrushNet consumption,
ControlNet residual placement) had no external oracle — the one bug class
that survives until real checkpoints.  Here torch mini-models are built
with the published architectures and diffusers state-dict naming
(reference unet_2d_condition.py:1203-1348, unet_2d_blocks.py:1370-1400,
2740-2770, BrushNet_CA.py:822-934), weights are shared through
io/convert.py, and end-to-end outputs are compared at fp32:

a) plain 9-channel UNet forward (3 levels, 2 layers/block);
b) ControlNet residual addition (9 skips + mid on the 3-level net);
c) BrushNet: torch branch -> 21 taps -> torch UNet vs flax branch ->
   flax UNet, full injection order.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import powerpaint_tpu.io.convert as C  # noqa: E402
from powerpaint_tpu.core.config import (  # noqa: E402
    BrushNetConfig,
    CROSS_ATTN_DOWN,
    CROSS_ATTN_UP,
    DOWN,
    MID_CROSS_ATTN,
    UNetConfig,
    UP,
)

from test_torch_parity import (  # noqa: E402
    TorchResnetBlock2D,
    TorchTransformer2D,
    nchw_to_nhwc,
    sd_numpy,
    to_np,
)

ATOL = 2e-4


def mini_cfg(in_channels=9):
    return UNetConfig(
        sample_size=16,
        in_channels=in_channels,
        out_channels=4,
        down_block_types=(CROSS_ATTN_DOWN, CROSS_ATTN_DOWN, DOWN),
        mid_block_type=MID_CROSS_ATTN,
        up_block_types=(UP, CROSS_ATTN_UP, CROSS_ATTN_UP),
        block_out_channels=(32, 64, 64),
        layers_per_block=2,
        attention_head_dim=4,
        cross_attention_dim=24,
        norm_num_groups=8,
    )


# --------------------------------------------------------------------------
# torch mini modules with the PUBLISHED architectures + diffusers naming
# --------------------------------------------------------------------------


def sinusoid(timesteps, dim):
    """diffusers get_timestep_embedding, flip_sin_to_cos=True, shift=0."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / half
    emb = timesteps.float()[:, None] * torch.exp(exponent)[None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TorchDownsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TorchUpsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x, output_size=None):
        if output_size is None:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
        else:
            x = F.interpolate(x, size=output_size, mode="nearest")
        return self.conv(x)


class TorchDownBlock(nn.Module):
    """(CrossAttn)DownBlock2D with the fork's brushnet tap placement
    (unet_2d_blocks.py:1370-1400): tap after each resnet(+attn) BEFORE the
    skip is recorded, tap after the downsampler BEFORE its skip."""

    def __init__(self, cin, cout, temb, groups, cross, ctx, heads,
                 add_down):
        super().__init__()
        self.resnets = nn.ModuleList([
            TorchResnetBlock2D(cin if j == 0 else cout, cout, temb, groups,
                               1e-5)
            for j in range(2)
        ])
        self.attentions = (
            nn.ModuleList([TorchTransformer2D(cout, ctx, heads, 32)
                           for _ in range(2)])
            if cross else None
        )
        self.downsamplers = (
            nn.ModuleList([TorchDownsample(cout)]) if add_down else None
        )

    def forward(self, x, temb, ctx, taps=None, extra_residual=None):
        # extra_residual: T2I-Adapter intrablock feature — added after the
        # LAST resnet+attn pair, BEFORE the brushnet tap and skip record
        # (reference unet_2d_blocks.py:1385-1392)
        skips = []
        for j, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x, ctx)
            if extra_residual is not None and j == len(self.resnets) - 1:
                x = x + extra_residual
            if taps is not None:
                x = x + taps.pop(0)
            skips.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            if taps is not None:
                x = x + taps.pop(0)
            skips.append(x)
        return x, skips


class TorchMidBlock(nn.Module):
    def __init__(self, ch, temb, groups, ctx, heads):
        super().__init__()
        self.resnets = nn.ModuleList([
            TorchResnetBlock2D(ch, ch, temb, groups, 1e-5),
            TorchResnetBlock2D(ch, ch, temb, groups, 1e-5),
        ])
        self.attentions = nn.ModuleList(
            [TorchTransformer2D(ch, ctx, heads, 32)]
        )

    def forward(self, x, temb, ctx):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, ctx)
        return self.resnets[1](x, temb)


class TorchUpBlock(nn.Module):
    """(CrossAttn)UpBlock2D: skip-concat per resnet, optional upsampler
    with output_size; fork's tap/emit placement (unet_2d_blocks.py:
    2740-2770): emit AFTER resnet, tap added after emit."""

    def __init__(self, cin, cout, prev_out, temb, groups, cross, ctx,
                 heads, add_up, skip_chs):
        super().__init__()
        self.resnets = nn.ModuleList()
        for j in range(3):
            res_in = prev_out if j == 0 else cout
            self.resnets.append(
                TorchResnetBlock2D(res_in + skip_chs[j], cout, temb,
                                   groups, 1e-5)
            )
        self.attentions = (
            nn.ModuleList([TorchTransformer2D(cout, ctx, heads, 32)
                           for _ in range(3)])
            if cross else None
        )
        self.upsamplers = (
            nn.ModuleList([TorchUpsample(cout)]) if add_up else None
        )

    def forward(self, x, temb, skips, ctx, output_size=None, taps=None,
                emit=None):
        for j, resnet in enumerate(self.resnets):
            skip = skips.pop()
            x = torch.cat([x, skip], dim=1)
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[j](x, ctx)
            if emit is not None:
                emit.append(x)
            if taps is not None:
                x = x + taps.pop(0)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x, output_size)
            if emit is not None:
                emit.append(x)
            if taps is not None:
                x = x + taps.pop(0)
        return x


class TorchTimestepMLP(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.linear_1 = nn.Linear(cin, cout)
        self.linear_2 = nn.Linear(cout, cout)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TorchMiniUNet(nn.Module):
    """3-level UNet2DConditionModel with the reference fork's injection
    wiring (unet_2d_condition.py:1203-1348)."""

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        ch = cfg.block_out_channels
        temb = ch[0] * 4
        g = cfg.norm_num_groups
        heads = cfg.attention_head_dim
        ctx = cfg.cross_attention_dim
        self.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = TorchTimestepMLP(ch[0], temb)
        self.down_blocks = nn.ModuleList()
        for i, bt in enumerate(cfg.down_block_types):
            cin = ch[max(i - 1, 0)]
            self.down_blocks.append(TorchDownBlock(
                cin, ch[i], temb, g, bt == CROSS_ATTN_DOWN, ctx, heads,
                add_down=i < len(ch) - 1,
            ))
        self.mid_block = TorchMidBlock(ch[-1], temb, g, ctx, heads)
        self.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        for i, bt in enumerate(cfg.up_block_types):
            prev = rev[max(i - 1, 0)]
            # skip channels this block consumes, pop order (reversed push)
            skip_chs = self._skip_channels()[::-1][i * 3:(i + 1) * 3]
            self.up_blocks.append(TorchUpBlock(
                rev[i], rev[i], prev, temb, g, bt == CROSS_ATTN_UP, ctx,
                heads, add_up=i < len(ch) - 1, skip_chs=skip_chs,
            ))
        self.conv_norm_out = nn.GroupNorm(g, ch[0], eps=cfg.norm_eps)
        self.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def _skip_channels(self):
        ch = self.cfg.block_out_channels
        out = [ch[0]]
        for i in range(len(ch)):
            out += [ch[i]] * 2
            if i < len(ch) - 1:
                out.append(ch[i])
        return out

    def forward(self, sample, timesteps, ctx, *, down_taps=None,
                mid_tap=None, up_taps=None, cn_down=None, cn_mid=None,
                intrablock=None):
        temb = self.time_embedding(
            sinusoid(timesteps, self.cfg.block_out_channels[0])
        )
        x = self.conv_in(sample)
        skips = [x]
        if down_taps is not None:
            down_taps = list(down_taps)
            x = x + down_taps.pop(0)
        intrablock = list(intrablock) if intrablock is not None else None
        for blk in self.down_blocks:
            if blk.attentions is not None:
                extra = intrablock.pop(0) if intrablock else None
                x, s = blk(x, temb, ctx, taps=down_taps,
                           extra_residual=extra)
            else:
                # plain block: adapter feature added AFTER the block,
                # skips unchanged (reference unet_2d_condition.py:1256-1260)
                x, s = blk(x, temb, ctx, taps=down_taps)
                if intrablock:
                    x = x + intrablock.pop(0)
            skips += s
        if cn_down is not None:
            skips = [s + r for s, r in zip(skips, cn_down)]
        x = self.mid_block(x, temb, ctx)
        # T2I-Adapter-XL: leftover feature for the mid block when shapes
        # match (reference unet_2d_condition.py:1288-1294)
        if intrablock and x.shape == intrablock[0].shape:
            x = x + intrablock.pop(0)
        if cn_mid is not None:
            x = x + cn_mid
        if mid_tap is not None:
            x = x + mid_tap
        up_taps = list(up_taps) if up_taps is not None else None
        for i, blk in enumerate(self.up_blocks):
            take, skips = skips[-3:], skips[:-3]
            output_size = skips[-1].shape[2:] if skips else None
            x = blk(x, temb, take, ctx, output_size=output_size,
                    taps=up_taps)
        x = F.silu(self.conv_norm_out(x))
        return self.conv_out(x)


class TorchMiniBrushNet(nn.Module):
    """BrushNet_CA composition (BrushNet_CA.py:822-934): conv_in_condition
    on concat(latent, 5ch cond), full down/mid/up, features exit through
    1x1 convs (zero-init in the real model; randomized here so the test
    sees signal)."""

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        ch = cfg.block_out_channels
        temb = ch[0] * 4
        g = cfg.norm_num_groups
        heads = cfg.attention_head_dim
        ctx = cfg.cross_attention_dim
        self.conv_in_condition = nn.Conv2d(4 + 5, ch[0], 3, padding=1)
        self.time_embedding = TorchTimestepMLP(ch[0], temb)
        self.down_blocks = nn.ModuleList()
        for i, bt in enumerate(cfg.down_block_types):
            cin = ch[max(i - 1, 0)]
            self.down_blocks.append(TorchDownBlock(
                cin, ch[i], temb, g, bt == CROSS_ATTN_DOWN, ctx, heads,
                add_down=i < len(ch) - 1,
            ))
        self.mid_block = TorchMidBlock(ch[-1], temb, g, ctx, heads)
        self.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        skip_all = TorchMiniUNet._skip_channels(self)[::-1]
        for i, bt in enumerate(cfg.up_block_types):
            prev = rev[max(i - 1, 0)]
            self.up_blocks.append(TorchUpBlock(
                rev[i], rev[i], prev, temb, g, bt == CROSS_ATTN_UP, ctx,
                heads, add_up=i < len(ch) - 1,
                skip_chs=skip_all[i * 3:(i + 1) * 3],
            ))
        down_chs = TorchMiniUNet._skip_channels(self)
        self.brushnet_down_blocks = nn.ModuleList(
            [nn.Conv2d(c, c, 1) for c in down_chs]
        )
        self.brushnet_mid_block = nn.Conv2d(ch[-1], ch[-1], 1)
        up_chs = []
        for i in range(len(cfg.up_block_types)):
            up_chs += [rev[i]] * 3
            if i < len(ch) - 1:
                up_chs.append(rev[i])
        self.brushnet_up_blocks = nn.ModuleList(
            [nn.Conv2d(c, c, 1) for c in up_chs]
        )

    def forward(self, sample, timesteps, ctx, cond, scale=1.0):
        temb = self.time_embedding(
            sinusoid(timesteps, self.cfg.block_out_channels[0])
        )
        x = self.conv_in_condition(torch.cat([sample, cond], dim=1))
        feats = [x]
        for blk in self.down_blocks:
            x, s = blk(x, temb, ctx)
            feats += s
        down_taps = [z(f) * scale
                     for z, f in zip(self.brushnet_down_blocks, feats)]
        skips = list(feats)
        x = self.mid_block(x, temb, ctx)
        mid_tap = self.brushnet_mid_block(x) * scale
        up_feats = []
        for i, blk in enumerate(self.up_blocks):
            take, skips = skips[-3:], skips[:-3]
            output_size = skips[-1].shape[2:] if skips else None
            x = blk(x, temb, take, ctx, output_size=output_size,
                    emit=up_feats)
        up_taps = [z(f) * scale
                   for z, f in zip(self.brushnet_up_blocks, up_feats)]
        return down_taps, mid_tap, up_taps


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def _flax_unet(cfg):
    from powerpaint_tpu.models.unet import UNet2DConditionModel

    return UNet2DConditionModel(cfg, dtype=jnp.float32)


def _inputs(cfg, seed=0):
    g = torch.Generator().manual_seed(seed)
    sample = torch.randn(2, cfg.in_channels, 16, 16, generator=g)
    t = torch.tensor([500, 10])
    ctx = torch.randn(2, 77, cfg.cross_attention_dim, generator=g)
    return sample, t, ctx


def assert_close(flax_nhwc, torch_nchw, atol=ATOL, msg=""):
    got = np.transpose(np.asarray(flax_nhwc), (0, 3, 1, 2))
    want = to_np(torch_nchw)
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3, err_msg=msg)


def test_composed_unet_plain_forward():
    cfg = mini_cfg(9)
    tm = TorchMiniUNet(cfg).eval()
    sample, t, ctx = _inputs(cfg)
    with torch.no_grad():
        want = tm(sample, t, ctx)

    tree = C.convert_unet(sd_numpy(tm))
    m = _flax_unet(cfg)
    got = m.apply({"params": tree}, jnp.asarray(nchw_to_nhwc(sample)),
                  jnp.asarray(to_np(t)), jnp.asarray(to_np(ctx)))
    assert_close(got, want, msg="composed plain UNet forward")


def test_composed_unet_controlnet_residuals():
    cfg = mini_cfg(9)
    tm = TorchMiniUNet(cfg).eval()
    sample, t, ctx = _inputs(cfg, 1)
    g = torch.Generator().manual_seed(2)
    skip_shapes = [(2, 32, 16, 16)]
    hw = 16
    ch = cfg.block_out_channels
    for i in range(len(ch)):
        skip_shapes += [(2, ch[i], hw, hw)] * 2
        if i < len(ch) - 1:
            hw //= 2
            skip_shapes.append((2, ch[i], hw, hw))
    cn_down = [0.1 * torch.randn(s, generator=g) for s in skip_shapes]
    cn_mid = 0.1 * torch.randn(2, ch[-1], hw, hw, generator=g)
    with torch.no_grad():
        want = tm(sample, t, ctx, cn_down=cn_down, cn_mid=cn_mid)

    tree = C.convert_unet(sd_numpy(tm))
    m = _flax_unet(cfg)
    got = m.apply(
        {"params": tree}, jnp.asarray(nchw_to_nhwc(sample)),
        jnp.asarray(to_np(t)), jnp.asarray(to_np(ctx)),
        down_block_additional_residuals=tuple(
            jnp.asarray(nchw_to_nhwc(r)) for r in cn_down
        ),
        mid_block_additional_residual=jnp.asarray(nchw_to_nhwc(cn_mid)),
    )
    assert_close(got, want, msg="ControlNet residual placement")


def test_composed_brushnet_full_injection():
    """The flagship wiring test: torch branch -> taps -> torch UNet vs the
    full flax pair, all 21 taps (9 down + 1 mid + 11 up) consumed in
    order."""
    from powerpaint_tpu.models.brushnet import BrushNetModel

    cfg = mini_cfg(4)
    tb = TorchMiniBrushNet(cfg).eval()
    tm = TorchMiniUNet(cfg).eval()
    sample, t, ctx = _inputs(cfg, 3)
    g = torch.Generator().manual_seed(4)
    cond = torch.randn(2, 5, 16, 16, generator=g)

    with torch.no_grad():
        d_taps, m_tap, u_taps = tb(sample, t, ctx, cond, scale=0.8)
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
    # taps themselves must match (branch wiring)
    for i, (a, b) in enumerate(zip(fd, d_taps)):
        assert_close(a, b, msg=f"down tap {i}")
    assert_close(fm, m_tap, msg="mid tap")
    for i, (a, b) in enumerate(zip(fu, u_taps)):
        assert_close(a, b, msg=f"up tap {i}")

    m = _flax_unet(cfg)
    got = m.apply(
        {"params": un_tree}, jnp.asarray(nchw_to_nhwc(sample)),
        jnp.asarray(to_np(t)), jnp.asarray(to_np(ctx)),
        down_block_add_samples=fd, mid_block_add_sample=fm,
        up_block_add_samples=fu,
    )
    assert_close(got, want, msg="full BrushNet-injected UNet forward")


class TorchCondEmbedding(nn.Module):
    """diffusers ControlNetConditioningEmbedding: conv_in -> silu ->
    [conv s1, silu, conv s2, silu]x3 -> zero conv_out."""

    def __init__(self, out_ch, embed=(8, 16, 16, 32)):
        super().__init__()
        self.conv_in = nn.Conv2d(3, embed[0], 3, padding=1)
        blocks = []
        for i in range(len(embed) - 1):
            blocks.append(nn.Conv2d(embed[i], embed[i], 3, padding=1))
            blocks.append(nn.Conv2d(embed[i], embed[i + 1], 3, stride=2,
                                    padding=1))
        self.blocks = nn.ModuleList(blocks)
        self.conv_out = nn.Conv2d(embed[-1], out_ch, 3, padding=1)

    def forward(self, cond):
        x = F.silu(self.conv_in(cond))
        for blk in self.blocks:
            x = F.silu(blk(x))
        return self.conv_out(x)


class TorchMiniControlNet(nn.Module):
    """diffusers ControlNetModel composition: conv_in + cond embedding,
    down blocks, mid, zero convs on every skip + mid (randomized here)."""

    def __init__(self, cfg, embed=(8, 16, 16, 32)):
        super().__init__()
        self.cfg = cfg
        ch = cfg.block_out_channels
        temb = ch[0] * 4
        g = cfg.norm_num_groups
        heads = cfg.attention_head_dim
        ctx = cfg.cross_attention_dim
        self.conv_in = nn.Conv2d(4, ch[0], 3, padding=1)
        self.controlnet_cond_embedding = TorchCondEmbedding(ch[0], embed)
        self.time_embedding = TorchTimestepMLP(ch[0], temb)
        self.down_blocks = nn.ModuleList()
        for i, bt in enumerate(cfg.down_block_types):
            cin = ch[max(i - 1, 0)]
            self.down_blocks.append(TorchDownBlock(
                cin, ch[i], temb, g, bt == CROSS_ATTN_DOWN, ctx, heads,
                add_down=i < len(ch) - 1,
            ))
        self.mid_block = TorchMidBlock(ch[-1], temb, g, ctx, heads)
        down_chs = TorchMiniUNet._skip_channels(self)
        self.controlnet_down_blocks = nn.ModuleList(
            [nn.Conv2d(c, c, 1) for c in down_chs]
        )
        self.controlnet_mid_block = nn.Conv2d(ch[-1], ch[-1], 1)

    def forward(self, sample, timesteps, ctx, cond, scale=1.0):
        temb = self.time_embedding(
            sinusoid(timesteps, self.cfg.block_out_channels[0])
        )
        x = self.conv_in(sample) + self.controlnet_cond_embedding(cond)
        feats = [x]
        for blk in self.down_blocks:
            x, s = blk(x, temb, ctx)
            feats += s
        x = self.mid_block(x, temb, ctx)
        down = [z(f) * scale
                for z, f in zip(self.controlnet_down_blocks, feats)]
        mid = self.controlnet_mid_block(x) * scale
        return down, mid


def test_composed_controlnet_branch_and_injection():
    """Torch mini-ControlNet -> residuals -> torch UNet vs the full flax
    pair: branch computation (cond embedding + half-UNet + zero convs)
    AND residual placement, end to end."""
    from powerpaint_tpu.core.config import ControlNetConfig
    from powerpaint_tpu.models.controlnet import ControlNetModel

    cfg = mini_cfg(9)
    cn_base = mini_cfg(4)
    tcn = TorchMiniControlNet(cn_base).eval()
    tm = TorchMiniUNet(cfg).eval()
    g = torch.Generator().manual_seed(7)
    sample9 = torch.randn(2, 9, 16, 16, generator=g)
    sample4 = sample9[:, :4]
    t = torch.tensor([500, 10])
    ctx = torch.randn(2, 77, cfg.cross_attention_dim, generator=g)
    cond = torch.rand(2, 3, 128, 128, generator=g)  # 8x latent size

    with torch.no_grad():
        d_res, m_res = tcn(sample4, t, ctx, cond, scale=0.7)
        want = tm(sample9, t, ctx, cn_down=d_res, cn_mid=m_res)

    cn_tree = C.convert_controlnet(sd_numpy(tcn))
    un_tree = C.convert_unet(sd_numpy(tm))
    ccfg = ControlNetConfig(base=cn_base,
                            conditioning_embedding_out_channels=(8, 16, 16, 32))
    cn = ControlNetModel(ccfg, dtype=jnp.float32)
    fd, fm = cn.apply(
        {"params": cn_tree}, jnp.asarray(nchw_to_nhwc(sample4)),
        jnp.asarray(to_np(t)), jnp.asarray(to_np(ctx)),
        jnp.asarray(nchw_to_nhwc(cond)), conditioning_scale=0.7,
    )
    for i, (a, b) in enumerate(zip(fd, d_res)):
        assert_close(a, b, msg=f"cn down residual {i}")
    assert_close(fm, m_res, msg="cn mid residual")

    m = _flax_unet(cfg)
    got = m.apply(
        {"params": un_tree}, jnp.asarray(nchw_to_nhwc(sample9)),
        jnp.asarray(to_np(t)), jnp.asarray(to_np(ctx)),
        down_block_additional_residuals=fd,
        mid_block_additional_residual=fm,
    )
    assert_close(got, want, msg="ControlNet-injected UNet forward")
