"""Full end-to-end generate-loop torch/numpy oracle.

Round-4 verdict item 4: the composed-model oracles
(test_composed_oracle*.py) pin the MODEL graph; this file pins the complete
pipeline step chain — scheduler table math (DDIM and UniPC re-implemented
independently here in float64 numpy, diffusers-stateful style, NOT our
precomputed-table form), CFG combine, the 9-channel inpaint concat,
known-region latent blending, BrushNet 28-tap injection, ControlNet
residual summation, VAE encode/sample/decode, and the uint8 postprocess —
against the jitted single-``lax.scan`` pipelines, with:

- identical weights: torch modules with diffusers state-dict naming,
  converted through io/convert.py (the production checkpoint path);
- identical prompts: the same token ids through a REAL
  ``transformers.CLIPTextModel`` (with the task-token table extension the
  reference's EmbeddingLayerWithFixes splice is equivalent to — see
  test_torch_parity.py::test_external_embedding_gather_equals_reference_splice);
- identical noise: the pipelines' per-image threefry streams, reproduced
  with jax.random OUTSIDE the pipeline and fed to the oracle as plain
  data (RNG itself is not under test — SURVEY.md §7 hard-part 1: torch
  Philox cannot reproduce threefry, so parity injects identical tensors);
- the nearest-resized latent mask taken as shared input for the same
  reason (jax.image.resize half-pixel nearest vs torch floor nearest is a
  documented semantic choice, not chain math).

Reference loops: /root/reference/powerpaint/pipelines/
pipeline_PowerPaint.py:985-1041 (v1, 9-ch concat :996, CFG :1018-1020,
known-region blend :1025-1035), pipeline_PowerPaint_Brushnet_CA.py:1383-1466
(v2, brushnet call :1411-1419, injection kwargs :1430-1441),
pipeline_PowerPaint_ControlNet.py:1660-1741 (CN, controlnet call :1686-1694,
residual add :1707).

Mini-dim variants run in the default tier; the ``slow`` variants rerun the
same chains at PRODUCTION channel dims (320/640/1280 UNet, 128..512 VAE,
768 ctx) on an 8x8 latent, fp32, batch 1.

Explicit error bound: final uint8 images match within MAX_UINT8_DIFF and
mean absolute difference below MEAN_UINT8_DIFF.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import powerpaint_tpu.io.convert as C  # noqa: E402
from powerpaint_tpu.core.config import (  # noqa: E402
    BrushNetConfig,
    CLIPTextConfig,
    ControlNetConfig,
    PowerPaintConfig,
    UNetConfig,
    VAEConfig,
)
from powerpaint_tpu.text.prompts import add_task, v2_prompt_suffix  # noqa: E402
from powerpaint_tpu.text.tokenizer import (  # noqa: E402
    HashTokenizer,
    TokenizerWrapper,
    add_task_tokens,
)

from test_composed_oracle import (  # noqa: E402
    TorchMiniBrushNet,
    TorchMiniControlNet,
    TorchMiniUNet,
    mini_cfg,
)
from test_torch_parity import (  # noqa: E402
    TorchVAEAttention,
    nchw_to_nhwc,
    sd_numpy,
    to_np,
)

# fp32 end-to-end: two CFG UNet forwards + a VAE decode accumulate a few
# 1e-3 of rounding at production channel dims; on a [0,255] image that is
# ~0.5 gray levels.  A misplaced tap / wrong scheduler table / swapped CFG
# half shows up at tens of levels.
MAX_UINT8_DIFF = 3
MEAN_UINT8_DIFF = 0.5

SCALING = 0.18215


# ===========================================================================
# independent float64 schedulers (diffusers-stateful style, built from the
# published equations — deliberately NOT our precomputed-table form)
# ===========================================================================


def np_schedule(num_steps, T=1000, beta_start=0.00085, beta_end=0.012,
                offset=1):
    """scaled_linear betas + 'leading' spacing with steps_offset (the SD1.5
    configuration the reference inherits, SchedulerConfig defaults)."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, T,
                        dtype=np.float64) ** 2
    acp = np.cumprod(1.0 - betas)
    ratio = T // num_steps
    ts = (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64)
    ts = np.clip(ts + offset, 0, T - 1)
    final_acp = float(acp[0])  # set_alpha_to_one=False
    return acp, ts, ratio, final_acp


class NpDDIM:
    """Song et al. 2020 eta=0 update, float64 (reference 'DDIM steps')."""

    def __init__(self, num_steps):
        self.acp, self.ts, self.ratio, self.final = np_schedule(num_steps)
        self.S = num_steps

    init_noise_sigma = 1.0

    def alpha(self, t):
        return self.acp[t] if t >= 0 else self.final

    def step(self, x, eps, i):
        t = int(self.ts[i])
        t_prev = t - self.ratio
        a_t, a_prev = self.alpha(t), self.alpha(t_prev)
        x0 = (x - np.sqrt(1.0 - a_t) * eps) / np.sqrt(a_t)
        return np.sqrt(a_prev) * x0 + np.sqrt(1.0 - a_prev) * eps

    def add_noise(self, x0, noise, t):
        a = self.acp[t]
        return np.sqrt(a) * x0 + np.sqrt(1.0 - a) * noise


class NpUniPC:
    """UniPC (Zhao et al. 2023) data-prediction bh2, order<=2, stateful
    float64 — the diffusers UniPCMultistepScheduler flow: at step i the
    model is evaluated on the PREDICTED (uncorrected) sample, the fresh
    x0-prediction first CORRECTS the previous transition, then the
    predictor advances.  lower_order_final warmup ramp as in diffusers."""

    init_noise_sigma = 1.0

    def __init__(self, num_steps, order=2, lower_order_final=True):
        self.acp, self.ts, _, self.final = np_schedule(num_steps)
        self.alpha_t = np.sqrt(self.acp)
        self.sigma_t = np.sqrt(1.0 - self.acp)
        self.lam = np.log(self.alpha_t) - np.log(self.sigma_t)
        self.S = num_steps
        self.order = order
        self.lof = lower_order_final
        self.i = 0
        self.m_hist = []  # x0 predictions, newest LAST
        self.last_sample = None

    def _at(self, t):
        t = max(int(t), 0)  # t<0 boundary -> t=0 tables
        return self.alpha_t[t], self.sigma_t[t], self.lam[t]

    def _order_p(self, i):
        o = self.order
        if self.lof:
            o = min(o, self.S - i)
        return max(1, min(o, i + 1))

    @staticmethod
    def _bh2(hh):
        h_phi_1 = np.expm1(hh)
        B_h = np.expm1(hh)
        h_phi_k1 = h_phi_1 / hh - 1.0
        b1 = h_phi_k1 / B_h
        h_phi_k2 = h_phi_k1 / hh - 0.5
        b2 = 2.0 * h_phi_k2 / B_h
        return h_phi_1, b1, b2, B_h

    def _uni_c(self, x_pred, m_t):
        """Correct last_sample's transition t_{i-1} -> t_i with the fresh
        x0-pred m_t; order = predictor order used at i-1."""
        i = self.i
        oc = self._order_p(i - 1)
        a_t, s_t, l_t = self._at(self.ts[i])
        a_s0, s_s0, l_s0 = self._at(self.ts[i - 1])
        h = l_t - l_s0
        hh = -h
        h_phi_1, b1, b2, B_h = self._bh2(hh)
        m0 = self.m_hist[-1]  # x0-pred of the model eval at t_{i-1}
        if oc == 1:
            corr = 0.5 * (m_t - m0)
        else:
            _, _, l_s1 = self._at(self.ts[i - 2])
            r1 = (l_s1 - l_s0) / h
            R = np.array([[1.0, 1.0], [r1, 1.0]])
            rhos = np.linalg.solve(R, np.array([b1, b2]))
            D1 = (self.m_hist[-2] - m0) / r1
            corr = rhos[0] * D1 + rhos[1] * (m_t - m0)
        return (s_t / s_s0) * self.last_sample - a_t * h_phi_1 * m0 \
            - a_t * B_h * corr

    def _uni_p(self, x, m0):
        """Predict t_i -> t_{i+1} from the (corrected) sample x."""
        i = self.i
        t_next = int(self.ts[i + 1]) if i + 1 < self.S else 0
        a_t, s_t, l_t = self._at(t_next)
        a_s0, s_s0, l_s0 = self._at(self.ts[i])
        h = l_t - l_s0
        hh = -h
        h_phi_1, _, _, B_h = self._bh2(hh)
        out = (s_t / s_s0) * x - a_t * h_phi_1 * m0
        if self._order_p(i) >= 2:
            _, _, l_s1 = self._at(self.ts[i - 1])
            r1 = (l_s1 - l_s0) / h
            D1 = (self.m_hist[-2] - m0) / r1
            out = out - a_t * B_h * 0.5 * D1  # diffusers' hardcoded rho_p
        return out

    def step(self, x, eps, i):
        assert i == self.i
        t = int(self.ts[i])
        a_t, s_t, _ = self._at(t)
        m_t = (x - s_t * eps) / a_t  # data prediction
        if i >= 1:
            x = self._uni_c(x, m_t)
        self.m_hist.append(m_t)
        self.last_sample = x
        out = self._uni_p(x, m_t)
        self.i += 1
        return out


# ===========================================================================
# torch mini VAE (diffusers AutoencoderKL naming, config-generic)
# ===========================================================================


class TorchVAEResnet(nn.Module):
    """diffusers ResnetBlock2D without time embedding (VAE form, eps 1e-6)."""

    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        s = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return s + h


class TorchVAEDownBlock(nn.Module):
    def __init__(self, cin, cout, layers, groups, add_down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TorchVAEResnet(cin if j == 0 else cout, cout, groups)
             for j in range(layers)]
        )
        if add_down:
            # diffusers Downsample2D pad=0 form: F.pad (0,1,0,1) + VALID s2
            self.downsamplers = nn.ModuleList(
                [nn.Module()]
            )
            self.downsamplers[0].conv = nn.Conv2d(cout, cout, 3, stride=2)
        else:
            self.downsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = F.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0].conv(x)
        return x


class TorchVAEUpBlock(nn.Module):
    def __init__(self, cin, cout, layers, groups, add_up):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TorchVAEResnet(cin if j == 0 else cout, cout, groups)
             for j in range(layers)]
        )
        if add_up:
            self.upsamplers = nn.ModuleList([nn.Module()])
            self.upsamplers[0].conv = nn.Conv2d(cout, cout, 3, padding=1)
        else:
            self.upsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class TorchVAEMid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TorchVAEResnet(ch, ch, groups), TorchVAEResnet(ch, ch, groups)]
        )
        self.attentions = nn.ModuleList([TorchVAEAttention(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TorchMiniVAE(nn.Module):
    """AutoencoderKL composition with diffusers naming: encoder/decoder
    trees + top-level quant_conv/post_quant_conv (io/convert.py::convert_vae
    relocates them)."""

    def __init__(self, cfg: VAEConfig):
        super().__init__()
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        lat = cfg.latent_channels
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        for i, c in enumerate(ch):
            cin = ch[max(i - 1, 0)] if i else ch[0]
            enc.down_blocks.append(TorchVAEDownBlock(
                cin, c, cfg.layers_per_block, g, i < len(ch) - 1))
        enc.mid_block = TorchVAEMid(ch[-1], g)
        enc.conv_norm_out = nn.GroupNorm(g, ch[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(ch[-1], 2 * lat, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * lat, 2 * lat, 1)
        self.post_quant_conv = nn.Conv2d(lat, lat, 1)
        up = tuple(reversed(cfg.up_channels))
        dec = nn.Module()
        dec.conv_in = nn.Conv2d(lat, up[0], 3, padding=1)
        dec.mid_block = TorchVAEMid(up[0], g)
        dec.up_blocks = nn.ModuleList()
        for i, c in enumerate(up):
            cin = up[max(i - 1, 0)] if i else up[0]
            dec.up_blocks.append(TorchVAEUpBlock(
                cin, c, cfg.up_layers + 1, g, i < len(up) - 1))
        dec.conv_norm_out = nn.GroupNorm(g, up[-1], eps=1e-6)
        dec.conv_out = nn.Conv2d(up[-1], cfg.out_channels, 3, padding=1)
        self.decoder = dec

    def encode_moments(self, x):
        e = self.encoder
        x = e.conv_in(x)
        for blk in e.down_blocks:
            x = blk(x)
        x = e.mid_block(x)
        x = e.conv_out(F.silu(e.conv_norm_out(x)))
        return self.quant_conv(x)

    def sample(self, x, noise_nhwc):
        """encode -> reparameterized sample with INJECTED noise, x SCALING
        (the pipelines' vae_sample, pipelines/inpaint.py:371-383)."""
        moments = self.encode_moments(x)
        mean, logvar = moments.chunk(2, dim=1)
        logvar = logvar.clamp(-30.0, 20.0)
        std = (0.5 * logvar).exp()
        noise = torch.from_numpy(
            np.transpose(noise_nhwc, (0, 3, 1, 2)).copy()
        ).float()
        return (mean + std * noise) * SCALING

    def decode(self, z):
        d = self.decoder
        x = self.post_quant_conv(z)
        x = d.conv_in(x)
        x = d.mid_block(x)
        for blk in d.up_blocks:
            x = blk(x)
        return d.conv_out(F.silu(d.conv_norm_out(x)))


# ===========================================================================
# shared fixtures / helpers
# ===========================================================================


def _hf_text(vocab, hidden, heads, layers, inter, n_ext=0, seed=0):
    """transformers CLIPTextModel; n_ext>0 extends the embedding table with
    external (task-token) rows and returns the convert-ready state dict with
    the wrapped/trainable_embeddings split (the EmbeddingLayerWithFixes
    checkpoint layout, reference utils.py:257-483)."""
    torch.manual_seed(seed)
    cfg = transformers.CLIPTextConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    hf = transformers.CLIPTextModel(cfg).eval()
    sd = sd_numpy(hf)
    if n_ext:
        table = hf.text_model.embeddings.token_embedding.weight.detach()
        ext = 0.02 * torch.randn(n_ext, hidden)
        with torch.no_grad():
            hf.text_model.embeddings.token_embedding = (
                nn.Embedding.from_pretrained(
                    torch.cat([table, ext], dim=0), freeze=True
                )
            )
        tok = sd.pop("text_model.embeddings.token_embedding.weight")
        sd["text_model.embeddings.token_embedding.wrapped.weight"] = tok
        for i, name in enumerate(C.TASK_TOKEN_ORDER):
            sd["text_model.embeddings.token_embedding."
               f"trainable_embeddings.{name}"] = to_np(ext[i * 10:(i + 1) * 10])
    return hf, sd


def _clip_embeds(hf, ids):
    with torch.no_grad():
        return hf(
            input_ids=torch.from_numpy(np.asarray(ids, np.int64))
        ).last_hidden_state.numpy().astype(np.float64)


def _noise_streams(seed, h8, w8):
    """The pipelines' per-image threefry streams (pipelines/inpaint.py:
    354-391): fold 0 = init latent noise, 1 = VAE sampling, 2 = image
    latents sampling.  Batch 1."""
    key = jax.random.PRNGKey(int(seed))
    streams = []
    for fold in (0, 1, 2):
        k = jax.random.fold_in(key, fold)
        streams.append(
            np.asarray(jax.random.normal(k, (h8, w8, 4), jnp.float32),
                       np.float64)[None]
        )
    return streams  # [noise0, vae_noise, img_noise], each (1, h8, w8, 4)


def _mask_lat_nearest(mask_b1, h8, w8):
    """The in-graph jax.image.resize(..., 'nearest') of the binary mask —
    taken as shared input (half-pixel vs floor nearest is a documented
    semantic choice, not scheduler/CFG math)."""
    out = jax.image.resize(
        jnp.asarray(mask_b1, jnp.float32), (1, h8, w8, 1), method="nearest"
    )
    return np.asarray(out, np.float64)


def _inputs_img(hw_img, seed=0):
    rng = np.random.RandomState(seed)
    image = (rng.rand(hw_img, hw_img, 3) * 255).astype(np.uint8)
    mask = np.zeros((hw_img, hw_img), np.float32)
    q = hw_img // 4
    mask[q:3 * q, q:3 * q] = 1.0
    return image, mask


def _to_uint8(img_nchw):
    x = np.transpose(img_nchw, (0, 2, 3, 1)).astype(np.float64)
    return np.round(np.clip(x / 2 + 0.5, 0.0, 1.0) * 255.0).astype(np.uint8)


def _assert_images_close(got_u8, want_u8, msg):
    got = np.asarray(got_u8, np.int32)
    want = np.asarray(want_u8, np.int32)
    d = np.abs(got - want)
    assert d.max() <= MAX_UINT8_DIFF and d.mean() <= MEAN_UINT8_DIFF, (
        f"{msg}: max uint8 diff {d.max()}, mean {d.mean():.3f} "
        f"(bounds {MAX_UINT8_DIFF}/{MEAN_UINT8_DIFF})"
    )


def _text_cfg(hidden, heads, inter, vocab=1024, n_ext=30):
    return CLIPTextConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=2, num_attention_heads=heads,
        num_external_tokens=n_ext,
    )


def _make_tok(vocab=1024):
    tok = TokenizerWrapper(HashTokenizer(vocab_size=vocab))
    add_task_tokens(tok)
    return tok


# ===========================================================================
# v1: 9-channel DDIM inpaint chain
# ===========================================================================


def _run_v1_case(unet_cfg: UNetConfig, vae_cfg: VAEConfig, hw_img: int,
                 steps=2, seed=7, fitting=0.6, guidance=7.5):
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline

    heads = 2 if unet_cfg.cross_attention_dim < 100 else 8
    inter = unet_cfg.cross_attention_dim * 2
    hf, sd_clip = _hf_text(1024, unet_cfg.cross_attention_dim, heads, 2,
                           inter, n_ext=30, seed=11)
    with torch.no_grad():
        tm = TorchMiniUNet(unet_cfg).eval()
        tv = TorchMiniVAE(vae_cfg).eval()
    tok = _make_tok()

    cfg = PowerPaintConfig(
        version="ppt-v1", unet=unet_cfg, vae=vae_cfg,
        text_encoder=_text_cfg(unet_cfg.cross_attention_dim, heads, inter),
    )
    params = {
        "unet": C.convert_unet(sd_numpy(tm)),
        "vae": C.convert_vae(sd_numpy(tv)),
        "text_encoder": C.convert_clip_text(sd_clip),
    }
    pipe = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)

    image, mask = _inputs_img(hw_img)
    got = np.asarray(pipe(
        image, mask, prompt="a red fox", task="text-guided",
        fitting_degree=fitting, num_inference_steps=steps,
        guidance_scale=guidance, seed=seed,
    ))

    # ---- torch/numpy oracle: the reference eager loop ----
    h8 = w8 = hw_img // 8
    noise0, vnoise, img_noise = _noise_streams(seed, h8, w8)
    is_9ch = unet_cfg.in_channels == 9

    init = image.astype(np.float64)[None] / 127.5 - 1.0
    m = (mask >= 0.5).astype(np.float64)[None, ..., None]
    masked = init * (1.0 - m)
    ids = pipe.encode_task(add_task("a red fox", "", "text-guided",
                                    "ppt-v1"))  # (4, 77)
    emb = _clip_embeds(hf, ids)
    pos = emb[0] * fitting + (1.0 - fitting) * emb[1]
    neg = emb[2] * fitting + (1.0 - fitting) * emb[3]
    cond = torch.from_numpy(np.stack([neg, pos])).float()

    with torch.no_grad():
        masked_lat = tv.sample(
            torch.from_numpy(np.transpose(masked, (0, 3, 1, 2))).float(),
            vnoise,
        ).double().numpy()
        image_lat = None
        if not is_9ch:
            image_lat = tv.sample(
                torch.from_numpy(np.transpose(init, (0, 3, 1, 2))).float(),
                img_noise,
            ).double().numpy()
    mask_lat = _mask_lat_nearest(m, h8, w8)  # (1, h8, w8, 1), hole=1
    mask_lat_nchw = np.transpose(mask_lat, (0, 3, 1, 2))

    sched = NpDDIM(steps)
    lat = np.transpose(noise0, (0, 3, 1, 2)) * sched.init_noise_sigma
    noise0_nchw = np.transpose(noise0, (0, 3, 1, 2))
    for i in range(steps):
        lmi = np.concatenate([lat, lat], axis=0)
        if is_9ch:
            lmi = np.concatenate(
                [lmi, np.tile(mask_lat_nchw, (2, 1, 1, 1)),
                 np.tile(masked_lat, (2, 1, 1, 1))], axis=1)
        t = int(sched.ts[i])
        with torch.no_grad():
            eps = tm(torch.from_numpy(lmi).float(),
                     torch.tensor([t, t]), cond).double().numpy()
        eps = eps[:1] + guidance * (eps[1:] - eps[:1])
        lat = sched.step(lat, eps, i)
        if not is_9ch:
            # known-region blend (reference :1025-1035) in sampler space
            if i < steps - 1:
                init_proper = sched.add_noise(
                    image_lat, noise0_nchw, int(sched.ts[i + 1]))
            else:
                init_proper = image_lat
            lat = (1.0 - mask_lat_nchw) * init_proper + mask_lat_nchw * lat
    with torch.no_grad():
        dec = tv.decode(torch.from_numpy(lat / SCALING).float()).numpy()
    want = _to_uint8(dec)
    _assert_images_close(got, want, "v1 e2e chain")


def test_e2e_v1_ddim_mini():
    vcfg = VAEConfig(block_out_channels=(16, 16, 32, 32),
                     layers_per_block=1, norm_num_groups=8)
    test_cfg = mini_cfg(9).replace(sample_size=8)
    _run_v1_case(test_cfg, vcfg, hw_img=64, steps=2)


def test_e2e_v1_known_region_blend_mini():
    """4-channel UNet path: the per-step known-region latent blend
    (reference :1025-1035) — the one chain segment the 9-ch flagship never
    exercises."""
    vcfg = VAEConfig(block_out_channels=(16, 16, 32, 32),
                     layers_per_block=1, norm_num_groups=8)
    test_cfg = mini_cfg(4).replace(sample_size=8)
    _run_v1_case(test_cfg, vcfg, hw_img=64, steps=3)


@pytest.mark.slow
def test_e2e_v1_ddim_prod():
    _run_v1_case(UNetConfig(sample_size=8), VAEConfig(), hw_img=64, steps=2)


# ===========================================================================
# v2: BrushNet dual-branch UniPC chain
# ===========================================================================


def _run_v2_case(unet_cfg: UNetConfig, vae_cfg: VAEConfig, hw_img: int,
                 steps=3, seed=9, fitting=0.7, guidance=7.5,
                 cond_scale=0.8):
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline

    heads = 2 if unet_cfg.cross_attention_dim < 100 else 8
    inter = unet_cfg.cross_attention_dim * 2
    hf_task, sd_task = _hf_text(1024, unet_cfg.cross_attention_dim, heads,
                                2, inter, n_ext=30, seed=21)
    hf_plain, sd_plain = _hf_text(1024, unet_cfg.cross_attention_dim, heads,
                                  2, inter, n_ext=0, seed=22)
    with torch.no_grad():
        tb = TorchMiniBrushNet(unet_cfg).eval()
        tm = TorchMiniUNet(unet_cfg).eval()
        tv = TorchMiniVAE(vae_cfg).eval()
    tok = _make_tok()

    tcfg = _text_cfg(unet_cfg.cross_attention_dim, heads, inter)
    cfg = PowerPaintConfig(
        version="ppt-v2", unet=unet_cfg, vae=vae_cfg, text_encoder=tcfg,
        brushnet=BrushNetConfig(base=unet_cfg),
    )
    params = {
        "unet": C.convert_unet(sd_numpy(tm)),
        "vae": C.convert_vae(sd_numpy(tv)),
        "brushnet": C.convert_brushnet(sd_numpy(tb)),
        "text_encoder_brushnet": C.convert_clip_text(sd_task),
        "text_encoder": C.convert_clip_text(sd_plain),
    }
    pipe = BrushNetPipeline(cfg, params, tok, dtype=jnp.float32)

    image, mask = _inputs_img(hw_img)
    got = np.asarray(pipe(
        image, mask, prompt="a red fox", task="text-guided",
        fitting_degree=fitting, num_inference_steps=steps,
        guidance_scale=guidance, brushnet_conditioning_scale=cond_scale,
        seed=seed, scheduler="unipc",
    ))

    # ---- torch/numpy oracle (reference Brushnet_CA loop :1383-1466) ----
    h8 = w8 = hw_img // 8
    noise0, vnoise, _ = _noise_streams(seed, h8, w8)

    hole = (mask >= 0.5).astype(np.float64)[None, ..., None]
    keep = 1.0 - hole
    # v2 pre-masks in PIXEL space before normalize (app.py:342-345)
    masked = (image.astype(np.float64)[None] * keep) / 127.5 - 1.0

    p = add_task(v2_prompt_suffix("a red fox", "text-guided"), "",
                 "text-guided", "ppt-v2")
    ids_task = tok([p.promptA, p.promptB, p.negative_promptA,
                    p.negative_promptB])
    ids_plain = tok([p.promptU, p.negative_promptU])
    et = _clip_embeds(hf_task, ids_task)
    pos_t = et[0] * fitting + (1.0 - fitting) * et[1]
    neg_t = et[2] * fitting + (1.0 - fitting) * et[3]
    cond_task = torch.from_numpy(np.stack([neg_t, pos_t])).float()
    ep = _clip_embeds(hf_plain, ids_plain)
    cond_plain = torch.from_numpy(np.stack([ep[1], ep[0]])).float()

    with torch.no_grad():
        cond_lat = tv.sample(
            torch.from_numpy(np.transpose(masked, (0, 3, 1, 2))).float(),
            vnoise,
        ).double().numpy()
    mask8 = _mask_lat_nearest(keep, h8, w8)  # keep-mask channel (=1 kept)
    cond5 = np.concatenate([cond_lat, np.transpose(mask8, (0, 3, 1, 2))],
                           axis=1)
    cond5_t = torch.from_numpy(np.tile(cond5, (2, 1, 1, 1))).float()

    sched = NpUniPC(steps)
    lat = np.transpose(noise0, (0, 3, 1, 2)) * sched.init_noise_sigma
    for i in range(steps):
        lmi = np.concatenate([lat, lat], axis=0)
        t = int(sched.ts[i])
        with torch.no_grad():
            d_taps, m_tap, u_taps = tb(
                torch.from_numpy(lmi).float(), torch.tensor([t, t]),
                cond_task, cond5_t, scale=cond_scale,
            )
            eps = tm(torch.from_numpy(lmi).float(), torch.tensor([t, t]),
                     cond_plain, down_taps=list(d_taps), mid_tap=m_tap,
                     up_taps=list(u_taps)).double().numpy()
        eps = eps[:1] + guidance * (eps[1:] - eps[:1])
        lat = sched.step(lat, eps, i)
    with torch.no_grad():
        dec = tv.decode(torch.from_numpy(lat / SCALING).float()).numpy()
    want = _to_uint8(dec)
    _assert_images_close(got, want, "v2 e2e chain")


def test_e2e_v2_unipc_mini():
    vcfg = VAEConfig(block_out_channels=(16, 16, 32, 32),
                     layers_per_block=1, norm_num_groups=8)
    # steps=3 exercises the order-2 predictor AND the order-2 corrector
    _run_v2_case(mini_cfg(4).replace(sample_size=8), vcfg, hw_img=64,
                 steps=3)


@pytest.mark.slow
def test_e2e_v2_unipc_prod():
    _run_v2_case(UNetConfig(sample_size=8, in_channels=4), VAEConfig(),
                 hw_img=64, steps=2)


# ===========================================================================
# CN: v1 + ControlNet DDIM chain
# ===========================================================================


def _run_cn_case(unet_cfg: UNetConfig, vae_cfg: VAEConfig, embed,
                 hw_img: int, steps=2, seed=5, guidance=7.5,
                 cn_scale=0.7):
    from powerpaint_tpu.pipelines.controlnet import ControlNetPipeline

    heads = 2 if unet_cfg.cross_attention_dim < 100 else 8
    inter = unet_cfg.cross_attention_dim * 2
    hf, sd_clip = _hf_text(1024, unet_cfg.cross_attention_dim, heads, 2,
                           inter, n_ext=30, seed=31)
    cn_base = unet_cfg.replace(in_channels=4)
    with torch.no_grad():
        tm = TorchMiniUNet(unet_cfg).eval()
        tcn = TorchMiniControlNet(cn_base, embed=embed).eval()
        tv = TorchMiniVAE(vae_cfg).eval()
    tok = _make_tok()

    cfg = PowerPaintConfig(
        version="ppt-v1", unet=unet_cfg, vae=vae_cfg,
        text_encoder=_text_cfg(unet_cfg.cross_attention_dim, heads, inter),
        controlnet=ControlNetConfig(
            base=cn_base, conditioning_embedding_out_channels=embed,
        ),
    )
    params = {
        "unet": C.convert_unet(sd_numpy(tm)),
        "vae": C.convert_vae(sd_numpy(tv)),
        "text_encoder": C.convert_clip_text(sd_clip),
        "controlnet": C.convert_controlnet(sd_numpy(tcn)),
    }
    pipe = ControlNetPipeline(cfg, params, tok, dtype=jnp.float32)

    image, mask = _inputs_img(hw_img)
    control = np.zeros((hw_img, hw_img, 3), np.uint8)
    control[::8, :, :] = 255  # synthetic edge map
    got = np.asarray(pipe(
        image, mask, control_image=control, prompt="a red fox",
        num_inference_steps=steps, guidance_scale=guidance,
        controlnet_conditioning_scale=cn_scale, seed=seed,
    ))

    # ---- torch/numpy oracle (reference ControlNet loop :1660-1741) ----
    h8 = w8 = hw_img // 8
    noise0, vnoise, _ = _noise_streams(seed, h8, w8)
    init = image.astype(np.float64)[None] / 127.5 - 1.0
    m = (mask >= 0.5).astype(np.float64)[None, ..., None]
    masked = init * (1.0 - m)
    ctrl = control.astype(np.float64)[None] / 255.0
    ctrl_t = torch.from_numpy(
        np.tile(np.transpose(ctrl, (0, 3, 1, 2)), (2, 1, 1, 1))
    ).float()

    ids = pipe.encode_task(add_task("a red fox", "", "text-guided",
                                    "ppt-v1"))
    emb = _clip_embeds(hf, ids)
    # __call__ default fitting 1.0 -> pos = A, neg = negA
    cond = torch.from_numpy(np.stack([emb[2], emb[0]])).float()

    with torch.no_grad():
        masked_lat = tv.sample(
            torch.from_numpy(np.transpose(masked, (0, 3, 1, 2))).float(),
            vnoise,
        ).double().numpy()
    mask_lat = np.transpose(_mask_lat_nearest(m, h8, w8), (0, 3, 1, 2))

    sched = NpDDIM(steps)
    lat = np.transpose(noise0, (0, 3, 1, 2)) * sched.init_noise_sigma
    for i in range(steps):
        lmi4 = np.concatenate([lat, lat], axis=0)
        t = int(sched.ts[i])
        with torch.no_grad():
            d_res, m_res = tcn(
                torch.from_numpy(lmi4).float(), torch.tensor([t, t]),
                cond, ctrl_t, scale=cn_scale,
            )
            lmi9 = np.concatenate(
                [lmi4, np.tile(mask_lat, (2, 1, 1, 1)),
                 np.tile(masked_lat, (2, 1, 1, 1))], axis=1)
            eps = tm(torch.from_numpy(lmi9).float(), torch.tensor([t, t]),
                     cond, cn_down=list(d_res),
                     cn_mid=m_res).double().numpy()
        eps = eps[:1] + guidance * (eps[1:] - eps[:1])
        lat = sched.step(lat, eps, i)
    with torch.no_grad():
        dec = tv.decode(torch.from_numpy(lat / SCALING).float()).numpy()
    want = _to_uint8(dec)
    _assert_images_close(got, want, "cn e2e chain")


def test_e2e_cn_ddim_mini():
    vcfg = VAEConfig(block_out_channels=(16, 16, 32, 32),
                     layers_per_block=1, norm_num_groups=8)
    _run_cn_case(mini_cfg(9).replace(sample_size=8), vcfg,
                 embed=(8, 16, 16, 32), hw_img=64, steps=2)


@pytest.mark.slow
def test_e2e_cn_ddim_prod():
    _run_cn_case(UNetConfig(sample_size=8), VAEConfig(),
                 embed=(16, 32, 96, 256), hw_img=64, steps=2)
