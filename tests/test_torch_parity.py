"""Numerical parity against torch oracles with SHARED weights.

Converts torch Module state dicts through ``io/convert.py`` and asserts the
Flax modules reproduce the torch outputs to fp32 tolerance.  This pins the
converter's tensor transforms (OIHW->HWIO, linear transpose, norm renames)
AND the op semantics (GroupNorm statistics/eps, torch conv padding, GEGLU,
quick_gelu, causal CLIP attention) numerically — the part of the SSIM-0.99
fidelity gate (BASELINE.md) testable without reference checkpoints.

Torch oracles are built with diffusers' module NAMING (so the real
checkpoint keys exercise the converter) and diffusers' documented forward
semantics (reference pins diffusers==0.27.0, requirements.txt:3); the CLIP
oracle is the real ``transformers.CLIPTextModel``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from powerpaint_tpu.io import convert as C

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

torch.manual_seed(0)
torch.set_grad_enabled(False)
ATOL = 3e-5


def to_np(t):
    return t.detach().cpu().numpy()


def sd_numpy(module):
    return {k: to_np(v) for k, v in module.state_dict().items()}


def nchw_to_nhwc(t):
    return np.transpose(to_np(t), (0, 2, 3, 1))


def assert_close(flax_out, torch_out, atol=ATOL, msg=""):
    np.testing.assert_allclose(
        np.asarray(flax_out, dtype=np.float32),
        np.asarray(torch_out, dtype=np.float32),
        atol=atol, rtol=1e-4, err_msg=msg,
    )


# ---------------------------------------------------------------------------
# 1. GroupNorm (+SiLU) — torch statistics order and eps
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("eps", [1e-5, 1e-6])
def test_groupnorm_silu_matches_torch(eps):
    from powerpaint_tpu.models.layers import GroupNorm

    c, groups = 16, 4
    gn = nn.GroupNorm(groups, c, eps=eps)
    with torch.no_grad():
        gn.weight.copy_(torch.randn(c))
        gn.bias.copy_(torch.randn(c))
    x = torch.randn(2, c, 5, 7)
    want = F.silu(gn(x))

    tree = C.state_dict_to_tree({f"norm.{k}": to_np(v)
                                 for k, v in gn.state_dict().items()})
    m = GroupNorm(groups, eps)
    got = m.apply({"params": tree["norm"]},
                  jnp.asarray(nchw_to_nhwc(x)), silu=True)
    assert_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


# ---------------------------------------------------------------------------
# 2. Conv2d — torch padding semantics (symmetric p=1 s=1/s=2, VAE (0,1) pad)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("stride", [1, 2])
def test_conv3x3_matches_torch(stride):
    from powerpaint_tpu.models.layers import conv

    tc = nn.Conv2d(6, 8, 3, stride=stride, padding=1)
    x = torch.randn(2, 6, 8, 8)
    want = tc(x)

    tree = C.state_dict_to_tree({f"conv.{k}": to_np(v)
                                 for k, v in tc.state_dict().items()})
    m = conv(8, 3, stride, 1, dtype=jnp.float32)
    got = m.apply({"params": tree["conv"]}, jnp.asarray(nchw_to_nhwc(x)))
    assert_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


def test_vae_downsample_asymmetric_pad_matches_torch():
    """diffusers VAE Downsample2D: F.pad (0,1,0,1) + VALID stride-2 conv."""
    from powerpaint_tpu.models.vae import VAEDownsample2D

    tc = nn.Conv2d(6, 6, 3, stride=2, padding=0)
    x = torch.randn(1, 6, 9, 9)
    want = tc(F.pad(x, (0, 1, 0, 1)))

    tree = C.state_dict_to_tree({f"downsamplers.0.conv.{k}": to_np(v)
                                 for k, v in tc.state_dict().items()})
    m = VAEDownsample2D(6, dtype=jnp.float32)
    got = m.apply({"params": tree["downsamplers_0"]},
                  jnp.asarray(nchw_to_nhwc(x)))
    assert_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


def test_upsample_nearest_conv_matches_torch():
    """diffusers Upsample2D: 2x nearest interpolate + 3x3 conv."""
    from powerpaint_tpu.models.resnet import Upsample2D

    tc = nn.Conv2d(6, 6, 3, padding=1)
    x = torch.randn(1, 6, 5, 5)
    want = tc(F.interpolate(x, scale_factor=2.0, mode="nearest"))

    tree = C.state_dict_to_tree({f"upsamplers.0.conv.{k}": to_np(v)
                                 for k, v in tc.state_dict().items()})
    m = Upsample2D(6, dtype=jnp.float32)
    got = m.apply({"params": tree["upsamplers_0"]},
                  jnp.asarray(nchw_to_nhwc(x)))
    assert_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


# ---------------------------------------------------------------------------
# 3. ResnetBlock2D — GN/SiLU/conv/temb composition + conv_shortcut
# ---------------------------------------------------------------------------


class TorchResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D forward semantics (pre_norm, silu, scale 1)."""

    def __init__(self, cin, cout, temb_ch, groups, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_ch, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        s = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return s + h


@pytest.mark.parametrize("cin,cout", [(8, 8), (8, 16)])
def test_resnet_block_matches_torch(cin, cout):
    from powerpaint_tpu.models.resnet import ResnetBlock2D

    tm = TorchResnetBlock2D(cin, cout, temb_ch=12, groups=4, eps=1e-5)
    x = torch.randn(2, cin, 6, 6)
    temb = torch.randn(2, 12)
    want = tm(x, temb)

    tree = C.state_dict_to_tree(sd_numpy(tm))
    m = ResnetBlock2D(cout, 1e-5, 4, dtype=jnp.float32)
    got = m.apply({"params": tree}, jnp.asarray(nchw_to_nhwc(x)),
                  jnp.asarray(to_np(temb)))
    assert_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


# ---------------------------------------------------------------------------
# 4. Attention — diffusers layout (to_q/k/v no bias, to_out.0), cross kv=77
# ---------------------------------------------------------------------------


class TorchAttention(nn.Module):
    def __init__(self, dim, ctx_dim, heads, bias=False):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=bias)
        self.to_k = nn.Linear(ctx_dim, dim, bias=bias)
        self.to_v = nn.Linear(ctx_dim, dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Dropout(0.0)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, c = x.shape
        h, d = self.heads, c // self.heads
        q = self.to_q(x).reshape(b, s, h, d).transpose(1, 2)
        k = self.to_k(ctx).reshape(b, -1, h, d).transpose(1, 2)
        v = self.to_v(ctx).reshape(b, -1, h, d).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        return self.to_out[0](out.transpose(1, 2).reshape(b, s, c))


@pytest.mark.parametrize("cross", [False, True])
def test_attention_matches_torch(cross):
    from powerpaint_tpu.models.transformer import Attention

    dim, ctx_dim, heads = 16, 24, 4
    tm = TorchAttention(dim, ctx_dim if cross else dim, heads)
    x = torch.randn(2, 64, dim)
    ctx = torch.randn(2, 77, ctx_dim) if cross else None
    want = tm(x, ctx)

    tree = C.state_dict_to_tree(sd_numpy(tm))
    m = Attention(heads, dim // heads, dtype=jnp.float32)
    got = m.apply({"params": tree}, jnp.asarray(to_np(x)),
                  None if ctx is None else jnp.asarray(to_np(ctx)))
    assert_close(got, want)


# ---------------------------------------------------------------------------
# 5. BasicTransformerBlock — LayerNorm + self/cross attn + GEGLU ff
# ---------------------------------------------------------------------------


class TorchGEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TorchFeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList(
            [TorchGEGLU(dim, inner), nn.Dropout(0.0), nn.Linear(inner, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TorchBasicTransformerBlock(nn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = TorchAttention(dim, dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = TorchAttention(dim, ctx_dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = TorchFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


def test_basic_transformer_block_matches_torch():
    from powerpaint_tpu.models.transformer import BasicTransformerBlock

    dim, ctx_dim, heads = 16, 24, 4
    tm = TorchBasicTransformerBlock(dim, ctx_dim, heads)
    x = torch.randn(2, 64, dim)
    ctx = torch.randn(2, 77, ctx_dim)
    want = tm(x, ctx)

    sd = {k.replace("transformer_blocks.", "blocks."): v
          for k, v in sd_numpy(tm).items()}
    tree = C.state_dict_to_tree(sd)
    m = BasicTransformerBlock(heads, dim // heads, dtype=jnp.float32)
    got = m.apply({"params": tree}, jnp.asarray(to_np(x)),
                  jnp.asarray(to_np(ctx)))
    assert_close(got, want)


# ---------------------------------------------------------------------------
# 6. Transformer2DModel — GN(1e-6) + conv proj_in/out + block + residual
# ---------------------------------------------------------------------------


class TorchTransformer2D(nn.Module):
    def __init__(self, c, ctx_dim, heads, groups):
        super().__init__()
        self.norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = nn.Conv2d(c, c, 1)
        self.transformer_blocks = nn.ModuleList(
            [TorchBasicTransformerBlock(c, ctx_dim, heads)]
        )
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            y = blk(y, ctx)
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + res


def test_transformer2d_matches_torch():
    from powerpaint_tpu.models.transformer import Transformer2DModel

    # 32 channels: the flax module pins SD1.5's 32 GN groups
    c, ctx_dim, heads, groups = 32, 24, 4, 32
    tm = TorchTransformer2D(c, ctx_dim, heads, groups)
    x = torch.randn(2, c, 6, 6)
    ctx = torch.randn(2, 77, ctx_dim)
    want = tm(x, ctx)

    tree = C.state_dict_to_tree(sd_numpy(tm))
    m = Transformer2DModel(heads, c // heads, 1, False, dtype=jnp.float32)
    # the flax module hardcodes 32 GN groups for SD1.5; patch via tree check
    got = m.apply({"params": tree}, jnp.asarray(nchw_to_nhwc(x)),
                  jnp.asarray(to_np(ctx)))
    assert_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


# ---------------------------------------------------------------------------
# 7. CLIP text encoder — the REAL transformers oracle through convert_clip_text
# ---------------------------------------------------------------------------


def _hf_clip(vocab=512, hidden=32, inter=64, layers=2, heads=2):
    transformers = pytest.importorskip("transformers")
    cfg = transformers.CLIPTextConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    model = transformers.CLIPTextModel(cfg).eval()
    return model


def test_clip_text_matches_transformers():
    from powerpaint_tpu.core.config import CLIPTextConfig
    from powerpaint_tpu.models.clip_text import CLIPTextModel

    hf = _hf_clip()
    ids = torch.randint(0, 512, (3, 77))
    with torch.no_grad():
        want = hf(input_ids=ids).last_hidden_state

    tree = C.convert_clip_text(sd_numpy(hf))
    cfg = CLIPTextConfig(vocab_size=512, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2)
    m = CLIPTextModel(cfg, dtype=jnp.float32)
    got = m.apply({"params": tree}, jnp.asarray(to_np(ids)))
    assert_close(got, want, atol=1e-4)


def test_external_embedding_gather_equals_reference_splice():
    """The functional gather (clip_text.py) must equal the reference's
    EmbeddingLayerWithFixes splice (utils.py:257-483): out-of-vocab ids ->
    0, embed, then overwrite those positions with the trainable rows."""
    from powerpaint_tpu.core.config import CLIPTextConfig
    from powerpaint_tpu.models.clip_text import CLIPTextModel

    vocab, hidden, n_ext = 128, 32, 30
    hf = _hf_clip(vocab=vocab)
    ext = torch.randn(n_ext, hidden)

    ids = torch.randint(0, vocab, (2, 77))
    ids[0, 5:15] = vocab + torch.arange(10)          # P_ctxt_0..9
    ids[1, 3:13] = vocab + 20 + torch.arange(10)     # P_obj_0..9

    # (a) the reference's replace-then-splice (utils.py:447: contiguous ids)
    # equals a gather from concat([table, ext]) at the embedding level
    table = hf.text_model.embeddings.token_embedding.weight.detach()
    safe_ids = torch.where(ids < vocab, ids, torch.zeros_like(ids))
    spliced = table[safe_ids].clone()
    mask = ids >= vocab
    spliced[mask] = ext[(ids - vocab)[mask]]
    gathered = torch.cat([table, ext], dim=0)[ids]
    np.testing.assert_allclose(to_np(spliced), to_np(gathered), atol=0)

    # (b) full-model parity: extend the torch embedding table with the
    # external rows (== splice by (a)) and run the real transformers model
    sd = sd_numpy(hf)
    with torch.no_grad():
        hf.text_model.embeddings.token_embedding = nn.Embedding.from_pretrained(
            torch.cat([table, ext], dim=0), freeze=True
        )
        want = hf(input_ids=ids).last_hidden_state
    tok = sd.pop("text_model.embeddings.token_embedding.weight")
    sd["text_model.embeddings.token_embedding.wrapped.weight"] = tok
    for i, name in enumerate(C.TASK_TOKEN_ORDER):
        sd["text_model.embeddings.token_embedding."
           f"trainable_embeddings.{name}"] = to_np(ext[i * 10:(i + 1) * 10])
    tree = C.convert_clip_text(sd)

    cfg = CLIPTextConfig(vocab_size=vocab, hidden_size=hidden,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=2, num_external_tokens=n_ext)
    m = CLIPTextModel(cfg, dtype=jnp.float32)
    got = m.apply({"params": tree}, jnp.asarray(to_np(ids)))
    assert_close(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# 8. VAE mid-block attention — single-head, biased projections, residual
# ---------------------------------------------------------------------------


class TorchVAEAttention(nn.Module):
    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c), nn.Dropout(0.0)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        out = F.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None]
        )[:, 0]
        out = self.to_out[0](out)
        return out.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


def test_vae_attention_matches_torch():
    from powerpaint_tpu.models.vae import VAEAttention

    c, groups = 16, 4
    tm = TorchVAEAttention(c, groups)
    x = torch.randn(2, c, 6, 6)
    want = tm(x)

    tree = C.state_dict_to_tree(sd_numpy(tm))
    m = VAEAttention(c, groups, dtype=jnp.float32)
    got = m.apply({"params": tree}, jnp.asarray(nchw_to_nhwc(x)))
    assert_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


# ---------------------------------------------------------------------------
# 9. TimestepEmbedding MLP — linear/silu/linear with converter transpose
# ---------------------------------------------------------------------------


class TorchTimestepEmbedding(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.linear_1 = nn.Linear(cin, cout)
        self.linear_2 = nn.Linear(cout, cout)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


def test_timestep_embedding_matches_torch():
    from powerpaint_tpu.models.layers import TimestepEmbedding

    tm = TorchTimestepEmbedding(8, 32)
    x = torch.randn(4, 8)
    want = tm(x)

    tree = C.state_dict_to_tree(sd_numpy(tm))
    m = TimestepEmbedding(32, dtype=jnp.float32)
    got = m.apply({"params": tree}, jnp.asarray(to_np(x)))
    assert_close(got, want)
