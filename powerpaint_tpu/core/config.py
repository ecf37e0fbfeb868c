"""Model / pipeline configuration dataclasses.

The reference stores every architecture as a diffusers ``ConfigMixin`` JSON
(e.g. /root/reference/powerpaint/models/BrushNet_CA.py:139,
/root/reference/powerpaint/models/unet_2d_condition.py:166).  Here configs are
frozen dataclasses: hashable (so they can be closed over by ``jax.jit``),
serializable to JSON next to orbax checkpoints, and the single source of truth
for block topology — including the BrushNet zero-conv tap schedule, which the
reference leaves implicit in Python ``list.pop(0)`` order.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Tuple

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _freeze(obj):
    if isinstance(obj, list):
        return tuple(_freeze(x) for x in obj)
    return obj


class _ConfigBase:
    """JSON round-trip + dict conversion shared by all config dataclasses."""

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict) -> "Any":
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: _freeze(v) for k, v in d.items() if k in fields}
        return cls(**kwargs)

    @classmethod
    def from_json(cls, s: str) -> "Any":
        return cls.from_dict(json.loads(s))

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

CROSS_ATTN_DOWN = "CrossAttnDownBlock2D"
DOWN = "DownBlock2D"
CROSS_ATTN_UP = "CrossAttnUpBlock2D"
UP = "UpBlock2D"
MID_CROSS_ATTN = "UNetMidBlock2DCrossAttn"
MID_RESNET = "MidBlock2D"  # resnet-only mid (reference unet_2d_blocks.py:1026)


@dataclasses.dataclass(frozen=True)
class UNetConfig(_ConfigBase):
    """SD1.5-family conditional UNet.

    Defaults mirror ``runwayml/stable-diffusion-inpainting``'s 9-channel UNet
    (reference pipeline_PowerPaint.py:965-976); set ``in_channels=4`` for the
    ppt-v2 base UNet (RealisticVision).
    """

    sample_size: int = 64
    in_channels: int = 9
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        CROSS_ATTN_DOWN,
        CROSS_ATTN_DOWN,
        CROSS_ATTN_DOWN,
        DOWN,
    )
    mid_block_type: str = MID_CROSS_ATTN
    up_block_types: Tuple[str, ...] = (
        UP,
        CROSS_ATTN_UP,
        CROSS_ATTN_UP,
        CROSS_ATTN_UP,
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: int = 1
    attention_head_dim: int = 8  # SD1.5 convention: this is the HEAD COUNT
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    resnet_eps: float = 1e-6
    act_fn: str = "silu"
    freq_shift: int = 0
    flip_sin_to_cos: bool = True
    use_linear_projection: bool = False
    upcast_attention: bool = False
    time_cond_proj_dim: Optional[int] = None
    conv_in_kernel: int = 3
    conv_out_kernel: int = 3
    # IP-Adapter (reference pipeline_PowerPaint_Brushnet_CA.py:650-707):
    # ip_adapter_dim = CLIP image-embed dim (1024 for the SD1.5 adapters'
    # OpenCLIP ViT-H tower); 0 disables. ip_adapter_tokens = projected
    # context tokens per image (4 for ip-adapter_sd15).
    ip_adapter_dim: int = 0
    ip_adapter_tokens: int = 4

    @property
    def num_heads(self) -> int:
        # diffusers quirk: for SD1.5 UNets `attention_head_dim` actually holds
        # the number of heads (see diffusers UNet2DConditionModel docs).
        return self.attention_head_dim

    # ---- static tap schedule (the reference's implicit pop(0) order) ------

    def down_tap_channels(self) -> Tuple[int, ...]:
        """Channels of each brushnet down tap, in consumption order.

        Order (reference unet_2d_condition.py:1222-1253 and
        BrushNet_CA.py:826-845): conv_in output, then per down block one tap
        after each resnet and one after the downsampler (if present).
        """
        taps = [self.block_out_channels[0]]
        for i, _ in enumerate(self.down_block_types):
            ch = self.block_out_channels[i]
            is_final = i == len(self.block_out_channels) - 1
            taps.extend([ch] * self.layers_per_block)
            if not is_final:
                taps.append(ch)
        return tuple(taps)

    def down_tap_strides(self) -> Tuple[int, ...]:
        """Spatial downscale factor (vs latent) of each down tap."""
        strides = [1]
        s = 1
        for i, _ in enumerate(self.down_block_types):
            is_final = i == len(self.block_out_channels) - 1
            strides.extend([s] * self.layers_per_block)
            if not is_final:
                s *= 2
                strides.append(s)
        return tuple(strides)

    def mid_tap_channels(self) -> int:
        return self.block_out_channels[-1]

    def up_tap_channels(self) -> Tuple[int, ...]:
        """Channels of each brushnet up tap, in consumption order.

        Per up block: one tap after each of (layers_per_block + 1) resnets and
        one after the upsampler (if present) — reference BrushNet_CA.py:863-902
        emission matches unet_2d_condition.py:1314-1348 consumption; 15 taps
        for SD1.5 (NOT 12).
        """
        taps = []
        reversed_ch = tuple(reversed(self.block_out_channels))
        for i, _ in enumerate(self.up_block_types):
            ch = reversed_ch[i]
            is_final = i == len(self.up_block_types) - 1
            taps.extend([ch] * (self.layers_per_block + 1))
            if not is_final:
                taps.append(ch)
        return tuple(taps)

    def up_tap_strides(self) -> Tuple[int, ...]:
        strides = []
        s = 2 ** (len(self.block_out_channels) - 1)
        for i, _ in enumerate(self.up_block_types):
            is_final = i == len(self.up_block_types) - 1
            strides.extend([s] * (self.layers_per_block + 1))
            if not is_final:
                s //= 2
                strides.append(s)
        return tuple(strides)

    def controlnet_residual_channels(self) -> Tuple[int, ...]:
        """Channels of classic ControlNet down residuals (per skip connection):
        conv_in + one per resnet + one per downsampler."""
        return self.down_tap_channels()


SD15_INPAINT_UNET = UNetConfig()
SD15_UNET = UNetConfig(in_channels=4)


# ---------------------------------------------------------------------------
# BrushNet
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BrushNetConfig(_ConfigBase):
    """BrushNet-with-preserved-cross-attention side branch.

    A full UNet (down+mid+up) cloned from the base config whose input is
    concat(noisy latent 4, conditioning 5) and whose per-block features exit
    through zero-initialized 1x1 convs (reference BrushNet_CA.py:223-228,
    330-376, 446-454).
    """

    base: UNetConfig = dataclasses.field(
        default_factory=lambda: SD15_UNET
    )
    conditioning_channels: int = 5  # masked-image latents (4) + mask (1)

    @classmethod
    def from_dict(cls, d: dict) -> "BrushNetConfig":
        d = dict(d)
        if isinstance(d.get("base"), dict):
            d["base"] = UNetConfig.from_dict(d["base"])
        return super().from_dict.__func__(cls, d)


# ---------------------------------------------------------------------------
# ControlNet
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ControlNetConfig(_ConfigBase):
    """Classic diffusers ControlNet: down+mid half-UNet with a conditioning
    embedding on the raw control image and zero convs on each skip."""

    base: UNetConfig = dataclasses.field(
        default_factory=lambda: SD15_INPAINT_UNET
    )
    conditioning_channels: int = 3
    conditioning_embedding_out_channels: Tuple[int, ...] = (16, 32, 96, 256)

    @classmethod
    def from_dict(cls, d: dict) -> "ControlNetConfig":
        d = dict(d)
        if isinstance(d.get("base"), dict):
            d["base"] = UNetConfig.from_dict(d["base"])
        return super().from_dict.__func__(cls, d)


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VAEConfig(_ConfigBase):
    """AutoencoderKL (SD1.5), reference pipeline_PowerPaint.py:27,657-669."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    sample_size: int = 512
    # AsymmetricAutoencoderKL (reference pipeline_PowerPaint.py:27,
    # 1045-1051): a larger, mask-conditioned decoder. asymmetric=True
    # switches decode to the conditional path; the decoder may have its own
    # channel/layer counts, and condition_layers is the (kernel, stride,
    # out_ch) spec of the known-region condition tower (inferred from real
    # checkpoints by io.convert.infer_condition_layers).
    asymmetric: bool = False
    up_block_out_channels: Optional[Tuple[int, ...]] = None
    layers_per_up_block: Optional[int] = None
    condition_layers: Optional[Tuple[Tuple[int, int, int], ...]] = None

    @property
    def up_channels(self) -> Tuple[int, ...]:
        return self.up_block_out_channels or self.block_out_channels

    @property
    def up_layers(self) -> int:
        return (self.layers_per_up_block if self.layers_per_up_block
                is not None else self.layers_per_block)


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig(_ConfigBase):
    """CLIP ViT-L/14 text tower (SD1.5), 768-d (reference app.py:12,148)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    # number of extra (task-prompt) token rows appended to the embedding table
    num_external_tokens: int = 0


# ---------------------------------------------------------------------------
# Scheduler
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SchedulerConfig(_ConfigBase):
    """Shared diffusion-schedule parameters (SD1.5 scaled-linear betas)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    steps_offset: int = 1
    timestep_spacing: str = "leading"
    set_alpha_to_one: bool = False
    # UniPC specifics
    solver_order: int = 2
    lower_order_final: bool = True
    solver_type: str = "bh2"
    # LCM specifics (consistency-model boundary conditions + the coarse
    # training grid LCM-LoRA checkpoints are distilled on)
    original_inference_steps: int = 50
    timestep_scaling: float = 10.0


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig(_ConfigBase):
    """CLIP ViT image tower.  Defaults = ViT-L/14 (the safety checker's and
    SD1.5 IP-Adapter tooling's tower); the SD1.5 IP-Adapter image encoder
    is OpenCLIP ViT-H (hidden 1280, layers 32, heads 16, proj 1024).
    Attribute names intentionally match CLIPTextConfig so the shared
    encoder layer (models/clip_text.CLIPEncoderLayer) applies."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5


# ---------------------------------------------------------------------------
# Pipeline-level config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PowerPaintConfig(_ConfigBase):
    """Top-level stack description (one of ppt-v1 / ppt-v2 / v1+controlnet)."""

    version: str = "ppt-v1"
    unet: UNetConfig = dataclasses.field(default_factory=lambda: SD15_INPAINT_UNET)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    text_encoder: CLIPTextConfig = dataclasses.field(
        default_factory=lambda: CLIPTextConfig(num_external_tokens=30)
    )
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    brushnet: Optional[BrushNetConfig] = None
    controlnet: Optional[ControlNetConfig] = None
    # optional CLIP image tower: IP-Adapter encode_image + safety checker
    image_encoder: Optional[CLIPVisionConfig] = None

    @classmethod
    def from_dict(cls, d: dict) -> "PowerPaintConfig":
        d = dict(d)
        for k, sub in (
            ("unet", UNetConfig),
            ("vae", VAEConfig),
            ("text_encoder", CLIPTextConfig),
            ("scheduler", SchedulerConfig),
            ("brushnet", BrushNetConfig),
            ("controlnet", ControlNetConfig),
            ("image_encoder", CLIPVisionConfig),
        ):
            if isinstance(d.get(k), dict):
                d[k] = sub.from_dict(d[k])
        return super().from_dict.__func__(cls, d)


def ppt_v1_config() -> PowerPaintConfig:
    return PowerPaintConfig(version="ppt-v1")


def ppt_v2_config() -> PowerPaintConfig:
    return PowerPaintConfig(
        version="ppt-v2",
        unet=SD15_UNET,
        brushnet=BrushNetConfig(),
    )


def ppt_v1_controlnet_config() -> PowerPaintConfig:
    return PowerPaintConfig(version="ppt-v1", controlnet=ControlNetConfig())
