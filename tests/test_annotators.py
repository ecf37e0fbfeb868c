"""Native HED / OpenPose annotators: torch-oracle parity + decode + e2e.

The reference gets these control-map preprocessors from controlnet_aux torch
models (app.py:118-119); here they are Flax modules (models/annotators.py)
fed by the same published checkpoints.  Oracles below are torch modules
built with the published architectures AND the published state-dict naming
(``netVggOne.0`` / flat Caffe names), so the converters are exercised
end-to-end on realistic keys.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from powerpaint_tpu.io import convert as C
from powerpaint_tpu.models.annotators import (
    BodyPoseModel,
    HEDNetwork,
    HED_BGR_MEANS,
)

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

torch.manual_seed(0)
torch.set_grad_enabled(False)


def sd_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# HED
# ---------------------------------------------------------------------------


class TorchHED(nn.Module):
    """Published HED architecture with the published submodule naming."""

    def __init__(self):
        super().__init__()
        self.netVggOne = nn.Sequential(
            nn.Conv2d(3, 64, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(64, 64, 3, 1, 1), nn.ReLU(),
        )
        self.netVggTwo = nn.Sequential(
            nn.MaxPool2d(2, 2),
            nn.Conv2d(64, 128, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(128, 128, 3, 1, 1), nn.ReLU(),
        )
        self.netVggThr = nn.Sequential(
            nn.MaxPool2d(2, 2),
            nn.Conv2d(128, 256, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(),
        )
        self.netVggFou = nn.Sequential(
            nn.MaxPool2d(2, 2),
            nn.Conv2d(256, 512, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(512, 512, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(512, 512, 3, 1, 1), nn.ReLU(),
        )
        self.netVggFiv = nn.Sequential(
            nn.MaxPool2d(2, 2),
            nn.Conv2d(512, 512, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(512, 512, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(512, 512, 3, 1, 1), nn.ReLU(),
        )
        self.netScoreOne = nn.Conv2d(64, 1, 1)
        self.netScoreTwo = nn.Conv2d(128, 1, 1)
        self.netScoreThr = nn.Conv2d(256, 1, 1)
        self.netScoreFou = nn.Conv2d(512, 1, 1)
        self.netScoreFiv = nn.Conv2d(512, 1, 1)
        self.netCombine = nn.Sequential(nn.Conv2d(5, 1, 1), nn.Sigmoid())

    def forward(self, x):
        h, w = x.shape[2:]
        x = x * 255.0
        x = x - torch.tensor(HED_BGR_MEANS, dtype=x.dtype).view(1, 3, 1, 1)
        v1 = self.netVggOne(x)
        v2 = self.netVggTwo(v1)
        v3 = self.netVggThr(v2)
        v4 = self.netVggFou(v3)
        v5 = self.netVggFiv(v4)
        scores = [
            self.netScoreOne(v1), self.netScoreTwo(v2), self.netScoreThr(v3),
            self.netScoreFou(v4), self.netScoreFiv(v5),
        ]
        scores = [
            F.interpolate(s, size=(h, w), mode="bilinear",
                          align_corners=False)
            for s in scores
        ]
        return self.netCombine(torch.cat(scores, 1))


def _shrink(sd, factor=0.4):
    """Scale conv weights down so 13-layer activations stay unsaturated."""
    return {
        k: v * factor if k.endswith("weight") and v.ndim == 4 else v
        for k, v in sd.items()
    }


def test_hed_matches_torch_oracle():
    oracle = TorchHED().eval()
    sd = _shrink(sd_numpy(oracle))
    oracle.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    params = C.convert_hed(sd)
    x = np.random.default_rng(0).random((1, 48, 64, 3), np.float32)

    ours = HEDNetwork().apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
    )
    theirs = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(ours)[..., 0],
        theirs.numpy()[:, 0],
        atol=2e-4, rtol=1e-3,
    )


def test_convert_hed_remaps_module_naming():
    """The published file names submodules ``moduleVggOne`` etc."""
    sd = {
        "moduleVggOne.0.weight": np.zeros((64, 3, 3, 3), np.float32),
        "moduleVggOne.0.bias": np.zeros((64,), np.float32),
    }
    tree = C.convert_hed(sd)
    assert tree["netVggOne_0"]["kernel"].shape == (3, 3, 3, 64)


def test_hed_preprocessor_end_to_end():
    from powerpaint_tpu.tasks.control import HEDPreprocessor

    net = HEDNetwork()
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    image = (np.random.default_rng(1).random((70, 90, 3)) * 255).astype(
        np.uint8
    )
    pre = HEDPreprocessor(params=params, detect_resolution=64)
    out = pre(image)
    assert out.shape == (70, 90, 3) and out.dtype == np.uint8
    assert (out[..., 0] == out[..., 1]).all()

    scribble = HEDPreprocessor(params=params, detect_resolution=64,
                               scribble=True)(image)
    assert set(np.unique(scribble)) <= {0, 255}

    safe = HEDPreprocessor(params=params, detect_resolution=64, safe=True)
    assert safe(image).shape == (70, 90, 3)


# ---------------------------------------------------------------------------
# OpenPose body
# ---------------------------------------------------------------------------

_STEM_SPEC = [
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3), ("pool", 0, 0, 0),
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3), ("pool", 0, 0, 0),
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3), ("pool", 0, 0, 0),
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3_CPM", 512, 256, 3), ("conv4_4_CPM", 256, 128, 3),
]


class TorchBodyPose(nn.Module):
    """CMU cascade with flat Caffe layer names (the checkpoint's naming)."""

    def __init__(self):
        super().__init__()
        for name, cin, cout, k in _STEM_SPEC:
            if name != "pool":
                setattr(self, name, nn.Conv2d(cin, cout, k, 1, (k - 1) // 2))
        for suffix, out_c in (("L1", 38), ("L2", 19)):
            for i in (1, 2, 3):
                setattr(self, f"conv5_{i}_CPM_{suffix}",
                        nn.Conv2d(128, 128, 3, 1, 1))
            setattr(self, f"conv5_4_CPM_{suffix}", nn.Conv2d(128, 512, 1))
            setattr(self, f"conv5_5_CPM_{suffix}", nn.Conv2d(512, out_c, 1))
            for stage in range(2, 7):
                setattr(self, f"Mconv1_stage{stage}_{suffix}",
                        nn.Conv2d(185, 128, 7, 1, 3))
                for i in (2, 3, 4, 5):
                    setattr(self, f"Mconv{i}_stage{stage}_{suffix}",
                            nn.Conv2d(128, 128, 7, 1, 3))
                setattr(self, f"Mconv6_stage{stage}_{suffix}",
                        nn.Conv2d(128, 128, 1))
                setattr(self, f"Mconv7_stage{stage}_{suffix}",
                        nn.Conv2d(128, out_c, 1))

    def forward(self, x):
        for name, *_ in _STEM_SPEC:
            if name == "pool":
                x = F.max_pool2d(x, 2, 2)
            else:
                x = F.relu(getattr(self, name)(x))
        feat = x

        def stage1(x, suffix):
            for i in (1, 2, 3):
                x = F.relu(getattr(self, f"conv5_{i}_CPM_{suffix}")(x))
            x = F.relu(getattr(self, f"conv5_4_CPM_{suffix}")(x))
            return getattr(self, f"conv5_5_CPM_{suffix}")(x)

        def stage_n(x, stage, suffix):
            for i in (1, 2, 3, 4, 5):
                x = F.relu(getattr(self, f"Mconv{i}_stage{stage}_{suffix}")(x))
            x = F.relu(getattr(self, f"Mconv6_stage{stage}_{suffix}")(x))
            return getattr(self, f"Mconv7_stage{stage}_{suffix}")(x)

        paf, heat = stage1(feat, "L1"), stage1(feat, "L2")
        for stage in range(2, 7):
            x = torch.cat([paf, heat, feat], 1)
            paf, heat = stage_n(x, stage, "L1"), stage_n(x, stage, "L2")
        return paf, heat


def test_bodypose_matches_torch_oracle():
    oracle = TorchBodyPose().eval()
    sd = _shrink(sd_numpy(oracle))
    oracle.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    params = C.convert_bodypose(sd)
    x = (np.random.default_rng(2).random((1, 48, 64, 3), np.float32)
         - 0.5)

    paf, heat = BodyPoseModel().apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
    )
    t_paf, t_heat = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert paf.shape == (1, 6, 8, 38) and heat.shape == (1, 6, 8, 19)
    np.testing.assert_allclose(
        np.asarray(paf), t_paf.permute(0, 2, 3, 1).numpy(),
        atol=5e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(heat), t_heat.permute(0, 2, 3, 1).numpy(),
        atol=5e-4, rtol=1e-3,
    )


def test_convert_bodypose_strips_module_prefixes():
    sd = {
        "model0.conv1_1.weight": np.zeros((64, 3, 3, 3), np.float32),
        "model0.conv1_1.bias": np.zeros((64,), np.float32),
    }
    tree = C.convert_bodypose(sd)
    assert tree["conv1_1"]["kernel"].shape == (3, 3, 3, 64)


# ---------------------------------------------------------------------------
# decode: synthetic person
# ---------------------------------------------------------------------------


def _gaussian_peak(shape, cx, cy, sigma=2.0):
    ys, xs = np.mgrid[: shape[0], : shape[1]]
    return np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma**2))


def test_paf_decode_assembles_synthetic_arm():
    """Neck -> R-shoulder -> R-elbow -> R-wrist along a horizontal line,
    with unit +x PAFs on each limb, must decode to one 4-part person."""
    from powerpaint_tpu.tasks import pose

    h, w = 64, 96
    # keypoints 2(neck),3,4,5 at x = 16, 32, 48, 64 / y = 32  (1-indexed)
    xs = {2: 16, 3: 32, 4: 48, 5: 64}
    heat = np.zeros((h, w, 19), np.float32)
    for part, x in xs.items():
        heat[:, :, part - 1] = _gaussian_peak((h, w), x, 32)
    paf = np.zeros((h, w, 38), np.float32)
    for limb, chans in zip(pose.LIMB_SEQ, pose.MAP_IDX):
        if limb[0] in xs and limb[1] in xs:
            x0, x1 = xs[limb[0]], xs[limb[1]]
            paf[28:36, x0:x1 + 1, chans[0] - 19] = 1.0  # +x direction

    peaks = pose.find_peaks(heat)
    assert sum(len(p) for p in peaks) == 4
    connections, special = pose.connect_limbs(paf, peaks, h)
    n_found = sum(len(c) for c in connections)
    assert n_found == 3
    candidate, subset = pose.assemble_people(peaks, connections, special)
    assert len(subset) == 1
    assert subset[0][-1] == 4  # four parts on one person
    canvas = pose.draw_bodypose(h, w, candidate, subset)
    assert canvas.shape == (h, w, 3) and canvas.max() > 0


def test_openpose_preprocessor_end_to_end():
    from powerpaint_tpu.tasks.pose import OpenposeBodyPreprocessor

    net = BodyPoseModel()
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 24, 32, 3))
    )["params"]
    pre = OpenposeBodyPreprocessor(params=params)
    image = (np.random.default_rng(3).random((96, 128, 3)) * 255).astype(
        np.uint8
    )
    out = pre(image)
    assert out.shape == (96, 128, 3) and out.dtype == np.uint8


def test_registry_wiring():
    from powerpaint_tpu.tasks import control

    net = HEDNetwork()
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    control.register_hed(params=params, detect_resolution=64)
    img = np.zeros((64, 64, 3), np.uint8)
    out = control.get_control_image("hed", img)
    assert out.shape == (64, 64, 3)
    del control._REGISTRY["hed"]
