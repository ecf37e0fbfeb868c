"""Annotator networks for ControlNet preprocessing: HED edges, OpenPose body.

The reference outsources these to ``controlnet_aux`` torch models
(/root/reference/app.py:9,118-119 — ``HEDdetector`` /
``OpenposeDetector.from_pretrained("lllyasviel/ControlNet")``); here both
run natively on the TPU compute path as NHWC Flax modules fed by the same
published checkpoints (``network-bsds500.pth`` for HED, ``body_pose_model.pth``
for OpenPose — converters in ``io/convert.py``).

Architectures are the published ones these checkpoints were trained for:

- :class:`HEDNetwork` — Holistically-Nested Edge Detection (Xie & Tu, ICCV
  2015) in its VGG16 form: five VGG stages, a 1x1 score conv per stage,
  bilinear upsampling of every side output to the input size, and a learned
  1x1 fusion conv + sigmoid.
- :class:`BodyPoseModel` — the CMU two-branch cascade (Cao et al., CVPR 2017
  "Realtime Multi-Person 2D Pose Estimation using Part Affinity Fields"):
  a VGG19 feature stem and six refinement stages, each with a PAF branch
  (38 channels) and a keypoint-heatmap branch (19 channels).

Host-side decoding/drawing for OpenPose lives in ``tasks/pose.py``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from powerpaint_tpu.models.layers import conv

# Caffe-era BGR channel means baked into the published HED checkpoint.  The
# torch deployment applies them to the image exactly in this channel order.
HED_BGR_MEANS = (104.00698793, 116.66876762, 122.67891434)


class HEDNetwork(nn.Module):
    """HED edge detector (VGG16 + per-stage score convs + fusion conv).

    Input: (B, H, W, 3) float in [0, 1], RGB channel order — matching the
    reference deployment (controlnet_aux HEDdetector), which feeds RGB into
    the Caffe-trained network and subtracts the stored BGR-ordered means
    anyway.  sd-controlnet-hed was trained on edge maps produced exactly
    this way, so the "wrong" channel order is the parity-correct one.
    Output: (B, H, W, 1) edge probability in [0, 1].
    """

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h_in, w_in = x.shape[1:3]
        x = x.astype(self.dtype) * 255.0
        x = x - jnp.asarray(HED_BGR_MEANS, self.dtype)

        def stage(x, chans, names, pool):
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for c, name in zip(chans, names):
                x = nn.relu(
                    conv(c, 3, 1, 1, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=name)(x)
                )
            return x

        v1 = stage(x, (64, 64), ("netVggOne_0", "netVggOne_2"), pool=False)
        v2 = stage(v1, (128, 128), ("netVggTwo_1", "netVggTwo_3"), pool=True)
        v3 = stage(v2, (256, 256, 256),
                   ("netVggThr_1", "netVggThr_3", "netVggThr_5"), pool=True)
        v4 = stage(v3, (512, 512, 512),
                   ("netVggFou_1", "netVggFou_3", "netVggFou_5"), pool=True)
        v5 = stage(v4, (512, 512, 512),
                   ("netVggFiv_1", "netVggFiv_3", "netVggFiv_5"), pool=True)

        scores = []
        for feat, name in zip(
            (v1, v2, v3, v4, v5),
            ("netScoreOne", "netScoreTwo", "netScoreThr", "netScoreFou",
             "netScoreFiv"),
        ):
            s = conv(1, 1, 1, 0, dtype=self.dtype,
                     param_dtype=self.param_dtype, name=name)(feat)
            if s.shape[1:3] != (h_in, w_in):
                s = jax.image.resize(
                    s, (s.shape[0], h_in, w_in, 1), method="bilinear"
                )
            scores.append(s)

        fused = conv(1, 1, 1, 0, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="netCombine_0")(
            jnp.concatenate(scores, axis=-1)
        )
        return nn.sigmoid(fused)


# ---------------------------------------------------------------------------
# OpenPose body
# ---------------------------------------------------------------------------

# (name, out_channels, kernel) per layer; ReLU after every conv except the
# final 1x1 of each branch (conv5_5_* / Mconv7_*).
_STEM = (
    ("conv1_1", 64, 3), ("conv1_2", 64, 3), ("pool", 0, 0),
    ("conv2_1", 128, 3), ("conv2_2", 128, 3), ("pool", 0, 0),
    ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3),
    ("conv3_4", 256, 3), ("pool", 0, 0),
    ("conv4_1", 512, 3), ("conv4_2", 512, 3),
    ("conv4_3_CPM", 256, 3), ("conv4_4_CPM", 128, 3),
)

PAF_CHANNELS = 38
HEATMAP_CHANNELS = 19


class BodyPoseModel(nn.Module):
    """CMU body-pose cascade: stem -> stage 1 -> stages 2..6 on
    concat(PAF, heatmap, stem features).

    Input: (B, H, W, 3) float, BGR, normalized ``x/256 - 0.5`` (done by the
    caller, tasks/pose.py).  H and W must be multiples of 8 (three pools).
    Output: (paf (B, H/8, W/8, 38), heatmap (B, H/8, W/8, 19)).
    """

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _conv(self, c, k, name):
        return conv(c, k, 1, (k - 1) // 2, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        for name, c, k in _STEM:
            if name == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(self._conv(c, k, name)(x))
        feat = x

        def branch_stage1(x, suffix, out_c):
            for i in (1, 2, 3):
                x = nn.relu(
                    self._conv(128, 3, f"conv5_{i}_CPM_{suffix}")(x)
                )
            x = nn.relu(self._conv(512, 1, f"conv5_4_CPM_{suffix}")(x))
            return self._conv(out_c, 1, f"conv5_5_CPM_{suffix}")(x)

        def branch_stageN(x, stage, suffix, out_c):
            for i in (1, 2, 3, 4, 5):
                x = nn.relu(
                    self._conv(128, 7, f"Mconv{i}_stage{stage}_{suffix}")(x)
                )
            x = nn.relu(self._conv(128, 1, f"Mconv6_stage{stage}_{suffix}")(x))
            return self._conv(out_c, 1, f"Mconv7_stage{stage}_{suffix}")(x)

        paf = branch_stage1(feat, "L1", PAF_CHANNELS)
        heat = branch_stage1(feat, "L2", HEATMAP_CHANNELS)
        for stage in range(2, 7):
            x = jnp.concatenate([paf, heat, feat], axis=-1)
            paf = branch_stageN(x, stage, "L1", PAF_CHANNELS)
            heat = branch_stageN(x, stage, "L2", HEATMAP_CHANNELS)
        return paf, heat
