"""Detection heads (flax/linen, NHWC).

- `CenterNetHead` (ref: fusion.py:788-884): five independent
  conv3x3->ReLU->conv1x1 branches over the BEV map. Weight init N(0, 0.001),
  zero biases, heatmap output bias -log((1-p)/p) with p=0.01
  (ref: fusion.py:858-867). The heatmap branch applies sigmoid INSIDE the
  forward, matching the reference (ref: fusion.py:870-871) — this interacts
  with the focal loss double-sigmoid quirk Q2.
- `MLPDetectionHead` (ref: fusion.py:886-939): global-feature MLP producing
  `cls` (num_classes) and `box` (7) splits.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from ..config import CenterNetHeadSpec, MLPHeadSpec

_HEAD_INIT = nn.initializers.normal(stddev=0.001)


class _Branch(nn.Module):
    out_channels: int
    head_conv: int
    final_bias: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.head_conv,
            (3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=_HEAD_INIT,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_channels,
            (1, 1),
            kernel_init=_HEAD_INIT,
            bias_init=nn.initializers.constant(self.final_bias),
            dtype=self.dtype,
            name="conv2",
        )(x)
        return x


class CenterNetHead(nn.Module):
    """Input (B, H, W, C_in); output dict of NHWC maps:
    heatmap (B, H, W, num_classes) [sigmoided], offset (B, H, W, 2),
    size (B, H, W, 3), rot (B, H, W, 2), vel (B, H, W, 2)."""

    spec: CenterNetHeadSpec = CenterNetHeadSpec()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        prior_prob = 0.01
        hm_bias = -math.log((1 - prior_prob) / prior_prob)
        heatmap = _Branch(
            self.spec.num_classes,
            self.spec.head_conv,
            final_bias=hm_bias,
            dtype=self.dtype,
            name="heatmap_head",
        )(x)
        heatmap = nn.sigmoid(heatmap)
        offset = _Branch(
            2, self.spec.head_conv, dtype=self.dtype, name="offset_head"
        )(x)
        size = _Branch(
            3, self.spec.head_conv, dtype=self.dtype, name="size_head"
        )(x)
        rot = _Branch(
            2, self.spec.head_conv, dtype=self.dtype, name="rot_head"
        )(x)
        vel = _Branch(
            2, self.spec.head_conv, dtype=self.dtype, name="vel_head"
        )(x)
        return {
            "heatmap": heatmap,
            "offset": offset,
            "size": size,
            "rot": rot,
            "vel": vel,
        }


class MLPDetectionHead(nn.Module):
    """Input (B, C_in) global feature; output {'cls': (B, num_classes),
    'box': (B, 7)} (ref: fusion.py:919-939)."""

    spec: MLPHeadSpec = MLPHeadSpec()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = nn.Dense(self.spec.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.spec.dropout, deterministic=not train)(x)
        x = nn.Dense(
            self.spec.num_classes + 7, dtype=self.dtype, name="fc2"
        )(x)
        return {
            "cls": x[:, : self.spec.num_classes],
            "box": x[:, self.spec.num_classes :],
        }
