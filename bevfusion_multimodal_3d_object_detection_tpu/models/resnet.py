"""Flax ResNet backbone (NHWC, TPU-native layout).

Rebuilds the torchvision ResNet-18 topology used by the reference camera
encoder — conv1/bn1/relu/maxpool + layer1..layer3, truncated BEFORE layer4 so
the total stride is 16 (ref: encoders.py:102-120, 154-165). Weights can be
converted from a torchvision state_dict via
`utils.torch_convert.load_torch_resnet18` when a checkpoint file is available
(no network download is attempted).

All convs run in NHWC, which is the native TPU layout (avoids XLA transposes);
matmul-heavy convs hit the MXU directly.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    """torchvision BasicBlock: conv3x3-BN-ReLU-conv3x3-BN + skip, final ReLU."""

    channels: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(
            self.channels,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.channels,
            (3, 3),
            strides=(1, 1),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(y)

        if self.strides != 1 or residual.shape[-1] != self.channels:
            residual = nn.Conv(
                self.channels,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="downsample_bn",
            )(residual)

        return nn.relu(y + residual)


class ResNet18Trunk(nn.Module):
    """ResNet-18 through layer3 (stride 16). Input NHWC (N, H, W, 3);
    output (N, H/16, W/16, 256)."""

    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (2, 2, 2)
    stage_channels: Sequence[int] = (64, 128, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(
            x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )

        for stage_idx, (num_blocks, channels) in enumerate(
            zip(self.stage_sizes, self.stage_channels)
        ):
            for block_idx in range(num_blocks):
                strides = 2 if (stage_idx > 0 and block_idx == 0) else 1
                x = BasicBlock(
                    channels=channels,
                    strides=strides,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train=train)
        return x


def resnet18_trunk_output_shape(h: int, w: int) -> Tuple[int, int, int]:
    return (h // 16, w // 16, 256)
