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
import jax
import jax.numpy as jnp


class BasicBlock(nn.Module):
    """torchvision BasicBlock: conv3x3-BN-ReLU-conv3x3-BN + skip, final ReLU."""

    channels: int
    strides: int = 1
    dtype: Any = jnp.float32
    # inference-graph BN folding: convs carry a bias and the BN disappears
    # entirely (weights pre-scaled by utils/fold_bn.fold_bn_params). Removes
    # one HBM-bound elementwise pass per conv from the serving graph.
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not (self.fold_bn and train), "fold_bn is inference-only"
        residual = x
        y = nn.Conv(
            self.channels,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            use_bias=self.fold_bn,
            dtype=self.dtype,
            name="conv1",
        )(x)
        if not self.fold_bn:
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
            use_bias=self.fold_bn,
            dtype=self.dtype,
            name="conv2",
        )(y)
        if not self.fold_bn:
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn2",
            )(y)

        if self.strides != 1 or residual.shape[-1] != self.channels:
            residual = nn.Conv(
                self.channels,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=self.fold_bn,
                dtype=self.dtype,
                name="downsample_conv",
            )(residual)
            if not self.fold_bn:
                residual = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name="downsample_bn",
                )(residual)

        return nn.relu(y + residual)


def _space_to_depth_conv1(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """7x7/stride-2 conv expressed as a 4x4/stride-1 conv on a 2x2
    space-to-depth input — the classic TPU stem optimization: C_in goes 3->12
    and the stride moves into a reshape, quadrupling MXU contraction-depth
    utilization. Numerically identical to the direct conv (same kernel,
    zero-padded 7->8 and regrouped)."""
    h, w = x.shape[1], x.shape[2]
    # pad like the direct conv's ((3,3),(3,3)); H+6 and W+6 are even for
    # even inputs
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    b, hp, wp, c = xp.shape
    j = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
    j = j.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * c)

    # kernel (7,7,C,O) -> pad to (8,8,C,O) -> (4,4,4C,O) with matching
    # (r,s,c) flattening
    k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    o = kernel.shape[-1]
    kprime = (
        k8.reshape(4, 2, 4, 2, c, o)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 4 * c, o)
    )
    return jax.lax.conv_general_dilated(
        j,
        kprime.astype(j.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ResNet18Trunk(nn.Module):
    """ResNet-18 through layer3 (stride 16). Input NHWC (N, H, W, 3);
    output (N, H/16, W/16, 256).

    `space_to_depth=True` computes the stem conv on a 2x2 space-to-depth
    input (same parameters — checkpoints interchange freely). Measured on a
    v5e (bf16, 192x448x800): the direct conv is FASTER (50.3 vs 57.9 ms for
    the full trunk) — XLA's own stem lowering already handles the thin-C_in
    case well, so this stays off by default and exists as a verified
    alternative."""

    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (2, 2, 2)
    stage_channels: Sequence[int] = (64, 128, 256)
    space_to_depth: bool = False
    # serving-graph BN folding (see BasicBlock.fold_bn)
    fold_bn: bool = False
    # rematerialize each residual block in the backward pass
    # (jax.checkpoint): trades ~30% more FLOPs for not keeping the large
    # early-stage activations (112x200x64 etc.) live through the backward —
    # the standard HBM/compute trade for training bigger batches.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not (self.fold_bn and (train or self.space_to_depth)), (
            "fold_bn is inference-only and incompatible with space_to_depth"
        )
        if self.space_to_depth and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            conv1 = nn.Conv(
                64,
                (7, 7),
                strides=(2, 2),
                padding=((3, 3), (3, 3)),
                use_bias=False,
                dtype=self.dtype,
                name="conv1",
            )
            # materialize conv1's params without running the direct conv
            if self.is_initializing():
                x = conv1(x)
            else:
                kernel = self.get_variable("params", "conv1")["kernel"]
                x = _space_to_depth_conv1(x.astype(self.dtype), kernel)
        else:
            x = nn.Conv(
                64,
                (7, 7),
                strides=(2, 2),
                padding=((3, 3), (3, 3)),
                use_bias=self.fold_bn,
                dtype=self.dtype,
                name="conv1",
            )(x)
        if not self.fold_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn1",
            )(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(
            x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )

        block_cls = (
            nn.remat(BasicBlock, static_argnums=(2,))
            if self.remat
            else BasicBlock
        )
        for stage_idx, (num_blocks, channels) in enumerate(
            zip(self.stage_sizes, self.stage_channels)
        ):
            for block_idx in range(num_blocks):
                strides = 2 if (stage_idx > 0 and block_idx == 0) else 1
                x = block_cls(
                    channels=channels,
                    strides=strides,
                    dtype=self.dtype,
                    fold_bn=self.fold_bn,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train)
        return x


def resnet18_trunk_output_shape(h: int, w: int) -> Tuple[int, int, int]:
    return (h // 16, w // 16, 256)
