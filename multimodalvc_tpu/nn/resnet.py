"""Video front end: 3-D conv stem + per-frame ResNet-18 trunk.

TPU re-design of the reference's mouth-ROI encoder (reference:
avhubert/resnet.py:131-169 — Conv3d(1->64, k=(5,7,7), s=(1,2,2)) + BN +
PReLU + MaxPool3d(1,3,3)/(1,2,2), then frame-wise ResNet-18 basic blocks
with PReLU and a global average pool to 512-d).

Layout is channels-last throughout ([B, T, H, W, C]) so XLA tiles the convs
onto the MXU without transposes; the "3D-to-2D" fold (resnet.py:166-169)
becomes a reshape merging (B, T) into the batch dim, which is free.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C))."""

    channels: int
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(self.init), (self.channels,))
        # compute in x's dtype: an f32 alpha would promote the whole (large)
        # activation tensor to f32, doubling its HBM traffic through the stack
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    relu_type: str = "prelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        h = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h)
        h = PReLU(self.planes, name="relu1")(h) if self.relu_type == "prelu" else nn.relu(h)
        h = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype, name="downsample_bn"
            )(residual)
        h = h + residual
        return PReLU(self.planes, name="relu2")(h) if self.relu_type == "prelu" else nn.relu(h)


class ResNetTrunk(nn.Module):
    """ResNet-18 trunk: layers [2,2,2,2], channels 64/128/256/512."""

    relu_type: str = "prelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for li, (planes, blocks, stride) in enumerate(
            [(64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)]
        ):
            for b in range(blocks):
                x = BasicBlock(
                    planes,
                    stride=stride if b == 0 else 1,
                    relu_type=self.relu_type,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{b}",
                )(x, train=train)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [N, 512]


def max_pool_3d(x, window: Tuple[int, int, int], strides: Tuple[int, int, int], padding):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *strides, 1),
        padding=((0, 0), *padding, (0, 0)),
    )


class ResEncoder(nn.Module):
    """[B, T, H, W, 1] video -> [B, T, 512] per-frame embeddings."""

    relu_type: str = "prelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t, h0, w0, _ = video.shape
        # The reference's Conv3d(1->64, k=(5,7,7), s=(1,2,2)) recast as a
        # 2-D conv: time is stride-1, so stacking the 5 time taps on the
        # (singleton) input-channel axis gives an identical contraction —
        # conv2d(k=(7,7), C_in=5) over (B*T) merged frames.  XLA lowers the
        # merged-batch 2-D conv straight onto the MXU; the 3-D form fused
        # conv+pool into a window fusion that recomputed the conv per pool
        # tap (measured 89 ms of a 113 ms front end at [8,400,88,88]).
        frames = video[..., 0]  # [B, T, H, W]
        padded = jnp.pad(frames, ((0, 0), (2, 2), (0, 0), (0, 0)))
        taps = [padded[:, k : k + t] for k in range(5)]  # tap k = x[t+k-2]
        x = jnp.stack(taps, axis=-1).reshape(b * t, h0, w0, 5)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="frontend_conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="frontend_bn")(x)
        x = PReLU(64, name="frontend_relu")(x) if self.relu_type == "prelu" else nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        x = ResNetTrunk(relu_type=self.relu_type, dtype=self.dtype, name="trunk")(x, train=train)
        return x.reshape(b, t, 512)
