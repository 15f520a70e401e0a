"""BiSeNet face-parsing network (the "condition network").

Re-implementation of reference archs/pgtformer_arch.py:34-397: a 19-class
BiSeNet with ResNet-18 backbone whose three heads are concatenated into a
57-channel semantic prior at 32x32 resolution (pgtformer_arch.py:365-379).

The parser is frozen in every trainable stage of the reference recipe
(`fix_modules=['quantizer','decoder','conditionnet']`, pgtformer_arch.py:493),
so BatchNorm always runs with stored running statistics here; the stats ride
in the `batch_stats` variable collection and come from the ported checkpoint.

Channels-last [N, H, W, C]; static-size bilinear/nearest resizes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from pgtformer_tpu.ops.image import (
    resize_nearest, resize_bilinear_align_corners, global_avg_pool)

Dtype = Any


def _bn(dtype, name="bn", train=False, axis_name=None):
    """torch BatchNorm2d defaults (eps 1e-5, momentum 0.1 -> flax 0.9).

    Frozen running stats by default (the parser is frozen in every stage of
    the deployed recipe).  `train=True` computes batch statistics — with
    `axis_name` set they are reduced across that mesh axis, giving SyncBN
    semantics (the reference trains with `syncbn: true`,
    options/...stage_I...yml:6) — and updates the `batch_stats` collection
    (callers must pass mutable=["batch_stats"]).
    """
    return nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                        momentum=0.9, dtype=dtype, name=name,
                        axis_name=axis_name if train else None)


class ConvBNReLU(nn.Module):
    """conv(no bias) -> BN -> ReLU (reference pgtformer_arch.py:138-159)."""
    out_chan: int
    ks: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Dtype = jnp.float32
    train_bn: bool = False
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_chan, (self.ks, self.ks),
                    strides=(self.stride, self.stride),
                    padding=self.padding, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return jax.nn.relu(_bn(self.dtype, train=self.train_bn,
                               axis_name=self.bn_axis)(x))


class BasicBlock(nn.Module):
    """ResNet-18 basic block (reference pgtformer_arch.py:40-68)."""
    out_chan: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    train_bn: bool = False
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        in_chan = x.shape[-1]
        r = nn.Conv(self.out_chan, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        r = jax.nn.relu(_bn(self.dtype, "bn1", self.train_bn,
                            self.bn_axis)(r))
        r = nn.Conv(self.out_chan, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(r)
        r = _bn(self.dtype, "bn2", self.train_bn, self.bn_axis)(r)
        shortcut = x
        if in_chan != self.out_chan or self.stride != 1:
            shortcut = nn.Conv(self.out_chan, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            shortcut = _bn(self.dtype, "downsample_bn", self.train_bn,
                           self.bn_axis)(shortcut)
        return jax.nn.relu(shortcut + r)


class Resnet18(nn.Module):
    """Stride-32 ResNet-18 trunk returning 1/8, 1/16, 1/32 features
    (reference pgtformer_arch.py:78-100)."""
    dtype: Dtype = jnp.float32
    train_bn: bool = False
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = jax.nn.relu(_bn(self.dtype, "bn1", self.train_bn,
                            self.bn_axis)(x))
        # torch MaxPool2d(3, stride 2, pad 1); pad with -inf for max
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def layer(x, out_chan, stride, name):
            x = BasicBlock(out_chan, stride, dtype=self.dtype,
                           train_bn=self.train_bn, bn_axis=self.bn_axis,
                           name=f"{name}_0")(x)
            return BasicBlock(out_chan, 1, dtype=self.dtype,
                              train_bn=self.train_bn, bn_axis=self.bn_axis,
                              name=f"{name}_1")(x)

        x = layer(x, 64, 1, "layer1")
        feat8 = layer(x, 128, 2, "layer2")
        feat16 = layer(feat8, 256, 2, "layer3")
        feat32 = layer(feat16, 512, 2, "layer4")
        return feat8, feat16, feat32


class AttentionRefinementModule(nn.Module):
    """Global-context channel gating (reference pgtformer_arch.py:191-207)."""
    out_chan: int
    dtype: Dtype = jnp.float32
    train_bn: bool = False
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.out_chan, dtype=self.dtype,
                          train_bn=self.train_bn, bn_axis=self.bn_axis,
                          name="conv")(x)
        atten = global_avg_pool(feat)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv_atten")(atten)
        atten = _bn(self.dtype, "bn_atten", self.train_bn,
                    self.bn_axis)(atten)
        return feat * jax.nn.sigmoid(atten)


class ContextPath(nn.Module):
    """ResNet trunk + top-down refinement (reference pgtformer_arch.py:216-249)."""
    dtype: Dtype = jnp.float32
    train_bn: bool = False
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        feat8, feat16, feat32 = Resnet18(
            dtype=self.dtype, train_bn=self.train_bn,
            bn_axis=self.bn_axis, name="resnet")(x)
        H8, W8 = feat8.shape[-3:-1]
        H16, W16 = feat16.shape[-3:-1]
        H32, W32 = feat32.shape[-3:-1]

        avg = global_avg_pool(feat32)
        avg = ConvBNReLU(128, ks=1, padding=0, dtype=self.dtype,
                         train_bn=self.train_bn, bn_axis=self.bn_axis,
                         name="conv_avg")(avg)
        avg_up = resize_nearest(avg, (H32, W32))

        feat32_arm = AttentionRefinementModule(
            128, dtype=self.dtype, train_bn=self.train_bn,
            bn_axis=self.bn_axis, name="arm32")(feat32)
        feat32_up = resize_nearest(feat32_arm + avg_up, (H16, W16))
        feat32_up = ConvBNReLU(128, dtype=self.dtype,
                               train_bn=self.train_bn, bn_axis=self.bn_axis,
                               name="conv_head32")(feat32_up)

        feat16_arm = AttentionRefinementModule(
            128, dtype=self.dtype, train_bn=self.train_bn,
            bn_axis=self.bn_axis, name="arm16")(feat16)
        feat16_up = resize_nearest(feat16_arm + feat32_up, (H8, W8))
        feat16_up = ConvBNReLU(128, dtype=self.dtype,
                               train_bn=self.train_bn, bn_axis=self.bn_axis,
                               name="conv_head16")(feat16_up)

        return feat8, feat16_up, feat32_up  # 1/8, 1/8, 1/16


class FeatureFusionModule(nn.Module):
    """Concat + SE-style channel attention (reference pgtformer_arch.py:304-334)."""
    out_chan: int
    dtype: Dtype = jnp.float32
    train_bn: bool = False
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, fsp, fcp):
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = ConvBNReLU(self.out_chan, ks=1, padding=0, dtype=self.dtype,
                          train_bn=self.train_bn, bn_axis=self.bn_axis,
                          name="convblk")(fcat)
        atten = global_avg_pool(feat)
        atten = nn.Conv(self.out_chan // 4, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv1")(atten)
        atten = jax.nn.relu(atten)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv2")(atten)
        atten = jax.nn.sigmoid(atten)
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    """ConvBNReLU -> 1x1 class head (reference pgtformer_arch.py:161-171)."""
    mid_chan: int
    n_classes: int
    dtype: Dtype = jnp.float32
    train_bn: bool = False
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.mid_chan, dtype=self.dtype,
                       train_bn=self.train_bn, bn_axis=self.bn_axis,
                       name="conv")(x)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False,
                       dtype=self.dtype, name="conv_out")(x)


class BiSeNet(nn.Module):
    """Face parser emitting the 57-channel 32x32 semantic prior
    (reference pgtformer_arch.py:354-379; three 19-class heads concatenated).

    Input: ImageNet-normalized [N, H, W, 3]; output [N, *out_hw, 3*n_classes].

    `out_hw` generalizes the reference's hardcoded 32x32 head resolution so
    small-geometry configs work; at the deployed 512-input geometry every
    resize below reproduces the reference exactly (feat_out32 is already at
    out_hw and its resize is the identity, matching the reference leaving it
    un-interpolated — pgtformer_arch.py:375-378).
    """
    n_classes: int = 19
    out_hw: tuple = (32, 32)
    dtype: Dtype = jnp.float32
    # SyncBN training path (reference syncbn: true): batch stats computed
    # live and psum-reduced over `bn_axis`; default is frozen running stats
    train_bn: bool = False
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, train_bn=self.train_bn,
                  bn_axis=self.bn_axis)
        feat_res8, feat_cp8, feat_cp16 = ContextPath(**kw, name="cp")(x)
        feat_fuse = FeatureFusionModule(256, **kw,
                                        name="ffm")(feat_res8, feat_cp8)

        feat_out = BiSeNetOutput(256, self.n_classes, **kw,
                                 name="conv_out")(feat_fuse)
        feat_out16 = BiSeNetOutput(64, self.n_classes, **kw,
                                   name="conv_out16")(feat_cp8)
        feat_out32 = BiSeNetOutput(64, self.n_classes, **kw,
                                   name="conv_out32")(feat_cp16)

        feat_out = resize_bilinear_align_corners(feat_out, self.out_hw)
        feat_out16 = resize_bilinear_align_corners(feat_out16, self.out_hw)
        feat_out32 = resize_bilinear_align_corners(feat_out32, self.out_hw)
        return jnp.concatenate([feat_out, feat_out16, feat_out32], axis=-1)
