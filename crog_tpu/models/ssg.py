"""SSG: vision-only YOLACT-style instance grasp synthesis (reference
model/ssg.py:15-293).

ResNet-50 backbone (optionally 4-channel RGB-D stem), 5-level FPN (p3-p7),
ProtoNet emitting 32 prototype masks at 2x p3 resolution, and a prediction
head shared across levels producing class confidences, box offsets, instance
mask coefficients and 4x grasp-map coefficients per anchor.

Losses live in crog_tpu.models.ssg_loss (vectorized anchor matching instead
of the reference's per-image python loop, model/ssg.py:317-321).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import numpy as np

import jax.numpy as jnp
import flax.linen as nn

from crog_tpu.models.clip import _bn
from crog_tpu.ops.boxes import make_anchors

# the reference xavier-uniform-initializes every conv in SSG with zero bias
# (model/ssg.py:241-245)
_XAVIER = nn.initializers.xavier_uniform()


def _conv(features, kernel, stride=1, padding=0, dtype=jnp.float32, name=None,
          use_bias=False):
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)], use_bias=use_bias,
        kernel_init=_XAVIER, dtype=dtype, param_dtype=jnp.float32, name=name,
    )
from crog_tpu.ops.resize import resize_bilinear, upsample2x_bilinear


class ResBottleneck(nn.Module):
    """torchvision-style bottleneck (reference model/ssg.py:15-50): stride
    lives on the 3x3 conv, downsample is a strided 1x1 conv + BN."""

    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        use_ra = not train
        inplanes = x.shape[-1]
        out = nn.relu(
            _bn(self.dtype, "bn1")(
                _conv(self.planes, 1, dtype=self.dtype, name="conv1")(x),
                use_running_average=use_ra,
            )
        )
        out = nn.relu(
            _bn(self.dtype, "bn2")(
                _conv(self.planes, 3, self.stride, 1, self.dtype, "conv2")(out),
                use_running_average=use_ra,
            )
        )
        out = _bn(self.dtype, "bn3")(
            _conv(self.planes * 4, 1, dtype=self.dtype, name="conv3")(out),
            use_running_average=use_ra,
        )
        if self.stride != 1 or inplanes != self.planes * 4:
            identity = _bn(self.dtype, "downsample_bn")(
                _conv(
                    self.planes * 4, 1, self.stride, 0, self.dtype,
                    "downsample_conv",
                )(x),
                use_running_average=use_ra,
            )
        else:
            identity = x
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """reference model/ssg.py:53-114; returns all 4 stage outputs."""

    layers: Sequence[int] = (3, 4, 6, 3)
    in_channels: int = 3  # 4 with depth (reference model/ssg.py:217-222)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = _conv(64, 7, 2, 3, self.dtype, "conv1")(x)
        x = nn.relu(
            _bn(self.dtype, "bn1")(x, use_running_average=not train)
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        planes = (64, 128, 256, 512)
        for si, (p, blocks) in enumerate(zip(planes, self.layers)):
            stride = 1 if si == 0 else 2
            x = ResBottleneck(p, stride, self.dtype, name=f"layer{si+1}_0")(
                x, train
            )
            for bi in range(1, blocks):
                x = ResBottleneck(p, 1, self.dtype, name=f"layer{si+1}_{bi}")(
                    x, train
                )
            outs.append(x)
        return tuple(outs)


class SSGFPN(nn.Module):
    """5-level FPN p3-p7 (reference model/ssg.py:172-205)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5, train: bool):
        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
            kernel_init=_XAVIER, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        p5_1 = conv(256, 1, 1, 0, "lat2")(c5)
        p4_1 = conv(256, 1, 1, 0, "lat1")(c4) + upsample2x_bilinear(p5_1)
        p3_1 = conv(256, 1, 1, 0, "lat0")(c3) + upsample2x_bilinear(p4_1)
        p5 = nn.relu(conv(256, 3, 1, 1, "pred2")(p5_1))
        p4 = nn.relu(conv(256, 3, 1, 1, "pred1")(p4_1))
        p3 = nn.relu(conv(256, 3, 1, 1, "pred0")(p3_1))
        p6 = nn.relu(conv(256, 3, 2, 1, "down0")(p5))
        p7 = nn.relu(conv(256, 3, 2, 1, "down1")(p6))
        return p3, p4, p5, p6, p7


class ProtoNet(nn.Module):
    """reference model/ssg.py:150-169; output [B, 2*h3, 2*w3, coef_dim]."""

    coef_dim: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        conv3 = lambda f, name: nn.Conv(
            f, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=_XAVIER,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        for i in range(3):
            x = nn.relu(conv3(256, f"proto1_{i}")(x))
        x = upsample2x_bilinear(x, align_corners=True)
        x = nn.relu(conv3(256, "proto2_0")(x))
        x = nn.relu(
            nn.Conv(
                self.coef_dim, (1, 1), kernel_init=_XAVIER, dtype=self.dtype,
                param_dtype=jnp.float32, name="proto2_1",
            )(x)
        )
        return x


class PredictionModule(nn.Module):
    """Shared per-level head (reference model/ssg.py:117-147)."""

    num_classes: int
    num_ratios: int = 3
    coef_dim: int = 32
    with_grasp_masks: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv3 = lambda f, name: nn.Conv(
            f, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=_XAVIER,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        b = x.shape[0]
        x = nn.relu(conv3(256, "upfeature")(x))
        conf = conv3(self.num_ratios * self.num_classes, "conf_layer")(x)
        box = conv3(self.num_ratios * 4, "bbox_layer")(x)
        coef = jnp.tanh(conv3(self.num_ratios * self.coef_dim, "coef_layer")(x))
        conf = conf.reshape(b, -1, self.num_classes)
        box = box.reshape(b, -1, 4)
        coef = coef.reshape(b, -1, self.coef_dim)
        out = [conf, box, coef]
        if self.with_grasp_masks:
            g = jnp.tanh(
                conv3(self.num_ratios * self.coef_dim * 4, "grasp_coef_layer")(x)
            )
            out.append(g.reshape(b, -1, 4, self.coef_dim))
        return out


class SSG(nn.Module):
    """Full detector.  Anchors are computed statically from the config
    (reference model/ssg.py:231-235)."""

    num_classes: int = 32
    img_size: int = 544
    resnet_layers: Tuple[int, ...] = (3, 4, 6, 3)
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    aspect_ratios: Tuple[float, ...] = (1, 0.5, 2)
    num_protos: int = 32
    with_depth: bool = True
    with_grasp_masks: bool = True
    dtype: Any = jnp.float32

    def anchors(self) -> np.ndarray:
        scales = [int(self.img_size / 544 * a) for a in (24, 48, 96, 192, 384)]
        shapes = [
            math.ceil(self.img_size / s) for s in self.anchor_strides
        ]
        all_anchors = []
        for size, scale in zip(shapes, scales):
            all_anchors.append(
                make_anchors(size, size, scale, self.aspect_ratios, self.img_size)
            )
        return np.concatenate(all_anchors, axis=0)

    @nn.compact
    def __call__(self, img, train: bool = False):
        """img: [B, S, S, 3(+1 depth)] -> output dict of device arrays."""
        backbone = ResNetBackbone(
            layers=self.resnet_layers,
            in_channels=img.shape[-1],
            dtype=self.dtype,
            name="backbone",
        )
        _, c3, c4, c5 = backbone(img.astype(self.dtype), train)
        feats = SSGFPN(dtype=self.dtype, name="fpn")(c3, c4, c5, train)
        protos = ProtoNet(self.num_protos, dtype=self.dtype, name="proto_net")(
            feats[0], train
        )
        head = PredictionModule(
            num_classes=self.num_classes,
            num_ratios=len(self.aspect_ratios),
            coef_dim=self.num_protos,
            with_grasp_masks=self.with_grasp_masks,
            dtype=self.dtype,
            name="prediction_layers",
        )
        confs, boxes, coefs, grasps = [], [], [], []
        for f in feats:
            out = head(f)
            confs.append(out[0])
            boxes.append(out[1])
            coefs.append(out[2])
            if self.with_grasp_masks:
                grasps.append(out[3])
        class_pred = jnp.concatenate(confs, axis=1).astype(jnp.float32)
        output = {
            "protos": protos.astype(jnp.float32),
            "cls_logits": class_pred,
            "box_pred": jnp.concatenate(boxes, axis=1).astype(jnp.float32),
        }
        # train mode keeps the coefficient stacks in the conv dtype: the loss
        # gathers only masks_to_train positives per image and converts to f32
        # POST-gather (gather commutes with the convert — bit-identical),
        # which drops a [B, N, 4, 32] convert+write (~230 MB/step at batch
        # 16, profiled 1.4 ms as a lone convert_element_type) plus its
        # backward scatter at f32.  The softmax over all N anchors is an
        # eval-only consumer (post-processing reads cls_pred; the loss uses
        # cls_logits).
        coef_cat = jnp.concatenate(coefs, axis=1)
        output["ins_coef_pred"] = (
            coef_cat if train else coef_cat.astype(jnp.float32)
        )
        if not train:
            output["cls_pred"] = nn.softmax(class_pred, axis=-1)
        if self.with_grasp_masks:
            grasp_cat = jnp.concatenate(grasps, axis=1)
            output["grasp_coef_pred"] = (
                grasp_cat if train else grasp_cat.astype(jnp.float32)
            )
        if train:
            output["seg_pred"] = nn.Conv(
                self.num_classes, (1, 1), kernel_init=_XAVIER,
                dtype=self.dtype, param_dtype=jnp.float32,
                name="semantic_seg_conv",
            )(feats[0]).astype(jnp.float32)
        return output


def build_ssg(cfg) -> Tuple[SSG, Dict]:
    model = SSG(
        num_classes=cfg.num_classes,
        img_size=cfg.img_size,
        resnet_layers=tuple(cfg.resnet_layers),
        anchor_strides=tuple(cfg.anchor_strides),
        aspect_ratios=tuple(cfg.aspect_ratios),
        num_protos=cfg.num_protos,
        with_depth=cfg.with_depth,
        with_grasp_masks=cfg.with_grasp_masks,
        dtype=jnp.bfloat16 if cfg.get("compute_dtype", "bfloat16") == "bfloat16"
        else jnp.float32,
    )
    return model, {}
