"""CLIP RN50 dual encoder in flax, TPU-first.

Architecture parity with the reference CLIP (model/clip.py:10-456): a
ModifiedResNet vision tower (3-conv stem, blur-pool bottlenecks, attention
pooling returning spatial features) that emits multi-scale features
(x2, x3, x4-pooled), and a 12-layer causal text transformer returning
per-token features plus the projected EOT sentence embedding.

TPU-first choices:
  * NHWC layout end to end (XLA:TPU's native conv layout).
  * bf16 compute / fp32 params via the ``dtype`` policy; LayerNorm and
    softmax always compute fp32 (matches the reference's fp16-safe LayerNorm,
    model/clip.py:226-231).
  * the attention-pool positional embedding is bicubic-resized at trace time
    (static shapes), matching model/clip.py:80-108.
  * BatchNorm running stats live in the ``batch_stats`` collection; under a
    sharded batch the batch statistics are global means (XLA all-reduces
    them), which reproduces the reference's SyncBatchNorm (train_crog.py:113).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from crog_tpu.ops.attention import MultiHeadAttention, attention_core
from crog_tpu.ops.resize import resize_bicubic


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormFp32(nn.Module):
    """LayerNorm computed in fp32 regardless of input dtype.

    Fenced with optimization barriers on input AND output: XLA otherwise
    fuses the statistics reduce into a neighboring GEMM/conv fusion as a
    side output, dragging the matmul ~8x off MXU peak (197 -> 210
    samples/s/chip from fencing alone).  A granular variant — stats fenced,
    normalize left free to fuse into consumers — was tried and REVERTED
    (192 vs 210): multi-consumer norms (q/k/v) then recompute the
    normalize per consumer, re-reading x each time; materializing y once
    is cheaper."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        x32 = jax.lax.optimization_barrier(x).astype(jnp.float32)
        y = nn.LayerNorm(epsilon=self.epsilon, param_dtype=jnp.float32)(x32)
        return jax.lax.optimization_barrier(y.astype(orig))


# NOTE: fencing BatchNorm the way LayerNormFp32 is fenced was tried and
# REVERTED (188 vs 210 samples/s/chip): the conv+BN-stats fusions are
# beneficial — the stats reduce piggybacks on the conv's output write.
def _bn(dtype, name=None, zero_init: bool = False):
    return nn.BatchNorm(
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        use_running_average=None,  # passed per-call
        scale_init=nn.initializers.zeros if zero_init else nn.initializers.ones,
        name=name,
    )


def _conv(features, kernel, stride=1, padding=0, dtype=jnp.float32, name=None,
          use_bias=False):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def avg_pool(x, k):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class _ConvKernel(nn.Module):
    """Parameter shell matching nn.Conv's tree ({'kernel': [kh,kw,ci,co]})
    so the space-to-depth stem shares parameters/checkpoints with the plain
    stem (same name, same shape, same default init)."""

    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.linear.default_kernel_init, self.shape, jnp.float32
        )


class _BNState(nn.Module):
    """Parameter/stats shell matching nn.BatchNorm's tree (scale/bias params,
    batch_stats mean/var) for the blocked-domain BN below."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), (self.features,),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), (self.features,),
        )
        return scale, bias, mean, var


def _blocked_bn_relu(shell: _BNState, x, c: int, train: bool, dtype):
    """BatchNorm over a 2x2-blocked tensor [..., 4c] (slot-major layout):
    statistics per ORIGINAL channel reduce over batch, space AND the 4 block
    slots — numerically the flax BatchNorm of the un-blocked tensor
    (momentum 0.9, eps 1e-5, fp32 stats, fast variance), followed by ReLU."""
    scale, bias, ra_mean, ra_var = shell()
    stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
    if train:
        # two-stage reduction: per-LANE means over (B,H,W) first (XLA fuses
        # the f32 convert into this reduce — one bf16 read, no f32
        # materialization), then fold the 4 equal-count block slots
        xf = x.astype(stat_dtype)
        m1 = xf.mean(axis=(0, 1, 2))
        m2 = (xf * xf).mean(axis=(0, 1, 2))
        mu = m1.reshape(4, c).mean(axis=0)
        mu2 = m2.reshape(4, c).mean(axis=0)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        momentum = 0.9
        ra_mean.value = momentum * ra_mean.value + (1 - momentum) * mu
        ra_var.value = momentum * ra_var.value + (1 - momentum) * var
    else:
        mu, var = ra_mean.value, ra_var.value
    mu4 = jnp.tile(mu, 4)
    mul4 = jnp.tile(jax.lax.rsqrt(var + 1e-5) * scale, 4)
    bias4 = jnp.tile(bias, 4)
    y = (x - mu4) * mul4 + bias4
    return nn.relu(y.astype(dtype))


class Bottleneck(nn.Module):
    """CLIP's anti-aliased bottleneck (reference model/clip.py:10-57): all
    convs stride 1; an avgpool follows conv2 (and prefixes the downsample
    path) when stride > 1."""

    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        from jax.ad_checkpoint import checkpoint_name

        expansion = 4
        inplanes = x.shape[-1]
        use_ra = not train
        # conv outputs are checkpoint-named: under selective remat only
        # these are saved for the backward pass and the BN+ReLU chains are
        # recomputed from them (elementwise) instead of being stored
        out = checkpoint_name(
            _conv(self.planes, 1, dtype=self.dtype, name="conv1")(x),
            "bottleneck_conv",
        )
        out = nn.relu(
            _bn(self.dtype, "bn1")(out, use_running_average=use_ra)
        )
        out = checkpoint_name(
            _conv(self.planes, 3, padding=1, dtype=self.dtype, name="conv2")(out),
            "bottleneck_conv",
        )
        out = nn.relu(
            _bn(self.dtype, "bn2")(out, use_running_average=use_ra)
        )
        if self.stride > 1:
            out = avg_pool(out, self.stride)
        # bn3 scale zero-init: residual branches start as identity (reference
        # initialize_parameters, model/clip.py:402-408; overwritten when a
        # pretrained checkpoint is loaded)
        out = checkpoint_name(
            _conv(expansion * self.planes, 1, dtype=self.dtype, name="conv3")(out),
            "bottleneck_conv",
        )
        out = _bn(self.dtype, "bn3", zero_init=True)(
            out, use_running_average=use_ra
        )
        if self.stride > 1 or inplanes != expansion * self.planes:
            identity = x
            if self.stride > 1:
                identity = avg_pool(identity, self.stride)
            identity = checkpoint_name(
                _conv(
                    expansion * self.planes, 1, dtype=self.dtype,
                    name="downsample_conv",
                )(identity),
                "bottleneck_conv",
            )
            identity = _bn(self.dtype, "downsample_bn")(
                identity, use_running_average=use_ra
            )
        else:
            identity = x
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """Spatial attention pooling that keeps the spatial map (reference
    model/clip.py:60-144): q=k=v = features + resized positional embedding,
    global MHA over all positions, plus a conv+BN residual ``connect``."""

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        b, h, w, c = x.shape
        res = _bn(self.dtype, "connect_bn")(
            _conv(self.output_dim, 1, dtype=self.dtype, name="connect_conv")(x),
            use_running_average=not train,
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.embed_dim**-0.5),
            (self.spacial_dim**2 + 1, self.embed_dim),
            jnp.float32,
        )
        # drop the cls row, bicubic-resize the grid part to (h, w)
        grid = pos[1:].reshape(self.spacial_dim, self.spacial_dim, self.embed_dim)
        if (h, w) != (self.spacial_dim, self.spacial_dim):
            grid = resize_bicubic(grid, (h, w), align_corners=False)
        tokens = x.reshape(b, h * w, c) + grid.reshape(1, h * w, c).astype(x.dtype)
        std = self.embed_dim**-0.5  # reference model/clip.py:396-400
        out = MultiHeadAttention(
            num_heads=self.num_heads,
            out_features=self.output_dim,
            qkv_init_std=std,
            out_init_std=std,
            dtype=self.dtype,
            name="attn",
        )(tokens, tokens, tokens)
        out = out.reshape(b, h, w, self.output_dim)
        return nn.relu(out + res)


class ModifiedResNet(nn.Module):
    """Reference model/clip.py:147-223; returns (x2, x3, x4_attnpooled)."""

    layers: Sequence[int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64
    remat: Any = False  # False | True | "selective" (save conv outs only)
    stem_s2d: bool = False  # run the stem in space-to-depth domain (ops/s2d)
    dtype: Any = jnp.float32

    def _stem_plain(self, x, train: bool):
        use_ra = not train
        w = self.width
        x = nn.relu(
            _bn(self.dtype, "bn1")(
                _conv(w // 2, 3, 2, 1, self.dtype, "conv1")(x),
                use_running_average=use_ra,
            )
        )
        x = nn.relu(
            _bn(self.dtype, "bn2")(
                _conv(w // 2, 3, 1, 1, self.dtype, "conv2")(x),
                use_running_average=use_ra,
            )
        )
        x = nn.relu(
            _bn(self.dtype, "bn3")(
                _conv(w, 3, 1, 1, self.dtype, "conv3")(x),
                use_running_average=use_ra,
            )
        )
        return avg_pool(x, 2)

    def _stem_s2d(self, x, train: bool):
        """The same stem computed in space-to-depth domain (see ops/s2d):
        identical parameters, identical tap sums, 4x fewer padded lanes on
        every HBM byte.  Input H,W must be divisible by 4 (416 is).

        CROG_FUSED_STEM=1 (off by default; trace-time constant) runs the
        two stride-1 blocked convs as the gathered-patch Pallas kernel
        (ops/pallas_s2dconv), which drops the blocked kernels' 4x
        structural-zero MXU tax to 1.78x — but MEASURED SLOWER on v5e
        (stem fwd+bwd 11.21 ms vs 7.65 ms at batch 24; per-conv: conv2
        f+b 2.16 vs 2.00, conv3 3.68 vs 2.88): the f32 im2col assembly
        traffic in VMEM (forced by Mosaic's corrupt bf16 offset
        relayouts) costs more than the zeros it removes.  Kept as the
        A/B lever + numeric parity artifact; the XLA zero-embedded conv
        is the production path."""
        from crog_tpu.ops import pallas_s2dconv
        from crog_tpu.ops.s2d import (
            block_kernel_s1,
            block_kernel_s2,
            block_mean,
            space_to_depth,
        )

        w = self.width
        h = w // 2
        conv = partial(
            jax.lax.conv_general_dilated,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            window_strides=(1, 1),
        )
        gather = (
            jax.default_backend() == "tpu"
            and os.environ.get("CROG_FUSED_STEM", "0") == "1"
            and (4 * h) % 128 == 0
            and (4 * w) % 128 == 0
        )
        if gather:
            # k stays fp32: the op packs-and-casts to x.dtype for the MXU
            # and returns the weight grad from its f32 accumulator directly
            conv_s1 = lambda x, k: pallas_s2dconv.blocked_conv3x3_s1(x, k)
        else:
            conv_s1 = lambda x, k: conv(
                x, block_kernel_s1(k).astype(self.dtype),
                padding=((1, 1), (1, 1)),
            )
        k1 = _ConvKernel((3, 3, x.shape[-1], h), name="conv1")()
        k2 = _ConvKernel((3, 3, h, h), name="conv2")()
        k3 = _ConvKernel((3, 3, h, w), name="conv3")()
        bn1 = _BNState(h, name="bn1")
        bn2 = _BNState(h, name="bn2")
        bn3 = _BNState(w, name="bn3")
        x = space_to_depth(x.astype(self.dtype), 4)
        x = conv(
            x, block_kernel_s2(k1).astype(self.dtype),
            padding=((1, 0), (1, 0)),
        )
        x = _blocked_bn_relu(bn1, x, h, train, self.dtype)
        x = conv_s1(x, k2)
        x = _blocked_bn_relu(bn2, x, h, train, self.dtype)
        x = conv_s1(x, k3)
        x = _blocked_bn_relu(bn3, x, w, train, self.dtype)
        return block_mean(x, w)

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        if self.stem_s2d and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
            x = self._stem_s2d(x, train)
        else:
            x = self._stem_plain(x, train)

        if self.remat == "selective":
            # save only conv outputs for the backward pass; the BN+ReLU
            # chains are recomputed from them — the vision backward is
            # bandwidth-bound (17.7 GB/step at batch 24), so trading stored
            # post-BN activations for cheap elementwise recompute cuts its
            # dominant cost
            block_cls = nn.remat(
                Bottleneck,
                static_argnums=(2,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "bottleneck_conv"
                ),
            )
        elif self.remat:
            block_cls = nn.remat(Bottleneck, static_argnums=(2,))
        else:
            block_cls = Bottleneck

        def stage(x, planes, blocks, stride, name):
            x = block_cls(planes, stride, self.dtype, name=f"{name}_0")(x, train)
            for i in range(1, blocks):
                x = block_cls(planes, 1, self.dtype, name=f"{name}_{i}")(x, train)
            return x

        x = stage(x, w, self.layers[0], 1, "layer1")
        x2 = stage(x, w * 2, self.layers[1], 2, "layer2")
        x3 = stage(x2, w * 4, self.layers[2], 2, "layer3")
        x4 = stage(x3, w * 8, self.layers[3], 2, "layer4")
        x4 = AttentionPool2d(
            spacial_dim=self.input_resolution // 32,
            embed_dim=w * 32,
            num_heads=self.heads,
            output_dim=self.output_dim,
            dtype=self.dtype,
            name="attnpool",
        )(x4, train)
        return x2, x3, x4


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block with QuickGELU (reference model/clip.py:239-265).

    ``total_layers`` drives CLIP's depth-scaled initialization (reference
    model/clip.py:410-418); 0 keeps framework-default inits."""

    d_model: int
    n_head: int
    total_layers: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        w = self.d_model
        if self.total_layers > 0:
            attn_std = w**-0.5
            proj_std = (w**-0.5) * ((2 * self.total_layers) ** -0.5)
            fc_init = nn.initializers.normal(stddev=(2 * w) ** -0.5)
            proj_init = nn.initializers.normal(stddev=proj_std)
        else:
            attn_std = proj_std = None
            fc_init = proj_init = nn.linear.default_kernel_init
        y = LayerNormFp32(name="ln_1")(x)
        x = x + MultiHeadAttention(
            num_heads=self.n_head, qkv_init_std=attn_std,
            out_init_std=proj_std, dtype=self.dtype, name="attn",
        )(y, y, y, attn_mask=attn_mask)
        y = LayerNormFp32(name="ln_2")(x)
        y = nn.Dense(
            self.d_model * 4, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=fc_init, name="mlp_c_fc",
        )(y)
        y = quick_gelu(y)
        y = nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=proj_init, name="mlp_c_proj",
        )(y)
        return x + y


class VisionTransformer(nn.Module):
    """CLIP ViT tower (reference model/clip.py:286-332; unused by the shipped
    configs, provided for checkpoint-family completeness).  Returns projected
    per-patch features (the reference's modified variant keeps all patch
    tokens, dropping only the cls token)."""

    input_resolution: int
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(x.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.width)
        scale = self.width**-0.5
        cls_emb = self.param(
            "class_embedding", nn.initializers.normal(scale), (self.width,),
            jnp.float32,
        )
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(scale),
            ((self.input_resolution // self.patch_size) ** 2 + 1, self.width),
            jnp.float32,
        )
        cls = jnp.broadcast_to(
            cls_emb.astype(x.dtype)[None, None], (b, 1, self.width)
        )
        x = jnp.concatenate([cls, x], axis=1) + pos_emb[: gh * gw + 1].astype(
            x.dtype
        )
        x = LayerNormFp32(name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, dtype=self.dtype,
                name=f"resblock_{i}",
            )(x)
        x = LayerNormFp32(name="ln_post")(x[:, 1:, :])
        proj = self.param(
            "proj", nn.initializers.normal(scale),
            (self.width, self.output_dim), jnp.float32,
        )
        return x @ proj.astype(x.dtype)


def causal_mask(length: int) -> jnp.ndarray:
    """Additive causal mask (reference model/clip.py:424-430)."""
    mask = jnp.full((length, length), float("-inf"), jnp.float32)
    return jnp.triu(mask, k=1)


class TextTransformer(nn.Module):
    """Causal text encoder returning per-token features and the projected EOT
    embedding (reference model/clip.py:439-456)."""

    context_length: int
    vocab_size: int
    width: int
    heads: int
    layers: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text):
        # text: [B, L] int32 token ids, zero-padded; EOT has the max id.
        b, l = text.shape
        tok_emb = self.param(
            "token_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.vocab_size, self.width),
            jnp.float32,
        )
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        x = tok_emb[text].astype(self.dtype) + pos_emb[:l].astype(self.dtype)
        mask = causal_mask(l)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, total_layers=self.layers,
                dtype=self.dtype, name=f"resblock_{i}",
            )(x, attn_mask=mask)
        x = LayerNormFp32(name="ln_final")(x).astype(self.dtype)
        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.width**-0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )
        eot = jnp.argmax(text, axis=-1)
        state = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        state = state @ text_projection.astype(self.dtype)
        return x, state


class CLIPRN50(nn.Module):
    """Full dual encoder.  Config fields mirror what build_model infers from a
    torch checkpoint (reference model/clip.py:503-546)."""

    embed_dim: int = 1024
    image_resolution: int = 224
    vision_layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    vision_width: int = 64
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    remat: Any = False
    stem_s2d: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.visual = ModifiedResNet(
            layers=self.vision_layers,
            output_dim=self.embed_dim,
            heads=self.vision_width * 32 // 64,
            input_resolution=self.image_resolution,
            width=self.vision_width,
            remat=self.remat,
            stem_s2d=self.stem_s2d,
            dtype=self.dtype,
            name="visual",
        )
        self.text = TextTransformer(
            context_length=self.context_length,
            vocab_size=self.vocab_size,
            width=self.transformer_width,
            heads=self.transformer_heads,
            layers=self.transformer_layers,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="transformer",
        )

    def encode_image(self, image, train: bool = False):
        return self.visual(image.astype(self.dtype), train)

    def encode_text(self, text):
        return self.text(text)

    def __call__(self, image, text, train: bool = False):
        vis = self.encode_image(image, train)
        word, state = self.encode_text(text)
        return vis, word, state


class CLIPViT(nn.Module):
    """Dual encoder with the ViT vision tower — the checkpoint family the
    reference's build_model also accepts (model/clip.py:506-521).  Vision
    heads follow the reference rule vision_width // 64."""

    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 32
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    dtype: Any = jnp.float32

    def setup(self):
        self.visual = VisionTransformer(
            input_resolution=self.image_resolution,
            patch_size=self.vision_patch_size,
            width=self.vision_width,
            layers=self.vision_layers,
            heads=self.vision_width // 64,
            output_dim=self.embed_dim,
            dtype=self.dtype,
            name="visual",
        )
        self.text = TextTransformer(
            context_length=self.context_length,
            vocab_size=self.vocab_size,
            width=self.transformer_width,
            heads=self.transformer_heads,
            layers=self.transformer_layers,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="transformer",
        )

    def encode_image(self, image, train: bool = False):
        return self.visual(image.astype(self.dtype), train)

    def encode_text(self, text):
        return self.text(text)

    def __call__(self, image, text, train: bool = False):
        vis = self.encode_image(image, train)
        word, state = self.encode_text(text)
        return vis, word, state
