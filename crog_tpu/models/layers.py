"""CROG fusion layers: cross-modal FPN neck, vision-language transformer
decoder, and the language-conditioned projectors.

Parity targets (reference model/layers.py): FPN :342-398, TransformerDecoder
:176-339, MultiTaskProjector :47-132, Projector :135-173, CoordConv :19-44.
All modules are NHWC, bf16-compute capable, with fp32 LayerNorm/softmax.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache
from typing import Any

import numpy as np

import jax.numpy as jnp
import flax.linen as nn

from crog_tpu.models.clip import LayerNormFp32, _bn, _conv
from crog_tpu.ops.attention import MultiHeadAttention
from crog_tpu.ops.dynconv import dynamic_group_conv_fused
from crog_tpu.ops.resize import upsample2x_bilinear


class _DenseParams(nn.Module):
    """Parameter shell with nn.Dense's exact tree ({'kernel','bias'})."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init, (self.din, self.dout),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.dout,), jnp.float32
        )
        return kernel, bias


class _LNParams(nn.Module):
    """Inner parameter shell ({'scale','bias'}, nn.LayerNorm layout)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return scale, bias


class _LNShell(nn.Module):
    """Parameter shell matching LayerNormFp32's tree
    (<name>/LayerNorm_0/{scale,bias})."""

    features: int

    @nn.compact
    def __call__(self):
        return _LNParams(self.features, name="LayerNorm_0")()


class _Conv1x1Params(nn.Module):
    """Parameter shell with nn.Conv's exact tree ({'kernel','bias'}, same
    shapes/inits) for a 1x1 conv whose application is algebraically folded
    into a neighboring op (checkpoints stay interchangeable)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init,
            (1, 1, self.in_features, self.out_features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_features,), jnp.float32
        )
        return kernel, bias


class _MHAParams(nn.Module):
    """Parameter shell matching MultiHeadAttention's tree
    (<name>/{q_proj,k_proj,v_proj,out_proj}/{kernel,bias}) for attention
    blocks whose application runs inside a fused Pallas kernel."""

    features: int

    @nn.compact
    def __call__(self):
        out = []
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            out.extend(_DenseParams(self.features, self.features, name=proj)())
        return tuple(out)


class ConvBnRelu(nn.Module):
    """conv_layer helper (reference model/layers.py:8-12): bias-free conv +
    BN + ReLU."""

    features: int
    kernel: int = 1
    padding: int = 0
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = _conv(
            self.features, self.kernel, self.stride, self.padding, self.dtype,
            "conv",
        )(x)
        x = _bn(self.dtype, "bn")(x, use_running_average=not train)
        return nn.relu(x)


class LinearBnRelu(nn.Module):
    """linear_layer helper (reference model/layers.py:14-16)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(
            self.features, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="linear",
        )(x)
        x = _bn(self.dtype, "bn")(x, use_running_average=not train)
        return nn.relu(x)


class CoordConv(nn.Module):
    """Append normalized xy grids then conv (reference model/layers.py:19-44)."""

    features: int
    kernel: int = 3
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        b, h, w, _ = x.shape
        xr = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)
        yr = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(yr, xr, indexing="ij")
        coord = jnp.broadcast_to(
            jnp.stack([gx, gy], axis=-1)[None], (b, h, w, 2)
        ).astype(x.dtype)
        x = jnp.concatenate([x, coord], axis=-1)
        return ConvBnRelu(
            self.features, self.kernel, self.padding, dtype=self.dtype,
            name="conv1",
        )(x, train)


class FPN(nn.Module):
    """Cross-modal FPN (reference model/layers.py:342-398).

    Fuses v3 [B,52,52,512], v4 [B,26,26,1024], v5 [B,13,13,1024] with the text
    state [B,1024]: text-gated f5, top-down concat fusion, 3-way aggregation,
    CoordConv.  Output fq [B,26,26,512].
    """

    in_channels: tuple = (512, 1024, 1024)
    out_channels: tuple = (256, 512, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs, state, train: bool):
        v3, v4, v5 = imgs
        c3, c4, c5 = self.out_channels
        # fusion 1
        s = LinearBnRelu(c5, self.dtype, name="txt_proj")(state, train)
        f5 = ConvBnRelu(c5, 1, 0, dtype=self.dtype, name="f1_v_proj")(v5, train)
        f5 = f5 * s[:, None, None, :]
        f5 = nn.relu(
            _bn(self.dtype, "norm_layer_bn")(f5, use_running_average=not train)
        )
        # fusion 2
        f4 = ConvBnRelu(c4, 3, 1, dtype=self.dtype, name="f2_v_proj")(v4, train)
        f5_up = upsample2x_bilinear(f5)
        f4 = ConvBnRelu(c4, 1, 0, dtype=self.dtype, name="f2_cat")(
            jnp.concatenate([f4, f5_up], axis=-1), train
        )
        # fusion 3
        f3 = ConvBnRelu(c3, 3, 1, dtype=self.dtype, name="f3_v_proj")(v3, train)
        f3 = nn.avg_pool(f3, (2, 2), strides=(2, 2))
        f3 = ConvBnRelu(c4, 1, 0, dtype=self.dtype, name="f3_cat")(
            jnp.concatenate([f3, f4], axis=-1), train
        )
        # fusion 4 + aggregation
        fq5 = ConvBnRelu(c4, 3, 1, dtype=self.dtype, name="f4_proj5")(f5, train)
        fq4 = ConvBnRelu(c4, 3, 1, dtype=self.dtype, name="f4_proj4")(f4, train)
        fq3 = ConvBnRelu(c4, 3, 1, dtype=self.dtype, name="f4_proj3")(f3, train)
        fq5 = upsample2x_bilinear(fq5)
        fq = jnp.concatenate([fq3, fq4, fq5], axis=-1)
        fq = ConvBnRelu(c4, 1, 0, dtype=self.dtype, name="aggr")(fq, train)
        fq = CoordConv(c4, 3, 1, dtype=self.dtype, name="coordconv_0")(fq, train)
        fq = ConvBnRelu(c4, 3, 1, dtype=self.dtype, name="coordconv_1")(fq, train)
        return fq


@lru_cache(maxsize=None)
def _pos1d(d_model: int, length: int) -> np.ndarray:
    """Fixed 1-D sin/cos encoding (reference model/layers.py:195-212)."""
    pe = np.zeros((length, d_model), np.float32)
    position = np.arange(length)[:, None].astype(np.float64)
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


@lru_cache(maxsize=None)
def _pos2d(d_model: int, height: int, width: int) -> np.ndarray:
    """Fixed 2-D sin/cos encoding, returned as [H*W, d_model] (reference
    model/layers.py:214-241)."""
    if d_model % 4 != 0:
        raise ValueError(f"d_model must be divisible by 4, got {d_model}")
    pe = np.zeros((d_model, height, width), np.float32)
    half = d_model // 2
    div_term = np.exp(
        np.arange(0.0, half, 2, dtype=np.float64) * -(math.log(10000.0) / half)
    )
    pos_w = np.arange(0.0, width)[:, None].astype(np.float64)
    pos_h = np.arange(0.0, height)[:, None].astype(np.float64)
    sw = np.sin(pos_w * div_term).T  # (half/2, W)
    cw = np.cos(pos_w * div_term).T
    sh = np.sin(pos_h * div_term).T  # (half/2, H)
    ch = np.cos(pos_h * div_term).T
    pe[0:half:2, :, :] = np.repeat(sw[:, None, :], height, axis=1)
    pe[1:half:2, :, :] = np.repeat(cw[:, None, :], height, axis=1)
    pe[half::2, :, :] = np.repeat(sh[:, :, None], width, axis=2)
    pe[half + 1 :: 2, :, :] = np.repeat(ch[:, :, None], width, axis=2)
    return pe.reshape(d_model, height * width).T


class TransformerDecoderLayer(nn.Module):
    """Pre-LN self-attn / cross-attn / FFN layer (reference
    model/layers.py:280-339)."""

    d_model: int = 512
    nhead: int = 8
    dim_ffn: int = 2048
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vis, txt, vis_pos, txt_pos, pad_mask, train: bool):
        import jax as _jax

        drop = lambda name: nn.Dropout(self.dropout, deterministic=not train)
        can_fuse = (
            _jax.default_backend() == "tpu"
            and self.d_model % 128 == 0
            and self.dim_ffn % 128 == 0
        )
        # CROG_FUSED_DECODER=0 keeps the fused FFN but runs the attention
        # blocks on plain XLA (A/B lever; trace-time constant)
        fuse = can_fuse and os.environ.get("CROG_FUSED_DECODER", "1") != "0"
        use_drop = train and self.dropout > 0.0

        def _seed():
            if use_drop:
                return _jax.random.bits(
                    self.make_rng("dropout"), (), "uint32"
                ).astype(jnp.int32)
            return jnp.zeros((), jnp.int32)

        if fuse:
            # each attention block — pre-LN, q/k/v projections, all-head
            # attention, out projection, post-LN, dropout, residual — runs
            # as ONE Pallas kernel per sample (ops/pallas_decoder): the
            # [B, 676, 512] activation is read once and written once
            # instead of round-tripping HBM at every stage.
            from crog_tpu.ops.pallas_decoder import (
                decoder_cross_block,
                decoder_self_block,
            )

            d = self.d_model
            sa = _MHAParams(d, name="self_attn")()
            g1, be1 = _LNShell(d, name="norm1")()
            gs, bs = _LNShell(d, name="self_attn_norm")()
            vis = decoder_self_block(
                vis, vis_pos[0], *sa, g1, be1, gs, bs,
                _seed(), self.nhead, float(self.dropout), use_drop,
            )
            ca = _MHAParams(d, name="multihead_attn")()
            g2, be2 = _LNShell(d, name="norm2")()
            gc, bc = _LNShell(d, name="cross_attn_norm")()
            vis = decoder_cross_block(
                vis, txt, vis_pos[0], txt_pos[0], pad_mask,
                *ca, g2, be2, gc, bc,
                _seed(), self.nhead, float(self.dropout), use_drop,
            )
        else:
            # self-attention over visual tokens
            v2 = LayerNormFp32(name="norm1")(vis)
            q = k = v2 + vis_pos.astype(v2.dtype)
            v2 = MultiHeadAttention(
                self.nhead, dtype=self.dtype, name="self_attn"
            )(q, k, v2)
            v2 = LayerNormFp32(name="self_attn_norm")(v2)
            vis = vis + drop("d1")(v2)
            # cross-attention to text
            v2 = LayerNormFp32(name="norm2")(vis)
            v2 = MultiHeadAttention(
                self.nhead, dtype=self.dtype, name="multihead_attn"
            )(
                v2 + vis_pos.astype(v2.dtype),
                txt + txt_pos.astype(txt.dtype),
                txt,
                key_padding_mask=pad_mask,
            )
            v2 = LayerNormFp32(name="cross_attn_norm")(v2)
            vis = vis + drop("d2")(v2)
        # FFN: Dense -> ReLU -> Dropout -> LayerNorm -> Dense.  Every stage
        # is per-token, so on TPU the whole chain runs as ONE Pallas kernel
        # with the [*, dim_ffn] hidden resident in VMEM (ops/pallas_ffn) —
        # ~10 ms/step of HBM round-trips under plain XLA at batch 24.
        v2 = LayerNormFp32(name="norm3")(vis)
        fuse_ffn = can_fuse
        if fuse_ffn:
            from crog_tpu.ops.pallas_ffn import fused_ffn

            w1, b1 = _DenseParams(self.d_model, self.dim_ffn, name="ffn_fc1")()
            gamma, beta = _LNShell(self.dim_ffn, name="ffn_ln")()
            w2, b2 = _DenseParams(self.dim_ffn, self.d_model, name="ffn_fc2")()
            use_drop = train and self.dropout > 0.0
            if use_drop:
                seed = _jax.random.bits(
                    self.make_rng("dropout"), (), "uint32"
                ).astype(jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            b, l, c = v2.shape
            y = fused_ffn(
                v2.reshape(b * l, c).astype(self.dtype),
                w1.astype(self.dtype), b1, gamma, beta,
                w2.astype(self.dtype), b2, seed,
                float(self.dropout), bool(use_drop),
            )
            v2 = y.reshape(b, l, c)
        else:
            v2 = nn.Dense(
                self.dim_ffn, dtype=self.dtype, param_dtype=jnp.float32,
                name="ffn_fc1",
            )(v2)
            v2 = drop("dffn")(nn.relu(v2))
            v2 = LayerNormFp32(name="ffn_ln")(v2)
            v2 = nn.Dense(
                self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                name="ffn_fc2",
            )(v2)
        vis = vis + drop("d3")(v2)
        return vis


class TransformerDecoder(nn.Module):
    """Stack of decoder layers with fixed sin/cos positions (reference
    model/layers.py:176-277).  Input fq [B,H,W,C], word [B,L,C], pad [B,L];
    output [B,H,W,C]."""

    num_layers: int
    d_model: int
    nhead: int
    dim_ffn: int
    dropout: float
    return_intermediate: bool = False  # cfg `intermediate` (unused by the
    # shipped configs; reference model/layers.py:259-273 returned a list of
    # per-layer normed outputs — here stacked on a leading axis)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vis, txt, pad_mask, train: bool):
        b, h, w, c = vis.shape
        l = txt.shape[1]
        vis_pos = jnp.asarray(_pos2d(c, h, w))[None]  # [1, HW, C]
        txt_pos = jnp.asarray(_pos1d(txt.shape[-1], l))[None]  # [1, L, C]
        x = vis.reshape(b, h * w, c)
        norm = LayerNormFp32(name="norm")
        intermediate = []
        for i in range(self.num_layers):
            x = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_ffn, self.dropout,
                self.dtype, name=f"layer_{i}",
            )(x, txt, vis_pos, txt_pos, pad_mask, train)
            if self.return_intermediate:
                intermediate.append(norm(x).reshape(b, h, w, c))
        out = norm(x).reshape(b, h, w, c)
        if self.return_intermediate:
            intermediate[-1] = out
            return jnp.stack(intermediate, axis=0)
        return out


class MultiTaskProjector(nn.Module):
    """Decode fq to 5 task maps via language-conditioned dynamic conv
    (reference model/layers.py:47-132).

    fq [B,26,26,512] -> vis tower -> [B,104,104,5*256]; text state generates a
    per-sample 3x3x256 kernel + bias applied to all 5 chunks (one grouped conv
    on TPU).  Returns [B,104,104,5] (mask, qua, sin, cos, wid logits).
    """

    word_dim: int = 1024
    in_dim: int = 256
    kernel_size: int = 3
    num_tasks: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, word, train: bool):
        c = self.in_dim
        x = upsample2x_bilinear(x)
        x = ConvBnRelu(c * 2, 3, 1, dtype=self.dtype, name="vis_conv1")(x, train)
        x = upsample2x_bilinear(x)
        x = ConvBnRelu(c, 3, 1, dtype=self.dtype, name="vis_conv2")(x, train)
        # vis_out parameter shell (same tree as the nn.Conv it replaces);
        # the 1x1 conv itself is algebraically folded into the dynamic conv
        # (ops/dynconv.dynamic_group_conv_fused)
        vk = _Conv1x1Params(
            x.shape[-1], c * self.num_tasks, name="vis_out"
        )()
        # text -> per-sample kernel + bias
        w = nn.Dense(
            c * self.kernel_size**2 + 1, dtype=self.dtype,
            param_dtype=jnp.float32, name="txt",
        )(word)
        weight, bias = w[:, :-1], w[:, -1]
        b = weight.shape[0]
        weight = weight.reshape(b, c, self.kernel_size, self.kernel_size)
        # channel order: torch splits (B, 5C) chunks; our NHWC channel axis is
        # laid out identically ([task, C] blocks) by vis_out's output order.
        # Stays in compute dtype until the f32-accumulating tap einsum (the
        # reference ran this conv under fp16 autocast).
        return dynamic_group_conv_fused(
            x, vk[0], vk[1], weight, bias.astype(jnp.float32), self.num_tasks
        )


class Projector(MultiTaskProjector):
    """Single-mask variant (reference model/layers.py:135-173)."""

    num_tasks: int = 1
