"""Multi-head attention.

Replaces the torch C++ MHA kernel used by the reference (attnpool
model/clip.py:119-139, text blocks model/clip.py:246, decoder
model/layers.py:291-296).  Shapes here are tiny (169/676 visual tokens, 17
text tokens) so a plain einsum formulation fuses well under XLA; logits and
softmax run in fp32 regardless of the compute dtype for numerical parity with
the reference's fp32 softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def _use_fused(lq, lk, attn_mask, key_padding_mask) -> bool:
    """Unmasked self-shaped attention over enough tokens routes to the fused
    Pallas kernel (decoder self-attn over 676 tokens, attnpool over 169); the
    tiny/masked cases (17-token text, cross-attn) stay on the XLA path."""
    return (
        attn_mask is None
        and key_padding_mask is None
        and lq == lk
        and lq >= 64
        and jax.default_backend() == "tpu"
    )


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    attn_mask: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over projected q/k/v.

    q: [B, Lq, D], k/v: [B, Lk, D].
    attn_mask: additive [Lq, Lk] (e.g. causal -inf upper triangle).
    key_padding_mask: [B, Lk] bool, True = ignore that key.
    """
    b, lq, d = q.shape
    lk = k.shape[1]
    dh = d // num_heads
    qh = q.reshape(b, lq, num_heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, num_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, num_heads, dh).transpose(0, 2, 1, 3)

    if _use_fused(lq, lk, attn_mask, key_padding_mask):
        from crog_tpu.ops.pallas_attention import flash_attention_bhld

        out = flash_attention_bhld(qh, kh, vh)
        return out.transpose(0, 2, 1, 3).reshape(b, lq, d)

    scale = dh**-0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32) * scale
    if attn_mask is not None:
        logits = logits + attn_mask.astype(jnp.float32)
    if key_padding_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
    weights = nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, d)


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent with separate q/k/v/out Dense
    layers (converter splits torch's packed in_proj into these).

    ``qkv_init_std`` / ``out_init_std`` reproduce CLIP's deliberate normal
    initializations (reference model/clip.py:390-418); None keeps the flax
    default (used where torch also used its default)."""

    num_heads: int
    out_features: Optional[int] = None
    qkv_init_std: Optional[float] = None
    out_init_std: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,
        key,
        value,
        attn_mask=None,
        key_padding_mask=None,
    ):
        d = query.shape[-1]

        def dense(feats, name, std):
            init = (
                nn.initializers.normal(stddev=std)
                if std is not None
                else nn.linear.default_kernel_init
            )
            return nn.Dense(
                feats, dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=init, name=name,
            )

        q = dense(d, "q_proj", self.qkv_init_std)(query)
        k = dense(d, "k_proj", self.qkv_init_std)(key)
        v = dense(d, "v_proj", self.qkv_init_std)(value)
        out = attention_core(
            q, k, v, self.num_heads, attn_mask, key_padding_mask
        )
        return dense(self.out_features or d, "out_proj", self.out_init_std)(out)
