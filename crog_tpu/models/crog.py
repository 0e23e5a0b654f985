"""CROG: CLIP-based referring grasp synthesis (reference model/crog.py:10-133).

image [B,416,416,3] + word ids [B,17] -> 5 maps at 104x104: instance-mask
logit + grasp quality / sin2theta / cos2theta / width logits.

The flax module is pure inference: it returns raw prediction maps.  Losses
live in ``crog_losses`` as a pure function so the train step composes them
under jit/grad (the reference computed losses inside forward,
model/crog.py:76-111).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from crog_tpu.models.clip import CLIPRN50
from crog_tpu.models.layers import (
    FPN,
    MultiTaskProjector,
    Projector,
    TransformerDecoder,
)
from crog_tpu.ops.resize import resize_nearest


class CROG(nn.Module):
    """Config fields mirror config/OCID-VLG/*.yaml TRAIN keys."""

    word_len: int = 17
    word_dim: int = 1024
    vis_dim: int = 512
    fpn_in: Tuple[int, int, int] = (512, 1024, 1024)
    fpn_out: Tuple[int, int, int] = (256, 512, 1024)
    num_layers: int = 3
    num_head: int = 8
    dim_ffn: int = 2048
    dropout: float = 0.1
    input_resolution: int = 416
    use_contrastive: bool = True  # enables the transformer decoder
    use_grasp_masks: bool = True  # 5-task vs single-mask projector
    intermediate: bool = False  # decoder return_intermediate (unused by cfgs)
    vision_layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    transformer_layers: int = 12
    # backbone geometry beyond the stock RN50 defaults (exposed so converted
    # checkpoints of any CLIP-RN geometry can be loaded; reference
    # model/clip.py:503-536 infers these from the checkpoint)
    vision_width: int = 64
    transformer_width: int = 512
    vocab_size: int = 49408
    clip_resolution: int = 224  # checkpoint pos-embed geometry (resized at use)
    remat: Any = False  # False | True | "selective" (save conv outs only)
    stem_s2d: bool = True  # space-to-depth stem (ops/s2d): same math, packed lanes
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = CLIPRN50(
            embed_dim=self.word_dim,
            image_resolution=self.clip_resolution,  # pos-emb resized at use
            vision_layers=self.vision_layers,
            vision_width=self.vision_width,
            transformer_width=self.transformer_width,
            transformer_heads=self.transformer_width // 64,
            vocab_size=self.vocab_size,
            transformer_layers=self.transformer_layers,
            remat=self.remat,
            stem_s2d=self.stem_s2d,
            dtype=self.dtype,
            name="backbone",
        )
        self.neck = FPN(
            in_channels=tuple(self.fpn_in),
            out_channels=tuple(self.fpn_out),
            dtype=self.dtype,
            name="neck",
        )
        if self.use_contrastive:
            self.decoder = TransformerDecoder(
                num_layers=self.num_layers,
                d_model=self.vis_dim,
                nhead=self.num_head,
                dim_ffn=self.dim_ffn,
                dropout=self.dropout,
                return_intermediate=self.intermediate,
                dtype=self.dtype,
                name="decoder",
            )
        proj_cls = MultiTaskProjector if self.use_grasp_masks else Projector
        self.proj = proj_cls(
            word_dim=self.word_dim,
            in_dim=self.vis_dim // 2,
            kernel_size=3,
            dtype=self.dtype,
            name="proj",
        )

    def __call__(self, img, word, train: bool = False):
        """img: [B,H,W,3] normalized; word: [B,L] int32 padded token ids.

        Returns [B,104,104,5] (or [...,1] without grasp masks) fp32 logits.
        """
        pad_mask = word == 0
        vis = self.backbone.encode_image(img, train)
        word_feat, state = self.backbone.encode_text(word)
        fq = self.neck(vis, state, train)
        if self.use_contrastive:
            fq = self.decoder(fq, word_feat, pad_mask, train)
            if self.intermediate:
                fq = fq[-1]  # projector consumes the final layer's output
        return self.proj(fq, state, train)


def smooth_l1(pred, target, beta: float = 1.0):
    """torch F.smooth_l1_loss, mean reduction."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def weighted_bce_with_logits(logits, targets, weight):
    """torch F.binary_cross_entropy_with_logits(pred, mask, weight=w)."""
    # numerically-stable log-sigmoid formulation
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.mean(loss * weight)


def crog_losses(
    preds: jnp.ndarray, targets: Dict[str, jnp.ndarray], use_grasp_masks: bool = True
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Training losses (reference model/crog.py:76-111): weighted BCE on the
    instance mask (weight = mask*0.5 + 1) + smooth-L1 on qua/sin/cos/wid,
    unweighted sum.  Targets are resized to pred resolution with nearest
    interpolation, matching F.interpolate(mode='nearest')."""
    ph, pw = preds.shape[1:3]
    f32 = lambda x: x.astype(jnp.float32)

    def fit(x):
        x = f32(x)
        if x.shape[1:3] != (ph, pw):
            x = resize_nearest(x[..., None], (ph, pw))[..., 0]
        return x

    mask = fit(targets["mask"])
    pred_mask = f32(preds[..., 0])
    weight = mask * 0.5 + 1.0
    loss_ins = weighted_bce_with_logits(pred_mask, mask, weight)
    loss_dict = {"m_ins": loss_ins}
    total = loss_ins
    if use_grasp_masks:
        for i, key in enumerate(("qua", "sin", "cos", "wid"), start=1):
            l = smooth_l1(f32(preds[..., i]), fit(targets[key]))
            loss_dict[f"m_{key}"] = l
            total = total + l
    else:
        for key in ("qua", "sin", "cos", "wid"):
            loss_dict[f"m_{key}"] = jnp.zeros(())
    return total, loss_dict


def build_crog(cfg) -> Tuple[CROG, Dict]:
    """Construct the model from a flattened CfgNode (reference
    model/__init__.py:6-23 returns (model, param_list); here the param-group
    split for the optimizer is by name prefix, see engine.optim)."""
    model = CROG(
        word_len=cfg.word_len,
        word_dim=cfg.word_dim,
        vis_dim=cfg.vis_dim,
        fpn_in=tuple(cfg.fpn_in),
        fpn_out=tuple(cfg.fpn_out),
        num_layers=cfg.num_layers,
        num_head=cfg.num_head,
        dim_ffn=cfg.dim_ffn,
        dropout=cfg.dropout,
        intermediate=bool(cfg.get("intermediate", False)),
        input_resolution=cfg.input_size,
        use_contrastive=cfg.use_contrastive,
        use_grasp_masks=cfg.use_grasp_masks,
        remat=bool(cfg.get("remat", False)),
        stem_s2d=bool(cfg.get("stem_s2d", True)),
        dtype=jnp.bfloat16 if cfg.get("compute_dtype", "bfloat16") == "bfloat16"
        else jnp.float32,
    )
    return model, {}
