"""torch CLIP checkpoint -> flax parameter pytree.

The reference builds its backbone by introspecting a torch.jit CLIP archive's
state_dict and loading it non-strictly (model/clip.py:503-556, model/crog.py:20-23).
This module reproduces that: ``infer_clip_config`` derives the architecture
from checkpoint keys (both the ResNet and ViT families, reference
model/clip.py:506-530), ``convert_clip_state_dict`` lays every tensor into
the flax param/batch_stats tree of ``CLIPRN50`` / ``CLIPViT``, and
``build_clip`` instantiates the matching model class.  Loading is
deliberately non-strict in the same way: keys absent from the checkpoint keep
their fresh initialization (``use_pretrained_clip=False`` skips loading
entirely — ablation parity with crog_multiple_r50_wo_clip.yaml).

Layout conversions: torch conv (O, I, kH, kW) -> flax (kH, kW, I, O); torch
linear (O, I) -> flax (I, O); packed MHA in_proj (3D, D) -> separate q/k/v.
All tensors are cast to fp32 (checkpoints store fp16).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch.jit archive or plain state-dict checkpoint as numpy."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    return {
        k: v.float().numpy()
        for k, v in sd.items()
        if hasattr(v, "numpy")
    }


def infer_clip_config(sd: Dict[str, np.ndarray]) -> Dict:
    """Architecture hyperparameters from checkpoint keys (reference
    model/clip.py:503-542, both the ViT and ResNet branches).  The returned
    dict carries a ``vision_arch`` discriminator ('resnet' | 'vit') consumed
    by ``build_clip``; the remaining keys are the model constructor fields.
    """
    common = dict(
        embed_dim=sd["text_projection"].shape[1],
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len(
            set(
                k.split(".")[2]
                for k in sd
                if k.startswith("transformer.resblocks")
            )
        ),
    )
    if "visual.proj" in sd:  # ViT branch (reference :506-516)
        patch = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        return dict(
            vision_arch="vit",
            image_resolution=patch * grid,
            vision_layers=len(
                set(
                    k.split(".")[3]
                    for k in sd
                    if k.startswith("visual.transformer.resblocks")
                )
            ),
            vision_width=sd["visual.conv1.weight"].shape[0],
            vision_patch_size=patch,
            **common,
        )
    assert "visual.layer1.0.conv1.weight" in sd, "unrecognized CLIP family"
    counts = [
        len(
            set(
                k.split(".")[2]
                for k in sd
                if k.startswith(f"visual.layer{b}")
            )
        )
        for b in (1, 2, 3, 4)
    ]
    vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
    output_width = round(
        (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5
    )
    return dict(
        vision_arch="resnet",
        image_resolution=output_width * 32,
        vision_layers=tuple(counts),
        vision_width=vision_width,
        **common,
    )


def build_clip(cfg: Dict, dtype=None):
    """Instantiate the flax CLIP matching an inferred config (reference
    build_model's class dispatch, model/clip.py:540-546)."""
    import jax.numpy as jnp

    from crog_tpu.models.clip import CLIPRN50, CLIPViT

    cfg = dict(cfg)
    arch = cfg.pop("vision_arch", "resnet")
    cls = CLIPViT if arch == "vit" else CLIPRN50
    return cls(dtype=dtype or jnp.float32, **cfg)


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, np.float32)


def _conv_kernel(w):  # (O, I, kH, kW) -> (kH, kW, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def _dense(params: dict, prefix: Tuple[str, ...], w, b=None):
    _set(params, prefix + ("kernel",), np.transpose(w))
    if b is not None:
        _set(params, prefix + ("bias",), b)


def _bn_map(sd, params, stats, src_prefix: str, dst: Tuple[str, ...]):
    """torch BatchNorm1d/2d -> flax BatchNorm params + batch_stats."""
    _set(params, dst + ("scale",), sd[f"{src_prefix}.weight"])
    _set(params, dst + ("bias",), sd[f"{src_prefix}.bias"])
    _set(stats, dst + ("mean",), sd[f"{src_prefix}.running_mean"])
    _set(stats, dst + ("var",), sd[f"{src_prefix}.running_var"])


def _ln_map(sd, params, src_prefix: str, dst: Tuple[str, ...]):
    """torch LayerNorm -> LayerNormFp32's tree (<dst>/LayerNorm_0/...)."""
    _set(params, dst + ("LayerNorm_0", "scale"), sd[f"{src_prefix}.weight"])
    _set(params, dst + ("LayerNorm_0", "bias"), sd[f"{src_prefix}.bias"])


def _mha_map(sd, params, src_prefix: str, dst: Tuple[str, ...]):
    """torch nn.MultiheadAttention (packed in_proj) or separate q/k/v
    linears -> MultiHeadAttention's q/k/v/out_proj dense tree."""
    if f"{src_prefix}.in_proj_weight" in sd:
        w = sd[f"{src_prefix}.in_proj_weight"]
        b = sd[f"{src_prefix}.in_proj_bias"]
        d = w.shape[1]
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _dense(
                params, dst + (name,),
                w[i * d : (i + 1) * d], b[i * d : (i + 1) * d],
            )
    else:
        for name in ("q_proj", "k_proj", "v_proj"):
            _dense(
                params,
                dst + (name,),
                sd[f"{src_prefix}.{name}.weight"],
                sd.get(f"{src_prefix}.{name}.bias"),
            )
    out_key = (
        f"{src_prefix}.out_proj"
        if f"{src_prefix}.out_proj.weight" in sd
        else f"{src_prefix}.c_proj"
    )
    _dense(
        params, dst + ("out_proj",), sd[f"{out_key}.weight"],
        sd.get(f"{out_key}.bias"),
    )


def convert_clip_state_dict(
    sd: Dict[str, np.ndarray],
) -> Tuple[dict, dict]:
    """Returns (params, batch_stats) subtrees for CLIPRN50 (module names
    'visual' and 'transformer')."""
    params: dict = {}
    stats: dict = {}

    def bn(src_prefix: str, dst: Tuple[str, ...]):
        _bn_map(sd, params, stats, src_prefix, dst)

    def mha(src_prefix: str, dst: Tuple[str, ...]):
        _mha_map(sd, params, src_prefix, dst)

    def ln(src_prefix: str, dst: Tuple[str, ...]):
        # LayerNormFp32 wraps an anonymous nn.LayerNorm child
        _ln_map(sd, params, src_prefix, dst)

    def text_tower():
        tr = ("transformer",)
        _set(params, tr + ("token_embedding",), sd["token_embedding.weight"])
        _set(params, tr + ("positional_embedding",), sd["positional_embedding"])
        _set(params, tr + ("text_projection",), sd["text_projection"])
        ln("ln_final", tr + ("ln_final",))
        n_blocks = len(
            set(k.split(".")[2] for k in sd
                if k.startswith("transformer.resblocks"))
        )
        for i in range(n_blocks):
            src = f"transformer.resblocks.{i}"
            dst = tr + (f"resblock_{i}",)
            mha(f"{src}.attn", dst + ("attn",))
            ln(f"{src}.ln_1", dst + ("ln_1",))
            ln(f"{src}.ln_2", dst + ("ln_2",))
            _dense(
                params, dst + ("mlp_c_fc",),
                sd[f"{src}.mlp.c_fc.weight"], sd[f"{src}.mlp.c_fc.bias"],
            )
            _dense(
                params, dst + ("mlp_c_proj",),
                sd[f"{src}.mlp.c_proj.weight"], sd[f"{src}.mlp.c_proj.bias"],
            )

    if "visual.proj" in sd:
        # ---- ViT vision tower (reference model/clip.py:506-521) ----
        vi = ("visual",)
        _set(params, vi + ("conv1", "kernel"),
             _conv_kernel(sd["visual.conv1.weight"]))
        _set(params, vi + ("class_embedding",), sd["visual.class_embedding"])
        _set(params, vi + ("positional_embedding",),
             sd["visual.positional_embedding"])
        _set(params, vi + ("proj",), sd["visual.proj"])
        ln("visual.ln_pre", vi + ("ln_pre",))
        ln("visual.ln_post", vi + ("ln_post",))
        n_blocks = len(
            set(k.split(".")[3] for k in sd
                if k.startswith("visual.transformer.resblocks"))
        )
        for i in range(n_blocks):
            src = f"visual.transformer.resblocks.{i}"
            dst = vi + (f"resblock_{i}",)
            mha(f"{src}.attn", dst + ("attn",))
            ln(f"{src}.ln_1", dst + ("ln_1",))
            ln(f"{src}.ln_2", dst + ("ln_2",))
            _dense(
                params, dst + ("mlp_c_fc",),
                sd[f"{src}.mlp.c_fc.weight"], sd[f"{src}.mlp.c_fc.bias"],
            )
            _dense(
                params, dst + ("mlp_c_proj",),
                sd[f"{src}.mlp.c_proj.weight"], sd[f"{src}.mlp.c_proj.bias"],
            )
        text_tower()
        return params, stats

    # ---- vision stem ----
    for i in (1, 2, 3):
        _set(
            params,
            ("visual", f"conv{i}", "kernel"),
            _conv_kernel(sd[f"visual.conv{i}.weight"]),
        )
        bn(f"visual.bn{i}", ("visual", f"bn{i}"))

    # ---- residual stages ----
    block_re = re.compile(r"visual\.layer(\d)\.(\d+)\.conv1\.weight")
    blocks = sorted(
        {(int(m.group(1)), int(m.group(2)))
         for k in sd if (m := block_re.match(k))}
    )
    for layer, idx in blocks:
        src = f"visual.layer{layer}.{idx}"
        dst = ("visual", f"layer{layer}_{idx}")
        for i in (1, 2, 3):
            _set(
                params,
                dst + (f"conv{i}", "kernel"),
                _conv_kernel(sd[f"{src}.conv{i}.weight"]),
            )
            bn(f"{src}.bn{i}", dst + (f"bn{i}",))
        if f"{src}.downsample.0.weight" in sd:
            _set(
                params,
                dst + ("downsample_conv", "kernel"),
                _conv_kernel(sd[f"{src}.downsample.0.weight"]),
            )
            bn(f"{src}.downsample.1", dst + ("downsample_bn",))

    # ---- attention pool ----
    ap = ("visual", "attnpool")
    _set(
        params,
        ap + ("positional_embedding",),
        sd["visual.attnpool.positional_embedding"],
    )
    mha("visual.attnpool", ap + ("attn",))
    # the residual `connect` branch is a CROG addition to CLIP (reference
    # model/clip.py:76-78); stock OpenAI checkpoints don't carry it and the
    # reference loads with strict=False (model/clip.py:554) leaving it at
    # fresh init — reproduce exactly that when the keys are absent
    if "visual.attnpool.connect.0.weight" in sd:
        _set(
            params,
            ap + ("connect_conv", "kernel"),
            _conv_kernel(sd["visual.attnpool.connect.0.weight"]),
        )
        bn("visual.attnpool.connect.1", ap + ("connect_bn",))

    # ---- text tower ----
    text_tower()
    return params, stats


def merge_pretrained_clip(variables: dict, params: dict, stats: dict) -> dict:
    """Non-strict merge of converted CLIP tensors into a freshly-initialized
    CROG variable tree (backbone submodule), preserving everything else."""
    import jax

    var = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy

    def deep_merge(dst: dict, src: dict, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                deep_merge(dst.setdefault(k, {}), v, f"{path}/{k}")
            else:
                if k in dst and tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{dst[k].shape} vs {v.shape}"
                    )
                dst[k] = v.astype(dst[k].dtype) if k in dst else v

    var = jax.tree_util.tree_map(lambda x: x, var)
    import flax

    var = flax.core.unfreeze(var) if hasattr(flax.core, "unfreeze") else var
    deep_merge(var["params"]["backbone"], params)
    deep_merge(var.setdefault("batch_stats", {}).setdefault("backbone", {}), stats)
    return var


class _RecordingDict(dict):
    """dict that records which keys were read — used to prove a checkpoint
    conversion consumed every tensor (the reference loads trained CROG
    checkpoints strictly, test_crog.py:79)."""

    def __init__(self, base):
        super().__init__(base)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if super().__contains__(k):
            return self[k]
        return default


class _PrefixView:
    """Read-through view of a _RecordingDict under a key prefix, so the CLIP
    converter can consume `backbone.`-prefixed keys while usage is recorded
    on the parent."""

    def __init__(self, base: _RecordingDict, prefix: str):
        self._base = base
        self._prefix = prefix

    def __getitem__(self, k):
        return self._base[self._prefix + k]

    def __contains__(self, k):
        return (self._prefix + k) in self._base

    def get(self, k, default=None):
        return self._base.get(self._prefix + k, default)

    def __iter__(self):
        n = len(self._prefix)
        return (k[n:] for k in self._base if k.startswith(self._prefix))


def convert_crog_state_dict(
    sd: Dict[str, np.ndarray], strict: bool = True
) -> Tuple[dict, dict]:
    """Full trained-CROG checkpoint -> (params, batch_stats) for
    ``models.crog.CROG`` — the day-one migration path for checkpoints trained
    with the reference (its exp/.../best_model.pth carries
    {'state_dict': model.state_dict()} from the DDP/DataParallel-wrapped
    model, train_crog.py:236-247, loaded strictly by test_crog.py:73-79).

    Key schema converted (reference module names):
      backbone.*   CLIP dual encoder        -> convert_clip_state_dict
      neck.*       cross-modal FPN          (model/layers.py:342-398)
      decoder.*    VL transformer decoder   (model/layers.py:176-339)
      proj.*       (MultiTask)Projector     (model/layers.py:47-173)

    ``strict=True`` raises if any checkpoint tensor was not consumed (after
    ignoring torch bookkeeping: num_batches_tracked, logit_scale, the jit
    archive's input_resolution/context_length/vocab_size scalars) — exactly
    the guarantee torch's strict load gives the reference.
    """
    sd = _RecordingDict(
        {
            (k[len("module.") :] if k.startswith("module.") else k): np.asarray(v)
            for k, v in sd.items()
        }
    )

    clip_view = _PrefixView(sd, "backbone.")
    params, stats = convert_clip_state_dict(clip_view)
    params, stats = {"backbone": params}, {"backbone": stats}

    def bn(src, dst):
        _bn_map(sd, params, stats, src, dst)

    def ln(src, dst):
        _ln_map(sd, params, src, dst)

    def cbr(src, dst):
        """conv_layer Sequential (.0 Conv2d bias-free, .1 BatchNorm2d) ->
        ConvBnRelu {conv, bn} (reference model/layers.py:8-12)."""
        _set(params, dst + ("conv", "kernel"), _conv_kernel(sd[f"{src}.0.weight"]))
        bn(f"{src}.1", dst + ("bn",))

    # ---- neck: cross-modal FPN ----
    nk = ("neck",)
    # txt_proj is linear_layer: .0 Linear(bias=False), .1 BatchNorm1d
    _dense(params, nk + ("txt_proj", "linear"), sd["neck.txt_proj.0.weight"])
    bn("neck.txt_proj.1", nk + ("txt_proj", "bn"))
    for name in (
        "f1_v_proj", "f2_v_proj", "f2_cat", "f3_v_proj", "f3_cat",
        "f4_proj5", "f4_proj4", "f4_proj3", "aggr",
    ):
        cbr(f"neck.{name}", nk + (name,))
    bn("neck.norm_layer.0", nk + ("norm_layer_bn",))
    cbr("neck.coordconv.0.conv1", nk + ("coordconv_0", "conv1"))
    cbr("neck.coordconv.1", nk + ("coordconv_1",))

    # ---- decoder (absent when use_contrastive=False) ----
    dec_layers = sorted(
        {int(k.split(".")[2]) for k in sd if k.startswith("decoder.layers.")}
    )
    for i in dec_layers:
        src = f"decoder.layers.{i}"
        dst = ("decoder", f"layer_{i}")
        for lname in (
            "norm1", "norm2", "norm3", "self_attn_norm", "cross_attn_norm",
        ):
            ln(f"{src}.{lname}", dst + (lname,))
        _mha_map(sd, params, f"{src}.self_attn", dst + ("self_attn",))
        _mha_map(sd, params, f"{src}.multihead_attn", dst + ("multihead_attn",))
        # ffn Sequential: .0 Linear, .3 LayerNorm, .4 Linear
        _dense(
            params, dst + ("ffn_fc1",),
            sd[f"{src}.ffn.0.weight"], sd[f"{src}.ffn.0.bias"],
        )
        ln(f"{src}.ffn.3", dst + ("ffn_ln",))
        _dense(
            params, dst + ("ffn_fc2",),
            sd[f"{src}.ffn.4.weight"], sd[f"{src}.ffn.4.bias"],
        )
    if dec_layers:
        ln("decoder.norm", ("decoder", "norm"))

    # ---- projector (vis Sequential: 1/3 conv_layer, 4 Conv2d-with-bias) ----
    pj = ("proj",)
    cbr("proj.vis.1", pj + ("vis_conv1",))
    cbr("proj.vis.3", pj + ("vis_conv2",))
    _set(params, pj + ("vis_out", "kernel"), _conv_kernel(sd["proj.vis.4.weight"]))
    _set(params, pj + ("vis_out", "bias"), sd["proj.vis.4.bias"])
    _dense(params, pj + ("txt",), sd["proj.txt.weight"], sd["proj.txt.bias"])

    ignorable = (
        "num_batches_tracked", "logit_scale",
        "input_resolution", "context_length", "vocab_size",
    )
    leftover = sorted(
        k for k in sd
        if k not in sd.used and not k.endswith(ignorable)
    )
    if strict and leftover:
        raise ValueError(
            f"{len(leftover)} checkpoint tensors were not consumed by the "
            f"conversion (schema drift?): {leftover[:8]}..."
        )
    return params, stats


def merge_trained_crog(variables: dict, params: dict, stats: dict) -> dict:
    """Strict full-tree merge of a converted trained-CROG checkpoint into a
    freshly-initialized CROG variable tree: every converted tensor must land
    on an existing leaf with the same shape (torch strict-load semantics,
    reference test_crog.py:79)."""
    import jax
    import flax

    var = jax.tree_util.tree_map(lambda x: x, variables)
    var = flax.core.unfreeze(var) if hasattr(flax.core, "unfreeze") else var

    def deep_merge(dst: dict, src: dict, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst:
                    raise ValueError(f"checkpoint has unknown module {path}/{k}")
                deep_merge(dst[k], v, f"{path}/{k}")
            else:
                if k not in dst:
                    raise ValueError(f"checkpoint has unknown tensor {path}/{k}")
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{dst[k].shape} vs {v.shape}"
                    )
                dst[k] = v.astype(dst[k].dtype)

    deep_merge(var["params"], params, "params")
    deep_merge(var["batch_stats"], stats, "batch_stats")
    return var


def convert_ssg_state_dict(
    sd: Dict[str, np.ndarray], strict: bool = True
) -> Tuple[dict, dict]:
    """Trained reference SSG checkpoint -> (params, batch_stats) for
    ``models.ssg.SSG`` (reference model/ssg.py:208-245; torchvision-style
    ResNet :53-114, FPN :172-205, ProtoNet :150-169, PredictionModule
    :117-147).  Same strict-consumption contract as convert_crog_state_dict.
    """
    sd = _RecordingDict(
        {
            (k[len("module.") :] if k.startswith("module.") else k): np.asarray(v)
            for k, v in sd.items()
        }
    )
    params: dict = {}
    stats: dict = {}

    def conv(src, dst, bias=True):
        _set(params, dst + ("kernel",), _conv_kernel(sd[f"{src}.weight"]))
        if bias and f"{src}.bias" in sd:
            _set(params, dst + ("bias",), sd[f"{src}.bias"])

    def bn(src, dst):
        _bn_map(sd, params, stats, src, dst)

    # ---- backbone: torchvision ResNet with stages in a ModuleList ----
    bb = ("backbone",)
    conv("backbone.conv1", bb + ("conv1",), bias=False)
    bn("backbone.bn1", bb + ("bn1",))
    block_re = re.compile(r"backbone\.layers\.(\d+)\.(\d+)\.conv1\.weight")
    blocks = sorted(
        {(int(m.group(1)), int(m.group(2)))
         for k in sd if (m := block_re.match(k))}
    )
    for si, bi in blocks:
        src = f"backbone.layers.{si}.{bi}"
        dst = bb + (f"layer{si + 1}_{bi}",)
        for i in (1, 2, 3):
            conv(f"{src}.conv{i}", dst + (f"conv{i}",), bias=False)
            bn(f"{src}.bn{i}", dst + (f"bn{i}",))
        if f"{src}.downsample.0.weight" in sd:
            conv(f"{src}.downsample.0", dst + ("downsample_conv",), bias=False)
            bn(f"{src}.downsample.1", dst + ("downsample_bn",))

    # ---- FPN: lateral 1x1s, 3x3 pred convs, two stride-2 downs ----
    for j in range(3):
        conv(f"fpn.lat_layers.{j}", ("fpn", f"lat{j}"))
        conv(f"fpn.pred_layers.{j}.0", ("fpn", f"pred{j}"))
    for j in range(2):
        conv(f"fpn.downsample_layers.{j}.0", ("fpn", f"down{j}"))

    # ---- ProtoNet: proto1 Sequential convs at .0/.2/.4, proto2 at .0/.2 ----
    for i, idx in enumerate((0, 2, 4)):
        conv(f"proto_net.proto1.{idx}", ("proto_net", f"proto1_{i}"))
    conv("proto_net.proto2.0", ("proto_net", "proto2_0"))
    conv("proto_net.proto2.2", ("proto_net", "proto2_1"))

    # ---- shared prediction head ----
    pl = ("prediction_layers",)
    conv("prediction_layers.upfeature.0", pl + ("upfeature",))
    conv("prediction_layers.conf_layer", pl + ("conf_layer",))
    conv("prediction_layers.bbox_layer", pl + ("bbox_layer",))
    conv("prediction_layers.coef_layer.0", pl + ("coef_layer",))
    if "prediction_layers.grasp_coef_layer.0.weight" in sd:
        conv("prediction_layers.grasp_coef_layer.0", pl + ("grasp_coef_layer",))

    # ---- train-only semantic seg head (present when saved from training) ----
    if "semantic_seg_conv.weight" in sd:
        conv("semantic_seg_conv", ("semantic_seg_conv",))

    leftover = sorted(
        k for k in sd
        if k not in sd.used and not k.endswith("num_batches_tracked")
        and not k.startswith("anchors")
    )
    if strict and leftover:
        raise ValueError(
            f"{len(leftover)} checkpoint tensors were not consumed by the "
            f"conversion (schema drift?): {leftover[:8]}..."
        )
    return params, stats
