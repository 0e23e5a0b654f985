"""The torch.jit checkpoint-loading branch.

The reference loads CLIP via ``torch.jit.load`` and reads the archive's
state_dict (model/clip.py:503, model/crog.py:20-23).  Here a small
CLIP-RN50-shaped torch module (same state-dict key schema as the OpenAI
checkpoint) is scripted, saved with ``torch.jit.save``, and driven through
``load_torch_state_dict -> infer_clip_config -> convert_clip_state_dict ->
merge`` — asserting the jit branch yields byte-identical tensors to the plain
state-dict branch, the inferred architecture is right, and the non-strict
merge (reference strict=False, model/clip.py:554) leaves checkpoint-absent
keys (the `connect` branch, extra heads) at fresh init.
"""

import collections

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from crog_tpu.models.convert import (  # noqa: E402
    build_clip,
    convert_clip_state_dict,
    infer_clip_config,
    load_torch_state_dict,
)

# tiny CLIP-RN50 architecture: vision_width 8, embed 32, text width 64
VW = 8          # vision width
ED = 32         # embed dim
TW = 64         # transformer (text) width
GRID = 4        # attnpool spatial grid -> image_resolution GRID*32


class _Bottleneck(nn.Module):
    """State-dict schema of reference model/clip.py:10-57 (conv1-3, bn1-3,
    optional downsample Sequential of conv+bn)."""

    def __init__(self, cin, width, down):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        if down:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width * 4, 1, bias=False),
                nn.BatchNorm2d(width * 4),
            )

    def forward(self, x):
        return x


class _AttnPool(nn.Module):
    """Separate q/k/v/c_proj linears like the OpenAI RN50 attnpool
    (reference model/clip.py:60-79) — exercises the non-packed MHA branch.
    No `connect` branch: stock checkpoints don't have it."""

    def __init__(self, spacial, embed, out):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial + 1, embed)
        )
        self.q_proj = nn.Linear(embed, embed)
        self.k_proj = nn.Linear(embed, embed)
        self.v_proj = nn.Linear(embed, embed)
        self.c_proj = nn.Linear(embed, out)

    def forward(self, x):
        return x


class _TextBlock(nn.Module):
    """Packed-qkv nn.MultiheadAttention + named mlp children — the text
    resblock schema (reference model/clip.py:239-266)."""

    def __init__(self, d):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, 1)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(
            collections.OrderedDict(
                [("c_fc", nn.Linear(d, d * 4)), ("c_proj", nn.Linear(d * 4, d))]
            )
        )
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x):
        return x


class _Visual(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, VW // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(VW // 2)
        self.conv2 = nn.Conv2d(VW // 2, VW // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(VW // 2)
        self.conv3 = nn.Conv2d(VW // 2, VW, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(VW)
        cin = VW
        for i, width in enumerate((VW, VW * 2, VW * 4, VW * 8), start=1):
            setattr(
                self, f"layer{i}",
                nn.Sequential(_Bottleneck(cin, width, down=True)),
            )
            cin = width * 4
        self.attnpool = _AttnPool(GRID * GRID, VW * 32, ED)

    def forward(self, x):
        return x


class _MiniCLIP(nn.Module):
    def __init__(self):
        super().__init__()
        self.visual = _Visual()
        self.transformer = nn.Sequential(
            collections.OrderedDict(
                [("resblocks", nn.Sequential(_TextBlock(TW), _TextBlock(TW)))]
            )
        )
        self.token_embedding = nn.Embedding(128, TW)
        self.ln_final = nn.LayerNorm(TW)
        self.positional_embedding = nn.Parameter(torch.randn(77, TW))
        self.text_projection = nn.Parameter(torch.randn(TW, ED))

    def forward(self, x):
        return x


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    torch.manual_seed(0)
    model = _MiniCLIP().eval()
    d = tmp_path_factory.mktemp("torch_ckpt")
    jit_path = str(d / "clip_jit.pt")
    sd_path = str(d / "clip_sd.pt")
    torch.jit.save(torch.jit.script(model), jit_path)
    torch.save(model.state_dict(), sd_path)
    return jit_path, sd_path, model


def test_jit_and_plain_branches_identical(ckpts):
    jit_path, sd_path, model = ckpts
    sd_jit = load_torch_state_dict(jit_path)
    sd_plain = load_torch_state_dict(sd_path)
    # jit archives add num_batches_tracked etc. consistently; every tensor
    # the plain dict has must come back bitwise-equal from the jit archive
    assert set(sd_plain) <= set(sd_jit) or set(sd_jit) <= set(sd_plain)
    for k in set(sd_plain) & set(sd_jit):
        np.testing.assert_array_equal(sd_jit[k], sd_plain[k], err_msg=k)
    assert sd_jit["visual.conv1.weight"].dtype == np.float32


def test_inferred_config(ckpts):
    jit_path, _, _ = ckpts
    cfg = infer_clip_config(load_torch_state_dict(jit_path))
    assert cfg["vision_arch"] == "resnet"
    assert cfg["vision_layers"] == (1, 1, 1, 1)
    assert cfg["vision_width"] == VW
    assert cfg["embed_dim"] == ED
    assert cfg["image_resolution"] == GRID * 32
    assert cfg["transformer_width"] == TW
    assert cfg["transformer_heads"] == TW // 64
    assert cfg["transformer_layers"] == 2
    assert cfg["context_length"] == 77
    assert cfg["vocab_size"] == 128


def test_convert_and_nonstrict_merge(ckpts):
    """convert -> flax init merge: converted tensors land with matching
    shapes; checkpoint-absent keys (attnpool `connect`) keep fresh init."""
    import jax
    import jax.numpy as jnp

    jit_path, _, _ = ckpts
    sd = load_torch_state_dict(jit_path)
    cfg = infer_clip_config(sd)
    params, stats = convert_clip_state_dict(sd)

    clip = build_clip(cfg, dtype=jnp.float32)
    variables = jax.eval_shape(
        lambda: clip.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, cfg["image_resolution"], cfg["image_resolution"], 3)),
            jnp.zeros((1, 17), jnp.int32),
        )
    )

    def flatten(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flatten(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = v
        return out

    init_p = flatten(variables["params"])
    conv_p = flatten({"visual": params["visual"], "transformer": params["transformer"]})
    # every converted tensor must exist in the init tree with the same shape
    for k, v in conv_p.items():
        assert k in init_p, f"converted key {k} missing from flax init tree"
        assert tuple(init_p[k].shape) == tuple(v.shape), k
    # non-strict: the connect branch is NOT in the checkpoint -> stays fresh
    connect_keys = [k for k in init_p if "connect" in "/".join(k)]
    assert connect_keys, "model must have a connect branch"
    for k in connect_keys:
        assert k not in conv_p
    # batch_stats likewise shape-compatible
    init_s = flatten(variables["batch_stats"])
    conv_s = flatten(stats)
    for k, v in conv_s.items():
        assert k in init_s and tuple(init_s[k].shape) == tuple(v.shape), k
    # packed text qkv was split correctly: q/k/v kernels all (TW, TW)
    q = conv_p[("transformer", "resblock_0", "attn", "q_proj", "kernel")]
    v_ = conv_p[("transformer", "resblock_0", "attn", "v_proj", "kernel")]
    assert q.shape == (TW, TW) and v_.shape == (TW, TW)
    assert not np.array_equal(q, v_)
    # and matches the packed source slices (transposed to flax layout)
    w = sd["transformer.resblocks.0.attn.in_proj_weight"]
    np.testing.assert_array_equal(q, w[:TW].T)
    np.testing.assert_array_equal(v_, w[2 * TW :].T)
