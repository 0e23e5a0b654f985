"""ViT CLIP checkpoint conversion round-trip.

A random ViT-B/32-shaped state dict (standard CLIP key names) is converted
by convert_clip_state_dict and the flax CLIPViT forward is compared against
an independent torch evaluation of the same weights (the standard CLIP ViT
computation: patch conv, cls token, pre/post LN, pre-LN residual attention
blocks with QuickGELU, patch-token projection — the reference's modified
variant keeps all patch tokens, model/clip.py:286-332)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

# heads MUST satisfy the reference rule heads = vision_width // 64
# (model/clip.py:540-546) — the converter infers heads from width
RES, PATCH, WIDTH, LAYERS, HEADS, OUT = 64, 16, 128, 2, 2, 96
TW, TLAYERS, VOCAB, CTX = 128, 2, 200, 77


def _rand_sd(rng):
    def r(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.04

    sd = {
        "visual.conv1.weight": r(WIDTH, 3, PATCH, PATCH),
        "visual.class_embedding": r(WIDTH),
        "visual.positional_embedding": r((RES // PATCH) ** 2 + 1, WIDTH),
        "visual.ln_pre.weight": 1 + r(WIDTH),
        "visual.ln_pre.bias": r(WIDTH),
        "visual.ln_post.weight": 1 + r(WIDTH),
        "visual.ln_post.bias": r(WIDTH),
        "visual.proj": r(WIDTH, OUT),
        "text_projection": r(TW, OUT),
        "positional_embedding": r(CTX, TW),
        "token_embedding.weight": r(VOCAB, TW),
        "ln_final.weight": 1 + r(TW),
        "ln_final.bias": r(TW),
    }
    for tower, n, w in (("visual.transformer", LAYERS, WIDTH),
                        ("transformer", TLAYERS, TW)):
        for i in range(n):
            p = f"{tower}.resblocks.{i}"
            sd[f"{p}.attn.in_proj_weight"] = r(3 * w, w)
            sd[f"{p}.attn.in_proj_bias"] = r(3 * w)
            sd[f"{p}.attn.out_proj.weight"] = r(w, w)
            sd[f"{p}.attn.out_proj.bias"] = r(w)
            sd[f"{p}.ln_1.weight"] = 1 + r(w)
            sd[f"{p}.ln_1.bias"] = r(w)
            sd[f"{p}.ln_2.weight"] = 1 + r(w)
            sd[f"{p}.ln_2.bias"] = r(w)
            sd[f"{p}.mlp.c_fc.weight"] = r(4 * w, w)
            sd[f"{p}.mlp.c_fc.bias"] = r(4 * w)
            sd[f"{p}.mlp.c_proj.weight"] = r(w, 4 * w)
            sd[f"{p}.mlp.c_proj.bias"] = r(w)
    return sd


def _torch_block(x, sd, p, heads):
    """Pre-LN residual attention block with QuickGELU (standard CLIP)."""
    import torch.nn.functional as F

    t = lambda k: torch.from_numpy(sd[f"{p}.{k}"])
    h = F.layer_norm(x, (x.shape[-1],), t("ln_1.weight"), t("ln_1.bias"))
    attn, _ = F.multi_head_attention_forward(
        h.transpose(0, 1), h.transpose(0, 1), h.transpose(0, 1),
        x.shape[-1], heads,
        t("attn.in_proj_weight"), t("attn.in_proj_bias"),
        None, None, False, 0.0,
        t("attn.out_proj.weight"), t("attn.out_proj.bias"),
        need_weights=False,
    )
    x = x + attn.transpose(0, 1)
    h = F.layer_norm(x, (x.shape[-1],), t("ln_2.weight"), t("ln_2.bias"))
    h = h @ t("mlp.c_fc.weight").T + t("mlp.c_fc.bias")
    h = h * torch.sigmoid(1.702 * h)  # QuickGELU
    h = h @ t("mlp.c_proj.weight").T + t("mlp.c_proj.bias")
    return x + h


def _torch_vit_forward(sd, img):
    import torch.nn.functional as F

    x = torch.from_numpy(img)  # [B, 3, H, W]
    x = F.conv2d(x, torch.from_numpy(sd["visual.conv1.weight"]),
                 stride=PATCH)
    b = x.shape[0]
    x = x.reshape(b, WIDTH, -1).permute(0, 2, 1)
    cls = torch.from_numpy(sd["visual.class_embedding"])
    x = torch.cat([cls.expand(b, 1, WIDTH), x], dim=1)
    x = x + torch.from_numpy(sd["visual.positional_embedding"])
    x = F.layer_norm(x, (WIDTH,), torch.from_numpy(sd["visual.ln_pre.weight"]),
                     torch.from_numpy(sd["visual.ln_pre.bias"]))
    for i in range(LAYERS):
        x = _torch_block(x, sd, f"visual.transformer.resblocks.{i}", HEADS)
    x = F.layer_norm(x[:, 1:, :], (WIDTH,),
                     torch.from_numpy(sd["visual.ln_post.weight"]),
                     torch.from_numpy(sd["visual.ln_post.bias"]))
    return (x @ torch.from_numpy(sd["visual.proj"])).numpy()


def test_vit_checkpoint_roundtrip_matches_torch():
    from crog_tpu.models.convert import (
        build_clip,
        convert_clip_state_dict,
        infer_clip_config,
    )

    rng = np.random.RandomState(0)
    sd = _rand_sd(rng)
    cfg = infer_clip_config(sd)
    assert cfg["vision_arch"] == "vit"
    assert cfg["vision_patch_size"] == PATCH
    assert cfg["image_resolution"] == RES
    assert cfg["vision_layers"] == LAYERS

    params, stats = convert_clip_state_dict(sd)
    model = build_clip(cfg, dtype=jnp.float32)
    img = rng.randn(2, 3, RES, RES).astype(np.float32)
    word = np.zeros((2, 17), np.int32)
    word[:, 0] = 5
    word[:, 6] = VOCAB - 1  # EOT = max id
    with jax.default_matmul_precision("highest"):
        vis, word_feat, state = jax.jit(
            lambda v, i, w: model.apply(v, i, w, train=False)
        )({"params": params}, jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
          jnp.asarray(word))

    want = _torch_vit_forward(sd, img)
    assert vis.shape == want.shape  # [B, grid^2, OUT]
    np.testing.assert_allclose(np.asarray(vis), want, atol=2e-4)

    # init shapes agree with converted shapes (non-strict load sanity)
    fresh = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, RES, RES, 3)), jnp.asarray(word[:1]), train=False,
        )
    )
    flat_fresh = jax.tree_util.tree_flatten_with_path(fresh["params"])[0]
    flat_conv = jax.tree_util.tree_flatten_with_path(params)[0]
    fresh_map = {jax.tree_util.keystr(k): v.shape for k, v in flat_fresh}
    for k, v in flat_conv:
        ks = jax.tree_util.keystr(k)
        assert ks in fresh_map, f"converted key {ks} unknown to the model"
        assert tuple(fresh_map[ks]) == tuple(v.shape), ks
