"""PRODUCTION-geometry converter + forward parity against the torch oracles.

The reduced-geometry parity tests (test_crog_torch_parity.py,
test_ssg_torch_parity.py) pin cross-framework semantics cheaply, but the
production conversion path has extra surface the reduced proxies never
touch (VERDICT r03 missing #3): depth-scaled layer names (layer1.0..2 /
layer2.0..3 / layer3.0..5 / layer4.0..2 in stock RN50), 12 text
transformer resblocks, vocab 49408 token embeddings, 3 decoder layers, and
— the big one — the attnpool positional-embedding RESIZE: trained reference
checkpoints carry the 224-px 7x7(+1) grid and both frameworks bicubically
resize it to 13x13 at the 416-px forward (reference
model/clip.py:80-556 resize_pos_embed / build_model; ours
models/clip.py AttentionPool2d + clip_resolution=224).

Here the oracles are built at STOCK geometry with random weights
(torch.manual_seed — trained weights don't exist in this environment and
aren't needed: strict tree-structure consumption plus forward agreement at
production shapes is exactly what the converter must guarantee), converted
with the same functions test_crog.py uses for real .pth files, and one
production-resolution forward is compared per model family.

Compile-heavy (full RN50 at 416^2 / 544^2 on a 1-core CPU host) — slow-
marked; the persistent compile cache makes reruns cheap.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from crog_tpu.models.convert import (  # noqa: E402
    convert_crog_state_dict,
    convert_ssg_state_dict,
    merge_trained_crog,
)
from crog_tpu.models.crog import CROG  # noqa: E402
from crog_tpu.models.ssg import SSG  # noqa: E402

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "model")),
        reason="reference repo not mounted",
    ),
]


def _ref_pkg(name: str, path: str):
    if name not in sys.modules or not getattr(
        sys.modules[name], "__crog_ref__", False
    ):
        pkg = types.ModuleType(name)
        pkg.__path__ = [os.path.join(REF, path)]
        pkg.__crog_ref__ = True
        sys.modules[name] = pkg


def test_crog_full_geometry_parity():
    """Stock RN50 CROG (vision 3-4-6-3, 12 text layers, vocab 49408,
    3 decoder layers) converted and compared at 416^2 — including the
    7x7 -> 13x13 attnpool pos-embed resize both frameworks perform at
    runtime (the checkpoint keeps the 224-px grid)."""
    _ref_pkg("model", "model")
    import model.clip as ref_clip
    import model.crog as ref_crog

    WORD_LEN, RES = 17, 416
    torch.manual_seed(0)
    # the real pretrained-CLIP geometry: 224 px -> attnpool grid 7x7
    clip = ref_clip.CLIP(
        embed_dim=1024, image_resolution=224, vision_layers=(3, 4, 6, 3),
        vision_width=64, vision_patch_size=None, context_length=77,
        txt_length=WORD_LEN, vocab_size=49408, transformer_width=512,
        transformer_heads=8, transformer_layers=12,
    )
    clip_sd = clip.state_dict()

    class _FakeArchive:
        def eval(self):
            return self

        def state_dict(self):
            return dict(clip_sd)  # build_model mutates (deletes keys)

    real_jit_load = torch.jit.load
    torch.jit.load = lambda *a, **k: _FakeArchive()
    try:
        cfg = types.SimpleNamespace(
            use_contrastive=True, use_pretrained_clip=True,
            use_grasp_masks=True, clip_pretrain="<in-memory>",
            word_len=WORD_LEN, word_dim=1024, vis_dim=512,
            fpn_in=(512, 1024, 1024), fpn_out=(256, 512, 1024),
            num_layers=3, num_head=8, dim_ffn=2048, dropout=0.1,
            intermediate=False,
        )
        ref_model = ref_crog.CROG(cfg).eval()
    finally:
        torch.jit.load = real_jit_load
    sd = {
        k: v.detach().numpy().copy() for k, v in ref_model.state_dict().items()
    }

    rng = np.random.RandomState(42)
    img = (rng.randn(1, RES, RES, 3) * 0.4).astype(np.float32)
    word = np.zeros((1, WORD_LEN), np.int64)
    word[0, 0], word[0, 1:8], word[0, 8] = 49406, rng.randint(1, 49000, 7), 49407

    with torch.no_grad():
        preds, _ = ref_model(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
            torch.from_numpy(word),
        )
    ref_out = np.stack([p.numpy()[:, 0] for p in preds], axis=-1)

    model = CROG(dtype=jnp.float32)  # ALL defaults: the production config
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(word, jnp.int32),
        train=False,
    )
    params, stats = convert_crog_state_dict(sd)
    variables = merge_trained_crog(variables, params, stats)
    got = np.asarray(
        jax.jit(model.apply, static_argnames=("train",))(
            variables, jnp.asarray(img), jnp.asarray(word, jnp.int32),
            train=False,
        )
    )
    assert got.shape == ref_out.shape, (got.shape, ref_out.shape)
    scale = np.abs(ref_out).max()
    # ~62 layers of fp32 accumulation: looser than the reduced test's 2e-4
    np.testing.assert_allclose(got, ref_out, rtol=1e-3, atol=1e-3 * scale)


def test_ssg_full_geometry_parity():
    """Stock SSG (ResNet50 depths, 32 classes) converted and compared at
    the production 544^2 RGB-D input."""
    sys.modules.setdefault("cv2", types.ModuleType("cv2"))
    _ref_pkg("model", "model")
    _ref_pkg("utils", "utils")
    import model.ssg as ref_ssg

    SIZE, NUM_CLASSES = 544, 32
    torch.manual_seed(0)
    cfg = types.SimpleNamespace(
        backbone="resnet", resnet_layers=(3, 4, 6, 3),
        path_to_pretrained_resnet=None, resume=None, with_depth=True,
        fpn_in_channels=(512, 1024, 2048), num_protos=32,
        num_classes=NUM_CLASSES, img_size=SIZE,
        anchor_strides=(8, 16, 32, 64, 128), aspect_ratios=(1, 0.5, 2),
        with_grasp_masks=True,
    )
    ref_model = ref_ssg.SSG(cfg).eval()
    sd = {
        k: v.detach().numpy().copy() for k, v in ref_model.state_dict().items()
    }

    rng = np.random.RandomState(3)
    rgb = (rng.rand(1, SIZE, SIZE, 3) * 2 - 1).astype(np.float32)
    depth = (rng.rand(1, SIZE, SIZE, 1) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        out_ref = ref_model(
            {
                "rgb": torch.from_numpy(np.transpose(rgb, (0, 3, 1, 2))),
                "depth": torch.from_numpy(np.transpose(depth, (0, 3, 1, 2))),
            }
        )

    model = SSG(
        num_classes=NUM_CLASSES, img_size=SIZE, resnet_layers=(3, 4, 6, 3),
        dtype=jnp.float32,
    )
    img = jnp.asarray(np.concatenate([rgb, depth], axis=-1))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), img, train=True,  # train: seg head in tree
    )
    params, stats = convert_ssg_state_dict(sd)
    variables = merge_trained_crog(variables, params, stats)
    got = jax.jit(model.apply, static_argnames=("train",))(
        variables, img, train=False
    )
    for key in (
        "protos", "cls_pred", "box_pred", "ins_coef_pred", "grasp_coef_pred"
    ):
        a = np.asarray(got[key])
        b = out_ref[key].numpy()
        assert a.shape == b.shape, (key, a.shape, b.shape)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-3 * scale, err_msg=key
        )
