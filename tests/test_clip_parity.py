"""Numerical parity of the flax CLIP tower + checkpoint converter against
golden outputs produced by the reference torch CLIP (model/clip.py) from a
random small state dict.  Exercises: ResNet stem/stages/attnpool with bicubic
pos-embed resize (416 input vs 224 checkpoint geometry), causal text
transformer, EOT state projection, and the torch->flax layout conversion."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

DATA = os.path.join(os.path.dirname(__file__), "data", "clip_parity.npz")


@pytest.mark.skipif(not os.path.exists(DATA), reason="golden data missing")
def test_clip_forward_matches_reference_golden():
    from crog_tpu.models.convert import (
        build_clip,
        convert_clip_state_dict,
        infer_clip_config,
    )

    z = np.load(DATA)
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    cfg = infer_clip_config(sd)
    assert cfg["vision_arch"] == "resnet"
    assert cfg["vision_layers"] == (1, 1, 1, 1)
    params, stats = convert_clip_state_dict(sd)
    model = build_clip(cfg, dtype=jnp.float32)
    variables = {"params": params, "batch_stats": stats}

    img = jnp.asarray(np.transpose(z["img"], (0, 2, 3, 1)))
    word = jnp.asarray(z["word"])
    with jax.default_matmul_precision("highest"):
        vis, word_feat, state = jax.jit(
            lambda v, i, w: model.apply(v, i, w, train=False)
        )(variables, img, word)

    def check(name, ref, got, nhwc=False):
        got = np.asarray(got)
        if nhwc:
            got = np.transpose(got, (0, 3, 1, 2))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-3 * scale, rtol=0.02)

    check("x2", z["x2"], vis[0], True)
    check("x3", z["x3"], vis[1], True)
    check("x4", z["x4"], vis[2], True)
    check("word", z["word_feat"], word_feat)
    check("state", z["state"], state)
