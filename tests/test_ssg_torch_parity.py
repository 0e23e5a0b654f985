"""Full-model numerical parity of SSG against the reference torch SSG.

Same oracle pattern as test_crog_torch_parity: the reference's own torch SSG
(model/ssg.py:208-293 — torchvision-style ResNet, 5-level FPN, ProtoNet,
shared prediction head) is instantiated at reduced depth, its state dict is
loaded through ``convert_ssg_state_dict``, and both frameworks run identical
RGB-D inputs in eval mode.  Pins the 4-channel depth stem, maxpool padding,
align_corners conventions (FPN False / ProtoNet True), ratio-major anchor
channel flattening, and tanh coefficient heads.  Also the migration proof
for reference-trained SSG checkpoints.
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
    convert_ssg_state_dict,
    merge_trained_crog as merge_trained,
)
from crog_tpu.models.ssg import SSG  # noqa: E402

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")),
    reason="reference repo not mounted",
)

SIZE = 128
NUM_CLASSES = 8


def _import_reference_ssg():
    """Import reference model.ssg without the package __init__ (loguru) and
    with cv2 stubbed (imported at module level, used only in dead code)."""
    sys.modules.setdefault("cv2", types.ModuleType("cv2"))
    if "model" not in sys.modules or not getattr(
        sys.modules["model"], "__crog_ref__", False
    ):
        pkg = types.ModuleType("model")
        pkg.__path__ = [os.path.join(REF, "model")]
        pkg.__crog_ref__ = True
        sys.modules["model"] = pkg
    if "utils" not in sys.modules or not getattr(
        sys.modules["utils"], "__crog_ref__", False
    ):
        upkg = types.ModuleType("utils")
        upkg.__path__ = [os.path.join(REF, "utils")]
        upkg.__crog_ref__ = True
        sys.modules["utils"] = upkg
    import model.ssg as ref_ssg

    return ref_ssg


@pytest.fixture(scope="module")
def oracle():
    ref_ssg = _import_reference_ssg()
    torch.manual_seed(0)
    cfg = types.SimpleNamespace(
        backbone="resnet",
        resnet_layers=(1, 1, 1, 1),
        path_to_pretrained_resnet=None,
        resume=None,
        with_depth=True,
        fpn_in_channels=(512, 1024, 2048),
        num_protos=32,
        num_classes=NUM_CLASSES,
        img_size=SIZE,
        anchor_strides=(8, 16, 32, 64, 128),
        aspect_ratios=(1, 0.5, 2),
        with_grasp_masks=True,
    )
    model = ref_ssg.SSG(cfg)  # training mode: semantic_seg_conv exists
    model = model.eval()
    sd = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    return model, sd


def _inputs():
    rng = np.random.RandomState(3)
    rgb = (rng.rand(2, SIZE, SIZE, 3) * 2 - 1).astype(np.float32)
    depth = (rng.rand(2, SIZE, SIZE, 1) * 2 - 1).astype(np.float32)
    return rgb, depth


def test_forward_parity(oracle):
    ref_model, sd = oracle
    rgb, depth = _inputs()

    with torch.no_grad():
        out_ref = ref_model(
            {
                "rgb": torch.from_numpy(np.transpose(rgb, (0, 3, 1, 2))),
                "depth": torch.from_numpy(np.transpose(depth, (0, 3, 1, 2))),
            }
        )

    model = SSG(
        num_classes=NUM_CLASSES,
        img_size=SIZE,
        resnet_layers=(1, 1, 1, 1),
        dtype=jnp.float32,
    )
    img = jnp.asarray(np.concatenate([rgb, depth], axis=-1))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), img, train=True,  # train: seg head in tree
    )
    params, stats = convert_ssg_state_dict(sd)
    variables = merge_trained(variables, params, stats)
    got = jax.jit(model.apply, static_argnames=("train",))(
        variables, img, train=False
    )

    for ours_key, ref_key in [
        ("protos", "protos"),
        ("cls_pred", "cls_pred"),
        ("box_pred", "box_pred"),
        ("ins_coef_pred", "ins_coef_pred"),
        ("grasp_coef_pred", "grasp_coef_pred"),
    ]:
        a = np.asarray(got[ours_key])
        b = out_ref[ref_key].numpy()
        assert a.shape == b.shape, (ours_key, a.shape, b.shape)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-4 * scale, err_msg=ours_key
        )


def test_strict_conversion(oracle):
    _, sd = oracle
    convert_ssg_state_dict(sd)  # consumes everything
    bad = dict(sd)
    bad["fpn.unexpected.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        convert_ssg_state_dict(bad)
    convert_ssg_state_dict(bad, strict=False)
