"""Fused Pallas kernel for the SSG lincomb grasp-map loss.

Reference semantics (model/ssg.py:455-507, rebuilt in
models/ssg_loss.lincomb_grasp_masks_loss): per selected positive anchor j and
task t in (qua, sin, cos, wid),

    pred   = sigmoid(protos @ coef[j, t])            # [ph, pw]
    m      = where(inside_box_j, pred, outside_t)    # cos fills 1 outside
    sum_jt = sum smooth_l1(m - gt[t, gt_index_j])    # over all pixels

The XLA lowering of that chain materializes the [B, 4, k, 136, 136] f32
prediction stack and walks it in FIVE ~568 MB elementwise fusions at
~417 GB/s (measured 2026-08-21, profile_step PROFILE_MODEL=ssg, batch 16:
the lgrasp region is 17.98 ms of a 100.3 ms step — the largest loss block
by 4x).  This kernel never materializes the stack: each (anchor-tile x
pixel-chunk) block computes the einsum on the MXU, applies
sigmoid/crop/smooth-L1 in VMEM, and accumulates per-anchor sums; the
custom VJP recomputes the block and contracts it back to coefficient and
prototype gradients in the same pass (GT and boxes carry no gradient).

Layouts (lane dim = the 128-multiple axis):
    coef_t   [B, C, KT_pad]   selected coefficients, col = j*T + t
    protos_t [B, C, HW_pad]   prototypes, pixel-linearized
    ds_pad   [B, TM_pad, HW_pad]  ALL GT rows (t*M + m); the kernel
                              selects per-anchor rows with an exact
                              one-hot MXU contraction (_gt_tile) instead
                              of a [B, KT_pad, HW_pad] pre-gather
    idx8     [B, 8, KT_pad]   int32 GT row index per column (8-sublane
                              broadcast — Mosaic rejects [1, 128] blocks)
    boxes4   [B, 4, KT_pad]   sanitized x1,x2,y1,y2 (box_inside_mask
                              semantics, applied by the caller)
    sums     [B, 8, KT_pad]   per-(anchor, task) pixel sums (sublane 0)

The kernel is exact (f32 MXU accumulation); only the pixel-reduction
order differs from the XLA path (tested to ~1e-5 relative).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _plan(hw: int):
    """Pick (hw_chunk, n_hw) with hw_chunk a 128-multiple."""
    hw_pad = _round_up(hw, 128)
    n_hw = max(1, -(-hw_pad // 3712))
    chunk = _round_up(-(-hw_pad // n_hw), 128)
    return chunk, -(-hw_pad // chunk)


def _geometry(pred_shape, ikt, ihw, hw_chunk, pw, kt, hw_n, box):
    col = jax.lax.broadcasted_iota(jnp.int32, pred_shape, 0) + ikt * 128
    hw = jax.lax.broadcasted_iota(jnp.int32, pred_shape, 1) + ihw * hw_chunk
    # float comparisons to match box_inside_mask's f32 iota exactly
    px = (hw % pw).astype(jnp.float32)
    py = (hw // pw).astype(jnp.float32)
    x1, x2, y1, y2 = box[0, :], box[1, :], box[2, :], box[3, :]
    inside = (
        (px >= x1[:, None]) & (px < x2[:, None])
        & (py >= y1[:, None]) & (py < y2[:, None])
    )
    valid = (col < kt) & (hw < hw_n)
    return col, inside, valid


def _gt_tile(ds_ref, idx_ref, tm):
    """gt[col, :] = ds[idx[col], :] as a one-hot MXU contraction — exact
    (each output element is a single 1.0 * x product) and removes the
    [B, KT_pad, HW_pad] pre-gather (608 MB materialized + re-read, the
    pad_select_fusion + fusion.3 pair at 3.4 ms/step in the first kernel
    profile).  M distinct GT rows per image make the gather a rank-M
    selection, which is exactly what a [128, TM] one-hot contraction does.
    """
    idx = idx_ref[0, 0, :]                      # [128] int32
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, tm), 1)
    onehot = (rows == idx[:, None]).astype(jnp.float32)
    return jax.lax.dot_general(
        onehot, ds_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # [128, chunk]


def _fwd_kernel(coef_ref, protos_ref, ds_ref, idx_ref, box_ref, out_ref, *,
                num_tasks, cos_idx, hw, kt, pw, hw_chunk, tm, loss_kind):
    ikt = pl.program_id(1)
    ihw = pl.program_id(2)
    coef = coef_ref[0]    # [C, 128]
    pt = protos_ref[0]    # [C, chunk]
    pred = jax.lax.dot_general(
        coef, pt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [128, chunk]
    col, inside, valid = _geometry(
        pred.shape, ikt, ihw, hw_chunk, pw, kt, hw, box_ref[0]
    )
    s = jax.nn.sigmoid(pred)
    if num_tasks > 1:
        outside = jnp.where((col % num_tasks) == cos_idx, 1.0, 0.0)
    else:
        outside = 0.0
    m = jnp.where(inside, s, outside)
    gt = _gt_tile(ds_ref, idx_ref, tm)
    if loss_kind == "bce":
        # lincomb_mask_loss semantics: clip(m,0,1) is an identity on
        # {0} u (0,1); the log clips floor at 1e-7
        l = -(gt * jnp.log(jnp.maximum(m, 1e-7))
              + (1.0 - gt) * jnp.log(jnp.maximum(1.0 - m, 1e-7)))
    else:
        d = jnp.abs(m - gt)
        l = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    # [1, 8, 128]: Mosaic requires the last-two block dims be (8k, 128k)
    # or full — a [1, 128] row block is rejected, so the sums ride an
    # 8-sublane broadcast and the caller reads sublane 0
    part = jnp.broadcast_to(
        jnp.sum(jnp.where(valid, l, 0.0), axis=1)[None, None, :],
        (1, 8, 128),
    )

    @pl.when(ihw == 0)
    def _():
        out_ref[...] = part

    @pl.when(ihw != 0)
    def _():
        out_ref[...] += part


def _bwd_kernel(coef_ref, protos_ref, ds_ref, idx_ref, box_ref, g_ref,
                dcoef_ref, dprotos_ref, *,
                num_tasks, cos_idx, hw, kt, pw, hw_chunk, tm, loss_kind):
    ikt = pl.program_id(1)
    ihw = pl.program_id(2)
    coef = coef_ref[0]
    pt = protos_ref[0]
    pred = jax.lax.dot_general(
        coef, pt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col, inside, valid = _geometry(
        pred.shape, ikt, ihw, hw_chunk, pw, kt, hw, box_ref[0]
    )
    s = jax.nn.sigmoid(pred)
    if num_tasks > 1:
        outside = jnp.where((col % num_tasks) == cos_idx, 1.0, 0.0)
    else:
        outside = 0.0
    m = jnp.where(inside, s, outside)
    # d(smooth_l1)/dm = clamp(m - gt, -1, 1); only inside-box pixels see a
    # non-constant m
    gt = _gt_tile(ds_ref, idx_ref, tm)
    if loss_kind == "bce":
        # d(bce)/dm with the log-clip indicators (grad is 0 where the
        # 1e-7 floor saturates, matching jnp.maximum's VJP)
        dldm = -(gt / jnp.maximum(m, 1e-7) * (m > 1e-7)
                 - (1.0 - gt) / jnp.maximum(1.0 - m, 1e-7)
                 * ((1.0 - m) > 1e-7))
    else:
        dldm = jnp.clip(m - gt, -1.0, 1.0)
    dm = g_ref[0, 0, :][:, None] * dldm
    dpred = jnp.where(inside & valid, dm, 0.0) * s * (1.0 - s)
    dcoef = jax.lax.dot_general(
        pt, dpred, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, 128]

    @pl.when(ihw == 0)
    def _():
        dcoef_ref[...] = dcoef[None]

    @pl.when(ihw != 0)
    def _():
        dcoef_ref[...] += dcoef[None]

    dpp = jax.lax.dot_general(
        coef, dpred, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, chunk]
    sl = pl.ds(ihw * hw_chunk, hw_chunk)

    @pl.when(ikt == 0)
    def _():
        dprotos_ref[0, :, sl] = dpp

    @pl.when(ikt != 0)
    def _():
        dprotos_ref[0, :, sl] += dpp


def make_lincomb_sums(num_tasks: int, ph: int, pw: int, kt: int, tm: int,
                      cos_idx: int = 2, interpret: bool = False,
                      loss_kind: str = "smooth_l1"):
    """Factory for the custom-VJP'd sums op at fixed static geometry.

    Returns f(coef_t, protos_t, ds_pad, idx8, boxes4) -> sums
    [B, 8, KT_pad] (read sublane 0) with gradients flowing to coef_t and
    protos_t only (GT maps, indices and boxes are ground truth)."""
    hw = ph * pw
    hw_chunk, n_hw = _plan(hw)
    hw_pad = hw_chunk * n_hw
    kt_pad = _round_up(kt, 128)
    n_kt = kt_pad // 128
    kw = dict(num_tasks=num_tasks, cos_idx=cos_idx, hw=hw, kt=kt, pw=pw,
              hw_chunk=hw_chunk, tm=tm, loss_kind=loss_kind)

    def _specs(c):
        return [
            pl.BlockSpec((1, c, 128), lambda b, i, h: (b, 0, i)),
            pl.BlockSpec((1, c, hw_chunk), lambda b, i, h: (b, 0, h)),
            pl.BlockSpec((1, tm, hw_chunk), lambda b, i, h: (b, 0, h)),
            pl.BlockSpec((1, 8, 128), lambda b, i, h: (b, 0, i)),
            pl.BlockSpec((1, 4, 128), lambda b, i, h: (b, 0, i)),
        ]

    def _fwd_call(coef_t, protos_t, ds_pad, idx8, boxes4):
        b, c = coef_t.shape[:2]
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=(b, n_kt, n_hw),
            in_specs=_specs(c),
            out_specs=pl.BlockSpec(
                (1, 8, 128), lambda b, i, h: (b, 0, i)
            ),
            out_shape=jax.ShapeDtypeStruct((b, 8, kt_pad), jnp.float32),
            interpret=interpret,
        )(coef_t, protos_t, ds_pad, idx8, boxes4)

    @jax.custom_vjp
    def sums(coef_t, protos_t, ds_pad, idx8, boxes4):
        return _fwd_call(coef_t, protos_t, ds_pad, idx8, boxes4)

    def sums_fwd(coef_t, protos_t, ds_pad, idx8, boxes4):
        return _fwd_call(coef_t, protos_t, ds_pad, idx8, boxes4), (
            coef_t, protos_t, ds_pad, idx8, boxes4,
        )

    def sums_bwd(res, g):
        coef_t, protos_t, ds_pad, idx8, boxes4 = res
        b, c = coef_t.shape[:2]
        specs = _specs(c)
        specs.append(
            pl.BlockSpec((1, 8, 128), lambda b, i, h: (b, 0, i))
        )
        dcoef, dprotos = pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            grid=(b, n_kt, n_hw),
            in_specs=specs,
            out_specs=(
                pl.BlockSpec((1, c, 128), lambda b, i, h: (b, 0, i)),
                pl.BlockSpec((1, c, hw_pad), lambda b, i, h: (b, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, c, kt_pad), jnp.float32),
                jax.ShapeDtypeStruct((b, c, hw_pad), jnp.float32),
            ),
            interpret=interpret,
        )(coef_t, protos_t, ds_pad, idx8, boxes4, g)
        return (dcoef, dprotos, jnp.zeros_like(ds_pad),
                jnp.zeros_like(idx8), jnp.zeros_like(boxes4))

    sums.defvjp(sums_fwd, sums_bwd)
    return sums


def lincomb_task_sums(protos, sel_coef, ds_flat, sel_gt, sel_box,
                      num_tasks: int, cos_idx: int = 2,
                      interpret: bool = False,
                      loss_kind: str = "smooth_l1"):
    """Batched per-anchor/task pixel sums of the lincomb grasp loss.

    protos   [B, ph, pw, C] f32
    sel_coef [B, k, T, C]   f32 (post-gather convert already applied)
    ds_flat  [B, T*M, ph*pw] f32 GT maps, row = t*M + m
    sel_gt   [B, k] int32   GT index per selected anchor
    sel_box  [B, k, 4] f32  matched GT boxes (relative, unsanitized)
    Returns sums [B, k, T] f32.
    """
    b, ph, pw, c = protos.shape
    k, t = sel_coef.shape[1:3]
    assert t == num_tasks
    hw = ph * pw
    hw_chunk, n_hw = _plan(hw)
    hw_pad = hw_chunk * n_hw
    kt = k * t
    kt_pad = _round_up(kt, 128)

    # prototypes: [B, C, HW_pad]
    protos_t = jnp.pad(
        jnp.transpose(protos.reshape(b, hw, c), (0, 2, 1)),
        ((0, 0), (0, 0), (0, hw_pad - hw)),
    )
    # coefficients: [B, C, KT_pad], col = j*T + t
    coef_t = jnp.pad(
        jnp.transpose(sel_coef.reshape(b, kt, c), (0, 2, 1)),
        ((0, 0), (0, 0), (0, kt_pad - kt)),
    )
    # GT maps stay un-gathered: the kernel one-hot-contracts the tm rows
    # per anchor tile (see _gt_tile).  Pad rows to a sublane multiple.
    tm = ds_flat.shape[1]
    tm_pad = _round_up(tm, 8)
    ds_pad = jnp.pad(
        ds_flat, ((0, 0), (0, tm_pad - tm), (0, hw_pad - hw))
    )
    m_slots = tm // num_tasks
    t_ids = jnp.arange(num_tasks, dtype=sel_gt.dtype)
    col_idx = (sel_gt[:, :, None] + t_ids[None, None, :] * m_slots).reshape(
        b, kt
    )
    # padded cols point at a padded (all-zero) row; they are masked by the
    # kt bound anyway
    col_idx = jnp.pad(
        col_idx, ((0, 0), (0, kt_pad - kt)), constant_values=tm_pad - 1
    ) if kt_pad > kt else col_idx
    idx8 = jnp.broadcast_to(
        col_idx[:, None, :].astype(jnp.int32), (b, 8, kt_pad)
    )
    # sanitized crop bounds (ops/boxes.box_inside_mask semantics, padding=1)
    bx = sel_box.astype(jnp.float32)

    def _sanitize(a, bb, size):
        lo = jnp.minimum(a, bb) * size
        hi = jnp.maximum(a, bb) * size
        return jnp.clip(lo - 1.0, 0), jnp.clip(hi + 1.0, None, size)

    x1, x2 = _sanitize(bx[..., 0], bx[..., 2], pw)
    y1, y2 = _sanitize(bx[..., 1], bx[..., 3], ph)
    boxes4 = jnp.stack([x1, x2, y1, y2], axis=1)  # [B, 4, k]
    boxes4 = jnp.pad(
        jnp.repeat(boxes4, num_tasks, axis=-1),
        ((0, 0), (0, 0), (0, kt_pad - kt)),
    )

    op = make_lincomb_sums(num_tasks, ph, pw, kt, tm_pad, cos_idx, interpret,
                           loss_kind)
    out = op(coef_t, protos_t,
             jax.lax.stop_gradient(ds_pad),
             jax.lax.stop_gradient(idx8),
             jax.lax.stop_gradient(boxes4))
    return out[:, 0, :kt].reshape(b, k, t)
