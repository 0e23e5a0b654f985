"""Gathered blocked 3x3 convolution for the space-to-depth stem (Pallas).

The s2d stem (ops/s2d.py, replacing reference model/clip.py:208-213) runs
the stem's stride-1 3x3 convs as XLA convs over 2x2-blocked tensors with
zero-embedded [3,3,4ci,4co] kernels.  Exactly 36 of those kernels' 144
(ci,co) blocks are nonzero (one valid original tap per (slot_in, slot_out,
cell) combination — see the derivation in ops/s2d.py), so the MXU multiplies
4x structural zeros: the stem burns ~700 padded GFLOP/step at batch 24 for
~180 real ones and is compute-bound on zeros (tools/bench_stem.py: 7.5 ms of
the 113 ms step).

This kernel gathers instead of zero-padding.  For one output cell (i,j) the
four output slots Y[2i+dy', 2j+dx'] together read original rows
2i-1..2i+2 and cols 2j-1..2j+2 — a 4x4 original window, i.e. 16 (slot-row,
slot-col) blocks of ci channels from a 3x3-cell neighborhood.  Building that
[M, 16*ci] im2col patch in VMEM and multiplying one packed [16*ci, 4*co]
weight (56% dense — the only remaining zeros are the 4x4-window corners no
tap pair reaches) cuts the padded FLOPs 2.25x while keeping the GEMM's K and
N axes fully lane-packed (K = 4ci = 128 per slot-row group, N = 4co >= 128).

Index algebra (slot-row index t in 0..3 <-> original row 2i + t - 1, and the
same for columns with index s):

    cell offset  _OFS[t] = (t >> 1) + (t & 1)   in the 1-padded input
    block slot   _DY[t]  = (t + 1) & 1
    W_packed[(t*4+s)*ci + c, (dy'*2+dx')*co + o] = w[t - dy', s - dx', c, o]
        (zero unless both kernel indices fall in 0..2)

Backward: dgrad is the SAME op with the spatially-flipped, ci/co-transposed
kernel (the stride-1 pad-1 blocked conv family is closed under transpose);
wgrad accumulates patch^T @ dy into the packed layout across the sequential
TPU grid and un-packs to [3,3,ci,co] with 36 static slice-adds in XLA.

Large per-sample planes are split across a second grid axis to respect the
~16 MB VMEM window: an output-column split ("n": weight/output columns) or
an input-channel split ("k": the dy=0 / dy=1 slot pairs, which partitions
the slot-row groups t and accumulates into the revisited output block).

MEASURED NEGATIVE (v5e, 2026-08, batch 24, 104x104 planes): despite the
2.25x padded-FLOP cut, this kernel LOSES to the XLA zero-embedded conv —
conv2 fwd 1.69 vs 1.53 ms, f+b 2.16 vs 2.00; conv3 fwd 2.23 vs 2.18, f+b
3.68 vs 2.88; whole stem f+b 11.21 vs 7.65 ms.  Root cause: the im2col
patch assembly moves the input 4x through VMEM in f32 (Mosaic's bf16
offset relayouts are corrupt — see _patch — so bf16 assembly is not an
option), and that VPU traffic exceeds the MXU zero-tax it removes; the
MXU multiplies zeros faster than the VPU can gather them away.  Numerics
are exact (f32 bit-level, bf16 error identical to the XLA path vs an f32
ground truth).  Kept, default-off (CROG_FUSED_STEM=1 opts in), as the
measured answer to round-2 VERDICT item #3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (VMEM space)

_OFS = (0, 1, 1, 2)  # padded-input cell offset of slot-row t
_DY = (1, 0, 1, 0)  # block slot (dy or dx) of slot-row t
# VMEM budget for one grid step's double-buffered blocks + scratch; the
# planner picks the cheapest grid split that fits, and blocked_conv3x3_s1
# falls back to the XLA zero-embedded conv when none does (f32 full
# planes — the production stem is bf16 and always fits).
_VMEM_BUDGET = 13_000_000
# test hook: force a specific split ("none" | "n" | "k") regardless of
# the planner's estimate
_FORCE_SPLIT = None


def _conv_plan(hp: int, wpad: int, ci: int, co: int, itemsize: int):
    """Grid split for the forward/dgrad conv on a (B, hp, wpad, 4ci)
    padded input: "none", "n" (output/weight columns halved), or "k"
    (input channels halved into the dy=0/dy=1 slot pairs); None if no
    candidate fits _VMEM_BUDGET."""
    h, wid = hp - 2, wpad - 2
    scratch = _pick_r(h) * wid * 4 * ci * 4  # f32
    wb = 16 * ci * 4 * co * itemsize
    in_b = hp * wpad * 4 * ci * itemsize  # one buffer; x2 when re-fetched
    out_b = h * wid * 4 * co * itemsize
    cand = [
        ("none", 2 * in_b + 2 * out_b + wb + scratch),
        ("n", 2 * in_b + out_b + wb // 2 + scratch),
        ("k", in_b + 2 * out_b + wb + scratch),
    ]
    if _FORCE_SPLIT is not None:
        return _FORCE_SPLIT
    for mode, bytes_ in cand:
        if bytes_ <= _VMEM_BUDGET:
            return mode
    return None


def _wgrad_plan(hp: int, wpad: int, ci: int, co: int, itemsize: int):
    """Grid split for the packed weight grad: "none" or "n" (dy/dwp
    columns halved); None if neither fits."""
    scratch = _pick_r(hp - 2) * (wpad - 2) * 4 * ci * 4
    dwp = 16 * ci * 4 * co * 4  # f32, constant block (not double-buffered)
    in_b = hp * wpad * 4 * ci * itemsize
    dy_b = hp * wpad * 4 * co * itemsize
    cand = [
        ("none", 2 * in_b + 2 * dy_b + dwp + scratch),
        ("n", 2 * in_b + dy_b + dwp + scratch),
    ]
    if _FORCE_SPLIT is not None:
        return "n" if _FORCE_SPLIT != "none" else "none"
    for mode, bytes_ in cand:
        if bytes_ <= _VMEM_BUDGET:
            return mode
    return None


def pack_s1(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,ci,co] -> gathered-patch weight [16*ci, 4*co] (56% dense)."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((16 * ci, 4 * co), w.dtype)
    for t in range(4):
        for s in range(4):
            for dy in range(2):
                for dx in range(2):
                    a, b = t - dy, s - dx
                    if 0 <= a <= 2 and 0 <= b <= 2:
                        out = out.at[
                            (t * 4 + s) * ci:(t * 4 + s + 1) * ci,
                            (dy * 2 + dx) * co:(dy * 2 + dx + 1) * co,
                        ].set(w[a, b])
    return out


def unpack_s1(dwp: jnp.ndarray, ci: int, co: int) -> jnp.ndarray:
    """Adjoint of pack_s1: packed grad [16*ci, 4*co] -> [3,3,ci,co]."""
    rows = []
    for a in range(3):
        cols = []
        for b in range(3):
            blk = 0
            for dy in range(2):
                for dx in range(2):
                    t, s = a + dy, b + dx
                    blk = blk + dwp[
                        (t * 4 + s) * ci:(t * 4 + s + 1) * ci,
                        (dy * 2 + dx) * co:(dy * 2 + dx + 1) * co,
                    ]
            cols.append(blk)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _pick_r(h: int) -> int:
    """Largest row-band size <= 16 that divides h (bounds VMEM transients)."""
    for r in range(min(h, 16), 0, -1):
        if h % r == 0:
            return r
    return 1


def _patch(x_ref, sc_ref, t: int, r0, r: int, w: int, ci: int, base: int):
    """[r*w, 4*ci] im2col block for slot-row t over a band of r output
    cells starting at cell row r0.  x_ref is the (1, H+2, W+2, C) padded
    input block; ``base`` is the channel offset of the t-row's (dy, dx=0)
    slot within that block (2*_DY[t]*ci full-block, 0 in k-split mode).

    The three shifted slices are assembled through the (r, w, 4ci) f32 VMEM
    scratch sc_ref: a direct lane-dim concatenate of slices carrying
    different (sublane, lane) source offsets is unimplemented in Mosaic
    ("result/input offset mismatch on non-concat dimension"); stores
    relayout each piece, and together they cover every scratch lane.

    DTYPE RULE (measured on TPU, 2026-08): Mosaic's bf16 relayouts of
    offset slices silently corrupt the tail sublanes (last band row x one
    sublane tile wrong at every band size), while every f32 relayout is
    bit-exact.  So bf16 values are only ever touched at full-tile, offset-0
    granularity: the band read below slices the UNTILED H axis only (whole
    (W+2, C) tile planes), upcasts in-register, and all sublane/lane-offset
    slicing and scratch stores happen in f32.  Callers cast the returned
    patch back to the GEMM dtype as one full-register cast."""
    rows = x_ref[0, pl.ds(r0 + _OFS[t], r), :, :]  # (r, W+2, C)
    rows = rows.astype(jnp.float32)
    # slot-col order s = 0..3: col offsets (0,1,1,2), dx slots (1,0,1,0);
    # s=1 and s=2 share column offset 1 and are channel-contiguous
    sc_ref[:, :, 0:ci] = rows[:, 0:w, base + ci:base + 2 * ci]
    sc_ref[:, :, ci:3 * ci] = rows[:, 1:w + 1, base:base + 2 * ci]
    sc_ref[:, :, 3 * ci:4 * ci] = rows[:, 2:w + 2, base:base + ci]
    return sc_ref[...].reshape(r * w, 4 * ci)


def _kernel_n(x_ref, w_ref, y_ref, sc_ref, *, r: int, ci: int):
    """Full input block; output (and weight) columns split by grid axis 1."""
    w = y_ref.shape[2]
    cb = y_ref.shape[3]
    nb = y_ref.shape[1] // r

    def band(bi, carry):
        r0 = bi * r
        acc = jnp.zeros((r * w, cb), jnp.float32)
        for t in range(4):
            p = _patch(x_ref, sc_ref, t, r0, r, w, ci, 2 * _DY[t] * ci)
            acc += jax.lax.dot_general(
                p.astype(w_ref.dtype), w_ref[t * 4 * ci:(t + 1) * 4 * ci, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        y_ref[0, pl.ds(r0, r), :, :] = (
            acc.reshape(r, w, cb).astype(y_ref.dtype)
        )
        return carry

    jax.lax.fori_loop(0, nb, band, 0)


def _kernel_k(x_ref, w_ref, y_ref, sc_ref, *, r: int, ci: int):
    """Input channels split into the dy=0 / dy=1 slot pairs by grid axis 1
    (which partitions the slot-row groups t); accumulates into the
    revisited output block."""
    k = pl.program_id(1)
    w = y_ref.shape[2]
    co4 = y_ref.shape[3]
    nb = y_ref.shape[1] // r

    def contrib(r0, ts):
        acc = jnp.zeros((r * w, co4), jnp.float32)
        for t in ts:
            p = _patch(x_ref, sc_ref, t, r0, r, w, ci, 0)
            acc += jax.lax.dot_general(
                p.astype(w_ref.dtype), w_ref[t * 4 * ci:(t + 1) * 4 * ci, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    def band(bi, carry):
        r0 = bi * r
        # grid axis 1 value k selects the dy==k slot pair: t with _DY[t]==k
        acc = jax.lax.cond(
            k == 0,
            lambda: contrib(r0, (1, 3)),
            lambda: contrib(r0, (0, 2)),
        )

        @pl.when(k == 0)
        def _():
            y_ref[0, pl.ds(r0, r), :, :] = (
                acc.reshape(r, w, co4).astype(y_ref.dtype)
            )

        @pl.when(k != 0)
        def _():
            cur = y_ref[0, pl.ds(r0, r), :, :].astype(jnp.float32)
            y_ref[0, pl.ds(r0, r), :, :] = (
                (cur + acc.reshape(r, w, co4)).astype(y_ref.dtype)
            )

        return carry

    jax.lax.fori_loop(0, nb, band, 0)


def _wgrad_kernel(x_ref, dy_ref, dwp_ref, sc_ref, *, r: int, ci: int):
    """Accumulate packed weight grads patch^T @ dy across the grid; the
    dy (= dwp column) axis may be split by grid axis 1."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    cb = dy_ref.shape[3]
    w = x_ref.shape[2] - 2
    h = x_ref.shape[1] - 2
    nb = h // r

    @pl.when((b == 0) & (n == 0))
    def _():
        dwp_ref[...] = jnp.zeros_like(dwp_ref)

    col0 = n * cb

    def band(bi, carry):
        r0 = bi * r
        # full-tile read of the dy band, THEN the sublane-offset column
        # slice in f32 (see the dtype rule in _patch)
        dyb = dy_ref[0, pl.ds(r0 + 1, r), :, :].astype(jnp.float32)
        dyb = dyb[:, 1:w + 1, :].reshape(r * w, cb).astype(dy_ref.dtype)
        for t in range(4):
            p = _patch(x_ref, sc_ref, t, r0, r, w, ci, 2 * _DY[t] * ci)
            g = jax.lax.dot_general(
                p.astype(x_ref.dtype), dyb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwp_ref[
                t * 4 * ci:(t + 1) * 4 * ci, pl.ds(col0, cb)
            ] += g
        return carry

    jax.lax.fori_loop(0, nb, band, 0)


def _conv_padded(xp, wp, ci: int, co: int, interpret: bool):
    """Blocked conv on the 1-cell-zero-padded input xp (B, H+2, W+2, 4ci)
    with packed weight wp [16ci, 4co] -> (B, H, W, 4co) in xp.dtype."""
    bsz, hp, wpad, _ = xp.shape
    h, wid = hp - 2, wpad - 2
    r = _pick_r(h)
    mode = _conv_plan(hp, wpad, ci, co, xp.dtype.itemsize)
    if mode is None:
        mode = "none" if interpret else None
    assert mode is not None, "caller must fall back to the XLA conv"
    if mode == "n":
        # output-column split
        cb = 2 * co
        grid = (bsz, 2)
        kern = functools.partial(_kernel_n, r=r, ci=ci)
        in_specs = [
            pl.BlockSpec((1, hp, wpad, 4 * ci),
                         lambda b, n: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * ci, cb), lambda b, n: (0, n),
                         memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((1, h, wid, cb),
                                lambda b, n: (b, 0, 0, n),
                                memory_space=pltpu.VMEM)
    elif mode == "k":
        # input-channel (slot-pair) split
        grid = (bsz, 2)
        kern = functools.partial(_kernel_k, r=r, ci=ci)
        in_specs = [
            pl.BlockSpec((1, hp, wpad, 2 * ci),
                         lambda b, k: (b, 0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * ci, 4 * co), lambda b, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((1, h, wid, 4 * co),
                                lambda b, k: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (bsz, 1)
        kern = functools.partial(_kernel_n, r=r, ci=ci)
        in_specs = [
            pl.BlockSpec((1, hp, wpad, 4 * ci),
                         lambda b, n: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * ci, 4 * co), lambda b, n: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((1, h, wid, 4 * co),
                                lambda b, n: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, wid, 4 * co), xp.dtype),
        scratch_shapes=[pltpu.VMEM((r, wid, 4 * ci), jnp.float32)],
        interpret=interpret,
    )(xp, wp)


def _wgrad(xp, dyp, ci: int, co: int, interpret: bool):
    """Packed weight grad [16ci, 4co] f32 from padded input and padded
    output cotangent."""
    bsz, hp, wpad, _ = xp.shape
    h = hp - 2
    r = _pick_r(h)
    mode = _wgrad_plan(hp, wpad, ci, co, xp.dtype.itemsize)
    if mode is None:
        mode = "none" if interpret else None
    assert mode is not None, "caller must fall back to the XLA conv"
    if mode == "n":
        cb, ns = 2 * co, 2
    else:
        cb, ns = 4 * co, 1
    return pl.pallas_call(
        functools.partial(_wgrad_kernel, r=r, ci=ci),
        grid=(bsz, ns),
        in_specs=[
            pl.BlockSpec((1, hp, wpad, 4 * ci), lambda b, n: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wpad, cb), lambda b, n: (b, 0, 0, n),
                                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16 * ci, 4 * co), lambda b, n: (0, 0),
                         memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16 * ci, 4 * co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, wpad - 2, 4 * ci), jnp.float32)],
        interpret=interpret,
    )(xp, dyp)


def _pad1(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


def blocked_conv3x3_s1(x, w, interpret: bool = False):
    """3x3 stride-1 pad-1 conv of the 2x2-blocked tensor x (B,H,W,4ci)
    with ORIGINAL kernel w [3,3,ci,co] -> (B,H,W,4co): numerically the
    XLA path conv(x, s2d.block_kernel_s1(w), pad 1) with the structural
    zeros gathered away (f32 MXU accumulation, output cast to x.dtype).

    Falls back to that XLA path when any of the fwd/dgrad/wgrad plans
    exceeds the VMEM budget (f32 full planes; the bf16 stem always fits)."""
    ci, co = w.shape[2], w.shape[3]
    hp, wpad = x.shape[1] + 2, x.shape[2] + 2
    isz = x.dtype.itemsize
    feasible = interpret or (
        _conv_plan(hp, wpad, ci, co, isz) is not None
        and _conv_plan(hp, wpad, co, ci, isz) is not None  # dgrad
        and _wgrad_plan(hp, wpad, ci, co, isz) is not None
    )
    if not feasible:
        from crog_tpu.ops.s2d import block_kernel_s1

        return jax.lax.conv_general_dilated(
            x, block_kernel_s1(w).astype(x.dtype),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    return _fused_conv(x, w, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_conv(x, w, interpret: bool = False):
    y, _ = _conv_fwd(x, w, interpret)
    return y


def _conv_fwd(x, w, interpret):
    ci, co = w.shape[2], w.shape[3]
    wp = pack_s1(w).astype(x.dtype)
    y = _conv_padded(_pad1(x), wp, ci, co, interpret)
    return y, (x, w)


def _conv_fwd_vjp(x, w, interpret):
    return _conv_fwd(x, w, interpret)


def _conv_bwd_vjp(interpret, res, dy):
    x, w = res
    ci, co = w.shape[2], w.shape[3]
    dyp = _pad1(dy)
    # dgrad: the same blocked conv with the flipped, ci/co-swapped kernel
    wt = jnp.transpose(jnp.flip(w, (0, 1)), (0, 1, 3, 2))
    dx = _conv_padded(dyp, pack_s1(wt).astype(dy.dtype), co, ci, interpret)
    dwp = _wgrad(_pad1(x), dyp, ci, co, interpret)
    dw = unpack_s1(dwp, ci, co).astype(w.dtype)
    return dx, dw


_fused_conv.defvjp(_conv_fwd_vjp, _conv_bwd_vjp)
