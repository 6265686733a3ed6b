"""Fused ShuffleNet-V2 stride-1 unit as a single Pallas TPU kernel.

Reference unit: `core/architectures.py:120-145` (keras ShuffleUnit).  The
flax twin lives in `models/shufflenet.py:53-92`; this module fuses that
unit's whole op chain — split, 1x1 conv, BN, act, 3x3 depthwise conv, BN,
1x1 conv, BN, act, concat, channel-shuffle — into ONE pallas_call, because
the training minibatch phase is activation-bandwidth-bound across ~50 small
XLA ops (measured ~1-2% MFU; see CLAUDE.md round-3 perf notes).

TPU-first design (none of this mirrors the reference's graph):

* Layout: channels on lanes, (sample, pixel) rows on sublanes — a unit
  input (N, H, W, C) becomes a (N*H*W, Cp) block, Cp = C padded to 128.
* 1x1 convs are MXU matmuls.  The channel split / concat / shuffle NEVER
  materialise as lane gathers: branch *selection* is absorbed into the
  first conv's weight (rows C/2..C of a (Cp, Hp) matrix), the shuffle
  *placement* of the branch output is absorbed into the last conv's weight
  columns (W3 @ P_b), and the shortcut channels ride a one-hot placement
  matmul (x @ P_s) — permutations cost MXU FLOPs (free: the unit is
  bandwidth-bound) instead of lane shuffles.
* The 3x3 depthwise conv is 9 static sublane rolls with analytic edge
  masks computed from row-index iota (SAME padding, zero outside).  Batch
  tiles align to sample boundaries, so a roll that wraps across the tile
  edge only ever "reaches" rows whose edge mask is zero.
* Training-mode BatchNorm needs batch statistics of three INTERMEDIATE
  activations, which couples all batch tiles.  The kernel runs a
  (4 passes x batch tiles) sequential grid: pass p accumulates the p-th
  BN's sums in persistent VMEM scratch while recomputing the (cheap)
  prefix, and finalises them when pass p+1 begins.  HBM traffic per unit:
  4 reads + 1 write of the activation vs ~10 round-trips unfused.
* Backward is a custom_vjp with the mirrored pass structure (BN backward
  needs batch sums of the upstream grads); weight grads accumulate in
  f32 VMEM scratch and are emitted at the last grid step.  The
  scatter/pad weight prep is plain differentiable XLA, so autodiff
  un-scatters the kernel's weight grads back to the canonical flax tree.
* Inference mode (rollout / eval predicts) has no batch stats, so it is a
  single pass: 1 read + 1 write per unit.

Numerics match flax to float tolerance: stats and normalisation in f32
(flax BatchNorm also promotes), matmuls accumulate in f32 via
preferred_element_type, activations applied to the f32 pre-activation.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-3          # keras BatchNormalization epsilon (parity)
BN_MOMENTUM = 0.99     # keras/flax running-average momentum (parity)

# VMEM liveness budget shared by _plan / fits_vmem / _halo_plan (hardware-
# validated round-4: the backward body holds ~LIVE_EST concurrently-live
# (rows, cp) f32 intermediates; keep them within half the 16 MB scoped-VMEM
# limit, leaving the rest for operands/outputs/scratch and Mosaic's own
# double-buffering).  Retune BOTH consumers by editing these two names only.
LIVE_EST = 20
VMEM_BUDGET = 8 * 1024 * 1024

_TAPS = [(dh, dw) for dh in (-1, 0, 1) for dw in (-1, 0, 1)]  # row-major 3x3

if hasattr(pltpu, "roll"):
    def _roll(x, shift):
        return pltpu.roll(x, shift % x.shape[0], axis=0)
else:  # pragma: no cover - older jax
    def _roll(x, shift):
        return jnp.roll(x, shift, axis=0)


def _pad128(n: int) -> int:
    return max(128, ((n + 127) // 128) * 128)


def _plan(n: int, h: int, w: int, c: int) -> Tuple[int, int, int, int]:
    """Choose (tile_n, n_tiles, cp, hp) for a unit call.  Tiles must
    (a) align to whole samples so depthwise rolls never cross a sample
    boundary unmasked, and (b) have a row count that is a multiple of 16
    sublanes.  Within that, grow the tile under a VMEM liveness budget.

    Budget math (hardware-validated: the first real-TPU backward at the
    old element-counted "4 MB" plan OOM'd scoped VMEM 18.43M > 16M): the
    BACKWARD body is the liveness peak — roughly 20 concurrently-live
    (rows_t, cp) f32 intermediates (forward recompute + BN backwards +
    grads) after the 9 depthwise masks were switched to recompute-in-loop.
    Keep rows_t * cp * 4 * LIVE_EST within half the 16 MB scoped-VMEM
    limit, leaving the rest for operands/outputs/scratch and Mosaic's own
    double-buffering."""
    hw = h * w
    cp, hp = _pad128(c), _pad128(c // 2)
    t_min = 16 // math.gcd(hw, 16)
    bytes_per_row = cp * 4 * LIVE_EST
    tile_n = t_min
    while (tile_n * 2 * hw * bytes_per_row <= VMEM_BUDGET
           and tile_n * 2 <= max(n, t_min)):
        tile_n *= 2
    n_tiles = (n + tile_n - 1) // tile_n
    return tile_n, n_tiles, cp, hp


def fits_vmem(h: int, w: int, c: int) -> bool:
    """Can a stride-1 unit at feature-map (h, w, c) run the SAMPLE-ALIGNED
    fused kernels within scoped VMEM?  The minimum legal tile is t_min whole
    samples (depthwise rolls must not cross sample boundaries + sublane
    alignment); early backbone stages (e.g. the (23, 90) stage-2 maps of the
    90x360 CARLA input, hw=2070) exceed the backward liveness budget even at
    one sample per tile — those dispatch to the HALO-TILED kernels instead
    (see _halo_plan): sub-sample row bands with a 2*(w+1)-row halo read from
    neighbor blocks, so no backbone stage falls back to flax."""
    hw = h * w
    cp = _pad128(c)
    t_min = 16 // math.gcd(hw, 16)
    return t_min * hw * cp * 4 * LIVE_EST <= VMEM_BUDGET


def _halo_plan(n: int, h: int, w: int, c: int):
    """Plan for the halo-tiled kernels (used when fits_vmem is False).

    The flattened (n*h*w, cp) activation is tiled into row bands of
    rows_t = K * h_b rows; each grid step additionally reads one h_b-row
    halo block on each side (prev/next positions, clamped at the array
    ends) and computes the forward prefix on the extended band.  h_b must
    cover the BACKWARD's spatial reach: the transpose depthwise needs
    g_z2 on a (w+1)-row halo, and g_z2 at those rows needs the forward
    recompute at a further (w+1)-row reach — 2*(w+1) total, rounded up to
    a multiple of 16 sublanes.  Any tap reaching past the array ends (or a
    sample boundary) is killed by the image-edge masks, so clamped halo
    blocks contribute garbage only to masked lanes; batch-stat / weight-
    grad accumulations are additionally masked to the band's CENTER rows
    so halo rows are never double-counted.

    Returns (h_b, K, rows_t, n_tiles, cp, hp) or None when even K=1
    exceeds the liveness budget."""
    hw = h * w
    cp, hp = _pad128(c), _pad128(c // 2)
    h_b = ((2 * (w + 1) + 15) // 16) * 16
    bytes_per_row = cp * 4 * LIVE_EST
    K = 1
    while (K + 3) * h_b * bytes_per_row <= VMEM_BUDGET and (K + 1) * h_b < n * hw:
        K += 1
    if (K + 2) * h_b * bytes_per_row > VMEM_BUDGET:
        return None
    rows_t = K * h_b
    n_tiles = (n * hw + rows_t - 1) // rows_t
    return h_b, K, rows_t, n_tiles, cp, hp


def _shuffle_dest(c: int, concat_idx):
    """Destination lane of concat channel i after channel_shuffle(groups=2):
    shuffled[(i%2)*(C/2) + i//2] = concat[i] (models/shufflenet.py:35-40)."""
    return (concat_idx % 2) * (c // 2) + concat_idx // 2


def _placement_matrices(c: int, cp: int, hp: int):
    """One-hot placement matrices built from iota (no big host constants):
    ps (cp, cp): shortcut lane s -> shuffled lane;  pb (hp, cp): branch
    output channel i -> shuffled lane."""
    hc = c // 2
    lanes = jnp.arange(cp)
    s_idx = jnp.arange(cp)
    s_dest = jnp.where(s_idx < hc, _shuffle_dest(c, s_idx), cp + 1)
    ps = (s_dest[:, None] == lanes[None, :]).astype(jnp.float32)
    b_idx = jnp.arange(hp)
    b_dest = jnp.where(b_idx < hc, _shuffle_dest(c, hc + b_idx), cp + 1)
    pb = (b_dest[:, None] == lanes[None, :]).astype(jnp.float32)
    return ps, pb


def prep_unit_operands(params: dict, c: int, compute_dtype=jnp.float32):
    """Pad/scatter a flax stride-1 ShuffleUnit param subtree (names
    Conv_0/BatchNorm_0/Conv_1/BatchNorm_1/Conv_2/BatchNorm_2, see
    models/shufflenet.py:77-84) into kernel operands."""
    hc = c // 2
    cp, hp = _pad128(c), _pad128(hc)
    cd = compute_dtype
    ps, pb = _placement_matrices(c, cp, hp)
    f32 = jnp.float32

    def row(vec, width):
        return jnp.zeros((1, width), f32).at[0, :vec.shape[0]].set(
            vec.astype(f32))

    w1 = params["Conv_0"]["kernel"][0, 0]            # (hc, hc)
    w1p = jnp.zeros((cp, hp), cd).at[hc:c, :hc].set(w1.astype(cd))
    b1 = row(params["Conv_0"]["bias"], hp)
    g1 = row(params["BatchNorm_0"]["scale"], hp)
    be1 = row(params["BatchNorm_0"]["bias"], hp)

    dwk = params["Conv_1"]["kernel"][:, :, 0, :]     # (3, 3, hc)
    dw = jnp.zeros((16, hp), f32).at[:9, :hc].set(dwk.reshape(9, hc).astype(f32))
    dwb = row(params["Conv_1"]["bias"], hp)
    g2 = row(params["BatchNorm_1"]["scale"], hp)
    be2 = row(params["BatchNorm_1"]["bias"], hp)

    w3 = params["Conv_2"]["kernel"][0, 0].astype(cd)  # (hc, hc)
    w3p = jnp.zeros((hp, cp), cd).at[:hc, :].set(jnp.dot(w3, pb[:hc].astype(cd)))
    b3s = jnp.dot(row(params["Conv_2"]["bias"], hp), pb)      # (1, cp)
    g3s = jnp.dot(row(params["BatchNorm_2"]["scale"], hp), pb)
    be3s = jnp.dot(row(params["BatchNorm_2"]["bias"], hp), pb)

    bmask = jnp.dot(jnp.ones((1, hp), f32).at[0, hc:].set(0.0), pb)  # (1, cp)
    return (w1p, b1, g1, be1, dw, dwb, g2, be2, w3p, b3s, g3s, be3s,
            ps.astype(cd), pb, bmask)


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

def _mdot(a, b, mxu_bf16, contract=None):
    """MXU matmul with f32 accumulation.  With mxu_bf16 the OPERANDS are
    cast to bfloat16 first — one MXU pass instead of the three passes a
    true-f32 matmul costs, matching the precision flax/XLA training already
    uses on TPU (jax's default matmul precision).  Round-4 finding: the
    kernel's true-f32 passes were one of the two reasons fused_units
    measured speed-neutral (612.5 vs 600.3 steps/s in the real program)."""
    if mxu_bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    if contract is None:
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, contract,
                               preferred_element_type=jnp.float32)


def _act(x, leak):
    return jnp.minimum(jnp.where(x >= 0.0, x, leak * x), 6.0)


def _act_grad(x, leak):
    return jnp.where(x < 0.0, leak, jnp.where(x <= 6.0, 1.0, 0.0))


def _row_geometry(offset, rows, h, w, r_true):
    """Per-row image coordinates + global-row validity for `rows` rows
    starting at flattened global row `offset` (negative in a halo tile's
    leading halo).  Out-of-range rows (pad tail, pre-array halo) get
    valid=0; their hh/ww are nominal but every consumer masks by valid or
    by image-edge masks."""
    hw = h * w
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + offset
    hh = (rid % hw) // w
    ww = rid % w
    valid = ((rid >= 0) & (rid < r_true)).astype(jnp.float32)
    return hh, ww, valid


def _dw_forward(b1, dw_ref, dwb_ref, hh, ww, h, w):
    """3x3 SAME depthwise conv via 9 masked sublane rolls."""
    z2 = jnp.broadcast_to(dwb_ref[0:1, :], b1.shape).astype(jnp.float32)
    for k, (dh, dwi) in enumerate(_TAPS):
        off = dh * w + dwi
        shifted = _roll(b1, -off) if off else b1
        m = (((hh + dh) >= 0) & ((hh + dh) < h) &
             ((ww + dwi) >= 0) & ((ww + dwi) < w)).astype(jnp.float32)
        z2 = z2 + dw_ref[k:k + 1, :] * (shifted * m)
    return z2


def _prefix(x, ops, fin, hh, ww, h, w, leak, cd, upto, mxu=False):
    """Forward prefix with finalized stats rows `fin`.  Returns
    (z1, xh1, pre1, b1, z2, xh2, b2n, u) with later entries None when
    upto stops earlier (1: z1; 2: +z2; 3: +u)."""
    (w1_ref, b1_ref, g1_ref, be1_ref, dw_ref, dwb_ref, g2_ref, be2_ref,
     w3_ref, b3s_ref) = ops
    z1 = _mdot(x, w1_ref[...], mxu) + b1_ref[0:1, :]
    if upto == 1:
        return z1, None, None, None, None, None, None, None
    xh1 = (z1 - fin["m1"]) * fin["r1"]
    pre1 = g1_ref[0:1, :] * xh1 + be1_ref[0:1, :]
    b1 = _act(pre1, leak)
    z2 = _dw_forward(b1, dw_ref, dwb_ref, hh, ww, h, w)
    if upto == 2:
        return z1, xh1, pre1, b1, z2, None, None, None
    xh2 = (z2 - fin["m2"]) * fin["r2"]
    b2n = g2_ref[0:1, :] * xh2 + be2_ref[0:1, :]
    u = _mdot(b2n.astype(cd), w3_ref[...], mxu) + b3s_ref[0:1, :]
    return z1, xh1, pre1, b1, z2, xh2, b2n, u


def _make_fwd_kernel(n_tiles, h, w, r_true, eps, leak, cd, mxu):
    inv_m = 1.0 / float(r_true)

    def kernel(x_ref, w1_ref, b1_ref, g1_ref, be1_ref, dw_ref, dwb_ref,
               g2_ref, be2_ref, w3_ref, b3s_ref, g3s_ref, be3s_ref, ps_ref,
               pb_ref, out_ref, stats_ref, acc_h, acc_c, fin_h, fin_c):
        p = pl.program_id(0)
        t = pl.program_id(1)
        rows_t = x_ref.shape[0]
        hh, ww, valid = _row_geometry(t * rows_t, rows_t, h, w, r_true)
        x = x_ref[...]
        ops = (w1_ref, b1_ref, g1_ref, be1_ref, dw_ref, dwb_ref, g2_ref,
               be2_ref, w3_ref, b3s_ref)

        @pl.when((p == 0) & (t == 0))
        def _():
            acc_h[...] = jnp.zeros_like(acc_h)
            acc_c[...] = jnp.zeros_like(acc_c)

        @pl.when((p == 1) & (t == 0))
        def _():
            m = acc_h[0:1, :] * inv_m
            v = acc_h[1:2, :] * inv_m - m * m
            fin_h[0:1, :] = m
            fin_h[1:2, :] = jax.lax.rsqrt(v + eps)

        @pl.when((p == 2) & (t == 0))
        def _():
            m = acc_h[2:3, :] * inv_m
            v = acc_h[3:4, :] * inv_m - m * m
            fin_h[2:3, :] = m
            fin_h[3:4, :] = jax.lax.rsqrt(v + eps)

        @pl.when((p == 3) & (t == 0))
        def _():
            m = acc_c[0:1, :] * inv_m
            v = acc_c[1:2, :] * inv_m - m * m
            fin_c[0:1, :] = m
            fin_c[1:2, :] = jax.lax.rsqrt(v + eps)

        fin = dict(m1=fin_h[0:1, :], r1=fin_h[1:2, :], m2=fin_h[2:3, :],
                   r2=fin_h[3:4, :], m3=fin_c[0:1, :], r3=fin_c[1:2, :])

        @pl.when(p == 0)
        def _():
            z1 = _prefix(x, ops, fin, hh, ww, h, w, leak, cd, 1, mxu)[0]
            zv = z1 * valid
            acc_h[0:1, :] += jnp.sum(zv, axis=0, keepdims=True)
            acc_h[1:2, :] += jnp.sum(zv * z1, axis=0, keepdims=True)

        @pl.when(p == 1)
        def _():
            z2 = _prefix(x, ops, fin, hh, ww, h, w, leak, cd, 2, mxu)[4]
            zv = z2 * valid
            acc_h[2:3, :] += jnp.sum(zv, axis=0, keepdims=True)
            acc_h[3:4, :] += jnp.sum(zv * z2, axis=0, keepdims=True)

        @pl.when(p == 2)
        def _():
            u = _prefix(x, ops, fin, hh, ww, h, w, leak, cd, 3, mxu)[7]
            uv = u * valid
            acc_c[0:1, :] += jnp.sum(uv, axis=0, keepdims=True)
            acc_c[1:2, :] += jnp.sum(uv * u, axis=0, keepdims=True)

        @pl.when(p == 3)
        def _():
            u = _prefix(x, ops, fin, hh, ww, h, w, leak, cd, 3, mxu)[7]
            xh3 = (u - fin["m3"]) * fin["r3"]
            y3 = _act(g3s_ref[0:1, :] * xh3 + be3s_ref[0:1, :], leak)
            sc = _mdot(x, ps_ref[...], mxu)
            out_ref[...] = (y3 + sc).astype(out_ref.dtype)

            @pl.when(t == n_tiles - 1)
            def _():
                cp = stats_ref.shape[1]
                hp = acc_h.shape[1]
                pad = [(0, 0), (0, cp - hp)]
                m1 = acc_h[0:1, :] * inv_m
                m2 = acc_h[2:3, :] * inv_m
                m3 = fin["m3"]
                v3 = acc_c[1:2, :] * inv_m - m3 * m3
                contract = (((1,), (1,)), ((), ()))
                m3l = jax.lax.dot_general(m3, pb_ref[...], contract,
                                          preferred_element_type=jnp.float32)
                v3l = jax.lax.dot_general(v3, pb_ref[...], contract,
                                          preferred_element_type=jnp.float32)
                stats_ref[0:1, :] = jnp.pad(m1, pad)
                stats_ref[1:2, :] = jnp.pad(acc_h[1:2, :] * inv_m - m1 * m1, pad)
                stats_ref[2:3, :] = jnp.pad(m2, pad)
                stats_ref[3:4, :] = jnp.pad(acc_h[3:4, :] * inv_m - m2 * m2, pad)
                stats_ref[4:5, :] = jnp.pad(m3l, pad)
                stats_ref[5:6, :] = jnp.pad(v3l, pad)
                stats_ref[6:8, :] = jnp.zeros((2, cp), jnp.float32)

    return kernel


def _make_infer_kernel(h, w, r_true, leak, cd, mxu):
    def kernel(x_ref, w1_ref, b1_ref, g1_ref, be1_ref, dw_ref, dwb_ref,
               g2_ref, be2_ref, w3_ref, b3s_ref, g3s_ref, be3s_ref, ps_ref,
               sth_ref, stc_ref, out_ref):
        t = pl.program_id(0)
        rows_t = x_ref.shape[0]
        hh, ww, _ = _row_geometry(t * rows_t, rows_t, h, w, r_true)
        fin = dict(m1=sth_ref[0:1, :], r1=sth_ref[1:2, :],
                   m2=sth_ref[2:3, :], r2=sth_ref[3:4, :],
                   m3=stc_ref[0:1, :], r3=stc_ref[1:2, :])
        x = x_ref[...]
        ops = (w1_ref, b1_ref, g1_ref, be1_ref, dw_ref, dwb_ref, g2_ref,
               be2_ref, w3_ref, b3s_ref)
        u = _prefix(x, ops, fin, hh, ww, h, w, leak, cd, 3, mxu)[7]
        xh3 = (u - fin["m3"]) * fin["r3"]
        y3 = _act(g3s_ref[0:1, :] * xh3 + be3s_ref[0:1, :], leak)
        sc = _mdot(x, ps_ref[...], mxu)
        out_ref[...] = (y3 + sc).astype(out_ref.dtype)

    return kernel


def _make_bwd_kernel(n_tiles, h, w, r_true, leak, cd, mxu):
    inv_m = 1.0 / float(r_true)
    f32 = jnp.float32

    def kernel(x_ref, g_ref, w1_ref, b1_ref, g1_ref, be1_ref, dw_ref,
               dwb_ref, g2_ref, be2_ref, w3_ref, b3s_ref, g3s_ref, be3s_ref,
               ps_ref, bmask_ref, sth_ref, stc_ref,
               gx_ref, dw1_ref, ddw_ref, dw3_ref, dvec_ref,
               bacc_h, bacc_c, sdw1, sddw, sdw3, sbias_h, sbias_c):
        p = pl.program_id(0)
        t = pl.program_id(1)
        rows_t = x_ref.shape[0]
        hh, ww, valid = _row_geometry(t * rows_t, rows_t, h, w, r_true)

        @pl.when((p == 0) & (t == 0))
        def _():
            bacc_h[...] = jnp.zeros_like(bacc_h)
            bacc_c[...] = jnp.zeros_like(bacc_c)
            sdw1[...] = jnp.zeros_like(sdw1)
            sddw[...] = jnp.zeros_like(sddw)
            sdw3[...] = jnp.zeros_like(sdw3)
            sbias_h[...] = jnp.zeros_like(sbias_h)
            sbias_c[...] = jnp.zeros_like(sbias_c)

        fin = dict(m1=sth_ref[0:1, :], r1=sth_ref[1:2, :],
                   m2=sth_ref[2:3, :], r2=sth_ref[3:4, :],
                   m3=stc_ref[0:1, :], r3=stc_ref[1:2, :])
        x = x_ref[...]
        ops = (w1_ref, b1_ref, g1_ref, be1_ref, dw_ref, dwb_ref, g2_ref,
               be2_ref, w3_ref, b3s_ref)
        # recompute the whole forward (stats are inputs -> no cross-pass
        # dependence for forward quantities; only backward sums are).
        _, xh1, pre1, b1, _, xh2, b2n, u = _prefix(
            x, ops, fin, hh, ww, h, w, leak, cd, 3, mxu)
        xh3 = (u - fin["m3"]) * fin["r3"]
        pre3 = g3s_ref[0:1, :] * xh3 + be3s_ref[0:1, :]
        g_out = g_ref[...].astype(f32)
        g_a3 = g_out * _act_grad(pre3, leak) * bmask_ref[0:1, :]

        @pl.when(p == 0)
        def _():
            bacc_c[0:1, :] += jnp.sum(g_a3, axis=0, keepdims=True)
            bacc_c[1:2, :] += jnp.sum(g_a3 * xh3, axis=0, keepdims=True)

        # bn3 backward (valid once pass 0 completed: p >= 1).  The BN mean
        # terms are nonzero on PADDED rows (g=0 there but the batch-sum
        # correction isn't) — mask each BN-backward output by row validity
        # or the weight grads / downstream batch sums absorb pad garbage.
        s1 = bacc_c[0:1, :]
        s2 = bacc_c[1:2, :]
        g_u = g3s_ref[0:1, :] * fin["r3"] * (
            g_a3 - (s1 + xh3 * s2) * inv_m) * valid
        contract_lanes = (((1,), (1,)), ((), ()))
        g_b2n = _mdot(g_u, w3_ref[...].astype(f32), mxu, contract_lanes)

        @pl.when(p == 1)
        def _():
            bacc_h[0:1, :] += jnp.sum(g_b2n, axis=0, keepdims=True)
            bacc_h[1:2, :] += jnp.sum(g_b2n * xh2, axis=0, keepdims=True)

        # bn2 backward (valid for p >= 2)
        t1 = bacc_h[0:1, :]
        t2 = bacc_h[1:2, :]
        g_z2 = g2_ref[0:1, :] * fin["r2"] * (
            g_b2n - (t1 + xh2 * t2) * inv_m) * valid
        # depthwise transpose: g_b1[r] = sum_k w_k * (g_z2*mask_k)[r - off_k]
        # NOTE: masks are RECOMPUTED in the weight-grad loop below instead of
        # kept in a list — 9 saved (rows_t, cp) arrays were ~a third of the
        # backward body's VMEM liveness (hardware scoped-VMEM OOM, round-4)
        def tap_mask(dh, dwi):
            return (((hh + dh) >= 0) & ((hh + dh) < h) &
                    ((ww + dwi) >= 0) & ((ww + dwi) < w)).astype(f32)

        g_b1 = jnp.zeros_like(g_z2)
        for k, (dh, dwi) in enumerate(_TAPS):
            off = dh * w + dwi
            gm = g_z2 * tap_mask(dh, dwi)
            g_b1 = g_b1 + dw_ref[k:k + 1, :] * (_roll(gm, off) if off else gm)
        g_pre1 = g_b1 * _act_grad(pre1, leak) * valid

        @pl.when(p == 2)
        def _():
            bacc_h[2:3, :] += jnp.sum(g_pre1, axis=0, keepdims=True)
            bacc_h[3:4, :] += jnp.sum(g_pre1 * xh1, axis=0, keepdims=True)

        @pl.when(p == 3)
        def _():
            u1 = bacc_h[2:3, :]
            u2 = bacc_h[3:4, :]
            g_z1 = g1_ref[0:1, :] * fin["r1"] * (
                g_pre1 - (u1 + xh1 * u2) * inv_m) * valid
            gx = _mdot(g_z1.astype(cd), w1_ref[...], mxu, contract_lanes)
            gx = gx + _mdot(g_ref[...], ps_ref[...], mxu, contract_lanes)
            gx_ref[...] = gx.astype(gx_ref.dtype)

            contract_rows = (((0,), (0,)), ((), ()))
            sdw1[...] += _mdot(x.astype(f32), g_z1, mxu, contract_rows)
            sdw3[...] += _mdot(b2n, g_u, mxu, contract_rows)
            sbias_h[0:1, :] += jnp.sum(g_z1, axis=0, keepdims=True)
            sbias_h[1:2, :] += jnp.sum(g_z2, axis=0, keepdims=True)
            sbias_c[0:1, :] += jnp.sum(g_u, axis=0, keepdims=True)
            for k, (dh, dwi) in enumerate(_TAPS):
                off = dh * w + dwi
                shifted = (_roll(b1, -off) if off else b1) * tap_mask(dh, dwi)
                sddw[k:k + 1, :] += jnp.sum(shifted * g_z2, axis=0,
                                            keepdims=True)

            @pl.when(t == n_tiles - 1)
            def _():
                cp = dvec_ref.shape[1]
                hp = bacc_h.shape[1]
                pad = [(0, 0), (0, cp - hp)]
                dw1_ref[...] = sdw1[...]
                ddw_ref[...] = sddw[...]
                dw3_ref[...] = sdw3[...]
                dvec_ref[0:1, :] = jnp.pad(sbias_h[0:1, :], pad)   # dbias1
                dvec_ref[1:2, :] = jnp.pad(sbias_h[1:2, :], pad)   # ddwbias
                dvec_ref[2:3, :] = sbias_c[0:1, :]                 # dbias3s
                dvec_ref[3:4, :] = jnp.pad(bacc_h[3:4, :], pad)    # dgamma1
                dvec_ref[4:5, :] = jnp.pad(bacc_h[2:3, :], pad)    # dbeta1
                dvec_ref[5:6, :] = jnp.pad(bacc_h[1:2, :], pad)    # dgamma2
                dvec_ref[6:7, :] = jnp.pad(bacc_h[0:1, :], pad)    # dbeta2
                dvec_ref[7:8, :] = bacc_c[1:2, :]                  # dgamma3s
                dvec_ref[8:9, :] = bacc_c[0:1, :]                  # dbeta3s
                dvec_ref[9:16, :] = jnp.zeros((7, cp), f32)

    return kernel


# ---------------------------------------------------------------------------
# halo-tiled kernel bodies (used when fits_vmem is False — e.g. the stage-2
# (23, 90, 48) maps).  Tiles are rows_t-row bands of the flattened
# activation plus an h_b-row halo block on each side; h_b >= 2*(w+1) covers
# the backward's spatial reach (see _halo_plan).  Batch-stat and weight-
# grad accumulations mask to the band's CENTER rows; per-row quantities on
# halo rows are computed normally (they are real neighbor rows) and taps
# reaching past sample/array boundaries are killed by the image-edge masks.
# ---------------------------------------------------------------------------


def _center_mask(rows_e, h_b, rows_t, valid):
    j = jax.lax.broadcasted_iota(jnp.int32, (rows_e, 1), 0)
    return ((j >= h_b) & (j < h_b + rows_t)).astype(jnp.float32) * valid


def _make_fwd_halo_kernel(n_tiles, h, w, r_true, eps, leak, cd, mxu, h_b,
                          rows_t):
    inv_m = 1.0 / float(r_true)
    rows_e = rows_t + 2 * h_b

    def kernel(xp_ref, x_ref, xn_ref, w1_ref, b1_ref, g1_ref, be1_ref,
               dw_ref, dwb_ref, g2_ref, be2_ref, w3_ref, b3s_ref, g3s_ref,
               be3s_ref, ps_ref, pb_ref, out_ref, stats_ref,
               acc_h, acc_c, fin_h, fin_c):
        p = pl.program_id(0)
        t = pl.program_id(1)
        hh, ww, valid = _row_geometry(t * rows_t - h_b, rows_e, h, w, r_true)
        x = jnp.concatenate([xp_ref[...], x_ref[...], xn_ref[...]], axis=0)
        center = _center_mask(rows_e, h_b, rows_t, valid)
        ops = (w1_ref, b1_ref, g1_ref, be1_ref, dw_ref, dwb_ref, g2_ref,
               be2_ref, w3_ref, b3s_ref)

        @pl.when((p == 0) & (t == 0))
        def _():
            acc_h[...] = jnp.zeros_like(acc_h)
            acc_c[...] = jnp.zeros_like(acc_c)

        @pl.when((p == 1) & (t == 0))
        def _():
            m = acc_h[0:1, :] * inv_m
            v = acc_h[1:2, :] * inv_m - m * m
            fin_h[0:1, :] = m
            fin_h[1:2, :] = jax.lax.rsqrt(v + eps)

        @pl.when((p == 2) & (t == 0))
        def _():
            m = acc_h[2:3, :] * inv_m
            v = acc_h[3:4, :] * inv_m - m * m
            fin_h[2:3, :] = m
            fin_h[3:4, :] = jax.lax.rsqrt(v + eps)

        @pl.when((p == 3) & (t == 0))
        def _():
            m = acc_c[0:1, :] * inv_m
            v = acc_c[1:2, :] * inv_m - m * m
            fin_c[0:1, :] = m
            fin_c[1:2, :] = jax.lax.rsqrt(v + eps)

        fin = dict(m1=fin_h[0:1, :], r1=fin_h[1:2, :], m2=fin_h[2:3, :],
                   r2=fin_h[3:4, :], m3=fin_c[0:1, :], r3=fin_c[1:2, :])

        @pl.when(p == 0)
        def _():
            z1 = _prefix(x, ops, fin, hh, ww, h, w, leak, cd, 1, mxu)[0]
            zv = z1 * center
            acc_h[0:1, :] += jnp.sum(zv, axis=0, keepdims=True)
            acc_h[1:2, :] += jnp.sum(zv * z1, axis=0, keepdims=True)

        @pl.when(p == 1)
        def _():
            z2 = _prefix(x, ops, fin, hh, ww, h, w, leak, cd, 2, mxu)[4]
            zv = z2 * center
            acc_h[2:3, :] += jnp.sum(zv, axis=0, keepdims=True)
            acc_h[3:4, :] += jnp.sum(zv * z2, axis=0, keepdims=True)

        @pl.when(p == 2)
        def _():
            u = _prefix(x, ops, fin, hh, ww, h, w, leak, cd, 3, mxu)[7]
            uv = u * center
            acc_c[0:1, :] += jnp.sum(uv, axis=0, keepdims=True)
            acc_c[1:2, :] += jnp.sum(uv * u, axis=0, keepdims=True)

        @pl.when(p == 3)
        def _():
            u = _prefix(x, ops, fin, hh, ww, h, w, leak, cd, 3, mxu)[7]
            xh3 = (u - fin["m3"]) * fin["r3"]
            y3 = _act(g3s_ref[0:1, :] * xh3 + be3s_ref[0:1, :], leak)
            sc = _mdot(x, ps_ref[...], mxu)
            out_ref[...] = (y3 + sc)[h_b:h_b + rows_t].astype(out_ref.dtype)

            @pl.when(t == n_tiles - 1)
            def _():
                cp = stats_ref.shape[1]
                hp = acc_h.shape[1]
                pad = [(0, 0), (0, cp - hp)]
                m1 = acc_h[0:1, :] * inv_m
                m2 = acc_h[2:3, :] * inv_m
                m3 = fin["m3"]
                v3 = acc_c[1:2, :] * inv_m - m3 * m3
                contract = (((1,), (1,)), ((), ()))
                m3l = jax.lax.dot_general(m3, pb_ref[...], contract,
                                          preferred_element_type=jnp.float32)
                v3l = jax.lax.dot_general(v3, pb_ref[...], contract,
                                          preferred_element_type=jnp.float32)
                stats_ref[0:1, :] = jnp.pad(m1, pad)
                stats_ref[1:2, :] = jnp.pad(acc_h[1:2, :] * inv_m - m1 * m1, pad)
                stats_ref[2:3, :] = jnp.pad(m2, pad)
                stats_ref[3:4, :] = jnp.pad(acc_h[3:4, :] * inv_m - m2 * m2, pad)
                stats_ref[4:5, :] = jnp.pad(m3l, pad)
                stats_ref[5:6, :] = jnp.pad(v3l, pad)
                stats_ref[6:8, :] = jnp.zeros((2, cp), jnp.float32)

    return kernel


def _make_infer_halo_kernel(h, w, r_true, leak, cd, mxu, h_b, rows_t):
    rows_e = rows_t + 2 * h_b

    def kernel(xp_ref, x_ref, xn_ref, w1_ref, b1_ref, g1_ref, be1_ref,
               dw_ref, dwb_ref, g2_ref, be2_ref, w3_ref, b3s_ref, g3s_ref,
               be3s_ref, ps_ref, sth_ref, stc_ref, out_ref):
        t = pl.program_id(0)
        hh, ww, _ = _row_geometry(t * rows_t - h_b, rows_e, h, w, r_true)
        fin = dict(m1=sth_ref[0:1, :], r1=sth_ref[1:2, :],
                   m2=sth_ref[2:3, :], r2=sth_ref[3:4, :],
                   m3=stc_ref[0:1, :], r3=stc_ref[1:2, :])
        x = jnp.concatenate([xp_ref[...], x_ref[...], xn_ref[...]], axis=0)
        ops = (w1_ref, b1_ref, g1_ref, be1_ref, dw_ref, dwb_ref, g2_ref,
               be2_ref, w3_ref, b3s_ref)
        u = _prefix(x, ops, fin, hh, ww, h, w, leak, cd, 3, mxu)[7]
        xh3 = (u - fin["m3"]) * fin["r3"]
        y3 = _act(g3s_ref[0:1, :] * xh3 + be3s_ref[0:1, :], leak)
        sc = _mdot(x, ps_ref[...], mxu)
        out_ref[...] = (y3 + sc)[h_b:h_b + rows_t].astype(out_ref.dtype)

    return kernel


def _make_bwd_halo_kernel(n_tiles, h, w, r_true, leak, cd, mxu, h_b, rows_t):
    inv_m = 1.0 / float(r_true)
    f32 = jnp.float32
    rows_e = rows_t + 2 * h_b

    def kernel(xp_ref, x_ref, xn_ref, gp_ref, g_ref, gn_ref,
               w1_ref, b1_ref, g1_ref, be1_ref, dw_ref,
               dwb_ref, g2_ref, be2_ref, w3_ref, b3s_ref, g3s_ref, be3s_ref,
               ps_ref, bmask_ref, sth_ref, stc_ref,
               gx_ref, dw1_ref, ddw_ref, dw3_ref, dvec_ref,
               bacc_h, bacc_c, sdw1, sddw, sdw3, sbias_h, sbias_c):
        p = pl.program_id(0)
        t = pl.program_id(1)
        hh, ww, valid = _row_geometry(t * rows_t - h_b, rows_e, h, w, r_true)
        center = _center_mask(rows_e, h_b, rows_t, valid)

        @pl.when((p == 0) & (t == 0))
        def _():
            bacc_h[...] = jnp.zeros_like(bacc_h)
            bacc_c[...] = jnp.zeros_like(bacc_c)
            sdw1[...] = jnp.zeros_like(sdw1)
            sddw[...] = jnp.zeros_like(sddw)
            sdw3[...] = jnp.zeros_like(sdw3)
            sbias_h[...] = jnp.zeros_like(sbias_h)
            sbias_c[...] = jnp.zeros_like(sbias_c)

        fin = dict(m1=sth_ref[0:1, :], r1=sth_ref[1:2, :],
                   m2=sth_ref[2:3, :], r2=sth_ref[3:4, :],
                   m3=stc_ref[0:1, :], r3=stc_ref[1:2, :])
        x = jnp.concatenate([xp_ref[...], x_ref[...], xn_ref[...]], axis=0)
        ops = (w1_ref, b1_ref, g1_ref, be1_ref, dw_ref, dwb_ref, g2_ref,
               be2_ref, w3_ref, b3s_ref)
        _, xh1, pre1, b1, _, xh2, b2n, u = _prefix(
            x, ops, fin, hh, ww, h, w, leak, cd, 3, mxu)
        xh3 = (u - fin["m3"]) * fin["r3"]
        pre3 = g3s_ref[0:1, :] * xh3 + be3s_ref[0:1, :]
        g_out = jnp.concatenate([gp_ref[...], g_ref[...], gn_ref[...]],
                                axis=0).astype(f32)
        g_a3 = g_out * _act_grad(pre3, leak) * bmask_ref[0:1, :]

        @pl.when(p == 0)
        def _():
            gc = g_a3 * center
            bacc_c[0:1, :] += jnp.sum(gc, axis=0, keepdims=True)
            bacc_c[1:2, :] += jnp.sum(gc * xh3, axis=0, keepdims=True)

        # bn3 backward (global sums valid once pass 0 completed: p >= 1).
        # `valid` zeroes pad/pre-array rows; halo rows of real neighbors
        # stay LIVE (the transpose depthwise below needs them) — only the
        # accumulations mask to center.
        s1 = bacc_c[0:1, :]
        s2 = bacc_c[1:2, :]
        g_u = g3s_ref[0:1, :] * fin["r3"] * (
            g_a3 - (s1 + xh3 * s2) * inv_m) * valid
        contract_lanes = (((1,), (1,)), ((), ()))
        g_b2n = _mdot(g_u, w3_ref[...].astype(f32), mxu, contract_lanes)

        @pl.when(p == 1)
        def _():
            gc = g_b2n * center
            bacc_h[0:1, :] += jnp.sum(gc, axis=0, keepdims=True)
            bacc_h[1:2, :] += jnp.sum(gc * xh2, axis=0, keepdims=True)

        # bn2 backward (valid for p >= 2)
        t1 = bacc_h[0:1, :]
        t2 = bacc_h[1:2, :]
        g_z2 = g2_ref[0:1, :] * fin["r2"] * (
            g_b2n - (t1 + xh2 * t2) * inv_m) * valid

        def tap_mask(dh, dwi):
            return (((hh + dh) >= 0) & ((hh + dh) < h) &
                    ((ww + dwi) >= 0) & ((ww + dwi) < w)).astype(f32)

        g_b1 = jnp.zeros_like(g_z2)
        for k, (dh, dwi) in enumerate(_TAPS):
            off = dh * w + dwi
            gm = g_z2 * tap_mask(dh, dwi)
            g_b1 = g_b1 + dw_ref[k:k + 1, :] * (_roll(gm, off) if off else gm)
        g_pre1 = g_b1 * _act_grad(pre1, leak) * valid

        @pl.when(p == 2)
        def _():
            gc = g_pre1 * center
            bacc_h[2:3, :] += jnp.sum(gc, axis=0, keepdims=True)
            bacc_h[3:4, :] += jnp.sum(gc * xh1, axis=0, keepdims=True)

        @pl.when(p == 3)
        def _():
            u1 = bacc_h[2:3, :]
            u2 = bacc_h[3:4, :]
            g_z1 = g1_ref[0:1, :] * fin["r1"] * (
                g_pre1 - (u1 + xh1 * u2) * inv_m) * valid
            g_z1c = g_z1 * center
            gx = _mdot(g_z1.astype(cd)[h_b:h_b + rows_t], w1_ref[...], mxu,
                       contract_lanes)
            gx = gx + _mdot(g_ref[...], ps_ref[...], mxu, contract_lanes)
            gx_ref[...] = gx.astype(gx_ref.dtype)

            contract_rows = (((0,), (0,)), ((), ()))
            sdw1[...] += _mdot(x.astype(f32), g_z1c, mxu, contract_rows)
            g_uc = g_u * center
            sdw3[...] += _mdot(b2n, g_uc, mxu, contract_rows)
            g_z2c = g_z2 * center
            sbias_h[0:1, :] += jnp.sum(g_z1c, axis=0, keepdims=True)
            sbias_h[1:2, :] += jnp.sum(g_z2c, axis=0, keepdims=True)
            sbias_c[0:1, :] += jnp.sum(g_uc, axis=0, keepdims=True)
            for k, (dh, dwi) in enumerate(_TAPS):
                off = dh * w + dwi
                shifted = (_roll(b1, -off) if off else b1) * tap_mask(dh, dwi)
                sddw[k:k + 1, :] += jnp.sum(shifted * g_z2c, axis=0,
                                            keepdims=True)

            @pl.when(t == n_tiles - 1)
            def _():
                cp = dvec_ref.shape[1]
                hp = bacc_h.shape[1]
                pad = [(0, 0), (0, cp - hp)]
                dw1_ref[...] = sdw1[...]
                ddw_ref[...] = sddw[...]
                dw3_ref[...] = sdw3[...]
                dvec_ref[0:1, :] = jnp.pad(sbias_h[0:1, :], pad)   # dbias1
                dvec_ref[1:2, :] = jnp.pad(sbias_h[1:2, :], pad)   # ddwbias
                dvec_ref[2:3, :] = sbias_c[0:1, :]                 # dbias3s
                dvec_ref[3:4, :] = jnp.pad(bacc_h[3:4, :], pad)    # dgamma1
                dvec_ref[4:5, :] = jnp.pad(bacc_h[2:3, :], pad)    # dbeta1
                dvec_ref[5:6, :] = jnp.pad(bacc_h[1:2, :], pad)    # dgamma2
                dvec_ref[6:7, :] = jnp.pad(bacc_h[0:1, :], pad)    # dbeta2
                dvec_ref[7:8, :] = bacc_c[1:2, :]                  # dgamma3s
                dvec_ref[8:9, :] = bacc_c[0:1, :]                  # dbeta3s
                dvec_ref[9:16, :] = jnp.zeros((7, cp), f32)

    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# ---------------------------------------------------------------------------

def _layout(n, h, w, c):
    """Static mode + padded-row layout for a call geometry: ("sample",
    rows_t, n_tiles, cp, hp, 0) with sample-aligned tiles when they fit
    VMEM, else ("halo", rows_t, n_tiles, cp, hp, h_b)."""
    if fits_vmem(h, w, c):
        tile_n, n_tiles, cp, hp = _plan(n, h, w, c)
        return "sample", tile_n * h * w, n_tiles, cp, hp, 0
    plan = _halo_plan(n, h, w, c)
    if plan is None:  # pragma: no cover - no backbone shape hits this
        raise ValueError(f"shuffle unit ({h},{w},{c}) fits neither the "
                         f"sample-aligned nor the halo-tiled VMEM plan")
    h_b, _K, rows_t, n_tiles, cp, hp = plan
    return "halo", rows_t, n_tiles, cp, hp, h_b


def supports(h: int, w: int, c: int) -> bool:
    """True when SOME fused plan (sample-aligned or halo-tiled) covers the
    feature-map geometry — the caller-facing gate (models/shufflenet.py).
    CDRL_PUNIT_NO_HALO=1 restores the round-4 behavior (halo-needing
    stages fall back to flax — fault bisection knob)."""
    import os
    if os.environ.get("CDRL_PUNIT_NO_HALO"):
        return fits_vmem(h, w, c)
    return fits_vmem(h, w, c) or _halo_plan(1, h, w, c) is not None


def _halo_specs(rows_t, n_tiles, cp, h_b, two_idx):
    """(prev-halo, center, next-halo) BlockSpecs for one array.  two_idx:
    index maps take (p, t) for the 2-D train grids, (t,) for inference."""
    K = rows_t // h_b
    last = n_tiles * K - 1
    if two_idx:
        prev = lambda p, t: (jnp.maximum(t * K - 1, 0), 0)
        cur = lambda p, t: (t, 0)
        nxt = lambda p, t: (jnp.minimum(t * K + K, last), 0)
    else:
        prev = lambda t: (jnp.maximum(t * K - 1, 0), 0)
        cur = lambda t: (t, 0)
        nxt = lambda t: (jnp.minimum(t * K + K, last), 0)
    return [pl.BlockSpec((h_b, cp), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_t, cp), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_b, cp), nxt, memory_space=pltpu.VMEM)]


def _run_fwd(cfg, x2d, ops):
    (n, h, w, c, eps, leak, interpret, cdname, mxu) = cfg
    cd = jnp.dtype(cdname)
    mode, rows_t, n_tiles, cp, hp, h_b = _layout(n, h, w, c)
    hw = h * w
    full = lambda shape: pl.BlockSpec(shape, lambda p, t: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    fwd_ops = ops[:14]  # bmask is backward-only
    if mode == "sample":
        kernel = _make_fwd_kernel(n_tiles, h, w, n * hw, eps, leak, cd, mxu)
        in_specs = [pl.BlockSpec((rows_t, cp), lambda p, t: (t, 0),
                                 memory_space=pltpu.VMEM)]
        x_args = (x2d,)
    else:
        kernel = _make_fwd_halo_kernel(n_tiles, h, w, n * hw, eps, leak, cd,
                                       mxu, h_b, rows_t)
        in_specs = _halo_specs(rows_t, n_tiles, cp, h_b, two_idx=True)
        x_args = (x2d, x2d, x2d)
    in_specs += [full(o.shape) for o in fwd_ops]
    out_specs = [
        pl.BlockSpec((rows_t, cp), lambda p, t: (jnp.where(p == 3, t, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, cp), lambda p, t: (0, 0), memory_space=pltpu.VMEM),
    ]
    out, stats = pl.pallas_call(
        kernel,
        grid=(4, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * rows_t, cp), cd),
            jax.ShapeDtypeStruct((8, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, hp), jnp.float32),
            pltpu.VMEM((2, cp), jnp.float32),
            pltpu.VMEM((4, hp), jnp.float32),
            pltpu.VMEM((2, cp), jnp.float32),
        ],
        interpret=interpret,
    )(*x_args, *fwd_ops)
    return out, stats


def _run_bwd(cfg, x2d, g2d, ops, sth, stc):
    (n, h, w, c, eps, leak, interpret, cdname, mxu) = cfg
    cd = jnp.dtype(cdname)
    mode, rows_t, n_tiles, cp, hp, h_b = _layout(n, h, w, c)
    hw = h * w
    (w1p, b1, g1, be1, dw, dwb, g2, be2, w3p, b3s, g3s, be3s, ps, pb,
     bmask) = ops
    full = lambda shape: pl.BlockSpec(shape, lambda p, t: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    bops = (w1p, b1, g1, be1, dw, dwb, g2, be2, w3p, b3s, g3s, be3s, ps,
            bmask, sth, stc)
    if mode == "sample":
        kernel = _make_bwd_kernel(n_tiles, h, w, n * hw, leak, cd, mxu)
        tile_spec = pl.BlockSpec((rows_t, cp), lambda p, t: (t, 0),
                                 memory_space=pltpu.VMEM)
        in_specs = [tile_spec, tile_spec]
        x_args = (x2d, g2d)
    else:
        kernel = _make_bwd_halo_kernel(n_tiles, h, w, n * hw, leak, cd, mxu,
                                       h_b, rows_t)
        hs = _halo_specs(rows_t, n_tiles, cp, h_b, two_idx=True)
        in_specs = hs + _halo_specs(rows_t, n_tiles, cp, h_b, two_idx=True)
        x_args = (x2d, x2d, x2d, g2d, g2d, g2d)
    in_specs += [full(o.shape) for o in bops]
    out_specs = [
        pl.BlockSpec((rows_t, cp), lambda p, t: (jnp.where(p == 3, t, 0), 0),
                     memory_space=pltpu.VMEM),
        full((cp, hp)), full((16, hp)), full((hp, cp)), full((16, cp)),
    ]
    gx, dw1, ddw, dw3, dvec = pl.pallas_call(
        kernel,
        grid=(4, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * rows_t, cp), cd),
            jax.ShapeDtypeStruct((cp, hp), jnp.float32),
            jax.ShapeDtypeStruct((16, hp), jnp.float32),
            jax.ShapeDtypeStruct((hp, cp), jnp.float32),
            jax.ShapeDtypeStruct((16, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, hp), jnp.float32),
            pltpu.VMEM((2, cp), jnp.float32),
            pltpu.VMEM((cp, hp), jnp.float32),
            pltpu.VMEM((16, hp), jnp.float32),
            pltpu.VMEM((hp, cp), jnp.float32),
            pltpu.VMEM((2, hp), jnp.float32),
            pltpu.VMEM((2, cp), jnp.float32),
        ],
        interpret=interpret,
    )(*x_args, *bops)
    return gx, dw1, ddw, dw3, dvec


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _unit_train_core(cfg, x2d, w1p, b1, g1, be1, dw, dwb, g2, be2, w3p, b3s,
                     g3s, be3s, ps, pb, bmask):
    ops = (w1p, b1, g1, be1, dw, dwb, g2, be2, w3p, b3s, g3s, be3s, ps, pb,
           bmask)
    return _run_fwd(cfg, x2d, ops)


def _unit_train_fwd(cfg, x2d, w1p, b1, g1, be1, dw, dwb, g2, be2, w3p, b3s,
                    g3s, be3s, ps, pb, bmask):
    ops = (w1p, b1, g1, be1, dw, dwb, g2, be2, w3p, b3s, g3s, be3s, ps, pb,
           bmask)
    out, stats = _run_fwd(cfg, x2d, ops)
    return (out, stats), (x2d, ops, stats)


def _unit_train_bwd(cfg, res, cts):
    (n, h, w, c, eps, leak, interpret, cdname, mxu) = cfg
    x2d, ops, stats = res
    g_out, _ = cts  # stats cotangent is zero (feeds running averages only)
    (w1p, b1, g1, be1, dw, dwb, g2, be2, w3p, b3s, g3s, be3s, ps, pb,
     bmask) = ops
    _, _, _, cp, hp, _ = _layout(n, h, w, c)
    f32 = jnp.float32
    sth = jnp.stack([
        stats[0, :hp],
        jax.lax.rsqrt(stats[1, :hp] + eps),
        stats[2, :hp],
        jax.lax.rsqrt(stats[3, :hp] + eps),
    ]).astype(f32)
    m3s = jnp.dot(stats[4:5, :hp], pb)
    v3s = jnp.dot(stats[5:6, :hp], pb)
    stc = jnp.concatenate([m3s, jax.lax.rsqrt(v3s + eps)], axis=0)
    gx, dw1, ddw, dw3, dvec = _run_bwd(cfg, x2d, g_out.astype(x2d.dtype),
                                       ops, sth, stc)
    z = jnp.zeros_like
    return (gx.astype(x2d.dtype), dw1.astype(w1p.dtype),
            dvec[0:1, :hp], dvec[3:4, :hp], dvec[4:5, :hp], ddw,
            dvec[1:2, :hp], dvec[5:6, :hp], dvec[6:7, :hp],
            dw3.astype(w3p.dtype), dvec[2:3, :], dvec[7:8, :], dvec[8:9, :],
            z(ps), z(pb), z(bmask))


_unit_train_core.defvjp(_unit_train_fwd, _unit_train_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _pad_total(x2d, total_rows, cp):
    return jnp.pad(x2d, ((0, total_rows - x2d.shape[0]),
                         (0, cp - x2d.shape[1])))


def _default_interpret():
    return jax.default_backend() != "tpu"


def _default_mxu(interpret) -> bool:
    """bf16-pass MXU matmuls by default on real TPU (matches flax/XLA's
    default matmul precision there — see _mdot); f32 in interpret mode so
    CPU parity tests compare exactly against flax's f32 CPU matmuls.
    CDRL_PUNIT_F32=1 forces f32 passes everywhere (fault bisection knob)."""
    import os
    if os.environ.get("CDRL_PUNIT_F32"):
        return False
    return not interpret


def shuffle_unit_train(x, params, eps: float = BN_EPS, leak: float = 0.0,
                       interpret=None, mxu_bf16=None):
    """Training-mode fused stride-1 ShuffleUnit.

    x: (N, H, W, C) in the compute dtype; params: the flax param subtree of
    one stride-1 unit.  Returns (out (N, H, W, C) shuffled, batch_stats
    dict {"BatchNorm_i": {"mean", "var"}} of the three BNs' BATCH stats
    (caller folds them into running averages)."""
    n, h, w, c = x.shape
    hc = c // 2
    cd = x.dtype
    if interpret is None:
        interpret = _default_interpret()
    if mxu_bf16 is None:
        mxu_bf16 = _default_mxu(interpret)
    _mode, rows_t, n_tiles, cp, hp, _h_b = _layout(n, h, w, c)
    ops = prep_unit_operands(params, c, cd)
    x2d = _pad_total(x.reshape(n * h * w, c), n_tiles * rows_t, cp)
    cfg = (n, h, w, c, float(eps), float(leak), bool(interpret), cd.name,
           bool(mxu_bf16))
    out2d, stats = _unit_train_core(cfg, x2d, *ops)
    out = out2d[:n * h * w, :c].reshape(n, h, w, c)
    bstats = {
        "BatchNorm_0": {"mean": stats[0, :hc], "var": stats[1, :hc]},
        "BatchNorm_1": {"mean": stats[2, :hc], "var": stats[3, :hc]},
        "BatchNorm_2": {"mean": stats[4, :hc], "var": stats[5, :hc]},
    }
    return out, bstats


def shuffle_unit_infer(x, params, running_stats, eps: float = BN_EPS,
                       leak: float = 0.0, interpret=None, mxu_bf16=None):
    """Inference-mode fused stride-1 ShuffleUnit (single pass; BN uses the
    running statistics).  running_stats: {"BatchNorm_i": {"mean", "var"}}."""
    n, h, w, c = x.shape
    cd = x.dtype
    if interpret is None:
        interpret = _default_interpret()
    if mxu_bf16 is None:
        mxu_bf16 = _default_mxu(interpret)
    mode, rows_t, n_tiles, cp, hp, h_b = _layout(n, h, w, c)
    hw = h * w
    ops = prep_unit_operands(params, c, cd)
    (w1p, b1, g1, be1, dw, dwb, g2, be2, w3p, b3s, g3s, be3s, ps, pb,
     bmask) = ops
    f32 = jnp.float32

    def row(vec):
        return jnp.zeros((hp,), f32).at[:vec.shape[0]].set(vec.astype(f32))

    rs = running_stats
    sth = jnp.stack([
        row(rs["BatchNorm_0"]["mean"]),
        jax.lax.rsqrt(row(rs["BatchNorm_0"]["var"]) + eps),
        row(rs["BatchNorm_1"]["mean"]),
        jax.lax.rsqrt(row(rs["BatchNorm_1"]["var"]) + eps),
    ])
    m3s = jnp.dot(row(rs["BatchNorm_2"]["mean"])[None, :], pb)
    v3s = jnp.dot(row(rs["BatchNorm_2"]["var"])[None, :], pb)
    # empty lanes of v3s are 0 -> rsqrt(eps); harmless (gamma3s is 0 there)
    stc = jnp.concatenate([m3s, jax.lax.rsqrt(v3s + eps)], axis=0)

    x2d = _pad_total(x.reshape(n * hw, c), n_tiles * rows_t, cp)
    full = lambda shape: pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    iops = (w1p, b1, g1, be1, dw, dwb, g2, be2, w3p, b3s, g3s, be3s, ps,
            sth, stc)
    if mode == "sample":
        kernel = _make_infer_kernel(h, w, n * hw, float(leak), cd, mxu_bf16)
        in_specs = [pl.BlockSpec((rows_t, cp), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM)]
        x_args = (x2d,)
    else:
        kernel = _make_infer_halo_kernel(h, w, n * hw, float(leak), cd,
                                         mxu_bf16, h_b, rows_t)
        in_specs = _halo_specs(rows_t, n_tiles, cp, h_b, two_idx=False)
        x_args = (x2d, x2d, x2d)
    out2d = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs + [full(o.shape) for o in iops],
        out_specs=pl.BlockSpec((rows_t, cp), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * rows_t, cp), cd),
        interpret=interpret,
    )(*x_args, *iops)
    return out2d[:n * hw, :c].reshape(n, h, w, c)
