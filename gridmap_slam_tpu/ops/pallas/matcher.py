"""Pallas TPU kernel: correlative scan-match stage scoring.

The matcher dominates the 500-particle parity step (37 of 41.3 ms, round-3
SUMMARY): the matmul backend (ops/matcher_matmul.py) scores each stage as
one-hot MXU GEMMs whose materialized (nt*n_off*B, Hp) operands are ~3.7 MB
per particle per stage of HBM traffic for ~0.4% useful MACs.  This kernel
keeps the whole stage in VMEM: the particle's padded log-likelihood field
is resident, every candidate tap is a 128-lane VMEM gather, and all
(nt, ny, nx) scores come out of one kernel pass — the same design shift
that made the Pallas map-update kernel beat the one-hot GEMM 2.8x while
being exact (ops/pallas/grid_update.py).

Design (per particle):

1. **Pair = (theta candidate, beam).**  Each pair's taps live in a small
   static (R, C) patch of the field anchored at
   (ay, ax) = clip(floor(base - off_min), 0, dim - R): all ny*nx candidate
   offsets read inside that patch (R = ceil(span) + 2 rows covers every
   clipped/bilinear case — see _stage_scores tap semantics in
   ops/matcher.py / matcher_matmul._taps, which this kernel reproduces
   value-exactly up to f32 summation order).

2. **Bucketed slots, assembled in-kernel.**  Mosaic's only fast gather is
   same-shape 2D take_along_axis with the gathered dimension one vreg wide
   (round-2/3 findings, ops/pallas/grid_update.py docstring).  To gather
   per-pair patch values with (8, 128)-shaped ops, pairs are organized
   into slot planes BUCKETED BY (ay & 7): a slot's sublane equals its
   anchor row mod 8, so the patch row (ay + r) of every slot in a plane
   lives at sublane (i + r) & 7 of field-row-block (ay >> 3) + carry —
   one lane-gather per (r, c, block) serves all 1024 slots of a plane,
   with a sublane roll to re-align.  The HOST only bucket-sorts the pairs
   (one variadic lax.sort, ~0.4 ms at (500, 900)); the bucketed slot
   layout itself is assembled IN-KERNEL from the sorted runs with dynamic
   lane rotates (~14 ns each), because every host-side packing primitive
   measured catastrophic on this chip (computed-index scatter 11-12 ms,
   expansion gathers 165+ ms).  A dynamic-trip fori_loop walks only the
   occupied planes (ceil(max bucket count / 128), typically 1-2).

3. **Dense tap weights.**  Per candidate offset, the tap row/col and
   bilinear fractions are recomputed in-register from the slot's
   fractional base; tap weights become (R + C)-term select chains and the
   score contraction Q = Wy @ patch @ Wx runs as ~R*C fused
   multiply-adds per candidate on full (8, 128) slot vregs.

4. **In-kernel reduce.**  Per (theta, candidate): mask slots by theta id,
   reduce sublanes, and accumulate one (8, 128) lane-partial register per
   8 candidates across the plane loop; the program writes (rows_pad, 128)
   lane-partials once and XLA sums the last axis.  No per-slot partials
   ever reach HBM.

Reference behavior accelerated: slam/GridMap.java:319-369 (pose scoring
over a search window); candidate schedule identical to
ops/matcher.correlative_match.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUB = 8


def _roll(x, shift):
    """Sublane roll by `shift` (mod 8)."""
    s = shift % _SUB
    if s == 0:
        return x
    return pltpu.roll(x, s, axis=0)


# ---------------------------------------------------------------- kernel
def _stage_kernel(nocc_ref, starts_ref, counts_ref, spidx_ref, sfyr_ref,
                  sfxr_ref, swgt_ref, fpad_ref, out_ref, *, n_blocks, sv,
                  hp, wp, big_r, big_c, offs_y, offs_x, nt, ny, nx, nearest):
    """One program per particle.  A dynamic-trip fori_loop walks only the
    OCCUPIED slot planes (nocc_ref[i] = ceil(max bucket count / 128)),
    carrying one (8, 128) lane-partial accumulator per 8 candidates in
    registers; the field block loop is statically unrolled (dynamic
    sublane slices and per-plane grid programs were the v1 cost, 58 ms
    at 500p).

    Slot tables are assembled IN-KERNEL from the bucket-sorted pair arrays
    (s*_ref, flat (sv*8, 128) row-major) using per-bucket window reads —
    a row extract (vreg select + one-vreg sublane gather) plus two dynamic
    lane rotates per window.  Host-side packing is impossible at speed:
    XLA TPU scatter with computed indices measured 11-12 ms at (500, 900)
    and expansion gathers 165+ ms, while tpu.dynamic_rotate measures
    ~14 ns; the variadic bucket sort (0.4 ms) is the only host-side
    permutation."""
    i = pl.program_id(0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 1)
    rows = nt * ny * nx
    n_grp = -(-rows // _SUB)
    m_pad = sv * _SUB * _LANES

    fblks = [fpad_ref[0, b * _SUB:(b + 1) * _SUB, :] for b in range(n_blocks)]
    srcs = [[ref[0, k * _SUB:(k + 1) * _SUB, :] for k in range(sv)]
            for ref in (spidx_ref, sfyr_ref, sfxr_ref, swgt_ref)]

    def get_row(vregs, r):
        """(8,128) with every sublane = flat row r (= elements
        [128r, 128r+128) of the sorted array)."""
        k0 = r >> 3
        v = vregs[0]
        for k in range(1, sv):
            v = jnp.where(k0 == k, vregs[k], v)
        ri = jnp.broadcast_to(r & 7, (_SUB, _LANES)).astype(jnp.int32)
        return jnp.take_along_axis(
            v, ri, axis=0, mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    def plane(p, acc):
        # ---- assemble this plane's slot vregs: sublane b holds sorted
        # elements [starts[b] + 128p, +128) of each field
        fields = [jnp.zeros((_SUB, _LANES), jnp.int32),
                  jnp.zeros((_SUB, _LANES), jnp.float32),
                  jnp.zeros((_SUB, _LANES), jnp.float32),
                  jnp.zeros((_SUB, _LANES), jnp.float32)]
        for b in range(_SUB):
            q0 = starts_ref[i, b] + p * _LANES
            q0 = jnp.minimum(q0, m_pad - _LANES)
            o = q0 & (_LANES - 1)
            r_a = q0 >> 7
            in_win = iota_l < (_LANES - o)
            sub_b = iota_s == b
            valid_n = counts_ref[i, b] - p * _LANES      # lanes valid
            for fi in range(4):
                ra = pltpu.roll(get_row(srcs[fi], r_a), -o, axis=1)
                rb = pltpu.roll(get_row(srcs[fi], r_a + 1), -o, axis=1)
                w = jnp.where(in_win, ra, rb)
                if fi == 3:                               # wgt: mask tail
                    w = jnp.where(iota_l < valid_n, w, 0.0)
                fields[fi] = jnp.where(sub_b, w, fields[fi])
        pk, fyr, fxr, wgt = fields
        tid = pk >> 20
        ay = (pk >> 10) & 1023
        ax = pk & 1023

        ayblk = ay >> 3

        # ---- patch gather: patch[r][c][slot] = fpad[ay + r, ax + c]
        patch = []
        for r in range(big_r):
            carry_r = (iota_s + r) >> 3           # NOT a boolean: r can
            bt = _roll(ayblk + carry_r, r)        # exceed 8 (coarse R=10)
            axr = _roll(ax, r)
            got = [None] * big_c
            for blk in range(n_blocks):
                hit = bt == blk
                for c in range(big_c):
                    g = jnp.take_along_axis(
                        fblks[blk], axr + c, axis=1,
                        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                    got[c] = (jnp.where(hit, g, got[c])
                              if got[c] is not None else
                              jnp.where(hit, g, 0.0))
            patch.append([_roll(g, -r) for g in got])

        # ---- per-candidate tap weights (matcher_matmul._taps semantics)
        def tap_weights(frel, anchor, offs, dim, big):
            ws = []
            for off in offs:
                g = frel + off
                if nearest:
                    f0 = jnp.round(g)
                    i0 = jnp.clip(anchor + f0.astype(jnp.int32), 0, dim - 1)
                    rr = i0 - anchor
                    ws.append([(rr == r).astype(jnp.float32)
                               for r in range(big)])
                else:
                    f0 = jnp.floor(g)
                    t = g - f0
                    i0 = jnp.clip(anchor + f0.astype(jnp.int32), 0, dim - 2)
                    rr = i0 - anchor
                    row = []
                    for r in range(big):
                        wv = jnp.where(rr == r, 1.0 - t, 0.0)
                        if r >= 1:
                            wv = wv + jnp.where(rr == r - 1, t, 0.0)
                        row.append(wv)
                    ws.append(row)
            return ws

        wy = tap_weights(fyr, ay, offs_y, hp, big_r)   # [ny][R] (8,128)
        wx = tap_weights(fxr, ax, offs_x, wp, big_c)   # [nx][C]

        # ---- contract: S[iy][ix] = wgt * (Wy . patch . Wx)
        sw = []
        for iy in range(ny):
            q = [None] * big_c                          # Q[c] = sum_r Wy*P
            for r in range(big_r):
                wv = wy[iy][r]
                for c in range(big_c):
                    term = wv * patch[r][c]
                    q[c] = term if q[c] is None else q[c] + term
            row = []
            for ix in range(nx):
                s = None
                for c in range(big_c):
                    term = q[c] * wx[ix][c]
                    s = term if s is None else s + term
                row.append(s * wgt)
            sw.append(row)

        # ---- reduce slots by theta id into register accumulators:
        # candidate (t, iy, ix) -> sublane (row & 7) of group (row >> 3)
        acc = list(acc)
        for t in range(nt):
            mt = tid == t
            for iy in range(ny):
                for ix in range(nx):
                    row = (t * ny + iy) * nx + ix
                    v = jnp.sum(jnp.where(mt, sw[iy][ix], 0.0), axis=0,
                                keepdims=True)                  # (1, 128)
                    g, s = row >> 3, row & 7
                    acc[g] = jnp.where(iota_s == s,
                                       acc[g] + jnp.broadcast_to(
                                           v, (_SUB, _LANES)),
                                       acc[g])
        return tuple(acc)

    init = tuple(jnp.zeros((_SUB, _LANES), jnp.float32)
                 for _ in range(n_grp))
    acc = jax.lax.fori_loop(0, nocc_ref[i], plane, init)
    for g in range(n_grp):
        out_ref[0, g * _SUB:(g + 1) * _SUB, :] = acc[g]


# ------------------------------------------------------------- host prep
def _sort_pairs(bucket, valid, fields, sv):
    """Bucket-sort flattened pairs (P, M) for in-kernel slot assembly.

    bucket: (P, M) i32 in [0, 8); valid: (P, M) bool; fields: list of
    (P, M) arrays.  Returns ([(P, sv*8, 128) sorted row-major per field],
    starts (P, 8) i32, counts (P, 8) i32, nocc (P,) i32).  Invalid pairs
    sort to the tail (key 8).  This is the ONLY host-side permutation:
    XLA TPU scatter with computed indices measured 11-12 ms at (500, 900)
    and expansion gathers 165+ ms, while the variadic stable sort is
    ~0.4 ms; the bucketed slot layout the kernel's gathers need is
    assembled on-chip from these runs with dynamic lane rotates.
    """
    pn, m = bucket.shape
    m_pad = sv * _SUB * _LANES
    key = jnp.where(valid, bucket, 8).astype(jnp.int32)
    skey, *sfields = jax.lax.sort((key, *fields), dimension=1,
                                  is_stable=True, num_keys=1)
    b8 = jnp.arange(8, dtype=jnp.int32)[None, None]
    # exclusive bucket starts as ONE compare-reduce (no cumsum — the
    # (P, M, 8) cumsum formulation measured 4.3 ms on the dev chip);
    # counts follow from consecutive starts + the valid total.
    starts = jnp.sum((skey[:, :, None] < b8).astype(jnp.int32), axis=1)
    nvalid = jnp.sum((skey < 8).astype(jnp.int32), axis=1, keepdims=True)
    counts = jnp.diff(jnp.concatenate([starts, nvalid], axis=1), axis=1)
    maxc = jnp.max(counts, axis=1)
    nocc = (maxc + _LANES - 1) >> 7                          # (P,)
    srt = [jnp.pad(f, ((0, 0), (0, m_pad - m))).reshape(pn, sv * _SUB,
                                                        _LANES)
           for f in sfields]
    return srt, starts, counts, nocc


def pad_llfield_batch(llfield_b, ll_outside: float):
    """(P, H, W) -> (P, 8-mult, 128-mult) constant-padded with ll_outside,
    plus the matcher's 2-cell out-of-map band on every side."""
    pad = 2
    pn, h, w = llfield_b.shape
    hp, wp = h + 2 * pad, w + 2 * pad
    hb = -(-hp // _SUB) * _SUB
    wb = -(-wp // _LANES) * _LANES
    f = jnp.pad(llfield_b, ((0, 0), (pad, hb - hp + pad), (pad, wb - wp + pad)),
                constant_values=ll_outside)
    return f, hp, wp


@functools.partial(
    jax.jit, static_argnames=("offs_x", "offs_y", "offs_t", "resolution",
                              "origin", "pad", "hp", "wp", "nearest",
                              "interpret"))
def stage_scores_pallas_batch(fpad_b, px, py, use, poses_b, center_b, *,
                              offs_x, offs_y, offs_t, resolution, origin,
                              pad, hp, wp, nearest=False, interpret=False):
    """Batched stage scores: (P, nt, ny, nx) log p(z | pose0+center+off, m).

    fpad_b: (P, HB, WB) from pad_llfield_batch (WB == 128 required — maps
    wider than 124 cells use the matmul backend); px/py/use: (B,) beam
    endpoints + hit&valid mask (shared scan); poses_b: (P, 3) search
    centers; center_b: (P, 3) additional per-particle offset (refine
    stages center on the running argmax; zeros for the coarse stage).
    offs_*: STATIC tuples of candidate offsets (meters / radians).

    Matches ops/matcher._stage_scores on the same schedule up to f32
    summation order (tests/test_pallas_matcher.py).
    """
    pn, hb, wb = fpad_b.shape
    assert wb == _LANES, f"field wider than one vreg: {wb}"
    inv_res = 1.0 / resolution
    offs_xc = tuple(float(o) * inv_res for o in offs_x)
    offs_yc = tuple(float(o) * inv_res for o in offs_y)
    span_x = offs_xc[-1] - offs_xc[0]
    span_y = offs_yc[-1] - offs_yc[0]
    big_c = int(np.ceil(span_x)) + 2
    big_r = int(np.ceil(span_y)) + 2
    nt, ny, nx = len(offs_t), len(offs_yc), len(offs_xc)
    b = px.shape[0]
    m = nt * b

    theta = (poses_b[:, 2] + center_b[:, 2])[:, None] + jnp.asarray(
        offs_t, jnp.float32)[None]                            # (P, nt)
    c = jnp.cos(theta)[:, :, None]
    s = jnp.sin(theta)[:, :, None]
    rx = px[None, None] * c - py[None, None] * s \
        + (poses_b[:, 0] + center_b[:, 0])[:, None, None]     # (P, nt, B)
    ry = px[None, None] * s + py[None, None] * c \
        + (poses_b[:, 1] + center_b[:, 1])[:, None, None]
    fx = (rx - origin[0]) * inv_res - 0.5 + pad
    fy = (ry - origin[1]) * inv_res - 0.5 + pad
    ax = jnp.clip(jnp.floor(fx + offs_xc[0]).astype(jnp.int32), 0,
                  wp - big_c)
    ay = jnp.clip(jnp.floor(fy + offs_yc[0]).astype(jnp.int32), 0,
                  hp - big_r)
    fxr = (fx - ax).astype(jnp.float32)
    fyr = (fy - ay).astype(jnp.float32)
    tidb = jnp.broadcast_to(
        jnp.arange(nt, dtype=jnp.int32)[None, :, None], (pn, nt, b))
    pidx = (tidb << 20) | (ay << 10) | ax
    wgtb = jnp.broadcast_to(use[None, None].astype(jnp.float32), (pn, nt, b))

    flat = lambda a: a.reshape(pn, m)
    # sorted-array vregs must cover q0 + 128 <= m + 128 (q0 clamped
    # in-kernel)
    sv = -(-(m + _LANES) // (_SUB * _LANES))
    (spidx, sfyr, sfxr, swgt), starts, counts, nocc = _sort_pairs(
        flat(ay & 7), flat(wgtb > 0.0),
        [flat(pidx), flat(fyr), flat(fxr), flat(wgtb)], sv)

    rows = nt * ny * nx
    rows_pad = -(-rows // _SUB) * _SUB
    kernel = functools.partial(
        _stage_kernel, n_blocks=hb // _SUB, sv=sv, hp=hp, wp=wp,
        big_r=big_r, big_c=big_c, offs_y=tuple(offs_yc), offs_x=tuple(offs_xc),
        nt=nt, ny=ny, nx=nx, nearest=nearest)

    sort_spec = pl.BlockSpec((1, sv * _SUB, _LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(pn,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # nocc (P,)
            pl.BlockSpec(memory_space=pltpu.SMEM),           # starts (P, 8)
            pl.BlockSpec(memory_space=pltpu.SMEM),           # counts (P, 8)
            sort_spec,                                       # pidx sorted
            sort_spec,                                       # fyr sorted
            sort_spec,                                       # fxr sorted
            sort_spec,                                       # wgt sorted
            pl.BlockSpec((1, hb, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # fpad
        ],
        out_specs=pl.BlockSpec((1, rows_pad, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pn, rows_pad, _LANES), jnp.float32),
        interpret=interpret,
    )(nocc, starts, counts, spidx, sfyr, sfxr, swgt, fpad_b)

    return jnp.sum(out, axis=-1)[:, :rows].reshape(pn, nt, ny, nx)


# ------------------------------------------------- batched match driver
def correlative_match_pallas_batch(llfield_b, scan, pose0_b, odom, *,
                                   matcher_cfg, motion_cfg, resolution,
                                   origin, max_range, prior_center_b=None,
                                   interpret=False):
    """Batched equivalent of vmap(ops.matcher.correlative_match) with every
    stage scored by the Pallas kernel: same candidate schedule (coarse
    nearest/strided grid, then halving bilinear refinements), same prior
    and argmax flow, operating on (P, ...) batches because pallas_call runs
    with an explicit particle grid rather than under vmap.

    Returns (best_poses (P, 3), meas_logscores (P,)).
    """
    from ..geometry import wrap_angle
    from ..matcher import _argmax3, _prior_grid
    from ..motion import noise_scales
    from ...ops.geometry import scan_points

    mc = matcher_cfg
    pn = pose0_b.shape[0]
    ll_outside = math.log(1.0 / max_range)
    fpad_b, hp, wp = pad_llfield_batch(llfield_b, ll_outside)

    px, py = scan_points(scan)
    use = scan.valid & scan.hit

    sd_c, sd_t = noise_scales(odom, motion_cfg)
    if prior_center_b is None:
        bias_b = jnp.zeros((pn, 3), jnp.float32)
    else:
        bias_b = jnp.stack(
            [pose0_b[:, 0] - prior_center_b[:, 0],
             pose0_b[:, 1] - prior_center_b[:, 1],
             wrap_angle(pose0_b[:, 2] - prior_center_b[:, 2])], axis=1)

    stride = max(int(mc.coarse_beam_stride), 1)
    px_c, py_c, use_c = px[::stride], py[::stride], use[::stride]

    wt = math.radians(mc.window_theta_deg)
    c_off = tuple(np.linspace(-mc.window_xy, mc.window_xy, mc.coarse_nxy))
    c_off_t = tuple(np.linspace(-wt, wt, mc.coarse_nt))

    zeros3 = jnp.zeros((pn, 3), jnp.float32)
    if getattr(mc, "coarse_halfres", False):
        # Basin-finding on a HALF-RESOLUTION field: the coarse stage's job
        # is only to land within +/-1 cell of the optimum (the bilinear
        # fine stages rescore at full resolution), and at half resolution
        # the tap patch shrinks from 10x10 over 16 field blocks to 6x6
        # over 8 — ~4.4x fewer gather passes in the stage that dominates
        # the kernel matcher (ROOFLINE.md next-target #1).  2x2 mean
        # pooling of the LL field preserves basin ordering to well within
        # the field's own ~1-cell Gaussian blur.
        pn_, h_, w_ = llfield_b.shape
        he, we_ = h_ + (h_ & 1), w_ + (w_ & 1)
        llf_even = jnp.pad(llfield_b, ((0, 0), (0, he - h_), (0, we_ - w_)),
                           constant_values=ll_outside)
        hll = llf_even.reshape(pn_, he // 2, 2, we_ // 2, 2).mean((2, 4))
        fpad_h, hp_h, wp_h = pad_llfield_batch(hll, ll_outside)
        meas = stage_scores_pallas_batch(
            fpad_h, px_c, py_c, use_c, pose0_b, zeros3,
            offs_x=c_off, offs_y=c_off, offs_t=c_off_t,
            resolution=2.0 * resolution, origin=origin, pad=2,
            hp=hp_h, wp=wp_h, nearest=False, interpret=interpret)
    else:
        meas = stage_scores_pallas_batch(
            fpad_b, px_c, py_c, use_c, pose0_b, zeros3,
            offs_x=c_off, offs_y=c_off, offs_t=c_off_t,
            resolution=resolution, origin=origin, pad=2, hp=hp, wp=wp,
            nearest=bool(mc.coarse_nearest), interpret=interpret)

    n_all = jnp.maximum(jnp.sum(use.astype(jnp.float32)), 1.0)
    n_c = jnp.maximum(jnp.sum(use_c.astype(jnp.float32)), 1.0)
    c_dxs = jnp.asarray(c_off, jnp.float32)
    c_dts = jnp.asarray(c_off_t, jnp.float32)

    def coarse_pick(meas_p, bias_p):
        total = meas_p + (n_c / n_all) * _prior_grid(
            c_dxs, c_dxs, c_dts, sd_c, sd_t, mc.prior_weight, bias_p)
        fx, fy, ft, flat = _argmax3(total, c_dxs, c_dxs, c_dts)
        return fx, fy, ft, (n_all / n_c) * meas_p.reshape(-1)[flat]

    fx, fy, ft, meas_best = jax.vmap(coarse_pick)(meas, bias_b)

    step_xy = 2.0 * mc.window_xy / max(mc.coarse_nxy - 1, 1)
    step_t = 2.0 * wt / max(mc.coarse_nt - 1, 1)
    for _ in range(1 + mc.extra_refine_stages):
        off_xy = tuple(np.linspace(-step_xy, step_xy, mc.fine_nxy))
        off_t = tuple(np.linspace(-step_t, step_t, mc.fine_nt))
        center_b = jnp.stack([fx, fy, ft], axis=1)
        meas_r = stage_scores_pallas_batch(
            fpad_b, px, py, use, pose0_b, center_b,
            offs_x=off_xy, offs_y=off_xy, offs_t=off_t,
            resolution=resolution, origin=origin, pad=2, hp=hp, wp=wp,
            nearest=False, interpret=interpret)
        off_xyj = jnp.asarray(off_xy, jnp.float32)
        off_tj = jnp.asarray(off_t, jnp.float32)

        def refine_pick(meas_p, fx_p, fy_p, ft_p, bias_p):
            r_dxs = fx_p + off_xyj
            r_dys = fy_p + off_xyj
            r_dts = ft_p + off_tj
            total = meas_p + _prior_grid(r_dxs, r_dys, r_dts, sd_c, sd_t,
                                         mc.prior_weight, bias_p)
            gx, gy, gt, flat = _argmax3(total, r_dxs, r_dys, r_dts)
            return gx, gy, gt, meas_p.reshape(-1)[flat]

        fx, fy, ft, meas_best = jax.vmap(refine_pick)(meas_r, fx, fy, ft,
                                                      bias_b)
        step_xy = 2.0 * step_xy / max(mc.fine_nxy - 1, 1)
        step_t = 2.0 * step_t / max(mc.fine_nt - 1, 1)

    best = jnp.stack([pose0_b[:, 0] + fx, pose0_b[:, 1] + fy,
                      pose0_b[:, 2] + ft], axis=1)
    return best, meas_best
