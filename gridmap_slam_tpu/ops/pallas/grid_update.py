"""Pallas TPU kernel: fused dense occupancy-grid update.

The XLA path (ops/raycast.integrate_scan) is already gather-based and
vectorized, but XLA materializes the intermediate per-cell beam lookups in
HBM.  This kernel performs the entire update — bearing computation, nearest-
beam table lookup, inverse sensor model, log-odds accumulate — in one VMEM
pass per particle: the map is read from HBM once and written once.

Mosaic's gather support (jax 0.9.0 `_gather_lowering_rule`) is narrow: 2D
`take_along_axis` ONLY, with operand, indices, and output all the SAME
shape, lowered to `tpu.dynamic_gather` along sublanes (axis 0) or lanes
(axis 1) — and the sublane form additionally requires the gathered
dimension to fit one vreg (8 f32 sublanes; "Multiple source vregs along
gather dimension" otherwise, round-2 finding, docs/bench/final2.log).  An
(8, W) chunk gathered with (H, W) indices therefore does not lower (shape
mismatch — round-3 finding), and any >=2D-operand row gather is capped at
8 rows.  The bearing->beam lookup here is restructured for the LANE form:
bin tables are walked in 128-entry chunks; each chunk is broadcast to the
(8, W) block shape and gathered along lanes with locally-rebased indices
(one vreg along lanes), masked into the accumulator (see _table_lookup3).
n_bins/128 chunked gathers per table per 8-row block — 16x fewer chunk
iterations than the 8-sublane form the verifier rejects.

A second trick removes the double gather entirely: instead of per-cell
bin -> beam-index -> beam-data, the host precomputes *dense per-bin beam
data* (distance / world-angle / hit code per bearing bin, shared by every
particle since the scan is shared) so the kernel needs a single table lookup
per cell per field.

The grid is (particles, H/8): each program updates one 8-row map block —
bearing math, chunked lane-gather lookups, inverse sensor model, and the
log-odds accumulate all stay in registers/VMEM for that block.

Shape requirements: H multiple of 8, W multiple of 128 (float32 tiling),
n_bins multiple of 128.  Use for TPU-shaped configs (e.g. 128x128 maps);
the XLA path remains the reference-parity fallback for arbitrary sizes.

Behavior matches ops/raycast.integrate_scan (same inverse sensor model,
slam/SensorModel.java:31-41; same ray-footprint test) — see
tests/test_pallas.py for the equivalence check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import Scan
from ..raycast import build_beam_lut

_TWO_PI = 6.283185307179586


def scan_bin_tables(scan: Scan, n_bins: int):
    """Dense per-bearing-bin beam data, shared across particles.

    Returns (dist, alpha, code) each (n_bins,) f32:
      dist  — measured distance (m) of the nearest beam for this bearing
      alpha — that beam's angle in the robot frame
      code  — 0: invalid/padding, 1: hit, 2: miss
    """
    lut = build_beam_lut(scan, n_bins)              # (n_bins,) beam index
    dist = scan.dist[lut]
    alpha = scan.angle[lut]
    code = jnp.where(scan.valid[lut],
                     jnp.where(scan.hit[lut], 1.0, 2.0), 0.0)
    return dist.astype(jnp.float32), alpha.astype(jnp.float32), code.astype(
        jnp.float32)


def _atan2(y, x):
    """atan2 from Mosaic-supported ops (atan2 has no TPU Pallas lowering).

    atan(t) for t in [0, 1] via a minimax polynomial (|err| < 2e-5 rad, well
    under the 2*pi/2048 = 3e-3 bearing-bin width), extended by octant
    reduction: t = min(|x|,|y|) / max(|x|,|y|), then quadrant selects."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    s = t * t
    # minimax for atan(t), t in [0,1] (Estrin on 4 odd terms)
    p = t * (0.9998660 + s * (-0.3302995 + s * (0.1801410
             + s * (-0.0851330 + s * 0.0208351))))
    a = jnp.where(ay > ax, 1.5707963267948966 - p, p)   # fold octant
    a = jnp.where(x < 0.0, 3.141592653589793 - a, a)    # quadrant II/III
    return jnp.where(y < 0.0, -a, a)                    # sign of y


def _table_lookup3(t1_ref, t2_ref, t3_ref, idx, rows, w, n_chunks):
    """out_k[i,j] = table_k[idx[i,j]] for three (n_chunks, 128) VMEM tables.

    Mosaic's gather lowering accepts only same-shape 2D take_along_axis
    (operand == indices == output shape; see module docstring), so the
    tables are walked in 128-entry chunks: each chunk row broadcasts to the
    (rows, w) block shape, is gathered ALONG LANES with locally-rebased
    indices (a single vreg along the gather dimension), and masked into the
    accumulator.  The three tables share the per-chunk index math."""
    outs = [jnp.zeros((rows, w), jnp.float32) for _ in range(3)]
    reps = w // 128
    for c in range(n_chunks):
        local = idx - c * 128
        inb = (local >= 0) & (local < 128)
        lidx = jnp.clip(local, 0, 127)
        for k, t_ref in enumerate((t1_ref, t2_ref, t3_ref)):
            row = t_ref[c, :].reshape(1, 128)
            if reps > 1:   # lanes beyond 128 are never indexed (lidx < 128)
                row = jnp.concatenate([row] * reps, axis=1)
            x = jnp.broadcast_to(row, (rows, w))
            g = jnp.take_along_axis(
                x, lidx, axis=1,
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            outs[k] = jnp.where(inb, g, outs[k])
    return outs


def _update_kernel(pose_ref, keep_ref, dist_t, alpha_t, code_t, lo_ref,
                   out_ref, *, rows, w, n_bins, n_chunks, resolution, origin,
                   l_free, l_occ, tol_m):
    # Whole (P, 3) pose table lives in SMEM (Mosaic's last-two-dims tiling
    # rule forbids a (1, 3) block of a (P, 3) array); index by grid step.
    i = pl.program_id(0)
    r_blk = pl.program_id(1)
    px = pose_ref[i, 0]
    py = pose_ref[i, 1]
    pt = pose_ref[i, 2]
    keep = keep_ref[0]

    # Mosaic's tpu.iota is integer-only: iota in i32, convert.  yi offsets
    # by this program's 8-row block.
    xi = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1).astype(jnp.float32)
    yi = (jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0)
          + r_blk * rows).astype(jnp.float32)
    cx = origin[0] + (xi + 0.5) * resolution - px
    cy = origin[1] + (yi + 0.5) * resolution - py
    r = jnp.sqrt(cx * cx + cy * cy)
    phi = _atan2(cy, cx) - pt                        # bearing in robot frame
    # wrap to [-pi, pi) without atan2: a - 2*pi*floor((a + pi) / 2*pi)
    phi_w = phi - _TWO_PI * jnp.floor((phi + jnp.pi) / _TWO_PI)

    binf = jnp.floor((phi_w + jnp.pi) * (n_bins / _TWO_PI)).astype(jnp.int32)
    binf = jnp.clip(binf, 0, n_bins - 1)

    m, alpha, code = _table_lookup3(dist_t, alpha_t, code_t, binf, rows, w,
                                    n_chunks)

    dphi = phi_w - alpha
    dphi = dphi - _TWO_PI * jnp.floor((dphi + jnp.pi) / _TWO_PI)
    wba = pt + alpha
    halfw = 0.5005 * (jnp.abs(jnp.cos(wba)) + jnp.abs(jnp.sin(wba))) * resolution
    perp = r * jnp.sin(dphi)
    on_ray = (jnp.abs(perp) <= halfw) & (jnp.cos(dphi) > 0.0) & (code > 0.5)

    is_hit = code < 1.5
    free_hit = r < (m - tol_m)
    occ_band = (r >= (m - tol_m)) & (r <= (m + tol_m))
    delta_hit = jnp.where(free_hit, l_free, jnp.where(occ_band, l_occ, 0.0))
    delta_miss = jnp.where(r < m, l_free, 0.0)
    delta = jnp.where(on_ray, jnp.where(is_hit, delta_hit, delta_miss), 0.0)
    out_ref[0] = lo_ref[0] + keep * delta


@functools.partial(jax.jit, static_argnames=(
    "resolution", "origin", "l_free", "l_occ", "tol_cells", "interpret"))
def integrate_scan_pallas(logodds, poses, keep, bin_dist, bin_alpha,
                          bin_code, *, resolution: float, origin,
                          l_free: float, l_occ: float, tol_cells: float = 2.0,
                          interpret: bool = False):
    """Batched fused map update.

    logodds: (P, H, W) f32; poses: (P, 3); keep: scalar f32 multiplier for
    the large-rotation skip; bin_*: (n_bins,) from scan_bin_tables with
    n_bins % 128 == 0.  Returns updated (P, H, W).

    Maps whose H/W are not (8, 128)-tile multiples (e.g. the reference's
    120x120 parity grid) are zero-padded to the next tile boundary and
    sliced back: every cell's update depends only on (pose, scan), so the
    pad band cannot influence kept cells — exact, at the cost of one
    pad/slice pass over the map tensor (~0.2 ms at 500x120x128).
    """
    p, h, w = logodds.shape
    rows = 8
    hp = -(-h // rows) * rows
    wp = -(-w // 128) * 128
    if (hp, wp) != (h, w):
        out = integrate_scan_pallas(
            jnp.pad(logodds, ((0, 0), (0, hp - h), (0, wp - w))),
            poses, keep, bin_dist, bin_alpha, bin_code,
            resolution=resolution, origin=origin, l_free=l_free,
            l_occ=l_occ, tol_cells=tol_cells, interpret=interpret)
        return out[:, :h, :w]
    n_bins = bin_dist.shape[0]
    assert n_bins % 128 == 0, n_bins
    n_chunks = n_bins // 128

    poses = poses.astype(jnp.float32)
    keep_arr = jnp.broadcast_to(jnp.asarray(keep, jnp.float32), (1,))
    tables = [t.reshape(n_chunks, 128)
              for t in (bin_dist, bin_alpha, bin_code)]

    kernel = functools.partial(
        _update_kernel, rows=rows, w=w, n_bins=n_bins, n_chunks=n_chunks,
        resolution=float(resolution), origin=(float(origin[0]),
                                              float(origin[1])),
        l_free=float(l_free), l_occ=float(l_occ),
        tol_m=0.5 * float(tol_cells) * float(resolution))

    return pl.pallas_call(
        kernel,
        grid=(p, h // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # poses (P, 3)
            pl.BlockSpec(memory_space=pltpu.SMEM),          # keep (1,)
            pl.BlockSpec((n_chunks, 128), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),          # dist table
            pl.BlockSpec((n_chunks, 128), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),          # alpha table
            pl.BlockSpec((n_chunks, 128), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),          # code table
            pl.BlockSpec((1, rows, w), lambda i, r: (i, r, 0),
                         memory_space=pltpu.VMEM),          # logodds in
        ],
        out_specs=pl.BlockSpec((1, rows, w), lambda i, r: (i, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, h, w), jnp.float32),
        interpret=interpret,
    )(poses, keep_arr, *tables, logodds)
