"""Pallas TPU kernel: fused likelihood-field build.

Computes, in a single VMEM pass per particle map:
    threshold(logodds) -> separable Gaussian blur -> unknown detection
    -> log measurement-likelihood field
(the composition of ops/grid.likelihood_field + ops/matcher.
log_likelihood_field; reference behavior slam/GridMap.java:233-294).

The XLA path runs 2 * (2*radius+1) shifted adds over HBM-resident arrays for
each of the two blurred quantities (field + evidence); fusing in VMEM reads
the map once and writes the LL field once.  Shifts are static slices into a
zero-padded VMEM scratch, so no halo logic is needed (single-block kernel;
requires W % 128 == 0, H % 8 == 0, and whole-map blocks <= VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ll_kernel(lo_ref, out_ref, pad_ref, *, h, w, hp, wp, kernel, z_hit,
               max_range):
    radius = (len(kernel) - 1) // 2
    lo = lo_ref[0]

    # threshold to {0, 0.5, 1} (slam/GridMap.java:238-245)
    p1 = jnp.where(lo > 0.0, 1.0, jnp.where(lo < 0.0, 0.0, 0.5))
    evid = jnp.where(lo != 0.0, 1.0, 0.0)

    def blur(img):
        # horizontal: write into zeroed padded scratch, read shifted slices
        pad_ref[:, :] = jnp.zeros((hp, wp), jnp.float32)
        pad_ref[radius:radius + h, radius:radius + w] = img
        acc = jnp.zeros((h, w), jnp.float32)
        for i, kv in enumerate(kernel):
            acc = acc + kv * pad_ref[radius:radius + h, i:i + w]
        # vertical
        pad_ref[:, :] = jnp.zeros((hp, wp), jnp.float32)
        pad_ref[radius:radius + h, radius:radius + w] = acc
        out = jnp.zeros((h, w), jnp.float32)
        for i, kv in enumerate(kernel):
            out = out + kv * pad_ref[i:i + h, radius:radius + w]
        return out

    field = blur(p1)
    evidence = blur(evid)
    unknown = evidence <= 0.0

    uniform = 1.0 / max_range
    v_eq = (uniform - (1.0 - z_hit) * uniform) / z_hit
    v = jnp.where(unknown, v_eq, field)
    out_ref[0] = jnp.log(z_hit * v + (1.0 - z_hit) * uniform)


@functools.partial(jax.jit, static_argnames=("kernel_tuple", "z_hit",
                                             "max_range", "interpret"))
def log_likelihood_field_pallas(logodds, *, kernel_tuple, z_hit: float,
                                max_range: float, interpret: bool = False):
    """Batched fused LL-field build.  logodds: (P, H, W) f32 with H % 8 == 0,
    W % 128 == 0; kernel_tuple: the 1-D blur kernel as a python tuple
    (static).  Returns (P, H, W) f32 log-likelihood field."""
    p, h, w = logodds.shape
    assert h % 8 == 0 and w % 128 == 0, (h, w)
    radius = (len(kernel_tuple) - 1) // 2
    hp = ((h + 2 * radius + 7) // 8) * 8
    wp = ((w + 2 * radius + 127) // 128) * 128

    kern = functools.partial(_ll_kernel, h=h, w=w, hp=hp, wp=wp,
                             kernel=tuple(float(k) for k in kernel_tuple),
                             z_hit=float(z_hit), max_range=float(max_range))

    return pl.pallas_call(
        kern,
        grid=(p,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((hp, wp), jnp.float32)],
        interpret=interpret,
    )(logodds)
