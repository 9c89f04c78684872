"""SE(2) geometry, angle utilities, and scan de-skew.

Reference behavior: math/MathUtil.java (angle wrap), math/Transform.java
(robot->world transform), app/GridMapApp.java:133-175 (motion-distortion
de-skew of one revolution).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import Odom, Scan


def wrap_angle(a):
    """Constrain angle(s) to (-pi, pi] (math/MathUtil.java:65-72).

    The reference loops; here the closed form.  The boundary value +pi maps to
    +pi (measure-zero difference from floor-based wraps that return -pi).
    """
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def angle_diff(a, b):
    """Smallest signed difference a-b wrapped to (-pi, pi]."""
    return wrap_angle(a - b)


def rot2(theta):
    """(..., 2, 2) rotation matrices."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def robot_to_world(pose, x, y):
    """Transform local (x, y) into world coords given pose(s) (..., 3)
    (math/Transform.java:13-32)."""
    c = jnp.cos(pose[..., 2])
    s = jnp.sin(pose[..., 2])
    wx = x * c - y * s + pose[..., 0]
    wy = x * s + y * c + pose[..., 1]
    return wx, wy


def se2_compose(a, b):
    """Pose composition a ⊕ b for (..., 3) poses."""
    c, s = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + b[..., 0] * c - b[..., 1] * s
    y = a[..., 1] + b[..., 0] * s + b[..., 1] * c
    t = wrap_angle(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, t], -1)


def se2_inverse(a):
    """Pose inverse for (..., 3) poses."""
    c, s = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = -(a[..., 0] * c + a[..., 1] * s)
    y = a[..., 0] * s - a[..., 1] * c
    return jnp.stack([x, y, -a[..., 2]], -1)


def se2_relative(a, b):
    """Relative pose of b expressed in a's frame: a^-1 ⊕ b."""
    return se2_compose(se2_inverse(a), b)


def deskew_scan(scan: Scan, odom: Odom) -> Scan:
    """Motion-distortion correction of one revolution
    (app/GridMapApp.java:144-175).

    Beam i (of N valid beams, in acquisition order) is transformed back to the
    end-of-revolution frame with time factor d_i = -(N - i)/N:
        x' = dist * cos(angle + dTheta*d_i) + dCenter*d_i
        y' = dist * sin(angle + dTheta*d_i)
    then re-expressed in polar form (the reference rebuilds the Measurement
    from local xy, Observation.java:69-76).  Padding beams keep d_i computed
    over the count of valid beams, matching the reference's variable N.
    """
    n = jnp.maximum(jnp.sum(scan.valid.astype(jnp.int32)), 1).astype(jnp.float32)
    i = jnp.arange(scan.num_beams, dtype=jnp.float32)
    d_i = -(n - i) / n
    dth = odom.d_theta * d_i
    dx = odom.d_center * d_i
    xa = scan.dist * jnp.cos(scan.angle + dth) + dx
    ya = scan.dist * jnp.sin(scan.angle + dth)
    return Scan(
        angle=jnp.arctan2(ya, xa).astype(scan.angle.dtype),
        dist=jnp.sqrt(xa * xa + ya * ya).astype(scan.dist.dtype),
        hit=scan.hit,
        valid=scan.valid,
    )


def scan_points(scan: Scan):
    """Beam endpoints in the robot frame: (B,), (B,)."""
    return scan.dist * jnp.cos(scan.angle), scan.dist * jnp.sin(scan.angle)
