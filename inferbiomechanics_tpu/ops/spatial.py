"""Spatial (rigid-body) algebra primitives, jit/vmap-friendly.

Capability parity: the nimble math surface the reference consumes
(SURVEY.md §2.9): ``math.dAdInvT`` (spatial wrench transform,
AnalyticalBaseline.py:99) and Isometry3 compose/rotate/translate/inverse.
Euler conventions follow the B3D-TPU skeleton spec (XYZ intrinsic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(v: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def euler_xyz_to_matrix(angles: jax.Array) -> jax.Array:
    """Intrinsic XYZ euler angles [..., 3] -> rotation matrices [..., 3, 3]."""
    cx, cy, cz = (jnp.cos(angles[..., i]) for i in range(3))
    sx, sy, sz = (jnp.sin(angles[..., i]) for i in range(3))
    # R = Rx(x) @ Ry(y) @ Rz(z)
    r00 = cy * cz
    r01 = -cy * sz
    r02 = sy
    r10 = cx * sz + sx * sy * cz
    r11 = cx * cz - sx * sy * sz
    r12 = -sx * cy
    r20 = sx * sz - cx * sy * cz
    r21 = sx * cz + cx * sy * sz
    r22 = cx * cy
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def axis_angle_to_matrix(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rodrigues: unit axis [..., 3] + angle [...] -> [..., 3, 3]."""
    K = skew(axis)
    I = jnp.eye(3, dtype=axis.dtype)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    return I + s * K + (1.0 - c) * (K @ K)


def dAdInvT(R: jax.Array, p: jax.Array, wrench: jax.Array) -> jax.Array:
    """Transform a spatial wrench [n; f] from the frame T=(R,p) is expressed
    in, into the frame T maps to (DART's ``math::dAdInvT`` convention, used
    by the reference to move world wrenches into the root frame):
        n' = Rᵀ (n - p × f),  f' = Rᵀ f
    """
    n, f = wrench[..., :3], wrench[..., 3:]
    fp = jnp.einsum('...ji,...j->...i', R, f)
    np_ = jnp.einsum('...ji,...j->...i', R, n - jnp.cross(p, f))
    return jnp.concatenate([np_, fp], axis=-1)


def transform_point(R: jax.Array, p: jax.Array, x: jax.Array) -> jax.Array:
    """Apply isometry (R, p) to points [..., 3]."""
    return jnp.einsum('...ij,...j->...i', R, x) + p


def inverse_transform_point(R: jax.Array, p: jax.Array, x: jax.Array) -> jax.Array:
    """Apply the inverse of (R, p): Rᵀ (x - p)."""
    return jnp.einsum('...ji,...j->...i', R, x - p)


def unskew(m: jax.Array) -> jax.Array:
    """Inverse of :func:`skew` for (approximately) antisymmetric matrices."""
    return jnp.stack([m[..., 2, 1] - m[..., 1, 2],
                      m[..., 0, 2] - m[..., 2, 0],
                      m[..., 1, 0] - m[..., 0, 1]], axis=-1) * 0.5
