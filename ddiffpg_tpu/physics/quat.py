"""Quaternion algebra (w, x, y, z convention), float32, batch-friendly."""

from __future__ import annotations

import jax.numpy as jnp


def identity():
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def mul(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def rotate(q, v):
    """Rotate vector v by quaternion q (active rotation, body->world)."""
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + q[..., :1] * t + jnp.cross(qv, t)


def inv_rotate(q, v):
    return rotate(conj(q), v)


def to_matrix(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack([
        jnp.stack([r00, r01, r02], -1),
        jnp.stack([r10, r11, r12], -1),
        jnp.stack([r20, r21, r22], -1),
    ], axis=-2)


def from_axis_angle(axis, angle):
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = angle * 0.5
    return jnp.concatenate([
        jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1)


def integrate(q, omega_world, dt):
    """q <- exp(0.5 * omega * dt) * q for world-frame angular velocity."""
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    # safe normalize
    axis = omega_world / jnp.where(angle > 1e-9, angle, 1.0)
    half = angle[..., 0] * dt * 0.5
    dq = jnp.concatenate([jnp.cos(half)[..., None],
                          axis * jnp.sin(half)[..., None]], axis=-1)
    out = mul(dq, q)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
