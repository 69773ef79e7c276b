"""BLAS-1 vector kernels.

Functional analogs of /root/reference/kernels.hpp:119-257.  On TPU these are
single fused VPU loops under jit; they exist as named functions (rather than
inline jnp expressions) to keep call sites readable and parity with the
reference auditable.
"""
from __future__ import annotations

import jax.numpy as jnp


def subtract_vectors(v1, v2, scale_=1.0):
    """r = v1 - scale*v2  (kernels.hpp:119-126)."""
    return v1 - scale_ * v2


def sum_vectors(v1, v2, scale_=1.0):
    """r = v1 + scale*v2  (kernels.hpp:128-135)."""
    return v1 + scale_ * v2


def elemwise_mult_vectors(v1, v2, scale_=1.0):
    """r = v1 * (scale*v2)  (kernels.hpp:137-144)."""
    return v1 * (scale_ * v2)


def elemwise_div_vectors(v1, v2, scale_=1.0):
    """r = v1 / (scale*v2)  (kernels.hpp:146-153)."""
    return v1 / (scale_ * v2)


def dot(v1, v2):
    """(v1, v2)  (kernels.hpp:205-212)."""
    return jnp.dot(v1, v2, preferred_element_type=v1.dtype)


def euclidean_vec_norm(v):
    """||v||_2  (kernels.hpp:194-203)."""
    return jnp.sqrt(jnp.dot(v, v, preferred_element_type=v.dtype))


def infty_vec_norm(v):
    """max |v_i|  (kernels.hpp:164-177)."""
    return jnp.max(jnp.abs(v))


def scale(v, scalar):
    """r = scalar * v  (kernels.hpp:214-220)."""
    return v * scalar
