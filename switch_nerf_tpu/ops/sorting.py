"""Sort-with-payloads with a sort-based backward.

TPU-native infrastructure replacing the argsort + fancy-index chains the
reference uses for routing/merge ordering (e.g. compute_sorted_location,
tutel_fast_dispatch.py:165-168, and the coarse/fine sample merge,
rendering.py:419-433) — there is no single reference counterpart; the op
exists because gathers are the TPU bottleneck.

jax.lax.sort's autodiff transposes into per-payload dynamic gathers by the
inverse permutation — profiled at ~7 ms per payload channel per train step
on the Building config (dynamic-gather fusions are slow on TPU). Here the
backward is ONE multi-operand sort: cotangents are keyed by the forward
permutation and sorted back into input order. Sorting networks cost the same
forward and backward and stay on the VPU.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["sort_with_payloads"]


@jax.custom_vjp
def sort_with_payloads(keys: jnp.ndarray, *payloads: jnp.ndarray):
    """Sort `keys` ascending along the last axis, carrying payloads.

    Returns (sorted_keys, *sorted_payloads). All operands share keys' shape.
    """
    out = jax.lax.sort((keys,) + payloads, dimension=-1, num_keys=1,
                       is_stable=True)
    return tuple(out)


def _fwd(keys, *payloads):
    n = keys.shape[-1]
    iota = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32), keys.shape)
    out = jax.lax.sort((keys, iota) + payloads, dimension=-1, num_keys=1,
                       is_stable=True)
    perm = out[1]
    return (out[0],) + tuple(out[2:]), perm


def _bwd(perm, cots):
    # un-permute every cotangent with one multi-operand sort keyed by the
    # forward permutation (ascending perm == original input order)
    out = jax.lax.sort((perm,) + tuple(cots), dimension=-1, num_keys=1,
                       is_stable=True)
    return tuple(out[1:])


sort_with_payloads.defvjp(_fwd, _bwd)
