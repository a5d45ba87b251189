"""Fused multi-layer ExpertMLP chain as a Pallas TPU kernel.

Why: at model width 256 every expert GEMM has arithmetic intensity
~127 FLOP/B — far below the v5e ridge point (~481) — so the einsum chain
(`ecm,emn->ecn` per layer) is HBM-bound: each of the L layers round-trips
the [E, C, M] activations through HBM. This kernel keeps the activation
block AND the expert's whole L-layer weight stack resident in VMEM, so the
chain touches HBM once for x, once for the weights, and once for the
output — ~5x less traffic than the einsum chain at L=7 (the Building
config, reference ExpertMLP tutel_moe_layer_nobatch.py:837-924).

Forward grid: (E, C/BC). Backward: one fused kernel per grid cell
recomputes the post-activation stack in VMEM scratch (rematerialisation in
on-chip memory) and produces dx, dW, db; dW/db blocks are revisited across
the C blocks of one expert and flushed when the expert changes (standard
Pallas accumulation pattern), so no cross-cell reductions are needed.

Numerics match the einsum path: matmuls accumulate fp32 on the MXU and
cast back to the input dtype before bias/skip/ReLU; dW/db accumulate fp32.
Skip semantics mirror ExpertMLP._skip_act (h += xin at skip layers, ReLU
everywhere but the last layer, xin re-based at each skip).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["expert_mlp_chain"]


_BLOCK_TARGET = 1024   # tuning knob: max token-block rows per grid cell


def _pick_block(c: int, target: int = None) -> int:
    """Largest divisor of c that is <= target and a multiple of 16
    (bf16 sublane tile)."""
    if target is None:
        target = _BLOCK_TARGET
    bc = min(c, target)
    while bc > 16 and (c % bc or bc % 16):
        bc -= 16 if bc % 16 == 0 else bc % 16
    return bc if c % bc == 0 and bc % 16 == 0 else c


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, *, layers: int,
                skips: Tuple[int, ...]):
    h = x_ref[0]
    xin = h
    for l in range(layers):
        z = jnp.dot(h, w_ref[l, 0],
                    preferred_element_type=jnp.float32).astype(h.dtype)
        z = z + b_ref[l, 0]
        last = l == layers - 1
        if l in skips:
            z = z + xin
            if not last:
                z = jnp.maximum(z, 0)
            xin = z
        elif not last:
            z = jnp.maximum(z, 0)
        h = z
    o_ref[0] = h


def _bwd_kernel(x_ref, w_ref, b_ref, g_ref, dx_ref, dw_ref, db_ref,
                hs_ref, *, layers: int, skips: Tuple[int, ...]):
    i = pl.program_id(1)

    # zero the revisited dW/db accumulators at the first C block
    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    # recompute the post-activation stack in VMEM (hs[l] = input of layer l)
    h = x_ref[0]
    xin_layer = -1                       # layer whose output re-based xin
    for l in range(layers):
        hs_ref[l] = h
        z = jnp.dot(h, w_ref[l, 0],
                    preferred_element_type=jnp.float32).astype(h.dtype)
        z = z + b_ref[l, 0]
        last = l == layers - 1
        if l in skips:
            xin = x_ref[0] if xin_layer < 0 else hs_ref[xin_layer + 1]
            z = z + xin
            if not last:
                z = jnp.maximum(z, 0)
            xin_layer = l
        elif not last:
            z = jnp.maximum(z, 0)
        h = z
    hs_ref[layers] = h                   # final output (for relu masks)

    # reverse sweep: gh = d/d h_out, gxin = d/d (current xin)
    def relu_mask(l, g):
        # compare in fp32: Mosaic on v5e lacks sub-32-bit compares
        return g * (hs_ref[l + 1].astype(jnp.float32)
                    > 0).astype(g.dtype)

    gh = g_ref[0]
    gxin = jnp.zeros_like(gh)
    for l in range(layers - 1, -1, -1):
        g = gh
        last = l == layers - 1
        if l in skips:
            g = g + gxin
            if not last:
                g = relu_mask(l, g)
            gxin = g
        elif not last:
            g = relu_mask(l, g)
        h_in = hs_ref[l]
        # h_in^T @ g without an explicit transpose (contract the row dim)
        dw_ref[l, 0] += jax.lax.dot_general(
            h_in, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db_ref[l, 0] += jnp.sum(g.astype(jnp.float32), axis=0,
                                keepdims=True)
        # g @ W^T (contract the output dim of W)
        gh = jax.lax.dot_general(
            g, w_ref[l, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(g.dtype)
    dx_ref[0] = gh + gxin


def _fwd_call(x, ws, bs, skips: Tuple[int, ...], interpret: bool):
    e, c, m = x.shape
    layers = ws.shape[0]
    bc = _pick_block(c)
    grid = (e, c // bc)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, layers=layers, skips=skips),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bc, m), lambda ei, ci: (ei, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((layers, 1, m, m), lambda ei, ci: (0, ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((layers, 1, 1, m), lambda ei, ci: (0, ei, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bc, m), lambda ei, ci: (ei, ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, c, m), x.dtype),
        interpret=interpret,
    )(x, ws, bs)


def _bwd_call(x, ws, bs, g, skips: Tuple[int, ...], interpret: bool):
    e, c, m = x.shape
    layers = ws.shape[0]
    bc = _pick_block(c)
    grid = (e, c // bc)
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, layers=layers, skips=skips),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bc, m), lambda ei, ci: (ei, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((layers, 1, m, m), lambda ei, ci: (0, ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((layers, 1, 1, m), lambda ei, ci: (0, ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, m), lambda ei, ci: (ei, ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bc, m), lambda ei, ci: (ei, ci, 0),
                         memory_space=pltpu.VMEM),
            # revisited across ci; flushed when ei changes
            pl.BlockSpec((layers, 1, m, m), lambda ei, ci: (0, ei, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((layers, 1, 1, m), lambda ei, ci: (0, ei, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((e, c, m), x.dtype),
            jax.ShapeDtypeStruct((layers, e, m, m), jnp.float32),
            jax.ShapeDtypeStruct((layers, e, 1, m), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((layers + 1, bc, m), x.dtype)],
        interpret=interpret,
    )(x, ws, bs, g)
    return dx, dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def expert_mlp_chain(x, ws, bs, skips: Tuple[int, ...] = (),
                     interpret: bool = False):
    """Fused L-layer per-expert MLP chain.

    x:  [E, C, M] activations (compute dtype, e.g. bf16 under AMP)
    ws: [L, E, M, M] weights (same dtype as x)
    bs: [L, E, 1, M] biases (same dtype as x)
    skips: static layer indices with residual re-basing (ExpertMLP.skips)

    Returns [E, C, M]. Gradients for x/ws/bs; dW/db come back fp32 (the
    caller casts to the parameter dtype, matching the einsum path's
    fp32-accumulated weight grads).
    """
    return _fwd_call(x, ws, bs, tuple(skips), interpret)


def _chain_fwd(x, ws, bs, skips, interpret):
    return _fwd_call(x, ws, bs, tuple(skips), interpret), (x, ws, bs)


def _chain_bwd(skips, interpret, res, g):
    x, ws, bs = res
    dx, dw, db = _bwd_call(x, ws, bs, g, tuple(skips), interpret)
    return dx, dw.astype(ws.dtype), db.astype(bs.dtype)


expert_mlp_chain.defvjp(_chain_fwd, _chain_bwd)
