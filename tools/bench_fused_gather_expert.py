"""A/B: fold the dispatch gather into the expert-chain kernel (round-3
verdict item 5's untried structural lever).

Production path (A): XLA gather materializes the [E, C, M] dispatch buffer
in HBM (tokens already gate-scaled pre-gather), then the einsum chain runs
L GEMM layers over it. The gather runs at the measured ~300 GB/s v5e
gather ceiling and CANNOT overlap the GEMMs (one TensorCore, HLOs
serialize).

Fused path (B): a Pallas kernel keeps the WHOLE gate-scaled token array
resident in VMEM (16.4k x 256 bf16 = 8.4 MB of the ~16 MB/core), gathers
each block's rows in-kernel via a fori_loop of dynamic slices driven by
the slot->token map (SMEM), and runs the L-layer chain on the gathered
block without ever writing the dispatch buffer to HBM. If in-VMEM row
gathers are cheap enough, the 18.7%% custom-fusion profile slice folds
into the GEMM kernel's shadow.

Run on the real chip:  python tools/bench_fused_gather_expert.py
Prints one JSON line with both timings at the production shape
(E=8, C=2048, M=256, L=7, skip@4, bf16, S=16384 tokens).
"""
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chain(h, w_ref, b_ref, layers, skips):
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
    return h


def _fused_kernel(idx_ref, tok_ref, w_ref, b_ref, o_ref, xs_ref, *,
                  layers, skips, bc, c, unroll):
    # in-VMEM gather: slot r of this block reads token row idx_ref[...]
    # (idx_ref is the scalar-prefetched flat [E*C] slot->token map in SMEM)
    ei, ci = pl.program_id(0), pl.program_id(1)
    base = ei * c + ci * bc

    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def body(i, _):
        # Mosaic requires dynamic sublane offsets provably 8-aligned, for
        # both loads and stores: per row, load the aligned 8-row group and
        # mask-select (one row nonzero -> the f32 sum is exact); stack 8
        # gathered rows and store them as one aligned block.
        rows = []
        for u in range(8):
            t = idx_ref[base + i * 8 + u]
            t0 = pl.multiple_of((t // 8) * 8, 8)
            g = tok_ref[pl.ds(t0, 8), :].astype(jnp.float32)
            mask = (sub == (t - t0)).astype(jnp.float32)
            rows.append(jnp.sum(g * mask, axis=0, keepdims=True))
        blk = jnp.concatenate(rows, axis=0).astype(xs_ref.dtype)
        xs_ref[pl.ds(pl.multiple_of(i * 8, 8), 8), :] = blk
        return 0
    jax.lax.fori_loop(0, bc // 8, body, 0)
    o_ref[0] = _chain(xs_ref[...], w_ref, b_ref, layers, skips)


def fused_gather_chain(tokens, slot_token, ws, bs, skips, bc=512, unroll=8):
    s, m = tokens.shape
    e, c = slot_token.shape
    layers = ws.shape[0]
    grid = (e, c // bc)
    return pl.pallas_call(
        functools.partial(_fused_kernel, layers=layers, skips=skips,
                          bc=bc, c=c, unroll=unroll),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # whole token array VMEM-resident across the grid
                pl.BlockSpec((s, m), lambda ei, ci, idx: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((layers, 1, m, m),
                             lambda ei, ci, idx: (0, ei, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((layers, 1, 1, m),
                             lambda ei, ci, idx: (0, ei, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bc, m),
                                   lambda ei, ci, idx: (ei, ci, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bc, m), tokens.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((e, c, m), tokens.dtype),
    )(slot_token.reshape(-1), tokens, ws, bs)


def reference_gather_chain(tokens, slot_token, ws, bs, skips):
    x = jnp.take(tokens, slot_token.reshape(-1), axis=0).reshape(
        slot_token.shape + (tokens.shape[-1],))
    h = x
    xin = h
    layers = ws.shape[0]
    for l in range(layers):
        z = jnp.einsum("ecm,emn->ecn", h, ws[l],
                       preferred_element_type=jnp.float32).astype(h.dtype)
        z = z + bs[l]                      # [E,1,M] broadcasts over C
        last = l == layers - 1
        if l in skips:
            z = z + xin
            if not last:
                z = jnp.maximum(z, 0)
            xin = z
        elif not last:
            z = jnp.maximum(z, 0)
        h = z
    return h


def _time(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[-1] if isinstance(out, tuple) else out).astype(
        jnp.float32))

    # chain iterations inside one jit (tunnel microbench rule)
    @jax.jit
    def chained(a):
        def body(carry, _):
            r = fn(*a)
            return carry + jnp.sum(r).astype(jnp.float32), 0
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return acc
    acc = chained(args)
    float(acc)
    t0 = time.perf_counter()
    acc = chained(args)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    e, c, m, layers, s = 8, 2048, 256, 7, 16384
    skips = (4,)
    rng = np.random.default_rng(0)
    # +1 zero row for empty slots (dispatch's drop target)
    tokens = np.concatenate(
        [rng.normal(0, 1, (s, m)), np.zeros((1, m))], 0).astype(np.float32)
    pad = (-tokens.shape[0]) % 16
    tokens = np.concatenate([tokens, np.zeros((pad, m), np.float32)])
    slot_token = rng.integers(0, s, (e, c), dtype=np.int32)
    slot_token[rng.uniform(size=(e, c)) < 0.05] = s   # some empty slots
    ws = (rng.normal(0, 0.05, (layers, e, m, m))).astype(np.float32)
    bs = (rng.normal(0, 0.01, (layers, e, 1, m))).astype(np.float32)

    dt = jnp.bfloat16
    tokens_j = jnp.asarray(tokens, dt)
    ws_j, bs_j = jnp.asarray(ws, dt), jnp.asarray(bs, dt)
    idx_j = jnp.asarray(slot_token)

    ref = jax.jit(functools.partial(reference_gather_chain, skips=skips))
    fus = jax.jit(functools.partial(fused_gather_chain, skips=skips))

    a = np.asarray(ref(tokens_j, idx_j, ws_j, bs_j), np.float32)
    b = np.asarray(fus(tokens_j, idx_j, ws_j, bs_j), np.float32)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)  # bf16 parity

    t_ref = _time(lambda tk, ix, w, bb: ref(tk, ix, w, bb),
                  tokens_j, idx_j, ws_j, bs_j)
    t_fus = _time(lambda tk, ix, w, bb: fus(tk, ix, w, bb),
                  tokens_j, idx_j, ws_j, bs_j)
    print(json.dumps({
        "metric": "fused_gather_expert_chain_fwd_us",
        "shape": f"E{e} C{c} M{m} L{layers} S{s} bf16",
        "xla_gather_plus_einsum_us": round(t_ref * 1e6, 1),
        "fused_pallas_us": round(t_fus * 1e6, 1),
        "speedup": round(t_ref / t_fus, 3),
    }))


if __name__ == "__main__":
    main()
