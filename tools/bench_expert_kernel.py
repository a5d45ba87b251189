"""Microbenchmark: fused Pallas expert chain vs the einsum chain, on TPU.

Production shape = Building fg expert stack: E=8 experts, C=2048 capacity
rows per expert (16384-token chunk, capacity factor 1.0), M=256, L=7
layers with a skip at 4 (reference tutel_moe_layer_nobatch.py:837-924 /
our models/experts.py). Timed by chaining ITERS dependent calls inside
one jit (tunnel latency ~1 ms/call otherwise) and forcing a real sync
with float().

Usage: python tools/bench_expert_kernel.py [block_size]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")
from switch_nerf_tpu.ops import expert_kernel
from switch_nerf_tpu.ops.expert_kernel import expert_mlp_chain

E, C, M, L = 8, 2048, 256, 7
SKIPS = (4,)
ITERS = 50


def einsum_chain(x, ws, bs, skips=SKIPS):
    h = x
    xin = x
    for l in range(ws.shape[0]):
        h = jnp.einsum("ecm,emn->ecn", h, ws[l],
                       preferred_element_type=jnp.float32).astype(h.dtype)
        h = h + bs[l]
        last = l == ws.shape[0] - 1
        if l in set(skips):
            h = h + xin
            if not last:
                h = jax.nn.relu(h)
            xin = h
        elif not last:
            h = jax.nn.relu(h)
    return h


def timed(fn, *args):
    out = fn(*args)                       # compile + warm
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))  # real sync through tunnel
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS
    return dt


def chain(step):
    """ITERS dependent invocations of step(x)->x inside one jit."""
    @jax.jit
    def run(x, ws, bs):
        def body(h, _):
            return step(h, ws, bs), None
        h, _ = jax.lax.scan(body, x, None, length=ITERS)
        return h
    return run


def chain_grad(step):
    @jax.jit
    def run(x, ws, bs):
        def body(carry, _):
            h, gw_acc = carry
            def loss(h, ws, bs):
                return jnp.sum(step(h, ws, bs).astype(jnp.float32))
            (dh, dw, _) = jax.grad(loss, argnums=(0, 1, 2))(h, ws, bs)
            return (dh.astype(h.dtype), gw_acc + dw.astype(jnp.float32)), None
        (h, gw), _ = jax.lax.scan(body, (x, jnp.zeros(ws.shape, jnp.float32)),
                                  None, length=ITERS)
        return h, gw
    return run


def main():
    if len(sys.argv) > 1:
        expert_kernel._BLOCK_TARGET = int(sys.argv[1])
    bc = expert_kernel._pick_block(C)
    print(f"devices={jax.devices()} block={bc}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (E, C, M)), jnp.bfloat16)
    ws = jnp.asarray(rng.normal(0, 0.1, (L, E, M, M)), jnp.bfloat16)
    bs = jnp.asarray(rng.normal(0, 0.1, (L, E, 1, M)), jnp.bfloat16)

    kern = functools.partial(expert_mlp_chain, skips=SKIPS)

    for name, step in [("einsum", einsum_chain), ("pallas", kern)]:
        dt = timed(chain(step), x, ws, bs)
        print(f"fwd  {name:8s} {dt*1e6:8.1f} us/call")
    for name, step in [("einsum", einsum_chain), ("pallas", kern)]:
        dt = timed(chain_grad(step), x, ws, bs)
        print(f"f+b  {name:8s} {dt*1e6:8.1f} us/call")


if __name__ == "__main__":
    main()
