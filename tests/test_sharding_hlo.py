"""Compiled-HLO guards for the multi-chip sharding design.

The dryrun executes the sharded step but nothing previously pinned HOW it
parallelizes. These tests compile the full training step over the 8-device
CPU mesh and assert the optimized HLO contains the collectives the design
promises (SURVEY.md §2.7):

  * EP on (mesh data×expert = 4×2): an all-to-all (the expert token
    exchange over ICI — the GSPMD analog of the reference's NCCL
    `C.all_to_all_single`, tutel_moe_layer_nobatch.py:172,185) plus
    all-reduces (DP grad sync).
  * EP off (pure DP 8×1): grad all-reduces but NO all-to-all — expert
    weights replicated, no token exchange.
"""
import re

import jax
import pytest

import __graft_entry__ as g
from switch_nerf_tpu.parallel import (batch_sharding, create_mesh,
                                      param_shardings)
from switch_nerf_tpu.models.model_utils import get_bg_nerf, get_nerf
from switch_nerf_tpu.trainer import (SceneInfo, create_train_state,
                                     make_train_step,
                                     render_config_from_hparams)


def _compiled_hlo(ep: int) -> str:
    n = 8
    mesh = create_mesh((n // ep, ep), devices=jax.devices()[:n])
    h = g._building_hparams(tiny=True)
    h.no_expert_parallel = ep == 1
    h.batch_size = 64
    model = get_nerf(h, appearance_count=8)
    bg_model = get_bg_nerf(h, 8)
    state = create_train_state(jax.random.PRNGKey(0), h, model, bg_model)
    cfg = render_config_from_hparams(h)
    step = make_train_step(model, bg_model, h, cfg, SceneInfo())

    with jax.sharding.set_mesh(mesh):
        bs = batch_sharding(mesh)
        pshard = param_shardings(state.params, mesh, h.moe_expert_num,
                                 not h.no_expert_parallel)
        state = state.replace(params=jax.device_put(state.params, pshard))
        batch = g._make_batch(h, h.batch_size, seed=1)
        batch = jax.device_put(batch, {k: bs for k in batch})
        return jax.jit(step).lower(state, batch).compile().as_text()


@pytest.fixture(scope="module")
def hlo_ep():
    return _compiled_hlo(ep=2)


@pytest.fixture(scope="module")
def hlo_dp():
    return _compiled_hlo(ep=1)


def test_ep_step_contains_all_to_all_and_grad_allreduce(hlo_ep):
    assert re.search(r"\ball-to-all\b", hlo_ep), \
        "EP step compiled without an all-to-all expert token exchange"
    assert re.search(r"\ball-reduce\b", hlo_ep), \
        "EP step compiled without grad all-reduces"


def test_pure_dp_step_has_no_all_to_all(hlo_dp):
    assert not re.search(r"\ball-to-all\b", hlo_dp), \
        "pure-DP step unexpectedly contains an all-to-all"
    assert re.search(r"\ball-reduce\b", hlo_dp)


def test_mip_ep_step_shards_and_executes():
    """The SECOND headline workload (Mission-Bay-style mip step: use_mip,
    no bg, radii in the batch) over the same data×expert mesh: compiles
    with the expert all-to-all + grad all-reduces, and EXECUTES one step
    to a finite loss — multi-chip evidence isn't Building-only."""
    import re

    import jax.numpy as jnp

    n = 8
    mesh = create_mesh((n // 2, 2), devices=jax.devices()[:n])
    h = g._building_hparams(tiny=True)
    h.no_expert_parallel = False
    h.batch_size = 64
    h.use_mip = True
    h.nerfmoe_class_name = "MipNeRFMoE"
    h.bg_nerf = False
    model = get_nerf(h, appearance_count=8)
    state = create_train_state(jax.random.PRNGKey(0), h, model, None)
    cfg = render_config_from_hparams(h)
    step = make_train_step(model, None, h, cfg, SceneInfo(), mip=True)

    with jax.sharding.set_mesh(mesh):
        bs = batch_sharding(mesh)
        pshard = param_shardings(state.params, mesh, h.moe_expert_num,
                                 not h.no_expert_parallel)
        state = state.replace(params=jax.device_put(state.params, pshard))
        batch = g._make_batch(h, h.batch_size, seed=2)
        batch["radii"] = jnp.full((h.batch_size, 1), 0.02, jnp.float32)
        batch = jax.device_put(batch, {k: bs for k in batch})
        compiled = jax.jit(step).lower(state, batch).compile()
        hlo = compiled.as_text()
        assert re.search(r"\ball-to-all\b", hlo), \
            "mip EP step compiled without the expert all-to-all"
        assert re.search(r"\ball-reduce\b", hlo)
        new_state, metrics = compiled(state, batch)
        loss = float(metrics["loss"])
        assert loss == loss and loss < 1e6, f"non-finite mip EP loss {loss}"
