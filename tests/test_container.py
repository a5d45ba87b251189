"""Container export/load roundtrip (TorchScript-container analog)."""
import jax
import jax.numpy as jnp
import numpy as np

from switch_nerf_tpu.config import get_opts_base, parse_args
from switch_nerf_tpu.container import load_container, save_container
from switch_nerf_tpu.models.model_utils import get_nerf
from switch_nerf_tpu.trainer import create_train_state
from tests.test_trainer import tiny_moe_graph


def test_container_roundtrip(tmp_path):
    h = parse_args(get_opts_base(), [])
    h.use_moe = True
    h.use_moe_external_gate = True
    h.moe_expert_num = 4
    h.model = tiny_moe_graph()
    h.pos_xyz_dim = 2
    h.pos_dir_dim = 1
    h.appearance_dim = 4
    h.bg_nerf = False
    h.amp = False
    model = get_nerf(h, appearance_count=4)
    state = create_train_state(jax.random.PRNGKey(0), h, model, None)

    out = save_container(tmp_path / "container", h, state.params, 4,
                         scene={"near": 0.1, "far": 2.0})
    assert (out / "model_config.json").exists()
    assert (out / "params.msgpack").exists()

    nerf, bg, params, cfg = load_container(out)
    assert bg is None
    assert cfg["appearance_count"] == 4
    assert cfg["scene"]["near"] == 0.1

    # forward through the reloaded container == forward through the original
    pts = jax.random.normal(jax.random.PRNGKey(1), (16, 7))
    y0 = model.apply({"params": state.params["nerf"]}, pts,
                     deterministic=True)["outputs"]
    y1 = nerf.apply({"params": params["nerf"]}, pts,
                    deterministic=True)["outputs"]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
