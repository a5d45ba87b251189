"""Package a trained checkpoint as a self-contained inference container.

Parity target: switch_nerf/scripts/convert_to_container_moe.py:22-76
(TorchScript MegaNeRFContainer export, with a forward self-test). Usage:

    python scripts/convert_to_container_moe.py --config_file=... --use_moe \
        --exp_name=tmp --dataset_path=... --ckpt_path=<ckpt step dir> \
        --container_out=<out dir>
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from switch_nerf_tpu.config import get_opts, parse_args  # noqa: E402


def main():
    parser = get_opts()
    parser.add_argument("--container_out", type=str, required=True)
    hparams = parse_args(parser)

    import jax
    from switch_nerf_tpu.container import load_container, save_container
    from switch_nerf_tpu.runner import Runner

    runner = Runner(hparams, set_experiment_path=False)
    state = runner._load_eval_state()
    scene = {}
    if runner.sphere_center is not None:
        scene = {"sphere_center": np.asarray(runner.sphere_center).tolist(),
                 "sphere_radius": np.asarray(runner.sphere_radius).tolist(),
                 "near": runner.near, "far": runner.far}

    out = save_container(hparams.container_out, hparams, state.params,
                         runner.appearance_count, scene)
    print(f"wrote container to {out}")

    # forward self-test through the reloaded container (reference
    # convert_to_container_moe.py:56-75 evaluates ones through the export)
    nerf, bg, params, cfg = load_container(out)
    d_pts = (6 if hparams.use_mip else 3) \
        + (3 if hparams.pos_dir_dim > 0 else 0) \
        + (1 if hparams.appearance_dim > 0 else 0)
    import jax.numpy as jnp
    pts = jnp.ones((8, d_pts), jnp.float32)
    res = nerf.apply({"params": params["nerf"]}, pts, deterministic=True)
    outp = res["outputs"] if isinstance(res, dict) else res
    assert np.isfinite(np.asarray(outp)).all()
    print(f"container self-test OK: forward {outp.shape}")


if __name__ == "__main__":
    main()
