"""Convert a reference (MiZhenxing/Switch-NeRF, PyTorch) checkpoint into a
switch_nerf_tpu checkpoint — enables evaluating released Switch-NeRF
checkpoints with this framework's eval suite for direct PSNR/SSIM parity.

Handles the training-format checkpoints (`expertmlp` stacked expert weights
— the format the reference saves at runner.py:2799-2818), with DDP
`module.` prefix stripping. Usage:

    python scripts/convert_torch_ckpt.py <eval flags for the scene> \
        --torch_ckpt=<reference .pt> --out_ckpt=<output dir>

then eval with --ckpt_path=<output dir>.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from switch_nerf_tpu.config import get_opts, parse_args  # noqa: E402


def map_mlp(sd, torch_prefix, out, flax_prefix):
    i = 0
    while f"{torch_prefix}.fcs.{i}.weight" in sd:
        out[f"{flax_prefix}/fc{i}/kernel"] = \
            sd[f"{torch_prefix}.fcs.{i}.weight"].T
        out[f"{flax_prefix}/fc{i}/bias"] = sd[f"{torch_prefix}.fcs.{i}.bias"]
        if f"{torch_prefix}.norms.{i}.weight" in sd:
            out[f"{flax_prefix}/norm{i}/scale"] = \
                sd[f"{torch_prefix}.norms.{i}.weight"]
            out[f"{flax_prefix}/norm{i}/bias"] = \
                sd[f"{torch_prefix}.norms.{i}.bias"]
        i += 1
    return i


def convert_nerf_moe_state_dict(sd) -> dict:
    """torch state_dict (numpy values) -> flat {'a/b/c': array} for NeRFMoE.

    Name map (reference nerf_moe.py / tutel_moe_layer_nobatch.py):
      embedding_a.weight               -> embedding_a/embedding
      affine.weight/bias               -> affine/kernel(T)/bias
      layers.<tag>.fcs.i.{weight,bias} -> layer_<tag>/fci/{kernel(T),bias}
      layers.<tag>.weight/bias (LN)    -> layer_<tag>/{scale,bias}
      layers.<t>.gates.0.wg.weight     -> layer_<t>/wg/kernel (T)
      layers.<t>.experts.0.weights.j   -> layer_<t>/experts/wj   (same [E,in,out])
      layers.<t>.experts.0.bias.j      -> layer_<t>/experts/bj
      layers.sigma/color               -> layer_sigma / layer_color
    """
    out = {}
    done = set()

    def take(k):
        done.add(k)
        return sd[k]

    for key in list(sd):
        if key in done:
            continue
        if key == "embedding_a.weight":
            out["embedding_a/embedding"] = take(key)
        elif key == "affine.weight":
            out["affine/kernel"] = take(key).T
        elif key == "affine.bias":
            out["affine/bias"] = take(key)
        elif ".residual_expert." in key:
            # DeepSpeed-style residual MoE (tutel_moe_layer_nobatch.py:
            # 666-672, 778-788): a 1-expert ExpertMLP stack. The reference
            # can also build seqexperts/ffn residuals (:641-652) with
            # different key layouts — fail loudly rather than mis-map.
            parts = key.split(".")      # layers t residual_expert weights j
            if len(parts) != 5 or parts[3] not in ("weights", "bias") \
                    or not parts[4].isdigit():
                raise ValueError(
                    f"unsupported residual_expert checkpoint layout at "
                    f"{key!r}: only the 'expertmlp' residual "
                    f"(residual_expert.weights.<j>/bias.<j>) converts")
            tag, kind, j = parts[1], parts[3], parts[4]
            name = "w" if kind == "weights" else "b"
            out[f"layer_{tag}/residual_expert/{name}{j}"] = take(key)
        elif ".coefficient." in key:
            # residual blend Linear(model_dim, 2) (:504-505)
            tag = key.split(".")[1]
            if key.endswith(".weight"):
                out[f"layer_{tag}/coefficient/kernel"] = take(key).T
            else:
                out[f"layer_{tag}/coefficient/bias"] = take(key)
        elif ".fcs." in key and key.startswith("layers."):
            tag = key.split(".")[1]
            map_mlp(sd, f"layers.{tag}", out, f"layer_{tag}")
            for k2 in list(sd):
                if k2.startswith(f"layers.{tag}.fcs.") or \
                        k2.startswith(f"layers.{tag}.norms."):
                    done.add(k2)
        elif ".gates." in key and key.endswith("wg.weight"):
            tag = key.split(".")[1]
            out[f"layer_{tag}/wg/kernel"] = take(key).T
        elif ".experts." in key:
            parts = key.split(".")            # layers t experts 0 weights j
            if len(parts) != 6 or parts[4] not in ("weights", "bias") \
                    or not parts[5].isdigit():
                raise ValueError(
                    f"unsupported expert checkpoint layout at {key!r}: "
                    f"only the training-format 'expertmlp' stacks "
                    f"(experts.0.weights.<j>/bias.<j>) convert — migrate "
                    f"seqexperts/ffn checkpoints to expertmlp first")
            tag, kind, j = parts[1], parts[4], parts[5]
            name = "w" if kind == "weights" else "b"
            out[f"layer_{tag}/experts/{name}{j}"] = take(key)
        elif key.startswith("layers.") and key.endswith((".weight", ".bias")) \
                and key.count(".") == 2:
            # bare LayerNorm tags (gate_input_norm)
            tag = key.split(".")[1]
            suffix = "scale" if key.endswith(".weight") else "bias"
            out[f"layer_{tag}/{suffix}"] = take(key)
    return out


def convert_dense_nerf_state_dict(sd) -> dict:
    """Dense NeRF. Reference names (switch_nerf/models/nerf.py):
    xyz_encodings.{i}.0.* (Sequential(Linear, ReLU)), xyz_encoding_final.*,
    dir_a_encoding.0.*, sigma.*, rgb.*, affine.*, embedding_a.weight."""
    out = {}
    for key, v in sd.items():
        name = key
        # strip the Sequential's inner ".0" module index
        name = name.replace("dir_a_encoding.0.", "dir_a_encoding.")
        if name.startswith("xyz_encodings."):
            parts = name.split(".")          # xyz_encodings i 0 weight
            name = f"xyz_encoding_{parts[1]}.{parts[-1]}"
        flax_key = name.replace(".", "/")
        if key == "embedding_a.weight":
            out["embedding_a/embedding"] = v
        elif name.endswith(".weight") and v.ndim == 2:
            out[flax_key[:-len("/weight")] + "/kernel"] = v.T
        elif name.endswith(".bias"):
            out[flax_key[:-len("/bias")] + "/bias"] = v
        else:
            out[flax_key] = v
    return out


def unflatten(flat: dict) -> dict:
    tree = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v, np.float32)
    return tree


def _strip_module(sd):
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def main():
    parser = get_opts()
    parser.add_argument("--torch_ckpt", type=str, required=True)
    parser.add_argument("--out_ckpt", type=str, required=True)
    hparams = parse_args(parser)

    import torch
    import jax

    from switch_nerf_tpu.checkpoints import save_checkpoint
    from switch_nerf_tpu.runner import Runner
    from switch_nerf_tpu.trainer import create_train_state

    ckpt = torch.load(hparams.torch_ckpt, map_location="cpu",
                      weights_only=False)
    iteration = int(ckpt.get("iteration", 0))

    runner = Runner(hparams, set_experiment_path=False)
    state = create_train_state(runner.init_rng, hparams, runner.nerf,
                               runner.bg_nerf)

    def to_np(sd):
        return {k: v.detach().cpu().numpy() for k, v in sd.items()
                if hasattr(v, "detach")}

    sd = _strip_module(to_np(ckpt["model_state_dict"]))
    conv = convert_nerf_moe_state_dict(sd) if hparams.use_moe \
        else convert_dense_nerf_state_dict(sd)
    params = dict(state.params)
    params["nerf"] = _merge(state.params["nerf"], unflatten(conv), "nerf")

    if runner.bg_nerf is not None and "bg_model_state_dict" in ckpt:
        bsd = _strip_module(to_np(ckpt["bg_model_state_dict"]))
        bconv = convert_nerf_moe_state_dict(bsd) \
            if hparams.bg_use_moe else convert_dense_nerf_state_dict(bsd)
        params["bg_nerf"] = _merge(state.params["bg_nerf"],
                                   unflatten(bconv), "bg_nerf")

    import jax.numpy as jnp
    state = state.replace(params=params,
                          step=jnp.asarray(iteration, jnp.int32))
    path = save_checkpoint(hparams.out_ckpt, state)
    print(f"wrote converted checkpoint to {path} (iteration {iteration})")


def _merge(template, converted, label):
    """Overlay converted leaves onto the template tree, checking coverage."""
    import jax
    flat_t = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    missing, merged = [], converted

    def walk(t, c, prefix):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out[k] = walk(v, c.get(k, {}), prefix + [k])
            else:
                if k in c:
                    got = c[k]
                    assert got.shape == v.shape, \
                        (f"{label}:{'/'.join(prefix + [k])} shape "
                         f"{got.shape} != {v.shape}")
                    out[k] = got.astype(np.asarray(v).dtype)
                else:
                    missing.append("/".join(prefix + [k]))
                    out[k] = v
        return out

    result = walk(template, converted, [])
    if missing:
        print(f"WARNING: {label}: {len(missing)} params not found in the "
              f"torch checkpoint (kept initialised): {missing[:10]}")
    return result


if __name__ == "__main__":
    main()
