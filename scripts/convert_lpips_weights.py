"""One-time converter: lpips-package pretrained weights -> .npz for
switch_nerf_tpu.lpips_jax.

Run wherever `pip install lpips torchvision` works (NOT required on the TPU
host). Produces a single npz with HWIO conv kernels + learned lin weights
for vgg/alex/squeeze. Then on the TPU host:

    export SWITCH_NERF_LPIPS_WEIGHTS=/path/to/lpips_weights.npz
"""
import argparse

import numpy as np


def _export_net(lpips_model, net_name, out):
    import torch

    convs = [m for m in lpips_model.net.modules()
             if isinstance(m, torch.nn.Conv2d)]
    for i, conv in enumerate(convs):
        # torch OIHW -> HWIO
        k = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"{net_name}/conv{i}/kernel"] = k.astype(np.float32)
        bias = (conv.bias.detach().numpy() if conv.bias is not None
                else np.zeros(k.shape[-1], np.float32))
        out[f"{net_name}/conv{i}/bias"] = bias.astype(np.float32)
    for i, lin in enumerate(lpips_model.lins):
        k = lin.model[-1].weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"{net_name}/lin{i}/kernel"] = k.astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="lpips_weights.npz")
    p.add_argument("--nets", type=str, nargs="+",
                   default=["vgg", "alex", "squeeze"])
    args = p.parse_args()

    import datetime

    import lpips
    import torch

    from switch_nerf_tpu import lpips_jax as L

    nets = {}
    for net in args.nets:
        model = lpips.LPIPS(net=net).eval()
        out = {}
        _export_net(model, net, out)
        nets[net] = {k.split("/", 1)[1]: v for k, v in out.items()}
        print(f"exported {net}: {len(out)} tensors")

    # write_weights_npz validates every net against the consumer's exact
    # layout contract BEFORE writing (a tap/shape mismatch must fail here,
    # at conversion time, not months later on an offline TPU pod) and
    # embeds a provenance record: converter environment + per-net sha256,
    # verified again at every load (bit-level integrity)
    meta = {
        "lpips_version": getattr(lpips, "__version__", "unknown"),
        "torch_version": torch.__version__,
        "converted": datetime.datetime.now(
            datetime.timezone.utc).isoformat(),
    }
    file_sha = L.write_weights_npz(args.out, nets, meta)
    print(f"wrote {args.out} (layout validated, provenance embedded)")
    print(f"sha256: {file_sha}")
    print("Record this sha256 next to the artifact "
          "(see docs/LPIPS_WEIGHTS.md).")


if __name__ == "__main__":
    main()
