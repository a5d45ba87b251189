"""Import helpers for cross-framework parity tests against the reference
implementation mounted read-only at /root/reference (PyTorch).

The reference hard-imports Microsoft Tutel (CUDA/NCCL) and timm at module
scope; these stubs satisfy the imports so the PURE-TORCH code paths
(`apply_on_expert_fn_nobatch_torch`, ExpertMLP.baddbmm forward, dense NeRF)
can execute on CPU for numerics comparison. Nothing stubbed is ever called
in those paths.
"""
import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE / "switch_nerf").exists()


def install_stubs():
    import torch
    import torch.nn.init as I

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    def torch_cumsum_sub_one(x, dim=0):
        return torch.cumsum(x, dim=dim) - 1

    class _AnySparse(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                # dunders (e.g. __file__ probed by inspect/torch._dynamo
                # module scans) must behave like a normal missing attribute
                raise AttributeError(name)

            def _missing(*a, **k):
                raise RuntimeError(f"tutel stub {name} must not be called")
            return _missing

    # torch._six was removed from modern torch; utils/functions.py only
    # wants string_classes for its vendored collate
    mod("torch._six", string_classes=(str, bytes))
    # torchvision (absent from this image) is imported at module scope by
    # utils/functions.py for a transform never used in the parity paths
    mod("torchvision")
    mod("torchvision.transforms", ToTensor=object, Compose=object,
        Normalize=object, Resize=object)
    # lpips package (pretrained backbones, not installable offline):
    # switch_nerf.metrics imports it at module scope; only metrics.lpips
    # touches it, which parity tests never call
    class _LPIPSUnavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("lpips stub must not be instantiated")
    mod("lpips", LPIPS=_LPIPSUnavailable)
    mod("timm")
    mod("timm.models")
    mod("timm.models.layers",
        trunc_normal_=lambda t, std=1.0: I.trunc_normal_(t, std=std))
    mod("tutel")
    mod("tutel.impls")
    mod("tutel.impls.jit_compiler", IS_HIP_EXTENSION=False, JitCompiler=object,
        tutel_custom_kernel=None)
    mod("tutel.jit_kernels")
    mod("tutel.jit_kernels.gating",
        fast_cumsum_sub_one=torch_cumsum_sub_one,
        torch_cumsum_sub_one=torch_cumsum_sub_one)
    sys.modules.setdefault("tutel.jit_kernels.sparse",
                           _AnySparse("tutel.jit_kernels.sparse"))
    mod("tutel.impls.communicate",
        simple_all_reduce=lambda x, *a, **k: x,
        all_to_all_single=None, all_to_all=None, zero_gather=None,
        zero_scatter=None, AllToAllStatus=None, CurrentStreamRelease=None,
        CurrentStreamAcquire=None, TUTEL_GROUPING_CACHE={},
        barrier=lambda *a, **k: None,
        get_world_size=lambda *a, **k: 1, get_world_rank=lambda *a, **k: 0)
    mod("tutel.net")
    mod("tutel.impls.overlap", a2a_ffn_overlap_forward=None)
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))


def install_runner_stubs():
    """Extra stubs so switch_nerf.runner itself imports: fairscale and
    plyfile (absent from this image; the sharded-DDP imports are unused —
    SURVEY §2.7 'imported, unused' — and plyfile only serves the points
    paths), plus a torchvision ToTensor that actually converts (the
    writer-side add_image path calls it)."""
    import sys as _sys

    import numpy as _np
    import torch as _torch

    install_stubs()

    class _ToTensor:
        def __call__(self, img):
            arr = _np.asarray(img, _np.float32) / 255.0
            return _torch.tensor(arr).permute(2, 0, 1)
    _sys.modules["torchvision.transforms"].ToTensor = _ToTensor

    import types as _types

    def _mod(name, **attrs):
        m = _types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        _sys.modules.setdefault(name, m)
        return _sys.modules[name]

    _mod("npy_append_array", NpyAppendArray=object)
    if "configargparse" not in _sys.modules:
        import argparse as _argparse

        class _ArgParser(_argparse.ArgumentParser):
            def __init__(self, *a, **kw):
                kw.pop("config_file_parser_class", None)
                super().__init__(*a, **kw)

            def add_argument(self, *a, **kw):
                kw.pop("is_config_file", None)
                return super().add_argument(*a, **kw)

        _mod("configargparse", ArgParser=_ArgParser,
             YAMLConfigFileParser=object)
    _mod("fairscale")
    _mod("fairscale.optim", OSS=object)
    _mod("fairscale.optim.grad_scaler", ShardedGradScaler=object)
    _mod("fairscale.nn")
    _mod("fairscale.nn.data_parallel", ShardedDataParallel=object)
    _mod("plyfile", PlyData=object, PlyElement=object)
