"""Import helpers for cross-framework parity tests against the reference
implementation mounted read-only at /root/reference (PyTorch).

The reference hard-imports Microsoft Tutel (CUDA/NCCL) and timm at module
scope; these stubs satisfy the imports so the PURE-TORCH code paths
(`apply_on_expert_fn_nobatch_torch`, ExpertMLP.baddbmm forward, dense NeRF)
can execute on CPU for numerics comparison.

Additionally the tutel sparse-dispatch kernels are given pure-torch CPU
equivalents (exact semantics transcribed from the CUDA sources), so the
reference's KERNEL dispatch paths also run on CPU:
  * tutel.jit_kernels.sparse — REAL tutel's batch dispatcher (reference
    tutel_fast_dispatch.py:10): [E*capacity, M] grid, row = e*cap + loc,
    capacity-overflow tokens dropped. Selected by --moe_train_batch /
    --moe_test_batch (runner.py:479 set_no_batch(False)).
  * JitCompiler.generate_cpu_kernel — the nobatch ext dispatcher
    (tutel_sparse_nobatch.py:17-120): variable-size contiguous layout via
    expert_locations_begin, no drops (apply_on_expert_fn_nobatch).
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

    # Pure-torch equivalents of tutel_sparse_nobatch's three jit kernels
    # (reference tutel_sparse_nobatch.py:17-120, CUDA source), so the
    # reference's BATCH dispatch path (tutel_moe_layer_nobatch.py:98
    # apply_on_expert_fn, selected by --moe_train_batch/--moe_test_batch)
    # runs on CPU. Call signature per tutel_fast_dispatch_nobatch.py:128-131
    # and GatingEncoder/GatingDecoder: fn(gates, indices, locations,
    # expert_locations_begin, src, dst, extra=[samples, hidden, capacity]).
    # Semantics: row = expert_locations_begin[indices[s]] + locations[s]
    # (contiguous layout by ACTUAL per-expert counts — no capacity clamp,
    # no drops); indices[s] < 0 rows are skipped (fwd) / zeroed (bwd).
    def _rows(i, l, begin, samples):
        i = i.reshape(-1)[:samples].long()
        sel = i >= 0
        rows = begin.long()[i[sel]] + l.reshape(-1)[:samples].long()[sel]
        return sel, rows

    def _gsel(g, samples, sel):
        return g.reshape(-1)[:samples][sel]

    def _cpu_fwd(g, i, l, begin, src, dst, extra=None):
        samples, _, _ = extra
        sel, rows = _rows(i, l, begin, samples)
        dst.index_add_(
            0, rows,
            _gsel(g, samples, sel).unsqueeze(1).to(dst.dtype) * src[sel])

    def _cpu_bwd_data(g, i, l, begin, grad_data, dispatched, extra=None):
        samples, _, _ = extra
        sel, rows = _rows(i, l, begin, samples)
        grad_data.zero_()
        grad_data[sel] = (_gsel(g, samples, sel).unsqueeze(1)
                          .to(dispatched.dtype) * dispatched[rows])

    def _cpu_bwd_gate(grad_gates, i, l, begin, src, dispatched, extra=None):
        samples, _, _ = extra
        sel, rows = _rows(i, l, begin, samples)
        grad_gates.zero_()
        grad_gates[sel] = (
            src[sel].to(dispatched.dtype) * dispatched[rows]).sum(-1)

    class _JitCompiler:
        @staticmethod
        def generate_kernel(*a, **k):
            raise RuntimeError("tutel CUDA kernel requested under CPU stubs")

        @staticmethod
        def generate_cpu_kernel(kernel_type):
            return {0: _cpu_fwd, 1: _cpu_bwd_data,
                    2: _cpu_bwd_gate}[kernel_type]

    # Pure-torch equivalents of REAL tutel's jit_kernels.sparse (the BATCH
    # dispatcher, reference tutel_fast_dispatch.py:10,25-27: buffer is
    # [E*capacity, M], row = indices[s]*capacity + locations[s], guarded by
    # locations[s] < capacity AND indices[s] >= 0 — i.e. capacity-overflow
    # tokens are DROPPED). Call: fn(gates, indices, locations, src, dst,
    # extra=[samples, hidden, capacity]).
    def _grid_rows(i, l, capacity, samples):
        i = i.reshape(-1)[:samples].long()
        l = l.reshape(-1)[:samples].long()
        sel = (i >= 0) & (l < capacity)
        return sel, i[sel] * capacity + l[sel]

    def _tutel_fwd(g, i, l, src, dst, extra=None):
        samples, _, capacity = extra
        sel, rows = _grid_rows(i, l, capacity, samples)
        dst.index_add_(
            0, rows,
            _gsel(g, samples, sel).unsqueeze(1).to(dst.dtype) * src[sel])

    def _tutel_bwd_data(g, i, l, grad_data, dispatched, extra=None):
        samples, _, capacity = extra
        sel, rows = _grid_rows(i, l, capacity, samples)
        grad_data.zero_()
        grad_data[sel] = (_gsel(g, samples, sel).unsqueeze(1)
                          .to(dispatched.dtype) * dispatched[rows])

    def _tutel_bwd_gate(grad_gates, i, l, src, dispatched, extra=None):
        samples, _, capacity = extra
        sel, rows = _grid_rows(i, l, capacity, samples)
        grad_gates.zero_()
        grad_gates[sel] = (
            src[sel].to(dispatched.dtype) * dispatched[rows]).sum(-1)

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
    mod("tutel.impls.jit_compiler", IS_HIP_EXTENSION=False,
        JitCompiler=_JitCompiler, tutel_custom_kernel=None)
    mod("tutel.jit_kernels")
    mod("tutel.jit_kernels.gating",
        fast_cumsum_sub_one=torch_cumsum_sub_one,
        torch_cumsum_sub_one=torch_cumsum_sub_one)
    mod("tutel.jit_kernels.sparse",
        create_forward=lambda dtype, is_cuda=True: _tutel_fwd,
        create_backward_data=lambda dtype, is_cuda=True: _tutel_bwd_data,
        create_backward_gate=lambda dtype, is_cuda=True: _tutel_bwd_gate)
    mod("tutel.impls.communicate",
        simple_all_reduce=lambda x, *a, **k: x,
        # single-process a2a is the identity (batch dispatch path calls it
        # unconditionally at a2a_ffn_overlap_degree=1)
        all_to_all_single=lambda x, *a, **k: x,
        all_to_all=None, zero_gather=None,
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
