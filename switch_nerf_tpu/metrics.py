"""Image-quality metrics: PSNR / SSIM (+ masked variants) in pure jnp.

Parity targets: switch_nerf/metrics.py:8-208 —
  * psnr / psnr_mask — mse -> -10 log10
  * ssim / ssim_mask — the PlenOctree separable-Gaussian formulation modeled
    after tf.image.ssim (filter_size 11, sigma 1.5, k1 .01, k2 .03)
  * lpips — the reference uses the `lpips` package (pretrained VGG/Alex/
    Squeeze). `lpips()` loads converted JAX weights from
    SWITCH_NERF_LPIPS_WEIGHTS / weights/lpips.npz when present (exact
    protocol parity) and otherwise falls back to the documented
    deterministic random-init substitute (see lpips()'s docstring), so
    eval always emits all three numbers out of the box.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(rgbs: jnp.ndarray, target_rgbs: jnp.ndarray) -> float:
    mse = jnp.mean(jnp.square(rgbs.astype(jnp.float32)
                              - target_rgbs.astype(jnp.float32)))
    return float(-10.0 * jnp.log10(mse))


def psnr_mask(rgbs, target_rgbs, valid_mask) -> float:
    r = rgbs[valid_mask]
    t = target_rgbs[valid_mask]
    mse = jnp.mean(jnp.square(r.astype(jnp.float32) - t.astype(jnp.float32)))
    return float(-10.0 * jnp.log10(mse))


def _gaussian_filt(filter_size: int, filter_sigma: float) -> jnp.ndarray:
    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((jnp.arange(filter_size, dtype=jnp.float32) - hw + shift)
           / filter_sigma) ** 2
    filt = jnp.exp(-0.5 * f_i)
    return filt / jnp.sum(filt)


def _ssim_map(rgbs: jnp.ndarray, target_rgbs: jnp.ndarray, max_val: float,
              filter_size: int, filter_sigma: float, k1: float, k2: float):
    """rgbs/target: [H, W, C] float. Returns per-pixel ssim map [H', W', C].

    Separable valid-region behaviour matches the torch conv2d with
    asymmetric padding: pad hw on both sides per axis (conv2d 'same' for odd
    sizes), so output shape == input shape.
    """
    filt = _gaussian_filt(filter_size, filter_sigma)
    hw = filter_size // 2

    def blur_axis(z, axis):
        # z: [H, W, C]; 1-D correlation along `axis` with zero padding.
        z_move = jnp.moveaxis(z, axis, -1)                   # [.., L]
        pad = [(0, 0)] * (z_move.ndim - 1) + [(hw, hw)]
        z_pad = jnp.pad(z_move, pad)
        windows = jnp.stack(
            [z_pad[..., i:i + z_move.shape[-1]] for i in range(filter_size)],
            axis=-1)                                          # [.., L, F]
        out = jnp.einsum("...lf,f->...l", windows, filt)
        return jnp.moveaxis(out, -1, axis)

    def filt_fn(z):
        return blur_axis(blur_axis(z, 1), 0)

    rgbs = rgbs.astype(jnp.float32)
    target_rgbs = target_rgbs.astype(jnp.float32)
    mu0 = filt_fn(rgbs)
    mu1 = filt_fn(target_rgbs)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = filt_fn(rgbs ** 2) - mu00
    sigma11 = filt_fn(target_rgbs ** 2) - mu11
    sigma01 = filt_fn(rgbs * target_rgbs) - mu01

    sigma00 = jnp.clip(sigma00, min=0.0)
    sigma11 = jnp.clip(sigma11, min=0.0)
    sigma01 = jnp.sign(sigma01) * jnp.minimum(
        jnp.sqrt(sigma00 * sigma11), jnp.abs(sigma01))

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    return numer / denom


def ssim(rgbs, target_rgbs, max_val: float, filter_size: int = 11,
         filter_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03
         ) -> float:
    m = _ssim_map(jnp.asarray(rgbs), jnp.asarray(target_rgbs), max_val,
                  filter_size, filter_sigma, k1, k2)
    return float(jnp.mean(m))


def ssim_mask(rgbs, target_rgbs, max_val: float, valid_mask,
              filter_size: int = 11, filter_sigma: float = 1.5,
              k1: float = 0.01, k2: float = 0.03) -> float:
    m = _ssim_map(jnp.asarray(rgbs), jnp.asarray(target_rgbs), max_val,
                  filter_size, filter_sigma, k1, k2)
    return float(jnp.mean(m[np.asarray(valid_mask)]))


_warned_no_lpips = False

# Default on-repo location for converted LPIPS weights (see
# scripts/convert_lpips_weights.py); the env var overrides.
_LPIPS_DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "weights", "lpips.npz")


def _resolve_lpips_weights() -> Optional[str]:
    p = os.environ.get("SWITCH_NERF_LPIPS_WEIGHTS")
    if p:
        # explicit user intent: a missing path must fail loudly, not fall
        # back to substitute numbers recorded under the same lpips-* keys
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"SWITCH_NERF_LPIPS_WEIGHTS={p!r} does not exist")
        return p
    if os.path.exists(_LPIPS_DEFAULT_PATH):
        return _LPIPS_DEFAULT_PATH
    return None


def validate_lpips_setup() -> Optional[str]:
    """Resolve + schema-check the LPIPS weight configuration ONCE, at
    startup: a set-but-missing SWITCH_NERF_LPIPS_WEIGHTS or a malformed
    npz must fail before training/eval begins, not at the first validation
    image hours in. Returns the resolved path (None = substitute mode)."""
    path = _resolve_lpips_weights()      # raises on set-but-missing env
    if path is not None:
        from switch_nerf_tpu import lpips_jax as L
        L.load_and_validate(path)        # raises on layout mismatch
    return path


def lpips(rgbs, target_rgbs) -> Dict[str, Optional[float]]:
    """LPIPS(vgg/alex/squeeze) over [0, 1] images, always available.

    PROVENANCE CONTRACT: with real converted weights the returned keys are
    the reference names ('vgg'/'alex'/'squeeze' — downstream 'lpips-vgg'
    etc. in metrics.txt, matching the reference field set). In substitute
    mode the keys become 'vgg-substitute'/... so numbers produced without
    pretrained backbones are label-distinguishable everywhere they land
    (metrics.txt, TensorBoard, eval means) and can never be pasted into a
    table next to published LPIPS values unnoticed.

    Input contract matches the reference exactly (metrics.py:13-27 calls
    the lpips package with normalize=True, i.e. [0, 1] inputs); the
    [-1, 1] scaling the backbones expect happens HERE, not at call sites.

    Reference: metrics.py:13-27 uses the lpips pip package with pretrained
    torchvision backbones. With converted weights (.npz via
    scripts/convert_lpips_weights.py, found at weights/lpips.npz or
    SWITCH_NERF_LPIPS_WEIGHTS) this matches the reference protocol exactly.
    Without them — pretrained backbones are unreachable on offline TPU
    pods — it falls back to the documented substitute: deterministic
    randomly-initialized backbones with uniform calibration
    (lpips_jax.substitute_weights; the LPIPS paper's own 'random init'
    rows justify this as a relative perceptual distance). Set
    SWITCH_NERF_LPIPS_SUBSTITUTE=0 to disable the fallback and get None
    entries instead (strict published-protocol mode).
    """
    from switch_nerf_tpu import lpips_jax as L  # lazy import
    rgbs = np.asarray(rgbs, np.float32) * 2.0 - 1.0
    target_rgbs = np.asarray(target_rgbs, np.float32) * 2.0 - 1.0
    weights_path = _resolve_lpips_weights()
    if weights_path is not None:
        return L.lpips_all(np.asarray(rgbs), np.asarray(target_rgbs),
                           weights_path)
    global _warned_no_lpips
    if os.environ.get("SWITCH_NERF_LPIPS_SUBSTITUTE", "1") == "0":
        if not _warned_no_lpips:
            _warned_no_lpips = True
            import logging
            logging.getLogger(__name__).warning(
                "LPIPS weights not found and the substitute is disabled "
                "(SWITCH_NERF_LPIPS_SUBSTITUTE=0) — eval metrics will OMIT "
                "lpips_vgg/alex/squeeze; PSNR/SSIM are unaffected.")
        return {"vgg": None, "alex": None, "squeeze": None}
    if not _warned_no_lpips:
        _warned_no_lpips = True
        import logging
        logging.getLogger(__name__).warning(
            "LPIPS weights not found (set SWITCH_NERF_LPIPS_WEIGHTS or run "
            "scripts/convert_lpips_weights.py) — using the deterministic "
            "random-init substitute backbones (seed 0). Values are a valid "
            "relative perceptual distance but are NOT comparable to "
            "published LPIPS numbers.")
    nets = {net: L.substitute_weights(net)
            for net in ("vgg", "alex", "squeeze")}
    vals = L.lpips_all_from_nets(np.asarray(rgbs), np.asarray(target_rgbs),
                                 nets)
    return {f"{net}-substitute": v for net, v in vals.items()}
