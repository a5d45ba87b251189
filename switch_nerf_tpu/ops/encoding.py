"""Positional / integrated positional / spherical-harmonics encodings.

Pure jnp functions. Behavioral parity targets (reference file:line):
  * freq_encode      — switch_nerf/models/nerf.py:9-26   (Embedding)
  * mip_encode       — switch_nerf/models/nerf.py:28-56  (MipEmbedder)
  * shifted_softplus — switch_nerf/models/nerf.py:58-72  (ShiftedSoftplus)
  * eval_sh          — switch_nerf/spherical_harmonics.py:55-107

These are elementwise/VPU ops; XLA fuses them into the consuming matmul, so
no Pallas kernel is needed here.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

__all__ = ["freq_bands", "freq_encode", "mip_encode", "shifted_softplus", "eval_sh"]


def freq_bands(num_freqs: int, logscale: bool = True, base: float = 2.0):
    """Frequency ladder 2^0..2^(n-1) (logscale) or linspace(1, 2^(n-1))."""
    if num_freqs <= 0:
        return jnp.zeros((0,), dtype=jnp.float32)
    if logscale:
        return base ** jnp.linspace(0.0, num_freqs - 1, num_freqs)
    return jnp.linspace(base ** 0.0, base ** (num_freqs - 1), num_freqs)


def freq_encode(x: jnp.ndarray, num_freqs: int, logscale: bool = True) -> jnp.ndarray:
    """(x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...).

    Matches the reference's concatenation order: identity first, then per
    frequency [sin, cos] pairs (each over all D input channels).

    x: [..., D] -> [..., D * (1 + 2*num_freqs)]
    """
    if num_freqs == 0:
        return x
    d = x.shape[-1]
    bands = freq_bands(num_freqs, logscale).astype(x.dtype)  # [F]
    # ONE flat transcendental: cos(x) == sin(x + pi/2), so build the
    # interleaved [sin_f, cos_f] angle matrix up front and take a single
    # sin over [..., 2*F*D] — full VPU lanes (the naive [.., F, 1, 3]
    # sin/cos pair tiles at 3/128 lane utilisation on TPU)
    phase = jnp.array([0.0, 0.5 * jnp.pi], x.dtype)          # [2]
    angles = (x[..., None, None, :] * bands[:, None, None]
              + phase[:, None])                              # [.., F, 2, D]
    sc = jnp.sin(angles.reshape(*x.shape[:-1], 2 * num_freqs * d))
    # named for the remat policy (saveable via SWITCH_NERF_REMAT_SAVE);
    # a no-op tag outside jax.checkpoint
    return checkpoint_name(jnp.concatenate([x, sc], axis=-1), "pe_out")


def mip_encode(mean_cov: jnp.ndarray, num_freqs: int, logscale: bool = True,
               input_dims: int = 3) -> jnp.ndarray:
    """Integrated positional encoding over (mean, diag-cov) inputs.

    mean_cov: [..., 2*D] = concat(mean[..., :D], var_diag[..., D:]).
    Output: [..., D + 2 * num_freqs * D] following the reference layout
    (identity mean first, then per-frequency [sin, cos] attenuated by
    exp(-0.5 * 4^k * var)).
    """
    d = input_dims
    mean = mean_cov[..., :d]
    var = mean_cov[..., d:2 * d]
    if num_freqs == 0:
        return mean
    # one ladder builder for both bases (fw = fy**2 ladder in base 4)
    fy = freq_bands(num_freqs, logscale).astype(mean.dtype)
    fw = freq_bands(num_freqs, logscale, base=4.0).astype(mean.dtype)
    # single flat transcendental (cos(x) == sin(x + pi/2); see freq_encode)
    phase = jnp.array([0.0, 0.5 * jnp.pi], mean.dtype)
    angles = (mean[..., None, None, :] * fy[:, None, None]
              + phase[:, None])                                # [.., F, 2, D]
    atten = jnp.exp(-0.5 * var[..., None, None, :] * fw[:, None, None])
    flat = (*mean.shape[:-1], 2 * num_freqs * d)
    sc = jnp.sin(angles.reshape(flat)) * \
        jnp.broadcast_to(atten, angles.shape).reshape(flat)
    return checkpoint_name(jnp.concatenate([mean, sc], axis=-1), "pe_out")


def shifted_softplus(x: jnp.ndarray, beta: float = 1.0, threshold: float = 20.0) -> jnp.ndarray:
    """softplus(x - 1): the sigma activation used throughout the reference."""
    y = x - 1.0
    by = beta * y
    soft = jnp.logaddexp(by, 0.0) / beta
    return jnp.where(by > threshold, y, soft)


# --- Spherical harmonics (PlenOctree convention), degrees 0..4 ---
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate spherical harmonics at unit directions (hardcoded, deg 0-4).

    sh: [..., C, (deg+1)**2], dirs: [..., 3] -> [..., C].
    """
    assert 0 <= deg <= 4
    assert sh.shape[-1] == (deg + 1) ** 2

    result = _C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (result - _C1 * y * sh[..., 1] + _C1 * z * sh[..., 2]
                  - _C1 * x * sh[..., 3])
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + _C2[0] * xy * sh[..., 4]
                      + _C2[1] * yz * sh[..., 5]
                      + _C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                      + _C2[3] * xz * sh[..., 7]
                      + _C2[4] * (xx - yy) * sh[..., 8])
            if deg > 2:
                result = (result
                          + _C3[0] * y * (3 * xx - yy) * sh[..., 9]
                          + _C3[1] * xy * z * sh[..., 10]
                          + _C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                          + _C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                          + _C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                          + _C3[5] * z * (xx - yy) * sh[..., 14]
                          + _C3[6] * x * (xx - 3 * yy) * sh[..., 15])
                if deg > 3:
                    result = (result
                              + _C4[0] * xy * (xx - yy) * sh[..., 16]
                              + _C4[1] * yz * (3 * xx - yy) * sh[..., 17]
                              + _C4[2] * xy * (7 * zz - 1) * sh[..., 18]
                              + _C4[3] * yz * (7 * zz - 3) * sh[..., 19]
                              + _C4[4] * (zz * (35 * zz - 30) + 3) * sh[..., 20]
                              + _C4[5] * xz * (7 * zz - 3) * sh[..., 21]
                              + _C4[6] * (xx - yy) * (7 * zz - 1) * sh[..., 22]
                              + _C4[7] * xz * (xx - 3 * yy) * sh[..., 23]
                              + _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)) * sh[..., 24])
    return result
