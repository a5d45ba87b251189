import jax.numpy as jnp
import numpy as np
import pytest

from switch_nerf_tpu.ops import freq_encode, mip_encode, shifted_softplus, eval_sh


def ref_freq_encode(x, num_freqs, logscale=True):
    """Literal re-derivation of reference Embedding (nerf.py:9-26) in numpy."""
    if logscale:
        bands = 2.0 ** np.linspace(0, num_freqs - 1, num_freqs)
    else:
        bands = np.linspace(1, 2 ** (num_freqs - 1), num_freqs)
    out = [x]
    for f in bands:
        out += [np.sin(f * x), np.cos(f * x)]
    return np.concatenate(out, -1)


def test_freq_encode_matches_reference_order():
    rng = np.random.RandomState(0)
    x = rng.randn(17, 3).astype(np.float32)
    for nf in [1, 4, 12]:
        got = np.asarray(freq_encode(jnp.asarray(x), nf))
        want = ref_freq_encode(x, nf)
        assert got.shape == (17, 3 * (1 + 2 * nf))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_freq_encode_zero_freqs_identity():
    x = jnp.ones((4, 3))
    assert freq_encode(x, 0).shape == (4, 3)


def ref_mip_encode(mc, num_freqs, d=3):
    fy = 2.0 ** np.linspace(0, num_freqs - 1, num_freqs)
    fw = 4.0 ** np.linspace(0, num_freqs - 1, num_freqs)
    out = [mc[:, :d]]
    for i in range(num_freqs):
        for fn in [np.sin, np.cos]:
            out.append(fn(mc[:, :d] * fy[i]) * np.exp(-0.5 * fw[i] * mc[:, d:2 * d]))
    return np.concatenate(out, -1)


def test_mip_encode_matches_reference():
    rng = np.random.RandomState(1)
    mean = rng.randn(11, 3).astype(np.float32)
    var = np.abs(rng.randn(11, 3)).astype(np.float32) * 0.1
    mc = np.concatenate([mean, var], -1)
    got = np.asarray(mip_encode(jnp.asarray(mc), 10))
    want = ref_mip_encode(mc, 10)
    assert got.shape == (11, 3 + 2 * 10 * 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_shifted_softplus():
    x = jnp.array([-5.0, 0.0, 1.0, 5.0, 30.0])
    got = np.asarray(shifted_softplus(x))
    want = np.log1p(np.exp(np.minimum(np.asarray(x) - 1.0, 20.0)))
    want = np.where(np.asarray(x) - 1.0 > 20.0, np.asarray(x) - 1.0, want)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_eval_sh_deg0_is_constant():
    sh = jnp.ones((5, 3, 1))
    dirs = jnp.array(np.random.RandomState(2).randn(5, 3), dtype=jnp.float32)
    out = eval_sh(0, sh, dirs)
    np.testing.assert_allclose(np.asarray(out), 0.28209479177387814, rtol=1e-6)


@pytest.mark.parametrize("deg", [1, 2, 3, 4])
def test_eval_sh_shapes(deg):
    n = 7
    sh = jnp.asarray(np.random.RandomState(3).randn(n, 3, (deg + 1) ** 2).astype(np.float32))
    dirs = np.random.RandomState(4).randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = eval_sh(deg, sh, jnp.asarray(dirs))
    assert out.shape == (n, 3)
    assert np.isfinite(np.asarray(out)).all()
