"""Fused decode+matmul window kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from hydra_tpu.ops.decode import decode_planes, hpack_bytes


def _hp(packed):
    """Kernels consume the H-PACKED device format; decode_planes on the
    original PLINK bytes stays the golden reference."""
    return jnp.asarray(hpack_bytes(np.asarray(packed)))
from hydra_tpu.ops.window_kernels import (
    deinterleave,
    interleave,
    window_axpy,
    window_stats,
)


def _inputs(w=32, n=2048, seed=0):
    rs = np.random.RandomState(seed)
    packed = jnp.asarray(rs.randint(0, 256, (w, n // 4), dtype=np.uint8))
    eps = jnp.asarray(rs.randn(n).astype(np.float32))
    mave = jnp.asarray((rs.rand(w) + 0.5).astype(np.float32))
    mstd = jnp.asarray((rs.rand(w) + 0.5).astype(np.float32))
    return packed, eps, mave, mstd


def test_deinterleave_roundtrip():
    x = jnp.arange(32.0)
    d = deinterleave(x)
    assert d.shape == (4, 8)
    np.testing.assert_array_equal(np.asarray(d[1, :3]), [1.0, 5.0, 9.0])
    np.testing.assert_array_equal(np.asarray(interleave(d)), np.asarray(x))


def test_window_stats_parity():
    packed, eps, mave, mstd = _inputs()
    A, B = decode_planes(packed, jnp.float32)
    s1_ref = np.asarray(A) @ np.asarray(eps)
    s2_ref = np.asarray(B) @ np.asarray(eps)
    xt = np.asarray((A - mave[:, None] * B) * mstd[:, None])
    gram_ref = xt @ xt.T

    s1, s2, gram = window_stats(_hp(packed), deinterleave(eps), mave, mstd,
                                exact=True, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), s1_ref, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(s2), s2_ref, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gram), gram_ref,
                               rtol=3e-3, atol=0.5)

    s1b, s2b, gram_b = window_stats(_hp(packed), deinterleave(eps), mave, mstd,
                                    exact=False, interpret=True)
    np.testing.assert_allclose(np.asarray(s1b), s1_ref, rtol=2e-4)
    assert gram_b is None


def test_window_stats_exact_complete_parity():
    """Integer-Gram fast path (exact + complete data): one bf16 MXU pass
    per plane with a rank-1 standardization correction must match the
    NumPy Gram of the standardized window."""
    rs = np.random.RandomState(7)
    w, n = 32, 2048
    geno = rs.randint(0, 3, (w, n))
    code = np.select([geno == 0, geno == 1, geno == 2],
                     [0b11, 0b10, 0b00]).astype(np.uint8)
    packed = jnp.asarray(
        (code[:, 0::4] | (code[:, 1::4] << 2) | (code[:, 2::4] << 4)
         | (code[:, 3::4] << 6)).astype(np.uint8))
    eps = jnp.asarray(rs.randn(n).astype(np.float32))
    mave = jnp.asarray((rs.rand(w) + 0.5).astype(np.float32))
    mstd = jnp.asarray((rs.rand(w) + 0.5).astype(np.float32))
    A, B = decode_planes(packed, jnp.float32)   # B == 1 (complete)
    s1_ref = np.asarray(A, np.float64) @ np.asarray(eps, np.float64)
    xt = np.asarray((A - mave[:, None] * B) * mstd[:, None], np.float64)
    gram_ref = xt @ xt.T

    s1, s2, gram = window_stats(_hp(packed), deinterleave(eps), mave, mstd,
                                exact=True, complete=True, n_real=float(n),
                                interpret=True)
    assert s2 is None
    np.testing.assert_allclose(np.asarray(s1), s1_ref, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gram), gram_ref,
                               rtol=1e-4, atol=1e-2)


def test_window_axpy_parity():
    packed, eps, mave, mstd = _inputs(seed=3)
    W = packed.shape[0]
    rs = np.random.RandomState(5)
    c1 = jnp.asarray((rs.randn(W) * 0.01).astype(np.float32))
    c2 = jnp.asarray((rs.randn(W) * 0.01).astype(np.float32))
    A, B = decode_planes(packed, jnp.float32)
    ref = np.asarray(c1) @ np.asarray(A) + np.asarray(c2) @ np.asarray(B)
    de = interleave(window_axpy(_hp(packed), c1, c2, interpret=True))
    np.testing.assert_allclose(np.asarray(de), ref, rtol=2e-4, atol=1e-5)


def test_window_level_sums_parity():
    from hydra_tpu.ops.window_kernels import window_level_sums

    packed, eps, mave, mstd = _inputs(seed=9)
    vi = jnp.abs(eps) + 0.1
    A, B = decode_planes(packed, jnp.float32)
    i1 = np.asarray(((A == 1.0) & (B == 1.0)))
    i2 = np.asarray(A == 2.0)
    s1, s2, sb = window_level_sums(_hp(packed), deinterleave(vi),
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(s1), i1 @ np.asarray(vi), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(s2), i2 @ np.asarray(vi), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(sb), np.asarray(B) @ np.asarray(vi),
                               rtol=2e-4)


def test_window_stats_multi_tile():
    packed, eps, mave, mstd = _inputs(w=16, n=4096, seed=7)
    A, B = decode_planes(packed, jnp.float32)
    s1_ref = np.asarray(A) @ np.asarray(eps)
    s1, s2, _ = window_stats(_hp(packed), deinterleave(eps), mave, mstd,
                             exact=False, tile_bytes=256, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), s1_ref, rtol=2e-4)


def test_window_stats_complete_fast_path():
    """complete=True skips the mask plane; s1 must be unchanged and the
    caller-side s2 = sum(eps) must equal the mask dot when no genotype is
    missing (pad lanes of eps zero)."""
    packed, eps, mave, mstd = _inputs(w=16, n=4096, seed=11)
    # rewrite any missing codes (01) to hom-alt (00) to make data complete
    pk = np.asarray(packed)
    out = np.zeros_like(pk)
    for shift in (0, 2, 4, 6):
        code = (pk >> shift) & 0b11
        code = np.where(code == 0b01, 0b00, code)
        out |= code << shift
    packed = jnp.asarray(out)
    A, B = decode_planes(packed, jnp.float32)
    assert float(jnp.min(B)) == 1.0  # complete
    s1_full, s2_full, _ = window_stats(_hp(packed), deinterleave(eps), mave, mstd,
                                       exact=False, interpret=True)
    s1_fast, s2_fast, _ = window_stats(_hp(packed), deinterleave(eps), mave, mstd,
                                       exact=False, interpret=True,
                                       complete=True)
    assert s2_fast is None
    # the fast path reconstructs s1 = 2*sum(eps) - sum(h*eps) (h-decode),
    # so compare both paths against the f64 golden dot instead of each
    # other — accumulation orders differ at f32 rounding level
    s1_gold = np.asarray(A).astype(np.float64) @ np.asarray(eps).astype(np.float64)
    scale = np.maximum(np.abs(s1_gold), 1.0)
    assert np.max(np.abs(np.asarray(s1_fast) - s1_gold) / scale) < 5e-5
    assert np.max(np.abs(np.asarray(s1_full) - s1_gold) / scale) < 5e-5
    np.testing.assert_allclose(float(jnp.sum(eps)) * np.ones(16),
                               np.asarray(s2_full), rtol=1e-5)


def test_window_axpy_complete_fast_path():
    packed, eps, mave, mstd = _inputs(w=16, n=4096, seed=13)
    pk = np.asarray(packed)
    out = np.zeros_like(pk)
    for shift in (0, 2, 4, 6):
        code = (pk >> shift) & 0b11
        code = np.where(code == 0b01, 0b00, code)
        out |= code << shift
    packed = jnp.asarray(out)
    rs = np.random.RandomState(0)
    c1 = jnp.asarray((rs.randn(16) * 0.1).astype(np.float32))
    c2 = jnp.asarray((rs.randn(16) * 0.1).astype(np.float32))
    full = window_axpy(_hp(packed), c1, c2, interpret=True)
    fast = (window_axpy(_hp(packed), c1, c2, interpret=True, complete=True)
            + jnp.sum(c2))  # no pad individuals here: mask is all-ones
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                               rtol=1e-5, atol=1e-6)

def test_deinterleave_mt_roundtrip():
    from hydra_tpu.ops.window_kernels import deinterleave_mt, interleave_mt

    T = 3
    x = jnp.arange(32.0 * T).reshape(32, T)
    d = deinterleave_mt(x)
    assert d.shape == (4 * T, 8)
    # row k*T + t, col b == eps[4b + k, t]
    np.testing.assert_allclose(float(d[1 * T + 2, 3]), float(x[13, 2]))
    np.testing.assert_array_equal(np.asarray(interleave_mt(d, T)),
                                  np.asarray(x))


def test_window_stats_mt_parity():
    from hydra_tpu.ops.window_kernels import deinterleave_mt, window_stats_mt

    T = 3
    packed, _, _, _ = _inputs(w=16, n=2048, seed=21)
    rs = np.random.RandomState(22)
    eps = jnp.asarray(rs.randn(2048, T).astype(np.float32))
    A, B = decode_planes(packed, jnp.float32)
    s1_ref = np.asarray(A) @ np.asarray(eps)    # (W, T)
    s2_ref = np.asarray(B) @ np.asarray(eps)
    s1, s2 = window_stats_mt(_hp(packed), deinterleave_mt(eps), T, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), s1_ref, rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), s2_ref, rtol=2e-4, atol=1e-4)


def test_window_axpy_mt_parity():
    from hydra_tpu.ops.window_kernels import interleave_mt, window_axpy_mt

    T = 3
    W = 16
    packed, _, _, _ = _inputs(w=W, n=2048, seed=31)
    rs = np.random.RandomState(32)
    c1 = jnp.asarray((rs.randn(T, W) * 0.01).astype(np.float32))
    c2 = jnp.asarray((rs.randn(T, W) * 0.01).astype(np.float32))
    A, B = decode_planes(packed, jnp.float32)
    # ref: dEps (N, T) = A^T c1^T + B^T c2^T
    ref = (np.asarray(A).T @ np.asarray(c1).T
           + np.asarray(B).T @ np.asarray(c2).T)
    out = interleave_mt(window_axpy_mt(_hp(packed), c1, c2, interpret=True), T)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=1e-5)


def test_window_stats_mt_multi_tile():
    from hydra_tpu.ops.window_kernels import deinterleave_mt, window_stats_mt

    T = 2
    packed, _, _, _ = _inputs(w=8, n=4096, seed=41)
    rs = np.random.RandomState(42)
    eps = jnp.asarray(rs.randn(4096, T).astype(np.float32))
    A, B = decode_planes(packed, jnp.float32)
    s1, s2 = window_stats_mt(_hp(packed), deinterleave_mt(eps), T,
                             tile_bytes=256, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(A) @ np.asarray(eps),
                               rtol=2e-4, atol=1e-4)


def _make_complete(packed):
    """Rewrite missing codes (01) to hom-alt (00)."""
    pk = np.asarray(packed)
    out = np.zeros_like(pk)
    for shift in (0, 2, 4, 6):
        code = (pk >> shift) & 0b11
        code = np.where(code == 0b01, 0b00, code)
        out |= code << shift
    return jnp.asarray(out)


def test_window_stats_mt_complete_fast_path():
    from hydra_tpu.ops.window_kernels import deinterleave_mt, window_stats_mt

    T = 3
    packed, _, _, _ = _inputs(w=16, n=4096, seed=51)
    packed = _make_complete(packed)
    rs = np.random.RandomState(52)
    eps = jnp.asarray(rs.randn(4096, T).astype(np.float32))
    s1_full, s2_full = window_stats_mt(_hp(packed), deinterleave_mt(eps), T,
                                       interpret=True)
    s1_fast, s2_fast = window_stats_mt(_hp(packed), deinterleave_mt(eps), T,
                                       interpret=True, complete=True)
    assert s2_fast is None
    # h-decode changes the f32 accumulation order — compare both paths to
    # the f64 golden dot instead of each other
    A, _ = decode_planes(packed, jnp.float32)
    gold = (np.asarray(A).astype(np.float64)
            @ np.asarray(eps).astype(np.float64))
    scale = np.maximum(np.abs(gold), 1.0)
    assert np.max(np.abs(np.asarray(s1_fast) - gold) / scale) < 5e-5
    assert np.max(np.abs(np.asarray(s1_full) - gold) / scale) < 5e-5
    # caller-side s2: per-trait residual sum broadcasts over markers
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(jnp.sum(eps, axis=0))[None, :], (16, T)),
        np.asarray(s2_full), rtol=1e-4, atol=1e-3)


def test_window_axpy_mt_complete_fast_path():
    from hydra_tpu.ops.window_kernels import window_axpy_mt

    T = 3
    W = 16
    packed, _, _, _ = _inputs(w=W, n=4096, seed=61)
    packed = _make_complete(packed)
    rs = np.random.RandomState(62)
    c1 = jnp.asarray((rs.randn(T, W) * 0.01).astype(np.float32))
    c2 = jnp.asarray((rs.randn(T, W) * 0.01).astype(np.float32))
    full = window_axpy_mt(_hp(packed), c1, c2, interpret=True)
    fast = (window_axpy_mt(_hp(packed), c1, c2, interpret=True, complete=True)
            + jnp.tile(jnp.sum(c2, axis=1), 4)[:, None])
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                               rtol=1e-5, atol=1e-6)
