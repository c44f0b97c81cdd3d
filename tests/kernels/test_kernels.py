"""Pallas kernel tests: jnp fallbacks on CPU + kernel bodies in
interpreter mode (pallas_guide: Debugging / force_tpu_interpret_mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from elementalx.kernels import (
    axpy,
    fill,
    hadamard,
    masked_rank_k,
    matmul,
    scale,
    transpose,
)
from elementalx.kernels.matmul import matmul_pallas


def test_fallback_paths(rng):
    x = jnp.asarray(rng.standard_normal((13, 17)))
    y = jnp.asarray(rng.standard_normal((13, 17)))
    np.testing.assert_allclose(np.asarray(axpy(2.0, x, y)),
                               2 * np.asarray(x) + np.asarray(y))
    np.testing.assert_allclose(np.asarray(scale(-1.5, x)),
                               -1.5 * np.asarray(x))
    np.testing.assert_allclose(np.asarray(hadamard(x, y)),
                               np.asarray(x) * np.asarray(y))
    np.testing.assert_allclose(np.asarray(transpose(x)), np.asarray(x).T)
    np.testing.assert_allclose(np.asarray(fill((5, 7), 2.5, jnp.float64)),
                               2.5)
    a = jnp.asarray(rng.standard_normal((12, 8)))
    b = jnp.asarray(rng.standard_normal((8, 12)))
    np.testing.assert_allclose(np.asarray(matmul(a, b)),
                               np.asarray(a) @ np.asarray(b), atol=1e-12)
    c = jnp.asarray(rng.standard_normal((12, 12)))
    out = np.asarray(masked_rank_k(True, -1.0, a, b, 1.0, c))
    ref = np.tril(np.asarray(c) - np.asarray(a) @ np.asarray(b)) + \
        np.triu(np.asarray(c), 1)
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_matmul_pallas_interpret(rng):
    """Run the actual kernel body through the Pallas interpreter."""
    from jax.experimental.pallas import tpu as pltpu

    a = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        c = matmul_pallas(a, b, bm=128, bn=128, bk=64)
    np.testing.assert_allclose(np.asarray(c),
                               np.asarray(a) @ np.asarray(b), atol=1e-4)


def test_matmul_pallas_rejects_ragged():
    a = jnp.ones((100, 128), jnp.float32)
    b = jnp.ones((128, 128), jnp.float32)
    with pytest.raises(ValueError):
        matmul_pallas(a, b, bm=128, bn=128, bk=128)


def test_f64_emulated_matmul(rng):
    """Ozaki-split f64 emulation (BASELINE 'f64-emulation correctness
    mode'): f64-grade accuracy from exact bf16 MXU products."""
    from elementalx.kernels.ozaki import matmul_f64_emulated

    for n in (64, 160):
        a = rng.standard_normal((n, n))
        b = rng.standard_normal((n, n))
        c = matmul_f64_emulated(a, b)
        ref = a @ b
        rel = np.max(np.abs(c - ref)) / np.max(np.abs(ref))
        assert rel < 1e-12, f"n={n}: {rel}"
        f32rel = np.max(np.abs(
            (a.astype(np.float32) @ b.astype(np.float32)).astype(np.float64)
            - ref)) / np.max(np.abs(ref))
        assert rel < 1e-4 * f32rel  # orders beyond plain f32

    # wide dynamic range
    a = rng.standard_normal((96, 128)) * np.logspace(-8, 8, 128)[None, :]
    b = rng.standard_normal((128, 64))
    c = matmul_f64_emulated(a, b)
    ref = a @ b
    assert np.max(np.abs(c - ref)) / np.max(np.abs(ref)) < 1e-12


def test_ring_summa_interpret(grid, rng):
    """Device-initiated ring SUMMA (the NVSHMEM-GEMM analogue) in the
    Pallas interpreter over the 8-device virtual mesh."""
    from elementalx import DistMatrix
    from elementalx.kernels.ring_summa import ring_summa

    m, k, n = 32, 24, 16
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    A = DistMatrix.from_global(a, grid=grid)
    B = DistMatrix.from_global(b, grid=grid)
    C = ring_summa(A, B, interpret=True)
    ref = a @ b
    assert np.linalg.norm(C.global_array() - ref) / np.linalg.norm(ref) < 1e-5


def test_refined_solve_f64_grade(grid, rng):
    """Mixed-precision iterative refinement: f32 factors + Ozaki
    residuals deliver f64-grade solutions (SURVEY hard-part #1)."""
    from elementalx import DistMatrix
    from elementalx.lapack.refine import RefinedHPDSolve, RefinedLinearSolve
    from elementalx.core.types import LOWER

    n = 96
    a32 = rng.standard_normal((n, n)).astype(np.float32)
    b = rng.standard_normal(n)
    A = DistMatrix.from_global(a32, grid=grid)
    x, resid = RefinedLinearSolve(A, b)
    # compare against the f64 solve of the f32-rounded matrix
    ref = np.linalg.solve(a32.astype(np.float64), b)
    assert np.linalg.norm(x - ref) / np.linalg.norm(ref) < 1e-12
    assert resid < 10.0  # scaled f64 residual bound (reference style)
    # plain f32 solve for contrast: orders of magnitude worse
    from elementalx.lapack.lu import LinearSolve

    x32 = LinearSolve(A, DistMatrix.from_global(
        b[:, None].astype(np.float32), grid=grid)).global_array()[:, 0]
    assert np.linalg.norm(x - ref) < 1e-4 * np.linalg.norm(x32 - ref)

    spd32 = (a32 @ a32.T / n + n * np.eye(n)).astype(np.float32)
    S = DistMatrix.from_global(spd32, grid=grid)
    xh, residh = RefinedHPDSolve(LOWER, S, b)
    refh = np.linalg.solve(spd32.astype(np.float64), b)
    assert np.linalg.norm(xh - refh) / np.linalg.norm(refh) < 1e-12
    assert residh < 10.0


def test_symv_lower_interpret(rng):
    """Lower-triangle symv kernel == full Hermitian matvec (Pallas
    interpreter; the non-TPU symv_lower entrypoint falls back to a
    plain matvec, so drive the kernel internals directly)."""
    from jax.experimental.pallas import tpu as pltpu

    from elementalx.kernels.symv import _symv_lower_tpu

    M, bs = 1024, 256
    x = rng.standard_normal((M, M)).astype(np.float32)
    herm = np.tril(x) + np.tril(x, -1).T
    v = rng.standard_normal(M).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = _symv_lower_tpu(jnp.asarray(x), jnp.asarray(v), bs)
    np.testing.assert_allclose(np.asarray(got), herm @ v, rtol=2e-5,
                               atol=1e-3)


def test_symv_lower_trailing_junk_columns(rng, monkeypatch):
    """Trailing-slice variant: rounded-down origin brings in finished
    (junk) columns — their zero v entries must annihilate every
    contribution."""
    from jax.experimental.pallas import tpu as pltpu

    import elementalx.kernels.symv as sv

    monkeypatch.setattr(sv, "on_tpu", lambda: True)
    M, bs, k0 = 1024, 256, 384
    x = rng.standard_normal((M, M)).astype(np.float32)
    herm = np.tril(x) + np.tril(x, -1).T
    junk = x.copy()
    junk[:, :k0] = 99.0
    v = rng.standard_normal(M - k0).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = sv.symv_lower_trailing(jnp.asarray(junk), jnp.asarray(v), k0,
                                     bs)
    np.testing.assert_allclose(np.asarray(got), herm[k0:, k0:] @ v,
                               rtol=2e-5, atol=1e-3)


def test_refined_hermitian_eig(grid, rng):
    """Eigenpair refinement to ~f64 grade from the f32 working-precision
    decomposition (VERDICT r1 item 9; BASELINE 'matching residuals')."""
    from elementalx.lapack.refine import RefinedHermitianEig
    from elementalx import DistMatrix
    from elementalx.core.types import LOWER
    import jax.numpy as jnp

    n = 96
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    w, V, resid = RefinedHermitianEig(LOWER, A, iters=3)
    a64 = np.asarray(a, np.float64)
    wref = np.linalg.eigvalsh(a64)
    assert np.abs(w - wref).max() < 1e-10 * max(1, np.abs(wref).max())
    r = np.abs(a64 @ V - V * w[None, :]).max()
    scaled = r / (np.finfo(np.float64).eps * n * np.abs(wref).max())
    assert scaled < 100, f"scaled residual {scaled}"
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-12


def test_refined_hermitian_eig_clustered(grid, rng):
    """Clustered spectrum: the preconditioner suppresses intra-cluster
    corrections; the final extended-precision Gram pass must still give
    orthogonal vectors and f64-grade residuals."""
    from elementalx.lapack.refine import RefinedHermitianEig
    from elementalx import DistMatrix
    from elementalx.core.types import LOWER
    import jax.numpy as jnp

    n = 64
    d = np.concatenate([np.full(8, 1.0), np.full(8, 1.0 + 3e-7),
                        np.linspace(2, 10, n - 16)])
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    a = (q * d[None, :]) @ q.T
    a = ((a + a.T) / 2).astype(np.float32)
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    w, V, resid = RefinedHermitianEig(LOWER, A, iters=3)
    a64 = np.asarray(a, np.float64)
    r = np.abs(a64 @ V - V * w[None, :]).max()
    scaled = r / (np.finfo(np.float64).eps * n * np.abs(w).max())
    assert scaled < 100, f"scaled residual {scaled}"
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-11


def test_extended_precision_sum_dot():
    """Double-word accumulation (kernels/extended.py — the BigFloat/Quad
    accumulation role): f32 inputs summed/dotted at ~f64 grade."""
    import numpy as np
    from elementalx.kernels.extended import (dot_extended, norm2_extended,
                                             sum_extended, two_prod,
                                             two_sum)

    rng = np.random.default_rng(0)
    # error-free transforms are exact
    a = jnp.asarray(1e8, jnp.float32)
    b = jnp.asarray(1.25e-3, jnp.float32)
    s, e = two_sum(a, b)
    assert float(jnp.asarray(s, jnp.float64) + jnp.asarray(e, jnp.float64)
                 ) == float(a) + float(b)
    p, pe = two_prod(a, b)
    assert np.isclose(float(p) + float(pe), float(a) * float(b), rtol=0)

    # ill-conditioned sum: plain f32 loses everything, dd recovers
    n = 4096
    x = rng.standard_normal(n).astype(np.float32) * 1e6
    x = np.concatenate([x, -x, np.asarray([1.0], np.float32)])
    ref = np.sum(x.astype(np.float64))
    hi, lo = sum_extended(jnp.asarray(x))
    got = float(np.float64(hi) + np.float64(lo))
    assert abs(got - ref) <= 1e-3 * max(abs(ref), 1.0)

    # dot at ~f64 grade
    u = rng.standard_normal(n).astype(np.float32)
    v = rng.standard_normal(n).astype(np.float32)
    ref = np.dot(u.astype(np.float64), v.astype(np.float64))
    hi, lo = dot_extended(jnp.asarray(u), jnp.asarray(v))
    got = float(np.float64(hi) + np.float64(lo))
    assert abs(got - ref) <= 1e-4 * abs(ref) + 1e-6
    plain = float(jnp.dot(jnp.asarray(u), jnp.asarray(v)))
    assert abs(got - ref) <= abs(plain - ref) + 1e-6

    nrm = float(norm2_extended(jnp.asarray(u)))
    assert np.isclose(nrm, np.linalg.norm(u.astype(np.float64)), rtol=1e-6)


def test_extended_precision_matmul():
    """Double-word matmul (the Quad-GEMM role): f64 inputs with exact
    integer products beyond the f64 mantissa reproduce the exact
    integer result; f32-dd beats plain f32 on random data."""
    import numpy as np
    from elementalx.kernels.extended import matmul_extended

    rng = np.random.default_rng(3)
    # integer entries ~2^28: products ~2^56 exceed f64's 53-bit mantissa
    # entrywise, but the exact integer result is dd-representable
    n = 24
    ai = rng.integers(-(1 << 28), 1 << 28, size=(n, n))
    bi = rng.integers(-(1 << 28), 1 << 28, size=(n, n))
    exact = ai.astype(object) @ bi.astype(object)
    hi, lo = matmul_extended(jnp.asarray(ai, jnp.float64),
                             jnp.asarray(bi, jnp.float64))
    hi = np.asarray(hi)
    lo = np.asarray(lo)
    err = np.empty((n, n), np.float64)
    for i in range(n):
        for j in range(n):
            err[i, j] = float(
                (int(hi[i, j]) + int(lo[i, j])) - exact[i, j]
            ) / max(1.0, abs(float(exact[i, j])))
    assert np.max(np.abs(err)) < 1e-25  # far beyond f64's 1e-16

    # f32-dd vs f64 oracle on random data
    m, k, p = 17, 300, 9
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, p)).astype(np.float32)
    ref = a.astype(np.float64) @ b.astype(np.float64)
    hi, lo = matmul_extended(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    plain = np.asarray(jnp.asarray(a) @ jnp.asarray(b), np.float64)
    assert np.linalg.norm(got - ref) <= 0.05 * np.linalg.norm(plain - ref)


def test_refined_svd(grid, rng):
    """Singular-triplet refinement to ~f64 grade from the f32 SVD via the
    implicit Jordan-Wielandt sweep (VERDICT r3 item 3)."""
    from elementalx.lapack.refine import RefinedSVD
    from elementalx import DistMatrix
    import jax.numpy as jnp

    m, n = 80, 48
    a = rng.standard_normal((m, n)).astype(np.float32)
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    U, s, V, resid = RefinedSVD(A, iters=3)
    a64 = np.asarray(a, np.float64)
    sref = np.linalg.svd(a64, compute_uv=False)
    assert np.abs(s - sref).max() < 1e-10 * sref[0]
    r = np.abs(a64 @ V - U * s[None, :]).max()
    scaled = r / (np.finfo(np.float64).eps * m * sref[0])
    assert scaled < 100, f"scaled residual {scaled}"
    assert np.abs(U.T @ U - np.eye(n)).max() < 1e-12
    assert np.abs(V.T @ V - np.eye(n)).max() < 1e-12


def test_hermitian_eig_ctrl_refine(grid, rng):
    """HermitianEigCtrl(refine=True) dispatch returns f64-grade (w, Q)
    through the public driver."""
    from elementalx import DistMatrix
    from elementalx.lapack.hermitian_eig import (HermitianEig,
                                                 HermitianEigCtrl)
    from elementalx.core.types import LOWER
    import jax.numpy as jnp

    n = 64
    a = rng.standard_normal((n, n)).astype(np.float32)
    a = (a + a.T) / 2
    A = DistMatrix.from_global(jnp.asarray(a), grid=grid)
    w, Q = HermitianEig(LOWER, A, vectors=True,
                        ctrl=HermitianEigCtrl(refine=True))
    a64 = np.asarray(a, np.float64)
    wref = np.linalg.eigvalsh(a64)
    w = np.asarray(w)
    assert np.abs(w - wref).max() < 1e-10 * max(1, np.abs(wref).max())
    V = np.asarray(Q.global_array())[:n, :n]
    r = np.abs(a64 @ V - V * w[None, :]).max()
    scaled = r / (np.finfo(np.float64).eps * n * np.abs(wref).max())
    assert scaled < 100, f"scaled residual {scaled}"


def test_pallas_getrf_interpret(rng):
    """Fused pivoted-panel LU kernel (kernels/getrf.py) in interpreter
    mode: LAPACK-packed factor must reproduce P A = L U with partial
    pivoting (|L| <= 1)."""
    from elementalx.kernels.getrf import pallas_getrf

    Mt, w = 384, 256   # two mid-blocks: exercises the 128-level update
    a = rng.standard_normal((Mt, w)).astype(np.float32)
    packed, lperm = jax.jit(
        lambda x: pallas_getrf(x, interpret=True))(jnp.asarray(a))
    packed = np.asarray(packed, np.float64)
    lperm = np.asarray(lperm)
    assert sorted(lperm.tolist()) == list(range(Mt))
    ell = np.tril(packed[:, :w], -1) + np.eye(Mt, w)
    ell = np.vstack([ell[:w], packed[w:, :]])
    ell[w:, :] = packed[w:, :]
    u = np.triu(packed[:w, :])
    pa = a[lperm, :].astype(np.float64)
    err = np.abs(pa - ell @ u).max() / max(np.abs(a).max(), 1)
    assert err < 1e-4, f"P A != L U: {err}"
    assert np.abs(np.tril(packed[:, :w], -1)).max() <= 1 + 1e-6


def test_pallas_potrf_panel_interpret(rng):
    """Fused Cholesky panel-tail kernel (kernels/potrf.py) in
    interpreter mode: [L11; L21] must reproduce the leading panel of
    the numpy Cholesky factor, with L11 exactly lower-triangular."""
    from elementalx.kernels.potrf import potrf_panel_tail

    Mt, w = 768, 256   # two mid-blocks + streamed trailing tiles
    A = rng.standard_normal((Mt, Mt)).astype(np.float32)
    S = (A @ A.T / Mt + np.eye(Mt)).astype(np.float32)
    pan = np.array(S[:, :w])
    # garbage above the diagonal of the A11 block (the left-looking
    # driver never maintains it; the kernel must consume only sym_a11)
    pan[:w] += np.triu(rng.standard_normal((w, w)), 1).astype(np.float32)
    sym = np.tril(S[:w, :w]) + np.tril(S[:w, :w], -1).T
    out = np.asarray(potrf_panel_tail(jnp.asarray(sym), jnp.asarray(pan),
                                      interpret=True))
    ref = np.linalg.cholesky(S.astype(np.float64))[:, :w]
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-5, f"panel tail mismatch: {err}"
    assert np.abs(np.triu(out[:w], 1)).max() == 0.0
    # bf16-operand streaming mode stays bf16-grade accurate
    out_lo = np.asarray(potrf_panel_tail(jnp.asarray(sym),
                                         jnp.asarray(pan),
                                         interpret=True, low_apply=True))
    err_lo = np.abs(out_lo - ref).max() / np.abs(ref).max()
    assert err_lo < 5e-2, f"low_apply mismatch: {err_lo}"


def test_ozaki_lean_matches_full(rng):
    """The memory-lean j-major Ozaki core must match the two-stack
    (i+j)-ordered core to ~2^-48 relative."""
    import jax.numpy as jnp
    from elementalx.kernels.ozaki import _emulated_core, _emulated_core_lean

    m, k, n = 48, 40, 32
    a = rng.standard_normal((m, k))
    b = rng.standard_normal((k, n))
    ah = a.astype(np.float32)
    al = (a - ah.astype(np.float64)).astype(np.float32)
    bh = b.astype(np.float32)
    bl = (b - bh.astype(np.float64)).astype(np.float32)
    rh, rl = _emulated_core(jnp.asarray(ah), jnp.asarray(al),
                            jnp.asarray(bh), jnp.asarray(bl))
    lh, ll = _emulated_core_lean(jnp.asarray(ah), jnp.asarray(al),
                                 jnp.asarray(bh), jnp.asarray(bl))
    ref = a @ b
    full = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
    lean = np.asarray(lh, np.float64) + np.asarray(ll, np.float64)
    scale = np.abs(ref).max()
    assert np.abs(lean - ref).max() / scale < 1e-13
    assert np.abs(lean - full).max() / scale < 1e-13


def test_pallas_potrf_block_inv_interpret(rng):
    """Diagonal-only fused tail (potrf_block_inv): l11 matches numpy
    Cholesky, invLH is inv(l11)^T, and a non-HPD block poisons NaN."""
    from elementalx.kernels.potrf import potrf_block_inv

    w = 256
    A = rng.standard_normal((w, w)).astype(np.float32)
    S = (A @ A.T / w + np.eye(w)).astype(np.float32)
    l11, invLH = (np.asarray(x) for x in
                  potrf_block_inv(jnp.asarray(S), interpret=True))
    ref = np.linalg.cholesky(S.astype(np.float64))
    err = np.abs(l11 - ref).max() / np.abs(ref).max()
    assert err < 1e-5, f"l11 mismatch: {err}"
    assert np.abs(np.triu(l11, 1)).max() == 0.0
    # direct contract: l11 @ invLH^T ~ I  (invLH = inv(l11)^T)
    eye_err = np.abs(l11.astype(np.float64) @ invLH.astype(np.float64).T
                     - np.eye(w)).max()
    assert eye_err < 1e-4, f"invLH contract: {eye_err}"
    bad = -S
    l11b, invb = (np.asarray(x) for x in
                  potrf_block_inv(jnp.asarray(bad), interpret=True))
    assert np.isnan(invb).any()
