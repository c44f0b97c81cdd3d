// Small-window complex Hessenberg QR (the serial bottom-level kernel of
// the Schur driver — reference: spectral/HessenbergSchur's sequential
// single-shift path; LAPACK zlahqr's role).
//
// The Python driver (elementalx/lapack/schur.py) keeps the GEMM-rich
// layers — aggressive early deflation and the batched multibulge
// sweeps — in numpy, and calls this kernel for the O(w^3)-scalar window
// eigensolves where per-op interpreter overhead dominates. Row-major
// contiguous complex128, in-place.

#include <cmath>
#include <complex>
#include <cstddef>

namespace {
using C = std::complex<double>;

inline double cabs1(const C& v) { return std::abs(v); }
}  // namespace

extern "C" int elx_hess_qr(int n, void* Tv, void* Zv, int want_vecs,
                           int max_sweeps_per_eig) {
    C* T = static_cast<C*>(Tv);
    C* Z = static_cast<C*>(Zv);
    auto t = [&](int i, int j) -> C& { return T[(size_t)i * n + j]; };
    auto z = [&](int i, int j) -> C& { return Z[(size_t)i * n + j]; };
    if (want_vecs) {
        for (int i = 0; i < n; ++i)
            for (int j = 0; j < n; ++j) z(i, j) = (i == j) ? 1.0 : 0.0;
    }
    const double eps = 2.220446049250313e-16;
    int m = n;
    long its = 0;
    const long budget = (long)max_sweeps_per_eig * (n > 0 ? n : 1);
    while (m > 1 && its < budget) {
        ++its;
        // deflate tiny subdiagonals in the active window
        bool deflated = false;
        for (int k = m - 1; k > 0; --k) {
            if (cabs1(t(k, k - 1)) <=
                eps * (cabs1(t(k, k)) + cabs1(t(k - 1, k - 1)))) {
                t(k, k - 1) = 0.0;
                if (k == m - 1) {
                    --m;
                    deflated = true;
                }
                break;
            }
        }
        if (deflated) continue;
        int l = 0;
        for (int k = m - 1; k > 0; --k)
            if (t(k, k - 1) == C(0.0)) {
                l = k;
                break;
            }
        // Wilkinson shift from the trailing 2x2
        const C a = t(m - 2, m - 2), b = t(m - 2, m - 1);
        const C c = t(m - 1, m - 2), d = t(m - 1, m - 1);
        const C tr = a + d, det = a * d - b * c;
        const C disc = std::sqrt(tr * tr - 4.0 * det);
        const C r1 = (tr + disc) / 2.0, r2 = (tr - disc) / 2.0;
        const C mu = cabs1(r1 - d) < cabs1(r2 - d) ? r1 : r2;
        // implicit single-shift Givens bulge chase on [l, m)
        C x = t(l, l) - mu;
        C y = t(l + 1, l);
        for (int k = l; k < m - 1; ++k) {
            const double ax = cabs1(x), ay = cabs1(y);
            const double r = std::hypot(ax, ay);
            double cs;
            C sn;
            if (r == 0.0) {
                cs = 1.0;
                sn = 0.0;
            } else {
                cs = ax / r;
                const C phase = ax > 0.0 ? x / ax : C(1.0);
                sn = phase * std::conj(y) / r;
            }
            const C snc = std::conj(sn);
            const int c0 = (k > l) ? k - 1 : l;
            for (int j = c0; j < n; ++j) {
                const C tk = t(k, j), tk1 = t(k + 1, j);
                t(k, j) = cs * tk + sn * tk1;
                t(k + 1, j) = -snc * tk + cs * tk1;
            }
            const int hi = (k + 3 < m) ? k + 3 : m;
            for (int i = 0; i < hi; ++i) {
                const C ck = t(i, k), ck1 = t(i, k + 1);
                t(i, k) = cs * ck + snc * ck1;
                t(i, k + 1) = -sn * ck + cs * ck1;
            }
            if (want_vecs) {
                for (int i = 0; i < n; ++i) {
                    const C ck = z(i, k), ck1 = z(i, k + 1);
                    z(i, k) = cs * ck + snc * ck1;
                    z(i, k + 1) = -sn * ck + cs * ck1;
                }
            }
            if (k < m - 2) {
                x = t(k + 1, k);
                y = t(k + 2, k);
            }
        }
    }
    // clean below-diagonal dust
    for (int i = 1; i < n; ++i)
        for (int j = 0; j < i; ++j) t(i, j) = 0.0;
    return (its >= budget && m > 1) ? 1 : 0;
}
