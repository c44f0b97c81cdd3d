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

namespace {
int complex_qr_core(int n, C* T, C* Z, int want_vecs,
                    int max_sweeps_per_eig);
}

extern "C" int elx_hess_qr(int n, void* Tv, void* Zv, int want_vecs,
                           int max_sweeps_per_eig) {
    return complex_qr_core(n, static_cast<C*>(Tv), static_cast<C*>(Zv),
                           want_vecs, max_sweeps_per_eig);
}

namespace {
int complex_qr_core(int n, C* T, C* Z, int want_vecs,
                    int max_sweeps_per_eig) {
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
            const int c0 = (k > l) ? k - 1 : l;
            // split-complex rotation application: cs is real and the
            // per-element complex multiplies unroll into plain double
            // FMA chains the compiler vectorizes (std::complex
            // operator* blocks SLP vectorization here)
            const double csr = cs;
            const double snr = sn.real(), sni = sn.imag();
            {
                double* r0 = reinterpret_cast<double*>(&t(k, c0));
                double* r1 = reinterpret_cast<double*>(&t(k + 1, c0));
                const int len2 = 2 * (n - c0);
                for (int j = 0; j < len2; j += 2) {
                    const double ar = r0[j], ai = r0[j + 1];
                    const double br = r1[j], bi = r1[j + 1];
                    r0[j] = csr * ar + snr * br - sni * bi;
                    r0[j + 1] = csr * ai + snr * bi + sni * br;
                    // -conj(sn) * a + cs * b
                    r1[j] = csr * br - (snr * ar + sni * ai);
                    r1[j + 1] = csr * bi - (snr * ai - sni * ar);
                }
            }
            const int hi = (k + 3 < m) ? k + 3 : m;
            {
                double* p = reinterpret_cast<double*>(&t(0, k));
                const size_t st = 2 * (size_t)n;
                for (int i = 0; i < hi; ++i, p += st) {
                    const double ar = p[0], ai = p[1];
                    const double br = p[2], bi = p[3];
                    // a*cs + b*conj(sn) ; -a*sn + b*cs
                    p[0] = csr * ar + snr * br + sni * bi;
                    p[1] = csr * ai + snr * bi - sni * br;
                    p[2] = csr * br - (snr * ar - sni * ai);
                    p[3] = csr * bi - (snr * ai + sni * ar);
                }
            }
            if (want_vecs) {
                double* p = reinterpret_cast<double*>(&z(0, k));
                const size_t st = 2 * (size_t)n;
                for (int i = 0; i < n; ++i, p += st) {
                    const double ar = p[0], ai = p[1];
                    const double br = p[2], bi = p[3];
                    p[0] = csr * ar + snr * br + sni * bi;
                    p[1] = csr * ai + snr * bi - sni * br;
                    p[2] = csr * br - (snr * ar - sni * ai);
                    p[3] = csr * bi - (snr * ai + sni * ar);
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

// Swap adjacent eigenvalues T[k,k], T[k+1,k+1] of a complex upper
// triangular T by a unitary similarity (ztrexc's Givens step).
void cswap_adjacent(int n, C* T, C* W, int k) {
    auto t = [&](int i, int j) -> C& { return T[(size_t)i * n + j]; };
    auto wv = [&](int i, int j) -> C& { return W[(size_t)i * n + j]; };
    const C a = t(k, k), b = t(k, k + 1), c = t(k + 1, k + 1);
    const C v0 = b, v1 = c - a;
    const double nrm = std::hypot(std::abs(v0), std::abs(v1));
    if (nrm == 0.0) return;
    const C cs = v0 / nrm, sn = v1 / nrm;
    // G = [[cs, -conj(sn)], [sn, conj(cs)]]; T := G^H T G.
    // Split-complex (see the QR sweep note): plain double chains
    // vectorize; std::complex operator* does not.
    const double csr = cs.real(), csi = cs.imag();
    const double snr = sn.real(), sni = sn.imag();
    {
        double* r0 = reinterpret_cast<double*>(&t(k, 0));
        double* r1 = reinterpret_cast<double*>(&t(k + 1, 0));
        for (int j = 0; j < 2 * n; j += 2) {
            const double xr = r0[j], xi = r0[j + 1];
            const double yr = r1[j], yi = r1[j + 1];
            // conj(cs)*x + conj(sn)*y ; -sn*x + cs*y
            r0[j] = (csr * xr + csi * xi) + (snr * yr + sni * yi);
            r0[j + 1] = (csr * xi - csi * xr) + (snr * yi - sni * yr);
            r1[j] = (csr * yr - csi * yi) - (snr * xr - sni * xi);
            r1[j + 1] = (csr * yi + csi * yr) - (snr * xi + sni * xr);
        }
    }
    auto colrot = [&](double* p, int rows, size_t st) {
        for (int i = 0; i < rows; ++i, p += st) {
            const double xr = p[0], xi = p[1];
            const double yr = p[2], yi = p[3];
            // cs*x + sn*y ; -conj(sn)*x + conj(cs)*y
            p[0] = (csr * xr - csi * xi) + (snr * yr - sni * yi);
            p[1] = (csr * xi + csi * xr) + (snr * yi + sni * yr);
            p[2] = (csr * yr + csi * yi) - (snr * xr + sni * xi);
            p[3] = (csr * yi - csi * yr) - (snr * xi - sni * xr);
        }
    };
    colrot(reinterpret_cast<double*>(&t(0, k)), n, 2 * (size_t)n);
    t(k + 1, k) = 0.0;
    colrot(reinterpret_cast<double*>(&wv(0, k)), n, 2 * (size_t)n);
}

}  // namespace

// Complete complex AED window processing (the zlaqr3 role): Schur-solve
// the w x w Hessenberg window (in Tv, overwritten), test spike entries
// bottom-up, bubble undeflatable eigenvalues to the window top by
// unitary swaps, eliminate the surviving spike with a Householder, and
// re-Hessenberg the kept block — ALL window-local, accumulating the
// combined unitary into Wv. The caller applies Wv to the off-window
// strips as GEMMs and writes gamma into the spike column head.
// Returns the number of deflated rows (trailing), or -1 on failure.
// shifts_out: 2*w doubles; [0,w) real parts, [w,2w) imaginary parts of
// the KEPT window eigenvalues (captured before spike elimination).
extern "C" int elx_complex_aed(int w, void* Tv, void* Wv, double beta_r,
                               double beta_i, double eps, double scale0,
                               double* gamma_out, double* shifts_out) {
    C* T = static_cast<C*>(Tv);
    C* W = static_cast<C*>(Wv);
    auto t = [&](int i, int j) -> C& { return T[(size_t)i * w + j]; };
    auto wv = [&](int i, int j) -> C& { return W[(size_t)i * w + j]; };
    if (complex_qr_core(w, T, W, 1, 40) != 0) return -1;
    const C beta(beta_r, beta_i);
    double scale = scale0;
    for (int i = 0; i < w; ++i) scale = std::max(scale, std::abs(t(i, i)));
    scale = std::max(scale, std::abs(beta));
    // bottom-up deflation tests; undeflatable entries bubble to the top
    int u = 0;
    int k = w - 1;
    while (k >= u) {
        const C s = beta * std::conj(wv(0, k));
        if (std::abs(s) <= eps * std::max(std::abs(t(k, k)), scale)) {
            --k;
        } else {
            for (int j = k - 1; j >= u; --j) cswap_adjacent(w, T, W, j);
            ++u;
        }
    }
    const int d = w - u;
    const int kept = u;
    for (int i = 0; i < kept; ++i) {
        shifts_out[i] = t(i, i).real();
        shifts_out[w + i] = t(i, i).imag();
    }
    gamma_out[0] = 0.0;
    gamma_out[1] = 0.0;
    if (kept > 0) {
        // Householder on the kept spike s[0:kept] -> gamma e1
        static thread_local C v[8192];
        if (kept > 8192) return -1;
        double nrm2 = 0.0;
        for (int i = 0; i < kept; ++i) {
            v[i] = beta * std::conj(wv(0, i));
            nrm2 += std::norm(v[i]);
        }
        const double nrm = std::sqrt(nrm2);
        C gamma = 0.0;
        if (nrm > 0.0) {
            const double a0 = std::abs(v[0]);
            const C sign = a0 > 0.0 ? v[0] / a0 : C(1.0);
            gamma = -sign * nrm;
            v[0] -= gamma;
            double vn2 = 0.0;
            for (int i = 0; i < kept; ++i) vn2 += std::norm(v[i]);
            if (vn2 > 0.0) {
                const double tau = 2.0 / vn2;
                // T := H T (rows 0..kept), T := T H (cols 0..kept)
                for (int j = 0; j < w; ++j) {
                    C s2 = 0.0;
                    for (int i = 0; i < kept; ++i)
                        s2 += std::conj(v[i]) * t(i, j);
                    s2 *= tau;
                    for (int i = 0; i < kept; ++i) t(i, j) -= s2 * v[i];
                }
                for (int i = 0; i < w; ++i) {
                    C s2 = 0.0;
                    for (int j = 0; j < kept; ++j) s2 += t(i, j) * v[j];
                    s2 *= tau;
                    for (int j = 0; j < kept; ++j)
                        t(i, j) -= s2 * std::conj(v[j]);
                }
                for (int i = 0; i < w; ++i) {
                    C s2 = 0.0;
                    for (int j = 0; j < kept; ++j) s2 += wv(i, j) * v[j];
                    s2 *= tau;
                    for (int j = 0; j < kept; ++j)
                        wv(i, j) -= s2 * std::conj(v[j]);
                }
            }
        } else {
            gamma = 0.0;
        }
        gamma_out[0] = gamma.real();
        gamma_out[1] = gamma.imag();
        // re-Hessenberg the kept block (full similarity, window-local)
        for (int col = 0; col + 2 < kept; ++col) {
            double nn = 0.0;
            for (int i = col + 1; i < kept; ++i) nn += std::norm(t(i, col));
            const double cn = std::sqrt(nn);
            if (cn == 0.0) continue;
            const double a0 = std::abs(t(col + 1, col));
            const C sign = a0 > 0.0 ? t(col + 1, col) / a0 : C(1.0);
            const C bet = -sign * cn;
            const int len = kept - (col + 1);
            for (int i = 0; i < len; ++i) v[i] = t(col + 1 + i, col);
            v[0] -= bet;
            double vn2 = 0.0;
            for (int i = 0; i < len; ++i) vn2 += std::norm(v[i]);
            if (vn2 == 0.0) continue;
            const double tau = 2.0 / vn2;
            for (int j = 0; j < w; ++j) {
                C s2 = 0.0;
                for (int i = 0; i < len; ++i)
                    s2 += std::conj(v[i]) * t(col + 1 + i, j);
                s2 *= tau;
                for (int i = 0; i < len; ++i) t(col + 1 + i, j) -= s2 * v[i];
            }
            for (int i = 0; i < w; ++i) {
                C s2 = 0.0;
                for (int j = 0; j < len; ++j) s2 += t(i, col + 1 + j) * v[j];
                s2 *= tau;
                for (int j = 0; j < len; ++j)
                    t(i, col + 1 + j) -= s2 * std::conj(v[j]);
            }
            for (int i = 0; i < w; ++i) {
                C s2 = 0.0;
                for (int j = 0; j < len; ++j) s2 += wv(i, col + 1 + j) * v[j];
                s2 *= tau;
                for (int j = 0; j < len; ++j)
                    wv(i, col + 1 + j) -= s2 * std::conj(v[j]);
            }
            t(col + 1, col) = bet;
            for (int i = col + 2; i < kept; ++i) t(i, col) = 0.0;
        }
    }
    return d;
}
