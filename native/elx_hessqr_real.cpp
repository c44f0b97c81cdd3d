// Small-window REAL Hessenberg QR with Francis double-shift bulge
// chasing, producing the real quasi-triangular Schur form (1x1/2x2
// diagonal blocks) — the serial bottom-level kernel of the real Schur
// driver (reference: spectral/HessenbergSchur/ real path; the role
// LAPACK's dlahqr plays for the reference's lapack imports,
// src/core/imports/lapack.cpp Schur shims).
//
// Row-major contiguous float64, in-place on T (and Z when want_vecs).
// 2x2 blocks left on the diagonal are standardized: either split into
// two 1x1s (real eigenvalues) or rotated to the standard form
// [[p, b],[c, p]] with b*c < 0 (complex pair p +/- sqrt(-b*c) i).

#include <cmath>
#include <cstddef>

namespace {

// Standardize a 2x2 block [[a,b],[c,d]] by a rotation G = [[cs,-sn],
// [sn,cs]]: A' = G^T A G. Real eigenvalues -> upper triangular
// (c'=0); complex pair -> equal diagonal, b'*c' < 0. Outputs the
// rotation and the (possibly complex) eigenvalues. Derived from the
// 2x2 eigenproblem directly (see file header).
void standardize2x2(double& a, double& b, double& c, double& d,
                    double& cs, double& sn,
                    double& w1r, double& w1i, double& w2r, double& w2i) {
    if (c == 0.0) {
        cs = 1.0; sn = 0.0;
    } else {
        const double tr = a + d;
        const double disc = 0.25 * (a - d) * (a - d) + b * c;
        if (disc >= 0.0) {
            // real eigenvalues: rotate eigvec of lam1 into e1
            const double rt = std::sqrt(disc);
            const double lam1 = 0.5 * tr + (tr >= 0 ? rt : -rt);
            // eigenvector (b, lam1 - a) or (lam1 - d, c): pick the
            // better-conditioned representation
            double v0, v1;
            if (std::abs(b) + std::abs(lam1 - a) >
                std::abs(lam1 - d) + std::abs(c)) {
                v0 = b; v1 = lam1 - a;
            } else {
                v0 = lam1 - d; v1 = c;
            }
            const double nrm = std::hypot(v0, v1);
            if (nrm == 0.0) { cs = 1.0; sn = 0.0; }
            else { cs = v0 / nrm; sn = v1 / nrm; }
        } else {
            // complex pair: choose 2*theta with
            // (a-d)*cos(2t) + (b+c)*sin(2t) = 0 so a' == d'
            const double th = 0.5 * std::atan2(d - a, b + c);
            cs = std::cos(th); sn = std::sin(th);
        }
    }
    // apply the similarity to the block
    const double na = cs * (cs * a + sn * c) + sn * (cs * b + sn * d);
    const double nb = cs * (cs * b + sn * d) - sn * (cs * a + sn * c);
    const double nc = cs * (-sn * a + cs * c) + sn * (-sn * b + cs * d);
    const double nd = cs * (-sn * b + cs * d) - sn * (-sn * a + cs * c);
    a = na; b = nb; c = nc; d = nd;
    if (std::abs(c) < 1e-300 ||
        0.25 * (a - d) * (a - d) + b * c >= 0.0) {
        // real eigenvalues: force exact triangularity. The rotation
        // above zeroed c up to roundoff when disc >= 0.
        c = 0.0;
        w1r = a; w1i = 0.0; w2r = d; w2i = 0.0;
    } else {
        // complex pair: pin both diagonals to the mean EXACTLY (the
        // rotation equalizes them only to roundoff; dlanv2's standard
        // form has a == d exactly and CheckRealSchur verifies that)
        const double mean = 0.5 * (a + d);
        a = d = mean;
        const double q = std::sqrt(-b * c);
        w1r = a; w1i = q; w2r = a; w2i = -q;
    }
}

struct House3 {
    double v0, v1, v2, tau;
    int len;
};

House3 reflector(double x0, double x1, double x2, int len) {
    House3 h{0.0, 0.0, 0.0, 0.0, len};
    const double nrm = (len == 3) ? std::sqrt(x0 * x0 + x1 * x1 + x2 * x2)
                                  : std::hypot(x0, x1);
    if (nrm == 0.0) return h;
    const double beta = (x0 >= 0.0) ? -nrm : nrm;
    h.v0 = x0 - beta; h.v1 = x1; h.v2 = (len == 3) ? x2 : 0.0;
    const double vn2 = h.v0 * h.v0 + h.v1 * h.v1 + h.v2 * h.v2;
    if (vn2 == 0.0) return h;
    h.tau = 2.0 / vn2;
    return h;
}

int real_qr_core(int n, double* T, double* Z, int want_vecs,
                 int max_sweeps_per_eig);

}  // namespace

extern "C" int elx_hess_qr_real(int n, double* T, double* Z, int want_vecs,
                                int max_sweeps_per_eig) {
    return real_qr_core(n, T, Z, want_vecs, max_sweeps_per_eig);
}

namespace {

int real_qr_core(int n, double* T, double* Z, int want_vecs,
                 int max_sweeps_per_eig) {
    auto t = [&](int i, int j) -> double& { return T[(size_t)i * n + j]; };
    auto z = [&](int i, int j) -> double& { return Z[(size_t)i * n + j]; };
    if (want_vecs) {
        for (int i = 0; i < n; ++i)
            for (int j = 0; j < n; ++j) z(i, j) = (i == j) ? 1.0 : 0.0;
    }
    const double eps = 2.220446049250313e-16;
    int m = n;
    long its = 0, window_its = 0;
    const long budget = (long)max_sweeps_per_eig * (n > 0 ? n : 1);
    while (m > 0 && its < budget) {
        if (m == 1) { m = 0; break; }
        ++its;
        // deflate tiny subdiagonals in [0, m)
        bool deflated = false;
        for (int k = m - 1; k > 0; --k) {
            if (std::abs(t(k, k - 1)) <=
                eps * (std::abs(t(k, k)) + std::abs(t(k - 1, k - 1)))) {
                t(k, k - 1) = 0.0;
                if (k == m - 1) { --m; deflated = true; window_its = 0; }
                break;
            }
        }
        if (deflated) continue;
        if (m == 1) { m = 0; break; }
        int l = 0;
        for (int k = m - 1; k > 0; --k)
            if (t(k, k - 1) == 0.0) { l = k; break; }
        if (m - l == 1) { m -= 1; window_its = 0; continue; }
        if (m - l == 2) {
            // standardize the trailing 2x2 and deflate it
            double cs, sn, w1r, w1i, w2r, w2i;
            double a = t(l, l), b = t(l, l + 1);
            double c = t(l + 1, l), d = t(l + 1, l + 1);
            standardize2x2(a, b, c, d, cs, sn, w1r, w1i, w2r, w2i);
            t(l, l) = a; t(l, l + 1) = b; t(l + 1, l) = c; t(l + 1, l + 1) = d;
            // rotate the off-block strips and Z
            for (int j = l + 2; j < n; ++j) {
                const double x = t(l, j), y = t(l + 1, j);
                t(l, j) = cs * x + sn * y;
                t(l + 1, j) = -sn * x + cs * y;
            }
            for (int i = 0; i < l; ++i) {
                const double x = t(i, l), y = t(i, l + 1);
                t(i, l) = cs * x + sn * y;
                t(i, l + 1) = -sn * x + cs * y;
            }
            if (want_vecs) {
                for (int i = 0; i < n; ++i) {
                    const double x = z(i, l), y = z(i, l + 1);
                    z(i, l) = cs * x + sn * y;
                    z(i, l + 1) = -sn * x + cs * y;
                }
            }
            m -= 2; window_its = 0; continue;
        }
        // Francis double shift from the trailing 2x2: s1 + s2 = tr,
        // s1 * s2 = det (both real even for a complex pair)
        ++window_its;
        double tr, det;
        if (window_its % 11 == 0) {
            // exceptional shifts (stagnation): ad-hoc values built from
            // the subdiagonal magnitudes, as the classic QR iterations do
            const double s = std::abs(t(m - 1, m - 2)) +
                             (m - 2 > l ? std::abs(t(m - 2, m - 3)) : 0.0);
            tr = 2.0 * (0.75 * s + t(m - 1, m - 1));
            det = (0.75 * s + t(m - 1, m - 1)) *
                  (0.75 * s + t(m - 1, m - 1)) - 0.4375 * s * s;
        } else {
            const double a = t(m - 2, m - 2), b = t(m - 2, m - 1);
            const double c = t(m - 1, m - 2), d = t(m - 1, m - 1);
            tr = a + d; det = a * d - b * c;
        }
        // first column of (H - s1 I)(H - s2 I) e1 on window [l, m)
        const double h00 = t(l, l), h01 = t(l, l + 1);
        const double h10 = t(l + 1, l), h11 = t(l + 1, l + 1);
        const double h21 = t(l + 2, l + 1);
        double x0 = h00 * h00 + h01 * h10 - tr * h00 + det;
        double x1 = h10 * (h00 + h11 - tr);
        double x2 = h10 * h21;
        // scale to avoid overflow in the products
        const double sc = std::abs(x0) + std::abs(x1) + std::abs(x2);
        if (sc != 0.0) { x0 /= sc; x1 /= sc; x2 /= sc; }
        // chase the 3x3 bulge down the window
        for (int k = l; k < m - 1; ++k) {
            const int len = (k < m - 2) ? 3 : 2;
            House3 h = (k == l) ? reflector(x0, x1, x2, len)
                                : reflector(t(k, k - 1), t(k + 1, k - 1),
                                            len == 3 ? t(k + 2, k - 1) : 0.0,
                                            len);
            if (h.tau != 0.0) {
                const int c0 = (k > l) ? k - 1 : l;
                // left: rows k..k+len-1, cols c0..n
                for (int j = c0; j < n; ++j) {
                    double w = h.v0 * t(k, j) + h.v1 * t(k + 1, j);
                    if (len == 3) w += h.v2 * t(k + 2, j);
                    w *= h.tau;
                    t(k, j) -= w * h.v0;
                    t(k + 1, j) -= w * h.v1;
                    if (len == 3) t(k + 2, j) -= w * h.v2;
                }
                // right: cols k..k+len-1, rows 0..min(k+len+1, m)
                const int hi = (k + len + 1 < m) ? k + len + 1 : m;
                for (int i = 0; i < hi; ++i) {
                    double w = h.v0 * t(i, k) + h.v1 * t(i, k + 1);
                    if (len == 3) w += h.v2 * t(i, k + 2);
                    w *= h.tau;
                    t(i, k) -= w * h.v0;
                    t(i, k + 1) -= w * h.v1;
                    if (len == 3) t(i, k + 2) -= w * h.v2;
                }
                if (want_vecs) {
                    for (int i = 0; i < n; ++i) {
                        double w = h.v0 * z(i, k) + h.v1 * z(i, k + 1);
                        if (len == 3) w += h.v2 * z(i, k + 2);
                        w *= h.tau;
                        z(i, k) -= w * h.v0;
                        z(i, k + 1) -= w * h.v1;
                        if (len == 3) z(i, k + 2) -= w * h.v2;
                    }
                }
            }
            if (k > l) {
                t(k + 1, k - 1) = 0.0;
                if (len == 3) t(k + 2, k - 1) = 0.0;
            }
        }
    }
    // final pass: standardize every remaining 2x2 block (subdiagonal
    // nonzeros) and zero everything below the block diagonal
    for (int k = 0; k < n - 1; ++k) {
        if (t(k + 1, k) != 0.0) {
            double cs, sn, w1r, w1i, w2r, w2i;
            double a = t(k, k), b = t(k, k + 1);
            double c = t(k + 1, k), d = t(k + 1, k + 1);
            standardize2x2(a, b, c, d, cs, sn, w1r, w1i, w2r, w2i);
            t(k, k) = a; t(k, k + 1) = b; t(k + 1, k) = c; t(k + 1, k + 1) = d;
            for (int j = k + 2; j < n; ++j) {
                const double x = t(k, j), y = t(k + 1, j);
                t(k, j) = cs * x + sn * y;
                t(k + 1, j) = -sn * x + cs * y;
            }
            for (int i = 0; i < k; ++i) {
                const double x = t(i, k), y = t(i, k + 1);
                t(i, k) = cs * x + sn * y;
                t(i, k + 1) = -sn * x + cs * y;
            }
            if (want_vecs) {
                for (int i = 0; i < n; ++i) {
                    const double x = z(i, k), y = z(i, k + 1);
                    z(i, k) = cs * x + sn * y;
                    z(i, k + 1) = -sn * x + cs * y;
                }
            }
            if (t(k + 1, k) != 0.0) ++k;  // genuine complex-pair block
        }
    }
    for (int i = 0; i < n; ++i)
        for (int j = 0; j + 1 < i; ++j) t(i, j) = 0.0;
    return (its >= budget && m > 1) ? 1 : 0;
}

// --- real quasi-triangular block machinery (AED support) ---------------

// Solve the tiny Sylvester system (I_q (x) A11 - A22^T (x) I_p) x =
// vec_F(A12), pq <= 4, by Gaussian elimination with partial pivoting.
// Returns false when numerically singular (near-identical eigenvalues).
bool small_sylvester(int p, int q, const double* A11, const double* A12,
                     const double* A22, int ld, double* X) {
    const int m = p * q;
    double K[4][5];
    // K[(j*p+i), (l*p+r)] = A11[i][r]*delta_jl - A22[l][j]*delta_ir
    for (int j = 0; j < q; ++j)
        for (int i = 0; i < p; ++i) {
            const int row = j * p + i;
            for (int l = 0; l < q; ++l)
                for (int r = 0; r < p; ++r) {
                    double v = 0.0;
                    if (j == l) v += A11[i * ld + r];
                    if (i == r) v -= A22[l * ld + j];
                    K[row][l * p + r] = v;
                }
            K[row][m] = A12[i * ld + j];
        }
    for (int c = 0; c < m; ++c) {
        int piv = c;
        for (int r = c + 1; r < m; ++r)
            if (std::abs(K[r][c]) > std::abs(K[piv][c])) piv = r;
        if (std::abs(K[piv][c]) < 1e-300) return false;
        if (piv != c)
            for (int j = c; j <= m; ++j) std::swap(K[c][j], K[piv][j]);
        for (int r = c + 1; r < m; ++r) {
            const double f = K[r][c] / K[c][c];
            for (int j = c; j <= m; ++j) K[r][j] -= f * K[c][j];
        }
    }
    for (int r = m - 1; r >= 0; --r) {
        double v = K[r][m];
        for (int j = r + 1; j < m; ++j) v -= K[r][j] * X[j];
        X[r] = v / K[r][r];
    }
    return true;
}

void standardize_block_full(int n, double* T, double* Z, int want_vecs,
                            int k) {
    auto t = [&](int i, int j) -> double& { return T[(size_t)i * n + j]; };
    auto z = [&](int i, int j) -> double& { return Z[(size_t)i * n + j]; };
    if (t(k + 1, k) == 0.0) return;
    double cs, sn, w1r, w1i, w2r, w2i;
    double a = t(k, k), b = t(k, k + 1);
    double c = t(k + 1, k), d = t(k + 1, k + 1);
    standardize2x2(a, b, c, d, cs, sn, w1r, w1i, w2r, w2i);
    t(k, k) = a; t(k, k + 1) = b; t(k + 1, k) = c; t(k + 1, k + 1) = d;
    for (int j = k + 2; j < n; ++j) {
        const double x = t(k, j), y = t(k + 1, j);
        t(k, j) = cs * x + sn * y;
        t(k + 1, j) = -sn * x + cs * y;
    }
    for (int i = 0; i < k; ++i) {
        const double x = t(i, k), y = t(i, k + 1);
        t(i, k) = cs * x + sn * y;
        t(i, k + 1) = -sn * x + cs * y;
    }
    if (want_vecs) {
        for (int i = 0; i < n; ++i) {
            const double x = z(i, k), y = z(i, k + 1);
            z(i, k) = cs * x + sn * y;
            z(i, k + 1) = -sn * x + cs * y;
        }
    }
}

// Swap adjacent diagonal blocks (k, p) and (k+p, q) of the n x n
// quasi-triangular T by an orthogonal similarity (direct-swap method).
void swap_blocks(int n, double* T, double* Z, int want_vecs, int k,
                 int p, int q) {
    auto t = [&](int i, int j) -> double& { return T[(size_t)i * n + j]; };
    auto z = [&](int i, int j) -> double& { return Z[(size_t)i * n + j]; };
    const int w = p + q;
    // small_sylvester reads the blocks in place with stride n
    double X[4];
    const bool ok = small_sylvester(p, q, &t(k, k), &t(k, k + p),
                                    &t(k + p, k + p), n, X);
    if (!ok) return;  // identical eigenvalues: swap is a semantic no-op
    // M = [[-X], [I_q]]  (w x q, column-major not needed; row-major)
    double M[16];
    for (int i = 0; i < p; ++i)
        for (int j = 0; j < q; ++j) M[i * q + j] = -X[j * p + i];
    for (int i = 0; i < q; ++i)
        for (int j = 0; j < q; ++j) M[(p + i) * q + j] = (i == j) ? 1.0 : 0.0;
    // full QR of M via Householder: Q (w x w) accumulated explicitly
    double Q[16];
    for (int i = 0; i < w; ++i)
        for (int j = 0; j < w; ++j) Q[i * w + j] = (i == j) ? 1.0 : 0.0;
    for (int c = 0; c < q; ++c) {
        double nrm = 0.0;
        for (int i = c; i < w; ++i) nrm += M[i * q + c] * M[i * q + c];
        nrm = std::sqrt(nrm);
        if (nrm == 0.0) continue;
        const double beta = (M[c * q + c] >= 0.0) ? -nrm : nrm;
        double v[4];
        for (int i = 0; i < w; ++i) v[i] = (i < c) ? 0.0 : M[i * q + c];
        v[c] -= beta;
        double vn2 = 0.0;
        for (int i = 0; i < w; ++i) vn2 += v[i] * v[i];
        if (vn2 == 0.0) continue;
        const double tau = 2.0 / vn2;
        // M -= tau v (v^T M)
        for (int j = 0; j < q; ++j) {
            double s = 0.0;
            for (int i = 0; i < w; ++i) s += v[i] * M[i * q + j];
            s *= tau;
            for (int i = 0; i < w; ++i) M[i * q + j] -= s * v[i];
        }
        // Q -= (Q v) tau v^T   (accumulate right-multiplication by H)
        for (int i = 0; i < w; ++i) {
            double s = 0.0;
            for (int j = 0; j < w; ++j) s += Q[i * w + j] * v[j];
            s *= tau;
            for (int j = 0; j < w; ++j) Q[i * w + j] -= s * v[j];
        }
    }
    // T[k:k+w, :] = Q^T T[k:k+w, :]
    for (int j = 0; j < n; ++j) {
        double col[4];
        for (int i = 0; i < w; ++i) col[i] = t(k + i, j);
        for (int i = 0; i < w; ++i) {
            double s = 0.0;
            for (int r = 0; r < w; ++r) s += Q[r * w + i] * col[r];
            t(k + i, j) = s;
        }
    }
    // T[:, k:k+w] = T[:, k:k+w] Q
    for (int i = 0; i < n; ++i) {
        double row[4];
        for (int j = 0; j < w; ++j) row[j] = t(i, k + j);
        for (int j = 0; j < w; ++j) {
            double s = 0.0;
            for (int r = 0; r < w; ++r) s += row[r] * Q[r * w + j];
            t(i, k + j) = s;
        }
    }
    if (want_vecs) {
        for (int i = 0; i < n; ++i) {
            double row[4];
            for (int j = 0; j < w; ++j) row[j] = z(i, k + j);
            for (int j = 0; j < w; ++j) {
                double s = 0.0;
                for (int r = 0; r < w; ++r) s += row[r] * Q[r * w + j];
                z(i, k + j) = s;
            }
        }
    }
    // exact block-triangular structure + restandardize
    for (int i = q; i < w; ++i)
        for (int j = 0; j < q; ++j) t(k + i, k + j) = 0.0;
    if (q == 2) standardize_block_full(n, T, Z, want_vecs, k);
    if (p == 2) standardize_block_full(n, T, Z, want_vecs, k + q);
}

int scan_blocks(int n, const double* T, int starts[], int sizes[]) {
    int nb = 0, k = 0;
    while (k < n) {
        if (k + 1 < n && T[(size_t)(k + 1) * n + k] != 0.0) {
            starts[nb] = k; sizes[nb++] = 2; k += 2;
        } else {
            starts[nb] = k; sizes[nb++] = 1; k += 1;
        }
    }
    return nb;
}

}  // namespace

// Real aggressive-early-deflation window processing: real Schur of the
// w x w Hessenberg window Hw (in T, overwritten), bottom-up per-block
// spike deflation tests with orthogonal block swaps bubbling
// undeflatable blocks to the window top. Returns the number of deflated
// rows (trailing), or -1 on failure. Z receives the accumulated window
// similarity. ``beta`` is the subdiagonal entry sourcing the spike,
// ``scale0`` a caller-provided magnitude floor for the test.
// shifts_out: 2*w doubles; [0,w) receive the real parts and [w, 2w) the
// imaginary parts of the KEPT (undeflated) window eigenvalues, captured
// from the reordered quasi-triangular form before spike elimination.
extern "C" int elx_real_aed(int w, double* T, double* Z, double beta,
                            double eps, double scale0,
                            double* gamma_out, double* shifts_out) {
    if (real_qr_core(w, T, Z, 1, 40) != 0) return -1;
    auto t = [&](int i, int j) -> double& { return T[(size_t)i * w + j]; };
    auto z = [&](int i, int j) -> double& { return Z[(size_t)i * w + j]; };
    double scale = scale0;
    for (int i = 0; i < w; ++i)
        scale = std::max(scale, std::abs(t(i, i)));
    scale = std::max(scale, std::abs(beta));
    static thread_local int starts[4096], sizes[4096];
    if (w > 4096) return -1;
    int nb = scan_blocks(w, T, starts, sizes);
    int u = 0;
    int bi = nb - 1;
    while (bi >= 0 && starts[bi] >= u) {
        const int k = starts[bi], sz = sizes[bi];
        double smax = 0.0, foot = 1e-300;
        for (int j = 0; j < sz; ++j) {
            smax = std::max(smax, std::abs(beta * z(0, k + j)));
            foot = std::max(foot, std::abs(t(k + j, k + j)));
        }
        if (smax <= eps * std::max(foot, scale)) {
            --bi;  // deflatable: stays at the bottom
        } else {
            // bubble to position u via adjacent swaps
            int pos = k;
            for (int j = bi - 1; j >= 0 && starts[j] >= u; --j) {
                swap_blocks(w, T, Z, 1, starts[j], sizes[j], sz);
                pos = starts[j];
                // shift bookkeeping: our block takes starts[j]
                const int asz = sizes[j];
                starts[j + 1] = starts[j] + sz;
                sizes[j + 1] = asz;
                sizes[j] = sz;
            }
            u += sz;
            nb = scan_blocks(w, T, starts, sizes);  // swaps may split 2x2s
            bi = nb - 1;
        }
    }
    const int d = w - u;
    const int kept = u;
    // capture the kept eigenvalues as shifts (standardized blocks)
    for (int i = 0; i < kept; ++i) {
        if (i + 1 < kept && t(i + 1, i) != 0.0) {
            const double p = 0.5 * (t(i, i) + t(i + 1, i + 1));
            const double q2 = -t(i, i + 1) * t(i + 1, i)
                - 0.25 * (t(i, i) - t(i + 1, i + 1))
                      * (t(i, i) - t(i + 1, i + 1));
            const double q = q2 > 0.0 ? std::sqrt(q2) : 0.0;
            shifts_out[i] = p; shifts_out[w + i] = q;
            shifts_out[i + 1] = p; shifts_out[w + i + 1] = -q;
            ++i;
        } else {
            shifts_out[i] = t(i, i);
            shifts_out[w + i] = 0.0;
        }
    }
    gamma_out[0] = 0.0;
    if (kept > 0) {
        // Householder on the kept spike -> gamma e1 (window-local; the
        // caller applies the accumulated Z to the off-window strips)
        static thread_local double v[8192];
        if (kept > 8192) return -1;
        double nrm2 = 0.0;
        for (int i = 0; i < kept; ++i) {
            v[i] = beta * z(0, i);
            nrm2 += v[i] * v[i];
        }
        const double nrm = std::sqrt(nrm2);
        double gamma = 0.0;
        if (nrm > 0.0) {
            gamma = (v[0] >= 0.0) ? -nrm : nrm;
            v[0] -= gamma;
            double vn2 = 0.0;
            for (int i = 0; i < kept; ++i) vn2 += v[i] * v[i];
            if (vn2 > 0.0) {
                const double tau = 2.0 / vn2;
                for (int j = 0; j < w; ++j) {
                    double s2 = 0.0;
                    for (int i = 0; i < kept; ++i) s2 += v[i] * t(i, j);
                    s2 *= tau;
                    for (int i = 0; i < kept; ++i) t(i, j) -= s2 * v[i];
                }
                for (int i = 0; i < w; ++i) {
                    double s2 = 0.0;
                    for (int j = 0; j < kept; ++j) s2 += t(i, j) * v[j];
                    s2 *= tau;
                    for (int j = 0; j < kept; ++j) t(i, j) -= s2 * v[j];
                }
                for (int i = 0; i < w; ++i) {
                    double s2 = 0.0;
                    for (int j = 0; j < kept; ++j) s2 += z(i, j) * v[j];
                    s2 *= tau;
                    for (int j = 0; j < kept; ++j) z(i, j) -= s2 * v[j];
                }
            }
        }
        gamma_out[0] = gamma;
        // re-Hessenberg the kept block (window-local similarity)
        for (int col = 0; col + 2 < kept; ++col) {
            double nn = 0.0;
            for (int i = col + 1; i < kept; ++i) nn += t(i, col) * t(i, col);
            const double cn = std::sqrt(nn);
            if (cn == 0.0) continue;
            const double bet = (t(col + 1, col) >= 0.0) ? -cn : cn;
            const int len = kept - (col + 1);
            for (int i = 0; i < len; ++i) v[i] = t(col + 1 + i, col);
            v[0] -= bet;
            double vn2 = 0.0;
            for (int i = 0; i < len; ++i) vn2 += v[i] * v[i];
            if (vn2 == 0.0) continue;
            const double tau = 2.0 / vn2;
            for (int j = 0; j < w; ++j) {
                double s2 = 0.0;
                for (int i = 0; i < len; ++i) s2 += v[i] * t(col + 1 + i, j);
                s2 *= tau;
                for (int i = 0; i < len; ++i) t(col + 1 + i, j) -= s2 * v[i];
            }
            for (int i = 0; i < w; ++i) {
                double s2 = 0.0;
                for (int j = 0; j < len; ++j) s2 += t(i, col + 1 + j) * v[j];
                s2 *= tau;
                for (int j = 0; j < len; ++j) t(i, col + 1 + j) -= s2 * v[j];
            }
            for (int i = 0; i < w; ++i) {
                double s2 = 0.0;
                for (int j = 0; j < len; ++j) s2 += z(i, col + 1 + j) * v[j];
                s2 *= tau;
                for (int j = 0; j < len; ++j) z(i, col + 1 + j) -= s2 * v[j];
            }
            t(col + 1, col) = bet;
            for (int i = col + 2; i < kept; ++i) t(i, col) = 0.0;
        }
    }
    return d;
}
