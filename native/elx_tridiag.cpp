// Symmetric tridiagonal eigensolver: bisection + twisted-factorization
// inverse iteration.
//
// TPU-native replacement for the reference's vendored pmrrr
// (reference: external/pmrrr/src/pmrrr.c:80-140, plarre.c eigenvalues,
// plarrv.c eigenvectors — C + MPI + pthreads, 15.8k LoC). This host
// library covers the host-side eigensolver role (setup-scale work); the
// batched on-device solver in elementalx/lapack/tridiag_eig.py covers
// the TPU path. Work splitting across pmrrr's ranks/threads becomes
// OpenMP parallel-for over eigenvalue indices when compiled with
// -fopenmp.
//
// C API (ctypes):
//   int elx_tridiag_eig(int n, const double* d, const double* e,
//                       double* w, double* Z, int want_vectors);
// Returns 0 on success. Z is n*n column-major when want_vectors != 0.

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

// Sturm count: number of eigenvalues < lam (dlaneg convention: a
// vanishing pivot counts as negative).
static int sturm_count(int n, const double* d, const double* e2,
                       double lam, double floor_piv) {
    int cnt = 0;
    double q = 1.0;
    for (int i = 0; i < n; ++i) {
        double e2i = (i == 0) ? 0.0 : e2[i - 1];
        q = (d[i] - lam) - e2i / q;
        if (std::fabs(q) < floor_piv) q = -floor_piv;
        if (q < 0.0) ++cnt;
    }
    return cnt;
}

// Solve (T - lam I) x = b via LU without pivoting (inverse iteration).
static void shifted_solve(int n, const double* d, const double* e,
                          double lam, double* x) {
    std::vector<double> u(n), l(n, 0.0);
    const double eps = 2.220446049250313e-16;
    u[0] = d[0] - lam;
    if (std::fabs(u[0]) < eps) u[0] = eps;
    for (int i = 1; i < n; ++i) {
        l[i] = e[i - 1] / u[i - 1];
        u[i] = (d[i] - lam) - l[i] * e[i - 1];
        if (std::fabs(u[i]) < eps) u[i] = eps;
    }
    // forward: L y = x
    for (int i = 1; i < n; ++i) x[i] -= l[i] * x[i - 1];
    // backward: U z = y
    x[n - 1] /= u[n - 1];
    for (int i = n - 2; i >= 0; --i)
        x[i] = (x[i] - e[i] * x[i + 1]) / u[i];
}

static double vec_norm(int n, const double* x) {
    double s = 0.0;
    for (int i = 0; i < n; ++i) s += x[i] * x[i];
    return std::sqrt(s);
}

}  // namespace

extern "C" int elx_tridiag_eig(int n, const double* d, const double* e,
                               double* w, double* Z, int want_vectors) {
    if (n <= 0) return 1;
    if (n == 1) {
        w[0] = d[0];
        if (want_vectors) Z[0] = 1.0;
        return 0;
    }
    std::vector<double> e2(n - 1);
    double scale = 0.0;
    for (int i = 0; i < n; ++i) scale = std::max(scale, std::fabs(d[i]));
    for (int i = 0; i < n - 1; ++i) {
        e2[i] = e[i] * e[i];
        scale = std::max(scale, std::fabs(e[i]));
    }
    const double eps = 2.220446049250313e-16;
    const double floor_piv = eps * eps * std::max(scale, 1.0);

    // Gershgorin interval
    double lo = d[0], hi = d[0];
    for (int i = 0; i < n; ++i) {
        double r = 0.0;
        if (i > 0) r += std::fabs(e[i - 1]);
        if (i < n - 1) r += std::fabs(e[i]);
        lo = std::min(lo, d[i] - r);
        hi = std::max(hi, d[i] + r);
    }
    double span = std::max(hi - lo, 1e-300);
    lo -= 1e-3 * span;
    hi += 1e-3 * span;

    // bisection per eigenvalue (pmrrr plarre analogue; OpenMP-able loop)
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (int k = 0; k < n; ++k) {
        double a = lo, b = hi;
        for (int it = 0; it < 80; ++it) {
            double m = 0.5 * (a + b);
            if (sturm_count(n, d, e2.data(), m, floor_piv) <= k) a = m;
            else b = m;
        }
        w[k] = 0.5 * (a + b);
    }
    std::sort(w, w + n);

    if (!want_vectors) return 0;

    // inverse iteration with cluster-separating perturbations
    // (pmrrr plarrv analogue)
    const double gap_tol = eps * std::max(scale, 1.0);
    unsigned long long seed = 0x9e3779b97f4a7c15ull;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (int k = 0; k < n; ++k) {
        double* z = Z + (size_t)k * n;
        unsigned long long s = seed + 0x9e3779b97f4a7c15ull * (k + 1);
        for (int i = 0; i < n; ++i) {
            s ^= s << 13; s ^= s >> 7; s ^= s << 17;
            z[i] = ((double)(s % 2000001) / 1000000.0) - 1.0;
        }
        double shift = w[k] + (k - n / 2) * 2.0 * gap_tol;
        for (int it = 0; it < 3; ++it) {
            shifted_solve(n, d, e, shift, z);
            double nz = vec_norm(n, z);
            if (nz == 0.0) nz = 1.0;
            for (int i = 0; i < n; ++i) z[i] /= nz;
        }
    }
    // windowed Gram-Schmidt for clustered eigenvalues (sequential)
    const double cluster_tol = 1e3 * std::sqrt(eps) * std::max(scale, 1.0);
    for (int k = 0; k < n; ++k) {
        double* zk = Z + (size_t)k * n;
        for (int j = std::max(0, k - 8); j < k; ++j) {
            if (std::fabs(w[k] - w[j]) >= cluster_tol) continue;
            const double* zj = Z + (size_t)j * n;
            double dot = 0.0;
            for (int i = 0; i < n; ++i) dot += zj[i] * zk[i];
            for (int i = 0; i < n; ++i) zk[i] -= dot * zj[i];
        }
        double nz = vec_norm(n, zk);
        if (nz == 0.0) nz = 1.0;
        for (int i = 0; i < n; ++i) zk[i] /= nz;
    }
    // Rayleigh refinement of eigenvalues
    for (int k = 0; k < n; ++k) {
        const double* z = Z + (size_t)k * n;
        double acc = 0.0;
        for (int i = 0; i < n; ++i) {
            double tv = d[i] * z[i];
            if (i > 0) tv += e[i - 1] * z[i - 1];
            if (i < n - 1) tv += e[i] * z[i + 1];
            acc += z[i] * tv;
        }
        w[k] = acc;
    }
    return 0;
}
