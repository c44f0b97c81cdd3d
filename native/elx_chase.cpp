// Windowed multibulge chase kernels (complex128 and float64) — the
// per-step scalar inner loop of the batched multishift QR sweep
// (reference: spectral/HessenbergSchur's multibulge tree; LAPACK
// zlaqr5/dlaqr5's bulk chase). The Python drivers
// (elementalx/lapack/schur.py::_multibulge_sweep and
// lapack/schur_real.py) keep the GEMM-rich off-window updates in numpy
// BLAS and call these kernels for one full accumulation-window pass:
// `span` chase steps of 3-row Householder similarities confined to the
// window [k1, k2) plus the accumulated window unitary U. Per step the
// Python version pays ~10 interpreter-dispatched fancy-indexed array
// ops; here it is straight scalar loops.
//
// Row-major contiguous buffers; all k/l/m indices are GLOBAL (the
// window buffer holds rows/cols [k1, k2) of the full matrix). U is
// initialised to the identity inside.

#include <cmath>
#include <complex>
#include <cstddef>
#include <vector>

namespace {

template <typename S>
struct Ref3 {
    S v[3];
    double tau;
    int len;
};

inline double norm2(const std::complex<double>& x) { return std::norm(x); }
inline double norm2(const double& x) { return x * x; }
inline std::complex<double> conj_(const std::complex<double>& x) {
    return std::conj(x);
}
inline double conj_(const double& x) { return x; }

template <typename S>
Ref3<S> reflector(const S* x, int len) {
    Ref3<S> r;
    r.tau = 0.0;
    r.len = len;
    double n2 = 0.0;
    for (int i = 0; i < len; ++i) {
        r.v[i] = x[i];
        n2 += norm2(x[i]);
    }
    double nrm = std::sqrt(n2);
    if (nrm == 0.0) {
        for (int i = 0; i < len; ++i) r.v[i] = S(0);
        return r;
    }
    double aa = std::sqrt(norm2(x[0]));
    S sign = aa > 0.0 ? S(x[0] / aa) : S(1);
    S beta = S(-1) * sign * S(nrm);
    r.v[0] -= beta;
    double vn2 = 0.0;
    for (int i = 0; i < len; ++i) vn2 += norm2(r.v[i]);
    if (vn2 == 0.0) {
        for (int i = 0; i < len; ++i) r.v[i] = S(0);
        return r;
    }
    r.tau = 2.0 / vn2;
    return r;
}

// One accumulation-window pass of the multibulge chase.
// pair_mode=0: `shifts` holds 2*nb individual shifts (complex driver,
// intro polynomial (H-s1)(H-s2)e1). pair_mode=1: `shifts` holds nb
// (trace, det) pairs (real Francis driver, intro polynomial
// (H^2 - tr H + det)e1 with 1-norm scaling, as the numpy sweep does).
template <typename S>
int chase_core(int w, S* T, S* U, const S* shifts, int nb, int t0,
               int span, int l, int m, int k1, int k2, int pair_mode) {
    auto tw = [&](int gi, int gj) -> S& {
        return T[(size_t)(gi - k1) * w + (gj - k1)];
    };
    auto uw = [&](int i, int j) -> S& { return U[(size_t)i * w + j]; };
    for (int i = 0; i < w; ++i)
        for (int j = 0; j < w; ++j) uw(i, j) = (i == j) ? S(1) : S(0);

    // edge-case similarity: left on rows [row0, row0+len) x cols
    // [c0, k2), right on rows [k1, min(row0+len+1, k2)), U columns
    auto apply_one = [&](const Ref3<S>& r, int row0, int c0) {
        if (r.tau == 0.0) return;
        const int len = r.len;
        for (int jc = c0; jc < k2; ++jc) {
            S wl = S(0);
            for (int i = 0; i < len; ++i) wl += conj_(r.v[i]) * tw(row0 + i, jc);
            wl *= S(r.tau);
            for (int i = 0; i < len; ++i) tw(row0 + i, jc) -= r.v[i] * wl;
        }
        int rend = row0 + len + 1;
        if (rend > k2) rend = k2;
        for (int ir = k1; ir < rend; ++ir) {
            S wr = S(0);
            for (int i = 0; i < len; ++i) wr += tw(ir, row0 + i) * r.v[i];
            wr *= S(r.tau);
            for (int i = 0; i < len; ++i) tw(ir, row0 + i) -= wr * conj_(r.v[i]);
        }
        const int uc = row0 - k1;
        for (int ir = 0; ir < w; ++ir) {
            S wu = S(0);
            for (int i = 0; i < len; ++i) wu += uw(ir, uc + i) * r.v[i];
            wu *= S(r.tau);
            for (int i = 0; i < len; ++i) uw(ir, uc + i) -= wu * conj_(r.v[i]);
        }
    };

    const int pmax = m - 2 - l;
    std::vector<int> ks;
    std::vector<Ref3<S>> rs;
    for (int step = t0; step < t0 + span; ++step) {
        ks.clear();
        rs.clear();
        bool intro = false;
        for (int j = 0; j < nb; ++j) {
            int p = step - 3 * j;
            if (p < 0 || p > pmax) continue;
            if (p == 0) {
                intro = true;
                continue;
            }
            int k = l + p - 1;
            if (k >= m - 2) continue;
            if (k == m - 3) {  // exit reflector shrinks to 2 rows
                S x[2] = {tw(k + 1, k), tw(k + 2, k)};
                Ref3<S> r = reflector<S>(x, 2);
                apply_one(r, k + 1, k);
                tw(k + 2, k) = S(0);
                continue;
            }
            ks.push_back(k);
        }
        // reflectors from the current T (before this step's updates)
        for (int k : ks) {
            S x[3] = {tw(k + 1, k), tw(k + 2, k), tw(k + 3, k)};
            rs.push_back(reflector<S>(x, 3));
        }
        // all lefts (disjoint row triples), full window width
        for (size_t b = 0; b < ks.size(); ++b) {
            const Ref3<S>& r = rs[b];
            if (r.tau == 0.0) continue;
            const int k = ks[b];
            for (int jc = k1; jc < k2; ++jc) {
                S wl = conj_(r.v[0]) * tw(k + 1, jc)
                     + conj_(r.v[1]) * tw(k + 2, jc)
                     + conj_(r.v[2]) * tw(k + 3, jc);
                wl *= S(r.tau);
                tw(k + 1, jc) -= r.v[0] * wl;
                tw(k + 2, jc) -= r.v[1] * wl;
                tw(k + 3, jc) -= r.v[2] * wl;
            }
        }
        // all rights (disjoint column triples), full window height
        for (size_t b = 0; b < ks.size(); ++b) {
            const Ref3<S>& r = rs[b];
            if (r.tau == 0.0) continue;
            const int k = ks[b];
            for (int ir = k1; ir < k2; ++ir) {
                S wr = tw(ir, k + 1) * r.v[0] + tw(ir, k + 2) * r.v[1]
                     + tw(ir, k + 3) * r.v[2];
                wr *= S(r.tau);
                tw(ir, k + 1) -= wr * conj_(r.v[0]);
                tw(ir, k + 2) -= wr * conj_(r.v[1]);
                tw(ir, k + 3) -= wr * conj_(r.v[2]);
            }
        }
        // U accumulation (right-multiplication)
        for (size_t b = 0; b < ks.size(); ++b) {
            const Ref3<S>& r = rs[b];
            if (r.tau == 0.0) continue;
            const int uc = ks[b] + 1 - k1;
            for (int ir = 0; ir < w; ++ir) {
                S wu = uw(ir, uc) * r.v[0] + uw(ir, uc + 1) * r.v[1]
                     + uw(ir, uc + 2) * r.v[2];
                wu *= S(r.tau);
                uw(ir, uc) -= wu * conj_(r.v[0]);
                uw(ir, uc + 1) -= wu * conj_(r.v[1]);
                uw(ir, uc + 2) -= wu * conj_(r.v[2]);
            }
        }
        // exact zeros below the subdiagonal of each chase column
        for (int k : ks) {
            tw(k + 2, k) = S(0);
            tw(k + 3, k) = S(0);
        }
        if (intro) {
            int j = step / 3;
            S h00 = tw(l, l), h01 = tw(l, l + 1);
            S h10 = tw(l + 1, l), h11 = tw(l + 1, l + 1);
            S v0, v1;
            if (pair_mode) {
                S tr = shifts[2 * j], det = shifts[2 * j + 1];
                v0 = h00 * h00 + h01 * h10 - tr * h00 + det;
                v1 = h10 * (h00 + h11 - tr);
            } else {
                S s1 = shifts[2 * j], s2 = shifts[2 * j + 1];
                v0 = (h00 - s1) * (h00 - s2) + h01 * h10;
                v1 = h10 * (h00 + h11 - s1 - s2);
            }
            int len = (m - l >= 3) ? 3 : 2;
            S x[3] = {v0, v1, len == 3 ? h10 * tw(l + 2, l + 1) : S(0)};
            if (pair_mode) {
                double sc = 0.0;
                for (int i = 0; i < len; ++i) sc += std::sqrt(norm2(x[i]));
                if (sc != 0.0)
                    for (int i = 0; i < len; ++i) x[i] /= S(sc);
            }
            Ref3<S> r = reflector<S>(x, len);
            apply_one(r, l, k1);
        }
    }
    return 0;
}

}  // namespace

extern "C" int elx_complex_chase(int w, void* Tv, void* Uv, void* Sv,
                                 int nb, int t0, int span, int l, int m,
                                 int k1, int k2) {
    using C = std::complex<double>;
    return chase_core<C>(w, static_cast<C*>(Tv), static_cast<C*>(Uv),
                         static_cast<const C*>(Sv), nb, t0, span, l, m,
                         k1, k2, 0);
}

extern "C" int elx_real_chase(int w, double* T, double* U,
                              const double* shifts, int nb, int t0,
                              int span, int l, int m, int k1, int k2) {
    return chase_core<double>(w, T, U, shifts, nb, t0, span, l, m, k1,
                              k2, 1);
}
