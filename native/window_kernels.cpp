// starneig_tpu native window codelets.
//
// Host-side sequential kernels for the small diagonal-window work of the
// eigensolvers: Francis double-shift QR, AED (aggressive early deflation)
// processing, and adjacent Schur-block swaps.  This mirrors the reference
// architecture exactly: StarNEig runs the same windows as CPU codelets
// (src/schur/cpu_utils.c — perform_small_schur_reduction cpu_utils.c:2426,
// perform_aggressively_deflate cpu_utils.c:2837, starneig_move_block
// cpu_utils.c:3377) while BLAS-3 trailing updates run on the accelerator.
// Here the TPU (MXU) gets every O(n^2)-sized GEMM update and these
// latency-bound scalar recursions run on the host in true f64 (the TPU's
// emulated double-f32 f64 costs both precision and ~1000x latency on
// sequential scalar loops).
//
// All algorithms are from-scratch implementations of the published methods
// (Householder reflectors, Wilkinson shifts, Francis bulge chasing, dlanv2
// standardization, direct adjacent-block swaps via small Sylvester solves).
// Matrix layout: row-major, leading dimension = w (the window size).
//
// Build: make libsnwindow.so (see Makefile).

#include <cmath>
#include <cstring>
#include <cstdlib>
#include <algorithm>

namespace {

constexpr double EPS = 2.220446049250313e-16;   // f64 ulp
constexpr double TINY = 2.2250738585072014e-308;

inline double sign1(double x) { return x >= 0.0 ? 1.0 : -1.0; }

inline double hypot2(double x, double y) {
    double ax = std::fabs(x), ay = std::fabs(y);
    double w = std::max(ax, ay), z = std::min(ax, ay);
    if (w == 0.0) return 0.0;
    double r = z / w;
    return w * std::sqrt(1.0 + r * r);
}

// ---------------------------------------------------------------------------
// scalar primitives
// ---------------------------------------------------------------------------

// Plane rotation zeroing g: [c s; -s c]^T? -- convention as in dlartg:
// [c s; -s c] [f; g] = [r; 0].
inline void rotg(double f, double g, double* c, double* s, double* r) {
    if (g == 0.0) { *c = 1.0; *s = 0.0; *r = f; return; }
    if (f == 0.0) { *c = 0.0; *s = 1.0; *r = g; return; }
    double rr = sign1(f) * hypot2(f, g);
    *c = f / rr;
    *s = g / rr;
    *r = rr;
}

// Householder reflector annihilating x[1:n): returns v (v[0]=1), tau, beta
// with (I - tau v v^T) x = beta e1.  Scales by max|x| first.
inline void reflector(const double* x, int n, double* v, double* tau,
                      double* beta) {
    double m = 0.0;
    for (int i = 0; i < n; ++i) m = std::max(m, std::fabs(x[i]));
    if (m == 0.0) {
        v[0] = 1.0;
        for (int i = 1; i < n; ++i) v[i] = 0.0;
        *tau = 0.0; *beta = 0.0;
        return;
    }
    double alpha = x[0] / m;
    double ss = 0.0;
    for (int i = 1; i < n; ++i) {
        double xi = x[i] / m;
        ss += xi * xi;
    }
    if (ss == 0.0) {
        v[0] = 1.0;
        for (int i = 1; i < n; ++i) v[i] = 0.0;
        *tau = 0.0; *beta = x[0];
        return;
    }
    double xnorm = std::sqrt(ss);
    double b = -sign1(alpha) * hypot2(alpha, xnorm);
    *tau = (b - alpha) / b;
    double scl = 1.0 / (alpha - b);
    v[0] = 1.0;
    for (int i = 1; i < n; ++i) v[i] = (x[i] / m) * scl;
    *beta = b * m;
}

// Standardize a real 2x2 Schur block (dlanv2 semantics):
// [a b; c d] -> G^T [a b; c d] G with G = [cs sn; -sn cs]; afterwards
// either c == 0 (real eigenvalues) or a == d and b*c < 0 (complex pair).
// Outputs overwrite a,b,c,d; eigenvalues in rt{1,2}{r,i}.
void lanv2(double* a, double* b, double* c, double* d,
           double* rt1r, double* rt1i, double* rt2r, double* rt2i,
           double* cs, double* sn) {
    if (*c == 0.0) {
        *cs = 1.0; *sn = 0.0;
    } else if (*b == 0.0) {
        // swap rows and columns
        *cs = 0.0; *sn = 1.0;
        double t = *d; *d = *a; *a = t;
        *b = -(*c); *c = 0.0;
    } else if ((*a - *d) == 0.0 && sign1(*b) != sign1(*c)) {
        *cs = 1.0; *sn = 0.0;
    } else {
        double temp = *a - *d;
        double p = 0.5 * temp;
        double bcmax = std::max(std::fabs(*b), std::fabs(*c));
        double bcmis = std::min(std::fabs(*b), std::fabs(*c)) *
                       sign1(*b) * sign1(*c);
        double scale = std::max(std::fabs(p), bcmax);
        double z = (p / scale) * p + (bcmax / scale) * bcmis;
        if (z >= 4.0 * EPS) {
            // real eigenvalues; compute a, d and the rotation
            z = p + sign1(p) * std::sqrt(scale) * std::sqrt(z);
            *a = *d + z;
            *d = *d - (bcmax / z) * bcmis;
            double tau = hypot2(*c, z);
            *cs = z / tau;
            *sn = *c / tau;
            *b = *b - *c;
            *c = 0.0;
        } else {
            // complex or nearly-equal real eigenvalues: rotate to equalize
            double sigma = *b + *c;
            double tau = hypot2(sigma, temp);
            *cs = std::sqrt(0.5 * (1.0 + std::fabs(sigma) / tau));
            *sn = -(p / (tau * *cs)) * sign1(sigma);
            // [aa bb; cc dd] = [a b; c d] G,  then G^T [..]
            double aa = *a * *cs + *b * *sn;
            double bb = -*a * *sn + *b * *cs;
            double cc = *c * *cs + *d * *sn;
            double dd = -*c * *sn + *d * *cs;
            double a1 = aa * *cs + cc * *sn;
            double b1 = bb * *cs + dd * *sn;
            double c1 = -aa * *sn + cc * *cs;
            double d1 = -bb * *sn + dd * *cs;
            double tmid = 0.5 * (a1 + d1);
            *a = tmid; *b = b1; *c = c1; *d = tmid;
            if (c1 != 0.0) {
                if (b1 != 0.0) {
                    if (sign1(b1) == sign1(c1)) {
                        // real almost-equal pair: split with a second rotation
                        double sab = std::sqrt(std::fabs(b1));
                        double sac = std::sqrt(std::fabs(c1));
                        double p1 = sign1(c1) * sab * sac;
                        double tau1 = 1.0 / std::sqrt(std::fabs(b1 + c1));
                        *a = tmid + p1;
                        *d = tmid - p1;
                        *b = b1 - c1;
                        *c = 0.0;
                        double cs1 = sab * tau1, sn1 = sac * tau1;
                        double csn = *cs * cs1 - *sn * sn1;
                        double snn = *cs * sn1 + *sn * cs1;
                        *cs = csn; *sn = snn;
                    }
                } else {
                    *b = -c1; *c = 0.0;
                    double csn = -*sn, snn = *cs;
                    *cs = csn; *sn = snn;
                }
            }
        }
    }
    *rt1r = *a; *rt2r = *d;
    if (*c == 0.0) {
        *rt1i = 0.0; *rt2i = 0.0;
    } else {
        double im = std::sqrt(std::fabs(*b)) * std::sqrt(std::fabs(*c));
        *rt1i = im; *rt2i = -im;
    }
}

// ---------------------------------------------------------------------------
// Francis double-shift QR on an upper-Hessenberg window (dlahqr semantics)
// ---------------------------------------------------------------------------

struct Mat {
    double* p;
    int ld;
    double& operator()(int i, int j) { return p[(size_t)i * ld + j]; }
    double operator()(int i, int j) const { return p[(size_t)i * ld + j]; }
};

// apply a 2- or 3-row reflector to H rows [k, k+nv) over cols [c0, c1)
inline void refl_rows(Mat H, int k, const double* v, double tau, int nv,
                      int c0, int c1) {
    if (tau == 0.0) return;
    for (int j = c0; j < c1; ++j) {
        double s = 0.0;
        for (int r = 0; r < nv; ++r) s += v[r] * H(k + r, j);
        s *= tau;
        for (int r = 0; r < nv; ++r) H(k + r, j) -= v[r] * s;
    }
}

// apply to H cols [k, k+nv) over rows [r0, r1)
inline void refl_cols(Mat H, int k, const double* v, double tau, int nv,
                      int r0, int r1) {
    if (tau == 0.0) return;
    for (int i = r0; i < r1; ++i) {
        double s = 0.0;
        for (int r = 0; r < nv; ++r) s += H(i, k + r) * v[r];
        s *= tau;
        for (int r = 0; r < nv; ++r) H(i, k + r) -= s * v[r];
    }
}

// rotate rows i,i+1 over cols [c0, c1): [r_i; r_{i+1}] <- G^T [..],
// G = [cs sn; -sn cs] acting as rows <- [cs*ri + sn*ri1; -sn*ri + cs*ri1]
inline void rot_rows(Mat H, int i, double cs, double sn, int c0, int c1) {
    for (int j = c0; j < c1; ++j) {
        double x = H(i, j), y = H(i + 1, j);
        H(i, j) = cs * x + sn * y;
        H(i + 1, j) = -sn * x + cs * y;
    }
}

inline void rot_cols(Mat H, int j, double cs, double sn, int r0, int r1) {
    for (int i = r0; i < r1; ++i) {
        double x = H(i, j), y = H(i, j + 1);
        H(i, j) = cs * x + sn * y;
        H(i, j + 1) = -sn * x + cs * y;
    }
}

// first column of (H-s1)(H-s2) at (k,k), scaled (dlaqr1 semantics)
inline void first_col(Mat H, int k, bool use3, double sr1, double si1,
                      double sr2, double si2, double* v) {
    double h11 = H(k, k), h12 = H(k, k + 1);
    double h21 = H(k + 1, k), h22 = H(k + 1, k + 1);
    if (use3) {
        double h13 = H(k, k + 2), h23 = H(k + 1, k + 2);
        double h31 = H(k + 2, k), h32 = H(k + 2, k + 1);
        double h33 = H(k + 2, k + 2);
        double s = std::fabs(h11 - sr2) + std::fabs(si2) + std::fabs(h21) +
                   std::fabs(h31);
        if (s == 0.0) { v[0] = v[1] = v[2] = 0.0; return; }
        double h21s = h21 / s, h31s = h31 / s;
        v[0] = (h11 - sr1) * ((h11 - sr2) / s) - si1 * (si2 / s) +
               h12 * h21s + h13 * h31s;
        v[1] = h21s * (h11 + h22 - sr1 - sr2) + h23 * h31s;
        v[2] = h31s * (h11 + h33 - sr1 - sr2) + h21s * h32;
    } else {
        double s = std::fabs(h11 - sr2) + std::fabs(si2) + std::fabs(h21);
        if (s == 0.0) { v[0] = v[1] = v[2] = 0.0; return; }
        double h21s = h21 / s;
        v[0] = h21s * h12 + (h11 - sr1) * ((h11 - sr2) / s) -
               si1 * (si2 / s);
        v[1] = h21s * (h11 + h22 - sr1 - sr2);
        v[2] = 0.0;
    }
}

// Schur-reduce the active block [ilo, ihi) of the w x w Hessenberg H,
// accumulating transforms into Z (zr x w, Z := Z Q).  thresh is the
// absolute deflation floor (norm-stable u*||A|| in the driver).
// Deflated 2x2 blocks are standardized.  Returns 0 on success, else
// (failing index + 1).
int hseqr_impl(int w, Mat H, Mat Z, int zr, int ilo, int ihi, double thresh) {
    const int ITMAX = 30;
    int i = ihi - 1;
    while (i >= ilo) {
        int its = 0;
        for (; its <= ITMAX; ++its) {
            // find deflation point: largest l in (ilo, i] with negligible
            // subdiagonal
            int l = ilo;
            for (int k = i; k > ilo; --k) {
                double tst = std::fabs(H(k - 1, k - 1)) + std::fabs(H(k, k));
                if (std::fabs(H(k, k - 1)) <=
                    std::max(EPS * tst, thresh)) {
                    H(k, k - 1) = 0.0;
                    l = k;
                    break;
                }
            }
            if (l == i) {            // 1x1 converged
                i -= 1;
                break;
            }
            if (l == i - 1) {        // 2x2 converged: standardize
                double a = H(i - 1, i - 1), b = H(i - 1, i);
                double c = H(i, i - 1), d = H(i, i);
                double r1r, r1i, r2r, r2i, cs, sn;
                lanv2(&a, &b, &c, &d, &r1r, &r1i, &r2r, &r2i, &cs, &sn);
                rot_rows(H, i - 1, cs, sn, i - 1, w);
                rot_cols(H, i - 1, cs, sn, 0, i + 1);
                rot_cols(Z, i - 1, cs, sn, 0, zr);
                H(i - 1, i - 1) = a; H(i - 1, i) = b;
                H(i, i - 1) = c; H(i, i) = d;
                i -= 2;
                break;
            }
            if (its == ITMAX) return i + 1;   // no convergence

            // Wilkinson double shift from trailing 2x2 (exceptional every 10)
            double sr1, si1, sr2, si2;
            if (its > 0 && its % 10 == 0) {
                double s = std::fabs(H(i, i - 1)) +
                           std::fabs(H(i - 1, i >= 2 ? i - 2 : 0));
                double aa = 0.75 * s + H(i, i);
                double bb = -0.4375 * s, cc = s, dd = aa;
                double p = 0.5 * (aa - dd);
                double bc = bb * cc;
                double disc = p * p + bc;
                if (disc >= 0) {
                    double sq = std::sqrt(disc);
                    sr1 = dd + p + sign1(p) * sq; si1 = 0.0;
                    sr2 = sr1; si2 = 0.0;
                } else {
                    double sq = std::sqrt(-disc);
                    sr1 = 0.5 * (aa + dd); si1 = sq;
                    sr2 = sr1; si2 = -sq;
                }
            } else {
                double aa = H(i - 1, i - 1), bb = H(i - 1, i);
                double cc = H(i, i - 1), dd = H(i, i);
                double sc = std::fabs(aa) + std::fabs(bb) + std::fabs(cc) +
                            std::fabs(dd);
                if (sc == 0.0) sc = 1.0;
                double a = aa / sc, b = bb / sc, c = cc / sc, d = dd / sc;
                double p = 0.5 * (a - d);
                double bc = b * c;
                double disc = p * p + bc;
                if (disc >= 0) {
                    double z = p + sign1(p) * std::sqrt(disc);
                    double l1 = d + z;
                    double l2 = (z == 0.0) ? d : d - bc / z;
                    // use the eigenvalue closer to h22, twice
                    double hh = d;
                    double s1 = (std::fabs(hh - l1) <= std::fabs(hh - l2))
                                ? l1 : l2;
                    sr1 = s1 * sc; si1 = 0.0; sr2 = sr1; si2 = 0.0;
                } else {
                    double sq = std::sqrt(-disc);
                    sr1 = 0.5 * (a + d) * sc; si1 = sq * sc;
                    sr2 = sr1; si2 = -si1;
                }
            }

            // double-shift sweep over [l, i]
            for (int k = l; k <= i - 1; ++k) {
                bool use3 = k <= i - 2;
                int nv = use3 ? 3 : 2;
                double x[3], v[3], tau, beta;
                if (k == l) {
                    first_col(H, k, use3, sr1, si1, sr2, si2, x);
                } else {
                    x[0] = H(k, k - 1); x[1] = H(k + 1, k - 1);
                    x[2] = use3 ? H(k + 2, k - 1) : 0.0;
                }
                reflector(x, nv, v, &tau, &beta);
                refl_rows(H, k, v, tau, nv, (k > l ? k - 1 : l), w);
                if (k > l) {
                    H(k, k - 1) = beta;
                    H(k + 1, k - 1) = 0.0;
                    if (use3) H(k + 2, k - 1) = 0.0;
                }
                refl_cols(H, k, v, tau, nv, 0, std::min(k + nv + 1, i + 1));
                refl_cols(Z, k, v, tau, nv, 0, zr);
            }
        }
    }
    return 0;
}

// extract eigenvalues from a standardized quasi-triangular diagonal
void extract_eigs(Mat T, int n, double* er, double* ei) {
    int k = 0;
    while (k < n) {
        if (k + 1 < n && T(k + 1, k) != 0.0) {
            double a = T(k, k), b = T(k, k + 1);
            double c = T(k + 1, k), d = T(k + 1, k + 1);
            double im = std::sqrt(std::fabs(b)) * std::sqrt(std::fabs(c));
            double re = 0.5 * (a + d);
            er[k] = re; ei[k] = im;
            er[k + 1] = re; ei[k + 1] = -im;
            k += 2;
        } else {
            er[k] = T(k, k); ei[k] = 0.0;
            k += 1;
        }
    }
}

// ---------------------------------------------------------------------------
// direct adjacent-block swap (dlaexc semantics)
// ---------------------------------------------------------------------------

// Solve the (p*q) x (p*q) Kronecker system for T11 X - X T22 = -T12
// (sizes <= 2).  Gaussian elimination with partial pivoting on <=4x4.
bool solve_sylv(const double T11[2][2], const double T22[2][2],
                const double T12[2][2], int p, int q, double X[2][2]) {
    int n = p * q;
    double A[4][5];
    // unknown index u = j*p + i  (i < p, j < q)
    for (int j = 0; j < q; ++j)
        for (int i = 0; i < p; ++i) {
            int r = j * p + i;
            for (int c = 0; c < 4; ++c) A[r][c] = 0.0;
            for (int i2 = 0; i2 < p; ++i2) A[r][j * p + i2] += T11[i][i2];
            for (int j2 = 0; j2 < q; ++j2) A[r][j2 * p + i] -= T22[j2][j];
            A[r][4] = -T12[i][j];
        }
    for (int k = 0; k < n; ++k) {
        int piv = k;
        for (int r = k + 1; r < n; ++r)
            if (std::fabs(A[r][k]) > std::fabs(A[piv][k])) piv = r;
        if (piv != k)
            for (int c = 0; c <= 4; ++c) std::swap(A[k][c], A[piv][c]);
        if (A[k][k] == 0.0) return false;
        for (int r = 0; r < n; ++r) {
            if (r == k) continue;
            double f = A[r][k] / A[k][k];
            if (f == 0.0) continue;
            for (int c = k; c <= 4; ++c) A[r][c] -= f * A[k][c];
        }
    }
    for (int j = 0; j < q; ++j)
        for (int i = 0; i < p; ++i) {
            int r = j * p + i;
            X[i][j] = A[r][4] / A[r][r];
        }
    return true;
}

// Swap adjacent diagonal blocks of sizes (p, q) at position a of the w x w
// quasi-triangular T; accumulate into Z (zr rows).  Returns true if the
// swap was performed (false = numerically rejected, matrix untouched).
bool swap_blocks(Mat T, Mat Z, int zr, int w, int a, int p, int q) {
    int d = p + q;
    double D[4][4];
    for (int i = 0; i < d; ++i)
        for (int j = 0; j < d; ++j) D[i][j] = T(a + i, a + j);

    double Q[4][4];
    for (int i = 0; i < d; ++i)
        for (int j = 0; j < d; ++j) Q[i][j] = (i == j) ? 1.0 : 0.0;

    if (p == 1 && q == 1) {
        double cs, sn, r;
        rotg(D[0][1], D[1][1] - D[0][0], &cs, &sn, &r);
        Q[0][0] = cs; Q[1][0] = sn; Q[0][1] = -sn; Q[1][1] = cs;
        // Dh = Q^T D Q with exact swapped diagonal
        double t00 = D[0][0], t11 = D[1][1];
        double d01 = -sn * (cs * D[0][0] + sn * D[0][1]) +
                     cs * (cs * D[0][1] + sn * D[1][1]);
        // recompute exactly: rows then cols
        double R[2][2];
        R[0][0] = cs * D[0][0] + sn * D[1][0];
        R[0][1] = cs * D[0][1] + sn * D[1][1];
        R[1][0] = -sn * D[0][0] + cs * D[1][0];
        R[1][1] = -sn * D[0][1] + cs * D[1][1];
        D[0][0] = R[0][0] * cs + R[0][1] * sn;
        D[0][1] = -R[0][0] * sn + R[0][1] * cs;
        D[1][0] = 0.0;
        D[1][1] = -R[1][0] * sn + R[1][1] * cs;
        D[0][0] = t11; D[1][1] = t00;
        (void)d01;
    } else {
        double T11[2][2] = {{0, 0}, {0, 0}};
        double T22[2][2] = {{0, 0}, {0, 0}};
        double T12[2][2] = {{0, 0}, {0, 0}};
        for (int i = 0; i < p; ++i)
            for (int j = 0; j < p; ++j) T11[i][j] = D[i][j];
        for (int i = 0; i < q; ++i)
            for (int j = 0; j < q; ++j) T22[i][j] = D[p + i][p + j];
        for (int i = 0; i < p; ++i)
            for (int j = 0; j < q; ++j) T12[i][j] = D[i][p + j];
        double X[2][2];
        if (!solve_sylv(T11, T22, T12, p, q, X)) return false;

        // M = [X; I_q] (d x q); orthogonalize with q Householder reflectors
        double M[4][2] = {{0, 0}, {0, 0}, {0, 0}, {0, 0}};
        for (int i = 0; i < p; ++i)
            for (int j = 0; j < q; ++j) M[i][j] = X[i][j];
        for (int j = 0; j < q; ++j) M[p + j][j] = 1.0;

        for (int col = 0; col < q; ++col) {
            double x[4], v[4], tau, beta;
            int nn = d - col;
            for (int r = 0; r < nn; ++r) x[r] = M[col + r][col];
            reflector(x, nn, v, &tau, &beta);
            // apply to M
            for (int j = col; j < q; ++j) {
                double s = 0.0;
                for (int r = 0; r < nn; ++r) s += v[r] * M[col + r][j];
                s *= tau;
                for (int r = 0; r < nn; ++r) M[col + r][j] -= v[r] * s;
            }
            // accumulate into Q: Q <- Q * (I - tau v v^T) embedded at col
            for (int i = 0; i < d; ++i) {
                double s = 0.0;
                for (int r = 0; r < nn; ++r) s += Q[i][col + r] * v[r];
                s *= tau;
                for (int r = 0; r < nn; ++r) Q[i][col + r] -= s * v[r];
            }
        }

        // Dh = Q^T D Q
        double R[4][4], Dh[4][4];
        for (int i = 0; i < d; ++i)
            for (int j = 0; j < d; ++j) {
                double s = 0.0;
                for (int k = 0; k < d; ++k) s += Q[k][i] * D[k][j];
                R[i][j] = s;
            }
        for (int i = 0; i < d; ++i)
            for (int j = 0; j < d; ++j) {
                double s = 0.0;
                for (int k = 0; k < d; ++k) s += R[i][k] * Q[k][j];
                Dh[i][j] = s;
            }
        // acceptance: (2,1) block must be negligible
        double dnorm = 0.0, err = 0.0;
        for (int i = 0; i < d; ++i)
            for (int j = 0; j < d; ++j) dnorm = std::max(dnorm,
                                                         std::fabs(D[i][j]));
        for (int i = q; i < d; ++i)
            for (int j = 0; j < q; ++j) err = std::max(err,
                                                       std::fabs(Dh[i][j]));
        if (err > std::max(10.0 * EPS * dnorm, TINY)) return false;
        for (int i = 0; i < d; ++i)
            for (int j = 0; j < d; ++j) D[i][j] = Dh[i][j];
        for (int i = q; i < d; ++i)
            for (int j = 0; j < q; ++j) D[i][j] = 0.0;
    }

    // standardize the two new blocks (upper size q at 0, lower size p at q)
    auto standardize_at = [&](int off) {
        double a = D[off][off], b = D[off][off + 1];
        double c = D[off + 1][off], dd = D[off + 1][off + 1];
        double r1r, r1i, r2r, r2i, cs, sn;
        lanv2(&a, &b, &c, &dd, &r1r, &r1i, &r2r, &r2i, &cs, &sn);
        // rows of D
        for (int j = 0; j < 4; ++j) {
            double x = D[off][j], y = D[off + 1][j];
            D[off][j] = cs * x + sn * y;
            D[off + 1][j] = -sn * x + cs * y;
        }
        for (int i = 0; i < 4; ++i) {
            double x = D[i][off], y = D[i][off + 1];
            D[i][off] = cs * x + sn * y;
            D[i][off + 1] = -sn * x + cs * y;
        }
        D[off][off] = a; D[off][off + 1] = b;
        D[off + 1][off] = c; D[off + 1][off + 1] = dd;
        // Q <- Q G
        for (int i = 0; i < 4; ++i) {
            double x = Q[i][off], y = Q[i][off + 1];
            Q[i][off] = cs * x + sn * y;
            Q[i][off + 1] = -sn * x + cs * y;
        }
    };
    if (q == 2) standardize_at(0);
    if (p == 2) standardize_at(q);

    // apply to the full matrix: rows a..a+d over cols [a, w) handled via
    // the exact block; off-block cols [a+d, w) and rows [0, a) via Q.
    // rows: T[a:a+d, :] <- Q^T T[a:a+d, :]
    for (int j = 0; j < w; ++j) {
        double col[4];
        for (int i = 0; i < d; ++i) col[i] = T(a + i, j);
        for (int i = 0; i < d; ++i) {
            double s = 0.0;
            for (int k = 0; k < d; ++k) s += Q[k][i] * col[k];
            T(a + i, j) = s;
        }
    }
    // cols: T[:, a:a+d] <- T[:, a:a+d] Q
    for (int i = 0; i < w; ++i) {
        double row[4];
        for (int j = 0; j < d; ++j) row[j] = T(i, a + j);
        for (int j = 0; j < d; ++j) {
            double s = 0.0;
            for (int k = 0; k < d; ++k) s += row[k] * Q[k][j];
            T(i, a + j) = s;
        }
    }
    // plant the exact swapped block
    for (int i = 0; i < d; ++i)
        for (int j = 0; j < d; ++j) T(a + i, a + j) = D[i][j];
    // Z cols
    for (int i = 0; i < zr; ++i) {
        double row[4];
        for (int j = 0; j < d; ++j) row[j] = Z(i, a + j);
        for (int j = 0; j < d; ++j) {
            double s = 0.0;
            for (int k = 0; k < d; ++k) s += row[k] * Q[k][j];
            Z(i, a + j) = s;
        }
    }
    return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// exported codelets
// ---------------------------------------------------------------------------

extern "C" {

// Schur reduction of the Hessenberg window: H (w x w, row-major) in
// Hessenberg form on [ilo, ihi); Z (zr x w) accumulates on the right.
// Returns 0 or failing-index+1.
int sn_hseqr(int w, double* Hp, double* Zp, int zr, int ilo, int ihi,
             double thresh) {
    Mat H{Hp, w}, Z{Zp, w};
    return hseqr_impl(w, H, Z, zr, ilo, ihi, thresh);
}

// Eigenvalues of a standardized quasi-triangular matrix.
void sn_eigvals(int w, const double* Tp, double* er, double* ei) {
    Mat T{const_cast<double*>(Tp), w};
    extract_eigs(T, w, er, ei);
}

// Adjacent-swap based reordering: move all selected eigenvalues to the top
// of the w x w quasi-triangular T, accumulating into Z (zr x w).
// select[i] in {0,1} per column; updated in place to the post-reorder
// selection (failed swaps leave eigenvalues in place -> partial
// reordering, reference error.h:114-119).  Returns number of failed swaps.
int sn_reorder(int w, double* Tp, double* Zp, int zr, unsigned char* select) {
    Mat T{Tp, w}, Z{Zp, w};
    // cursel moves with the swaps so the returned selection always reflects
    // where selected eigenvalues actually ended up (partial-reordering
    // semantics on failed swaps, reference error.h:114-119)
    unsigned char* cursel = new unsigned char[w];
    std::memcpy(cursel, select, (size_t)w);
    // a block is selected if any of its rows is flagged; make flags uniform
    for (int k = 0; k < w;) {
        int bs = (k + 1 < w && T(k + 1, k) != 0.0) ? 2 : 1;
        unsigned char any = 0;
        for (int j = 0; j < bs; ++j) any |= cursel[k + j];
        for (int j = 0; j < bs; ++j) cursel[k + j] = any;
        k += bs;
    }
    int fails = 0;
    int ilst = 0;   // next insertion point
    int k = 0;
    while (k < w) {
        int bs = (k + 1 < w && T(k + 1, k) != 0.0) ? 2 : 1;
        if (!cursel[k] || k == ilst) {
            if (cursel[k] && k == ilst) ilst += bs;
            k += bs;
            continue;
        }
        int src = k;
        bool ok = true;
        while (src > ilst) {
            int p = 1;
            if (src >= 2 && T(src - 1, src - 2) != 0.0) p = 2;
            int a = src - p;
            if (!swap_blocks(T, Z, zr, w, a, p, bs)) { ok = false; break; }
            // flags move with the blocks: [a,a+p) <-> [a+p,a+p+bs)
            unsigned char fa = cursel[a];
            for (int j = 0; j < bs; ++j) cursel[a + j] = cursel[a + p + j];
            for (int j = 0; j < p; ++j) cursel[a + bs + j] = fa;
            src = a;
        }
        if (!ok) ++fails;
        else ilst += bs;
        // the scan continues after the block's original extent: content at
        // [k+bs, w) is untouched by the upward move
        k += bs;
    }
    std::memcpy(select, cursel, (size_t)w);
    delete[] cursel;
    return fails;
}

// Full AED codelet (reference: perform_aggressively_deflate,
// cpu_utils.c:2837): H = w x w Hessenberg window (its bottom-right corner
// is the segment bottom), Z = w x w identity on input, s = spike coupling
// H[kwtop, kwtop-1] from the parent matrix, thresh = deflation floor.
// On return: H holds the processed window (leading kbot x kbot Hessenberg
// with spike condensed, trailing deflated quasi-triangular), Z the window
// transform; kbot_out = undeflated size; sr/si (size w) the shift
// candidates from the undeflated Schur diagonal (nshifts of them);
// beta_out = new spike head (plant at window column -1).
// Returns 0 on success, >0 = QR failure index + 1.
int sn_aed(int w, double* Hp, double* Zp, double s, double thresh,
           int* kbot_out, double* sr, double* si, int* nshifts,
           double* beta_out) {
    Mat H{Hp, w}, Z{Zp, w};
    int info = hseqr_impl(w, H, Z, w, 0, w, thresh);
    if (info != 0) return info;

    // bottom-up spike deflation with block moves
    int kbot = w;
    int ilst = 0;
    while (kbot > ilst) {
        int sz = (kbot >= 2 && H(kbot - 1, kbot - 2) != 0.0) ? 2 : 1;
        int start = kbot - sz;
        double sp0 = std::fabs(s * Z(0, start));
        double sp1 = (sz == 2) ? std::fabs(s * Z(0, kbot - 1)) : 0.0;
        double foot = std::max(sp0, sp1);
        double tst = std::fabs(H(start, start)) +
                     (sz == 2 ? std::fabs(H(kbot - 1, kbot - 1)) : 0.0);
        if (foot <= std::max(EPS * tst, thresh)) {
            kbot = start;            // deflatable: leave at the bottom
            continue;
        }
        if (start == ilst) {         // already at the front
            ilst += sz;
            continue;
        }
        // move the undeflatable block up to ilst
        int src = start;
        bool ok = true;
        while (src > ilst) {
            int p = 1;
            if (src >= 2 && H(src - 1, src - 2) != 0.0) p = 2;
            int a = src - p;
            if (!swap_blocks(H, Z, w, w, a, p, sz)) { ok = false; break; }
            src = a;
        }
        if (!ok) break;              // stuck: stop deflating (still valid)
        ilst += sz;
    }
    *kbot_out = kbot;

    // shifts from the undeflated quasi-triangular diagonal (before
    // recondensation destroys it)
    if (kbot > 0) {
        extract_eigs(H, kbot, sr, si);
        *nshifts = kbot;
    } else {
        *nshifts = 0;
    }

    double beta = 0.0;
    if (kbot > 0) {
        // spike reflector: maps s * Z[0, 0:kbot] to beta e1
        double* spike = new double[kbot];
        for (int j = 0; j < kbot; ++j) spike[j] = s * Z(0, j);
        double* v = new double[kbot];
        double tau;
        reflector(spike, kbot, v, &tau, &beta);
        // H <- (I-tau v v^T) H (I-tau v v^T) on the leading kbot rows/cols
        // (v supported on [0, kbot))
        if (tau != 0.0) {
            for (int j = 0; j < w; ++j) {       // rows
                double acc = 0.0;
                for (int r = 0; r < kbot; ++r) acc += v[r] * H(r, j);
                acc *= tau;
                for (int r = 0; r < kbot; ++r) H(r, j) -= v[r] * acc;
            }
            for (int i = 0; i < w; ++i) {       // cols
                double acc = 0.0;
                for (int r = 0; r < kbot; ++r) acc += H(i, r) * v[r];
                acc *= tau;
                for (int r = 0; r < kbot; ++r) H(i, r) -= acc * v[r];
            }
            for (int i = 0; i < w; ++i) {       // Z cols
                double acc = 0.0;
                for (int r = 0; r < kbot; ++r) acc += Z(i, r) * v[r];
                acc *= tau;
                for (int r = 0; r < kbot; ++r) Z(i, r) -= acc * v[r];
            }
        }
        delete[] v;
        delete[] spike;

        // Hessenberg reduction of the leading kbot x kbot block
        for (int j = 0; j + 2 < kbot; ++j) {
            int n = kbot - j - 1;
            double* x = new double[n];
            for (int r = 0; r < n; ++r) x[r] = H(j + 1 + r, j);
            double* vv = new double[n];
            double tau2, b2;
            reflector(x, n, vv, &tau2, &b2);
            if (tau2 != 0.0) {
                for (int jj = 0; jj < w; ++jj) {
                    double acc = 0.0;
                    for (int r = 0; r < n; ++r) acc += vv[r] * H(j + 1 + r, jj);
                    acc *= tau2;
                    for (int r = 0; r < n; ++r) H(j + 1 + r, jj) -= vv[r] * acc;
                }
                for (int i = 0; i < w; ++i) {
                    double acc = 0.0;
                    for (int r = 0; r < n; ++r) acc += H(i, j + 1 + r) * vv[r];
                    acc *= tau2;
                    for (int r = 0; r < n; ++r) H(i, j + 1 + r) -= acc * vv[r];
                }
                for (int i = 0; i < w; ++i) {
                    double acc = 0.0;
                    for (int r = 0; r < n; ++r) acc += Z(i, j + 1 + r) * vv[r];
                    acc *= tau2;
                    for (int r = 0; r < n; ++r) Z(i, j + 1 + r) -= acc * vv[r];
                }
            }
            H(j + 1, j) = b2;
            for (int r = 2; r <= n; ++r) H(j + r, j) = 0.0;
            delete[] vv;
            delete[] x;
        }
    }
    *beta_out = beta;
    return 0;
}

}  // extern "C"
