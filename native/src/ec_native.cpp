// Native CPU runtime for tpu_ec: Montgomery fields, Jacobian EC, NTT,
// Pippenger MSM, EC-FFT.
//
// This is the C++ counterpart of the reference's native CPU stack:
//   - field arithmetic    <- generated CUDA field.cl / arkworks host ops
//   - serial/parallel NTT <- ec-gpu-proxy/src/fft_cpu.rs:10-111
//   - EC-group FFT        <- ec-gpu-proxy/src/ec_fft_cpu.rs:12-118
//   - Pippenger MSM       <- ec-gpu-proxy/src/multiexp_cpu.rs:244-339
//   - threadpool          <- ec-gpu-proxy/src/threadpool.rs (here: std::thread
//                            fork-join; thread count via TPU_EC_NUM_THREADS)
//
// It serves three roles in the TPU-native framework:
//   1. CPU fallback path (the reference ships CPU impls next to GPU ones),
//   2. fast differential-test oracle (replaces Python bigint loops),
//   3. host-side marshalling helpers (to_gpu_repr-scale conversions).
//
// Layout contract (C ABI): every field element is `n64` little-endian u64
// words, in Montgomery form (a*R mod p, R = 2^(64*n64)) unless a function
// says "plain".  Fp2 elements are (c0, c1) concatenated.  A Jacobian point
// is (X, Y, Z) concatenated (Z = 0 encodes identity); affine is (X, Y) with
// (0, 0) as identity (GpuRepr convention, ag-types/src/impls.rs:48-58).
// Scalars are always 4 u64 words, plain (non-Montgomery) integers.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread ec_native.cpp

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <functional>
#include <thread>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

// ---------------------------------------------------------------------------
// Fork-join parallel_for (threadpool.rs analog; TPU_EC_NUM_THREADS parity
// with EC_GPU_NUM_THREADS, threadpool.rs:25-30)
// ---------------------------------------------------------------------------

static int default_threads() {
  const char* env = std::getenv("TPU_EC_NUM_THREADS");
  if (env && *env) {
    int v = std::atoi(env);
    if (v > 0) return v;
  }
  unsigned hc = std::thread::hardware_concurrency();
  return hc ? (int)hc : 1;
}

static void parallel_for(long n, int nthreads,
                         const std::function<void(long, long)>& body) {
  if (nthreads <= 0) nthreads = default_threads();
  if (nthreads > n) nthreads = (int)(n > 0 ? n : 1);
  if (nthreads <= 1) {
    body(0, n);
    return;
  }
  std::vector<std::thread> ts;
  long chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    long lo = t * chunk, hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    ts.emplace_back([&body, lo, hi] { body(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------------
// Montgomery prime field, N u64 limbs (CIOS multiply).  Runtime constants
// (p, inv = -p^-1 mod 2^64, r2 = R^2 mod p) are computed in ecn_field_new —
// the same derivation the reference does at build time
// (ag-build/src/source/limb.rs:65-72 calc_inv Newton iteration).
// ---------------------------------------------------------------------------

template <int N>
struct FpCtx {
  u64 p[N];
  u64 inv;      // -p^-1 mod 2^64
  u64 r2[N];    // R^2 mod p (Montgomery form of R)
  u64 one[N];   // R mod p (Montgomery form of 1)
};

template <int N>
static inline bool fp_gte(const u64* a, const u64* b) {
  for (int i = N - 1; i >= 0; --i) {
    if (a[i] > b[i]) return true;
    if (a[i] < b[i]) return false;
  }
  return true;  // equal
}

template <int N>
static inline void fp_sub_raw(const u64* a, const u64* b, u64* out) {
  u128 borrow = 0;
  for (int i = 0; i < N; ++i) {
    u128 t = (u128)a[i] - b[i] - borrow;
    out[i] = (u64)t;
    borrow = (t >> 64) ? 1 : 0;
  }
}

template <int N>
static inline u64 fp_add_raw(const u64* a, const u64* b, u64* out) {
  u128 carry = 0;
  for (int i = 0; i < N; ++i) {
    u128 t = (u128)a[i] + b[i] + carry;
    out[i] = (u64)t;
    carry = t >> 64;
  }
  return (u64)carry;
}

template <int N>
static inline void fp_add(const FpCtx<N>& c, const u64* a, const u64* b, u64* out) {
  u64 t[N];
  u64 carry = fp_add_raw<N>(a, b, t);
  if (carry || fp_gte<N>(t, c.p)) fp_sub_raw<N>(t, c.p, out);
  else std::memcpy(out, t, sizeof(t));
}

template <int N>
static inline void fp_sub(const FpCtx<N>& c, const u64* a, const u64* b, u64* out) {
  if (fp_gte<N>(a, b)) {
    fp_sub_raw<N>(a, b, out);
  } else {
    // (a + p) - b with the one-bit intermediate carry folded into the chain
    // (a + p may exceed 2^(64N); the final result is < p so it fits).
    u128 borrow = 0;
    u128 carry = 0;
    for (int i = 0; i < N; ++i) {
      u128 s = (u128)a[i] + c.p[i] + carry;
      carry = s >> 64;
      u128 d = (u128)(u64)s - b[i] - borrow;
      out[i] = (u64)d;
      borrow = (d >> 64) ? 1 : 0;
    }
  }
}

template <int N>
static inline bool fp_is_zero(const u64* a) {
  for (int i = 0; i < N; ++i)
    if (a[i]) return false;
  return true;
}

template <int N>
static inline void fp_neg(const FpCtx<N>& c, const u64* a, u64* out) {
  if (fp_is_zero<N>(a)) { std::memcpy(out, a, N * 8); return; }
  fp_sub_raw<N>(c.p, a, out);
}

// CIOS Montgomery multiply (Koc/Acar): t has N+2 words; works for any
// p < 2^(64N).  This is the host-precision analog of the generated
// FIELD_mul_default (ag-build/cl/field.cl:268-299).
template <int N>
static inline void fp_mul(const FpCtx<N>& c, const u64* a, const u64* b, u64* out) {
  u64 t[N + 2];
  std::memset(t, 0, sizeof(t));
  for (int i = 0; i < N; ++i) {
    // t += a[i] * b
    u128 carry = 0;
    for (int j = 0; j < N; ++j) {
      u128 s = (u128)a[i] * b[j] + t[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[N] + carry;
    t[N] = (u64)s;
    t[N + 1] = (u64)(s >> 64);
    // m = t[0] * inv mod 2^64;  t = (t + m*p) / 2^64
    u64 m = t[0] * c.inv;
    carry = ((u128)m * c.p[0] + t[0]) >> 64;
    for (int j = 1; j < N; ++j) {
      u128 s2 = (u128)m * c.p[j] + t[j] + carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[N] + carry;
    t[N - 1] = (u64)s;
    t[N] = t[N + 1] + (u64)(s >> 64);
    t[N + 1] = 0;
  }
  if (t[N] || fp_gte<N>(t, c.p)) fp_sub_raw<N>(t, c.p, out);
  else std::memcpy(out, t, N * 8);
}

template <int N>
static inline void fp_sqr(const FpCtx<N>& c, const u64* a, u64* out) {
  fp_mul<N>(c, a, a, out);
}

template <int N>
static inline void fp_from_mont(const FpCtx<N>& c, const u64* a, u64* out) {
  u64 one[N] = {1};
  fp_mul<N>(c, a, one, out);
}

template <int N>
static inline void fp_to_mont(const FpCtx<N>& c, const u64* a, u64* out) {
  fp_mul<N>(c, a, c.r2, out);
}

// exponent is nbits of `e` (little-endian words), base in Montgomery form
template <int N>
static inline void fp_pow(const FpCtx<N>& c, const u64* base, const u64* e,
                          int ewords, u64* out) {
  u64 acc[N];
  std::memcpy(acc, c.one, N * 8);
  for (int i = ewords * 64 - 1; i >= 0; --i) {
    fp_sqr<N>(c, acc, acc);
    if ((e[i / 64] >> (i % 64)) & 1) fp_mul<N>(c, acc, base, acc);
  }
  std::memcpy(out, acc, N * 8);
}

template <int N>
static inline void fp_inv(const FpCtx<N>& c, const u64* a, u64* out) {
  u64 pm2[N];
  std::memcpy(pm2, c.p, N * 8);
  // p - 2 (p is odd and > 2, so no borrow past word 0 unless p[0] < 2)
  u128 borrow = 2;
  for (int i = 0; i < N && borrow; ++i) {
    u128 t = (u128)pm2[i] - borrow;
    pm2[i] = (u64)t;
    borrow = (t >> 64) ? 1 : 0;
  }
  fp_pow<N>(c, a, pm2, N, out);
}

// ---------------------------------------------------------------------------
// Field-ops policies so EC code is generic over Fq vs Fq2, exactly like the
// generated ec.cl template is generic over BASE (ag-build/cl/ec.cl:5-14,
// ag-build/src/source/builder.rs:66-72).  W = u64 words per element.
// ---------------------------------------------------------------------------

template <int N>
struct F1 {
  static const int W = N;
  const FpCtx<N>* c;
  void add(const u64* a, const u64* b, u64* o) const { fp_add<N>(*c, a, b, o); }
  void sub(const u64* a, const u64* b, u64* o) const { fp_sub<N>(*c, a, b, o); }
  void mul(const u64* a, const u64* b, u64* o) const { fp_mul<N>(*c, a, b, o); }
  void sqr(const u64* a, u64* o) const { fp_sqr<N>(*c, a, o); }
  void neg(const u64* a, u64* o) const { fp_neg<N>(*c, a, o); }
  void inv(const u64* a, u64* o) const { fp_inv<N>(*c, a, o); }
  bool is_zero(const u64* a) const { return fp_is_zero<N>(a); }
  void dbl(const u64* a, u64* o) const { fp_add<N>(*c, a, a, o); }
  void set_zero(u64* o) const { std::memset(o, 0, W * 8); }
  void copy(const u64* a, u64* o) const { if (o != a) std::memcpy(o, a, W * 8); }
  void one(u64* o) const { std::memcpy(o, c->one, W * 8); }
};

// Fp2 = Fp[u]/(u^2 + 1) — Karatsuba mul / (a0+a1)(a0-a1) squaring
// (ag-build/cl/field2.cl:37-61 parity).
template <int N>
struct F2 {
  static const int W = 2 * N;
  const FpCtx<N>* c;
  void add(const u64* a, const u64* b, u64* o) const {
    fp_add<N>(*c, a, b, o);
    fp_add<N>(*c, a + N, b + N, o + N);
  }
  void sub(const u64* a, const u64* b, u64* o) const {
    fp_sub<N>(*c, a, b, o);
    fp_sub<N>(*c, a + N, b + N, o + N);
  }
  void mul(const u64* a, const u64* b, u64* o) const {
    u64 aa[N], bb[N], ab_ba[N], t0[N], t1[N];
    fp_mul<N>(*c, a, b, aa);           // a0*b0
    fp_mul<N>(*c, a + N, b + N, bb);   // a1*b1
    fp_add<N>(*c, a, a + N, t0);       // a0+a1
    fp_add<N>(*c, b, b + N, t1);       // b0+b1
    fp_mul<N>(*c, t0, t1, ab_ba);      // (a0+a1)(b0+b1)
    fp_sub<N>(*c, ab_ba, aa, ab_ba);
    fp_sub<N>(*c, ab_ba, bb, o + N);   // c1 = a0b1 + a1b0
    fp_sub<N>(*c, aa, bb, o);          // c0 = a0b0 - a1b1
  }
  void sqr(const u64* a, u64* o) const {
    u64 s[N], d[N], c1[N];
    fp_add<N>(*c, a, a + N, s);
    fp_sub<N>(*c, a, a + N, d);
    fp_mul<N>(*c, a, a + N, c1);
    fp_mul<N>(*c, s, d, o);            // c0 = (a0+a1)(a0-a1)
    fp_add<N>(*c, c1, c1, o + N);      // c1 = 2 a0 a1
  }
  void neg(const u64* a, u64* o) const {
    fp_neg<N>(*c, a, o);
    fp_neg<N>(*c, a + N, o + N);
  }
  void inv(const u64* a, u64* o) const {
    // (a0 - a1 u)/(a0^2 + a1^2)
    u64 n0[N], n1[N], nrm[N], ninv[N];
    fp_sqr<N>(*c, a, n0);
    fp_sqr<N>(*c, a + N, n1);
    fp_add<N>(*c, n0, n1, nrm);
    fp_inv<N>(*c, nrm, ninv);
    fp_mul<N>(*c, a, ninv, o);
    u64 negninv[N];
    fp_neg<N>(*c, ninv, negninv);
    fp_mul<N>(*c, a + N, negninv, o + N);
  }
  bool is_zero(const u64* a) const {
    return fp_is_zero<N>(a) && fp_is_zero<N>(a + N);
  }
  void dbl(const u64* a, u64* o) const { add(a, a, o); }
  void set_zero(u64* o) const { std::memset(o, 0, W * 8); }
  void copy(const u64* a, u64* o) const { if (o != a) std::memcpy(o, a, W * 8); }
  void one(u64* o) const {
    std::memcpy(o, c->one, N * 8);
    std::memset(o + N, 0, N * 8);
  }
};

// ---------------------------------------------------------------------------
// Jacobian short-Weierstrass ops, a = 0 (ec.cl formula parity: dbl-2009-l
// ec.cl:17-42, madd-2007-bl ec.cl:45-82, add-2007-bl ec.cl:85-120).  CPU
// branches on identity are fine here (SIMT divergence is a device concern).
// ---------------------------------------------------------------------------

template <typename F>
struct EcOps {
  F f;
  static const int W = F::W;
  // point = (X, Y, Z) at offsets 0, W, 2W.  Z = 0 encodes identity.

  bool is_identity(const u64* p) const { return f.is_zero(p + 2 * W); }

  void set_identity(u64* p) const { std::memset(p, 0, 3 * W * 8); }

  void from_affine(const u64* a, u64* o) const {
    // (0,0) affine encodes identity (impls.rs:48-58)
    if (f.is_zero(a) && f.is_zero(a + W)) { set_identity(o); return; }
    f.copy(a, o);
    f.copy(a + W, o + W);
    f.one(o + 2 * W);
  }

  void dbl(const u64* p, u64* o) const {
    if (is_identity(p)) { set_identity(o); return; }
    const u64 *X = p, *Y = p + W, *Z = p + 2 * W;
    u64 A[W], B[W], C[W], D[W], E[W], FF[W], t[W], X3[W], Y3[W], Z3[W];
    f.sqr(X, A);
    f.sqr(Y, B);
    f.sqr(B, C);
    f.add(X, B, t); f.sqr(t, t); f.sub(t, A, t); f.sub(t, C, t); f.dbl(t, D);
    f.dbl(A, E); f.add(E, A, E);           // 3A
    f.sqr(E, FF);
    f.dbl(D, t); f.sub(FF, t, X3);
    f.dbl(C, t); f.dbl(t, t); f.dbl(t, t); // 8C
    u64 u[W];
    f.sub(D, X3, u); f.mul(E, u, u); f.sub(u, t, Y3);
    f.mul(Y, Z, t); f.dbl(t, Z3);
    f.copy(X3, o); f.copy(Y3, o + W); f.copy(Z3, o + 2 * W);
  }

  void add(const u64* p, const u64* q, u64* o) const {
    if (is_identity(p)) { std::memcpy(o, q, 3 * W * 8); return; }
    if (is_identity(q)) { std::memcpy(o, p, 3 * W * 8); return; }
    const u64 *X1 = p, *Y1 = p + W, *Z1 = p + 2 * W;
    const u64 *X2 = q, *Y2 = q + W, *Z2 = q + 2 * W;
    u64 Z1Z1[W], Z2Z2[W], U1[W], U2[W], S1[W], S2[W], H[W], I[W], J[W],
        r[W], V[W], t[W], X3[W], Y3[W], Z3[W];
    f.sqr(Z1, Z1Z1);
    f.sqr(Z2, Z2Z2);
    f.mul(X1, Z2Z2, U1);
    f.mul(X2, Z1Z1, U2);
    f.mul(Z2, Z2Z2, t); f.mul(Y1, t, S1);
    f.mul(Z1, Z1Z1, t); f.mul(Y2, t, S2);
    f.sub(U2, U1, H);
    f.sub(S2, S1, t);
    if (f.is_zero(H)) {
      if (f.is_zero(t)) { dbl(p, o); return; }  // P == Q
      set_identity(o);                          // P == -Q
      return;
    }
    f.dbl(t, r);
    f.dbl(H, I); f.sqr(I, I);
    f.mul(H, I, J);
    f.mul(U1, I, V);
    f.sqr(r, X3); f.sub(X3, J, X3); f.dbl(V, t); f.sub(X3, t, X3);
    f.sub(V, X3, t); f.mul(r, t, t);
    u64 u[W];
    f.mul(S1, J, u); f.dbl(u, u);
    f.sub(t, u, Y3);
    f.add(Z1, Z2, t); f.sqr(t, t); f.sub(t, Z1Z1, t); f.sub(t, Z2Z2, t);
    f.mul(t, H, Z3);
    f.copy(X3, o); f.copy(Y3, o + W); f.copy(Z3, o + 2 * W);
  }

  // mixed add: q is affine (X2, Y2), (0,0) = identity (madd-2007-bl)
  void add_mixed(const u64* p, const u64* q, u64* o) const {
    if (f.is_zero(q) && f.is_zero(q + W)) { std::memcpy(o, p, 3 * W * 8); return; }
    if (is_identity(p)) { from_affine(q, o); return; }
    const u64 *X1 = p, *Y1 = p + W, *Z1 = p + 2 * W;
    const u64 *X2 = q, *Y2 = q + W;
    u64 Z1Z1[W], U2[W], S2[W], H[W], HH[W], I[W], J[W], r[W], V[W], t[W],
        X3[W], Y3[W], Z3[W];
    f.sqr(Z1, Z1Z1);
    f.mul(X2, Z1Z1, U2);
    f.mul(Z1, Z1Z1, t); f.mul(Y2, t, S2);
    f.sub(U2, X1, H);
    f.sub(S2, Y1, t);
    if (f.is_zero(H)) {
      if (f.is_zero(t)) { dbl(p, o); return; }
      set_identity(o);
      return;
    }
    f.dbl(t, r);
    f.sqr(H, HH);
    f.dbl(HH, I); f.dbl(I, I);
    f.mul(H, I, J);
    f.mul(X1, I, V);
    f.sqr(r, X3); f.sub(X3, J, X3); f.dbl(V, t); f.sub(X3, t, X3);
    f.sub(V, X3, t); f.mul(r, t, t);
    u64 u[W];
    f.mul(Y1, J, u); f.dbl(u, u);
    f.sub(t, u, Y3);
    f.add(Z1, H, t); f.sqr(t, t); f.sub(t, Z1Z1, t); f.sub(t, HH, t);
    f.copy(t, Z3);
    f.copy(X3, o); f.copy(Y3, o + W); f.copy(Z3, o + 2 * W);
  }

  void neg(const u64* p, u64* o) const {
    f.copy(p, o);
    f.neg(p + W, o + W);
    f.copy(p + 2 * W, o + 2 * W);
  }

  // k: 4 u64 words, plain integer.  Double-and-add MSB-first (ec.cl:136-148).
  void scalar_mul(const u64* p, const u64* k, u64* o) const {
    u64 acc[3 * W];
    set_identity(acc);
    for (int i = 255; i >= 0; --i) {
      dbl(acc, acc);
      if ((k[i / 64] >> (i % 64)) & 1) add(acc, p, acc);
    }
    std::memcpy(o, acc, 3 * W * 8);
  }

  void to_affine(const u64* p, u64* o) const {
    if (is_identity(p)) { std::memset(o, 0, 2 * W * 8); return; }
    u64 zinv[W], zinv2[W], zinv3[W];
    f.inv(p + 2 * W, zinv);
    f.sqr(zinv, zinv2);
    f.mul(zinv, zinv2, zinv3);
    f.mul(p, zinv2, o);
    f.mul(p + W, zinv3, o + W);
  }
};

// ---------------------------------------------------------------------------
// NTT over a prime field (fft_cpu.rs:10-52 serial + :59-111 parallel).
// In-place, natural order in / natural order out, X_k = sum_j x_j w^{jk}.
// Data in Montgomery form; omega passed plain and converted here.
// ---------------------------------------------------------------------------

template <int N>
static void ntt_impl(const FpCtx<N>& c, u64* data, int log_n,
                     const u64* omega_plain, int nthreads) {
  if (log_n == 0) return;  // size-1 transform is the identity
  long n = 1L << log_n;
  // bit-reverse permutation (common.cl:108-115)
  for (long i = 0; i < n; ++i) {
    long r = 0;
    for (int b = 0; b < log_n; ++b) r |= ((i >> b) & 1L) << (log_n - 1 - b);
    if (r > i) {
      for (int w = 0; w < N; ++w) std::swap(data[i * N + w], data[r * N + w]);
    }
  }
  // Montgomery omega and the n/2 twiddle table w^0..w^(n/2-1)
  u64 om[N];
  fp_to_mont<N>(c, omega_plain, om);
  std::vector<u64> tw((n / 2) * N);
  std::memcpy(tw.data(), c.one, N * 8);
  for (long j = 1; j < n / 2; ++j)
    fp_mul<N>(c, &tw[(j - 1) * N], om, &tw[j * N]);
  // stages; twiddle for (m, j) is w^(j * n / (2m)) = tw[j * (n / (2m))]
  for (long m = 1; m < n; m <<= 1) {
    long stride = n / (2 * m);
    long nblocks = n / (2 * m);
    parallel_for(nblocks, nthreads, [&](long klo, long khi) {
      u64 t[N], u[N];
      for (long kb = klo; kb < khi; ++kb) {
        long k = kb * 2 * m;
        for (long j = 0; j < m; ++j) {
          u64* lo = data + (k + j) * N;
          u64* hi = data + (k + j + m) * N;
          fp_mul<N>(c, hi, &tw[j * stride * N], t);
          std::memcpy(u, lo, N * 8);
          fp_add<N>(c, u, t, lo);
          fp_sub<N>(c, u, t, hi);
        }
      }
    });
  }
}

// ---------------------------------------------------------------------------
// EC-group FFT (ec_fft_cpu.rs:12-118): same dataflow, butterflies are point
// add/sub and twiddles are scalar multiplications by w^j (plain scalars).
// ---------------------------------------------------------------------------

template <typename F, int SN>
static void ec_fft_impl(const EcOps<F>& ec, const FpCtx<SN>& sc, u64* data,
                        int log_n, const u64* omega_plain, int nthreads) {
  if (log_n == 0) return;  // size-1 transform is the identity
  const int PW = 3 * F::W;
  long n = 1L << log_n;
  for (long i = 0; i < n; ++i) {
    long r = 0;
    for (int b = 0; b < log_n; ++b) r |= ((i >> b) & 1L) << (log_n - 1 - b);
    if (r > i) {
      for (int w = 0; w < PW; ++w) std::swap(data[i * PW + w], data[r * PW + w]);
    }
  }
  // scalar twiddle table w^0..w^(n/2-1), PLAIN integers (scalar_mul input)
  u64 om_m[SN], one_m[SN];
  fp_to_mont<SN>(sc, omega_plain, om_m);
  std::memcpy(one_m, sc.one, SN * 8);
  std::vector<u64> twm((n / 2) * SN), tw((n / 2) * SN);
  std::memcpy(twm.data(), one_m, SN * 8);
  for (long j = 1; j < n / 2; ++j)
    fp_mul<SN>(sc, &twm[(j - 1) * SN], om_m, &twm[j * SN]);
  for (long j = 0; j < n / 2; ++j)
    fp_from_mont<SN>(sc, &twm[j * SN], &tw[j * SN]);
  for (long m = 1; m < n; m <<= 1) {
    long stride = n / (2 * m);
    long nblocks = n / (2 * m);
    parallel_for(nblocks, nthreads, [&](long klo, long khi) {
      std::vector<u64> t(PW), u(PW);
      for (long kb = klo; kb < khi; ++kb) {
        long k = kb * 2 * m;
        for (long j = 0; j < m; ++j) {
          u64* lo = data + (k + j) * PW;
          u64* hi = data + (k + j + m) * PW;
          ec.scalar_mul(hi, &tw[j * stride * SN], t.data());
          std::memcpy(u.data(), lo, PW * 8);
          ec.add(u.data(), t.data(), lo);
          // hi = u - t
          u64 negt[3 * F::W];
          ec.neg(t.data(), negt);
          ec.add(u.data(), negt, hi);
        }
      }
    });
  }
}

// ---------------------------------------------------------------------------
// Pippenger MSM with signed windows (multiexp_cpu.rs:244-339 lineage; signed
// recode parity with the fork's WNAF kernel, ag-build/cl/multiexp.cl:95-118).
// points: (n, 2W) affine Montgomery, (0,0) = identity.
// scalars: (n, 4) plain u64.  out: one Jacobian point (3W).
// ---------------------------------------------------------------------------

template <typename F>
static void msm_impl(const EcOps<F>& ec, const u64* points, const u64* scalars,
                     long n, int window, int nthreads, u64* out) {
  const int W = F::W;
  const int PW = 3 * W;
  if (window <= 0) {
    // ln(n)-ish heuristic (multiexp_cpu.rs:353-358)
    window = 3;
    while ((1 << window) < n && window < 16) ++window;
    window = window > 2 ? window - 2 : 1;
  }
  int num_windows = (256 + window - 1) / window + 1;  // +1 for carry overflow
  long half = 1L << (window - 1);

  // signed digit recode per scalar, per window: d in [-2^(w-1), 2^(w-1)]
  // (the carry chain of multiexp.cl:103-118)
  std::vector<int32_t> digits((size_t)n * num_windows);
  parallel_for(n, nthreads, [&](long lo, long hi) {
    for (long i = lo; i < hi; ++i) {
      const u64* s = scalars + i * 4;
      int32_t carry = 0;
      for (int j = 0; j < num_windows; ++j) {
        long bit = (long)j * window;
        int wi = (int)(bit / 64), off = (int)(bit % 64);
        u64 raw;
        if (wi >= 4) raw = 0;
        else {
          raw = s[wi] >> off;
          if (off && wi + 1 < 4) raw |= s[wi + 1] << (64 - off);
        }
        int32_t d = (int32_t)(raw & ((1UL << window) - 1)) + carry;
        carry = (d > (int32_t)half) ? 1 : 0;
        digits[(size_t)i * num_windows + j] = d - (carry << window);
      }
    }
  });

  // per-window buckets, windows in parallel
  std::vector<u64> windows_acc((size_t)num_windows * PW);
  parallel_for(num_windows, nthreads, [&](long wlo, long whi) {
    std::vector<u64> buckets((size_t)half * PW);
    for (long w = wlo; w < whi; ++w) {
      for (long b = 0; b < half; ++b) ec.set_identity(&buckets[b * PW]);
      for (long i = 0; i < n; ++i) {
        int32_t d = digits[(size_t)i * num_windows + w];
        if (d == 0) continue;
        const u64* A = points + i * 2 * W;
        if (d > 0) {
          ec.add_mixed(&buckets[(size_t)(d - 1) * PW], A, &buckets[(size_t)(d - 1) * PW]);
        } else {
          u64 negA[2 * 16];
          ec.f.copy(A, negA);
          ec.f.neg(A + W, negA + W);
          ec.add_mixed(&buckets[(size_t)(-d - 1) * PW], negA, &buckets[(size_t)(-d - 1) * PW]);
        }
      }
      // triangular running sum: sum_b (b+1) * bucket[b] (multiexp.cl:121-131)
      std::vector<u64> running(PW), acc(PW);
      ec.set_identity(running.data());
      ec.set_identity(acc.data());
      for (long b = half - 1; b >= 0; --b) {
        ec.add(running.data(), &buckets[b * PW], running.data());
        ec.add(acc.data(), running.data(), acc.data());
      }
      std::memcpy(&windows_acc[w * PW], acc.data(), PW * 8);
    }
  });

  // combine windows high-to-low: res = 2^w * res + S_j (multiexp.rs:221-235)
  u64 res[3 * 16];
  ec.set_identity(res);
  for (int j = num_windows - 1; j >= 0; --j) {
    for (int d = 0; d < window; ++d) ec.dbl(res, res);
    ec.add(res, &windows_acc[(size_t)j * PW], res);
  }
  std::memcpy(out, res, PW * 8);
}

// ---------------------------------------------------------------------------
// C ABI.  Handles carry the limb count so one entry point serves N=4 and N=6.
// ---------------------------------------------------------------------------

struct FieldHandle {
  int n64;
  void* ctx;  // FpCtx<4>* or FpCtx<6>*
};

struct CurveHandle {
  int n64;   // base-field u64 words (4 or 6)
  int ext;   // 1 = G1, 2 = G2
  FieldHandle* fq;
  FieldHandle* fr;  // scalar field, always n64 == 4
};

template <int N>
static FpCtx<N>* make_ctx(const u64* p) {
  auto* c = new FpCtx<N>();
  std::memcpy(c->p, p, N * 8);
  // inv = -p^-1 mod 2^64 by Newton iteration (limb.rs:65-72 calc_inv)
  u64 inv = 1;
  for (int i = 0; i < 63; ++i) {
    inv *= inv;
    inv *= p[0];
  }
  c->inv = ~inv + 1;  // negate mod 2^64
  // r2 = R^2 mod p via repeated doubling: R mod p first, then 64N doublings
  u64 r[N];
  // R mod p: start from p, compute 2^(64N) mod p by doubling 1, 64N times
  std::memset(r, 0, sizeof(r));
  r[0] = 1;
  for (int i = 0; i < 64 * N; ++i) fp_add<N>(*c, r, r, r);  // r = 2^(64N) mod p = R
  std::memcpy(c->one, r, N * 8);
  // r2 = R * R mod p by 64N more doublings of R... that computes R*2^(64N)=R^2. OK:
  u64 r2[N];
  std::memcpy(r2, r, N * 8);
  for (int i = 0; i < 64 * N; ++i) fp_add<N>(*c, r2, r2, r2);
  std::memcpy(c->r2, r2, N * 8);
  return c;
}

#define FIELD_DISPATCH(h, EXPR4, EXPR6)                 \
  do {                                                  \
    if ((h)->n64 == 4) { EXPR4; } else { EXPR6; }       \
  } while (0)

extern "C" {

int ecn_version() { return 1; }

void* ecn_field_new(const u64* p_le, int n64) {
  if (n64 != 4 && n64 != 6) return nullptr;
  auto* h = new FieldHandle();
  h->n64 = n64;
  if (n64 == 4) h->ctx = make_ctx<4>(p_le);
  else h->ctx = make_ctx<6>(p_le);
  return h;
}

void ecn_field_free(void* vh) {
  auto* h = (FieldHandle*)vh;
  if (!h) return;
  FIELD_DISPATCH(h, delete (FpCtx<4>*)h->ctx, delete (FpCtx<6>*)h->ctx);
  delete h;
}

// batched elementwise ops; a, b, out: (n, n64) row-major u64, Montgomery form
#define BATCH_BINOP(NAME, OP)                                                  \
  void NAME(void* vh, const u64* a, const u64* b, u64* out, long n,            \
            int nthreads) {                                                    \
    auto* h = (FieldHandle*)vh;                                                \
    if (h->n64 == 4) {                                                         \
      auto* c = (FpCtx<4>*)h->ctx;                                             \
      parallel_for(n, nthreads, [&](long lo, long hi) {                        \
        for (long i = lo; i < hi; ++i) OP<4>(*c, a + i * 4, b + i * 4, out + i * 4); \
      });                                                                      \
    } else {                                                                   \
      auto* c = (FpCtx<6>*)h->ctx;                                             \
      parallel_for(n, nthreads, [&](long lo, long hi) {                        \
        for (long i = lo; i < hi; ++i) OP<6>(*c, a + i * 6, b + i * 6, out + i * 6); \
      });                                                                      \
    }                                                                          \
  }

BATCH_BINOP(ecn_field_mul, fp_mul)
BATCH_BINOP(ecn_field_add, fp_add)
BATCH_BINOP(ecn_field_sub, fp_sub)

#define BATCH_UNOP(NAME, OP)                                                   \
  void NAME(void* vh, const u64* a, u64* out, long n, int nthreads) {          \
    auto* h = (FieldHandle*)vh;                                                \
    if (h->n64 == 4) {                                                         \
      auto* c = (FpCtx<4>*)h->ctx;                                             \
      parallel_for(n, nthreads, [&](long lo, long hi) {                        \
        for (long i = lo; i < hi; ++i) OP<4>(*c, a + i * 4, out + i * 4);      \
      });                                                                      \
    } else {                                                                   \
      auto* c = (FpCtx<6>*)h->ctx;                                             \
      parallel_for(n, nthreads, [&](long lo, long hi) {                        \
        for (long i = lo; i < hi; ++i) OP<6>(*c, a + i * 6, out + i * 6);      \
      });                                                                      \
    }                                                                          \
  }

BATCH_UNOP(ecn_field_neg, fp_neg)
BATCH_UNOP(ecn_field_sqr, fp_sqr)
BATCH_UNOP(ecn_field_inv, fp_inv)
BATCH_UNOP(ecn_field_to_mont, fp_to_mont)
BATCH_UNOP(ecn_field_from_mont, fp_from_mont)

// in-place NTT; data (2^log_n, n64) Montgomery; omega plain
void ecn_ntt(void* vh, u64* data, int log_n, const u64* omega_plain,
             int nthreads) {
  auto* h = (FieldHandle*)vh;
  FIELD_DISPATCH(h, ntt_impl<4>(*(FpCtx<4>*)h->ctx, data, log_n, omega_plain, nthreads),
                 ntt_impl<6>(*(FpCtx<6>*)h->ctx, data, log_n, omega_plain, nthreads));
}

// ---- curves ----------------------------------------------------------------

void* ecn_curve_new(void* vfq, void* vfr, int ext) {
  auto* h = new CurveHandle();
  h->fq = (FieldHandle*)vfq;
  h->fr = (FieldHandle*)vfr;
  h->n64 = h->fq->n64;
  h->ext = ext;
  return h;
}

void ecn_curve_free(void* vh) { delete (CurveHandle*)vh; }

#define CURVE_DISPATCH(h, STMT)                                       \
  do {                                                                \
    if ((h)->n64 == 4 && (h)->ext == 1) {                             \
      EcOps<F1<4>> ec{{(FpCtx<4>*)(h)->fq->ctx}};                     \
      STMT;                                                           \
    } else if ((h)->n64 == 4 && (h)->ext == 2) {                      \
      EcOps<F2<4>> ec{{(FpCtx<4>*)(h)->fq->ctx}};                     \
      STMT;                                                           \
    } else if ((h)->n64 == 6 && (h)->ext == 1) {                      \
      EcOps<F1<6>> ec{{(FpCtx<6>*)(h)->fq->ctx}};                     \
      STMT;                                                           \
    } else {                                                          \
      EcOps<F2<6>> ec{{(FpCtx<6>*)(h)->fq->ctx}};                     \
      STMT;                                                           \
    }                                                                 \
  } while (0)

// batched Jacobian ops: p, q, out are (n, 3W) u64
void ecn_ec_add(void* vh, const u64* p, const u64* q, u64* out, long n,
                int nthreads) {
  auto* h = (CurveHandle*)vh;
  CURVE_DISPATCH(h, {
    const int PW = 3 * decltype(ec)::W;
    parallel_for(n, nthreads, [&](long lo, long hi) {
      for (long i = lo; i < hi; ++i)
        ec.add(p + i * PW, q + i * PW, out + i * PW);
    });
  });
}

void ecn_ec_double(void* vh, const u64* p, u64* out, long n, int nthreads) {
  auto* h = (CurveHandle*)vh;
  CURVE_DISPATCH(h, {
    const int PW = 3 * decltype(ec)::W;
    parallel_for(n, nthreads, [&](long lo, long hi) {
      for (long i = lo; i < hi; ++i) ec.dbl(p + i * PW, out + i * PW);
    });
  });
}

// p: (n, 2W) affine; k: (n, 4) plain; out: (n, 3W) Jacobian
void ecn_ec_scalar_mul(void* vh, const u64* p, const u64* k, u64* out, long n,
                       int nthreads) {
  auto* h = (CurveHandle*)vh;
  CURVE_DISPATCH(h, {
    const int W = decltype(ec)::W;
    parallel_for(n, nthreads, [&](long lo, long hi) {
      std::vector<u64> jac(3 * W);
      for (long i = lo; i < hi; ++i) {
        ec.from_affine(p + i * 2 * W, jac.data());
        ec.scalar_mul(jac.data(), k + i * 4, out + i * 3 * W);
      }
    });
  });
}

void ecn_ec_to_affine(void* vh, const u64* p, u64* out, long n, int nthreads) {
  auto* h = (CurveHandle*)vh;
  CURVE_DISPATCH(h, {
    const int W = decltype(ec)::W;
    parallel_for(n, nthreads, [&](long lo, long hi) {
      for (long i = lo; i < hi; ++i)
        ec.to_affine(p + i * 3 * W, out + i * 2 * W);
    });
  });
}

void ecn_ec_from_affine(void* vh, const u64* a, u64* out, long n, int nthreads) {
  auto* h = (CurveHandle*)vh;
  CURVE_DISPATCH(h, {
    const int W = decltype(ec)::W;
    parallel_for(n, nthreads, [&](long lo, long hi) {
      for (long i = lo; i < hi; ++i)
        ec.from_affine(a + i * 2 * W, out + i * 3 * W);
    });
  });
}

// full MSM: points (n, 2W) affine Montgomery, scalars (n, 4) plain,
// out (3W) Jacobian.  window <= 0 selects the ln(n) heuristic.
void ecn_msm(void* vh, const u64* points, const u64* scalars, long n,
             int window, int nthreads, u64* out) {
  auto* h = (CurveHandle*)vh;
  CURVE_DISPATCH(h, msm_impl(ec, points, scalars, n, window, nthreads, out));
}

// EC-group FFT in place: data (2^log_n, 3W) Jacobian; omega plain scalar (4 u64)
void ecn_ec_fft(void* vh, u64* data, int log_n, const u64* omega_plain,
                int nthreads) {
  auto* h = (CurveHandle*)vh;
  auto* sc = (FpCtx<4>*)h->fr->ctx;
  CURVE_DISPATCH(h, ec_fft_impl(ec, *sc, data, log_n, omega_plain, nthreads));
}

}  // extern "C"
