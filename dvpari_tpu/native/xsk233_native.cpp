// Native host backend for dvpari_tpu: GF(2^233) / sect233k1 / tau-NAF.
//
// Role: the host-side runtime pieces that the reference keeps in native
// code (the xs233 C library, reference: src/curve.rs:13, and scalar
// recoding inside xsk233_mul_frob).  The TPU kernels remain the compute
// path; this library serves:
//   * fast bulk point encode/decode for the 30-byte artifact format
//     (reference: src/io_utils.rs point vectors),
//   * tau-NAF window recoding for millions of MSM scalars,
//   * a fast host oracle for tests and host-side folds.
//
// Field: GF(2)[x]/(x^233 + x^74 + 1), elements as 4x64-bit words.
// Curve: y^2 + xy = x^3 + 1 (sect233k1, a=0, b=1), prime subgroup.
//
// Built as a plain C ABI shared library, loaded via ctypes
// (dvpari_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <vector>

#if defined(__PCLMUL__)
#include <smmintrin.h>
#include <wmmintrin.h>
#endif

typedef uint64_t u64;
typedef unsigned __int128 u128;

namespace {

struct FE {
  u64 w[4];  // bits 0..233, little-endian words
};

inline FE fe_zero() { return FE{{0, 0, 0, 0}}; }

inline bool fe_is_zero(const FE &a) {
  return (a.w[0] | a.w[1] | a.w[2] | a.w[3]) == 0;
}

inline FE fe_add(const FE &a, const FE &b) {
  FE r;
  for (int i = 0; i < 4; i++) r.w[i] = a.w[i] ^ b.w[i];
  return r;
}

// carry-less 64x64 -> 128.  PCLMULQDQ when the build machine has it
// (build() compiles on the host that runs it); 4-bit windowed shifts as
// the portable fallback.
#if defined(__PCLMUL__)
inline void clmul64(u64 a, u64 b, u64 &hi, u64 &lo) {
  __m128i r = _mm_clmulepi64_si128(_mm_set_epi64x(0, (long long)a),
                                   _mm_set_epi64x(0, (long long)b), 0x00);
  lo = (u64)_mm_cvtsi128_si64(r);
  hi = (u64)_mm_extract_epi64(r, 1);
}
#else
inline void clmul64(u64 a, u64 b, u64 &hi, u64 &lo) {
  u64 tab[16][2];
  tab[0][0] = 0; tab[0][1] = 0;
  tab[1][0] = a; tab[1][1] = 0;
  for (int i = 2; i < 16; i += 2) {
    // tab[i] = tab[i/2] << 1 ; tab[i+1] = tab[i] ^ a
    tab[i][0] = tab[i / 2][0] << 1;
    tab[i][1] = (tab[i / 2][1] << 1) | (tab[i / 2][0] >> 63);
    tab[i + 1][0] = tab[i][0] ^ a;
    tab[i + 1][1] = tab[i][1];
  }
  u64 rlo = 0, rhi = 0;
  for (int s = 60; s >= 0; s -= 4) {
    // r <<= 4
    rhi = (rhi << 4) | (rlo >> 60);
    rlo <<= 4;
    unsigned nib = (b >> s) & 0xF;
    rlo ^= tab[nib][0];
    rhi ^= tab[nib][1];
  }
  hi = rhi;
  lo = rlo;
}
#endif

// full 233x233 -> <=465-bit product into 8 words (schoolbook 4x4)
inline void fe_clmul_wide(const FE &a, const FE &b, u64 out[8]) {
  memset(out, 0, 8 * sizeof(u64));
  for (int i = 0; i < 4; i++) {
    for (int j = 0; j < 4; j++) {
      u64 hi, lo;
      clmul64(a.w[i], b.w[j], hi, lo);
      out[i + j] ^= lo;
      out[i + j + 1] ^= hi;
    }
  }
}

// reduce 8 words mod x^233 + x^74 + 1
inline FE fe_reduce_wide(u64 v[8]) {
  // fold words 7..3 (bits >= 233): bit 233 is bit 41 of word 3
  for (int i = 7; i >= 4; i--) {
    u64 t = v[i];
    v[i] = 0;
    // x^(64i) = x^(64i-233) * (x^74 + 1)
    int base = 64 * i - 233;  // 23, 87, 151, 215
    int b0 = base, b1 = base + 74;
    v[b0 / 64] ^= t << (b0 % 64);
    if (b0 % 64) v[b0 / 64 + 1] ^= t >> (64 - b0 % 64);
    v[b1 / 64] ^= t << (b1 % 64);
    if (b1 % 64) v[b1 / 64 + 1] ^= t >> (64 - b1 % 64);
  }
  // remaining high bits of word 3 (bits 41..63 = x^233..x^255)
  u64 t = v[3] >> 41;
  v[3] &= (1ULL << 41) - 1;
  v[0] ^= t;          // * 1
  v[1] ^= t << 10;    // * x^74: bit 74 = word1 bit 10
  FE r{{v[0], v[1], v[2], v[3]}};
  // one more fold can be needed if the x^74 fold crossed 233 again: the
  // first loop writes at most bit 215+74+63 < 353 -> handled by t-fold;
  // t-fold writes at most bit 74+22 = 96 < 233.  Check invariant:
  return r;
}

inline FE fe_mul(const FE &a, const FE &b) {
  u64 wide[8];
  fe_clmul_wide(a, b, wide);
  return fe_reduce_wide(wide);
}

// squaring is linear over GF(2): spread each bit to an even position
// (interleave zeros) and reduce -- ~20x cheaper than a generic clmul,
// which matters because fe_inv and fe_halftrace are squaring towers.
inline u64 spread32(u64 x) {
  x &= 0xFFFFFFFFULL;
  x = (x | (x << 16)) & 0x0000FFFF0000FFFFULL;
  x = (x | (x << 8)) & 0x00FF00FF00FF00FFULL;
  x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FULL;
  x = (x | (x << 2)) & 0x3333333333333333ULL;
  x = (x | (x << 1)) & 0x5555555555555555ULL;
  return x;
}

inline FE fe_sqr(const FE &a) {
  u64 wide[8];
  for (int i = 0; i < 4; i++) {
    wide[2 * i] = spread32(a.w[i]);
    wide[2 * i + 1] = spread32(a.w[i] >> 32);
  }
  return fe_reduce_wide(wide);
}

inline FE fe_one() {
  FE r = fe_zero();
  r.w[0] = 1;
  return r;
}

inline FE fe_sqr_k(FE a, int k) {
  for (int i = 0; i < k; i++) a = fe_sqr(a);
  return a;
}

// Itoh-Tsujii inversion: a^(2^233 - 2)
inline FE fe_inv(const FE &a) {
  if (fe_is_zero(a)) return a;
  FE x1 = a;
  FE x2 = fe_mul(fe_sqr_k(x1, 1), x1);
  FE x3 = fe_mul(fe_sqr_k(x2, 1), x1);
  FE x6 = fe_mul(fe_sqr_k(x3, 3), x3);
  FE x7 = fe_mul(fe_sqr_k(x6, 1), x1);
  FE x14 = fe_mul(fe_sqr_k(x7, 7), x7);
  FE x28 = fe_mul(fe_sqr_k(x14, 14), x14);
  FE x29 = fe_mul(fe_sqr_k(x28, 1), x1);
  FE x58 = fe_mul(fe_sqr_k(x29, 29), x29);
  FE x116 = fe_mul(fe_sqr_k(x58, 58), x58);
  FE x232 = fe_mul(fe_sqr_k(x116, 116), x116);
  return fe_sqr(x232);
}

// Tr(a) = parity of bits {0, 159} for this trinomial (derived + verified
// in dvpari_tpu/utils/gf2_host.py)
inline int fe_trace(const FE &a) {
  return (int)((a.w[0] ^ (a.w[2] >> 31)) & 1);
}

inline FE fe_halftrace(const FE &a) {
  FE t = a, acc = a;
  for (int i = 0; i < 116; i++) {
    t = fe_sqr(fe_sqr(t));
    acc = fe_add(acc, t);
  }
  return acc;
}

// ------------- curve (projective X:Y:Z, x=X/Z, y=Y/Z) ---------------------

struct PT {
  FE X, Y, Z;
};

inline PT pt_inf() {
  PT p;
  p.X = fe_zero();
  p.Y = fe_zero();
  p.Y.w[0] = 1;
  p.Z = fe_zero();
  return p;
}

inline bool pt_is_inf(const PT &p) { return fe_is_zero(p.Z); }

inline PT pt_neg(const PT &p) { return PT{p.X, fe_add(p.X, p.Y), p.Z}; }

PT pt_double(const PT &p) {
  if (pt_is_inf(p)) return p;
  FE S = fe_mul(p.X, p.Z);
  if (fe_is_zero(S)) return pt_inf();  // X=0 (order-2) or Z=0
  FE X2 = fe_sqr(p.X);
  FE T = fe_add(X2, fe_mul(p.Y, p.Z));
  FE TpS = fe_add(T, S);
  FE TT = fe_mul(T, TpS);
  FE X3 = fe_mul(TT, S);
  FE Y3 = fe_add(fe_mul(fe_mul(fe_sqr(X2), p.X), p.Z), fe_mul(TT, TpS));
  FE Z3 = fe_mul(fe_sqr(S), S);
  return PT{X3, Y3, Z3};
}

PT pt_add(const PT &p, const PT &q) {
  if (pt_is_inf(p)) return q;
  if (pt_is_inf(q)) return p;
  FE W = fe_mul(p.Z, q.Z);
  FE U = fe_add(fe_mul(p.Y, q.Z), fe_mul(q.Y, p.Z));
  FE V = fe_add(fe_mul(p.X, q.Z), fe_mul(q.X, p.Z));
  if (fe_is_zero(V)) {
    if (fe_is_zero(U)) return pt_double(p);
    return pt_inf();
  }
  FE V2 = fe_sqr(V);
  FE V3 = fe_mul(V2, V);
  FE N = fe_add(fe_add(fe_mul(fe_sqr(U), W), fe_mul(fe_mul(U, W), V)), V3);
  FE X3 = fe_mul(N, V);
  FE Z3 = fe_mul(V3, W);
  FE V2Z2 = fe_mul(V2, q.Z);
  FE Y3 = fe_add(
      fe_add(fe_mul(U, fe_add(fe_mul(p.X, V2Z2), N)), fe_mul(V, N)),
      fe_mul(p.Y, fe_mul(V3, q.Z)));
  return PT{X3, Y3, Z3};
}

PT pt_frob(const PT &p) { return PT{fe_sqr(p.X), fe_sqr(p.Y), fe_sqr(p.Z)}; }

void pt_to_affine(const PT &p, FE &x, FE &y, int &inf) {
  if (pt_is_inf(p)) {
    inf = 1;
    x = fe_zero();
    y = fe_zero();
    return;
  }
  inf = 0;
  FE zi = fe_inv(p.Z);
  x = fe_mul(p.X, zi);
  y = fe_mul(p.Y, zi);
}

// ----------------- tau-NAF recoding (host, bulk) ---------------------------
//
// Mirrors dvpari_tpu/ops/tnaf.py (partmod + tau-NAF + width-4 windowing);
// the reference keeps recoding inside the C library's xsk233_mul_frob
// (reference: src/curve.rs:113-137).  Division-free: the round-to-nearest
// division by N(delta) uses a precomputed Barrett reciprocal with exact
// correction, so the per-scalar cost is a handful of multiword multiplies.

namespace tnaf {

constexpr int TNAF_LEN = 248;
constexpr int N_WINDOWS = 62;

// DELTA = (tau^233 - 1)/(tau - 1) in Z[tau]; N = N(DELTA) = subgroup order.
static const u64 D0[2] = {0xda32c0f4ba75bb3bULL, 0x325402dcb0ed1ULL};
static const u64 D1[2] = {0x16aa143ccb36bee6ULL, 0x882d72d7ae36eULL};
static const u64 NW[4] = {0x6efb1ad5f173abdfULL, 0x69d5bb915bcd4ULL, 0ULL,
                          0x8000000000ULL};
static const u64 N2W[4] = {0xddf635abe2e757beULL, 0xd3ab7722b79a8ULL, 0ULL,
                           0x10000000000ULL};
// MU = floor(2^704 / (2N)) (472 bits)
static const u64 MU[8] = {0x4ca404ae59007572ULL, 0xeeb5b58a0af7df48ULL,
                          0x59bebed80293c813ULL, 0xa842af04193b9a7bULL,
                          0x86572209ca541d18ULL, 0xfffffff2c5488dd4ULL,
                          0xffffffffffffffffULL, 0xffffffULL};
// E = D1 - D0 (conj(DELTA) = (D0 - D1, -D1))
static const u64 EW[2] = {0x3c77534810c103abULL, 0x55d96ffafd49cULL};

static int mag_cmp(const u64 *a, const u64 *b, int n) {
  for (int i = n - 1; i >= 0; i--) {
    if (a[i] != b[i]) return a[i] > b[i] ? 1 : -1;
  }
  return 0;
}

static void mag_add(u64 *r, const u64 *a, const u64 *b, int n) {
  u128 c = 0;
  for (int i = 0; i < n; i++) {
    u128 t = (u128)a[i] + b[i] + c;
    r[i] = (u64)t;
    c = t >> 64;
  }
}

static void mag_sub(u64 *r, const u64 *a, const u64 *b, int n) {  // a >= b
  u128 borrow = 0;
  for (int i = 0; i < n; i++) {
    u128 t = (u128)a[i] - b[i] - borrow;
    r[i] = (u64)t;
    borrow = (t >> 64) & 1;
  }
}

// r[0..nr) = a * b (truncated); r must not alias a/b
static void mag_mul(u64 *r, int nr, const u64 *a, int na, const u64 *b,
                    int nb) {
  for (int i = 0; i < nr; i++) r[i] = 0;
  for (int i = 0; i < na && i < nr; i++) {
    u64 carry = 0;
    for (int j = 0; j < nb; j++) {
      if (i + j >= nr) break;
      u128 t = (u128)a[i] * b[j] + r[i + j] + carry;
      r[i + j] = (u64)t;
      carry = (u64)(t >> 64);
    }
    for (int j = i + nb; carry && j < nr; j++) {
      u128 t = (u128)r[j] + carry;
      r[j] = (u64)t;
      carry = (u64)(t >> 64);
    }
  }
}

// round(|a| / N) half-away, |a| < 2^350 as 6 words -> magnitude < 2^121
static u128 mag_divround_N(const u64 a[6]) {
  // x = 2|a| + N  (7 words)
  u64 x[7];
  u64 hi = 0;
  for (int i = 0; i < 6; i++) {
    u64 nhi = a[i] >> 63;
    x[i] = (a[i] << 1) | hi;
    hi = nhi;
  }
  x[6] = hi;
  u64 n4[7] = {NW[0], NW[1], NW[2], NW[3], 0, 0, 0};
  mag_add(x, x, n4, 7);
  // qhat = (x * MU) >> 704   (704 = 11 words)
  u64 prod[15];
  mag_mul(prod, 15, x, 7, MU, 8);
  u64 q[4] = {prod[11], prod[12], prod[13], prod[14]};
  // correction: qhat <= floor(x / 2N) <= qhat + small
  u64 q2n[7], diff[7];
  u64 n2[7] = {N2W[0], N2W[1], N2W[2], N2W[3], 0, 0, 0};
  for (;;) {
    u64 q7[7] = {q[0], q[1], q[2], q[3], 0, 0, 0};
    mag_mul(q2n, 7, q7, 4, N2W, 4);
    mag_sub(diff, x, q2n, 7);  // x >= q*2N by construction
    if (mag_cmp(diff, n2, 7) < 0) break;
    u64 one[4] = {1, 0, 0, 0};
    mag_add(q, q, one, 4);
  }
  return ((u128)q[1] << 64) | q[0];
}

typedef __int128 i128;

struct SB {  // sign-magnitude, 6 words
  bool neg;
  u64 m[6];
};

static void sb_add(SB &a, const u64 *b, bool bneg) {
  if (a.neg == bneg) {
    mag_add(a.m, a.m, b, 6);
  } else if (mag_cmp(a.m, b, 6) >= 0) {
    mag_sub(a.m, a.m, b, 6);
  } else {
    u64 t[6];
    mag_sub(t, b, a.m, 6);
    memcpy(a.m, t, 48);
    a.neg = bneg;
  }
}

static i128 sb_to_i128(const SB &a) {
  // callers guarantee |a| < 2^126
  i128 v = ((i128)((u128)a.m[1] << 64 | a.m[0]));
  return a.neg ? -v : v;
}

// width-4 window coding (mirrors tnaf._window_code)
static int window_code(const int8_t *d, int *sgn) {
  int pos[4], val[4], cnt = 0;
  for (int i = 0; i < 4; i++) {
    if (d[i]) {
      pos[cnt] = i;
      val[cnt] = d[i];
      cnt++;
    }
  }
  if (cnt == 0) {
    *sgn = 1;
    return 0;
  }
  if (cnt == 1) {
    *sgn = val[0];
    return 1 + pos[0];
  }
  int i = pos[0], j = pos[1], v = val[0], w = val[1];
  *sgn = v;
  if (i == 0 && j == 2) return v == w ? 5 : 6;
  if (i == 0 && j == 3) return v == w ? 7 : 8;
  if (i == 1 && j == 3) return v == w ? 9 : 10;
  return -1;  // invalid NAF window (cannot happen)
}

// scalar: 32-byte LE canonical (< 2^232).  Returns 0 on success.
static int recode_one(const uint8_t *s32, int8_t *idx_out, int8_t *sgn_out) {
  u64 k[6] = {0, 0, 0, 0, 0, 0};
  memcpy(k, s32, 32);
  // q0 = -round(k*E / N), q1 = -round(k*D1 / N)
  u64 p0[6], p1[6];
  mag_mul(p0, 6, k, 4, EW, 2);
  mag_mul(p1, 6, k, 4, D1, 2);
  u128 q0m = mag_divround_N(p0);
  u128 q1m = mag_divround_N(p1);
  // rho0 = k + q0m*D0 - 2*q1m*D1 ; rho1 = q0m*D1 + q1m*D0 - q1m*D1
  u64 q0w[2] = {(u64)q0m, (u64)(q0m >> 64)};
  u64 q1w[2] = {(u64)q1m, (u64)(q1m >> 64)};
  u64 t[6];
  SB r0{false, {k[0], k[1], k[2], k[3], 0, 0}};
  mag_mul(t, 6, q0w, 2, D0, 2);
  sb_add(r0, t, false);
  mag_mul(t, 6, q1w, 2, D1, 2);
  u64 t2[6];
  mag_add(t2, t, t, 6);
  sb_add(r0, t2, true);
  SB r1{false, {0, 0, 0, 0, 0, 0}};
  mag_mul(t, 6, q0w, 2, D1, 2);
  sb_add(r1, t, false);
  mag_mul(t, 6, q1w, 2, D0, 2);
  sb_add(r1, t, false);
  mag_mul(t, 6, q1w, 2, D1, 2);
  sb_add(r1, t, true);

  i128 c = sb_to_i128(r0), d = sb_to_i128(r1);
  int8_t digs[TNAF_LEN];
  memset(digs, 0, TNAF_LEN);
  int i = 0;
  while (c != 0 || d != 0) {
    i128 u = 0;
    if ((u64)c & 1) {
      u = (i128)2 - (i128)((u64)(c - 2 * d) & 3);
      c -= u;
    }
    if (i >= TNAF_LEN) return 1;
    digs[i++] = (int8_t)u;
    i128 ch = c >> 1;  // c is even: exact division
    c = d - ch;
    d = -ch;
  }
  for (int w = 0; w < N_WINDOWS; w++) {
    int sgn;
    int code = window_code(digs + 4 * w, &sgn);
    if (code < 0) return 1;
    idx_out[w] = (int8_t)code;
    sgn_out[w] = (int8_t)sgn;
  }
  return 0;
}

}  // namespace tnaf

}  // namespace

// ----------------------- C ABI exports ------------------------------------
// Field elements cross the boundary as 4 little-endian u64 words; points
// as 12 words (X, Y, Z).

extern "C" {

void dv_fe_mul(const u64 *a, const u64 *b, u64 *out) {
  FE A, B;
  memcpy(A.w, a, 32);
  memcpy(B.w, b, 32);
  FE r = fe_mul(A, B);
  memcpy(out, r.w, 32);
}

void dv_fe_inv(const u64 *a, u64 *out) {
  FE A;
  memcpy(A.w, a, 32);
  FE r = fe_inv(A);
  memcpy(out, r.w, 32);
}

int dv_fe_trace(const u64 *a) {
  FE A;
  memcpy(A.w, a, 32);
  return fe_trace(A);
}

void dv_fe_halftrace(const u64 *a, u64 *out) {
  FE A;
  memcpy(A.w, a, 32);
  FE r = fe_halftrace(A);
  memcpy(out, r.w, 32);
}

void dv_pt_add(const u64 *p, const u64 *q, u64 *out) {
  PT P, Q;
  memcpy(&P, p, 96);
  memcpy(&Q, q, 96);
  PT R = pt_add(P, Q);
  memcpy(out, &R, 96);
}

void dv_pt_double(const u64 *p, u64 *out) {
  PT P;
  memcpy(&P, p, 96);
  PT R = pt_double(P);
  memcpy(out, &R, 96);
}

// [k]P for a 240-bit little-endian scalar and an affine input point;
// affine output.  One call covers the verifier's two scalar muls
// (reference: src/srs.rs:374-428 verifies via two xsk233 scalar muls) --
// the pure-python double-and-add oracle costs seconds per mul, this is
// sub-millisecond.
void dv_pt_smul(const uint8_t *k30, const u64 *xy_in, uint8_t inf_in,
                u64 *xy_out, uint8_t *inf_out) {
  PT acc = pt_inf();
  if (!inf_in) {
    PT P;
    memcpy(P.X.w, xy_in, 32);
    memcpy(P.Y.w, xy_in + 4, 32);
    P.Z = fe_one();
    int top = 239;
    while (top >= 0 && !((k30[top >> 3] >> (top & 7)) & 1)) top--;
    for (int i = top; i >= 0; i--) {
      acc = pt_double(acc);
      if ((k30[i >> 3] >> (i & 7)) & 1) acc = pt_add(acc, P);
    }
  }
  FE x, y;
  int inf;
  pt_to_affine(acc, x, y, inf);
  *inf_out = (uint8_t)inf;
  memcpy(xy_out, x.w, 32);
  memcpy(xy_out + 4, y.w, 32);
}

// batched affine normalization: n points (12 words each) -> 8 words (x, y)
// + inf flag bytes.  Montgomery batch inversion (one fe_inv + 3 muls per
// point per chunk) under OpenMP -- the reference parallelizes both sides
// of its vector IO with rayon (src/io_utils.rs:42-111, 153-226).
void dv_pt_batch_affine(const u64 *pts, int64_t n, u64 *xy_out,
                        uint8_t *inf_out) {
  constexpr int64_t CH = 4096;
#pragma omp parallel for schedule(dynamic)
  for (int64_t s = 0; s < n; s += CH) {
    const int64_t e = s + CH < n ? s + CH : n;
    const int64_t cnt = e - s;
    std::vector<FE> pref((size_t)cnt);
    FE run = fe_one();
    for (int64_t i = 0; i < cnt; i++) {
      FE z;
      memcpy(z.w, pts + 12 * (s + i) + 8, 32);
      if (!fe_is_zero(z)) run = fe_mul(run, z);
      pref[(size_t)i] = run;
    }
    FE inv = fe_inv(run);
    for (int64_t i = cnt - 1; i >= 0; i--) {
      PT P;
      memcpy(&P, pts + 12 * (s + i), 96);
      if (fe_is_zero(P.Z)) {
        inf_out[s + i] = 1;
        memset(xy_out + 8 * (s + i), 0, 64);
        continue;
      }
      FE prev = i ? pref[(size_t)i - 1] : fe_one();
      FE zi = fe_mul(inv, prev);
      inv = fe_mul(inv, P.Z);
      FE x = fe_mul(P.X, zi), y = fe_mul(P.Y, zi);
      inf_out[s + i] = 0;
      memcpy(xy_out + 8 * (s + i), x.w, 32);
      memcpy(xy_out + 8 * (s + i) + 4, y.w, 32);
    }
  }
}

// 30-byte compressed encode of affine (x, y); infinity -> all zero.
void dv_pt_encode(const u64 *xy, uint8_t inf, uint8_t *out30) {
  memset(out30, 0, 30);
  if (inf) return;
  FE x, y;
  memcpy(x.w, xy, 32);
  memcpy(y.w, xy + 4, 32);
  FE lam = fe_mul(y, fe_inv(x));
  uint8_t bytes[30];
  memset(bytes, 0, 30);
  memcpy(bytes, x.w, 30 < 32 ? 30 : 32);
  // x occupies bits 0..232; bit 233 = lam parity (byte 29, bit 1)
  bytes[29] = (uint8_t)((x.w[3] >> 40) & 1) | (uint8_t)((lam.w[0] & 1) << 1);
  memcpy(out30, bytes, 30);
}

// decode 30 bytes -> affine (x, y) + flags; returns 1 if valid.
int dv_pt_decode(const uint8_t *in30, u64 *xy_out, uint8_t *inf_out) {
  u64 acc[4] = {0, 0, 0, 0};
  uint8_t buf[32];
  memset(buf, 0, 32);
  memcpy(buf, in30, 30);
  memcpy(acc, buf, 32);
  int all_zero = 1;
  for (int i = 0; i < 4; i++)
    if (acc[i]) all_zero = 0;
  if (all_zero) {
    *inf_out = 1;
    memset(xy_out, 0, 64);
    return 1;
  }
  // bits 234..239 must be zero
  if (acc[3] >> 42) return 0;
  int lam_bit = (int)((acc[3] >> 41) & 1);
  FE x;
  memcpy(x.w, acc, 32);
  x.w[3] &= (1ULL << 41) - 1;
  if (fe_is_zero(x)) return 0;
  // z^2 + z = x + x^-2 ; solvable iff trace is 0
  FE c = fe_add(x, fe_inv(fe_sqr(x)));
  if (fe_trace(c) != 0) return 0;
  FE z = fe_halftrace(c);
  if ((int)(z.w[0] & 1) != lam_bit) z.w[0] ^= 1;  // pick the right root
  FE y = fe_mul(z, x);
  // subgroup membership: Tr(x)=0 and Tr(y + (lam+1)x) = 0
  if (fe_trace(x) != 0) return 0;
  FE lam = fe_halftrace(x);
  FE lam1 = lam;
  lam1.w[0] ^= 1;
  FE chk = fe_add(y, fe_mul(lam1, x));
  if (fe_trace(chk) != 0) return 0;
  *inf_out = 0;
  memcpy(xy_out, x.w, 32);
  memcpy(xy_out + 4, y.w, 32);
  return 1;
}

// bulk decode: returns number of invalid records (0 = all good)
int64_t dv_pt_decode_bulk(const uint8_t *in, int64_t n, u64 *xy_out,
                          uint8_t *inf_out) {
  int64_t bad = 0;
#pragma omp parallel for reduction(+ : bad) schedule(dynamic, 256)
  for (int64_t i = 0; i < n; i++) {
    if (!dv_pt_decode(in + 30 * i, xy_out + 8 * i, inf_out + i)) bad++;
  }
  return bad;
}

// bulk encode from affine pairs: the lambda-parity computation needs
// y/x per point -- batch-invert the x's per chunk (x = 0 never occurs
// for valid non-infinity subgroup points; fall back per point if it does).
void dv_pt_encode_bulk(const u64 *xy, const uint8_t *inf, int64_t n,
                       uint8_t *out) {
  constexpr int64_t CH = 4096;
#pragma omp parallel for schedule(dynamic)
  for (int64_t s = 0; s < n; s += CH) {
    const int64_t e = s + CH < n ? s + CH : n;
    const int64_t cnt = e - s;
    std::vector<FE> pref((size_t)cnt);
    FE run = fe_one();
    for (int64_t i = 0; i < cnt; i++) {
      FE x;
      memcpy(x.w, xy + 8 * (s + i), 32);
      if (!inf[s + i] && !fe_is_zero(x)) run = fe_mul(run, x);
      pref[(size_t)i] = run;
    }
    FE inv = fe_inv(run);
    for (int64_t i = cnt - 1; i >= 0; i--) {
      uint8_t *rec = out + 30 * (s + i);
      memset(rec, 0, 30);
      if (inf[s + i]) continue;
      FE x, y;
      memcpy(x.w, xy + 8 * (s + i), 32);
      memcpy(y.w, xy + 8 * (s + i) + 4, 32);
      FE xi;
      if (fe_is_zero(x)) {
        xi = fe_inv(x);  // = 0, matching dv_pt_encode's degenerate case
      } else {
        FE prev = i ? pref[(size_t)i - 1] : fe_one();
        xi = fe_mul(inv, prev);
        inv = fe_mul(inv, x);
      }
      FE lam = fe_mul(y, xi);
      memcpy(rec, x.w, 30);
      rec[29] = (uint8_t)((x.w[3] >> 40) & 1) | (uint8_t)((lam.w[0] & 1) << 1);
    }
  }
}

// ---- gnark R1CS dump row parsing (reference: src/gnark_r1cs.rs:3-20,
// rayon row loop :144-179).  Two-phase: meta() walks headers to size the
// outputs, parse() deinterleaves the (wire, coeff) term pairs into three
// per-matrix arrays.  Layout after the coeff table (all little-endian):
//   u32 nbRows; per row: u32 nL | u32 nR | u32 nO; (nL+nR+nO) x
//   (u32 wire_id, u32 coeff_id)

static inline uint32_t rd_u32(const uint8_t *p) {
  uint32_t v;
  memcpy(&v, p, 4);
  return v;
}

// rows_off: byte offset of the u32 nbRows field.  Returns 0 on success.
int dv_r1cs_meta(const uint8_t *data, int64_t len, int64_t rows_off,
                 int64_t *n_rows_out, int64_t *terms_out /* [3]: L, R, O */) {
  if (rows_off + 4 > len) return 1;
  int64_t n_rows = rd_u32(data + rows_off);
  int64_t off = rows_off + 4;
  int64_t tl = 0, tr = 0, to = 0;
  for (int64_t i = 0; i < n_rows; i++) {
    if (off + 12 > len) return 1;
    uint32_t nl = rd_u32(data + off), nr = rd_u32(data + off + 4),
             no = rd_u32(data + off + 8);
    off += 12 + 8 * (int64_t)(nl + (int64_t)nr + no);
    if (off > len) return 1;
    tl += nl;
    tr += nr;
    to += no;
  }
  *n_rows_out = n_rows;
  terms_out[0] = tl;
  terms_out[1] = tr;
  terms_out[2] = to;
  return 0;
}

// counts: u32[3 * n_rows] (nl, nr, no per row); lw/lc etc. sized by meta().
int dv_r1cs_parse(const uint8_t *data, int64_t len, int64_t rows_off,
                  uint32_t *counts, uint32_t *lw, uint32_t *lc, uint32_t *rw,
                  uint32_t *rc, uint32_t *ow, uint32_t *oc) {
  (void)len;
  int64_t n_rows = rd_u32(data + rows_off);
  int64_t off = rows_off + 4;
  uint32_t *wd[3] = {lw, rw, ow};
  uint32_t *cd[3] = {lc, rc, oc};
  for (int64_t i = 0; i < n_rows; i++) {
    uint32_t n3[3] = {rd_u32(data + off), rd_u32(data + off + 4),
                      rd_u32(data + off + 8)};
    off += 12;
    for (int k = 0; k < 3; k++) {
      counts[3 * i + k] = n3[k];
      uint32_t *w = wd[k], *c = cd[k];
      for (uint32_t t = 0; t < n3[k]; t++) {
        *w++ = rd_u32(data + off);
        *c++ = rd_u32(data + off + 4);
        off += 8;
      }
      wd[k] = w;
      cd[k] = c;
    }
  }
  return 0;
}

// bulk tau-NAF width-4 window recoding.  scalars: 32-byte LE canonical
// records; outputs: per scalar 62 window table indices + signs (int8).
// Returns the number of scalars that failed to recode (0 expected).
int64_t dv_tnaf_recode_bulk(const uint8_t *scalars, int64_t n,
                            int8_t *idx_out, int8_t *sgn_out) {
  int64_t bad = 0;
#pragma omp parallel for reduction(+ : bad) schedule(static)
  for (int64_t i = 0; i < n; i++) {
    if (tnaf::recode_one(scalars + 32 * i, idx_out + 62 * i,
                         sgn_out + 62 * i))
      bad++;
  }
  return bad;
}

// Recode directly to the bit-sliced ladder's operand layout: one-hot
// digit masks uint32[62][11][n/32] and negative-sign masks
// uint32[62][n/32] (bit j of group g = scalar 32 g + j).  Feeds
// ops/pallas_msm.py without the numpy packbits round trip.
// n must be a multiple of 32; zero-padded scalars recode to digit 0
// (= infinity table entry), which the complete add ignores.
int64_t dv_tnaf_recode_masks(const uint8_t *scalars, int64_t n,
                             uint32_t *onehot_out, uint32_t *neg_out) {
  const int64_t groups = n / 32;
  std::memset(onehot_out, 0, sizeof(uint32_t) * 62 * 11 * groups);
  std::memset(neg_out, 0, sizeof(uint32_t) * 62 * groups);
  int64_t bad = 0;
#pragma omp parallel for reduction(+ : bad) schedule(static)
  for (int64_t g = 0; g < groups; g++) {
    int8_t idx[62], sgn[62];
    for (int j = 0; j < 32; j++) {
      const int64_t i = 32 * g + j;
      if (tnaf::recode_one(scalars + 32 * i, idx, sgn)) {
        bad++;
        continue;
      }
      const uint32_t bit = uint32_t(1) << j;
      for (int w = 0; w < 62; w++) {
        onehot_out[(int64_t(w) * 11 + idx[w]) * groups + g] |= bit;
        if (sgn[w] < 0) neg_out[int64_t(w) * groups + g] |= bit;
      }
    }
  }
  return bad;
}

}  // extern "C"
