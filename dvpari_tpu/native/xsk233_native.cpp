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

// carry-less 64x64 -> 128 via 4-bit windowed shifts (portable, no PCLMUL
// dependency; called out of hot device paths so portability wins).
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

inline FE fe_sqr(const FE &a) { return fe_mul(a, a); }

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

// batched affine normalization: n points (12 words each) -> 8 words (x, y)
// + inf flag bytes
void dv_pt_batch_affine(const u64 *pts, int64_t n, u64 *xy_out,
                        uint8_t *inf_out) {
  for (int64_t i = 0; i < n; i++) {
    PT P;
    memcpy(&P, pts + 12 * i, 96);
    FE x, y;
    int inf;
    pt_to_affine(P, x, y, inf);
    memcpy(xy_out + 8 * i, x.w, 32);
    memcpy(xy_out + 8 * i + 4, y.w, 32);
    inf_out[i] = (uint8_t)inf;
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
  for (int64_t i = 0; i < n; i++) {
    if (!dv_pt_decode(in + 30 * i, xy_out + 8 * i, inf_out + i)) bad++;
  }
  return bad;
}

// bulk encode from affine pairs
void dv_pt_encode_bulk(const u64 *xy, const uint8_t *inf, int64_t n,
                       uint8_t *out) {
  for (int64_t i = 0; i < n; i++) {
    dv_pt_encode(xy + 8 * i, inf[i], out + 30 * i);
  }
}

}  // extern "C"
