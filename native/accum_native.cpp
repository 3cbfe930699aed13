// Native runtime helpers for accumulation_tpu.
//
// The reference's performance-critical native substance is the arkworks
// algebra stack (Rust, SURVEY.md §2.2); this framework's compute path is
// JAX/XLA on TPU, and this C++ module provides the host-side native pieces:
//   * a reference 256-bit Montgomery field implementation (4x64-bit limbs,
//     CIOS) used as the golden-vector source for the device kernels;
//   * bulk codec conversions (16-bit device limb layout <-> canonical
//     little-endian bytes) for the serialization layer;
//   * batched Montgomery <-> canonical conversions on the host.
//
// Built as a plain shared library, loaded via ctypes (no pybind11 in this
// environment).  All functions use raw pointers + element counts.

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// 256-bit arithmetic on 4x64-bit limbs (little-endian)
// ---------------------------------------------------------------------------

typedef unsigned __int128 u128;

struct Fp256 {
  uint64_t limb[4];
};

static inline void add_nocarry(uint64_t* a, const uint64_t* b) {
  u128 carry = 0;
  for (int i = 0; i < 4; i++) {
    u128 t = (u128)a[i] + b[i] + carry;
    a[i] = (uint64_t)t;
    carry = t >> 64;
  }
}

static inline uint64_t sub_borrow(uint64_t* a, const uint64_t* b) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 t = (u128)a[i] - b[i] - borrow;
    a[i] = (uint64_t)t;
    borrow = (t >> 64) ? 1 : 0;
  }
  return (uint64_t)borrow;
}

static inline int geq(const uint64_t* a, const uint64_t* b) {
  for (int i = 3; i >= 0; i--) {
    if (a[i] > b[i]) return 1;
    if (a[i] < b[i]) return 0;
  }
  return 1;
}

static inline void cond_sub(uint64_t* a, const uint64_t* p) {
  if (geq(a, p)) {
    uint64_t tmp[4];
    std::memcpy(tmp, a, sizeof tmp);
    sub_borrow(tmp, p);
    std::memcpy(a, tmp, sizeof tmp);
  }
}

// CIOS Montgomery multiplication: out = a * b * R^{-1} mod p, R = 2^256.
// pinv = -p^{-1} mod 2^64.
static void mont_mul_one(const uint64_t* a, const uint64_t* b,
                         const uint64_t* p, uint64_t pinv, uint64_t* out) {
  uint64_t t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 v = (u128)a[i] * b[j] + t[j] + carry;
      t[j] = (uint64_t)v;
      carry = v >> 64;
    }
    u128 v = (u128)t[4] + carry;
    t[4] = (uint64_t)v;
    t[5] = (uint64_t)(v >> 64);

    uint64_t m = t[0] * pinv;
    carry = ((u128)m * p[0] + t[0]) >> 64;
    for (int j = 1; j < 4; j++) {
      u128 w = (u128)m * p[j] + t[j] + carry;
      t[j - 1] = (uint64_t)w;
      carry = w >> 64;
    }
    v = (u128)t[4] + carry;
    t[3] = (uint64_t)v;
    t[4] = t[5] + (uint64_t)(v >> 64);
    t[5] = 0;
  }
  std::memcpy(out, t, 4 * sizeof(uint64_t));
  cond_sub(out, p);
}

// Batched: all arrays are n*4 uint64 little-endian limbs.
void mont_mul_batch(const uint64_t* a, const uint64_t* b, const uint64_t* p,
                    uint64_t pinv, uint64_t* out, int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    mont_mul_one(a + 4 * i, b + 4 * i, p, pinv, out + 4 * i);
  }
}

void add_mod_batch(const uint64_t* a, const uint64_t* b, const uint64_t* p,
                   uint64_t* out, int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    uint64_t t[4];
    std::memcpy(t, a + 4 * i, sizeof t);
    uint64_t t2[4];
    std::memcpy(t2, b + 4 * i, sizeof t2);
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 v = (u128)t[j] + t2[j] + carry;
      t[j] = (uint64_t)v;
      carry = v >> 64;
    }
    // a + b < 2p < 2^256 for 255-bit p, so no overflow past limb 3
    cond_sub(t, p);
    std::memcpy(out + 4 * i, t, sizeof t);
  }
}

void sub_mod_batch(const uint64_t* a, const uint64_t* b, const uint64_t* p,
                   uint64_t* out, int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    uint64_t t[4];
    std::memcpy(t, a + 4 * i, sizeof t);
    if (sub_borrow(t, b + 4 * i)) {
      add_nocarry(t, p);
    }
    std::memcpy(out + 4 * i, t, sizeof t);
  }
}

// ---------------------------------------------------------------------------
// codec: device 16-bit limb layout (uint32 lanes) <-> canonical LE bytes
// ---------------------------------------------------------------------------

// limbs: n * 16 uint32 values each < 2^16 -> bytes: n * 32 uint8 (LE)
void limbs16_to_bytes(const uint32_t* limbs, uint8_t* bytes, int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    const uint32_t* src = limbs + 16 * i;
    uint8_t* dst = bytes + 32 * i;
    for (int j = 0; j < 16; j++) {
      dst[2 * j] = (uint8_t)(src[j] & 0xFF);
      dst[2 * j + 1] = (uint8_t)((src[j] >> 8) & 0xFF);
    }
  }
}

void bytes_to_limbs16(const uint8_t* bytes, uint32_t* limbs, int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* src = bytes + 32 * i;
    uint32_t* dst = limbs + 16 * i;
    for (int j = 0; j < 16; j++) {
      dst[j] = (uint32_t)src[2 * j] | ((uint32_t)src[2 * j + 1] << 8);
    }
  }
}

}  // extern "C"
