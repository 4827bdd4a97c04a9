// Adaptive Rice/Golomb entropy codec for quantized wavelet detail planes.
//
// The reference project has no codec at all (SURVEY.md §0; wicca only keeps
// the LL branch). This is the host-side entropy stage of the TPU codec
// pipeline (SURVEY.md §2 note: native components are mandated by the north
// star, with the reference defining only the numerical contract): the TPU
// produces deadzone int8/int16 codes (wicca_tpu/ops/dwt_pallas.py), this
// library turns them into a compact bitstream and back, bit-exactly.
//
// Scheme: zigzag map to unsigned, then per-block (B=512) coding in one of
// two modes (1 header bit + 5-bit Rice parameter):
//   mode 0 — plain Rice: unary quotient (capped at ESCAPE -> raw value)
//            plus k low bits, k chosen from the block's mean magnitude.
//   mode 1 — zero-run: Elias-gamma zero-run lengths alternating with
//            Rice-coded (value-1) for the nonzeros; chosen when >=3/4 of
//            the block is zero. Deadzone detail planes are overwhelmingly
//            zero, and runs push the rate well below 1 bit/value, close to
//            the order-0 Shannon bound measured by
//            codec/pipeline.estimated_entropy_bytes.
//
// C ABI (ctypes): all functions return the number of bytes written/read,
// or 0 on error (insufficient capacity / malformed stream).

#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

constexpr int BLOCK = 512;
constexpr uint32_t ESCAPE_Q = 20;  // unary quotient cap before raw escape

// 64-bit accumulators: the writer flushes 4 bytes per spill (unaligned
// store), the reader refills 8 bytes at a time and decodes unary runs with
// one ctz instead of bit-by-bit loops. The emitted BITSTREAM is identical
// to the original byte-at-a-time implementation (LSB-first packing).
struct BitWriter {
    uint8_t* out;
    size_t cap;
    size_t byte = 0;
    uint64_t acc = 0;
    int nbits = 0;
    bool overflow = false;

    inline void put(uint32_t bits, int n) {  // n <= 32
        acc |= static_cast<uint64_t>(bits) << nbits;
        nbits += n;
        if (nbits >= 32) {
            if (byte + 4 > cap) { overflow = true; nbits &= 31; return; }
            uint32_t w = static_cast<uint32_t>(acc);
            std::memcpy(out + byte, &w, 4);
            byte += 4;
            acc >>= 32;
            nbits -= 32;
        }
    }
    size_t finish() {
        while (nbits > 0) {
            if (byte >= cap) { overflow = true; return 0; }
            out[byte++] = static_cast<uint8_t>(acc & 0xff);
            acc >>= 8;
            nbits -= 8;
        }
        return overflow ? 0 : byte;
    }
};

struct BitReader {
    const uint8_t* in;
    size_t len;
    size_t byte = 0;
    uint64_t acc = 0;
    int nbits = 0;
    bool error = false;

    inline void refill() {
        if (byte + 8 <= len) {
            // whole-word refill: OR 8 bytes at the current offset, advance
            // only by the bytes that fit. Bits shifted past 64 are lost but
            // re-ORed identically on the next refill (acc only ever shifts
            // right, so its stale top bits always match the stream).
            uint64_t w;
            std::memcpy(&w, in + byte, 8);
            acc |= w << nbits;
            int take = (63 - nbits) >> 3;
            byte += take;
            nbits += take * 8;
            return;
        }
        while (nbits <= 56 && byte < len) {
            acc |= static_cast<uint64_t>(in[byte++]) << nbits;
            nbits += 8;
        }
    }
    inline uint32_t get(int n) {
        if (nbits < n) {
            refill();
            if (nbits < n) { error = true; return 0; }
        }
        uint32_t v = static_cast<uint32_t>(acc & ((n == 32) ? 0xffffffffu : ((1u << n) - 1u)));
        acc >>= n;
        nbits -= n;
        return v;
    }
    inline uint32_t get_unary(uint32_t cap_q) {
        uint32_t q = 0;
        for (;;) {
            if (nbits == 0) {
                refill();
                if (nbits == 0) { error = true; return 0; }
            }
            uint64_t mask = (nbits >= 64) ? ~0ull : ((1ull << nbits) - 1ull);
            uint64_t inv = (~acc) & mask;  // zero-bit positions
            int run = inv ? __builtin_ctzll(inv) : nbits;  // leading ones
            if (q + static_cast<uint32_t>(run) >= cap_q) {
                int used = static_cast<int>(cap_q - q);  // escape: cap ones, no terminator
                acc >>= used;
                nbits -= used;
                return cap_q;
            }
            if (inv) {
                acc >>= run;  // two shifts: run + 1 may be 64 (shift-width UB)
                acc >>= 1;
                nbits -= (run + 1);
                return q + static_cast<uint32_t>(run);
            }
            q += static_cast<uint32_t>(run);  // buffer was all ones
            acc = 0;
            nbits = 0;
        }
    }
};

inline uint32_t zigzag32(int32_t v) {
    return (static_cast<uint32_t>(v) << 1) ^ static_cast<uint32_t>(v >> 31);
}
inline int32_t unzigzag32(uint32_t u) {
    return static_cast<int32_t>(u >> 1) ^ -static_cast<int32_t>(u & 1);
}

// pick k from the block's mean unsigned magnitude
inline int pick_k(const uint32_t* u, int n) {
    uint64_t sum = 0;
    for (int i = 0; i < n; i++) sum += u[i];
    if (sum == 0) return 0;
    double mean = static_cast<double>(sum) / n;
    int k = 0;
    while ((1u << (k + 1)) < mean + 1 && k < 30) k++;
    return k;
}

inline void put_gamma(BitWriter& bw, uint32_t v) {
    // Elias gamma for v >= 1: (len-1) ones, a zero, then the low len-1 bits
    // (v <= BLOCK+1 here, so 2*len-1 <= 21 bits -> single put)
    int len = 1;
    while ((v >> len) != 0) len++;
    uint32_t low = v & ((1u << (len - 1)) - 1u);
    bw.put((low << len) | ((1u << (len - 1)) - 1u), 2 * len - 1);
}

inline uint32_t get_gamma(BitReader& br) {
    int ext = 0;
    while (br.get(1)) {
        ext++;
        if (br.error || ext > 31) { br.error = true; return 0; }
    }
    uint32_t low = ext ? br.get(ext) : 0;
    return (1u << ext) | low;
}

template <int RAWBITS>
inline void put_rice(BitWriter& bw, uint32_t u, int k) {
    uint32_t q = u >> k;
    if (q >= ESCAPE_Q) {
        bw.put((1u << ESCAPE_Q) - 1u, ESCAPE_Q);  // cap_q ones
        bw.put(u, RAWBITS + 1);                   // raw zigzag value
    } else {
        int n = static_cast<int>(q) + 1 + k;
        uint32_t low = k ? (u & ((1u << k) - 1u)) : 0u;
        if (n <= 32) {  // fuse ones + terminator + remainder into one put
            bw.put(((low << q) << 1) | ((1u << q) - 1u), n);
        } else {
            if (q) bw.put((1u << q) - 1u, static_cast<int>(q));
            bw.put(low << 1, k + 1);
        }
    }
}

template <int RAWBITS>
uint32_t get_rice(BitReader& br, int k) {
    uint32_t q = br.get_unary(ESCAPE_Q);
    if (q >= ESCAPE_Q) return br.get(RAWBITS + 1);
    uint32_t low = k ? br.get(k) : 0;
    return (q << k) | low;
}

template <typename T, int RAWBITS>
size_t encode_impl(const T* codes, size_t n, uint8_t* out, size_t cap) {
    BitWriter bw{out, cap};
    uint32_t u[BLOCK];
    for (size_t start = 0; start < n; start += BLOCK) {
        int blk = static_cast<int>(std::min<size_t>(BLOCK, n - start));
        int zeros = 0;
        for (int i = 0; i < blk; i++) {
            u[i] = zigzag32(static_cast<int32_t>(codes[start + i]));
            if (u[i] == 0) zeros++;
        }
        bool zero_run = zeros * 4 >= blk * 3;
        if (zero_run) {
            // k from the nonzero values' (value-1) mean
            uint32_t nz[BLOCK];
            int m = 0;
            for (int i = 0; i < blk; i++)
                if (u[i]) nz[m++] = u[i] - 1;
            int k = m ? pick_k(nz, m) : 0;
            bw.put(1, 1);
            bw.put(static_cast<uint32_t>(k), 5);
            int i = 0;
            while (i < blk) {
                int run = 0;
                while (i + run < blk && u[i + run] == 0) run++;
                put_gamma(bw, static_cast<uint32_t>(run + 1));
                i += run;
                if (i < blk) {
                    put_rice<RAWBITS>(bw, u[i] - 1, k);
                    i++;
                }
                if (bw.overflow) return 0;
            }
        } else {
            int k = pick_k(u, blk);
            bw.put(0, 1);
            bw.put(static_cast<uint32_t>(k), 5);
            for (int i = 0; i < blk; i++) {
                put_rice<RAWBITS>(bw, u[i], k);
                if (bw.overflow) return 0;
            }
        }
    }
    return bw.finish();
}

template <typename T, int RAWBITS>
size_t decode_impl(const uint8_t* in, size_t len, T* codes, size_t n) {
    BitReader br{in, len};
    for (size_t start = 0; start < n; start += BLOCK) {
        int blk = static_cast<int>(std::min<size_t>(BLOCK, n - start));
        bool zero_run = br.get(1) != 0;
        int k = static_cast<int>(br.get(5));
        if (br.error || k > 30) return 0;
        if (zero_run) {
            int i = 0;
            while (i < blk) {
                uint32_t run = get_gamma(br) - 1;
                if (br.error || run > static_cast<uint32_t>(blk - i)) return 0;
                for (uint32_t r = 0; r < run; r++) codes[start + i + r] = 0;
                i += static_cast<int>(run);
                if (i < blk) {
                    uint32_t u = get_rice<RAWBITS>(br, k) + 1;
                    if (br.error) return 0;
                    codes[start + i] = static_cast<T>(unzigzag32(u));
                    i++;
                }
            }
        } else {
            for (int i = 0; i < blk; i++) {
                uint32_t u = get_rice<RAWBITS>(br, k);
                if (br.error) return 0;
                codes[start + i] = static_cast<T>(unzigzag32(u));
            }
        }
    }
    return br.byte;
}

}  // namespace

extern "C" {

size_t wicca_rice_encode_i8(const int8_t* codes, size_t n, uint8_t* out, size_t cap) {
    return encode_impl<int8_t, 8>(codes, n, out, cap);
}
size_t wicca_rice_decode_i8(const uint8_t* in, size_t len, int8_t* codes, size_t n) {
    return decode_impl<int8_t, 8>(in, len, codes, n);
}
size_t wicca_rice_encode_i16(const int16_t* codes, size_t n, uint8_t* out, size_t cap) {
    return encode_impl<int16_t, 16>(codes, n, out, cap);
}
size_t wicca_rice_decode_i16(const uint8_t* in, size_t len, int16_t* codes, size_t n) {
    return decode_impl<int16_t, 16>(in, len, codes, n);
}

}  // extern "C"
