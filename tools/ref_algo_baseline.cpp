// Reference-algorithm baseline probe (measurement stand-in ONLY).
//
// BASELINE.md's vs_baseline denominator is the repo's own single-core
// C++ kernel (native/fastbits.cpp).  The reference's actual bit kernel
// is Go (ref go/bit/bit.go:100-131: per-element byte loops through an
// 8-byte staging buffer and a 9-byte transfer buffer, OR-merged a byte
// at a time) and no Go toolchain exists in this image, so to pin
// whether the C++ stand-in is a FAIR (conservative) proxy we measure a
// C++ transliteration of the reference's loop STRUCTURE under the same
// compiler/flags/host as the stand-in and compare.
//
// DISCLOSED DERIVATIVE: pack_ref_style below deliberately mirrors the
// Go algorithm (staging buffer -> shifted transfer buffer -> per-byte
// OR), because measuring that algorithm is its entire purpose.  It is
// a tools-only probe; nothing in minnow_tpu/ uses it.
//
// Build+run: tools/ref_algo_baseline.py

#include <cstdint>
#include <cstring>

extern "C" {

// The reference pack algorithm, structurally transliterated
// (ref go/bit/bit.go:100-131).
void ref_style_pack(const uint64_t* x, int64_t n, int bits,
                    uint8_t* out) {
    uint8_t buf[8], tbuf[9];
    uint64_t buf_bytes = (uint64_t)(bits / 8);
    if (buf_bytes * 8 < (uint64_t)bits) buf_bytes++;
    const uint64_t mask = (~(uint64_t)0) >> (64 - bits);
    for (int64_t i = 0; i < n; i++) {
        uint64_t xi = x[i] & mask;
        uint64_t curr_bit = (uint64_t)((i * bits) % 8);
        for (uint64_t j = 0; j < buf_bytes; j++)
            buf[j] = (uint8_t)(xi >> (8 * j));
        tbuf[buf_bytes] = 0;
        for (uint64_t j = 0; j < buf_bytes; j++)
            tbuf[j] = (uint8_t)(buf[j] << curr_bit);
        if (curr_bit) {
            for (uint64_t j = 0; j < buf_bytes; j++)
                tbuf[j + 1] |= (uint8_t)(buf[j] >> (8 - curr_bit));
        }
        int64_t start_byte = i * bits / 8;
        int64_t end_byte = ((i + 1) * bits - 1) / 8;
        for (int64_t j = 0; j < end_byte - start_byte + 1; j++)
            out[start_byte + j] |= tbuf[j];
    }
}

// The reference unpack algorithm, structurally transliterated
// (ref go/bit/bit.go:41-81: per-element byte gather + shift-merge).
void ref_style_unpack(const uint8_t* in, int64_t n, int bits,
                      uint64_t* out) {
    uint8_t buf[9];
    const uint64_t mask = (~(uint64_t)0) >> (64 - bits);
    for (int64_t i = 0; i < n; i++) {
        int64_t start_bit = i * (int64_t)bits;
        int64_t start_byte = start_bit / 8;
        int64_t end_byte = (start_bit + bits - 1) / 8;
        int64_t nb = end_byte - start_byte + 1;
        for (int64_t j = 0; j < nb; j++)
            buf[j] = in[start_byte + j];
        uint64_t shift = (uint64_t)(start_bit % 8);
        uint64_t v = 0;
        for (int64_t j = 0; j < nb; j++)
            v |= ((uint64_t)buf[j]) << (8 * j);
        out[i] = (v >> shift) & mask;
    }
}

}  // extern "C"
