// Banded global affine-gap alignment with CIGAR — native host kernel.
//
// C++ twin of cpu/ksw.py:ksw_global (the clean-room ksw_global2
// equivalent; role of libbwa's ksw.c consumed via mem_reg2aln at
// bwa.cpp:158). Python is the semantic reference and stays the test
// oracle; this native version runs the per-read CIGAR generation on the
// host finalize hot path (~1000x the Python speed). Must match the
// Python kernel bit-for-bit including tie-breaks (tests pin them).
//
// Compiled into libsais_tpu.so alongside the SA-IS builder.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr int32_t NEG_INF = -0x40000000;
}

extern "C" {

// Returns the alignment score; writes up to *n_cigar ops as len<<4|op
// (op: 0=M, 1=I, 2=D) into cigar_out. Returns NEG_INF on cap overflow.
int32_t ksw_global_c(
    int32_t qlen, const uint8_t* query, int32_t tlen, const uint8_t* target,
    const int8_t* mat /* 5x5 row-major */, int32_t o_del, int32_t e_del,
    int32_t o_ins, int32_t e_ins, int32_t w, uint32_t* cigar_out,
    int32_t cigar_cap, int32_t* n_cigar) {
    *n_cigar = 0;
    if (qlen == 0) {
        if (tlen > 0) {
            if (cigar_cap < 1) return NEG_INF;
            cigar_out[0] = (uint32_t)tlen << 4 | 2;
            *n_cigar = 1;
            return -(o_del + e_del * tlen);
        }
        return 0;
    }
    if (tlen == 0) {
        if (cigar_cap < 1) return NEG_INF;
        cigar_out[0] = (uint32_t)qlen << 4 | 1;
        *n_cigar = 1;
        return -(o_ins + e_ins * qlen);
    }
    const int32_t oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
    int32_t diff = tlen > qlen ? tlen - qlen : qlen - tlen;
    if (w < diff) w = diff;
    const int64_t n_col = (int64_t)qlen < 2LL * w + 1 ? qlen : 2LL * w + 1;

    std::vector<int32_t> h(qlen + 2), e(qlen + 2);
    std::vector<uint8_t> z((size_t)tlen * n_col);
    for (int32_t j = 0; j <= qlen + 1; ++j) h[j] = e[j] = NEG_INF;
    h[0] = 0;
    int32_t wcap = qlen < w ? qlen : w;
    for (int32_t j = 1; j <= wcap; ++j) h[j] = -(o_ins + e_ins * j);

    int32_t h1 = NEG_INF;
    for (int32_t i = 0; i < tlen; ++i) {
        int32_t f = NEG_INF;
        int32_t beg = i - w > 0 ? i - w : 0;
        int32_t end = i + w < qlen - 1 ? i + w : qlen - 1;  // inclusive
        h1 = beg == 0 ? -(o_del + e_del * (i + 1)) : NEG_INF;
        const int8_t* q = &mat[(size_t)target[i] * 5];
        uint8_t* zi = &z[(size_t)i * n_col];
        for (int32_t j = beg; j <= end; ++j) {
            int32_t M = h[j], ecur = e[j];
            uint8_t d;
            h[j] = h1;
            M += q[query[j]];
            d = M >= ecur ? 0 : 1;
            int32_t hh = M >= ecur ? M : ecur;
            d = hh >= f ? d : 2;
            hh = hh >= f ? hh : f;
            h1 = hh;
            int32_t t = M - oe_del;
            ecur -= e_del;
            d |= ecur > t ? 1 << 2 : 0;
            ecur = ecur > t ? ecur : t;
            e[j] = ecur;
            t = M - oe_ins;
            f -= e_ins;
            d |= f > t ? 2 << 4 : 0;
            f = f > t ? f : t;
            zi[j - beg] = d;
        }
        h[end + 1] = h1;
        e[end + 1] = NEG_INF;
    }
    const int32_t score = h1;

    // traceback (matches the Python kernel's state machine)
    std::vector<uint8_t> ops;
    ops.reserve(qlen + tlen);
    int which = 0;
    int32_t i = tlen - 1, k = qlen - 1;
    while (i >= 0 && k >= 0) {
        int32_t beg = i - w > 0 ? i - w : 0;
        uint8_t tmp = z[(size_t)i * n_col + (k - beg)];
        which = tmp >> (which << 1) & 3;
        if (which == 0) {
            ops.push_back(0);
            --i;
            --k;
        } else if (which == 1) {
            ops.push_back(2);
            --i;
        } else {
            ops.push_back(1);
            --k;
        }
    }
    while (i >= 0) ops.push_back(2), --i;
    while (k >= 0) ops.push_back(1), --k;

    // run-length encode in forward order
    int32_t n = 0;
    for (int64_t p = (int64_t)ops.size() - 1; p >= 0;) {
        uint8_t op = ops[p];
        int32_t run = 0;
        while (p >= 0 && ops[p] == op) ++run, --p;
        if (n >= cigar_cap) return NEG_INF;
        cigar_out[n++] = (uint32_t)run << 4 | op;
    }
    *n_cigar = n;
    return score;
}

}  // extern "C"
