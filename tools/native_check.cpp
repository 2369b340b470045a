// Sanitizer test driver for the native kernels (run via `make
// native-sanitize`): exercises SA-IS on random/degenerate inputs against
// a naive suffix-array oracle and ksw_global on random pairs, under
// ASan/UBSan (-fno-sanitize-recover: any finding aborts).
#include <algorithm>
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <vector>

extern "C" int sais_u8_i32(const uint8_t* T, int32_t n, int32_t* SA);
extern "C" int32_t ksw_global_c(int32_t, const uint8_t*, int32_t, const uint8_t*,
                                const int8_t*, int32_t, int32_t, int32_t,
                                int32_t, int32_t, uint32_t*, int32_t, int32_t*);
extern "C" void reg2aln1_batch_c(
    int32_t n_rows, const uint8_t* qq, int64_t q_stride, const uint8_t* rr,
    int64_t r_stride, const int32_t* Lq, const int32_t* Lt,
    const int32_t* truesc, const int32_t* w_reg, const int32_t* clip5,
    const int32_t* clip3, const int8_t* mat, int32_t o_del, int32_t e_del,
    int32_t o_ins, int32_t e_ins, int32_t a, int32_t bw, char* text,
    int64_t text_stride, int32_t* cig_len, int32_t* md_len, int32_t* nm_out,
    int32_t* lead_d, int32_t* ref_consumed, int32_t* status);

static void naive_sa(const std::vector<uint8_t>& t, std::vector<int32_t>& sa) {
    int n = (int)t.size();
    sa.resize(n + 1);
    for (int i = 0; i <= n; ++i) sa[i] = i;
    std::sort(sa.begin(), sa.end(), [&](int a, int b) {
        return std::lexicographical_compare(t.begin() + a, t.end(),
                                            t.begin() + b, t.end());
    });
}

int main() {
    std::mt19937 rng(42);
    // SA-IS vs naive on random + degenerate strings
    for (int trial = 0; trial < 300; ++trial) {
        int n = trial < 250 ? (int)(rng() % 80) : (int)(rng() % 2000);
        std::vector<uint8_t> t(n);
        int alpha = 1 + rng() % 4;
        for (auto& c : t) c = rng() % alpha;
        std::vector<int32_t> sa(n + 1), want;
        assert(sais_u8_i32(t.data(), n, sa.data()) == 0);
        naive_sa(t, want);
        assert(std::equal(sa.begin(), sa.end(), want.begin()));
    }
    // ksw_global on random pairs (bounds/overflow hygiene)
    int8_t mat[25];
    for (int i = 0; i < 25; ++i) mat[i] = -1;
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j) mat[i * 5 + j] = i == j ? 1 : -4;
    for (int trial = 0; trial < 300; ++trial) {
        int ql = 1 + rng() % 120, tl = 1 + rng() % 120;
        std::vector<uint8_t> q(ql), t(tl);
        for (auto& c : q) c = rng() % 4;
        for (auto& c : t) c = rng() % 4;
        std::vector<uint32_t> cig(ql + tl + 2);
        int32_t n_cig = 0;
        int w = 1 + rng() % 40;
        ksw_global_c(ql, q.data(), tl, t.data(), mat, 6, 1, 6, 1, w,
                     cig.data(), (int32_t)cig.size(), &n_cig);
        int qc = 0, tc = 0;
        for (int i = 0; i < n_cig; ++i) {
            int len = cig[i] >> 4, op = cig[i] & 0xF;
            if (op == 0) qc += len, tc += len;
            else if (op == 1) qc += len;
            else tc += len;
        }
        assert(qc == ql && tc == tl);
    }
    // reg2aln1_batch on random windows (bounds/overflow hygiene; the
    // Python oracle pins semantics — here we check memory safety and
    // that cigar query/target consumption balances the inputs)
    for (int trial = 0; trial < 50; ++trial) {
        int n_rows = 1 + rng() % 32;
        int Wq = 8 + rng() % 150, Wt = Wq + rng() % 32;
        std::vector<uint8_t> qq(n_rows * Wq), rr(n_rows * Wt);
        for (auto& c : qq) c = rng() % 5;
        for (auto& c : rr) c = rng() % 4;
        std::vector<int32_t> Lq(n_rows), Lt(n_rows), truesc(n_rows),
            w_reg(n_rows), clip5(n_rows), clip3(n_rows);
        for (int i = 0; i < n_rows; ++i) {
            Lq[i] = 1 + rng() % Wq;
            Lt[i] = 1 + rng() % Wt;
            truesc[i] = (int)(rng() % (Lq[i] + 1));
            w_reg[i] = rng() % 100;
            clip5[i] = rng() % 10;
            clip3[i] = rng() % 10;
        }
        int64_t stride = 8 * (Wq + Wt) + 128;
        std::vector<char> text(n_rows * stride);
        std::vector<int32_t> cl(n_rows), ml(n_rows), nm(n_rows), ld(n_rows),
            rc(n_rows), st(n_rows);
        reg2aln1_batch_c(n_rows, qq.data(), Wq, rr.data(), Wt, Lq.data(),
                         Lt.data(), truesc.data(), w_reg.data(), clip5.data(),
                         clip3.data(), mat, 6, 1, 6, 1, 1, 100, text.data(),
                         stride, cl.data(), ml.data(), nm.data(), ld.data(),
                         rc.data(), st.data());
        for (int i = 0; i < n_rows; ++i) {
            assert(st[i] == 0);
            assert(cl[i] > 0 && ml[i] > 0);
            assert(rc[i] >= 0 && rc[i] <= Lt[i]);
            // parse the cigar text back: S consumes neither here; M/I
            // consume query; M/D consume target (after D-squeeze the
            // target consumption is Lt - leading - trailing Ds)
            int qc = 0, run = 0;
            const char* p = text.data() + i * stride;
            for (int j = 0; j < cl[i]; ++j) {
                char ch = p[j];
                if (ch >= '0' && ch <= '9') run = run * 10 + (ch - '0');
                else {
                    if (ch == 'M' || ch == 'I' || ch == 'S') qc += run;
                    assert(ch == 'M' || ch == 'I' || ch == 'D' || ch == 'S');
                    run = 0;
                }
            }
            assert(qc == Lq[i] + clip5[i] + clip3[i]);
        }
    }
    printf("native sanitize check: OK\n");
    return 0;
}
