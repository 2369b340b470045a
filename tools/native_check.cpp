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
    printf("native sanitize check: OK\n");
    return 0;
}
