// Native k-mer index build: rolling-hash extraction + LSD radix sort.
//
// C++ replacement for the role of the reference's lookup-table build
// (reference: src/lookup_table/lookup_table.c:59-164 build_lookup_table and
// the multi-threaded radix sort src/lookup_table/hash_list_bucket_sort.c):
// emits (hash, position) pairs for every k-mer that does not span a read
// boundary, sorted by (hash, position), plus the top-bits bucket directory
// consumed by the device-side binary search (necat_tpu.index.kmer_index).
//
// The sort is a 2-pass LSD counting sort over the 2k hash bits (k <= 15 ->
// 30 bits, 15 bits per pass), parallelized with std::thread: each worker
// histograms and scatters its own slice with precomputed global offsets, so
// passes are stable and lock-free. Replaces np.argsort (O(n log n),
// measured ~8x slower at 100M k-mers).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 kmer_index_native.cpp -lpthread
//        -o _necat_kmer.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

struct HP {
    int32_t h;
    int32_t p;
};

int hw_threads() {
    unsigned n = std::thread::hardware_concurrency();
    return n ? (int)n : 2;
}

// One stable counting-sort pass on `bits` bits of (x.h >> shift), src -> dst.
void radix_pass(const HP* src, HP* dst, int64_t n, int shift, int bits,
                int n_threads) {
    const int64_t nb = (int64_t)1 << bits;
    const int32_t mask = (int32_t)(nb - 1);
    const int T = n_threads;
    std::vector<std::vector<int64_t>> cnt(T, std::vector<int64_t>(nb, 0));
    auto slice = [&](int t, int64_t& lo, int64_t& hi) {
        lo = n * t / T;
        hi = n * (t + 1) / T;
    };
    {
        std::vector<std::thread> ws;
        for (int t = 0; t < T; ++t)
            ws.emplace_back([&, t] {
                int64_t lo, hi;
                slice(t, lo, hi);
                auto& c = cnt[t];
                for (int64_t i = lo; i < hi; ++i)
                    ++c[(src[i].h >> shift) & mask];
            });
        for (auto& w : ws) w.join();
    }
    // exclusive global offsets: bucket-major, then thread order (stability)
    int64_t run = 0;
    std::vector<std::vector<int64_t>> off(T, std::vector<int64_t>(nb));
    for (int64_t b = 0; b < nb; ++b)
        for (int t = 0; t < T; ++t) {
            off[t][b] = run;
            run += cnt[t][b];
        }
    {
        std::vector<std::thread> ws;
        for (int t = 0; t < T; ++t)
            ws.emplace_back([&, t] {
                int64_t lo, hi;
                slice(t, lo, hi);
                auto& o = off[t];
                for (int64_t i = lo; i < hi; ++i)
                    dst[o[(src[i].h >> shift) & mask]++] = src[i];
            });
        for (auto& w : ws) w.join();
    }
}

}  // namespace

extern "C" {

void ntk_free(void* p) { free(p); }

// bases: u8 codes 0..3, offsets: i64[n_reads+1]. Returns 0 on success and
// malloc'd arrays (caller frees with ntk_free).
int ntk_build_kmer_index(const uint8_t* bases, int64_t n_bases,
                         const int64_t* offsets, int64_t n_reads, int k,
                         int n_bucket_bits, int n_threads,
                         int32_t** out_hashes, int32_t** out_positions,
                         int64_t* out_n, int64_t** out_bucket_starts) {
    if (k < 4 || k > 15 || n_bucket_bits < 1 || n_bucket_bits > 2 * k)
        return 1;
    if (n_threads <= 0) n_threads = hw_threads();
    (void)n_bases;

    // per-read k-mer counts -> output slots (parallel over read ranges)
    std::vector<int64_t> rstart(n_reads + 1, 0);
    for (int64_t r = 0; r < n_reads; ++r) {
        int64_t len = offsets[r + 1] - offsets[r];
        rstart[r + 1] = rstart[r] + (len >= k ? len - k + 1 : 0);
    }
    const int64_t M = rstart[n_reads];
    *out_n = M;
    HP* a = (HP*)malloc(sizeof(HP) * (size_t)std::max<int64_t>(M, 1));
    HP* b = (HP*)malloc(sizeof(HP) * (size_t)std::max<int64_t>(M, 1));
    if (!a || !b) {
        free(a);
        free(b);
        return 2;
    }

    const int32_t hmask = (int32_t)(((int64_t)1 << (2 * k)) - 1);
    {
        const int T = n_threads;
        std::vector<std::thread> ws;
        for (int t = 0; t < T; ++t)
            ws.emplace_back([&, t] {
                int64_t rlo = n_reads * t / T, rhi = n_reads * (t + 1) / T;
                for (int64_t r = rlo; r < rhi; ++r) {
                    const int64_t o = offsets[r];
                    const int64_t len = offsets[r + 1] - o;
                    if (len < k) continue;
                    int32_t h = 0;
                    for (int j = 0; j < k - 1; ++j)
                        h = (h << 2) | bases[o + j];
                    HP* w = a + rstart[r];
                    for (int64_t j = k - 1; j < len; ++j) {
                        h = ((h << 2) | bases[o + j]) & hmask;
                        w->h = h;
                        w->p = (int32_t)(o + j - (k - 1));
                        ++w;
                    }
                }
            });
        for (auto& w : ws) w.join();
    }

    // LSD: low bits then high bits (stable => positions ascending per hash)
    const int lo_bits = k;       // 2k bits split evenly
    const int hi_bits = k;
    radix_pass(a, b, M, 0, lo_bits, n_threads);
    radix_pass(b, a, M, lo_bits, hi_bits, n_threads);

    // bucket directory over the top n_bucket_bits
    const int shift = 2 * k - n_bucket_bits;
    const int64_t nbk = (int64_t)1 << n_bucket_bits;
    int64_t* bs = (int64_t*)calloc((size_t)nbk + 1, sizeof(int64_t));
    int32_t* oh = (int32_t*)malloc(sizeof(int32_t) * (size_t)std::max<int64_t>(M, 1));
    int32_t* op = (int32_t*)malloc(sizeof(int32_t) * (size_t)std::max<int64_t>(M, 1));
    if (!bs || !oh || !op) {
        free(a);
        free(b);
        free(bs);
        free(oh);
        free(op);
        return 2;
    }
    for (int64_t i = 0; i < M; ++i) {
        ++bs[(a[i].h >> shift) + 1];
        oh[i] = a[i].h;
        op[i] = a[i].p;
    }
    for (int64_t i = 0; i < nbk; ++i) bs[i + 1] += bs[i];
    free(a);
    free(b);
    *out_hashes = oh;
    *out_positions = op;
    *out_bucket_starts = bs;
    return 0;
}

}  // extern "C"
