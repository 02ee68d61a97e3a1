// Native helpers for the validator's alignment core (utils/align.py).
// Loaded via ctypes (align_native.py); everything degrades to numpy/python
// when the library is absent. Parity tested in tests/test_native.py.
//
// tel_radix_argsort_kmers: LSD radix sort of packed k-mers (int64 keys, all
//   non-negative, significant bits = 2k <= 62) emitting int32 positions in
//   sorted-key order plus the sorted keys. Replaces np.argsort + two fancy
//   gathers — the dominant serial cost of KmerIndex.build at genome scale
//   (comparison sort on 300M keys). Order among equal keys is the stable
//   original order (stronger than the unstable np.argsort it replaces;
//   lookup_unique only reads positions of unique keys, so any order is valid).
//
// tel_lis_chain: longest strictly-increasing subsequence (patience sorting),
//   byte-identical index output to utils/align.py lis_chain (ties resolved to
//   the earliest candidates).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Sorts by the low `bits` bits of each key (callers pass 2*k). pos_out gets
// the argsort permutation; keys_out the keys in sorted order.
void tel_radix_argsort_kmers(const int64_t* keys, int64_t n, int bits,
                             int32_t* pos_out, int64_t* keys_out) {
    std::vector<int64_t> kbuf(n);
    std::vector<int32_t> pbuf(n);
    int64_t* ka = kbuf.data();
    int32_t* pa = pbuf.data();
    int64_t* kb = keys_out;
    int32_t* pb = pos_out;
    int passes = (bits + 7) / 8;

    // pass 0 reads the const input, generating identity positions on the fly
    {
        int64_t count[256] = {0};
        for (int64_t i = 0; i < n; i++) count[keys[i] & 0xFF]++;
        int64_t sum = 0, offs[256];
        for (int b = 0; b < 256; b++) { offs[b] = sum; sum += count[b]; }
        for (int64_t i = 0; i < n; i++) {
            int64_t o = offs[keys[i] & 0xFF]++;
            ka[o] = keys[i];
            pa[o] = (int32_t)i;
        }
    }
    // passes 1..P-1 ping-pong (ka,pa) <-> (kb,pb)
    for (int p = 1; p < passes; p++) {
        int shift = p * 8;
        int64_t count[256] = {0};
        for (int64_t i = 0; i < n; i++) count[(ka[i] >> shift) & 0xFF]++;
        int64_t sum = 0, offs[256];
        for (int b = 0; b < 256; b++) { offs[b] = sum; sum += count[b]; }
        for (int64_t i = 0; i < n; i++) {
            int64_t o = offs[(ka[i] >> shift) & 0xFF]++;
            kb[o] = ka[i];
            pb[o] = pa[i];
        }
        std::swap(ka, kb);
        std::swap(pa, pb);
    }
    // results live in (ka, pa)
    if (ka != keys_out)
        std::memcpy(keys_out, ka, (size_t)n * sizeof(int64_t));
    if (pa != pos_out)
        std::memcpy(pos_out, pa, (size_t)n * sizeof(int32_t));
}

// Patience-sorting LIS over int64 values; returns chain length, indices in
// out (ascending). Exact port of utils/align.py lis_chain.
int64_t tel_lis_chain(const int64_t* values, int64_t n, int64_t* out) {
    if (n == 0) return 0;
    std::vector<int64_t> tails;       // smallest tail value per run length
    std::vector<int64_t> tails_idx;
    std::vector<int64_t> parent(n, -1);
    tails.reserve(1024); tails_idx.reserve(1024);
    for (int64_t i = 0; i < n; i++) {
        int64_t v = values[i];
        // bisect_left
        size_t lo = 0, hi = tails.size();
        while (lo < hi) {
            size_t mid = (lo + hi) / 2;
            if (tails[mid] < v) lo = mid + 1; else hi = mid;
        }
        if (lo == tails.size()) { tails.push_back(v); tails_idx.push_back(i); }
        else { tails[lo] = v; tails_idx[lo] = i; }
        if (lo > 0) parent[i] = tails_idx[lo - 1];
    }
    int64_t len = 0;
    for (int64_t i = tails_idx.back(); i >= 0; i = parent[i]) len++;
    int64_t w = len;
    for (int64_t i = tails_idx.back(); i >= 0; i = parent[i]) out[--w] = i;
    return len;
}

}  // extern "C"
