/* C++ binding implementation: see quicked.hpp. */

#include "quicked.hpp"

#include <cstdint>
#include <vector>

extern "C" {
// quicked_tpu/native/src/quicked_host.c
std::int64_t qh_align(
    std::int64_t algo, const std::uint8_t *pattern_raw, std::int64_t plen,
    const std::uint8_t *text_raw, std::int64_t tlen,
    std::int64_t only_score, std::int64_t bandwidth,
    std::int64_t window_size, std::int64_t overlap_size,
    std::int64_t hew_thr0, std::int64_t hew_thr1,
    std::int64_t hew_pct0, std::int64_t hew_pct1,
    std::int64_t budget,
    std::int64_t *score_out, char *ops_out, std::int64_t *ops_n_out);
void qh_set_force_scalar(int v);
}

namespace quicked {

// Messages byte-match quicked_status_msg (quicked.c:382-403), incl.
// the trailing newline.
static const char *status_msg(QuickedStatus s) {
    switch (s) {
        case QUICKED_FAIL_NON_CONVERGENCE:
            return "ERROR: Hirschberg algorithm can not find a middle "
                   "point of subsequence division!\n";
        case QUICKED_UNIMPLEMENTED:
            return "ERROR: The algorithm or parameter combination "
                   "selected is not implemented\n";
        case QUICKED_UNKNOWN_ALGO:
            return "ERROR: Unknown algorithm selection\n";
        case QUICKED_EMPTY_SEQUENCE:
            return "ERROR: Tried to align an empty sequence\n";
        default:
            return "ERROR: QuickEd has finished with unspecific error\n";
    }
}

QuickedException::QuickedException(QuickedStatus status)
    : std::runtime_error(status_msg(status)), status_(status) {}

// The qh_align ABI orders the algos QUICKED=0, BANDED=1, WINDOWED=2,
// HIRSCHBERG=3; the public enum keeps the reference's values
// (WINDOWED=1, BANDED=2), so map here.
static std::int64_t abi_algo(QuickedAlgo a) {
    switch (a) {
        case WINDOWED: return 2;
        case BANDED: return 1;
        default: return static_cast<std::int64_t>(a);
    }
}

void QuickedAligner::align(std::string *pattern, std::string *text) {
    align(*pattern, *text);
}

void QuickedAligner::align(const std::string &pattern,
                           const std::string &text) {
    std::vector<char> ops(pattern.size() + text.size() + 1);
    std::int64_t score = -1, n = 0;
    qh_set_force_scalar(force_scalar_ ? 1 : 0);
    const std::int64_t budget = 16LL * 1024 * 1024;  // BUFFER_SIZE_16M
    std::int64_t st = qh_align(
        abi_algo(algo_),
        reinterpret_cast<const std::uint8_t *>(pattern.data()),
        static_cast<std::int64_t>(pattern.size()),
        reinterpret_cast<const std::uint8_t *>(text.data()),
        static_cast<std::int64_t>(text.size()),
        only_score_ ? 1 : 0, bandwidth_, window_size_, overlap_size_,
        hew_threshold_[0], hew_threshold_[1],
        hew_percentage_[0], hew_percentage_[1], budget,
        &score, ops.data(), &n);
    score_ = score;
    // RLE print (cigar_sprint semantics)
    cigar_.clear();
    std::int64_t i = 0;
    while (i < n) {
        char c = ops[i];
        std::int64_t run = 1;
        while (i + run < n && ops[i + run] == c) run++;
        cigar_ += std::to_string(run);
        cigar_ += c;
        i += run;
    }
    if (st < 0) throw QuickedException(static_cast<QuickedStatus>(st));
}

}  // namespace quicked
