/*
 * C++ binding over the quicked_tpu native host runtime.
 *
 * Mirrors the reference's RAII surface (bindings/cpp/quicked.hpp:47-69)
 * source-compatibly: a QuickedAligner with per-parameter setters,
 * align() taking std::string pointers (the reference signature; a
 * const-reference overload is also provided), getScore(), getCigar(),
 * and a QuickedException raised on error statuses. The enums are
 * unscoped with the REFERENCE's values (quicked.h:36-41, 69-79), so
 * `quicked::BANDED` and integer round-trips with the Python package
 * agree across surfaces. The backend is the native C runtime
 * (quicked_tpu/native/src/quicked_host.c: qh_align) — the same kernels
 * the Python package uses as its host fallback, bit-exact with the
 * device kernels.
 *
 * Build: link against libquicked_host.so, or compile the C runtime in:
 *   gcc -O2 -c quicked_tpu/native/src/quicked_host.c -o quicked_host.o
 *   g++ -O2 my_app.cpp bindings/cpp/quicked.cpp quicked_host.o -pthread
 */
#ifndef QUICKED_TPU_CPP_BINDING_HPP
#define QUICKED_TPU_CPP_BINDING_HPP

#include <cstdint>
#include <stdexcept>
#include <string>

namespace quicked {

// Values match the reference quicked_algo_t (quicked.h:36-41).
enum QuickedAlgo : std::int64_t {
    QUICKED = 0,
    WINDOWED = 1,
    BANDED = 2,
    HIRSCHBERG = 3,
};

// Values match the reference quicked_status_t (quicked.h:69-79).
enum QuickedStatus : std::int64_t {
    QUICKED_OK = 0,
    QUICKED_ERROR = -1,
    QUICKED_FAIL_NON_CONVERGENCE = -2,
    QUICKED_UNKNOWN_ALGO = -3,
    QUICKED_EMPTY_SEQUENCE = -4,
    QUICKED_UNIMPLEMENTED = -10,
    QUICKED_WIP = 1,
};

class QuickedException : public std::runtime_error {
public:
    explicit QuickedException(QuickedStatus status);
    QuickedStatus status() const { return status_; }

private:
    QuickedStatus status_;
};

class QuickedAligner {
public:
    QuickedAligner() = default;

    // Throws QuickedException on error statuses (empty sequence, ...).
    // Pointer form = the reference binding's signature; the
    // const-reference overload is a convenience.
    void align(std::string *pattern, std::string *text);
    void align(const std::string &pattern, const std::string &text);

    void setAlgorithm(QuickedAlgo algo) { algo_ = algo; }
    void setOnlyScore(bool only_score) { only_score_ = only_score; }
    void setBandwidth(unsigned int bandwidth) { bandwidth_ = bandwidth; }
    void setWindowSize(unsigned int ws) { window_size_ = ws; }
    void setOverlapSize(unsigned int ovl) { overlap_size_ = ovl; }
    // Runtime SIMD toggle (reference bpm_banded.c:1049-1059): applied
    // process-wide at align() time via qh_set_force_scalar.
    void setForceScalar(bool force_scalar) { force_scalar_ = force_scalar; }
    void setHEWThreshold(unsigned int t) { hew_threshold_[0] = t; hew_threshold_[1] = t; }
    void setHEWPercentage(unsigned int p) { hew_percentage_[0] = p; hew_percentage_[1] = p; }

    std::int64_t getScore() const { return score_; }
    // RLE CIGAR text form ("5M1X..."), or "NULL" when absent —
    // matching the reference binding's getCigar() contract.
    std::string getCigar() const { return cigar_.empty() ? "NULL" : cigar_; }

private:
    QuickedAlgo algo_ = QUICKED;
    bool only_score_ = false;
    bool force_scalar_ = false;
    std::int64_t bandwidth_ = 15;
    std::int64_t window_size_ = 9;
    std::int64_t overlap_size_ = 1;
    std::int64_t hew_threshold_[2] = {40, 40};
    std::int64_t hew_percentage_[2] = {15, 15};
    std::int64_t score_ = -1;
    std::string cigar_;
};

}  // namespace quicked

#endif  // QUICKED_TPU_CPP_BINDING_HPP
