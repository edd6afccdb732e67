// C++ binding smoke example (reference examples/bindings/basic.cpp).
#include <cassert>
#include <iostream>

#include "../../bindings/cpp/quicked.hpp"

int main() {
    quicked::QuickedAligner aligner;

    const std::string pattern = "ACGTACGTACGTACGT";
    const std::string text = "ACGTACGTACGATCGT";

    aligner.align(pattern, text);

    std::cout << "Score: " << aligner.getScore() << std::endl;
    std::cout << "CIGAR: " << aligner.getCigar() << std::endl;
    assert(aligner.getScore() == 2);
    return 0;
}
