// C++ binding parameter example (reference examples/bindings/params.cpp):
// exercise each algorithm + error handling on empty input.
#include <cassert>
#include <iostream>

#include "../../bindings/cpp/quicked.hpp"

int main() {
    const std::string pattern = "ACGTACGTACGTACGTACGTACGTACGTACGT";
    const std::string text = "ACGTACGTACGATCGTACGTACGTACGTACGT";

    {
        quicked::QuickedAligner a;
        a.setAlgorithm(quicked::QuickedAlgo::BANDED);
        a.setBandwidth(50);
        a.align(pattern, text);
        std::cout << "BANDED score: " << a.getScore()
                  << " cigar: " << a.getCigar() << std::endl;
    }
    {
        quicked::QuickedAligner a;
        a.setAlgorithm(quicked::QuickedAlgo::WINDOWED);
        a.setWindowSize(2);
        a.setOverlapSize(1);
        a.align(pattern, text);
        std::cout << "WINDOWED score: " << a.getScore() << std::endl;
    }
    {
        quicked::QuickedAligner a;
        a.setAlgorithm(quicked::QuickedAlgo::HIRSCHBERG);
        a.setBandwidth(10);
        a.align(pattern, text);
        std::cout << "HIRSCHBERG score: " << a.getScore() << std::endl;
    }
    {
        quicked::QuickedAligner a;
        a.setAlgorithm(quicked::QuickedAlgo::BANDED);
        a.setOnlyScore(true);
        a.align(pattern, text);
        assert(a.getCigar() == "NULL");
        std::cout << "BANDED only-score: " << a.getScore() << std::endl;
    }
    bool threw = false;
    try {
        quicked::QuickedAligner a;
        a.align("", text);
    } catch (const quicked::QuickedException &e) {
        threw = true;
        std::cout << "empty: " << e.what() << std::endl;
    }
    assert(threw);
    return 0;
}
