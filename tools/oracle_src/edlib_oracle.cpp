/*
 * Batch edlib ground-truth oracle for the align_benchmark --check modes
 * and the `-a edlib` comparison algorithm.
 *
 * The reference vendors edlib and calls it in-process
 * (benchmark_check.c:117-158, benchmark_edit.c:339-372); this repo
 * instead builds THIS shim against the reference's vendored edlib
 * (compiled by tests/oracle.py) and drives it as a subprocess — an
 * independent oracle with the exact same remapping the reference
 * applies ('=' -> 'M', and edlib's D/I swapped into quicked's
 * convention).
 *
 * Usage: edlib_oracle input.seq bandwidth_percent(-1 = unbanded)
 * Output: one "score\tcigar" line per pair.
 */
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <iostream>

#include "edlib.h"

int main(int argc, char **argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s input.seq [bandwidth]\n", argv[0]);
        return 2;
    }
    long bandwidth = (argc > 2) ? std::strtol(argv[2], nullptr, 10) : -1;
    std::FILE *f = std::fopen(argv[1], "r");
    if (!f) { std::perror("open"); return 2; }
    std::string pattern, text, line;
    char buf[1 << 16];
    auto read_line = [&](std::string &out) -> bool {
        out.clear();
        while (std::fgets(buf, sizeof buf, f)) {
            size_t n = std::strlen(buf);
            bool end = n && buf[n - 1] == '\n';
            out.append(buf, end ? n - 1 : n);
            if (end) return true;
        }
        return !out.empty();
    };
    while (read_line(pattern)) {
        if (!read_line(text)) break;
        const char *p = pattern.c_str() + 1;   // strip '>' / '<'
        const char *t = text.c_str() + 1;
        int plen = (int)pattern.size() - 1;
        int tlen = (int)text.size() - 1;
        long k = bandwidth >= 0
                     ? ((plen > tlen ? plen : tlen) * bandwidth) / 100
                     : -1;
        EdlibAlignResult r = edlibAlign(
            p, plen, t, tlen,
            edlibNewAlignConfig((int)k, EDLIB_MODE_NW, EDLIB_TASK_PATH,
                                NULL, 0));
        char *cig = edlibAlignmentToCigar(r.alignment, r.alignmentLength,
                                          EDLIB_CIGAR_EXTENDED);
        for (char *c = cig; *c; ++c) {
            if (*c == '=') *c = 'M';
            else if (*c == 'D') *c = 'I';
            else if (*c == 'I') *c = 'D';
        }
        std::printf("%d\t%s\n", r.editDistance, cig);
        std::free(cig);
        edlibFreeAlignResult(r);
    }
    std::fclose(f);
    return 0;
}
