/*
 * Native host-side runtime for quicked_tpu.
 *
 * The device kernels (JAX/Pallas) produce band-matrix bit planes; the
 * sequential host-side walks and CIGAR machinery live here, re-expressing
 * the reference's C host code as a TPU-framework host runtime:
 *
 *   - banded traceback  (banded_backtrace_matrix_cutoff, bpm_banded.c:967-1036)
 *   - CIGAR edit score  (cigar_score_edit, cigar.c:274-289)
 *   - CIGAR correctness replay (cigar_check_alignment, cigar.c:363-434)
 *   - CIGAR RLE print   (cigar_sprint, cigar.c:453-488)
 *   - SAM packed CIGAR  (cigar_compute_CIGAR, cigar.c:193-240)
 *   - DNA 5-letter encode (dna_encode_table, dna_text.c:41-46)
 *
 * Bit planes are the kernels' native (T, EBB, B) u32 lo/hi layout —
 * accessed in place, no per-pair copies.
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

#define W 64

/* ---------------------------------------------------------------- DNA */

static uint8_t dna_table[256];
static int dna_table_init = 0;

static void init_dna_table(void) {
    if (dna_table_init) return;
    memset(dna_table, 4, sizeof(dna_table));
    dna_table['A'] = 0; dna_table['a'] = 0;
    dna_table['C'] = 1; dna_table['c'] = 1;
    dna_table['G'] = 2; dna_table['g'] = 2;
    dna_table['T'] = 3; dna_table['t'] = 3;
    dna_table['N'] = 4; dna_table['n'] = 4;
    dna_table_init = 1;
}

void qh_encode_dna(const uint8_t *raw, int64_t n, uint8_t *out) {
    init_dna_table();
    for (int64_t i = 0; i < n; i++) out[i] = dna_table[raw[i]];
}

/* ---------------------------------------------------------- traceback */

/* Bit (t, block, bit) of a (T, EBB, B) u32-pair plane for lane `lane`;
 * column index `col` is the reference DP column (col 0 = init column:
 * Pv = ones, Mv = zeros; col c>0 = plane row c-1). */
static inline int plane_bit(const uint32_t *lo, const uint32_t *hi,
                            int64_t ebb, int64_t nlanes, int64_t lane,
                            int64_t col, int64_t block, int64_t bit,
                            int init_val) {
    if (col == 0) return init_val;
    const int64_t base = ((col - 1) * ebb + block) * nlanes + lane;
    const uint32_t w = (bit < 32) ? lo[base] : hi[base];
    return (int)((w >> (bit & 31)) & 1u);
}

/*
 * Walk one pair's alignment path. Tie-break order D, I, M, X
 * (bpm_banded.c:1001-1023); the M-test compares RAW characters
 * (bpm_banded.c:1012). Writes forward-order ops into `ops_out`
 * (capacity >= plen + tlen); returns the number of ops.
 */
int64_t qh_traceback_banded(
    const uint32_t *pv_lo, const uint32_t *pv_hi,
    const uint32_t *mv_lo, const uint32_t *mv_hi,
    int64_t ebb, int64_t nlanes, int64_t lane,
    const uint8_t *pattern, int64_t plen,
    const uint8_t *text, int64_t tlen,
    int64_t prolog, char *ops_out) {
    int64_t h = tlen - 1;
    int64_t v = plen - 1;
    char *rev = ops_out;   /* fill backwards from the end */
    int64_t cap = plen + tlen;
    int64_t n = 0;
    /* write right-to-left into ops_out[cap-1-n] */
    while (v >= 0 && h >= 0) {
        const int64_t block_h = h / W;
        const int64_t block_h_r = (h + 1) / W;
        const int64_t eff_v = v - W * (block_h - prolog);
        const int64_t eff_v_r = v - W * (block_h_r - prolog);
        const int64_t block_v = eff_v / W;
        const int64_t block_v_r = eff_v_r / W;
        const int64_t bit = eff_v % W;
        const int64_t bit_r = eff_v_r % W;
        char op;
        if (block_v_r >= 0 && block_v_r < ebb &&
            plane_bit(pv_lo, pv_hi, ebb, nlanes, lane, h + 1, block_v_r,
                      bit_r, 1)) {
            op = 'D'; v--;
        } else if (block_v >= 0 && block_v < ebb &&
                   plane_bit(mv_lo, mv_hi, ebb, nlanes, lane, h, block_v,
                             bit, 0)) {
            op = 'I'; h--;
        } else if (text[h] == pattern[v]) {
            op = 'M'; h--; v--;
        } else {
            op = 'X'; h--; v--;
        }
        rev[cap - 1 - n] = op;
        n++;
    }
    while (h >= 0) { rev[cap - 1 - n] = 'I'; n++; h--; }
    while (v >= 0) { rev[cap - 1 - n] = 'D'; n++; v--; }
    /* move to the front */
    memmove(ops_out, ops_out + cap - n, (size_t)n);
    return n;
}

/* ------------------------------------------------------------- CIGAR */

int64_t qh_cigar_score_edit(const char *ops, int64_t n) {
    /* cigar_score_edit (cigar.c:274-289): M = 0; X/I/D = 1. */
    int64_t score = 0;
    for (int64_t i = 0; i < n; i++) score += (ops[i] != 'M');
    return score;
}

/*
 * Replay the ops against both sequences (cigar_check_alignment,
 * cigar.c:363-434). Returns 1 if valid, 0 otherwise.
 */
int qh_cigar_check(const char *ops, int64_t n,
                   const uint8_t *pattern, int64_t plen,
                   const uint8_t *text, int64_t tlen) {
    int64_t p = 0, t = 0;
    for (int64_t i = 0; i < n; i++) {
        switch (ops[i]) {
        case 'M':
            if (p >= plen || t >= tlen) return 0;
            if (pattern[p] != text[t]) return 0;
            p++; t++;
            break;
        case 'X':
            if (p >= plen || t >= tlen) return 0;
            if (pattern[p] == text[t]) return 0;
            p++; t++;
            break;
        case 'I':
            if (t >= tlen) return 0;
            t++;
            break;
        case 'D':
            if (p >= plen) return 0;
            p++;
            break;
        default:
            return 0;
        }
    }
    return (p == plen) && (t == tlen);
}

/*
 * RLE text form (cigar_sprint, cigar.c:453-488). `print_matches`
 * selects whether M runs are printed. Returns chars written (no NUL).
 * `out` capacity: 12 * n is always enough.
 */
int64_t qh_cigar_sprint(const char *ops, int64_t n, int print_matches,
                        char *out) {
    int64_t w = 0;
    int64_t i = 0;
    while (i < n) {
        char op = ops[i];
        int64_t run = 1;
        while (i + run < n && ops[i + run] == op) run++;
        if (op != 'M' || print_matches) {
            /* write run length then op */
            char tmp[24];
            int len = 0;
            int64_t x = run;
            do { tmp[len++] = (char)('0' + (x % 10)); x /= 10; } while (x);
            while (len) out[w++] = tmp[--len];
            out[w++] = op;
        }
        i += run;
    }
    return w;
}

/*
 * SAM-compliant packed CIGAR (cigar_compute_CIGAR, cigar.c:193-240):
 * adjacent M/X collapse into 'M' ops; entries are (len << 4) | opcode
 * with opcodes M=0, I=1, D=2. Returns number of uint32 entries.
 */
int64_t qh_cigar_sam(const char *ops, int64_t n, uint32_t *out) {
    static const uint8_t code[256] = {
        ['M'] = 0, ['X'] = 0, ['I'] = 1, ['D'] = 2 };
    int64_t w = 0;
    int64_t i = 0;
    while (i < n) {
        uint8_t c = code[(uint8_t)ops[i]];
        int64_t run = 1;
        while (i + run < n && code[(uint8_t)ops[i + run]] == c) run++;
        out[w++] = ((uint32_t)run << 4) | c;
        i += run;
    }
    return w;
}

/* ------------------------------------------------------ sequence IO */

/*
 * Batch .seq reader (sequence_buffer semantics, sequence_buffer.c:90-127
 * + align_benchmark_read_input, align_benchmark.c:73-99): parse up to
 * `max_pairs` two-line records from `data[0..len)`, stripping the first
 * character of each line. Sequences are appended to `out` with
 * NUL-padding between them; offsets/lengths per line are recorded.
 * Returns the number of PAIRS parsed; *consumed is the byte offset of
 * the first unparsed record (callers stream chunks).
 */
int64_t qh_read_seq_batch(const char *data, int64_t len, int64_t max_pairs,
                          char *out, int64_t out_cap,
                          int64_t *offsets, int64_t *lengths,
                          int64_t *consumed) {
    int64_t pos = 0, w = 0, n_lines = 0;
    int64_t last_complete = 0;
    while (n_lines / 2 < max_pairs) {
        if (pos >= len) break;
        const char *nl = memchr(data + pos, '\n', (size_t)(len - pos));
        if (!nl) break;                    /* incomplete record tail */
        int64_t line_len = (int64_t)(nl - (data + pos));
        int64_t seq_len = line_len > 0 ? line_len - 1 : 0;
        if (w + seq_len + 1 > out_cap) break;
        memcpy(out + w, data + pos + 1, (size_t)seq_len);
        out[w + seq_len] = '\0';
        offsets[n_lines] = w;
        lengths[n_lines] = seq_len;
        w += seq_len + 1;
        pos = (int64_t)(nl - data) + 1;
        n_lines++;
        if (n_lines % 2 == 0) last_complete = pos;
    }
    *consumed = last_complete;
    return n_lines / 2;
}

/* ------------------------------------------------- windowed traceback */

/*
 * Greedy in-window backtrace for the full-CIGAR windowed mode
 * (windowed_backtrace, bpm_windowed.c:448-502). Tie-break M, D, I, X
 * (different from banded!). PvW/MvW are (COLS+1, WS) u32-pair planes
 * for one window (column 0 = init). Returns new (v, h) packed and
 * appends ops right-to-left into rev buffer via *pn.
 */
void qh_window_backtrace(
    const uint32_t *pvw_lo, const uint32_t *pvw_hi,
    const uint32_t *mvw_lo, const uint32_t *mvw_hi,
    int64_t ws, int64_t nlanes, int64_t lane,
    const uint8_t *pattern, const uint8_t *text,
    int64_t v_min, int64_t h_min,
    int64_t v_ovl, int64_t h_ovl,
    int64_t *pv, int64_t *ph,
    char *rev_buf, int64_t cap, int64_t *pn) {
    int64_t v = *pv, h = *ph, n = *pn;
    while (v >= v_ovl && h >= h_ovl) {
        const int64_t block = (v - v_min) / W;
        const int64_t bit = (v - v_min) % W;
        const int64_t col = h - h_min + 1;
        const int64_t base_p = (col * ws + block) * nlanes + lane;
        const int64_t base_m = ((col - 1) * ws + block) * nlanes + lane;
        const uint32_t pw = (bit < 32) ? pvw_lo[base_p] : pvw_hi[base_p];
        const uint32_t mw = (bit < 32) ? mvw_lo[base_m] : mvw_hi[base_m];
        const int pbit = (int)((pw >> (bit & 31)) & 1u);
        const int mbit = (int)((mw >> (bit & 31)) & 1u);
        char op;
        if (text[h] == pattern[v])      { op = 'M'; h--; v--; }
        else if (pbit)                  { op = 'D'; v--; }
        else if (mbit)                  { op = 'I'; h--; }
        else                            { op = 'X'; h--; v--; }
        rev_buf[cap - 1 - n] = op;
        n++;
    }
    *pv = v; *ph = h; *pn = n;
}
