/* ThreadSanitizer stress for the native runtime's THREADED entry
 * points (the sanitize_native.py ASAN/UBSAN driver is single-thread):
 *
 *   gcc -O1 -g -fsanitize=thread tests/tsan_stress.c \
 *       quicked_tpu/native/src/quicked_host.c -o tsan_stress -lpthread
 *   TSAN_OPTIONS=halt_on_error=1 ./tsan_stress
 *
 * Covers: the chunked-atomic batch pools (qh_quicked_batch,
 * qh_banded_score_batch, qh_cigar_sprint_batch) and the barrier-free
 * intra-pair wavefront (n_threads > n_pairs engages strips; skewed
 * lengths give a prolog phase where the active strip count GROWS —
 * the partition-seqlock transition a plain stress rarely hits).
 * Results are also cross-checked threaded-vs-1-thread, so an ordering
 * bug that TSan cannot see (pure logic) still fails the run.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

extern void qh_encode_dna(const uint8_t *raw, int64_t n, uint8_t *out);
extern int64_t qh_quicked_batch(
    const char *buf, const int64_t *offsets, const int64_t *lengths,
    int64_t n_pairs,
    int64_t bandwidth, int64_t window_size, int64_t overlap_size,
    int64_t hew_thr0, int64_t hew_thr1, int64_t hew_pct0, int64_t hew_pct1,
    int64_t budget, int64_t n_threads,
    int64_t *scores_out, int64_t *status_out,
    char *ops_out, const int64_t *ops_offsets, int64_t *ops_len_out);
extern int64_t qh_banded_score_batch(
    const uint8_t *enc_buf,
    const int64_t *p_off, const int64_t *p_len,
    const int64_t *t_off, const int64_t *t_len,
    const int64_t *cutoff, const int64_t *tfinish,
    int64_t n, int64_t n_threads, int64_t want_state,
    int64_t *score_out,
    uint64_t *pv_out, uint64_t *mv_out, int64_t ebb_stride,
    int64_t *first_out, int64_t *last_out,
    int64_t *scores_out, int64_t rows_stride, int64_t *ebb_out);
extern int64_t qh_cigar_sprint_batch(
    const char *ops, const int64_t *off, const int64_t *len, int64_t n,
    int64_t print_matches,
    char *out, const int64_t *out_off, int64_t *out_len,
    int64_t n_threads);

static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint64_t rnd(void) {
    rng_state ^= rng_state << 13;
    rng_state ^= rng_state >> 7;
    rng_state ^= rng_state << 17;
    return rng_state;
}

static void gen_pair(int64_t len, int err_pct, char *p, char *t,
                     int64_t *plen, int64_t *tlen) {
    const char *al = "ACGT";
    int64_t n = 0;
    for (int64_t i = 0; i < len; i++) p[i] = al[rnd() & 3];
    *plen = len;
    for (int64_t i = 0; i < len; i++) {
        if ((int)(rnd() % 100) < err_pct) {
            switch (rnd() % 3) {
            case 0: t[n++] = al[rnd() & 3]; break;      /* sub */
            case 1: break;                               /* del */
            default: t[n++] = al[rnd() & 3]; t[n++] = p[i]; break;
            }
        } else {
            t[n++] = p[i];
        }
    }
    if (n == 0) t[n++] = 'A';
    *tlen = n;
}

#define MAXP 64
#define MAXL 20000

int main(void) {
    static char pb[MAXP][2 * MAXL], tb[MAXP][2 * MAXL];
    static uint8_t enc[MAXP * 4 * MAXL];
    static char seqbuf[MAXP * 4 * MAXL];
    int64_t fails = 0;

    for (int iter = 0; iter < 30; iter++) {
        int64_t n = 1 + (int64_t)(rnd() % 48);
        /* half the iterations use deep-band geometries so the
         * intra-pair wavefront reliably engages (span >= 48 needs
         * cutoff >= 3072 bits -> multi-kbp pairs at >=20% band) */
        int deep = iter & 1;
        int64_t base_len = deep ? 6000 + (int64_t)(rnd() % 8000)
                                : 200 + (int64_t)(rnd() % 4000);
        int err = 2 + (int)(rnd() % 20);

        int64_t offs[2 * MAXP], lens[2 * MAXP];
        int64_t pos = 0;
        for (int64_t i = 0; i < n; i++) {
            int64_t pl, tl;
            /* length skew drives prolog > 0 (wavefront active growth) */
            int64_t L = base_len + (int64_t)(rnd() % (base_len / 2 + 1));
            gen_pair(L, err, pb[i], tb[i], &pl, &tl);
            offs[2 * i] = pos;
            lens[2 * i] = pl;
            memcpy(seqbuf + pos, pb[i], (size_t)pl);
            pos += pl;
            offs[2 * i + 1] = pos;
            lens[2 * i + 1] = tl;
            memcpy(seqbuf + pos, tb[i], (size_t)tl);
            pos += tl;
        }

        /* --- full cascade batch pool, threaded vs 1T --- */
        int64_t sc1[MAXP], st1[MAXP], ol1[MAXP];
        int64_t scT[MAXP], stT[MAXP], olT[MAXP];
        int64_t ops_off[MAXP], cap = 0;
        for (int64_t i = 0; i < n; i++) {
            ops_off[i] = cap;
            cap += lens[2 * i] + lens[2 * i + 1];
        }
        char *ops1 = malloc((size_t)cap + 1), *opsT = malloc((size_t)cap + 1);
        int64_t nt = 2 + (int64_t)(rnd() % 7);
        qh_quicked_batch(seqbuf, offs, lens, n, 15, 9, 1, 40, 35, 15, 50,
                         16 << 20, 1, sc1, st1, ops1, ops_off, ol1);
        qh_quicked_batch(seqbuf, offs, lens, n, 15, 9, 1, 40, 35, 15, 50,
                         16 << 20, nt, scT, stT, opsT, ops_off, olT);
        for (int64_t i = 0; i < n; i++) {
            if (sc1[i] != scT[i] || st1[i] != stT[i] || ol1[i] != olT[i] ||
                memcmp(ops1 + ops_off[i], opsT + ops_off[i],
                       (size_t)ol1[i]) != 0) {
                printf("MISMATCH quicked_batch iter=%d pair=%ld "
                       "(1T %ld/%ld vs %ldT %ld/%ld)\n", iter, (long)i,
                       (long)sc1[i], (long)st1[i], (long)nt,
                       (long)scT[i], (long)stT[i]);
                fails++;
            }
        }

        /* --- threaded RLE sprint vs 1T --- */
        int64_t out_off[MAXP], out_len1[MAXP], out_lenT[MAXP], ocap = 0;
        for (int64_t i = 0; i < n; i++) {
            out_off[i] = ocap;
            ocap += 3 * (lens[2 * i] + lens[2 * i + 1]) + 16;
        }
        char *o1 = malloc((size_t)ocap), *oT = malloc((size_t)ocap);
        qh_cigar_sprint_batch(ops1, ops_off, ol1, n, 1, o1, out_off,
                              out_len1, 1);
        qh_cigar_sprint_batch(ops1, ops_off, ol1, n, 1, oT, out_off,
                              out_lenT, nt);
        for (int64_t i = 0; i < n; i++)
            if (out_len1[i] != out_lenT[i] ||
                memcmp(o1 + out_off[i], oT + out_off[i],
                       (size_t)out_len1[i]) != 0) {
                printf("MISMATCH sprint iter=%d pair=%ld\n", iter, (long)i);
                fails++;
            }
        free(o1); free(oT); free(ops1); free(opsT);

        /* --- banded score pool; n small so intra-pair wavefront
         * engages (intra = threads / pairs) --- */
        qh_encode_dna((const uint8_t *)seqbuf, pos, enc);
        int64_t nn = 1 + (int64_t)(rnd() % 3);
        int64_t cut[MAXP], tfin[MAXP];
        int64_t p_off[MAXP], p_len[MAXP], t_off[MAXP], t_len[MAXP];
        for (int64_t i = 0; i < nn; i++) {
            p_off[i] = offs[2 * i]; p_len[i] = lens[2 * i];
            t_off[i] = offs[2 * i + 1]; t_len[i] = lens[2 * i + 1];
            int64_t m = p_len[i] > t_len[i] ? p_len[i] : t_len[i];
            cut[i] = m * (deep ? 25 + (int64_t)(rnd() % 15)
                               : 10 + (int64_t)(rnd() % 30)) / 100;
            tfin[i] = t_len[i];
        }
        int64_t ebb_stride = 4096, rows_stride = 8192;
        uint64_t *pv1 = calloc((size_t)(nn * ebb_stride), 8);
        uint64_t *mv1 = calloc((size_t)(nn * ebb_stride), 8);
        uint64_t *pvT = calloc((size_t)(nn * ebb_stride), 8);
        uint64_t *mvT = calloc((size_t)(nn * ebb_stride), 8);
        int64_t *rows1 = calloc((size_t)(nn * rows_stride), 8);
        int64_t *rowsT = calloc((size_t)(nn * rows_stride), 8);
        int64_t s1[MAXP], sT[MAXP], f1[MAXP], fT[MAXP];
        int64_t l1[MAXP], lT[MAXP], e1[MAXP], eT[MAXP];
        qh_banded_score_batch(enc, p_off, p_len, t_off, t_len, cut, tfin,
                              nn, 1, 1, s1, pv1, mv1, ebb_stride, f1, l1,
                              rows1, rows_stride, e1);
        qh_banded_score_batch(enc, p_off, p_len, t_off, t_len, cut, tfin,
                              nn, 8, 1, sT, pvT, mvT, ebb_stride, fT, lT,
                              rowsT, rows_stride, eT);
        for (int64_t i = 0; i < nn; i++) {
            if (s1[i] != sT[i] || f1[i] != fT[i] || l1[i] != lT[i] ||
                e1[i] != eT[i] ||
                memcmp(pv1 + i * ebb_stride, pvT + i * ebb_stride,
                       (size_t)e1[i] * 8) != 0 ||
                memcmp(mv1 + i * ebb_stride, mvT + i * ebb_stride,
                       (size_t)e1[i] * 8) != 0) {
                printf("MISMATCH banded_score iter=%d pair=%ld "
                       "(%ld vs %ld)\n", iter, (long)i, (long)s1[i],
                       (long)sT[i]);
                fails++;
            }
        }
        free(pv1); free(mv1); free(pvT); free(mvT);
        free(rows1); free(rowsT);
    }
    if (fails) {
        printf("FAILED: %ld mismatches\n", (long)fails);
        return 1;
    }
    printf("tsan stress OK\n");
    return 0;
}
