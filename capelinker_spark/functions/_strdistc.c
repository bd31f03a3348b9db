/* Batch Jaro-Winkler / OSA kernels — C implementations of the pure-Python
 * semantics in strdist.py (the semantics oracle; see its reference citations:
 * stringdist 'jw'/'osa', R/distances.R:27-43).
 *
 * BIT-EXACTNESS CONTRACT: every float expression mirrors the Python kernel's
 * evaluation order exactly —
 *   jaro = (m/ls + m/lt + (m - t)/m) / 3.0          (left-to-right adds)
 *   jw   = 1.0 - (j + l*p*(1.0 - j))                ((l*p)*(1-j) grouping)
 *   osa_norm = d / max(ls, lt)
 * so outputs are bit-identical to the Python kernel (locked by
 * tests/test_strdist.py::test_c_kernel_bitwise) and therefore to DuckDB's
 * jaro_similarity (locked by the oracle queries).
 *
 * Strings arrive as flat UTF-32 codepoint buffers + offset arrays (one
 * encode + one ctypes call per Arrow batch — no per-pair Python).
 */
#include <stdint.h>
#include <stdlib.h>

static double jaro(const uint32_t *s, int64_t ls, const uint32_t *t,
                   int64_t lt, char *sf, char *tf) {
    if (ls == 0 && lt == 0) return 1.0;
    if (ls == 0 || lt == 0) return 0.0;
    int64_t window = (ls > lt ? ls : lt) / 2 - 1;
    if (window < 0) window = 0;
    for (int64_t i = 0; i < ls; i++) sf[i] = 0;
    for (int64_t j = 0; j < lt; j++) tf[j] = 0;
    int64_t matches = 0;
    for (int64_t i = 0; i < ls; i++) {
        int64_t lo = i - window;
        if (lo < 0) lo = 0;
        int64_t hi = i + window + 1;
        if (hi > lt) hi = lt;
        for (int64_t j = lo; j < hi; j++) {
            if (!tf[j] && t[j] == s[i]) {
                sf[i] = 1;
                tf[j] = 1;
                matches++;
                break;
            }
        }
    }
    if (matches == 0) return 0.0;
    int64_t k = 0, trans = 0;
    for (int64_t i = 0; i < ls; i++) {
        if (sf[i]) {
            while (!tf[k]) k++;
            if (s[i] != t[k]) trans++;
            k++;
        }
    }
    trans /= 2;
    double m = (double)matches;
    return (m / (double)ls + m / (double)lt + (m - (double)trans) / m) / 3.0;
}

/* out[i] = Jaro-Winkler DISTANCE (unconditional Winkler boost, prefix<=4). */
void jw_batch(const uint32_t *buf_s, const int64_t *off_s,
              const uint32_t *buf_t, const int64_t *off_t, int64_t n,
              double p, double *out) {
    int64_t maxl = 1;
    for (int64_t i = 0; i < n; i++) {
        int64_t a = off_s[i + 1] - off_s[i], b = off_t[i + 1] - off_t[i];
        if (a > maxl) maxl = a;
        if (b > maxl) maxl = b;
    }
    char *sf = (char *)malloc((size_t)maxl);
    char *tf = (char *)malloc((size_t)maxl);
    if (!sf || !tf) {
        free(sf);
        free(tf);
        for (int64_t i = 0; i < n; i++) out[i] = -1.0; /* signal failure */
        return;
    }
    for (int64_t i = 0; i < n; i++) {
        const uint32_t *s = buf_s + off_s[i];
        const uint32_t *t = buf_t + off_t[i];
        int64_t ls = off_s[i + 1] - off_s[i], lt = off_t[i + 1] - off_t[i];
        double j = jaro(s, ls, t, lt, sf, tf);
        int64_t l = 0, lm = ls < lt ? ls : lt;
        if (lm > 4) lm = 4;
        while (l < lm && s[l] == t[l]) l++;
        out[i] = 1.0 - (j + (double)l * p * (1.0 - j));
    }
    free(sf);
    free(tf);
}

/* out[i] = OSA edit distance (normalize=0) or 1 - stringsim (normalize=1). */
void osa_batch(const uint32_t *buf_s, const int64_t *off_s,
               const uint32_t *buf_t, const int64_t *off_t, int64_t n,
               int normalize, double *out) {
    int64_t maxl = 1;
    for (int64_t i = 0; i < n; i++) {
        int64_t b = off_t[i + 1] - off_t[i];
        if (b > maxl) maxl = b;
    }
    int64_t *prev2 = (int64_t *)malloc((size_t)(maxl + 1) * sizeof(int64_t));
    int64_t *prev = (int64_t *)malloc((size_t)(maxl + 1) * sizeof(int64_t));
    int64_t *cur = (int64_t *)malloc((size_t)(maxl + 1) * sizeof(int64_t));
    if (!prev2 || !prev || !cur) {
        free(prev2);
        free(prev);
        free(cur);
        for (int64_t i = 0; i < n; i++) out[i] = -1.0;
        return;
    }
    for (int64_t i = 0; i < n; i++) {
        const uint32_t *s = buf_s + off_s[i];
        const uint32_t *t = buf_t + off_t[i];
        int64_t ls = off_s[i + 1] - off_s[i], lt = off_t[i + 1] - off_t[i];
        int64_t d;
        if (ls == 0) {
            d = lt;
        } else if (lt == 0) {
            d = ls;
        } else {
            for (int64_t j = 0; j <= lt; j++) prev[j] = j;
            for (int64_t ii = 1; ii <= ls; ii++) {
                cur[0] = ii;
                for (int64_t j = 1; j <= lt; j++) {
                    int64_t cost = (s[ii - 1] == t[j - 1]) ? 0 : 1;
                    int64_t v = prev[j] + 1;
                    if (cur[j - 1] + 1 < v) v = cur[j - 1] + 1;
                    if (prev[j - 1] + cost < v) v = prev[j - 1] + cost;
                    if (ii > 1 && j > 1 && s[ii - 1] == t[j - 2] &&
                        s[ii - 2] == t[j - 1] && prev2[j - 2] + cost < v)
                        v = prev2[j - 2] + cost;
                    cur[j] = v;
                }
                int64_t *tmp = prev2;
                prev2 = prev;
                prev = cur;
                cur = tmp;
            }
            d = prev[lt];
        }
        if (normalize) {
            int64_t m = ls > lt ? ls : lt;
            out[i] = m ? (double)d / (double)m : 0.0;
        } else {
            out[i] = (double)d;
        }
    }
    free(prev2);
    free(prev);
    free(cur);
}
