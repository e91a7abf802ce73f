/* Minimal fftwf_* shim so the reference wsprd.c can be compiled as a
 * test oracle without libfftw3f. Implements just the subset wsprd.c
 * uses: single 1-D forward complex plan of power-of-two size (512),
 * via an iterative radix-2 FFT. Wisdom calls are no-ops.
 *
 * This file is OUR test infrastructure (not reference code); it links
 * against the read-only reference sources at test time only.
 */
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include "fftw3.h"

struct fftwf_plan_s {
    int n;
    fftwf_complex *in, *out;
    float *tw_re, *tw_im; /* twiddles e^{-2pi i k/n}, k < n/2 */
    int *rev;             /* bit-reversal permutation */
};

void *fftwf_malloc(size_t n) { return malloc(n); }
void fftwf_free(void *p) { free(p); }

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags) {
    (void)sign; (void)flags;
    fftwf_plan p = malloc(sizeof(*p));
    p->n = n; p->in = in; p->out = out;
    p->tw_re = malloc(sizeof(float) * (n / 2));
    p->tw_im = malloc(sizeof(float) * (n / 2));
    for (int k = 0; k < n / 2; k++) {
        double a = -2.0 * M_PI * k / n; /* FFTW_FORWARD */
        p->tw_re[k] = (float)cos(a);
        p->tw_im[k] = (float)sin(a);
    }
    p->rev = malloc(sizeof(int) * n);
    int bits = 0; while ((1 << bits) < n) bits++;
    for (int i = 0; i < n; i++) {
        int r = 0;
        for (int b = 0; b < bits; b++) r |= ((i >> b) & 1) << (bits - 1 - b);
        p->rev[i] = r;
    }
    return p;
}

void fftwf_execute(fftwf_plan p) {
    int n = p->n;
    fftwf_complex *out = p->out;
    for (int i = 0; i < n; i++) {
        out[p->rev[i]][0] = p->in[i][0];
        out[p->rev[i]][1] = p->in[i][1];
    }
    for (int len = 2; len <= n; len <<= 1) {
        int half = len >> 1, step = n / len;
        for (int i = 0; i < n; i += len) {
            for (int j = 0; j < half; j++) {
                float wr = p->tw_re[j * step], wi = p->tw_im[j * step];
                float ur = out[i + j][0], ui = out[i + j][1];
                float vr = out[i + j + half][0] * wr - out[i + j + half][1] * wi;
                float vi = out[i + j + half][0] * wi + out[i + j + half][1] * wr;
                out[i + j][0] = ur + vr;
                out[i + j][1] = ui + vi;
                out[i + j + half][0] = ur - vr;
                out[i + j + half][1] = ui - vi;
            }
        }
    }
}

void fftwf_destroy_plan(fftwf_plan p) {
    if (!p) return;
    free(p->tw_re); free(p->tw_im); free(p->rev); free(p);
}

int fftwf_import_wisdom_from_file(FILE *f) { (void)f; return 1; }
int fftwf_export_wisdom_to_file(FILE *f) { (void)f; return 1; }
