/* Minimal STREAM-triad bandwidth probe: a[i] = b[i] + s*c[i] over arrays
 * far larger than cache; reports best-of-reps GB/s (3 arrays * 8 B moved
 * per element, write-allocate counted as in standard STREAM). */
#include <stdio.h>
#include <stdlib.h>
#include <omp.h>
#define N (80*1000*1000L)
int main(int argc, char** argv) {
    double *a = malloc(N*8), *b = malloc(N*8), *c = malloc(N*8);
    #pragma omp parallel for
    for (long i = 0; i < N; i++) { a[i]=1.0; b[i]=2.0; c[i]=3.0; }
    double best = 0;
    for (int r = 0; r < 5; r++) {
        double t0 = omp_get_wtime();
        #pragma omp parallel for
        for (long i = 0; i < N; i++) a[i] = b[i] + 1.5*c[i];
        double dt = omp_get_wtime() - t0;
        double gbs = 3.0*8.0*N/dt/1e9;
        if (gbs > best) best = gbs;
    }
    printf("%.2f\n", best);
    if (a[7] < 0) printf("x");
    return 0;
}
