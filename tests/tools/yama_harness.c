/* Test harness: drive the reference yama() on a problem read from stdin.
 * Built by tests/make_golden.py against the reference sources (which are
 * NOT part of this repo); used only to generate golden fixtures.
 *
 * Input:  K M L N
 *         LB[0..M]
 *         RB[0..M]
 *         M lines of K chars (columns of A)
 *         N lines of L chars (columns of B)
 * Output: M_new, then M_new lines of K+L chars.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "util.h"
#include "maf.h"
#include "mz_scores.h"
#include "mz_yama.h"

int main(void) {
    int K, M, L, N, i, j, M_new;
    int *LB, *RB;
    uchar **A, **B, **out;
    char buf[4096];

    argv0 = "yama_harness";
    init_scores70();
    if (scanf("%d %d %d %d", &K, &M, &L, &N) != 4) return 1;
    LB = malloc((M + 1) * sizeof(int));
    RB = malloc((M + 1) * sizeof(int));
    for (i = 0; i <= M; i++) scanf("%d", &LB[i]);
    for (i = 0; i <= M; i++) scanf("%d", &RB[i]);
    A = (uchar **)malloc(M * sizeof(uchar *)) - 1;
    A[1] = malloc((size_t)K * M + 1);
    for (i = 2; i <= M; i++) A[i] = A[i - 1] + K;
    for (i = 1; i <= M; i++) {
        scanf("%s", buf);
        memcpy(A[i], buf, K);
    }
    B = (uchar **)malloc(N * sizeof(uchar *)) - 1;
    B[1] = malloc((size_t)L * N + 1);
    for (i = 2; i <= N; i++) B[i] = B[i - 1] + L;
    for (i = 1; i <= N; i++) {
        scanf("%s", buf);
        memcpy(B[i], buf, L);
    }
    yama(A, K, M, B, L, N, LB, RB, &out, &M_new);
    printf("%d\n", M_new);
    for (i = 1; i <= M_new; i++) {
        for (j = 0; j < K + L; j++) putchar(out[i][j]);
        putchar('\n');
    }
    return 0;
}
