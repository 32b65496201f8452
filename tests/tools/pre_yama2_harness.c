/* Standalone oracle harness for pre_yama2 + connectionAgreement2
 * (mz_preyama.c:387-521, align_util.c:520-659), which have no callers in
 * the reference's built binaries.
 *
 * args: a2.maf a3.maf bridge.maf "leftnames" "rightnames" postfix
 *       beg1 end1 begN endN radius
 *
 * Reads the FIRST block of each maf; builds the pairwise collection via
 * create_pws (files <left>.<right>.<postfix> in cwd); prints the merged
 * block, or "NULL" when the merge is rejected/empty.
 *
 * Build (from a dir containing the reference sources):
 *   gcc -O2 -fcommon -w -o pre_yama2_harness pre_yama2_harness.c \
 *       mz_preyama.c mz_yama.c align_util.c maf.c multi_util.c \
 *       mz_scores.c util.c seq.c nib.c charvec.c
 */
#include "maf.h"
#include "multi_util.h"
#include "mz_scores.h"
#include "align_util.h"

struct mafAli *pre_yama2(struct mafAli *a1, struct mafAli *a2,
                         struct mafAli *a3, int beg1, int end1, int begN,
                         int endN, int radius, struct pwuAliFiles *pws);

static struct mafAli *first_block(const char *path) {
    struct mafFile *mf = mafReadAll((char *)path, 0);
    struct mafAli *a = mf->alignments;
    if (a == NULL)
        fatalf("no blocks in %s", path);
    return a;
}

int main(int argc, char **argv) {
    struct mafAli *a1, *a2, *a3, *val;
    struct pwuAliFiles *pws;
    NameListPtr leftnames, rightnames;

    if (argc != 12)
        fatal("args: a2.maf a3.maf bridge.maf leftnames rightnames "
              "postfix beg1 end1 begN endN radius");
    argv0 = "pre_yama2_harness";
    init_scores70();
    a2 = first_block(argv[1]);
    a3 = first_block(argv[2]);
    a1 = first_block(argv[3]);
    leftnames = formNameList(argv[4]);
    rightnames = formNameList(argv[5]);
    pws = create_pws(leftnames, rightnames, argv[6]);
    val = pre_yama2(a1, a2, a3, atoi(argv[7]), atoi(argv[8]),
                    atoi(argv[9]), atoi(argv[10]), atoi(argv[11]), pws);
    if (val == NULL)
        printf("NULL\n");
    else
        mafWrite(stdout, val);
    return 0;
}
