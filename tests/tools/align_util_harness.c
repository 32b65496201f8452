/* Oracle harness for the align_util machinery with no callers in the
 * reference's built binaries: mark_infered_pws (align_util.c:662-758),
 * print_unused_ali (align_util.c:144-169) and Find_Exemplar
 * (align_util.c:760-832).
 *
 * modes:
 *   mark  nlist.maf leftnames rightnames postfix
 *         -> runs mark_infered_pws over the pairwise files
 *            <l>.<r>.<postfix> in cwd, then prints every pairwise
 *            block's UNUSED runs via print_unused_ali.
 *   exemplar  file.maf species src beg end startIndex
 *         -> builds the per-species sorted index and prints the greedy
 *            max-extension cover returned by Find_Exemplar plus the
 *            updated startIndex.
 *
 * Build (from a dir containing the reference sources):
 *   gcc -O2 -fcommon -w -o align_util_harness align_util_harness.c \
 *       align_util.c maf.c multi_util.c mz_scores.c util.c seq.c \
 *       nib.c charvec.c
 */
#include "maf.h"
#include "multi_util.h"
#include "mz_scores.h"
#include "align_util.h"

int main(int argc, char **argv) {
    argv0 = "align_util_harness";
    init_scores70();
    if (argc >= 2 && same_string(argv[1], "mark")) {
        struct mafFile *mf;
        struct pwuAliFiles *pws;
        NameListPtr ln, rn;
        int i, j;

        if (argc != 6)
            fatal("mark nlist.maf leftnames rightnames postfix");
        mf = mafReadAll(argv[2], 0);
        ln = formNameList(argv[3]);
        rn = formNameList(argv[4]);
        pws = create_pws(ln, rn, argv[5]);
        mark_infered_pws(mf->alignments, pws);
        for (i = 0; i < pws->pairK; ++i) {
            printf("## pairfile %d: %s\n", i,
                   pws->pwuAliFileArrs[i]->filename);
            for (j = 0; j < pws->pwuAliFileArrs[i]->uAliCount; ++j)
                print_unused_ali(
                    pws->pwuAliFileArrs[i]->uAliArr[j], stdout);
        }
        return 0;
    }
    if (argc >= 2 && same_string(argv[1], "exemplar")) {
        struct uAliFile *uf;
        struct sortuAlis *sal = NULL;
        struct uAli *head, *p;
        int k, start;

        if (argc != 8)
            fatal("exemplar file.maf species src beg end startIndex");
        uf = create_uAliFile(argv[2]);
        for (k = 0; k < uf->speciesCount; ++k)
            if (same_string(uf->speciesNames[k], argv[3])) {
                sal = uf->sorted[k];
                break;
            }
        if (sal == NULL)
            fatal("species not found");
        start = atoi(argv[7]);
        head = Find_Exemplar(sal, argv[4], atoi(argv[5]), atoi(argv[6]),
                             &start);
        printf("## startIndex %d\n", start);
        for (p = head; p != NULL; p = p->next)
            mafWrite(stdout, p->ali);
        return 0;
    }
    fatal("mode must be mark or exemplar");
    return 0;
}
