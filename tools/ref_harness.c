/* Ground-truth harness: links the reference's core C files (compiled
 * unmodified from /root/reference/src — they have no R dependency:
 * kmer_util.c:1-2, kmer_pos.c:1-3, suffix_hash.c:1-5, kmer_reader.c:1-8)
 * and dumps index tables / count stores / depth tracks as text, so the
 * test-suite can diff the *compiled C* against the refsem oracle
 * bit-for-bit.  This file is our own driver code; the algorithms under
 * test all live in the reference objects.
 *
 * Build (see tests/test_ground_truth.py):
 *   gcc -O2 -I /root/reference/src tools/ref_harness.c \
 *       /root/reference/src/{kmer_util,kmer_pos,suffix_hash,kmer_reader,\
 *        kmer_tree,thread_queue}.c -lz -lpthread -lm -o ref_harness
 *
 * Subcommands (all output is line-oriented text on stdout):
 *   index <fasta> <k> [pairs]
 *       build the position index of the FIRST sequence
 *       (src/kmer_pos.c:66-98); print one line per hash entry in khash
 *       iteration order:  K <kmer_u64> <count> <pos...>
 *       with "pairs": also  P <kmer_u64> <x> <y>  rows (the n(n-1)/2
 *       expansion of src/kmer_hash.c:1113-1121).
 *   query <fasta> <k> <qfrom> <qto>
 *       index the first sequence, then stream its [qfrom,qto) slice as the
 *       query (src/kmer_pos.c:110-136); print  Q <i> <j>  in emission order.
 *   count <k> <prefix_bits> <min_q_phred> <max_reads> <source_n>
 *         <fastq> <source> [<fastq> <source> ...]
 *       reader-pool counting with thread_n=1 (deterministic;
 *       src/kmer_reader.c:41-77), extending the same suffix_hash_n per
 *       file (src/kmer_reader.c:112-136); print  C <kmer_u64> <c0> [c1..]
 *   depth <k> <prefix_bits> <min_q_phred> <max_reads> <fastq> <fasta>
 *       count the fastq (source_n=1), then per-position counts of the
 *       first fasta sequence (src/kmer_reader.c:155-194); print one line
 *       per source row, INT_MIN for NA:  D <v0> <v1> ...
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <limits.h>
#include <stdint.h>

#include "kmer_pos.h"
#include "kmer_util.h"
#include "kmer_reader.h" /* brings kseq instantiation + suffix_hash.h */

static char *read_first_seq(const char *path) {
  gzFile fp = gzopen(path, "rb");
  if (!fp) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
  kseq_t *ks = kseq_init(fp);
  if (kseq_read(ks) < 0) { fprintf(stderr, "no sequence in %s\n", path); exit(2); }
  char *seq = strdup(ks->seq.s);
  kseq_destroy(ks);
  gzclose(fp);
  return seq;
}

static void cmd_index(const char *fasta, int k, int with_pairs) {
  char *seq = read_first_seq(fasta);
  khash_t(kmer_h) *h = kh_init(kmer_h);
  seq_to_hash(seq, k, h);
  for (khiter_t it = kh_begin(h); it != kh_end(h); ++it) {
    if (!kh_exist(h, it)) continue;
    kmer_pos_t *kp = &kh_val(h, it);
    printf("K %llu %zu", (unsigned long long)kh_key(h, it), kv_size(kp->v));
    for (size_t j = 0; j < kv_size(kp->v); ++j)
      printf(" %d", kv_A(kp->v, j));
    printf("\n");
    if (with_pairs) {
      for (size_t a = 0; a < kv_size(kp->v); ++a)
        for (size_t b = a + 1; b < kv_size(kp->v); ++b)
          printf("P %llu %d %d\n", (unsigned long long)kh_key(h, it),
                 kv_A(kp->v, a), kv_A(kp->v, b));
    }
  }
  clear_kmer_h(h); /* also kh_destroys (kmer_pos.c:10-19) */
  free(seq);
}

static void cmd_query(const char *fasta, int k, long qfrom, long qto) {
  char *seq = read_first_seq(fasta);
  long n = (long)strlen(seq);
  if (qto > n) qto = n;
  khash_t(kmer_h) *h = kh_init(kmer_h);
  seq_to_hash(seq, k, h);
  char *q = strndup(seq + qfrom, qto - qfrom);
  kmer_ppos pp = seq_kmer_positions(h, q, k);
  for (size_t i = 0; i + 1 < kv_size(pp); i += 2)
    printf("Q %d %d\n", kv_A(pp, i), kv_A(pp, i + 1));
  kv_destroy(pp);
  free(q);
  clear_kmer_h(h); /* also kh_destroys */
  free(seq);
}

static suffix_hash_n *count_files(int k, int prefix_bits, int min_q_phred,
                                  long max_reads, int source_n, int nfiles,
                                  char **files, int *sources) {
  kmer_reader_pool krp;
  unsigned char min_q = (unsigned char)('!' + min_q_phred); /* kmer_hash.c:819 */
  size_t max_size = ((size_t)1) << 40;
  size_t mr = max_reads < 0 ? (size_t)-1 : (size_t)max_reads;
  suffix_hash_n *sh = init_kmer_reader_pool(&krp, files[0], k, prefix_bits,
                                            max_size, 1, min_q, mr,
                                            source_n, sources[0]);
  join_kmer_reader_pool(&krp);
  free_kmer_reader_pool(&krp);
  for (int f = 1; f < nfiles; ++f) {
    sh = init_kmer_reader_pool_sh(&krp, files[f], k, sh, max_size, 1, min_q,
                                  mr, sources[f]);
    join_kmer_reader_pool(&krp);
    free_kmer_reader_pool(&krp);
  }
  return sh;
}

static void dump_counts(suffix_hash_n *sh) {
  for (size_t p = 0; p < sh->prefix_n; ++p) {
    if (!sh->prefixes[p]) continue;
    uint64_t base = ((uint64_t)p) << sh->suffix_bits;
    switch (sh->counts_n) {
      case 1: {
        khash_t(kcount) *h = (khash_t(kcount) *)sh->prefixes[p];
        for (khiter_t it = kh_begin(h); it != kh_end(h); ++it)
          if (kh_exist(h, it))
            printf("C %llu %u\n",
                   (unsigned long long)(base | kh_key(h, it)),
                   kh_val(h, it));
        break;
      }
      case 2: {
        khash_t(kcount_2) *h = (khash_t(kcount_2) *)sh->prefixes[p];
        for (khiter_t it = kh_begin(h); it != kh_end(h); ++it)
          if (kh_exist(h, it))
            printf("C %llu %u %u\n",
                   (unsigned long long)(base | kh_key(h, it)),
                   kh_val(h, it).n[0], kh_val(h, it).n[1]);
        break;
      }
      case 3: {
        khash_t(kcount_3) *h = (khash_t(kcount_3) *)sh->prefixes[p];
        for (khiter_t it = kh_begin(h); it != kh_end(h); ++it)
          if (kh_exist(h, it))
            printf("C %llu %u %u %u\n",
                   (unsigned long long)(base | kh_key(h, it)),
                   kh_val(h, it).n[0], kh_val(h, it).n[1],
                   kh_val(h, it).n[2]);
        break;
      }
      case 4: {
        khash_t(kcount_4) *h = (khash_t(kcount_4) *)sh->prefixes[p];
        for (khiter_t it = kh_begin(h); it != kh_end(h); ++it)
          if (kh_exist(h, it))
            printf("C %llu %u %u %u %u\n",
                   (unsigned long long)(base | kh_key(h, it)),
                   kh_val(h, it).n[0], kh_val(h, it).n[1],
                   kh_val(h, it).n[2], kh_val(h, it).n[3]);
        break;
      }
    }
  }
}

int main(int argc, char **argv) {
  if (argc < 2) { fprintf(stderr, "usage: see header\n"); return 2; }
  if (!strcmp(argv[1], "index") && argc >= 4) {
    cmd_index(argv[2], atoi(argv[3]), argc > 4 && !strcmp(argv[4], "pairs"));
  } else if (!strcmp(argv[1], "query") && argc >= 6) {
    cmd_query(argv[2], atoi(argv[3]), atol(argv[4]), atol(argv[5]));
  } else if (!strcmp(argv[1], "count") && argc >= 9) {
    int k = atoi(argv[2]), pb = atoi(argv[3]), mq = atoi(argv[4]);
    long mr = atol(argv[5]);
    int sn = atoi(argv[6]);
    int nfiles = (argc - 7) / 2;
    char **files = malloc(sizeof(char *) * nfiles);
    int *sources = malloc(sizeof(int) * nfiles);
    for (int f = 0; f < nfiles; ++f) {
      files[f] = argv[7 + 2 * f];
      sources[f] = atoi(argv[8 + 2 * f]);
    }
    suffix_hash_n *sh = count_files(k, pb, mq, mr, sn, nfiles, files, sources);
    dump_counts(sh);
    free_suffix_hash_n(sh);
    free(sh);
    free(files);
    free(sources);
  } else if (!strcmp(argv[1], "depth") && argc >= 8) {
    int k = atoi(argv[2]), pb = atoi(argv[3]), mq = atoi(argv[4]);
    long mr = atol(argv[5]);
    char *file = argv[6];
    int src0 = 0;
    suffix_hash_n *sh = count_files(k, pb, mq, mr, 1, 1, &file, &src0);
    char *seq = read_first_seq(argv[7]);
    size_t seq_l = strlen(seq);
    int *counts = malloc(sizeof(int) * seq_l * sh->counts_n);
    seq_kmer_counts(seq, seq_l, counts, sh, k);
    for (uint32_t r = 0; r < sh->counts_n; ++r) {
      printf("D");
      /* seq_kmer_counts fills counts as counts_n x seq_l column-major from
       * R's point of view (kmer_reader.c:176,189: counts[cn*(i-k)+j]) */
      for (size_t i = 0; i < seq_l; ++i)
        printf(" %d", counts[sh->counts_n * i + r]);
      printf("\n");
    }
    free(counts);
    free(seq);
    free_suffix_hash_n(sh);
    free(sh);
  } else {
    fprintf(stderr, "bad arguments\n");
    return 2;
  }
  return 0;
}
