/* Recall driver for the REFERENCE CPU backend.
 *
 * Reads float32 points (n x d) and queries (m x d) from raw binary files,
 * runs the unmodified reference precomp_cpu + query_cpu
 * (/root/reference/alg.c via algc.c), and writes the returned neighbor ids
 * (m x k, uint64) to a raw binary file.  Python computes recall against
 * the exact oracle — producing the same-algorithm quality number the
 * reference never published, at any operating point.
 *
 * Usage: ref_recall points.f32 queries.f32 n m d k tries out_ids.u64
 */
#include <stdio.h>
#include <stdlib.h>
#include "algc.h"
#include "ann.h"

static ftype *read_f32(const char *path, long cnt) {
  FILE *f = fopen(path, "rb");
  if (!f) { perror(path); exit(1); }
  float *buf = malloc(sizeof(float) * cnt);
  if (fread(buf, sizeof(float), cnt, f) != (size_t)cnt) {
    fprintf(stderr, "short read: %s\n", path);
    exit(1);
  }
  fclose(f);
  ftype *out = malloc(sizeof(ftype) * cnt);
  for (long i = 0; i < cnt; i++) out[i] = buf[i];
  free(buf);
  return out;
}

int main(int argc, char **argv) {
  if (argc != 9) {
    fprintf(stderr, "usage: %s points.f32 queries.f32 n m d k tries out.u64\n",
            argv[0]);
    return 2;
  }
  long n = atol(argv[3]), m = atol(argv[4]), d = atol(argv[5]);
  long k = atol(argv[6]), tries = atol(argv[7]);
  ftype *points = read_f32(argv[1], n * d);
  ftype *queries = read_f32(argv[2], m * d);

  save_t save;
  srandom(12345);
  size_t *graph = precomp_cpu(n, k, d, points, tries, 6, 1, 1, 1, &save, NULL);
  free(graph);
  fprintf(stderr, "precomp done\n");
  size_t *ids = query_cpu(&save, points, m, queries, NULL);
  fprintf(stderr, "query done\n");

  FILE *f = fopen(argv[8], "wb");
  if (!f) { perror(argv[8]); return 1; }
  fwrite(ids, sizeof(size_t), m * k, f);
  fclose(f);
  return 0;
}
