/* Baseline timing driver for the REFERENCE CPU backend.
 *
 * Links the unmodified reference sources (algc.c + rand_pr.c, from
 * /root/reference, compiled out-of-tree) and times precomp_cpu /
 * query_cpu — producing the measured numbers BASELINE.md says the
 * reference never published (role of time_results.c, but emitting JSON
 * and skipping the OpenCL dependency).  This file is measurement
 * harness only; the framework itself shares no code with it.
 *
 * Usage: bench_ref n k d tries ycnt reps
 * Output: one JSON line with build_s and query_s (mean seconds).
 */
#include <stdio.h>
#include <stdlib.h>
#include <math.h>
#include <time.h>
#include "algc.h"
#include "ann.h"

static double now_s(void) {
  struct timespec t;
  clock_gettime(CLOCK_MONOTONIC, &t);
  return t.tv_sec + t.tv_nsec * 1e-9;
}

/* Own Gaussian generator (Box-Muller) — independent of the reference's. */
static double gauss(void) {
  double u = (random() + 1.0) / ((double)RAND_MAX + 2.0);
  double v = (random() + 1.0) / ((double)RAND_MAX + 2.0);
  return sqrt(-2.0 * log(u)) * cos(2.0 * M_PI * v);
}

int main(int argc, char **argv) {
  size_t n = argc > 1 ? strtoul(argv[1], 0, 0) : 10000;
  size_t k = argc > 2 ? strtoul(argv[2], 0, 0) : 10;
  size_t d = argc > 3 ? strtoul(argv[3], 0, 0) : 128;
  int tries = argc > 4 ? atoi(argv[4]) : 10;
  size_t ycnt = argc > 5 ? strtoul(argv[5], 0, 0) : 1000;
  int reps = argc > 6 ? atoi(argv[6]) : 3;
  srandom(12345);

  ftype *points = malloc(sizeof(ftype) * n * d);
  for (size_t i = 0; i < n * d; i++) points[i] = gauss();
  ftype *y = malloc(sizeof(ftype) * ycnt * d);
  for (size_t i = 0; i < ycnt * d; i++) y[i] = gauss();

  save_t save;
  double t0 = now_s();
  size_t *graph = precomp_cpu(n, k, d, points, tries, 6, 1, 1, 1, &save, NULL);
  double build_s = now_s() - t0;

  double q_total = 0;
  size_t *qres = NULL;
  for (int r = 0; r < reps; r++) {
    free(qres);
    t0 = now_s();
    qres = query_cpu(&save, points, ycnt, y, NULL);
    q_total += now_s() - t0;
  }
  double query_s = q_total / reps;

  /* Optional dump (argv[7] = output prefix) so recall can be scored
   * externally against a brute-force oracle. */
  if (argc > 7) {
    char path[512];
    FILE *f;
    snprintf(path, sizeof path, "%s_points.f32", argv[7]);
    f = fopen(path, "wb");
    for (size_t i = 0; i < n * d; i++) { float v = points[i]; fwrite(&v, 4, 1, f); }
    fclose(f);
    snprintf(path, sizeof path, "%s_y.f32", argv[7]);
    f = fopen(path, "wb");
    for (size_t i = 0; i < ycnt * d; i++) { float v = y[i]; fwrite(&v, 4, 1, f); }
    fclose(f);
    snprintf(path, sizeof path, "%s_graph.u64", argv[7]);
    f = fopen(path, "wb"); fwrite(graph, sizeof(size_t), n * k, f); fclose(f);
    snprintf(path, sizeof path, "%s_query.u64", argv[7]);
    f = fopen(path, "wb"); fwrite(qres, sizeof(size_t), ycnt * k, f); fclose(f);
  }
  free(graph);
  free(qres);
  printf("{\"n\": %zu, \"d\": %zu, \"k\": %zu, \"tries\": %d, \"ycnt\": %zu, "
         "\"build_s\": %.6f, \"query_s\": %.6f, \"qps\": %.2f}\n",
         n, d, k, tries, ycnt, build_s, query_s, ycnt / query_s);
  return 0;
}
