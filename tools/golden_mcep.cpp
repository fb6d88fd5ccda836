// mcep parity driver: runs the reference SPTK mcep (test/sptkfunctions.cpp)
// on a log-periodogram (itype=2, dd=0 so no early stop) and dumps the
// mel-cepstra.  Usage: golden_mcep <logsp.f64 (T x (fft/2+1))> <T> <fft>
//   <order> <alpha> <itr> <out.f64>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include "sptkfunctions.h"

int main(int argc, char **argv) {
  if (argc != 8) return 2;
  int T = atoi(argv[2]), fft = atoi(argv[3]), m = atoi(argv[4]);
  double alpha = atof(argv[5]);
  int itr = atoi(argv[6]);
  int half = fft / 2 + 1;
  std::vector<double> in((size_t)T * half), mc((size_t)T * (m + 1));
  FILE *f = fopen(argv[1], "rb");
  if (fread(in.data(), 8, in.size(), f) != in.size()) return 1;
  fclose(f);
  std::vector<double> row(fft);
  for (int i = 0; i < T; ++i) {
    for (int j = 0; j < half; ++j) row[j] = in[(size_t)i * half + j];
    // itype=2 (log amplitude), etype=1 e=0, itr1=2 itr2=itr, dd=0.0
    mcep(row.data(), fft, &mc[(size_t)i * (m + 1)], m, alpha, 2, itr, 0.0,
         1, 0.0, 0.0, 2);
  }
  f = fopen(argv[7], "wb");
  fwrite(mc.data(), 8, mc.size(), f);
  fclose(f);
  printf("ok\n");
  return 0;
}
