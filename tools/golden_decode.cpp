// Dumps the reference synth CLI's DECODE intermediates in double precision
// (the exact steps of test/synth.cpp:198-256) for parity testing.
// Usage: golden_decode <mgc.f32> <bap.f32> <T> <fs> <fft_size> <outdir>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "world/codec.h"
#include "sptkfunctions.h"

static void dump(const std::string &p, const double *d, long n) {
  FILE *f = fopen(p.c_str(), "wb");
  fwrite(d, sizeof(double), n, f);
  fclose(f);
}

int main(int argc, char **argv) {
  if (argc != 7) return 2;
  int T = atoi(argv[3]), fs = atoi(argv[4]), fft_size = atoi(argv[5]);
  std::string out = argv[6];
  int specl = 50, apl = 25;
  int half = fft_size / 2 + 1;

  std::vector<float> mgc_f(T * specl), bap_f(T * apl);
  FILE *f = fopen(argv[1], "rb");
  if (fread(mgc_f.data(), 4, mgc_f.size(), f) != mgc_f.size()) return 1;
  fclose(f);
  f = fopen(argv[2], "rb");
  if (fread(bap_f.data(), 4, bap_f.size(), f) != bap_f.size()) return 1;
  fclose(f);

  std::vector<double *> mgc(T), sp(T);
  std::vector<double> mgc_buf(T * specl), sp_buf((size_t)T * half);
  for (int i = 0; i < T; ++i) {
    mgc[i] = &mgc_buf[(size_t)i * specl];
    sp[i] = &sp_buf[(size_t)i * half];
    for (int j = 0; j < specl; ++j) mgc[i][j] = mgc_f[i * specl + j];
    mgc[i][0] -= 12.0;
  }
  DecodeSpectralEnvelope(mgc.data(), T, fs, fft_size, specl, sp.data());
  for (int i = 0; i < T; ++i)
    for (int j = 0; j < half; ++j) sp[i][j] /= 1e4;
  dump(out + "/sp_dec.f64", sp_buf.data(), sp_buf.size());

  // bap decode (synth.cpp:230-256); apl 25 is odd -> apl = 24
  int apl2 = apl - 1;
  std::vector<double> ap_buf((size_t)T * half, 0.0);
  std::vector<double> row(apl), xx(fft_size), yy(fft_size);
  for (int i = 0; i < T; ++i) {
    for (int j = 0; j < apl; ++j) row[j] = bap_f[i * apl + j];
    row[0] += 9.210340;
    mgc2sp(row.data(), apl2, 0.55, 0, xx.data(), yy.data(), fft_size);
    for (int j = 0; j < apl2; ++j)
      ap_buf[(size_t)i * half + j] = exp(xx[j]) / 1e4;
  }
  dump(out + "/ap_dec.f64", ap_buf.data(), ap_buf.size());
  printf("ok\n");
  return 0;
}
