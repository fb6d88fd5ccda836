// Golden-file generator: drives the REFERENCE WORLD library (built from
// /root/reference/externs/WORLD_v2, see tools/make_golden.py) and dumps
// double-precision intermediates for parity tests.  This file is part of the
// NEW framework's test tooling; it links against the unmodified reference
// library and replicates the exact call sequence of test/analysis.cpp:93-203
// and test/synth.cpp:97-108.
//
// Usage: golden_harness <x.f64> <fs> <outdir>
//   x.f64 : raw little-endian float64 samples
//   dumps: randn.f64 dio_t.f64 dio_f0.f64 sm_f0.f64 sp.f64 ap.f64 y.f64
//          decim4.f64 (decimate(x,4))
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "world/cheaptrick.h"
#include "world/common.h"
#include "world/constantnumbers.h"
#include "world/d4c.h"
#include "world/dio.h"
#include "world/harvest.h"
#include "world/matlabfunctions.h"
#include "world/stonemask.h"
#include "world/synthesis.h"

static void dump(const std::string &path, const double *p, long n) {
  FILE *f = fopen(path.c_str(), "wb");
  if (!f) { perror(path.c_str()); exit(1); }
  fwrite(p, sizeof(double), n, f);
  fclose(f);
}

int main(int argc, char **argv) {
  if (argc != 4) {
    fprintf(stderr, "usage: %s <x.f64> <fs> <outdir>\n", argv[0]);
    return 2;
  }
  FILE *f = fopen(argv[1], "rb");
  if (!f) { perror(argv[1]); return 1; }
  fseek(f, 0, SEEK_END);
  long n = ftell(f) / (long)sizeof(double);
  fseek(f, 0, SEEK_SET);
  std::vector<double> x(n);
  if (fread(x.data(), sizeof(double), n, f) != (size_t)n) return 1;
  fclose(f);
  int fs = atoi(argv[2]);
  std::string out = argv[3];

  // randn sequence (first 4096 draws after reseed)
  {
    randn_reseed();
    std::vector<double> r(4096);
    for (auto &v : r) v = randn();
    dump(out + "/randn.f64", r.data(), r.size());
  }
  // decimate r=4.  NOTE: the reference writes count = (n+8-nbeg)/4+1 values,
  // which can exceed the MATLAB nout=(n-1)/4+1 by up to 2 (its callers
  // over-allocate, dio.cpp:63); dump only the first nout.
  {
    int nout = (int)((n - 1) / 4 + 1);
    std::vector<double> y(nout + 4);
    decimate(x.data(), (int)n, 4, y.data());
    dump(out + "/decim4.f64", y.data(), nout);
  }

  double frame_period = 5.0;
  DioOption dio_opt = {0};
  InitializeDioOption(&dio_opt);
  dio_opt.frame_period = frame_period;
  dio_opt.speed = 1;
  dio_opt.f0_floor = 71.0;
  dio_opt.allowed_range = 0.1;
  int f0_length = GetSamplesForDIO(fs, (int)n, frame_period);
  std::vector<double> t(f0_length), f0(f0_length), rf0(f0_length);
  Dio(x.data(), (int)n, fs, &dio_opt, t.data(), f0.data());
  dump(out + "/dio_t.f64", t.data(), f0_length);
  dump(out + "/dio_f0.f64", f0.data(), f0_length);
  StoneMask(x.data(), (int)n, fs, t.data(), f0.data(), f0_length, rf0.data());
  dump(out + "/sm_f0.f64", rf0.data(), f0_length);

  // Harvest F0 (frame_period 5 -> internal 1 ms + decimation)
  {
    HarvestOption h_opt = {0};
    InitializeHarvestOption(&h_opt);
    h_opt.frame_period = frame_period;
    std::vector<double> ht(f0_length), hf0(f0_length);
    Harvest(x.data(), (int)n, fs, &h_opt, ht.data(), hf0.data());
    dump(out + "/harvest_f0.f64", hf0.data(), f0_length);
  }

  CheapTrickOption ct_opt = {0};
  InitializeCheapTrickOption(fs, &ct_opt);
  ct_opt.q1 = -0.15;
  ct_opt.f0_floor = 71.0;
  int fft_size = GetFFTSizeForCheapTrick(fs, &ct_opt);
  int half = fft_size / 2 + 1;
  std::vector<double *> sp(f0_length), ap(f0_length);
  std::vector<double> sp_buf((size_t)f0_length * half), ap_buf((size_t)f0_length * half);
  for (int i = 0; i < f0_length; ++i) {
    sp[i] = &sp_buf[(size_t)i * half];
    ap[i] = &ap_buf[(size_t)i * half];
  }
  CheapTrick(x.data(), (int)n, fs, t.data(), rf0.data(), f0_length, &ct_opt,
             sp.data());
  dump(out + "/sp.f64", sp_buf.data(), sp_buf.size());

  D4COption d4c_opt = {0};
  InitializeD4COption(&d4c_opt);
  d4c_opt.threshold = 0.0;
  D4C(x.data(), (int)n, fs, t.data(), rf0.data(), f0_length, fft_size,
      &d4c_opt, ap.data());
  dump(out + "/ap.f64", ap_buf.data(), ap_buf.size());

  int y_length = (int)((f0_length - 1) * frame_period / 1000.0 * fs) + 1;
  std::vector<double> y(y_length);
  Synthesis(rf0.data(), f0_length, sp.data(), ap.data(), fft_size,
            frame_period, fs, y_length, y.data());
  dump(out + "/y.f64", y.data(), y_length);

  printf("ok f0_length=%d fft_size=%d y_length=%d\n", f0_length, fft_size,
         y_length);
  return 0;
}
