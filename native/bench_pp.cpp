// Micro-benchmark for the host polyphase kernels (native/hostdsp.cpp).
//
// Times stage-1 (640 complex taps, R=80, u8 input) and stage-2 (2400
// real taps, R=80) at production shapes against candidate inner-loop
// formulations, printing Msps (input samples/s) per variant. Used to
// pick the shipped pp_dot structure; not part of the library build.
//
//   g++ -O3 -march=native -std=c++17 -o /tmp/bench_pp native/bench_pp.cpp
//   /tmp/bench_pp
//
// Reference for shapes: frontend/filters.py (STAGE1_TAPS=640, R1=80,
// STAGE2_TAPS=2400, R2=80); reference hot loop rtlsdr_wsprd.c:184-234.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// ---- variant A: shipped kernel (fused a += vi*gr - vq*gi, kW banks) --------
template <int kW, typename In>
inline void dot_fused(const In* bi, const In* bq, const float* gr,
                      const float* gi, int64_t taps, float center,
                      float* outI, float* outQ) {
  float aI[kW] = {0}, aQ[kW] = {0};
  int64_t k = 0;
  for (; k + kW <= taps; k += kW) {
    for (int j = 0; j < kW; ++j) {
      const float vi = static_cast<float>(bi[k + j]) - center;
      const float vq = static_cast<float>(bq[k + j]) - center;
      aI[j] += vi * gr[k + j] - vq * gi[k + j];
      aQ[j] += vi * gi[k + j] + vq * gr[k + j];
    }
  }
  float ai = 0.0f, aq = 0.0f;
  for (; k < taps; ++k) {
    const float vi = static_cast<float>(bi[k]) - center;
    const float vq = static_cast<float>(bq[k]) - center;
    ai += vi * gr[k] - vq * gi[k];
    aq += vi * gi[k] + vq * gr[k];
  }
  for (int j = 0; j < kW; ++j) {
    ai += aI[j];
    aq += aQ[j];
  }
  *outI = ai;
  *outQ = aq;
}

// ---- variant B: 4 independent product banks (single FMA per update) --------
template <int kW, typename In>
inline void dot_banks4(const In* bi, const In* bq, const float* gr,
                       const float* gi, int64_t taps, float center,
                       float* outI, float* outQ) {
  float A[kW] = {0}, B[kW] = {0}, C[kW] = {0}, D[kW] = {0};
  int64_t k = 0;
  for (; k + kW <= taps; k += kW) {
    for (int j = 0; j < kW; ++j) {
      const float vi = static_cast<float>(bi[k + j]) - center;
      const float vq = static_cast<float>(bq[k + j]) - center;
      A[j] += vi * gr[k + j];
      B[j] += vq * gi[k + j];
      C[j] += vi * gi[k + j];
      D[j] += vq * gr[k + j];
    }
  }
  float ai = 0.0f, aq = 0.0f;
  for (; k < taps; ++k) {
    const float vi = static_cast<float>(bi[k]) - center;
    const float vq = static_cast<float>(bq[k]) - center;
    ai += vi * gr[k] - vq * gi[k];
    aq += vi * gi[k] + vq * gr[k];
  }
  for (int j = 0; j < kW; ++j) {
    ai += A[j] - B[j];
    aq += C[j] + D[j];
  }
  *outI = ai;
  *outQ = aq;
}

// ---- variant C: 4 banks, 2 outputs per pass (shared tap loads) -------------
template <int kW, typename In>
inline void dot_banks4_x2(const In* bi, const In* bq, const float* gr,
                          const float* gi, int64_t taps, int64_t R,
                          float* outI, float* outQ) {
  float A0[kW] = {0}, B0[kW] = {0}, C0[kW] = {0}, D0[kW] = {0};
  float A1[kW] = {0}, B1[kW] = {0}, C1[kW] = {0}, D1[kW] = {0};
  for (int64_t k = 0; k + kW <= taps; k += kW) {
    for (int j = 0; j < kW; ++j) {
      const float g_r = gr[k + j];
      const float g_i = gi[k + j];
      const float vi0 = static_cast<float>(bi[k + j]);
      const float vq0 = static_cast<float>(bq[k + j]);
      const float vi1 = static_cast<float>(bi[R + k + j]);
      const float vq1 = static_cast<float>(bq[R + k + j]);
      A0[j] += vi0 * g_r;
      B0[j] += vq0 * g_i;
      C0[j] += vi0 * g_i;
      D0[j] += vq0 * g_r;
      A1[j] += vi1 * g_r;
      B1[j] += vq1 * g_i;
      C1[j] += vi1 * g_i;
      D1[j] += vq1 * g_r;
    }
  }
  float ai0 = 0, aq0 = 0, ai1 = 0, aq1 = 0;
  for (int j = 0; j < kW; ++j) {
    ai0 += A0[j] - B0[j];
    aq0 += C0[j] + D0[j];
    ai1 += A1[j] - B1[j];
    aq1 += C1[j] + D1[j];
  }
  outI[0] = ai0;
  outQ[0] = aq0;
  outI[1] = ai1;
  outQ[1] = aq1;
}

// ---- variant D: 4 banks, P outputs per pass (template) ---------------------
template <int kW, int P, typename In>
inline void dot_banks4_xp(const In* bi, const In* bq, const float* gr,
                          const float* gi, int64_t taps, int64_t R,
                          float* outI, float* outQ) {
  float A[P][kW] = {{0}}, B[P][kW] = {{0}}, C[P][kW] = {{0}},
        D[P][kW] = {{0}};
  for (int64_t k = 0; k + kW <= taps; k += kW) {
    for (int j = 0; j < kW; ++j) {
      const float g_r = gr[k + j];
      const float g_i = gi[k + j];
      for (int p = 0; p < P; ++p) {
        const float vi = static_cast<float>(bi[p * R + k + j]);
        const float vq = static_cast<float>(bq[p * R + k + j]);
        A[p][j] += vi * g_r;
        B[p][j] += vq * g_i;
        C[p][j] += vi * g_i;
        D[p][j] += vq * g_r;
      }
    }
  }
  for (int p = 0; p < P; ++p) {
    float ai = 0, aq = 0;
    for (int j = 0; j < kW; ++j) {
      ai += A[p][j] - B[p][j];
      aq += C[p][j] + D[p][j];
    }
    outI[p] = ai;
    outQ[p] = aq;
  }
}

// ---- variant E: tiled u8 conversion + banks4 dots ---------------------------
// Convert a cache-sized tile of raw bytes, then run every dot whose
// window lies inside it — the converted floats are still in L2 when
// the dots read them (the monolithic pre-pass round-trips 19 MB
// through DRAM between conversion and use).
template <int kW, int kTileFrames, int kP>
inline void pp_u8_tiled(const uint8_t* xI, const uint8_t* xQ,
                        const float* gr, const float* gi, int64_t taps,
                        int64_t R, int64_t n_frames, float* yI,
                        float* yQ) {
  const int64_t tile_in = kTileFrames * R + taps - R;
  std::vector<float> buf(2 * tile_in);
  float* fI[2] = {buf.data(), buf.data() + tile_in};
  for (int64_t m0 = 0; m0 < n_frames; m0 += kTileFrames) {
    const int64_t mn = std::min<int64_t>(kTileFrames, n_frames - m0);
    const int64_t need = mn * R + taps - R;
    const uint8_t* bi = xI + m0 * R;
    const uint8_t* bq = xQ + m0 * R;
    for (int64_t k = 0; k < need; ++k) {
      fI[0][k] = static_cast<float>(bi[k]) - 128.0f;
      fI[1][k] = static_cast<float>(bq[k]) - 128.0f;
    }
    int64_t m = 0;
    for (; m + kP <= mn; m += kP) {
      dot_banks4_xp<kW, kP, float>(fI[0] + m * R, fI[1] + m * R, gr, gi,
                                   taps, R, yI + m0 + m, yQ + m0 + m);
    }
    for (; m < mn; ++m) {
      dot_banks4<kW>(fI[0] + m * R, fI[1] + m * R, gr, gi, taps, 0.0f,
                     &yI[m0 + m], &yQ[m0 + m]);
    }
  }
}

// ---- stage-2 (real taps) variants ------------------------------------------
template <int kW>
inline void fir_fused(const float* bi, const float* bq, const float* g,
                      int64_t taps, float* outI, float* outQ) {
  float aI[kW] = {0}, aQ[kW] = {0};
  int64_t k = 0;
  for (; k + kW <= taps; k += kW) {
    for (int j = 0; j < kW; ++j) {
      aI[j] += bi[k + j] * g[k + j];
      aQ[j] += bq[k + j] * g[k + j];
    }
  }
  float ai = 0, aq = 0;
  for (; k < taps; ++k) {
    ai += bi[k] * g[k];
    aq += bq[k] * g[k];
  }
  for (int j = 0; j < kW; ++j) {
    ai += aI[j];
    aq += aQ[j];
  }
  *outI = ai;
  *outQ = aq;
}

double now() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

constexpr int64_t kTaps1 = 640, kR = 80, kFrames1 = 30000;
constexpr int64_t kTaps2 = 2400, kFrames2 = 375;

template <typename Fn>
double bench(const char* name, Fn body, int64_t in_samples, int iters = 8) {
  body();  // warm
  double best = 1e30;
  for (int it = 0; it < iters; ++it) {
    const double t0 = now();
    body();
    best = std::min(best, now() - t0);
  }
  const double msps = in_samples / best / 1e6;
  std::printf("%-44s %8.1f Msps  (%.2f ms)\n", name, msps, best * 1e3);
  return msps;
}

}  // namespace

int main() {
  const int64_t L1 = kFrames1 * kR + kTaps1 - kR;
  std::vector<uint8_t> u8I(L1), u8Q(L1);
  std::vector<float> fI(L1), fQ(L1);
  std::srand(7);
  for (int64_t k = 0; k < L1; ++k) {
    u8I[k] = std::rand() & 0xFF;
    u8Q[k] = std::rand() & 0xFF;
    fI[k] = u8I[k] - 128.0f;
    fQ[k] = u8Q[k] - 128.0f;
  }
  std::vector<float> gr(kTaps1), gi(kTaps1);
  for (int64_t k = 0; k < kTaps1; ++k) {
    gr[k] = std::cos(0.01f * k) / kTaps1;
    gi[k] = std::sin(0.01f * k) / kTaps1;
  }
  std::vector<float> yI(kFrames1), yQ(kFrames1);

  const int64_t in1 = kFrames1 * kR;
  std::printf("-- stage 1: %lld complex taps, R=%lld, %lld frames --\n",
              (long long)kTaps1, (long long)kR, (long long)kFrames1);

  bench("A fused kW=16 (shipped), pre-converted f32", [&] {
    for (int64_t m = 0; m < kFrames1; ++m)
      dot_fused<16>(fI.data() + m * kR, fQ.data() + m * kR, gr.data(),
                    gi.data(), kTaps1, 0.0f, &yI[m], &yQ[m]);
  }, in1);
  double sink = yI[1] + yQ[7];

  bench("B banks4 kW=16, pre-converted f32", [&] {
    for (int64_t m = 0; m < kFrames1; ++m)
      dot_banks4<16>(fI.data() + m * kR, fQ.data() + m * kR, gr.data(),
                     gi.data(), kTaps1, 0.0f, &yI[m], &yQ[m]);
  }, in1);
  sink += yI[2];

  bench("B banks4 kW=32, pre-converted f32", [&] {
    for (int64_t m = 0; m < kFrames1; ++m)
      dot_banks4<32>(fI.data() + m * kR, fQ.data() + m * kR, gr.data(),
                     gi.data(), kTaps1, 0.0f, &yI[m], &yQ[m]);
  }, in1);
  sink += yI[3];

  bench("C banks4 kW=16 x2 outputs, pre-converted", [&] {
    for (int64_t m = 0; m + 2 <= kFrames1; m += 2)
      dot_banks4_x2<16>(fI.data() + m * kR, fQ.data() + m * kR, gr.data(),
                        gi.data(), kTaps1, kR, &yI[m], &yQ[m]);
  }, in1);
  sink += yI[4];

  bench("D banks4 kW=16 x4 outputs, pre-converted", [&] {
    for (int64_t m = 0; m + 4 <= kFrames1; m += 4)
      dot_banks4_xp<16, 4, float>(fI.data() + m * kR, fQ.data() + m * kR,
                                  gr.data(), gi.data(), kTaps1, kR,
                                  &yI[m], &yQ[m]);
  }, in1);
  sink += yI[6];

  bench("E tiled u8 (256-frame tiles, x2 dots)", [&] {
    pp_u8_tiled<16, 256, 2>(u8I.data(), u8Q.data(), gr.data(), gi.data(),
                            kTaps1, kR, kFrames1, yI.data(), yQ.data());
  }, in1);
  sink += yI[7];

  bench("E tiled u8 (256-frame tiles, x4 dots)", [&] {
    pp_u8_tiled<16, 256, 4>(u8I.data(), u8Q.data(), gr.data(), gi.data(),
                            kTaps1, kR, kFrames1, yI.data(), yQ.data());
  }, in1);
  sink += yI[8];

  bench("E tiled u8 (64-frame tiles, x2 dots)", [&] {
    pp_u8_tiled<16, 64, 2>(u8I.data(), u8Q.data(), gr.data(), gi.data(),
                           kTaps1, kR, kFrames1, yI.data(), yQ.data());
  }, in1);
  sink += yI[9];

  bench("B banks4 kW=16, u8 direct (convert in dot)", [&] {
    for (int64_t m = 0; m < kFrames1; ++m)
      dot_banks4<16>(u8I.data() + m * kR, u8Q.data() + m * kR, gr.data(),
                     gi.data(), kTaps1, 128.0f, &yI[m], &yQ[m]);
  }, in1);
  sink += yI[5];

  // u8 -> f32 conversion pass alone (the wspr_pp_decimate_u8 pre-pass)
  bench("u8->f32 center conversion pass alone", [&] {
    for (int64_t k = 0; k < L1; ++k) {
      fI[k] = static_cast<float>(u8I[k]) - 128.0f;
      fQ[k] = static_cast<float>(u8Q[k]) - 128.0f;
    }
  }, L1);
  sink += fI[9];

  std::printf("-- stage 2: %lld real taps, R=%lld, %lld frames --\n",
              (long long)kTaps2, (long long)kR, (long long)kFrames2);
  const int64_t L2 = kFrames2 * kR + kTaps2 - kR;
  std::vector<float> g2(kTaps2);
  for (int64_t k = 0; k < kTaps2; ++k) g2[k] = std::cos(0.003f * k) / kTaps2;
  std::vector<float> y2I(kFrames2), y2Q(kFrames2);
  const int64_t in2 = kFrames2 * kR;

  bench("fir fused kW=16 (shipped)", [&] {
    for (int64_t m = 0; m < kFrames2; ++m)
      fir_fused<16>(fI.data() + m * kR, fQ.data() + m * kR, g2.data(),
                    kTaps2, &y2I[m], &y2Q[m]);
  }, in2, 32);
  sink += y2I[1];

  bench("fir fused kW=32", [&] {
    for (int64_t m = 0; m < kFrames2; ++m)
      fir_fused<32>(fI.data() + m * kR, fQ.data() + m * kR, g2.data(),
                    kTaps2, &y2I[m], &y2Q[m]);
  }, in2, 32);
  sink += y2I[2];

  // consistency check: banks4 == fused to float tolerance
  float rI, rQ, sI, sQ;
  dot_fused<16>(fI.data(), fQ.data(), gr.data(), gi.data(), kTaps1, 0.0f,
                &rI, &rQ);
  dot_banks4<16>(fI.data(), fQ.data(), gr.data(), gi.data(), kTaps1, 0.0f,
                 &sI, &sQ);
  std::printf("check: fused=(%.6f,%.6f) banks4=(%.6f,%.6f)\n", rI, rQ, sI,
              sQ);
  if (std::fabs(rI - sI) > 1e-3f * (std::fabs(rI) + 1.0f) ||
      std::fabs(rQ - sQ) > 1e-3f * (std::fabs(rQ) + 1.0f)) {
    std::printf("MISMATCH\n");
    return 1;
  }
  std::printf("sink=%g\n", sink);
  return 0;
}
