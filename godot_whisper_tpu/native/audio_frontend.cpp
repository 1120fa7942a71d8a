// Native audio frontend for godot_whisper_tpu.
//
// TPU-native equivalent of the reference's host-side native audio path:
// libsamplerate resampling (/root/reference/thirdparty/libsamplerate/,
// called from src/speech_to_text.cpp:16-43), the energy VAD
// (src/speech_to_text.cpp:53-104) and the capture ring handoff
// (AudioEffectCapture -> accumulated frames,
// bin/addons/godot_whisper/capture_stream_to_text.gd:73-75).
//
// The TPU does all model compute; this library keeps the realtime audio
// path (ring buffer, polyphase sinc resampler, VAD, energy envelope) in
// native code so the Python scheduler never touches per-sample loops.
// Exposed as a plain C ABI for ctypes; see native/bindings.py.
//
// Build: make -C godot_whisper_tpu/native

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

extern "C" {

// ---------------------------------------------------------------- ring buffer
// Single-producer single-consumer float ring (audio thread -> scheduler).
struct gwt_ring {
    std::vector<float> buf;
    std::atomic<uint64_t> head{0};  // write position (samples)
    std::atomic<uint64_t> tail{0};  // read position
};

gwt_ring* gwt_ring_new(uint64_t capacity) {
    auto* r = new gwt_ring();
    r->buf.resize(capacity);
    return r;
}

void gwt_ring_free(gwt_ring* r) { delete r; }

// Returns samples actually written (drops on overflow, like
// AudioEffectCapture when unread).
uint64_t gwt_ring_push(gwt_ring* r, const float* data, uint64_t n) {
    const uint64_t cap = r->buf.size();
    uint64_t head = r->head.load(std::memory_order_relaxed);
    const uint64_t tail = r->tail.load(std::memory_order_acquire);
    const uint64_t free_space = cap - (head - tail);
    if (n > free_space) n = free_space;
    for (uint64_t i = 0; i < n; i++) {
        r->buf[(head + i) % cap] = data[i];
    }
    r->head.store(head + n, std::memory_order_release);
    return n;
}

uint64_t gwt_ring_available(const gwt_ring* r) {
    return r->head.load(std::memory_order_acquire) -
           r->tail.load(std::memory_order_relaxed);
}

uint64_t gwt_ring_pop(gwt_ring* r, float* out, uint64_t n) {
    const uint64_t cap = r->buf.size();
    const uint64_t head = r->head.load(std::memory_order_acquire);
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    uint64_t avail = head - tail;
    if (n > avail) n = avail;
    for (uint64_t i = 0; i < n; i++) {
        out[i] = r->buf[(tail + i) % cap];
    }
    r->tail.store(tail + n, std::memory_order_release);
    return n;
}

// ------------------------------------------------------------------ resampler
// Polyphase Kaiser-windowed sinc, mirroring audio/resample.py's math so the
// two paths are interchangeable (tests assert equality).

static double bessel_i0(double x) {
    // series expansion; converges fast for the beta range we use
    double sum = 1.0, term = 1.0;
    const double x2 = x * x / 4.0;
    for (int k = 1; k < 64; k++) {
        term *= x2 / (k * k);
        sum += term;
        if (term < 1e-16 * sum) break;
    }
    return sum;
}

struct gwt_resampler {
    int L = 1, M = 1, taps = 16;
    std::vector<float> bank;  // (L, taps), phase-major
};

static uint64_t gcd_u64(uint64_t a, uint64_t b) {
    while (b) { uint64_t t = a % b; a = b; b = t; }
    return a;
}

gwt_resampler* gwt_resampler_new(int src_rate, int dst_rate,
                                 int taps_per_phase) {
    auto* rs = new gwt_resampler();
    uint64_t g = gcd_u64(src_rate, dst_rate);
    rs->L = (int)(dst_rate / g);
    rs->M = (int)(src_rate / g);
    rs->taps = taps_per_phase;

    const int n_taps = rs->L * taps_per_phase;
    const double cutoff =
        1.0 / (rs->L > rs->M ? rs->L : rs->M);
    const double beta = 8.6;
    const double i0b = bessel_i0(beta);

    std::vector<double> h(n_taps);
    const double center = (n_taps - 1) / 2.0;
    for (int i = 0; i < n_taps; i++) {
        const double n = i - center;
        const double x = cutoff * n;
        const double sinc = (x == 0.0) ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
        const double w_arg = 2.0 * i / (n_taps - 1) - 1.0;
        const double kaiser =
            bessel_i0(beta * std::sqrt(1.0 - w_arg * w_arg)) / i0b;
        h[i] = cutoff * sinc * kaiser * rs->L;
    }

    rs->bank.assign((size_t)rs->L * taps_per_phase, 0.0f);
    for (int p = 0; p < rs->L; p++) {
        int idx = 0;
        for (int i = p; i < n_taps; i += rs->L) {
            rs->bank[(size_t)p * taps_per_phase + idx++] = (float)h[i];
        }
    }
    return rs;
}

void gwt_resampler_free(gwt_resampler* rs) { delete rs; }

// One-shot resample; out must hold ceil(n * L / M) samples.
// Returns samples produced.
uint64_t gwt_resample(const gwt_resampler* rs, const float* x, uint64_t n,
                      float* out) {
    const int taps = rs->taps;
    const int half = taps / 2;
    const uint64_t n_out = (n * rs->L + rs->M - 1) / rs->M;
    const int64_t pad = taps;

    for (uint64_t k = 0; k < n_out; k++) {
        const uint64_t kM = k * rs->M;
        const int64_t q = (int64_t)(kM / rs->L);
        const int r = (int)(kM % rs->L);
        const float* phase = &rs->bank[(size_t)r * taps];
        // window of x ending at q+half, time-reversed filter
        double acc = 0.0;
        const int64_t start = q - half - (taps % 2) + 0;
        for (int t = 0; t < taps; t++) {
            const int64_t src = start + t;
            if (src >= 0 && src < (int64_t)n) {
                acc += (double)x[src] * phase[taps - 1 - t];
            }
        }
        (void)pad;
        out[k] = (float)acc;
    }
    return n_out;
}

// ----------------------------------------------------------------------- VAD
// In-place high-pass quirk + energy ratio, mirroring audio/vad.py.
int gwt_vad_simple(const float* pcm, uint64_t n, int sample_rate,
                   int last_ms, float vad_thold, float freq_thold) {
    const uint64_t n_last = (uint64_t)sample_rate * last_ms / 1000;
    if (n_last >= n) return 0;

    float alpha = 1.0f;
    if (freq_thold > 0.0f) {
        const float rc = 1.0f / (2.0f * (float)M_PI * freq_thold);
        const float dt = 1.0f / sample_rate;
        alpha = dt / (rc + dt);
    }

    double energy_all = 0.0, energy_last = 0.0;
    for (uint64_t i = 0; i < n; i++) {
        const float y = (i == 0) ? pcm[0] : alpha * pcm[i];
        const float a = std::fabs(y);
        energy_all += a;
        if (i >= n - n_last) energy_last += a;
    }
    energy_all /= (double)n;
    if (n_last) energy_last /= (double)n_last;

    if (!(energy_all < 1e-4 && energy_last < 1e-4) ||
        energy_last > vad_thold * energy_all) {
        return 0;
    }
    return 1;
}

// -------------------------------------------------------------- energy (VAD2)
// Sliding-mean |x| for token-timestamp VAD (whisper.cpp:6350-6366),
// linear-time prefix-sum version.
void gwt_signal_energy(const float* x, uint64_t n, int half_window,
                       float* out) {
    std::vector<double> cs(n + 1, 0.0);
    for (uint64_t i = 0; i < n; i++) cs[i + 1] = cs[i] + std::fabs(x[i]);
    const int hw = half_window;
    for (uint64_t i = 0; i < n; i++) {
        const int64_t lo = (int64_t)i - hw < 0 ? 0 : (int64_t)i - hw;
        const uint64_t hi = i + hw + 1 > n ? n : i + hw + 1;
        out[i] = (float)((cs[hi] - cs[lo]) / (2 * hw + 1));
    }
}

// ------------------------------------------------------------------ mixdown
void gwt_mixdown_stereo(const float* interleaved, uint64_t frames,
                        float* mono) {
    for (uint64_t i = 0; i < frames; i++) {
        mono[i] = 0.5f * (interleaved[2 * i] + interleaved[2 * i + 1]);
    }
}

}  // extern "C"
