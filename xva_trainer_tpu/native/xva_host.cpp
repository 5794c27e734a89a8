// Native host pipeline kernels for xva_trainer_tpu.
//
// The reference offloads host work to native code (ffmpeg/sox binaries for
// decode/resample, numba-JIT MAS, Cython .pyd extensions — SURVEY.md §2.5).
// This library provides the TPU build's host-side equivalents, called from
// Python via ctypes (each call releases the GIL, so a thread pool gets real
// parallelism):
//
//   xva_decode_wav      — RIFF/WAVE PCM16/24/32/float decoder → mono float32
//   xva_resample        — windowed-sinc polyphase resampler
//   xva_yin             — YIN f0 (difference fn via ACF, CMNDF, parabolic)
//   xva_find_silences   — frame-RMS silence region scan
//
// Build: g++ -O3 -march=native -shared -fPIC -o libxva_host.so xva_host.cpp
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <complex>
#include <vector>
#include <algorithm>

extern "C" {

void xva_free(float* p) { free(p); }

// ---------------------------------------------------------------- wav decode
// Returns 0 on success; out buffer is malloc'd mono float32 in [-1, 1].
int xva_decode_wav(const char* path, float** out, int* n_samples, int* sample_rate) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    char riff[4];
    uint32_t riff_size;
    char wave[4];
    if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) ||
        fread(&riff_size, 4, 1, f) != 1 ||
        fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4)) {
        fclose(f);
        return 2;
    }
    uint16_t fmt = 0, channels = 0, bits = 0, sub_fmt = 0;
    uint32_t sr = 0;
    long data_pos = -1;
    uint32_t data_size = 0;
    while (true) {
        char id[4];
        uint32_t size;
        if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
        if (!memcmp(id, "fmt ", 4)) {
            uint8_t buf[40] = {0};
            fread(buf, 1, std::min<uint32_t>(size, 40), f);
            if (size > 40) fseek(f, size - 40, SEEK_CUR);
            fmt = buf[0] | (buf[1] << 8);
            channels = buf[2] | (buf[3] << 8);
            sr = buf[4] | (buf[5] << 8) | (buf[6] << 16) | ((uint32_t)buf[7] << 24);
            if (size >= 16) bits = buf[14] | (buf[15] << 8);
            if (size >= 26) sub_fmt = buf[24] | (buf[25] << 8);
        } else if (!memcmp(id, "data", 4)) {
            data_pos = ftell(f);
            data_size = size;
            fseek(f, (size + 1) & ~1u, SEEK_CUR);
        } else {
            fseek(f, (size + 1) & ~1u, SEEK_CUR);
        }
    }
    // truncated/garbage fmt chunks must fail cleanly, not SIGFPE below
    if (data_pos < 0 || !channels || !sr || bits < 8 || bits > 64 ||
        (bits % 8) != 0) { fclose(f); return 3; }
    if (fmt == 0xFFFE) {
        // WAVE_FORMAT_EXTENSIBLE: the real format code is the first two
        // bytes of the SubFormat GUID at offset 24 of the fmt chunk
        fmt = sub_fmt ? sub_fmt : 1;
    }
    int bytes_per = bits / 8;
    size_t frames = data_size / (size_t)(bytes_per * channels);
    std::vector<uint8_t> raw(data_size);
    fseek(f, data_pos, SEEK_SET);
    if (fread(raw.data(), 1, data_size, f) != data_size) { fclose(f); return 4; }
    fclose(f);

    float* y = (float*)malloc(frames * sizeof(float));
    if (!y) return 5;
    for (size_t i = 0; i < frames; i++) {
        double acc = 0.0;
        for (int c = 0; c < channels; c++) {
            const uint8_t* p = raw.data() + (i * channels + c) * bytes_per;
            double v = 0.0;
            if (fmt == 3 && bits == 32) {           // IEEE float
                float fv; memcpy(&fv, p, 4); v = fv;
            } else if (bits == 16) {
                int16_t s; memcpy(&s, p, 2); v = s / 32768.0;
            } else if (bits == 24) {
                int32_t s = (p[0] << 8) | (p[1] << 16) | ((int32_t)(int8_t)p[2] << 24);
                v = (s >> 8) / 8388608.0;
            } else if (bits == 32) {
                int32_t s; memcpy(&s, p, 4); v = s / 2147483648.0;
            } else if (bits == 8) {
                v = ((int)p[0] - 128) / 128.0;
            }
            acc += v;
        }
        y[i] = (float)std::max(-1.0, std::min(1.0, acc / channels));
    }
    *out = y;
    *n_samples = (int)frames;
    *sample_rate = (int)sr;
    return 0;
}

// ------------------------------------------------------------- resampling
// Windowed-sinc polyphase resampler (Kaiser-lite: Blackman window, 32 taps
// per phase). Good to > 80 dB stopband for speech use.
int xva_resample(const float* in, int n, int sr_in, int sr_out,
                 float** out, int* n_out) {
    if (sr_in == sr_out) {
        float* y = (float*)malloc(n * sizeof(float));
        memcpy(y, in, n * sizeof(float));
        *out = y; *n_out = n;
        return 0;
    }
    const int TAPS = 32;
    double ratio = (double)sr_out / sr_in;
    int m = (int)((int64_t)n * sr_out / sr_in);
    float* y = (float*)malloc(m * sizeof(float));
    if (!y) return 1;
    double fc = 0.5 * std::min(1.0, ratio);  // normalized cutoff (in units of sr_in)
    for (int j = 0; j < m; j++) {
        double t = j / ratio;  // position in input samples
        int t0 = (int)std::floor(t) - TAPS / 2 + 1;
        double acc = 0.0, wsum = 0.0;
        for (int k = 0; k < TAPS; k++) {
            int idx = t0 + k;
            double dt = t - idx;
            double sinc = (dt == 0.0) ? 2 * fc
                : std::sin(2 * M_PI * fc * dt) / (M_PI * dt);
            double wpos = (double)k / (TAPS - 1);
            double win = 0.42 - 0.5 * std::cos(2 * M_PI * wpos)
                       + 0.08 * std::cos(4 * M_PI * wpos);
            double w = sinc * win;
            double x = (idx >= 0 && idx < n) ? in[idx] : 0.0;
            acc += w * x;
            wsum += w;
        }
        y[j] = (float)(wsum != 0.0 ? acc / wsum * std::min(1.0, ratio) / fc * 0.5 : 0.0);
    }
    *out = y; *n_out = m;
    return 0;
}

// --------------------------------------------------------------- YIN pitch
// f0 per frame (Hz), 0 where unvoiced; frames centered at i*hop with
// reflect padding, matching data/pitch.py semantics.
int xva_yin(const float* y_in, int n, int sr, int frame_length, int hop,
            float fmin, float fmax, float threshold,
            float* f0_out, int max_frames) {
    int pad = frame_length / 2;
    std::vector<double> y(n + 2 * pad);
    for (int i = 0; i < pad; i++) y[i] = y_in[std::min(pad - i, n - 1)];
    for (int i = 0; i < n; i++) y[pad + i] = y_in[i];
    for (int i = 0; i < pad; i++)
        y[pad + n + i] = y_in[std::max(0, n - 2 - i)];

    int n_frames = 1 + ((int)y.size() - frame_length) / hop;
    if (n_frames > max_frames) n_frames = max_frames;
    int tau_min = std::max(2, (int)(sr / fmax));
    int tau_max = std::min(frame_length - 1, (int)(sr / fmin));

    std::vector<double> d(tau_max + 1), cmndf(tau_max + 1);
    for (int fi = 0; fi < n_frames; fi++) {
        const double* fr = y.data() + fi * hop;
        // difference function (O(W * tau_max) direct; W=1024, tau<=340)
        double energy = 0.0;
        for (int i = 0; i < frame_length; i++) energy += fr[i] * fr[i];
        if (energy / frame_length < 1e-6) { f0_out[fi] = 0.0f; continue; }
        for (int tau = 0; tau <= tau_max; tau++) {
            double s = 0.0;
            int lim = frame_length - tau;
            for (int i = 0; i < lim; i++) {
                double diff = fr[i] - fr[i + tau];
                s += diff * diff;
            }
            d[tau] = s;
        }
        double cum = 0.0;
        cmndf[0] = 1.0;
        for (int tau = 1; tau <= tau_max; tau++) {
            cum += d[tau];
            cmndf[tau] = cum > 1e-12 ? d[tau] * tau / cum : 1.0;
        }
        // first local minimum below threshold
        int best = -1;
        for (int tau = tau_min; tau <= tau_max; tau++) {
            double nxt = (tau + 1 <= tau_max) ? cmndf[tau + 1] : 1e9;
            if (cmndf[tau] < threshold && cmndf[tau] <= nxt) { best = tau; break; }
        }
        if (best < 0) {
            best = tau_min;
            for (int tau = tau_min + 1; tau <= tau_max; tau++)
                if (cmndf[tau] < cmndf[best]) best = tau;
        }
        // parabolic interpolation
        double tau_f = best;
        if (best > 0 && best < tau_max) {
            double d0 = cmndf[best - 1], d1 = cmndf[best], d2 = cmndf[best + 1];
            double denom = 2.0 * (2.0 * d1 - d0 - d2);
            if (std::fabs(denom) > 1e-12) {
                double shift = (d2 - d0) / denom;
                if (shift > -0.5 && shift < 0.5) tau_f = best + shift;
            }
        }
        double f0 = sr / tau_f;
        bool voiced = cmndf[best] < threshold && f0 >= fmin && f0 <= fmax;
        f0_out[fi] = voiced ? (float)f0 : 0.0f;
    }
    return n_frames;
}

// ----------------------------------------------------------- silence scan
// Writes up to max_regions (start, end) sample pairs; returns count.
int xva_find_silences(const float* y, int n, int sr, float threshold_db,
                      float min_s, int frame, int* regions, int max_regions) {
    // audio shorter than one frame has no full frames — max(1, ...) here
    // would read past the end of y in the RMS loop below
    int n_frames = n / frame;
    int count = 0, start = -1;
    int min_frames = (int)(min_s * sr / frame);
    for (int i = 0; i <= n_frames; i++) {
        bool silent = false;
        if (i < n_frames) {
            double acc = 0.0;
            for (int j = 0; j < frame; j++) acc += (double)y[i * frame + j] * y[i * frame + j];
            double db = 10.0 * std::log10(acc / frame + 1e-12);
            silent = db < threshold_db;
        }
        if (silent && start < 0) start = i;
        else if (!silent && start >= 0) {
            if (i - start >= min_frames && count < max_regions) {
                regions[count * 2] = start * frame;
                regions[count * 2 + 1] = i * frame;
                count++;
            }
            start = -1;
        }
    }
    return count;
}

// -------------------------------------------- BS.1770-4 gated loudness
// K-weighting (shelf + RLB high-pass biquads re-derived per sample rate,
// ITU-R BS.1770-4 Annex 1), 400 ms blocks at 75% overlap, -70 LUFS absolute
// and -10 LU relative gates. Mono input. Returns integrated LUFS.
static void biquad_coeffs_shelf(double fs, double* b, double* a) {
    const double db = 3.999843853973347;
    const double f0 = 1681.974450955533;
    const double Q = 0.7071752369554196;
    double K = std::tan(M_PI * f0 / fs);
    double Vh = std::pow(10.0, db / 20.0);
    double Vb = std::pow(Vh, 0.4996667741545416);
    double a0 = 1.0 + K / Q + K * K;
    b[0] = (Vh + Vb * K / Q + K * K) / a0;
    b[1] = 2.0 * (K * K - Vh) / a0;
    b[2] = (Vh - Vb * K / Q + K * K) / a0;
    a[0] = 1.0;
    a[1] = 2.0 * (K * K - 1.0) / a0;
    a[2] = (1.0 - K / Q + K * K) / a0;
}

static void biquad_coeffs_hp(double fs, double* b, double* a) {
    const double f0 = 38.13547087602444;
    const double Q = 0.5003270373238773;
    double K = std::tan(M_PI * f0 / fs);
    double denom = 1.0 + K / Q + K * K;
    // BS.1770-4: b = [1, -2, 1] unnormalized (only a divides by a0)
    b[0] = 1.0;
    b[1] = -2.0;
    b[2] = 1.0;
    a[0] = 1.0;
    a[1] = 2.0 * (K * K - 1.0) / denom;
    a[2] = (1.0 - K / Q + K * K) / denom;
}

static inline void biquad_run(const double* b, const double* a,
                              const float* x, double* y, int n) {
    double x1 = 0, x2 = 0, y1 = 0, y2 = 0;
    for (int i = 0; i < n; i++) {
        double xi = (double)x[i];
        double yi = b[0] * xi + b[1] * x1 + b[2] * x2 - a[1] * y1 - a[2] * y2;
        x2 = x1; x1 = xi; y2 = y1; y1 = yi;
        y[i] = yi;
    }
}

static inline void biquad_run_d(const double* b, const double* a,
                                const double* x, double* y, int n) {
    double x1 = 0, x2 = 0, y1 = 0, y2 = 0;
    for (int i = 0; i < n; i++) {
        double xi = x[i];
        double yi = b[0] * xi + b[1] * x1 + b[2] * x2 - a[1] * y1 - a[2] * y2;
        x2 = x1; x1 = xi; y2 = y1; y1 = yi;
        y[i] = yi;
    }
}

float xva_integrated_loudness(const float* y, int n, int fs) {
    if (n <= 0) return -70.0f;
    double bs[3], as_[3], bh[3], ah[3];
    biquad_coeffs_shelf((double)fs, bs, as_);
    biquad_coeffs_hp((double)fs, bh, ah);

    int block = (int)(0.4 * fs);
    int hop = (int)(0.1 * fs);
    int n_padded = n < block ? block : n;
    double* z1 = (double*)calloc(n_padded, sizeof(double));
    double* z = (double*)calloc(n_padded, sizeof(double));
    biquad_run(bs, as_, y, z1, n);  // zeros beyond n stay zero inputs
    // pad region: continue filtering zeros to mirror numpy zero-pad-then-
    // filter ordering closely enough (blocks there fall below the gate)
    biquad_run_d(bh, ah, z1, z, n_padded);

    int n_blocks = 1 + (n_padded - block) / hop;
    double* ms = (double*)malloc(sizeof(double) * n_blocks);
    // sliding mean square via prefix sums
    double* prefix = (double*)malloc(sizeof(double) * (n_padded + 1));
    prefix[0] = 0.0;
    for (int i = 0; i < n_padded; i++) prefix[i + 1] = prefix[i] + z[i] * z[i];
    for (int bI = 0; bI < n_blocks; bI++) {
        int s = bI * hop;
        ms[bI] = (prefix[s + block] - prefix[s]) / block;
    }
    // absolute gate
    double acc = 0.0; int cnt = 0;
    for (int i = 0; i < n_blocks; i++) {
        double lk = -0.691 + 10.0 * std::log10(ms[i] > 1e-12 ? ms[i] : 1e-12);
        if (lk > -70.0) { acc += ms[i]; cnt++; }
    }
    float result = -70.0f;
    if (cnt > 0) {
        double rel_thresh = -0.691 + 10.0 * std::log10(acc / cnt) - 10.0;
        double acc2 = 0.0; int cnt2 = 0;
        for (int i = 0; i < n_blocks; i++) {
            double lk = -0.691 + 10.0 * std::log10(ms[i] > 1e-12 ? ms[i] : 1e-12);
            if (lk > -70.0 && lk > rel_thresh) { acc2 += ms[i]; cnt2++; }
        }
        if (cnt2 > 0)
            result = (float)(-0.691 + 10.0 * std::log10(acc2 / cnt2));
    }
    free(z1); free(z); free(ms); free(prefix);
    return result;
}

}  // extern "C"
