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

// ---------------------------------------------------------------- flac decode
// Native FLAC decoder (the reference leans on a bundled ffmpeg for non-wav
// input — python/audio_format/model.py:5-20; this removes that binary gate
// for FLAC, the only losslessly-specified container in common dataset use).
// Supports: CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes, rice and
// rice2 residual coding with escape partitions, wasted bits, and all four
// stereo decorrelation modes. Output is mono float32 (channel mean).

namespace flacdec {

struct BitReader {
    const uint8_t* p;
    size_t n, pos_byte = 0;
    int pos_bit = 0;  // 0..7, MSB-first
    bool fail = false;
    BitReader(const uint8_t* data, size_t len) : p(data), n(len) {}
    uint32_t bit() {
        if (pos_byte >= n) { fail = true; return 0; }
        uint32_t b = (p[pos_byte] >> (7 - pos_bit)) & 1u;
        if (++pos_bit == 8) { pos_bit = 0; pos_byte++; }
        return b;
    }
    uint64_t bits(int k) {  // k <= 64
        uint64_t v = 0;
        for (int i = 0; i < k; i++) v = (v << 1) | bit();
        return v;
    }
    int64_t sbits(int k) {  // signed two's complement
        uint64_t v = bits(k);
        if (k > 0 && (v >> (k - 1)) & 1u) v |= ~((k == 64) ? 0ull : ((1ull << k) - 1));
        return (int64_t)v;
    }
    uint32_t unary() {
        uint32_t q = 0;
        while (!fail && bit() == 0) q++;
        return q;
    }
    void align() { if (pos_bit) { pos_bit = 0; pos_byte++; } }
};

static int64_t rice_read(BitReader& br, int param) {
    uint32_t q = br.unary();
    uint64_t r = br.bits(param);
    uint64_t v = ((uint64_t)q << param) | r;
    return (v >> 1) ^ -(int64_t)(v & 1);  // zigzag
}

// residual for one subframe (order warmup samples already in out[0..order))
static bool read_residual(BitReader& br, int block_size, int order,
                          int64_t* out) {
    int method = (int)br.bits(2);
    if (method > 1) return false;
    int pbits = method == 0 ? 4 : 5;
    int escape = method == 0 ? 15 : 31;
    int porder = (int)br.bits(4);
    int parts = 1 << porder;
    if (block_size % parts) return false;
    int idx = order;
    for (int pi = 0; pi < parts; pi++) {
        int count = block_size >> porder;
        if (pi == 0) count -= order;
        int param = (int)br.bits(pbits);
        if (param == escape) {
            int raw = (int)br.bits(5);
            for (int i = 0; i < count; i++) out[idx++] = br.sbits(raw);
        } else {
            for (int i = 0; i < count; i++) out[idx++] = rice_read(br, param);
        }
        if (br.fail) return false;
    }
    return idx == block_size;
}

static const int FIXED_ORDERS[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

static bool decode_subframe(BitReader& br, int block_size, int bps,
                            std::vector<int64_t>& out) {
    out.assign(block_size, 0);
    if (br.bit() != 0) return false;  // padding bit
    int type = (int)br.bits(6);
    int wasted = 0;
    if (br.bit()) wasted = 1 + (int)br.unary();
    int eff_bps = bps - wasted;
    if (eff_bps <= 0 || eff_bps > 33) return false;
    if (type == 0) {  // CONSTANT
        int64_t v = br.sbits(eff_bps);
        for (int i = 0; i < block_size; i++) out[i] = v;
    } else if (type == 1) {  // VERBATIM
        for (int i = 0; i < block_size; i++) out[i] = br.sbits(eff_bps);
    } else if (type >= 8 && type <= 12) {  // FIXED order 0-4
        int order = type - 8;
        if (order > block_size) return false;
        for (int i = 0; i < order; i++) out[i] = br.sbits(eff_bps);
        if (!read_residual(br, block_size, order, out.data())) return false;
        for (int i = order; i < block_size; i++) {
            int64_t pred = 0;
            for (int j = 0; j < order; j++)
                pred += (int64_t)FIXED_ORDERS[order][j] * out[i - 1 - j];
            out[i] += pred;
        }
    } else if (type >= 32) {  // LPC, order = type - 31
        int order = type - 31;
        if (order > block_size) return false;
        for (int i = 0; i < order; i++) out[i] = br.sbits(eff_bps);
        int precision = (int)br.bits(4) + 1;
        if (precision == 16) return false;  // 1111 is invalid
        int shift = (int)br.sbits(5);
        if (shift < 0) shift = 0;
        std::vector<int64_t> coef(order);
        for (int i = 0; i < order; i++) coef[i] = br.sbits(precision);
        if (!read_residual(br, block_size, order, out.data())) return false;
        for (int i = order; i < block_size; i++) {
            int64_t pred = 0;
            for (int j = 0; j < order; j++) pred += coef[j] * out[i - 1 - j];
            out[i] += pred >> shift;
        }
    } else {
        return false;  // reserved type
    }
    if (wasted)
        for (int i = 0; i < block_size; i++) out[i] <<= wasted;
    return !br.fail;
}

static int64_t read_utf8(BitReader& br) {
    uint32_t b0 = (uint32_t)br.bits(8);
    int extra = 0;
    uint64_t v;
    if ((b0 & 0x80) == 0) return b0;
    else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
    else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
    else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
    else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
    else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
    else if (b0 == 0xFE) { v = 0; extra = 6; }
    else return -1;
    for (int i = 0; i < extra; i++) {
        uint32_t b = (uint32_t)br.bits(8);
        if ((b & 0xC0) != 0x80) return -1;
        v = (v << 6) | (b & 0x3F);
    }
    return (int64_t)v;
}

static const int BLOCK_SIZES[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                                    256, 512, 1024, 2048, 4096, 8192, 16384,
                                    32768};
static const int SAMPLE_RATES[16] = {0, 88200, 176400, 192000, 8000, 16000,
                                     22050, 24000, 32000, 44100, 48000, 96000,
                                     -1, -2, -3, 0};

}  // namespace flacdec

static int xva_decode_flac_impl(const char* path, float** out, int* n_samples,
                                int* sample_rate) {
    using namespace flacdec;
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    fseek(f, 0, SEEK_END);
    long fsize = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (fsize < 42) { fclose(f); return 2; }
    std::vector<uint8_t> buf((size_t)fsize);
    if (fread(buf.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
        fclose(f);
        return 2;
    }
    fclose(f);
    if (memcmp(buf.data(), "fLaC", 4) != 0) return 3;

    // metadata blocks; STREAMINFO is mandatory first
    size_t pos = 4;
    int sr = 0, channels = 0, bps = 0;
    uint64_t total = 0;
    bool last = false, first = true;
    while (!last) {
        if (pos + 4 > buf.size()) return 4;
        last = (buf[pos] & 0x80) != 0;
        int btype = buf[pos] & 0x7F;
        uint32_t blen = ((uint32_t)buf[pos + 1] << 16) |
                        ((uint32_t)buf[pos + 2] << 8) | buf[pos + 3];
        pos += 4;
        if (pos + blen > buf.size()) return 4;
        if (first) {
            if (btype != 0 || blen < 34) return 4;  // STREAMINFO
            const uint8_t* s = &buf[pos];
            sr = ((int)s[10] << 12) | ((int)s[11] << 4) | (s[12] >> 4);
            channels = ((s[12] >> 1) & 0x7) + 1;
            bps = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
            total = ((uint64_t)(s[13] & 0x0F) << 32) | ((uint64_t)s[14] << 24) |
                    ((uint64_t)s[15] << 16) | ((uint64_t)s[16] << 8) | s[17];
            first = false;
        }
        pos += blen;
    }
    if (sr <= 0 || channels < 1 || channels > 8 || bps < 4 || bps > 32)
        return 4;

    std::vector<float> mono;
    // clamp the (untrusted, 36-bit) STREAMINFO total before reserving:
    // a corrupt field must not request hundreds of GB. Bound by what the
    // file could possibly hold (mono samples can't exceed total bits).
    uint64_t cap = (uint64_t)fsize * 8ull;
    if (total && total <= cap) mono.reserve((size_t)total);
    std::vector<std::vector<int64_t>> ch(channels);
    const double scale = 1.0 / (double)(1ll << (bps - 1));

    while (pos < buf.size()) {
        BitReader br(buf.data() + pos, buf.size() - pos);
        if (br.bits(14) != 0x3FFE) break;  // sync (or trailing garbage)
        br.bit();                          // reserved
        br.bit();                          // blocking strategy
        int bs_code = (int)br.bits(4);
        int sr_code = (int)br.bits(4);
        int ch_code = (int)br.bits(4);
        int ss_code = (int)br.bits(3);
        br.bit();  // reserved
        if (read_utf8(br) < 0) return 5;
        int block_size = BLOCK_SIZES[bs_code];
        if (block_size == -1) block_size = (int)br.bits(8) + 1;
        else if (block_size == -2) block_size = (int)br.bits(16) + 1;
        else if (block_size == 0) return 5;
        if (SAMPLE_RATES[sr_code] == -1) br.bits(8);
        else if (SAMPLE_RATES[sr_code] == -2) br.bits(16);
        else if (SAMPLE_RATES[sr_code] == -3) br.bits(16);
        br.bits(8);  // header CRC-8 (decode is not verification-grade)
        int fbps = bps;
        static const int SS[8] = {0, 8, 12, -1, 16, 20, 24, 32};
        if (ss_code != 0 && SS[ss_code] > 0) fbps = SS[ss_code];

        int nch = channels;
        int mode = 0;  // 0 independent, 1 L/S, 2 R/S, 3 M/S
        if (ch_code >= 8 && ch_code <= 10) { nch = 2; mode = ch_code - 7; }
        else if (ch_code < 8) nch = ch_code + 1;
        else return 5;
        if (nch != channels) return 5;

        for (int c = 0; c < nch; c++) {
            int sub_bps = fbps;
            // side channel carries one extra bit
            if ((mode == 1 && c == 1) || (mode == 2 && c == 0) ||
                (mode == 3 && c == 1))
                sub_bps += 1;
            if (!decode_subframe(br, block_size, sub_bps, ch[c])) return 6;
        }
        br.align();
        br.bits(16);  // frame CRC-16
        if (br.fail) return 6;

        // stereo decorrelation
        if (mode == 1) {  // left/side: right = left - side
            for (int i = 0; i < block_size; i++) ch[1][i] = ch[0][i] - ch[1][i];
        } else if (mode == 2) {  // right/side: left = right + side
            for (int i = 0; i < block_size; i++) ch[0][i] = ch[1][i] + ch[0][i];
        } else if (mode == 3) {  // mid/side
            for (int i = 0; i < block_size; i++) {
                int64_t mid = ch[0][i], side = ch[1][i];
                mid = (mid << 1) | (side & 1);
                ch[0][i] = (mid + side) >> 1;
                ch[1][i] = (mid - side) >> 1;
            }
        }
        for (int i = 0; i < block_size; i++) {
            double acc = 0;
            for (int c = 0; c < channels; c++) acc += (double)ch[c][i];
            mono.push_back((float)(acc * scale / channels));
        }
        pos += br.pos_byte + (br.pos_bit ? 1 : 0);
    }
    if (mono.empty()) return 6;
    // A failed mid-file frame-sync exits the loop silently; when STREAMINFO
    // declares the stream length, a shortfall means corruption — report it
    // so the caller engages its ffmpeg fallback instead of consuming a
    // truncated decode.
    if (total && mono.size() < total) return 6;
    if (total && mono.size() > total) mono.resize((size_t)total);
    float* res = (float*)malloc(sizeof(float) * mono.size());
    if (!res) return 7;
    memcpy(res, mono.data(), sizeof(float) * mono.size());
    *out = res;
    *n_samples = (int)mono.size();
    *sample_rate = sr;
    return 0;
}

int xva_decode_flac(const char* path, float** out, int* n_samples,
                    int* sample_rate) {
    // exceptions (bad_alloc from corrupt sizes, etc.) must not cross the
    // extern "C" boundary — they would std::terminate the whole Python
    // process instead of letting the caller fall back to ffmpeg
    try {
        return xva_decode_flac_impl(path, out, n_samples, sample_rate);
    } catch (...) {
        return 8;
    }
}

}  // extern "C"
