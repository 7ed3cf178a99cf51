// seedvc_tpu native host-side streaming DSP.
//
// The reference's realtime path does SOLA alignment and ring-buffer
// management with torch ops inside the sounddevice callback
// (real-time-gui.py:1043-1125).  On TPU those are host-side operations
// between device calls, on the hard realtime budget — implemented here in
// C++ (built as a plain shared library, bound via ctypes; no pybind11).
//
// Functions:
//   sola_offset    — normalized cross-correlation alignment (DDSP-SVC SOLA):
//                    argmax_k  sum(chunk[k:k+n]*buf) / sqrt(sum(chunk[k:k+n]^2))
//   crossfade_add  — in-place equal-power fade of the aligned chunk head
//                    against the previous tail.
//   ring_shift_append — shift a ring buffer left and append a new block.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstring>

extern "C" {

// Returns the offset k in [0, search_len] maximizing the normalized
// correlation of chunk[k : k+buf_len] with sola_buf[0 : buf_len].
int sola_offset(const float* chunk, int chunk_len, const float* sola_buf,
                int buf_len, int search_len) {
    if (buf_len <= 0 || chunk_len < buf_len) return 0;
    int max_k = search_len;
    if (max_k > chunk_len - buf_len) max_k = chunk_len - buf_len;

    // prefix squares for O(1) window energy
    double best = -1e30;
    int best_k = 0;
    // running energy of the first window
    double energy = 0.0;
    for (int i = 0; i < buf_len; ++i) {
        energy += (double)chunk[i] * chunk[i];
    }
    for (int k = 0; k <= max_k; ++k) {
        double dot = 0.0;
        const float* c = chunk + k;
        for (int i = 0; i < buf_len; ++i) {
            dot += (double)c[i] * sola_buf[i];
        }
        double score = dot / std::sqrt(energy + 1e-8);
        if (score > best) {
            best = score;
            best_k = k;
        }
        if (k < max_k) {
            energy += (double)chunk[k + buf_len] * chunk[k + buf_len]
                    - (double)chunk[k] * chunk[k];
        }
    }
    return best_k;
}

// chunk[0:n] = chunk[0:n]*fade_in + prev_tail[0:n]*fade_out  (in place)
void crossfade_add(float* chunk, const float* prev_tail, const float* fade_in,
                   const float* fade_out, int n) {
    for (int i = 0; i < n; ++i) {
        chunk[i] = chunk[i] * fade_in[i] + prev_tail[i] * fade_out[i];
    }
}

// ring[0:ring_len-block_len] = ring[block_len:]; ring[-block_len:] = block
void ring_shift_append(float* ring, int ring_len, const float* block,
                       int block_len) {
    if (block_len >= ring_len) {
        std::memcpy(ring, block + (block_len - ring_len),
                    sizeof(float) * ring_len);
        return;
    }
    std::memmove(ring, ring + block_len, sizeof(float) * (ring_len - block_len));
    std::memcpy(ring + (ring_len - block_len), block,
                sizeof(float) * block_len);
}

}  // extern "C"
