// Wave scheduling for order-exact vectorized TrueSkill rating.
//
// The EP rating pass is sequential per game, but games that share no
// strategy commute: partitioning the game sequence into "waves" where each
// strategy appears at most once per wave, with every game placed in the
// earliest wave after all earlier games it shares a strategy with, yields a
// schedule whose wave-by-wave batched update is exactly the sequential
// result (farkle_ii_tpu/analysis/run_trueskill.py rate_games). This scan is
// the only inherently-sequential part, so it lives here; the Python side
// holds a fallback for toolchain-less systems.
//
// codes: (n_games, k) row-major dense strategy codes in [0, n_codes).
// out:   (n_games,) wave index per game (0-based, non-decreasing max).
//
// Build: g++ -O2 -shared -fPIC -o libfarkle_waves.so wave_schedule.cpp

#include <cstddef>
#include <cstdint>
#include <vector>

extern "C" {

void farkle_wave_schedule(const int32_t* codes, int64_t n_games, int32_t k,
                          int32_t n_codes, int32_t* out) {
    std::vector<int32_t> last(static_cast<size_t>(n_codes), -1);
    for (int64_t g = 0; g < n_games; ++g) {
        const int32_t* row = codes + g * k;
        int32_t w = 0;
        for (int32_t j = 0; j < k; ++j) {
            const int32_t cand = last[row[j]] + 1;
            if (cand > w) w = cand;
        }
        out[g] = w;
        for (int32_t j = 0; j < k; ++j) last[row[j]] = w;
    }
}

}  // extern "C"
