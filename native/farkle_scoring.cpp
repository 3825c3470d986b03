// Native host-side Farkle scoring oracle and dense-table builder.
//
// The TPU framework's on-device scorer (farkle_ii_tpu/ops/scoring.py) and the
// pure-Python oracle (farkle_ii_tpu/rules/oracle.py) are validated against
// this independent C++ implementation of the same rules, and the packed
// 7^6-entry table built here must match rules/tables.py byte for byte. It
// also provides a fast batch scorer for host-side tooling and test harnesses
// (millions of rolls per second without NumPy overhead).
//
// Rule source: standard Farkle scoring as specified in rules/oracle.py —
// six-dice specials (straight / three pairs / two triplets / four-of-a-kind
// plus pair), n-of-a-kind sets, lone 1s (100) and 5s (50).
//
// Build: g++ -O2 -shared -fPIC -o libfarkle_scoring.so farkle_scoring.cpp

#include <cstdint>
#include <cstring>

namespace {

struct ScoreResult {
    int32_t score;
    int32_t used;
    int32_t single_fives;
    int32_t single_ones;
};

ScoreResult score_counts(const int32_t c[6]) {
    int n = 0;
    for (int f = 0; f < 6; ++f) n += c[f];

    // six-dice specials (priority order)
    if (n == 6) {
        bool straight = true;
        int pairs = 0, triplets = 0;
        bool has_four = false;
        for (int f = 0; f < 6; ++f) {
            if (c[f] != 1) straight = false;
            if (c[f] == 2) ++pairs;
            if (c[f] == 3) ++triplets;
            if (c[f] == 4) has_four = true;
        }
        if (straight) return {1500, 6, 0, 0};
        if (pairs == 3) return {1500, 6, 0, 0};
        if (triplets == 2) return {2500, 6, 0, 0};
        if (has_four && pairs == 1) return {1500, 6, 0, 0};
    }

    int32_t score = 0, used = 0;
    int32_t rem[6];
    std::memcpy(rem, c, sizeof(rem));
    for (int f = 0; f < 6; ++f) {
        int k = rem[f];
        if (k >= 3) {
            int pts;
            if (k == 3) pts = (f == 0) ? 300 : (f + 1) * 100;
            else if (k == 4) pts = 1000;
            else if (k == 5) pts = 2000;
            else pts = 3000;
            score += pts;
            used += k;
            rem[f] = 0;
        }
    }
    int32_t lone_ones = rem[0];
    int32_t lone_fives = rem[4];
    score += lone_ones * 100 + lone_fives * 50;
    used += lone_ones + lone_fives;
    return {score, used, lone_fives, lone_ones};
}

constexpr int32_t kScoreShift = 0;
constexpr int32_t kUsedShift = 12;
constexpr int32_t kSfShift = 15;
constexpr int32_t kSoShift = 18;

int32_t pack(const ScoreResult& r) {
    return (r.score << kScoreShift) | (r.used << kUsedShift) |
           (r.single_fives << kSfShift) | (r.single_ones << kSoShift);
}

}  // namespace

extern "C" {

// out4: {score, used, single_fives, single_ones}
void farkle_score_counts(const int32_t* counts6, int32_t* out4) {
    ScoreResult r = score_counts(counts6);
    out4[0] = r.score;
    out4[1] = r.used;
    out4[2] = r.single_fives;
    out4[3] = r.single_ones;
}

// Dense packed table over the 7^6 mixed-radix count index
// (idx = sum c[i] * 7^i). Entries for count vectors with more than six dice
// or the empty roll are zero, matching rules/tables.py.
void farkle_build_score_table(int32_t* out /* size 117649 */) {
    for (int c6 = 0; c6 <= 6; ++c6)
    for (int c5 = 0; c5 <= 6; ++c5)
    for (int c4 = 0; c4 <= 6; ++c4)
    for (int c3 = 0; c3 <= 6; ++c3)
    for (int c2 = 0; c2 <= 6; ++c2)
    for (int c1 = 0; c1 <= 6; ++c1) {
        int idx = c1 + 7 * (c2 + 7 * (c3 + 7 * (c4 + 7 * (c5 + 7 * c6))));
        int total = c1 + c2 + c3 + c4 + c5 + c6;
        if (total < 1 || total > 6) {
            out[idx] = 0;
            continue;
        }
        int32_t counts[6] = {c1, c2, c3, c4, c5, c6};
        out[idx] = pack(score_counts(counts));
    }
}

// Batch scorer: faces is n_rolls x 6 (0 = empty lane, 1..6 = die face);
// out is n_rolls x 4 {score, used, single_fives, single_ones}.
void farkle_score_rolls(const int8_t* faces, int64_t n_rolls, int32_t* out) {
    for (int64_t i = 0; i < n_rolls; ++i) {
        int32_t counts[6] = {0, 0, 0, 0, 0, 0};
        for (int j = 0; j < 6; ++j) {
            int8_t face = faces[i * 6 + j];
            if (face >= 1 && face <= 6) ++counts[face - 1];
        }
        ScoreResult r = score_counts(counts);
        out[i * 4 + 0] = r.score;
        out[i * 4 + 1] = r.used;
        out[i * 4 + 2] = r.single_fives;
        out[i * 4 + 3] = r.single_ones;
    }
}

}  // extern "C"
