// Native host-side Farkle *game engine* twin.
//
// A third, fully independent implementation of the complete game loop —
// no Python, no JAX — drawing dice from the same Threefry-2x32 coordinate
// streams as the TPU kernel (farkle_ii_tpu/ops/threefry.py), so its results
// must be bit-identical to both the device kernel and the Python host
// engine (rules/engine_host.py). Used as a triangulating oracle in tests
// and as a fast host-side simulator (~10^5 games/s single-threaded).
//
// Rule semantics: rules/engine_host.py (re-derived; reference parity
// /root/reference/src/farkle/game/engine.py:208,436). Includes the
// documented ROLL_LIMIT force-bank deviation.
//
// Build: g++ -O2 -shared -fPIC -o libfarkle_engine.so farkle_engine.cpp

#include <cstdint>
#include <cstring>

namespace {

constexpr int32_t ROLL_LIMIT = 1000;

// strategy flag bits — must match farkle_ii_tpu.simulation.strategies
constexpr int32_t FLAG_SMART_FIVE = 1 << 0;
constexpr int32_t FLAG_SMART_ONE = 1 << 1;
constexpr int32_t FLAG_CONSIDER_SCORE = 1 << 2;
constexpr int32_t FLAG_CONSIDER_DICE = 1 << 3;
constexpr int32_t FLAG_REQUIRE_BOTH = 1 << 4;
constexpr int32_t FLAG_AUTO_HOT_DICE = 1 << 5;
constexpr int32_t FLAG_RUN_UP_SCORE = 1 << 6;
constexpr int32_t FLAG_FAVOR_SCORE = 1 << 7;

// ── Threefry-2x32, 20 rounds (Salmon et al., SC'11) ─────────────────────────

constexpr uint32_t PARITY = 0x1BD11BDAu;
constexpr int ROT_A[4] = {13, 15, 26, 6};
constexpr int ROT_B[4] = {17, 29, 16, 24};

inline uint32_t rotl(uint32_t x, int d) { return (x << d) | (x >> (32 - d)); }

inline void threefry2x32(uint32_t k0, uint32_t k1, uint32_t x0, uint32_t x1,
                         uint32_t* o0, uint32_t* o1) {
    uint32_t ks[3] = {k0, k1, k0 ^ k1 ^ PARITY};
    x0 += ks[0];
    x1 += ks[1];
    for (int group = 0; group < 5; ++group) {
        const int* rots = (group % 2 == 0) ? ROT_A : ROT_B;
        for (int r = 0; r < 4; ++r) {
            x0 += x1;
            x1 = rotl(x1, rots[r]);
            x1 ^= x0;
        }
        x0 += ks[(group + 1) % 3];
        x1 += ks[(group + 2) % 3] + static_cast<uint32_t>(group + 1);
    }
    *o0 = x0;
    *o1 = x1;
}

// dice stream v2: ONE hash per (seat, roll) — counter words (roll, seat);
// each 32-bit word yields three dice by mixed-radix base-6 extraction
// (ops/threefry.roll_faces_1h)
inline void roll_faces(uint32_t k0, uint32_t k1, uint32_t roll_index,
                       uint32_t seat, int dice_left, int32_t faces[6]) {
    uint32_t w0, w1;
    threefry2x32(k0, k1, roll_index, seat, &w0, &w1);
    uint32_t words[2] = {w0, w1};
    int i = 0;
    for (uint32_t w : words) {
        uint32_t u = w;
        for (int j = 0; j < 3; ++j, ++i) {
            faces[i] = (i < dice_left) ? static_cast<int32_t>(u % 6u) + 1 : 0;
            u /= 6u;
        }
    }
}

// ── scoring (same algebra as farkle_scoring.cpp) ────────────────────────────

struct ScoreResult {
    int32_t score, used, single_fives, single_ones;
};

ScoreResult score_counts(const int32_t c[6]) {
    int n = 0;
    for (int f = 0; f < 6; ++f) n += c[f];
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
        int m = rem[f];
        if (m >= 3) {
            int pts = (m == 3) ? ((f == 0) ? 300 : (f + 1) * 100)
                               : (m == 4) ? 1000 : (m == 5) ? 2000 : 3000;
            score += pts;
            used += m;
            rem[f] = 0;
        }
    }
    score += rem[0] * 100 + rem[4] * 50;
    used += rem[0] + rem[4];
    return {score, used, rem[4], rem[0]};
}

// ── smart discards: 9-candidate scan (game_kernel._smart_discards) ──────────

inline bool must_bank(int32_t score_after, int32_t dice_left_after,
                      int32_t st, int32_t dt, int32_t flags) {
    bool cs = flags & FLAG_CONSIDER_SCORE, cd = flags & FLAG_CONSIDER_DICE;
    bool hit_score = cs && score_after >= st;
    bool hit_dice = cd && dice_left_after <= dt;
    if (cs && cd && (flags & FLAG_REQUIRE_BOTH)) return hit_score && hit_dice;
    return hit_score || hit_dice;
}

inline void smart_discards(const ScoreResult& r, int roll_n, int32_t turn_pre,
                           int32_t st, int32_t dt, int32_t flags,
                           int32_t* d5_out, int32_t* d1_out) {
    *d5_out = 0;
    *d1_out = 0;
    if (!(flags & FLAG_SMART_FIVE)) return;
    if (r.used == roll_n) return;
    if (r.single_fives == 0 && r.single_ones == 0) return;
    int32_t max_d1 = (flags & FLAG_SMART_ONE) ? r.single_ones : 0;
    bool favor_score = flags & FLAG_FAVOR_SCORE;
    int64_t best_rank = -1;
    for (int d5 = 0; d5 < 3; ++d5)
        for (int d1 = 0; d1 < 3; ++d1) {
            if (d5 > r.single_fives || d1 > max_d1) continue;
            int32_t cand_score = r.score - 50 * d5 - 100 * d1;
            if (cand_score <= 0) continue;
            int32_t cand_used = r.used - d5 - d1;
            int32_t score_after = turn_pre + cand_score;
            int32_t dice_left_after = roll_n - cand_used;
            if (must_bank(score_after, dice_left_after, st, dt, flags)) continue;
            int64_t rank = favor_score
                               ? int64_t(score_after) * 8 + dice_left_after
                               : (int64_t(dice_left_after) << 22) + score_after;
            if (rank > best_rank) {
                best_rank = rank;
                *d5_out = d5;
                *d1_out = d1;
            }
        }
}

// ── turn / game loop (rules/engine_host.py semantics) ───────────────────────

struct Seat {
    int32_t score = 0, n_turns = 0, n_farkles = 0, n_rolls = 0;
    int32_t highest_turn = 0, s5u = 0, s5d = 0, s1u = 0, s1d = 0, hot = 0;
    bool has_scored = false;
};

struct GameCtx {
    uint32_t k0, k1;
    const int32_t* st;
    const int32_t* dt;
    const int32_t* fl;
    int32_t target, max_rounds, roll_limit_hits = 0;
};

inline bool decide(int32_t flags, int32_t st, int32_t dt, int32_t turn_score,
                   int32_t dice_left, bool has_scored, bool final_round,
                   int32_t score_to_beat, int32_t running_total) {
    if (!has_scored && turn_score < 500) return true;
    if (final_round) {
        if (running_total <= score_to_beat) return true;
        if (!(flags & FLAG_RUN_UP_SCORE)) return false;
    }
    bool cs = flags & FLAG_CONSIDER_SCORE, cd = flags & FLAG_CONSIDER_DICE;
    bool want_score = cs && turn_score < st;
    bool want_dice = cd && dice_left > dt;
    if (cs && cd)
        return (flags & FLAG_REQUIRE_BOTH) ? (want_score || want_dice)
                                           : (want_score && want_dice);
    if (cs) return want_score;
    if (cd) return want_dice;
    return false;
}

void take_turn(GameCtx& g, Seat& p, int seat, bool final_round,
               int32_t score_to_beat) {
    int32_t st = g.st[seat], dt = g.dt[seat], flags = g.fl[seat];
    p.n_turns += 1;
    int dice = 6;
    int32_t turn_score = 0;
    int rolls_this_turn = 0;
    while (dice > 0) {
        int32_t faces[6], counts[6] = {0, 0, 0, 0, 0, 0};
        roll_faces(g.k0, g.k1, static_cast<uint32_t>(p.n_rolls),
                   static_cast<uint32_t>(seat), dice, faces);
        p.n_rolls += 1;
        rolls_this_turn += 1;
        for (int i = 0; i < 6; ++i)
            if (faces[i] >= 1) ++counts[faces[i] - 1];
        ScoreResult r = score_counts(counts);
        if (r.score == 0) {
            p.n_farkles += 1;
            turn_score = 0;
            break;
        }
        int32_t d5, d1;
        smart_discards(r, dice, turn_score, st, dt, flags, &d5, &d1);
        int32_t pts = r.score - 50 * d5 - 100 * d1;
        int32_t used = r.used - d5 - d1;
        int32_t reroll = dice - used;
        if (d5 > 0) { p.s5u += 1; p.s5d += d5; }
        if (d1 > 0) { p.s1u += 1; p.s1d += d1; }
        dice = (used == dice && reroll == 0) ? 6 : reroll;
        turn_score += pts;

        if ((flags & FLAG_AUTO_HOT_DICE) && dice == 6) {
            p.hot += 1;
            if (rolls_this_turn >= ROLL_LIMIT) { g.roll_limit_hits += 1; break; }
            continue;
        }
        int32_t running_total = p.score + turn_score;
        if (final_round && running_total > score_to_beat &&
            !(flags & FLAG_RUN_UP_SCORE))
            break;
        bool keep = decide(flags, st, dt, turn_score, dice, p.has_scored,
                           final_round, score_to_beat, running_total);
        if (final_round && running_total <= score_to_beat) keep = true;
        if (!keep) break;
        if (rolls_this_turn >= ROLL_LIMIT) { g.roll_limit_hits += 1; break; }
    }
    if (!p.has_scored && turn_score >= 500) p.has_scored = true;
    if (p.has_scored) {
        p.score += turn_score;
        if (turn_score > p.highest_turn) p.highest_turn = turn_score;
    }
}

constexpr int MAX_K = 16;

}  // namespace

extern "C" {

// Plays n_games independent games. Layouts (row-major):
//   key_data: (n_games, 2) uint32 per-game threefry key words
//   st/dt/fl: (n_games, k) int32 per-seat strategy params
//   out:      (n_games, 6 + 11*k) int32:
//     [completed, winner_seat, winning_score, margin, n_rounds,
//      roll_limit_hits, then per seat: score, rank, n_farkles, n_rolls,
//      n_turns, highest_turn, s5_uses, s5_dice, s1_uses, s1_dice, hot]
//     winner_seat = -1 and rank = 0 for safety-limit games.
void farkle_play_games(int64_t n_games, int32_t k, const uint32_t* key_data,
                       const int32_t* st, const int32_t* dt, const int32_t* fl,
                       int32_t target_score, int32_t max_rounds, int32_t* out) {
    if (k < 1 || k > MAX_K) return;
    const int stride = 6 + 11 * k;
    for (int64_t gidx = 0; gidx < n_games; ++gidx) {
        GameCtx g;
        g.k0 = key_data[gidx * 2];
        g.k1 = key_data[gidx * 2 + 1];
        g.st = st + gidx * k;
        g.dt = dt + gidx * k;
        g.fl = fl + gidx * k;
        g.target = target_score;
        g.max_rounds = max_rounds;

        Seat seats[MAX_K];
        bool final_round = false;
        int32_t score_to_beat = target_score;
        int32_t rounds = 0;
        while (rounds < max_rounds) {
            rounds += 1;
            for (int s = 0; s < k; ++s) {
                take_turn(g, seats[s], s, false, score_to_beat);
                if (!final_round && seats[s].score >= target_score) {
                    final_round = true;
                    score_to_beat = seats[s].score;
                    for (int q = 0; q < k; ++q) {
                        if (q == s) continue;
                        take_turn(g, seats[q], q, true, score_to_beat);
                        if (seats[q].score > score_to_beat)
                            score_to_beat = seats[q].score;
                    }
                    break;
                }
            }
            if (final_round) break;
        }

        int32_t* o = out + gidx * stride;
        bool completed = final_round;
        // stable rank: higher score first, earlier seat breaks ties
        int32_t rank[MAX_K];
        int winner = -1;
        if (completed) {
            for (int s = 0; s < k; ++s) {
                int better = 0;
                for (int q = 0; q < k; ++q) {
                    if (seats[q].score > seats[s].score ||
                        (seats[q].score == seats[s].score && q < s))
                        better += (q != s);
                }
                rank[s] = 1 + better;
                if (rank[s] == 1) winner = s;
            }
        } else {
            for (int s = 0; s < k; ++s) rank[s] = 0;
        }
        int32_t winning = completed ? seats[winner].score : 0;
        int32_t runner = 0;
        if (completed && k > 1) {
            for (int s = 0; s < k; ++s)
                if (s != winner && seats[s].score > runner) runner = seats[s].score;
        }
        o[0] = completed ? 1 : 0;
        o[1] = winner;
        o[2] = winning;
        o[3] = completed ? winning - runner : 0;
        o[4] = rounds;
        o[5] = g.roll_limit_hits;
        for (int s = 0; s < k; ++s) {
            int32_t* q = o + 6 + 11 * s;
            const Seat& p = seats[s];
            q[0] = p.score;
            q[1] = rank[s];
            q[2] = p.n_farkles;
            q[3] = p.n_rolls;
            q[4] = p.n_turns;
            q[5] = p.highest_turn;
            q[6] = p.s5u;
            q[7] = p.s5d;
            q[8] = p.s1u;
            q[9] = p.s1d;
            q[10] = p.hot;
        }
    }
}

}  // extern "C"
