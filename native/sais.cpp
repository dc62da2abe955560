// SA-IS suffix array construction (induced sorting).
//
// From-scratch implementation of the SA-IS algorithm (Nong, Zhang & Chan,
// "Two Efficient Algorithms for Linear Time Suffix Array Construction").
// Used by the offline genome index builder to construct the suffix array of
// the FMD text (forward + reverse-complement genome) from which the BWT and
// occ checkpoints are derived.  Replaces the role of BWT construction inside
// the reference's native engine (reference consumes a prebuilt index via
// bwa_idx_load; see go/src/gobwa/gobwa.go:128-147).
//
// Exposed via a C ABI for ctypes:
//   sais_u8_i32 / sais_u8_i64: input uint8 string (values < K), output SA.
//   The caller appends its own unique smallest sentinel if needed.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename CharT, typename I>
void get_bucket_bounds(const CharT* s, I n, I K, std::vector<I>& bkt, bool end) {
  std::fill(bkt.begin(), bkt.end(), I(0));
  for (I i = 0; i < n; ++i) bkt[s[i]]++;
  I sum = 0;
  for (I c = 0; c < K; ++c) {
    sum += bkt[c];
    bkt[c] = end ? sum : sum - bkt[c];
  }
}

// Induce L-type then S-type positions from sorted LMS positions already in SA.
template <typename CharT, typename I>
void induce(const CharT* s, I* SA, I n, I K, const std::vector<uint8_t>& t,
            std::vector<I>& bkt) {
  get_bucket_bounds(s, n, K, bkt, false);
  for (I i = 0; i < n; ++i) {
    I j = SA[i];
    if (j > 0 && !t[j - 1]) SA[bkt[s[j - 1]]++] = j - 1;
  }
  get_bucket_bounds(s, n, K, bkt, true);
  for (I i = n; i-- > 0;) {
    I j = SA[i];
    if (j > 0 && t[j - 1]) SA[--bkt[s[j - 1]]] = j - 1;
  }
}

// Core recursive SA-IS. s[n-1] must be the unique smallest character
// (sentinel). SA must have space for n entries. Instantiated for CharT=uint8_t
// (top level) and CharT=I (all recursion levels), so template recursion
// terminates.
template <typename CharT, typename I>
void sais_core(const CharT* s, I* SA, I n, I K) {
  if (n == 1) {
    SA[0] = 0;
    return;
  }
  if (n == 2) {
    SA[0] = 1;
    SA[1] = 0;
    return;
  }
  std::vector<uint8_t> t(n);
  t[n - 1] = 1;
  if (n >= 2) t[n - 2] = 0;
  for (I i = n - 2; i-- > 0;)
    t[i] = (s[i] < s[i + 1] || (s[i] == s[i + 1] && t[i + 1])) ? 1 : 0;
  auto is_lms = [&](I i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<I> bkt(K);
  const I NEG = I(-1);

  // Stage 1: place LMS suffixes at bucket ends, induce to sort LMS substrings.
  get_bucket_bounds(s, n, K, bkt, true);
  std::fill(SA, SA + n, NEG);
  for (I i = 1; i < n; ++i)
    if (is_lms(i)) SA[--bkt[s[i]]] = i;
  induce(s, SA, n, K, t, bkt);

  // Compact sorted LMS positions into SA[0..n1).
  I n1 = 0;
  for (I i = 0; i < n; ++i)
    if (SA[i] != NEG && is_lms(SA[i])) SA[n1++] = SA[i];

  // Name LMS substrings; names stored sparsely in SA[n1..n).
  std::fill(SA + n1, SA + n, NEG);
  I name = 0, prev = NEG;
  for (I i = 0; i < n1; ++i) {
    I pos = SA[i];
    bool diff = false;
    if (prev == NEG) {
      diff = true;
    } else {
      for (I d = 0;; ++d) {
        if (pos + d >= n || prev + d >= n) { diff = true; break; }
        bool lms_a = d > 0 && is_lms(pos + d);
        bool lms_b = d > 0 && is_lms(prev + d);
        if (lms_a && lms_b) break;  // both substrings ended, equal
        if (lms_a != lms_b || s[pos + d] != s[prev + d] ||
            t[pos + d] != t[prev + d]) { diff = true; break; }
      }
    }
    if (diff) { ++name; prev = pos; }
    SA[n1 + pos / 2] = name - 1;
  }
  // Compact names to the tail of SA to form the reduced string s1.
  for (I i = n, j = n; i-- > n1;)
    if (SA[i] != NEG) SA[--j] = SA[i];
  I* s1 = SA + n - n1;

  if (name < n1) {
    sais_core<I, I>(s1, SA, n1, name);
  } else {
    for (I i = 0; i < n1; ++i) SA[s1[i]] = i;
  }

  // Stage 3: map reduced SA back to LMS positions, induce the final SA.
  {
    I j = 0;
    for (I i = 1; i < n; ++i)
      if (is_lms(i)) s1[j++] = i;  // s1 now holds LMS positions in text order
  }
  for (I i = 0; i < n1; ++i) SA[i] = s1[SA[i]];
  std::fill(SA + n1, SA + n, NEG);
  get_bucket_bounds(s, n, K, bkt, true);
  for (I i = n1; i-- > 0;) {
    I j = SA[i];
    SA[i] = NEG;
    SA[--bkt[s[j]]] = j;
  }
  induce(s, SA, n, K, t, bkt);
}

}  // namespace

extern "C" {

// Build SA of s[0..n) (values in [0,K), s[n-1] unique smallest). Returns 0 ok.
int sais_u8_i32(const uint8_t* s, int32_t* SA, int32_t n, int32_t K) {
  if (n <= 0 || K <= 0) return -1;
  sais_core<uint8_t, int32_t>(s, SA, n, K);
  return 0;
}

int sais_u8_i64(const uint8_t* s, int64_t* SA, int64_t n, int64_t K) {
  if (n <= 0 || K <= 0) return -1;
  sais_core<uint8_t, int64_t>(s, SA, n, K);
  return 0;
}

}  // extern "C"
