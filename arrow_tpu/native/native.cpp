// Native host-side hot paths for arrow_tpu.
//
// Reference analogues: the reference implements its entire host runtime in
// C++ (util/hashing.h memo tables for dictionary encoding, util/bit_util.h
// bitmap ops). Here the DEVICE compute path is XLA; this library covers the
// host-side data-preparation loops that numpy cannot vectorize:
//   * dictionary encoding of variable-length binary columns (upload path)
//   * validity bitmap pack/unpack + popcount
// Exposed as a plain C ABI consumed via ctypes (no Python headers needed).

#include <cstdint>
#include <cstring>
#include <string_view>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Dictionary encoding: (offsets, data) -> first-appearance codes + uniques.
// Handle-based protocol: encode -> query sizes -> fill -> free.
// ---------------------------------------------------------------------------

struct DictEncodeResult {
  std::vector<int32_t> codes;
  std::vector<int32_t> uniq_offsets;  // n_unique + 1
  std::vector<uint8_t> uniq_bytes;
};

void* dict_encode_binary(const uint8_t* data, const int64_t* offsets,
                         const uint8_t* valid /* nullable byte mask */,
                         int64_t n) {
  auto* res = new DictEncodeResult();
  res->codes.resize(n);
  res->uniq_offsets.push_back(0);
  std::unordered_map<std::string_view, int32_t> memo;
  memo.reserve(static_cast<size_t>(n < 1024 ? n : n / 4 + 16));
  for (int64_t i = 0; i < n; ++i) {
    std::string_view v;
    if (valid == nullptr || valid[i]) {
      v = std::string_view(reinterpret_cast<const char*>(data) + offsets[i],
                           static_cast<size_t>(offsets[i + 1] - offsets[i]));
    } else {
      v = std::string_view();  // nulls encode as code 0 slot value ""
    }
    auto it = memo.find(v);
    if (it == memo.end()) {
      int32_t code = static_cast<int32_t>(memo.size());
      res->uniq_bytes.insert(res->uniq_bytes.end(), v.begin(), v.end());
      res->uniq_offsets.push_back(
          static_cast<int32_t>(res->uniq_bytes.size()));
      // memo keys view the caller's buffer, which stays valid for the
      // duration of this call
      memo.emplace(v, code);
      res->codes[i] = code;
    } else {
      res->codes[i] = it->second;
    }
  }
  return res;
}

int64_t dict_encode_n_unique(void* handle) {
  return static_cast<int64_t>(
      static_cast<DictEncodeResult*>(handle)->uniq_offsets.size() - 1);
}

int64_t dict_encode_uniq_bytes(void* handle) {
  return static_cast<int64_t>(
      static_cast<DictEncodeResult*>(handle)->uniq_bytes.size());
}

void dict_encode_fill(void* handle, int32_t* codes, int32_t* uniq_offsets,
                      uint8_t* uniq_bytes) {
  auto* res = static_cast<DictEncodeResult*>(handle);
  std::memcpy(codes, res->codes.data(),
              res->codes.size() * sizeof(int32_t));
  std::memcpy(uniq_offsets, res->uniq_offsets.data(),
              res->uniq_offsets.size() * sizeof(int32_t));
  if (!res->uniq_bytes.empty()) {
    std::memcpy(uniq_bytes, res->uniq_bytes.data(),
                res->uniq_bytes.size());
  }
}

void dict_encode_free(void* handle) {
  delete static_cast<DictEncodeResult*>(handle);
}

// ---------------------------------------------------------------------------
// Bitmap utilities (LSB-first, Arrow layout).
// ---------------------------------------------------------------------------

void pack_bits(const uint8_t* bools, int64_t n, uint8_t* out) {
  int64_t nbytes = (n + 7) / 8;
  std::memset(out, 0, static_cast<size_t>(nbytes));
  for (int64_t i = 0; i < n; ++i) {
    out[i >> 3] |= static_cast<uint8_t>((bools[i] != 0) << (i & 7));
  }
}

void unpack_bits(const uint8_t* bitmap, int64_t n, int64_t offset,
                 uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t bit = offset + i;
    out[i] = (bitmap[bit >> 3] >> (bit & 7)) & 1;
  }
}

int64_t count_set_bits(const uint8_t* bitmap, int64_t n, int64_t offset) {
  int64_t count = 0;
  int64_t i = 0;
  // head to byte alignment
  while (i < n && ((offset + i) & 7) != 0) {
    count += (bitmap[(offset + i) >> 3] >> ((offset + i) & 7)) & 1;
    ++i;
  }
  // whole 64-bit words
  while (i + 64 <= n) {
    uint64_t w;
    std::memcpy(&w, bitmap + ((offset + i) >> 3), 8);
    count += __builtin_popcountll(w);
    i += 64;
  }
  while (i < n) {
    count += (bitmap[(offset + i) >> 3] >> ((offset + i) & 7)) & 1;
    ++i;
  }
  return count;
}

}  // extern "C"
