// Native host-side hot paths for arrow_tpu.
//
// Reference analogues: the reference implements its entire host runtime in
// C++ (util/hashing.h memo tables for dictionary encoding, util/bit_util.h
// bitmap ops). Here the DEVICE compute path is XLA; this library covers the
// host-side data-preparation loops that numpy cannot vectorize:
//   * dictionary encoding of variable-length binary columns (upload path)
//   * validity bitmap pack/unpack + popcount
// Exposed as a plain C ABI consumed via ctypes (no Python headers needed).

#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string_view>
#include <unordered_map>
#include <unordered_set>
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


// --- Parquet hybrid RLE / bit-packed codec (reference:
// cpp/src/arrow/util/rle_encoding_internal.h) ---------------------------

static inline int64_t rle_read_varint(const uint8_t* d, int64_t& pos) {
  int64_t v = 0;
  int shift = 0;
  while (true) {
    uint8_t b = d[pos++];
    v |= (int64_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) return v;
    shift += 7;
  }
}

static inline void rle_write_varint(uint8_t* d, int64_t& pos, uint64_t v) {
  while (true) {
    uint8_t b = v & 0x7F;
    v >>= 7;
    if (v) d[pos++] = b | 0x80; else { d[pos++] = b; return; }
  }
}

// decode num_values from the stream at data+pos; returns bytes consumed
// past pos, or -1 on overrun.
int64_t rle_decode(const uint8_t* data, int64_t len, int64_t pos,
                   int64_t num_values, int32_t bit_width, int64_t* out) {
  const int64_t start = pos;
  int64_t filled = 0;
  const int byte_width = (bit_width + 7) / 8;
  while (filled < num_values) {
    if (pos >= len) return -1;
    int64_t header = rle_read_varint(data, pos);
    if (header & 1) {                     // bit-packed groups of 8
      int64_t groups = header >> 1;
      int64_t n = groups * 8;
      int64_t nbytes = groups * bit_width;
      if (pos + nbytes > len) return -1;
      int64_t take = n < (num_values - filled) ? n : (num_values - filled);
      const uint8_t* src = data + pos;
      int64_t bit = 0;
      for (int64_t i = 0; i < take; i++) {
        uint64_t v = 0;
        for (int b = 0; b < bit_width; b++) {
          int64_t idx = bit + b;
          v |= (uint64_t)((src[idx >> 3] >> (idx & 7)) & 1) << b;
        }
        out[filled + i] = (int64_t)v;
        bit += bit_width;
      }
      pos += nbytes;
      filled += take;
    } else {                              // rle run
      int64_t count = header >> 1;
      if (pos + byte_width > len) return -1;
      uint64_t v = 0;
      for (int b = 0; b < byte_width; b++)
        v |= (uint64_t)data[pos + b] << (8 * b);
      pos += byte_width;
      int64_t take = count < (num_values - filled) ? count
                                                   : (num_values - filled);
      for (int64_t i = 0; i < take; i++) out[filled + i] = (int64_t)v;
      filled += take;
    }
  }
  return pos - start;
}

// encode n values; out must hold >= n*8 + 16 bytes. Returns bytes written.
int64_t rle_encode(const int64_t* values, int64_t n, int32_t bit_width,
                   uint8_t* out) {
  int64_t pos = 0;
  const int byte_width = (bit_width + 7) / 8;
  int64_t i = 0;
  while (i < n) {
    int64_t v = values[i];
    int64_t j = i + 1;
    while (j < n && values[j] == v) j++;
    int64_t run = j - i;
    if (run >= 8) {
      rle_write_varint(out, pos, (uint64_t)run << 1);
      for (int b = 0; b < byte_width; b++)
        out[pos++] = (uint8_t)((uint64_t)v >> (8 * b));
      i = j;
    } else {
      // bit-pack until the next >=16 constant run (or end)
      int64_t k = i;
      while (k < n) {
        int64_t v2 = values[k];
        int64_t m = k + 1;
        while (m < n && values[m] == v2) m++;
        if (m - k >= 16) break;
        k = m;
      }
      int64_t count = k - i;
      if (k < n) {
        int64_t pad = (8 - (count % 8)) % 8;
        k += pad;
        count += pad;
      }
      int64_t groups = (count + 7) / 8;
      rle_write_varint(out, pos, ((uint64_t)groups << 1) | 1);
      int64_t total = groups * 8;
      int64_t bit = 0;
      uint8_t* dst = out + pos;
      int64_t nbytes = groups * bit_width;
      for (int64_t b = 0; b < nbytes; b++) dst[b] = 0;
      for (int64_t t = 0; t < total; t++) {
        uint64_t val = t < count ? (uint64_t)values[i + t] : 0;
        // values beyond k (pad) belong to the following run
        if (t < count && i + t >= n) val = 0;
        for (int b = 0; b < bit_width; b++) {
          if ((val >> b) & 1) {
            int64_t idx = bit + b;
            dst[idx >> 3] |= (uint8_t)(1 << (idx & 7));
          }
        }
        bit += bit_width;
      }
      pos += nbytes;
      i = k;
    }
  }
  return pos;
}


// --- Snappy codec (raw format; reference: util/compression_snappy.cc,
// format per google/snappy format_description.txt) --------------------

// decompress: returns output length or -1 on malformed input.
int64_t snappy_decompress(const uint8_t* in, int64_t in_len,
                          uint8_t* out, int64_t out_cap) {
  int64_t ip = 0;
  // varint: uncompressed length
  uint64_t ulen = 0;
  int shift = 0;
  while (ip < in_len) {
    uint8_t b = in[ip++];
    ulen |= (uint64_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) break;
    shift += 7;
  }
  if ((int64_t)ulen > out_cap) return -1;
  int64_t op = 0;
  while (ip < in_len) {
    uint8_t tag = in[ip++];
    int t = tag & 3;
    if (t == 0) {                       // literal
      int64_t len = (tag >> 2) + 1;
      if (len > 60) {
        int n = (int)len - 60;
        len = 0;
        for (int i = 0; i < n; i++) len |= (int64_t)in[ip++] << (8 * i);
        len += 1;
      }
      if (ip + len > in_len || op + len > (int64_t)ulen) return -1;
      for (int64_t i = 0; i < len; i++) out[op + i] = in[ip + i];
      ip += len;
      op += len;
    } else {
      int64_t len, off;
      if (t == 1) {                     // copy, 1-byte offset
        len = ((tag >> 2) & 0x7) + 4;
        off = ((int64_t)(tag & 0xE0) << 3) | in[ip++];
      } else if (t == 2) {              // copy, 2-byte offset
        len = (tag >> 2) + 1;
        off = in[ip] | ((int64_t)in[ip + 1] << 8);
        ip += 2;
      } else {                          // copy, 4-byte offset
        len = (tag >> 2) + 1;
        off = (int64_t)in[ip] | ((int64_t)in[ip + 1] << 8) |
              ((int64_t)in[ip + 2] << 16) | ((int64_t)in[ip + 3] << 24);
        ip += 4;
      }
      if (off <= 0 || off > op || op + len > (int64_t)ulen) return -1;
      for (int64_t i = 0; i < len; i++) out[op + i] = out[op - off + i];
      op += len;
    }
  }
  return op == (int64_t)ulen ? op : -1;
}

// compress with a small hash-match encoder; output worst case
// <= in_len + in_len/6 + 32. Returns compressed length.
int64_t snappy_compress(const uint8_t* in, int64_t n, uint8_t* out) {
  int64_t op = 0;
  // varint length
  uint64_t v = (uint64_t)n;
  while (true) {
    uint8_t b = v & 0x7F;
    v >>= 7;
    if (v) out[op++] = b | 0x80; else { out[op++] = b; break; }
  }
  auto emit_literal = [&](int64_t from, int64_t len) {
    while (len > 0) {
      int64_t chunk = len;
      if (chunk <= 60) {
        out[op++] = (uint8_t)((chunk - 1) << 2);
      } else {
        int nb = 0;
        int64_t l = chunk - 1;
        uint8_t tmp[4];
        while (l > 0 && nb < 4) { tmp[nb++] = l & 0xFF; l >>= 8; }
        if (nb == 0) { tmp[nb++] = 0; }
        out[op++] = (uint8_t)((59 + nb) << 2);
        for (int i = 0; i < nb; i++) out[op++] = tmp[i];
      }
      for (int64_t i = 0; i < chunk; i++) out[op++] = in[from + i];
      from += chunk;
      len -= chunk;
    }
  };
  const int HB = 14;
  static thread_local int64_t table[1 << 14];
  for (int i = 0; i < (1 << HB); i++) table[i] = -1;
  int64_t lit_start = 0;
  int64_t i = 0;
  while (i + 4 <= n) {
    uint32_t h = ((uint32_t)in[i] | ((uint32_t)in[i+1] << 8) |
                  ((uint32_t)in[i+2] << 16) | ((uint32_t)in[i+3] << 24));
    uint32_t slot = (h * 0x1e35a7bdu) >> (32 - HB);
    int64_t cand = table[slot];
    table[slot] = i;
    if (cand >= 0 && i - cand < 65536 &&
        *(const uint32_t*)(in + cand) == *(const uint32_t*)(in + i)) {
      // extend match
      int64_t len = 4;
      while (i + len < n && in[cand + len] == in[i + len] && len < 64)
        len++;
      if (i > lit_start) emit_literal(lit_start, i - lit_start);
      int64_t off = i - cand;
      // emit as 2-byte-offset copies (len 1..64)
      out[op++] = (uint8_t)(((len - 1) << 2) | 2);
      out[op++] = (uint8_t)(off & 0xFF);
      out[op++] = (uint8_t)(off >> 8);
      i += len;
      lit_start = i;
    } else {
      i++;
    }
  }
  if (lit_start < n) emit_literal(lit_start, n - lit_start);
  return op;
}


// --- LZ4 block + frame codec (reference: util/compression_lz4.cc;
// format per lz4 Block/Frame format specs) ------------------------------

// decode one LZ4 block with `hist` bytes of already-decoded history at
// the start of `out` (block-linked frames); returns NEW bytes or -1.
int64_t lz4_block_decompress_hist(const uint8_t* in, int64_t in_len,
                                  uint8_t* out, int64_t out_cap,
                                  int64_t hist) {
  int64_t ip = 0, op = hist;
  while (ip < in_len) {
    uint8_t token = in[ip++];
    int64_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do { if (ip >= in_len) return -1; b = in[ip++]; lit += b; }
      while (b == 255);
    }
    if (ip + lit > in_len || op + lit > out_cap) return -1;
    for (int64_t i = 0; i < lit; i++) out[op + i] = in[ip + i];
    ip += lit;
    op += lit;
    if (ip >= in_len) break;             // last literals
    if (ip + 2 > in_len) return -1;
    int64_t off = in[ip] | ((int64_t)in[ip + 1] << 8);
    ip += 2;
    if (off == 0 || off > op) return -1;
    int64_t mlen = (token & 0xF);  // off may reach into history
    if (mlen == 15) {
      uint8_t b;
      do { if (ip >= in_len) return -1; b = in[ip++]; mlen += b; }
      while (b == 255);
    }
    mlen += 4;
    if (op + mlen > out_cap) return -1;
    for (int64_t i = 0; i < mlen; i++) out[op + i] = out[op - off + i];
    op += mlen;
  }
  return op - hist;
}

int64_t lz4_block_decompress(const uint8_t* in, int64_t in_len,
                             uint8_t* out, int64_t out_cap) {
  return lz4_block_decompress_hist(in, in_len, out, out_cap, 0);
}

// compress one LZ4 block (greedy hash matcher); returns size.
int64_t lz4_block_compress(const uint8_t* in, int64_t n, uint8_t* out) {
  const int HB = 14;
  static thread_local int64_t table[1 << 14];
  for (int i = 0; i < (1 << HB); i++) table[i] = -1;
  int64_t op = 0, anchor = 0, i = 0;
  auto emit_seq = [&](int64_t lit_from, int64_t lit_len, int64_t off,
                      int64_t mlen) {
    int64_t ml = mlen - 4;
    uint8_t token = (uint8_t)(((lit_len < 15 ? lit_len : 15) << 4) |
                              (ml < 15 ? ml : (int64_t)15));
    out[op++] = token;
    if (lit_len >= 15) {
      int64_t rest = lit_len - 15;
      while (rest >= 255) { out[op++] = 255; rest -= 255; }
      out[op++] = (uint8_t)rest;
    }
    for (int64_t k = 0; k < lit_len; k++) out[op++] = in[lit_from + k];
    out[op++] = (uint8_t)(off & 0xFF);
    out[op++] = (uint8_t)(off >> 8);
    if (ml >= 15) {
      int64_t rest = ml - 15;
      while (rest >= 255) { out[op++] = 255; rest -= 255; }
      out[op++] = (uint8_t)rest;
    }
  };
  // matches must end >= 12 bytes before end; last 5 bytes literals
  while (i + 12 <= n) {
    uint32_t h = ((uint32_t)in[i] | ((uint32_t)in[i+1] << 8) |
                  ((uint32_t)in[i+2] << 16) | ((uint32_t)in[i+3] << 24));
    uint32_t slot = (h * 0x9E3779B1u) >> (32 - HB);
    int64_t cand = table[slot];
    table[slot] = i;
    if (cand >= 0 && i - cand < 65536 &&
        *(const uint32_t*)(in + cand) == *(const uint32_t*)(in + i)) {
      int64_t mlen = 4;
      while (i + mlen < n - 5 && in[cand + mlen] == in[i + mlen]) mlen++;
      emit_seq(anchor, i - anchor, i - cand, mlen);
      i += mlen;
      anchor = i;
    } else {
      i++;
    }
  }
  // trailing literals
  int64_t lit = n - anchor;
  uint8_t token = (uint8_t)((lit < 15 ? lit : 15) << 4);
  out[op++] = token;
  if (lit >= 15) {
    int64_t rest = lit - 15;
    while (rest >= 255) { out[op++] = 255; rest -= 255; }
    out[op++] = (uint8_t)rest;
  }
  for (int64_t k = 0; k < lit; k++) out[op++] = in[anchor + k];
  return op;
}

// ---------------------------------------------------------------------------
// CSV hot path (reference: cpp/src/arrow/csv/ chunker.cc + parser.cc +
// converter.cc). One pass tokenizes a whole block into a flat field pool
// (unescaped bytes + offsets + per-field quoted flags + per-row field
// counts); bulk parsers then convert column strides without touching
// Python objects.
// ---------------------------------------------------------------------------

struct CsvParseResult {
  std::vector<int64_t> offsets;     // n_fields + 1
  std::vector<uint8_t> pool;        // unescaped field bytes
  std::vector<uint8_t> quoted;      // per field: started with quote char
  std::vector<int64_t> row_counts;  // fields per row (0 = empty line)
};

// SWAR span scan: first index >= i whose byte matches one of up to 4
// patterns (0 entries in `pats` beyond `npat` are ignored). The classic
// haszero trick marks the first true occurrence per word; false markers
// only ever follow a true one, so ctz of the OR is exact.
static inline uint64_t swar_haszero(uint64_t v) {
  return (v - 0x0101010101010101ULL) & ~v & 0x8080808080808080ULL;
}

static inline int64_t scan_special(const uint8_t* d, int64_t i,
                                   int64_t len, const uint64_t* pats,
                                   int npat, const bool* table) {
  while (i + 8 <= len) {
    uint64_t w;
    std::memcpy(&w, d + i, 8);
    uint64_t m = 0;
    for (int p = 0; p < npat; ++p) m |= swar_haszero(w ^ pats[p]);
    if (m) return i + (int64_t)(__builtin_ctzll(m) >> 3);
    i += 8;
  }
  while (i < len && !table[d[i]]) ++i;
  return i;
}

static inline uint64_t swar_broadcast(uint8_t c) {
  return 0x0101010101010101ULL * (uint64_t)c;
}

// Tokenize `data` (UTF-8/ASCII-compatible). Row terminators: \n, \r\n, \r.
// escape < 0 means no escape char. Matches Python csv.reader semantics:
// an entirely empty line yields a 0-field row.
void* csv_parse(const uint8_t* data, int64_t len, uint8_t delim,
                uint8_t quote, int32_t use_quote, int32_t doublequote,
                int32_t escape) {
  auto* res = new CsvParseResult();
  res->offsets.reserve(static_cast<size_t>(len / 8 + 16));
  res->pool.reserve(static_cast<size_t>(len));
  res->offsets.push_back(0);
  // span-scan tables: stop bytes for unquoted / quoted field scans
  bool stop_plain[256] = {false};
  stop_plain[delim] = stop_plain['\n'] = stop_plain['\r'] = true;
  if (escape >= 0) stop_plain[(uint8_t)escape] = true;
  bool stop_quoted[256] = {false};
  if (use_quote) stop_quoted[quote] = true;
  if (escape >= 0) stop_quoted[(uint8_t)escape] = true;
  uint64_t plain_pats[4] = {swar_broadcast(delim), swar_broadcast('\n'),
                            swar_broadcast('\r'), 0};
  int n_plain = 3;
  if (escape >= 0) plain_pats[n_plain++] = swar_broadcast((uint8_t)escape);
  uint64_t quoted_pats[2] = {swar_broadcast(quote), 0};
  int n_quoted = use_quote ? 1 : 0;
  if (escape >= 0) quoted_pats[n_quoted++] = swar_broadcast((uint8_t)escape);
  int64_t i = 0;
  while (i < len) {
    int64_t row_fields = 0;
    bool row_done = false;
    bool saw_any = false;  // any byte (incl. delimiter) on this line
    while (!row_done) {
      // one field
      bool was_quoted = false;
      if (use_quote && i < len && data[i] == quote) {
        was_quoted = true;
        saw_any = true;
        ++i;
        while (i < len) {
          int64_t run = scan_special(data, i, len, quoted_pats, n_quoted,
                                     stop_quoted);
          if (run > i) {
            res->pool.insert(res->pool.end(), data + i, data + run);
            i = run;
          }
          if (i >= len) break;
          uint8_t c = data[i];
          if (escape >= 0 && c == (uint8_t)escape) {
            if (i + 1 < len) {
              res->pool.push_back(data[i + 1]);
              i += 2;
            } else {
              res->pool.push_back(c);
              ++i;
            }
            continue;
          }
          // c == quote
          if (doublequote && i + 1 < len && data[i + 1] == quote) {
            res->pool.push_back(quote);
            i += 2;
            continue;
          }
          ++i;  // closing quote
          break;
        }
      }
      // unquoted remainder (also trailing bytes after a closing quote)
      while (i < len) {
        int64_t run = scan_special(data, i, len, plain_pats, n_plain,
                                   stop_plain);
        if (run > i) {
          res->pool.insert(res->pool.end(), data + i, data + run);
          saw_any = true;
          i = run;
        }
        if (i >= len) break;
        uint8_t c = data[i];
        if (c == delim || c == '\n' || c == '\r') break;
        // escape char: next byte literal (escape at EOF stays literal)
        if (i + 1 < len) {
          res->pool.push_back(data[i + 1]);
          i += 2;
        } else {
          res->pool.push_back(c);
          ++i;
        }
        saw_any = true;
      }
      // field terminator
      if (i < len && data[i] == delim) {
        saw_any = true;
        ++i;
        res->offsets.push_back((int64_t)res->pool.size());
        res->quoted.push_back(was_quoted ? 1 : 0);
        ++row_fields;
        continue;
      }
      // row terminator or EOF
      if (i < len && data[i] == '\r') {
        ++i;
        if (i < len && data[i] == '\n') ++i;
      } else if (i < len && data[i] == '\n') {
        ++i;
      }
      if (row_fields == 0 && !saw_any && !was_quoted) {
        // entirely empty line -> 0-field row (csv.reader yields [])
        res->row_counts.push_back(0);
      } else {
        res->offsets.push_back((int64_t)res->pool.size());
        res->quoted.push_back(was_quoted ? 1 : 0);
        res->row_counts.push_back(row_fields + 1);
      }
      row_done = true;
    }
  }
  return res;
}

// Zero-copy tokenizer for blocks with no quote/escape chars: offsets
// are emitted as (start, end) PAIRS into the caller's buffer (field k
// spans offsets[2k]..offsets[2k+1], so the bulk converters work
// unchanged with ids doubled); no pool copy is made.
void* csv_parse_nq(const uint8_t* data, int64_t len, uint8_t delim) {
  auto* res = new CsvParseResult();
  res->offsets.reserve((size_t)(len / 4 + 16));
  uint64_t pats[3] = {swar_broadcast(delim), swar_broadcast('\n'),
                      swar_broadcast('\r')};
  bool table[256] = {false};
  table[delim] = table['\n'] = table['\r'] = true;
  int64_t i = 0;
  while (i < len) {
    int64_t row_fields = 0;
    bool saw_any = false;
    while (true) {
      int64_t start = i;
      i = scan_special(data, i, len, pats, 3, table);
      if (i > start) saw_any = true;
      if (i < len && data[i] == delim) {
        res->offsets.push_back(start);
        res->offsets.push_back(i);
        ++row_fields;
        ++i;
        saw_any = true;
        continue;
      }
      // newline or EOF
      int64_t end = i;
      if (i < len && data[i] == '\r') {
        ++i;
        if (i < len && data[i] == '\n') ++i;
      } else if (i < len) {
        ++i;
      }
      if (row_fields == 0 && !saw_any) {
        res->row_counts.push_back(0);
      } else {
        res->offsets.push_back(start);
        res->offsets.push_back(end);
        res->row_counts.push_back(row_fields + 1);
      }
      break;
    }
  }
  // quoted flags: all zero, one per field
  res->quoted.assign(res->offsets.size() / 2, 0);
  return res;
}

// Zero-copy tokenizer for QUOTED blocks whose fields need no byte
// rewriting: offsets are (start, end) pairs into the caller's buffer,
// with quoted fields spanning (open+1, close) — stripping the quotes
// is pure offset arithmetic. Returns nullptr (caller falls back to the
// copying csv_parse) on the rewriting cases: a doubled quote inside a
// field, an escape char configured, or bytes between a closing quote
// and the field terminator ("ab"cd).
void* csv_parse_zc(const uint8_t* data, int64_t len, uint8_t delim,
                   uint8_t quote, int32_t doublequote, int32_t escape) {
  if (escape >= 0) return nullptr;
  auto* res = new CsvParseResult();
  res->offsets.reserve((size_t)(len / 4 + 16));
  uint64_t pats[3] = {swar_broadcast(delim), swar_broadcast('\n'),
                      swar_broadcast('\r')};
  bool table[256] = {false};
  table[delim] = table['\n'] = table['\r'] = true;
  uint64_t qpats[1] = {swar_broadcast(quote)};
  bool qtable[256] = {false};
  qtable[quote] = true;
  int64_t i = 0;
  while (i < len) {
    int64_t row_fields = 0;
    bool saw_any = false;
    while (true) {
      bool was_quoted = false;
      int64_t start = i, end;
      if (i < len && data[i] == quote) {
        was_quoted = true;
        saw_any = true;
        start = ++i;
        i = scan_special(data, i, len, qpats, 1, qtable);
        end = i;
        if (i < len) {
          if (doublequote && i + 1 < len && data[i + 1] == quote) {
            delete res;
            return nullptr;  // escaped quote needs pool rewriting
          }
          ++i;  // closing quote
          if (i < len && data[i] != delim && data[i] != '\n' &&
              data[i] != '\r') {
            delete res;
            return nullptr;  // trailing bytes after closing quote
          }
        }
      } else {
        i = scan_special(data, i, len, pats, 3, table);
        end = i;
        if (i > start) saw_any = true;
      }
      if (i < len && data[i] == delim) {
        res->offsets.push_back(start);
        res->offsets.push_back(end);
        res->quoted.push_back(was_quoted ? 1 : 0);
        ++row_fields;
        ++i;
        saw_any = true;
        continue;
      }
      if (i < len && data[i] == '\r') {
        ++i;
        if (i < len && data[i] == '\n') ++i;
      } else if (i < len) {
        ++i;
      }
      if (row_fields == 0 && !saw_any && !was_quoted) {
        res->row_counts.push_back(0);
      } else {
        res->offsets.push_back(start);
        res->offsets.push_back(end);
        res->quoted.push_back(was_quoted ? 1 : 0);
        res->row_counts.push_back(row_fields + 1);
      }
      break;
    }
  }
  return res;
}

int64_t csv_parse_n_offsets(void* handle) {
  return (int64_t)static_cast<CsvParseResult*>(handle)->offsets.size();
}

void csv_parse_sizes(void* handle, int64_t* n_fields, int64_t* n_rows,
                     int64_t* pool_bytes) {
  auto* res = static_cast<CsvParseResult*>(handle);
  *n_fields = (int64_t)res->quoted.size();
  *n_rows = (int64_t)res->row_counts.size();
  *pool_bytes = (int64_t)res->pool.size();
}

void csv_parse_fill(void* handle, int64_t* offsets, uint8_t* pool,
                    uint8_t* quoted, int64_t* row_counts) {
  auto* res = static_cast<CsvParseResult*>(handle);
  std::memcpy(offsets, res->offsets.data(),
              res->offsets.size() * sizeof(int64_t));
  if (!res->pool.empty()) {
    std::memcpy(pool, res->pool.data(), res->pool.size());
  }
  if (!res->quoted.empty()) {
    std::memcpy(quoted, res->quoted.data(), res->quoted.size());
  }
  if (!res->row_counts.empty()) {
    std::memcpy(row_counts, res->row_counts.data(),
                res->row_counts.size() * sizeof(int64_t));
  }
}

void csv_parse_free(void* handle) {
  delete static_cast<CsvParseResult*>(handle);
}

static inline std::string_view csv_field(const uint8_t* pool,
                                         const int64_t* offsets,
                                         int64_t id) {
  return std::string_view(
      reinterpret_cast<const char*>(pool) + offsets[id],
      static_cast<size_t>(offsets[id + 1] - offsets[id]));
}

static inline std::string_view csv_trim(std::string_view v) {
  size_t b = 0, e = v.size();
  while (b < e && (v[b] == ' ' || v[b] == '\t')) ++b;
  while (e > b && (v[e - 1] == ' ' || v[e - 1] == '\t')) --e;
  return v.substr(b, e - b);
}

// Parse fields ids[0..n) as int64. skip (nullable byte mask): 1 = null,
// emit 0. ok[i]=1 on success. Aborts on the first failure (callers treat
// any failure as a column-level failure); returns 0 on full success or
// the 1-based position of the first failure.
int64_t csv_parse_int64(const uint8_t* pool, const int64_t* offsets,
                        const int64_t* ids, const uint8_t* skip,
                        int64_t n, int64_t* out, uint8_t* ok) {
  for (int64_t i = 0; i < n; ++i) {
    if (skip && skip[i]) { out[i] = 0; ok[i] = 1; continue; }
    std::string_view v = csv_trim(csv_field(pool, offsets, ids[i]));
    if (!v.empty() && v.front() == '+' && v.size() > 1) v.remove_prefix(1);
    int64_t value = 0;
    auto r = std::from_chars(v.data(), v.data() + v.size(), value);
    if (r.ec == std::errc() && r.ptr == v.data() + v.size() && !v.empty()) {
      out[i] = value;
      ok[i] = 1;
    } else {
      ok[i] = 0;
      return i + 1;
    }
  }
  return 0;
}

int64_t csv_parse_float64(const uint8_t* pool, const int64_t* offsets,
                          const int64_t* ids, const uint8_t* skip,
                          int64_t n, double* out, uint8_t* ok) {
  for (int64_t i = 0; i < n; ++i) {
    if (skip && skip[i]) { out[i] = 0.0; ok[i] = 1; continue; }
    std::string_view v = csv_trim(csv_field(pool, offsets, ids[i]));
    if (!v.empty() && v.front() == '+' && v.size() > 1) v.remove_prefix(1);
    double value = 0.0;
    auto r = std::from_chars(v.data(), v.data() + v.size(), value);
    if (r.ec == std::errc() && r.ptr == v.data() + v.size() && !v.empty()) {
      out[i] = value;
      ok[i] = 1;
    } else {
      ok[i] = 0;
      return i + 1;
    }
  }
  return 0;
}

// Permissive variants: record per-field ok and keep going, returning the
// failure count — the parse-first inference path resolves failures
// against null tokens afterwards instead of prescanning every field.
int64_t csv_parse_int64p(const uint8_t* pool, const int64_t* offsets,
                         const int64_t* ids, const uint8_t* skip,
                         int64_t n, int64_t* out, uint8_t* ok) {
  int64_t failures = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (skip && skip[i]) { out[i] = 0; ok[i] = 1; continue; }
    std::string_view v = csv_trim(csv_field(pool, offsets, ids[i]));
    if (!v.empty() && v.front() == '+' && v.size() > 1) v.remove_prefix(1);
    int64_t value = 0;
    auto r = std::from_chars(v.data(), v.data() + v.size(), value);
    if (r.ec == std::errc() && r.ptr == v.data() + v.size() && !v.empty()) {
      out[i] = value;
      ok[i] = 1;
    } else {
      out[i] = 0;
      ok[i] = 0;
      ++failures;
    }
  }
  return failures;
}

int64_t csv_parse_float64p(const uint8_t* pool, const int64_t* offsets,
                           const int64_t* ids, const uint8_t* skip,
                           int64_t n, double* out, uint8_t* ok) {
  int64_t failures = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (skip && skip[i]) { out[i] = 0.0; ok[i] = 1; continue; }
    std::string_view v = csv_trim(csv_field(pool, offsets, ids[i]));
    if (!v.empty() && v.front() == '+' && v.size() > 1) v.remove_prefix(1);
    double value = 0.0;
    auto r = std::from_chars(v.data(), v.data() + v.size(), value);
    if (r.ec == std::errc() && r.ptr == v.data() + v.size() && !v.empty()) {
      out[i] = value;
      ok[i] = 1;
    } else {
      out[i] = 0.0;
      ok[i] = 0;
      ++failures;
    }
  }
  return failures;
}

// Token-set matcher with (first char, length) quick reject: most fields
// are numbers/words that share no first byte with the null spellings.
struct CsvTokenSet {
  std::unordered_set<std::string_view> set;
  bool first_ok[256] = {false};
  uint64_t len_mask = 0;  // lengths 0..63 present
  bool has_empty = false;

  void build(const uint8_t* tok_bytes, const int32_t* tok_offs, int32_t m) {
    set.reserve((size_t)m * 2);
    for (int32_t t = 0; t < m; ++t) {
      size_t tl = (size_t)(tok_offs[t + 1] - tok_offs[t]);
      const char* p = reinterpret_cast<const char*>(tok_bytes) + tok_offs[t];
      set.emplace(p, tl);
      if (tl == 0) { has_empty = true; continue; }
      first_ok[(uint8_t)p[0]] = true;
      if (tl < 64) len_mask |= (uint64_t)1 << tl;
    }
  }

  inline bool match(std::string_view v) const {
    if (v.empty()) return has_empty;
    if (!first_ok[(uint8_t)v[0]]) return false;
    if (v.size() >= 64 || !((len_mask >> v.size()) & 1)) return false;
    return set.count(v) != 0;
  }
};

// out[i] = 1 iff field ids[i] equals one of the m tokens (exact bytes).
void csv_match_tokens(const uint8_t* pool, const int64_t* offsets,
                      const int64_t* ids, int64_t n,
                      const uint8_t* tok_bytes, const int32_t* tok_offs,
                      int32_t m, uint8_t* out) {
  CsvTokenSet toks;
  toks.build(tok_bytes, tok_offs, m);
  for (int64_t i = 0; i < n; ++i) {
    out[i] = toks.match(csv_field(pool, offsets, ids[i])) ? 1 : 0;
  }
}

// Fused bool inference: out[i]=1 where true-token, 0 where false-token;
// skipped (null) rows emit 0. Aborts at the first field in neither set;
// returns 0 on success, first-failure position + 1 otherwise.
int64_t csv_parse_bool(const uint8_t* pool, const int64_t* offsets,
                       const int64_t* ids, const uint8_t* skip, int64_t n,
                       const uint8_t* true_bytes, const int32_t* true_offs,
                       int32_t n_true, const uint8_t* false_bytes,
                       const int32_t* false_offs, int32_t n_false,
                       uint8_t* out) {
  CsvTokenSet tv, fv;
  tv.build(true_bytes, true_offs, n_true);
  fv.build(false_bytes, false_offs, n_false);
  for (int64_t i = 0; i < n; ++i) {
    if (skip && skip[i]) { out[i] = 0; continue; }
    std::string_view v = csv_field(pool, offsets, ids[i]);
    if (tv.match(v)) { out[i] = 1; continue; }
    if (fv.match(v)) { out[i] = 0; continue; }
    return i + 1;
  }
  return 0;
}

// Copy fields ids[0..n) into a dense byte buffer at out_offsets
// (precomputed int64 cumsum of lengths, zero-length where skip[i]).
// skip may be null.
void csv_gather_bytes(const uint8_t* pool, const int64_t* offsets,
                      const int64_t* ids, const uint8_t* skip, int64_t n,
                      const int64_t* out_offsets, uint8_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    if (skip && skip[i]) continue;
    int64_t id = ids[i];
    int64_t len = offsets[id + 1] - offsets[id];
    if (len) std::memcpy(out + out_offsets[i], pool + offsets[id],
                         (size_t)len);
  }
}

// Transpose the row-major token stream into per-column (start, end)
// pair-offset arrays (+ per-column quoted flags): one sequential pass
// over the field table instead of ncols column-strided passes (each
// strided pass pulls a fresh cache line per field — measured 3x the
// cost of the converters themselves). Missing fields (short rows) emit
// the (0, 0) span; callers mask them separately.
// out_offsets: ncols * (2 * n_rows) int64, column-major blocks;
// out_quoted:  ncols * n_rows u8.
void csv_transpose_columns(const int64_t* offsets, const uint8_t* quoted,
                           const int64_t* row_starts,
                           const int64_t* row_counts, int64_t n_rows,
                           int64_t ncols, int64_t id_scale,
                           int64_t* out_offsets, uint8_t* out_quoted) {
  for (int64_t r = 0; r < n_rows; ++r) {
    int64_t start = row_starts[r];
    int64_t rc = row_counts[r];
    int64_t m = rc < ncols ? rc : ncols;
    for (int64_t j = 0; j < m; ++j) {
      int64_t id = (start + j) * id_scale;
      out_offsets[j * 2 * n_rows + 2 * r] = offsets[id];
      out_offsets[j * 2 * n_rows + 2 * r + 1] = offsets[id + 1];
      out_quoted[j * n_rows + r] = quoted[start + j];
    }
    for (int64_t j = m; j < ncols; ++j) {
      out_offsets[j * 2 * n_rows + 2 * r] = 0;
      out_offsets[j * 2 * n_rows + 2 * r + 1] = 0;
      out_quoted[j * n_rows + r] = 0;
    }
  }
}

// ---------------------------------------------------------------------------
// ISO-8601 date/timestamp bulk parsers (reference: cpp/src/arrow/util/
// value_parsing.h ParseTimestampISO8601 + csv/converter.cc). Semantics
// mirror the python fallback (datetime.date/datetime.fromisoformat):
// any field the native parser is unsure about aborts the whole column
// so the caller falls back to the python path — abort is always
// correctness-safe.
// ---------------------------------------------------------------------------

static inline bool parse_digits(std::string_view v, size_t pos, int len,
                                int64_t* out) {
  if (pos + (size_t)len > v.size()) return false;
  int64_t r = 0;
  for (int i = 0; i < len; ++i) {
    uint8_t c = (uint8_t)v[pos + i];
    if (c < '0' || c > '9') return false;
    r = r * 10 + (c - '0');
  }
  *out = r;
  return true;
}

// Howard Hinnant's days_from_civil (public-domain algorithm).
static inline int64_t days_from_civil(int64_t y, int64_t m, int64_t d) {
  y -= m <= 2;
  const int64_t era = (y >= 0 ? y : y - 399) / 400;
  const int64_t yoe = y - era * 400;
  const int64_t doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
  const int64_t doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
  return era * 146097 + doe - 719468;
}

static inline bool valid_ymd(int64_t y, int64_t m, int64_t d) {
  if (y < 1 || y > 9999 || m < 1 || m > 12 || d < 1) return false;
  static const int dim[12] = {31, 28, 31, 30, 31, 30,
                              31, 31, 30, 31, 30, 31};
  int64_t md = dim[m - 1];
  if (m == 2 && ((y % 4 == 0 && y % 100 != 0) || y % 400 == 0)) md = 29;
  return d <= md;
}

// Parse the date part (YYYY-MM-DD or YYYYMMDD); on success sets *days
// and *pos to the first unconsumed char.
static inline bool parse_iso_date_part(std::string_view v, int64_t* days,
                                       size_t* pos) {
  int64_t y, m, d;
  if (!parse_digits(v, 0, 4, &y)) return false;
  size_t p = 4;
  bool dashes = p < v.size() && v[p] == '-';
  if (dashes) ++p;
  if (!parse_digits(v, p, 2, &m)) return false;
  p += 2;
  if (dashes) {
    if (p >= v.size() || v[p] != '-') return false;
    ++p;
  }
  if (!parse_digits(v, p, 2, &d)) return false;
  p += 2;
  if (!valid_ymd(y, m, d)) return false;
  *days = days_from_civil(y, m, d);
  *pos = p;
  return true;
}

// Parse HH[:MM[:SS[.f{1,6}]]] (or compact HHMM[SS]) plus optional
// Z / +-HH[:MM[:SS]] offset; must consume the whole remainder.
static inline bool parse_iso_time_part(std::string_view v, size_t p,
                                       int64_t* micros_out) {
  int64_t hh = 0, mm = 0, ss = 0, frac = 0, off_sign = 0;
  int64_t off_hh = 0, off_mm = 0, off_ss = 0;
  if (!parse_digits(v, p, 2, &hh)) return false;
  p += 2;
  bool colons = p < v.size() && v[p] == ':';
  if (p < v.size() && v[p] != 'Z' && v[p] != '+' && v[p] != '-') {
    if (colons) ++p;
    if (!parse_digits(v, p, 2, &mm)) return false;
    p += 2;
    if (p < v.size() && ((colons && v[p] == ':') ||
                         (!colons && v[p] >= '0' && v[p] <= '9'))) {
      if (colons) ++p;
      if (!parse_digits(v, p, 2, &ss)) return false;
      p += 2;
      if (p < v.size() && (v[p] == '.' || v[p] == ',')) {
        ++p;
        int nd = 0;
        int64_t f = 0;
        while (p < v.size() && v[p] >= '0' && v[p] <= '9' && nd < 6) {
          f = f * 10 + (v[p] - '0');
          ++p;
          ++nd;
        }
        if (nd == 0) return false;
        // fromisoformat (3.11+) truncates digits beyond microseconds
        while (p < v.size() && v[p] >= '0' && v[p] <= '9') ++p;
        static const int64_t sc[7] = {0, 100000, 10000, 1000, 100, 10, 1};
        frac = f * sc[nd];
      }
    }
  }
  if (p < v.size()) {
    char c = v[p];
    // Uppercase 'Z' only: datetime.fromisoformat (the python fallback)
    // and the reference parser both reject lowercase 'z'.
    if (c == 'Z') {
      ++p;
      off_sign = 1;  // offset 0, but marks "aware"; value is UTC already
    } else if (c == '+' || c == '-') {
      off_sign = (c == '+') ? 1 : -1;
      ++p;
      if (!parse_digits(v, p, 2, &off_hh)) return false;
      p += 2;
      if (p < v.size() && v[p] == ':') {
        ++p;
        if (!parse_digits(v, p, 2, &off_mm)) return false;
        p += 2;
        if (p < v.size() && v[p] == ':') {
          ++p;
          if (!parse_digits(v, p, 2, &off_ss)) return false;
          p += 2;
        }
      } else if (parse_digits(v, p, 2, &off_mm)) {
        p += 2;
      }
      if (off_hh > 23 || off_mm > 59 || off_ss > 59) return false;
    }
  }
  if (p != v.size()) return false;
  if (hh > 23 || mm > 59 || ss > 59) return false;
  // tz offsets are validated but NOT folded: the python path subtracts
  // an epoch carrying the value's own tzinfo, so the offset cancels and
  // the wall-clock time is what lands in the column (_temporal_to_int).
  (void)off_sign;
  *micros_out = ((hh * 60 + mm) * 60 + ss) * 1000000 + frac;
  return true;
}

// Parse fields ids[0..n) as date32 days (strict date-only ISO). Same
// skip/abort contract as csv_parse_int64.
int64_t csv_parse_date32(const uint8_t* pool, const int64_t* offsets,
                         const int64_t* ids, const uint8_t* skip,
                         int64_t n, int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    if (skip && skip[i]) { out[i] = 0; continue; }
    std::string_view v = csv_trim(csv_field(pool, offsets, ids[i]));
    int64_t days;
    size_t p;
    if (!parse_iso_date_part(v, &days, &p) || p != v.size()) return i + 1;
    out[i] = (int32_t)days;
  }
  return 0;
}

// Parse fields ids[0..n) as ISO timestamps -> microseconds since epoch.
// Tz offsets are validated then CANCELLED (wall-clock time is stored),
// matching the python fallback, which subtracts an epoch carrying the
// value's own tzinfo. NOTE: this diverges from the reference
// (value_parsing.h ParseTimestampISO8601 folds [+-]HH:MM into the UTC
// instant); both of this engine's paths agree with each other and the
// divergence is documented in docs/PARITY.md. Separator between date
// and time may be 'T', 't' or ' '.
int64_t csv_parse_ts_micros(const uint8_t* pool, const int64_t* offsets,
                            const int64_t* ids, const uint8_t* skip,
                            int64_t n, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    if (skip && skip[i]) { out[i] = 0; continue; }
    std::string_view v = csv_trim(csv_field(pool, offsets, ids[i]));
    int64_t days;
    size_t p;
    if (!parse_iso_date_part(v, &days, &p)) return i + 1;
    int64_t micros = 0;
    if (p < v.size()) {
      char c = v[p];
      if (c != 'T' && c != 't' && c != ' ') return i + 1;
      if (!parse_iso_time_part(v, p + 1, &micros)) return i + 1;
    }
    out[i] = days * 86400000000LL + micros;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Flat newline-delimited JSON tokenizer (reference: cpp/src/arrow/json/
// parser.cc on rapidjson). Fast path for machine-generated ndjson where
// every record is a flat object with the SAME keys in the SAME order;
// anything else reports !ok and the caller falls back to the python
// parser. Values land unescaped in a flat pool with a kind byte each:
//   0=null 1=false 2=true 3=number(raw text) 4=string(unescaped)
//   5=nested(raw json text)
// ---------------------------------------------------------------------------

struct JsonParseResult {
  std::vector<int64_t> offsets;     // n_fields + 1
  std::vector<uint8_t> pool;
  std::vector<uint8_t> kinds;
  std::vector<uint8_t> key_bytes;   // first row's keys, concatenated
  std::vector<int32_t> key_offsets; // ncols + 1
  int64_t n_rows = 0;
  int32_t ncols = 0;
  int32_t ok = 0;
};

static inline void json_utf8_append(std::vector<uint8_t>& pool,
                                    uint32_t cp) {
  if (cp < 0x80) {
    pool.push_back((uint8_t)cp);
  } else if (cp < 0x800) {
    pool.push_back((uint8_t)(0xC0 | (cp >> 6)));
    pool.push_back((uint8_t)(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    pool.push_back((uint8_t)(0xE0 | (cp >> 12)));
    pool.push_back((uint8_t)(0x80 | ((cp >> 6) & 0x3F)));
    pool.push_back((uint8_t)(0x80 | (cp & 0x3F)));
  } else {
    pool.push_back((uint8_t)(0xF0 | (cp >> 18)));
    pool.push_back((uint8_t)(0x80 | ((cp >> 12) & 0x3F)));
    pool.push_back((uint8_t)(0x80 | ((cp >> 6) & 0x3F)));
    pool.push_back((uint8_t)(0x80 | (cp & 0x3F)));
  }
}

static inline int json_hex4(const uint8_t* d, int64_t i, int64_t len,
                            uint32_t* out) {
  if (i + 4 > len) return 0;
  uint32_t v = 0;
  for (int k = 0; k < 4; ++k) {
    uint8_t c = d[i + k];
    v <<= 4;
    if (c >= '0' && c <= '9') v |= c - '0';
    else if (c >= 'a' && c <= 'f') v |= c - 'a' + 10;
    else if (c >= 'A' && c <= 'F') v |= c - 'A' + 10;
    else return 0;
  }
  *out = v;
  return 1;
}

// Unescape a JSON string starting at the opening quote; appends bytes
// to pool, returns position past the closing quote or -1.
static int64_t json_string_into(const uint8_t* d, int64_t len, int64_t i,
                                std::vector<uint8_t>& pool) {
  ++i;  // opening quote
  while (i < len) {
    int64_t run = i;
    while (run < len && d[run] != '"' && d[run] != '\\') ++run;
    if (run > i) {
      pool.insert(pool.end(), d + i, d + run);
      i = run;
    }
    if (i >= len) return -1;
    if (d[i] == '"') return i + 1;
    // escape
    ++i;
    if (i >= len) return -1;
    uint8_t e = d[i++];
    switch (e) {
      case '"': pool.push_back('"'); break;
      case '\\': pool.push_back('\\'); break;
      case '/': pool.push_back('/'); break;
      case 'b': pool.push_back('\b'); break;
      case 'f': pool.push_back('\f'); break;
      case 'n': pool.push_back('\n'); break;
      case 'r': pool.push_back('\r'); break;
      case 't': pool.push_back('\t'); break;
      case 'u': {
        uint32_t cp;
        if (!json_hex4(d, i, len, &cp)) return -1;
        i += 4;
        if (cp >= 0xD800 && cp <= 0xDBFF && i + 6 <= len &&
            d[i] == '\\' && d[i + 1] == 'u') {
          uint32_t lo;
          if (!json_hex4(d, i + 2, len, &lo)) return -1;
          if (lo >= 0xDC00 && lo <= 0xDFFF) {
            cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
            i += 6;
          }
        }
        json_utf8_append(pool, cp);
        break;
      }
      default:
        return -1;
    }
  }
  return -1;
}

// Skip over a string (no unescape); returns pos past closing quote or -1.
static int64_t json_skip_string(const uint8_t* d, int64_t len,
                                int64_t i) {
  ++i;
  while (i < len) {
    if (d[i] == '\\') { i += 2; continue; }
    if (d[i] == '"') return i + 1;
    ++i;
  }
  return -1;
}

void* json_parse_flat(const uint8_t* d, int64_t len) {
  auto* res = new JsonParseResult();
  res->offsets.reserve((size_t)(len / 16 + 16));
  res->pool.reserve((size_t)len);
  res->offsets.push_back(0);
  res->key_offsets.push_back(0);
  auto fail = [&]() -> void* { res->ok = 0; return res; };
  int64_t i = 0;
  auto skip_ws = [&]() {
    while (i < len && (d[i] == ' ' || d[i] == '\t' || d[i] == '\r' ||
                       d[i] == '\n')) ++i;
  };
  std::vector<std::pair<int32_t, int32_t>> first_keys;  // span into key_bytes
  while (true) {
    skip_ws();
    if (i >= len) break;
    if (d[i] != '{') return fail();
    ++i;
    int32_t col = 0;
    skip_ws();
    if (i < len && d[i] == '}') {  // empty object row
      if (res->n_rows == 0) res->ncols = 0;
      if (res->ncols != 0) return fail();
      ++i;
      ++res->n_rows;
      continue;
    }
    while (true) {
      skip_ws();
      if (i >= len || d[i] != '"') return fail();
      // key: raw span (escaped keys -> fallback)
      int64_t kstart = i + 1;
      int64_t kend = kstart;
      while (kend < len && d[kend] != '"' && d[kend] != '\\') ++kend;
      if (kend >= len || d[kend] == '\\') return fail();
      if (res->n_rows == 0) {
        int32_t off = (int32_t)res->key_bytes.size();
        res->key_bytes.insert(res->key_bytes.end(), d + kstart, d + kend);
        res->key_offsets.push_back((int32_t)res->key_bytes.size());
        first_keys.emplace_back(off, (int32_t)(kend - kstart));
      } else {
        if (col >= res->ncols) return fail();
        auto [koff, klen] = first_keys[col];
        if (klen != (int32_t)(kend - kstart) ||
            std::memcmp(res->key_bytes.data() + koff, d + kstart,
                        (size_t)klen) != 0)
          return fail();
      }
      i = kend + 1;
      skip_ws();
      if (i >= len || d[i] != ':') return fail();
      ++i;
      skip_ws();
      if (i >= len) return fail();
      uint8_t c = d[i];
      if (c == '"') {
        i = json_string_into(d, len, i, res->pool);
        if (i < 0) return fail();
        res->kinds.push_back(4);
      } else if (c == 't') {
        if (i + 4 > len || std::memcmp(d + i, "true", 4)) return fail();
        i += 4;
        res->kinds.push_back(2);
      } else if (c == 'f') {
        if (i + 5 > len || std::memcmp(d + i, "false", 5)) return fail();
        i += 5;
        res->kinds.push_back(1);
      } else if (c == 'n') {
        if (i + 4 > len || std::memcmp(d + i, "null", 4)) return fail();
        i += 4;
        res->kinds.push_back(0);
      } else if (c == '-' || (c >= '0' && c <= '9')) {
        int64_t start = i;
        while (i < len) {
          uint8_t nc = d[i];
          if ((nc >= '0' && nc <= '9') || nc == '-' || nc == '+' ||
              nc == '.' || nc == 'e' || nc == 'E') { ++i; continue; }
          break;
        }
        res->pool.insert(res->pool.end(), d + start, d + i);
        res->kinds.push_back(3);
      } else if (c == '{' || c == '[') {
        int64_t start = i;
        int depth = 0;
        while (i < len) {
          uint8_t nc = d[i];
          if (nc == '"') {
            i = json_skip_string(d, len, i);
            if (i < 0) return fail();
            continue;
          }
          if (nc == '{' || nc == '[') ++depth;
          else if (nc == '}' || nc == ']') {
            --depth;
            if (depth == 0) { ++i; break; }
          }
          ++i;
        }
        if (depth != 0) return fail();
        res->pool.insert(res->pool.end(), d + start, d + i);
        res->kinds.push_back(5);
      } else {
        return fail();
      }
      res->offsets.push_back((int64_t)res->pool.size());
      ++col;
      skip_ws();
      if (i >= len) return fail();
      if (d[i] == ',') { ++i; continue; }
      if (d[i] == '}') { ++i; break; }
      return fail();
    }
    if (res->n_rows == 0) {
      res->ncols = col;
    } else if (col != res->ncols) {
      return fail();
    }
    ++res->n_rows;
  }
  res->ok = 1;
  return res;
}

void json_parse_sizes(void* handle, int32_t* ok, int64_t* n_rows,
                      int32_t* ncols, int64_t* pool_bytes,
                      int64_t* key_bytes) {
  auto* res = static_cast<JsonParseResult*>(handle);
  *ok = res->ok;
  *n_rows = res->n_rows;
  *ncols = res->ncols;
  *pool_bytes = (int64_t)res->pool.size();
  *key_bytes = (int64_t)res->key_bytes.size();
}

void json_parse_fill(void* handle, int64_t* offsets, uint8_t* pool,
                     uint8_t* kinds, uint8_t* key_bytes,
                     int32_t* key_offsets) {
  auto* res = static_cast<JsonParseResult*>(handle);
  std::memcpy(offsets, res->offsets.data(),
              res->offsets.size() * sizeof(int64_t));
  if (!res->pool.empty())
    std::memcpy(pool, res->pool.data(), res->pool.size());
  if (!res->kinds.empty())
    std::memcpy(kinds, res->kinds.data(), res->kinds.size());
  if (!res->key_bytes.empty())
    std::memcpy(key_bytes, res->key_bytes.data(), res->key_bytes.size());
  std::memcpy(key_offsets, res->key_offsets.data(),
              res->key_offsets.size() * sizeof(int32_t));
}

void json_parse_free(void* handle) {
  delete static_cast<JsonParseResult*>(handle);
}

// ---------------------------------------------------------------------------
// Parquet BYTE_ARRAY plain codec + binary min/max (reference:
// parquet/encoding.cc PlainEncoder/PlainDecoder<ByteArrayType>,
// parquet/statistics.cc TypedStatsImpl<ByteArrayType>).
// ---------------------------------------------------------------------------

// Decode n length-prefixed byte arrays: fills offsets[n+1] and compact
// `out` (caller sizes it as len - 4*n). Returns bytes written to out,
// or -1 on overrun.
int64_t plain_decode_byte_array(const uint8_t* data, int64_t len,
                                int64_t n, int64_t* offsets,
                                uint8_t* out) {
  int64_t pos = 0, op = 0;
  offsets[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (pos + 4 > len) return -1;
    uint32_t ln;
    std::memcpy(&ln, data + pos, 4);
    pos += 4;
    if (pos + (int64_t)ln > len) return -1;
    std::memcpy(out + op, data + pos, ln);
    pos += ln;
    op += ln;
    offsets[i + 1] = op;
  }
  return op;
}

// Encode values marked present as length-prefixed byte arrays; out must
// hold sum(present lens) + 4 * n_present. Returns bytes written.
int64_t plain_encode_byte_array(const uint8_t* pool,
                                const int64_t* offsets,
                                const uint8_t* present, int64_t n,
                                uint8_t* out) {
  int64_t op = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (present && !present[i]) continue;
    uint32_t ln = (uint32_t)(offsets[i + 1] - offsets[i]);
    std::memcpy(out + op, &ln, 4);
    op += 4;
    std::memcpy(out + op, pool + offsets[i], ln);
    op += ln;
  }
  return op;
}

// Lexicographic (unsigned byte) min/max over valid var-length values.
// Writes value indices to out_idx[2]; returns number of valid values.
int64_t minmax_binary(const uint8_t* pool, const int64_t* offsets,
                      const uint8_t* valid, int64_t n,
                      int64_t* out_idx) {
  int64_t mn = -1, mx = -1, count = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (valid && !valid[i]) continue;
    ++count;
    if (mn < 0) { mn = mx = i; continue; }
    std::string_view v(reinterpret_cast<const char*>(pool) + offsets[i],
                       (size_t)(offsets[i + 1] - offsets[i]));
    std::string_view lo(reinterpret_cast<const char*>(pool) + offsets[mn],
                        (size_t)(offsets[mn + 1] - offsets[mn]));
    std::string_view hi(reinterpret_cast<const char*>(pool) + offsets[mx],
                        (size_t)(offsets[mx + 1] - offsets[mx]));
    if (v < lo) mn = i;
    if (v > hi) mx = i;
  }
  out_idx[0] = mn;
  out_idx[1] = mx;
  return count;
}


// Format float64/int64 values as shortest-round-trip decimal strings
// (std::to_chars, the csv/writer.cc equivalent of the reference's
// float formatting). Output: concatenated bytes in `pool` with
// `offsets[n+1]` (offsets[0]=0); invalid rows emit empty cells.
// Returns total bytes written (pool must have >= n*32 capacity).
// Python-repr compatibility: to_chars produces "1e-07"/"1.5e+20"
// style exponents WITHOUT the '+'/zero padding python uses, so the
// python wrapper post-normalizes exponent spelling on the (rare)
// cells containing 'e'.
int64_t csv_format_f64(const double* vals, const uint8_t* valid,
                       int64_t n, uint8_t* pool, int64_t* offsets) {
  char* out = reinterpret_cast<char*>(pool);
  int64_t pos = 0;
  offsets[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!valid || valid[i]) {
      double v = vals[i];
      if (std::isnan(v)) {
        std::memcpy(out + pos, "nan", 3);
        pos += 3;
      } else if (std::isinf(v)) {
        if (v < 0) { std::memcpy(out + pos, "-inf", 4); pos += 4; }
        else { std::memcpy(out + pos, "inf", 3); pos += 3; }
      } else {
        char* tok = out + pos;
        auto res = std::to_chars(tok, tok + 32, v);
        pos = res.ptr - out;
        // python-repr normalization: to_chars picks scientific
        // whenever shorter ("1e-04", "1e+15"); python repr keeps
        // fixed for -4 <= exponent < 16 — rewrite those in place
        char* epos = nullptr;
        for (char* c = tok; c < out + pos; ++c) {
          if (*c == 'e') { epos = c; break; }
        }
        if (epos) {
          int exp = atoi(epos + 1);
          if (exp >= -4 && exp < 16) {
            auto fres = std::to_chars(tok, tok + 32, v,
                                      std::chars_format::fixed);
            pos = fres.ptr - out;
            epos = nullptr;  // now fixed: fall through to '.' check
          }
        }
        if (!epos && std::fabs(v) >= 1e16) {
          // python switches to scientific at 1e16 even when fixed is
          // shorter ("843053430426600064" -> "8.430534304266001e+17")
          auto sres = std::to_chars(tok, tok + 32, v,
                                    std::chars_format::scientific);
          pos = sres.ptr - out;
        } else if (!epos) {
          bool plain = true;
          for (char* c = tok; c < out + pos; ++c) {
            if (*c == '.' || *c == 'e' || *c == 'n' || *c == 'i') {
              plain = false;
              break;
            }
          }
          if (plain) {
            out[pos++] = '.';
            out[pos++] = '0';
          }
        }
      }
    }
    offsets[i + 1] = pos;
  }
  return pos;
}

int64_t csv_format_i64(const int64_t* vals, const uint8_t* valid,
                       int64_t n, uint8_t* pool, int64_t* offsets) {
  char* out = reinterpret_cast<char*>(pool);
  int64_t pos = 0;
  offsets[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!valid || valid[i]) {
      auto res = std::to_chars(out + pos, out + pos + 24, vals[i]);
      pos = res.ptr - out;
    }
    offsets[i + 1] = pos;
  }
  return pos;
}

// QUOTE_MINIMAL pass over a (pool, i32 offsets) string column: cells
// containing the delimiter, quotes, or newlines are wrapped with
// embedded quotes doubled; invalid cells emit empty. out_pool must
// hold 2*len(pool) + 2n bytes (csv/writer.cc quoting analogue).
int64_t csv_quote_cells(const uint8_t* pool, const int32_t* offsets,
                        const uint8_t* valid, int64_t n, uint8_t delim,
                        uint8_t* out_pool, int64_t* out_offsets) {
  int64_t pos = 0;
  out_offsets[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!valid || valid[i]) {
      int32_t a = offsets[i], b = offsets[i + 1];
      bool needs = false;
      for (int32_t j = a; j < b; ++j) {
        uint8_t c = pool[j];
        if (c == delim || c == '"' || c == '\n' || c == '\r') {
          needs = true;
          break;
        }
      }
      if (!needs) {
        std::memcpy(out_pool + pos, pool + a, b - a);
        pos += b - a;
      } else {
        out_pool[pos++] = '"';
        for (int32_t j = a; j < b; ++j) {
          uint8_t c = pool[j];
          out_pool[pos++] = c;
          if (c == '"') out_pool[pos++] = '"';
        }
        out_pool[pos++] = '"';
      }
    }
    out_offsets[i + 1] = pos;
  }
  return pos;
}

// Row-major interleave of pre-formatted column cell pools into one CSV
// body: cells joined by delim, rows terminated with \r\n. Returns
// bytes written (csv/writer.cc's final assembly, minus its buffering).
int64_t csv_interleave(int64_t ncols, const int64_t* const* offsets,
                       const uint8_t* const* pools, int64_t n,
                       uint8_t delim, uint8_t* out) {
  int64_t pos = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t c = 0; c < ncols; ++c) {
      if (c) out[pos++] = delim;
      int64_t a = offsets[c][i], b = offsets[c][i + 1];
      std::memcpy(out + pos, pools[c] + a, b - a);
      pos += b - a;
    }
    out[pos++] = '\r';
    out[pos++] = '\n';
  }
  return pos;
}


// ---------------------------------------------------------------------------
// ORC RLEv2 encode (SHORT_REPEAT runs + DIRECT literals — the same
// always-decodable subset as the python encoder in io/orc.py, emitted
// byte-identically). out must hold 9*n + 2*(n/512+2) bytes.
// ---------------------------------------------------------------------------

static const int kOrcWidthEnc[32] = {
  1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21,22,23,24,
  26,28,30,32,40,48,56,64};

int64_t orc_rlev2_encode(const int64_t* vals, int64_t n,
                         int32_t is_signed, uint8_t* out) {
  if (n == 0) return 0;
  std::vector<uint64_t> u(static_cast<size_t>(n));
  if (is_signed) {
    for (int64_t i = 0; i < n; ++i) {
      int64_t v = vals[i];
      u[i] = (static_cast<uint64_t>(v) << 1) ^
             static_cast<uint64_t>(v >> 63);
    }
  } else {
    for (int64_t i = 0; i < n; ++i) u[i] = static_cast<uint64_t>(vals[i]);
  }
  uint8_t* p = out;

  auto emit_direct = [&](int64_t lo, int64_t hi) {
    for (int64_t c0 = lo; c0 < hi; c0 += 512) {
      int64_t cnt = std::min<int64_t>(512, hi - c0);
      uint64_t mx = 0;
      for (int64_t k = 0; k < cnt; ++k) mx |= u[c0 + k];
      int width = mx ? 64 - __builtin_clzll(mx) : 1;
      int wc = 0;
      while (kOrcWidthEnc[wc] < width) ++wc;
      int cw = kOrcWidthEnc[wc];
      *p++ = static_cast<uint8_t>((1 << 6) | (wc << 1) |
                                  ((cnt - 1) >> 8));
      *p++ = static_cast<uint8_t>((cnt - 1) & 0xFF);
      int nb = 0;
      uint8_t cur = 0;
      for (int64_t k = 0; k < cnt; ++k) {
        uint64_t v = u[c0 + k];
        int rem = cw;
        while (rem > 0) {
          int take = rem < 8 - nb ? rem : 8 - nb;
          uint64_t bits = (v >> (rem - take)) &
                          ((1ull << take) - 1);
          cur = static_cast<uint8_t>((cur << take) | bits);
          nb += take;
          rem -= take;
          if (nb == 8) {
            *p++ = cur;
            cur = 0;
            nb = 0;
          }
        }
      }
      if (nb) *p++ = static_cast<uint8_t>(cur << (8 - nb));
    }
  };

  int64_t i = 0;
  while (i < n) {
    int64_t run = 1;
    while (i + run < n && u[i + run] == u[i]) ++run;
    if (run >= 3) {
      uint64_t v = u[i];
      int width = v ? 64 - __builtin_clzll(v) : 0;
      int nbytes = v ? (width + 7) / 8 : 1;
      int64_t left = run;
      while (left >= 3) {
        int take = static_cast<int>(std::min<int64_t>(left, 10));
        *p++ = static_cast<uint8_t>(((nbytes - 1) << 3) | (take - 3));
        for (int b = nbytes - 1; b >= 0; --b)
          *p++ = static_cast<uint8_t>(v >> (8 * b));
        left -= take;
      }
      if (left) emit_direct(i + run - left, i + run);
      i += run;
    } else {
      int64_t lo = i;
      while (i < n) {
        int64_t r2 = 1;
        while (i + r2 < n && u[i + r2] == u[i]) ++r2;
        if (r2 >= 3) break;
        i += r2;
      }
      emit_direct(lo, i);
    }
  }
  return p - out;
}

// ---------------------------------------------------------------------------
// ORC RLEv2 decode (SHORT_REPEAT / DIRECT / PATCHED_BASE / DELTA) —
// liborc RleDecoderV2 analogue. MSB-first bit packing, big-endian
// bases, zigzag for signed. Returns bytes consumed or -1 on overrun.
// ---------------------------------------------------------------------------

static const int kOrcWidth[32] = {
  1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21,22,23,24,
  26,28,30,32,40,48,56,64};

// liborc getClosestFixedBits: round a bit width up to the nearest
// encodable fixed width (PATCHED_BASE patch entries are packed at
// this rounded width, not at pgw+pwidth).
static inline int orc_closest_fixed_bits(int w) {
  for (int i = 0; i < 32; ++i)
    if (kOrcWidth[i] >= w) return kOrcWidth[i];
  return 64;
}

static inline int64_t orc_varint(const uint8_t* d, int64_t len,
                                 int64_t& pos, bool* ok) {
  uint64_t v = 0; int shift = 0;
  while (true) {
    if (pos >= len) { *ok = false; return 0; }
    uint8_t b = d[pos++];
    v |= (uint64_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) return (int64_t)v;
    shift += 7;
  }
}

// read `count` MSB-first bit-packed values of `width` bits.
// Byte-aligned widths take whole-byte loads; odd widths run a 64-bit
// bit-buffer extracting `width` bits per value (the previous
// bit-at-a-time loop was the ORC read hot spot — 3x liborc).
static inline bool orc_read_bits(const uint8_t* d, int64_t len,
                                 int64_t& pos, int64_t count, int width,
                                 uint64_t* out) {
  int64_t nbytes = (count * width + 7) / 8;
  if (pos + nbytes > len) return false;
  const uint8_t* src = d + pos;
  if ((width & 7) == 0) {
    int nb = width >> 3;
    for (int64_t i = 0; i < count; ++i) {
      const uint8_t* p = src + i * nb;
      uint64_t v = 0;
      for (int b = 0; b < nb; ++b) v = (v << 8) | p[b];
      out[i] = v;
    }
  } else {
    // every non-byte-aligned encodable width is <= 30 bits, so the
    // 64-bit buffer never overflows (kOrcWidth)
    uint64_t buf = 0;
    int bits = 0;
    int64_t bytep = 0;
    uint64_t mask = (1ULL << width) - 1;
    for (int64_t i = 0; i < count; ++i) {
      while (bits < width) {
        buf = (buf << 8) | src[bytep++];
        bits += 8;
      }
      out[i] = (buf >> (bits - width)) & mask;
      bits -= width;
    }
  }
  pos += nbytes;
  return true;
}

int64_t orc_rlev2_decode(const uint8_t* data, int64_t len, int64_t n,
                         int32_t signed_vals, int64_t* out) {
  int64_t pos = 0, filled = 0;
  std::vector<uint64_t> tmp;
  while (filled < n) {
    if (pos >= len) return -1;
    uint8_t h = data[pos++];
    int enc = h >> 6;
    if (enc == 0) {                         // SHORT_REPEAT
      int width = ((h >> 3) & 0x7) + 1;
      int count = (h & 0x7) + 3;
      if (pos + width > len || filled + count > n) return -1;
      uint64_t v = 0;
      for (int b = 0; b < width; ++b) v = (v << 8) | data[pos + b];
      pos += width;
      int64_t sv = (int64_t)v;
      if (signed_vals) sv = (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
      for (int i = 0; i < count; ++i) out[filled + i] = sv;
      filled += count;
    } else if (enc == 1) {                  // DIRECT
      int width = kOrcWidth[(h >> 1) & 0x1F];
      if (pos >= len) return -1;
      int count = (((h & 1) << 8) | data[pos++]) + 1;
      if (filled + count > n) return -1;
      tmp.resize(count);
      if (!orc_read_bits(data, len, pos, count, width, tmp.data()))
        return -1;
      for (int i = 0; i < count; ++i) {
        uint64_t v = tmp[i];
        out[filled + i] = signed_vals
            ? ((int64_t)(v >> 1) ^ -(int64_t)(v & 1))
            : (int64_t)v;
      }
      filled += count;
    } else if (enc == 3) {                  // DELTA
      int width_code = (h >> 1) & 0x1F;
      if (pos >= len) return -1;
      int count = (((h & 1) << 8) | data[pos++]) + 1;
      if (filled + count > n) return -1;
      bool ok = true;
      int64_t base = orc_varint(data, len, pos, &ok);
      if (!ok) return -1;
      if (signed_vals) base = (int64_t)((uint64_t)base >> 1) ^
                              -(int64_t)(base & 1);
      int64_t d0 = orc_varint(data, len, pos, &ok);
      if (!ok) return -1;
      d0 = (int64_t)((uint64_t)d0 >> 1) ^ -(int64_t)(d0 & 1);
      out[filled] = base;
      if (count > 1) out[filled + 1] = base + d0;
      if (count > 2) {
        if (width_code == 0) {
          for (int i = 2; i < count; ++i)
            out[filled + i] = out[filled + i - 1] + d0;
        } else {
          int width = kOrcWidth[width_code];
          tmp.resize(count - 2);
          if (!orc_read_bits(data, len, pos, count - 2, width,
                             tmp.data()))
            return -1;
          int64_t sign = d0 >= 0 ? 1 : -1;
          for (int i = 0; i < count - 2; ++i)
            out[filled + 2 + i] = out[filled + 1 + i] +
                sign * (int64_t)tmp[i];
        }
      }
      filled += count;
    } else {                                // PATCHED_BASE
      int width = kOrcWidth[(h >> 1) & 0x1F];
      if (pos + 2 >= len) return -1;
      int count = (((h & 1) << 8) | data[pos]) + 1;
      uint8_t b3 = data[pos + 1];
      uint8_t b4 = data[pos + 2];
      pos += 3;
      int bw = ((b3 >> 5) & 0x7) + 1;
      int pwidth = kOrcWidth[b3 & 0x1F];
      int pgw = ((b4 >> 5) & 0x7) + 1;
      int plen = b4 & 0x1F;
      if (pos + bw > len || filled + count > n) return -1;
      uint64_t braw = 0;
      for (int b = 0; b < bw; ++b) braw = (braw << 8) | data[pos + b];
      pos += bw;
      int64_t base;
      uint64_t sign_bit = 1ULL << (bw * 8 - 1);
      if (braw & sign_bit) base = -(int64_t)(braw & (sign_bit - 1));
      else base = (int64_t)braw;
      tmp.resize(count);
      if (!orc_read_bits(data, len, pos, count, width, tmp.data()))
        return -1;
      if (plen) {
        int ew = orc_closest_fixed_bits(pgw + pwidth);
        std::vector<uint64_t> entries(plen);
        if (!orc_read_bits(data, len, pos, plen, ew, entries.data()))
          return -1;
        int64_t p = 0;
        for (int i = 0; i < plen; ++i) {
          int64_t gap = (int64_t)(entries[i] >> pwidth);
          uint64_t patch = entries[i] &
              ((pwidth >= 64) ? ~0ULL : ((1ULL << pwidth) - 1));
          p += gap;
          if (p >= count) return -1;
          tmp[p] |= patch << width;
        }
      }
      for (int i = 0; i < count; ++i)
        out[filled + i] = base + (int64_t)tmp[i];
      filled += count;
    }
  }
  return pos;
}

}  // extern "C"

// --- Parquet flat-column page walking --------------------------------
// Batch analogue of the reference's SerializedPageReader +
// ColumnReader inner loop (parquet/column_reader.cc): ONE call parses
// every page header (thrift compact protocol), decompresses page
// bodies, decodes definition levels to a validity byte array and
// copies/decodes values — the per-page Python round trips (header
// parse, decompress, RLE decode, numpy glue) were ~80% of a 1M-row
// read. Flat (max_rep == 0) fixed-width columns; the Python reader
// keeps the general path for everything else.

namespace pq {

struct TC {
  const uint8_t* d;
  int64_t len, pos;
  bool ok;
};

static uint64_t tc_varint(TC& r) {
  uint64_t v = 0;
  int shift = 0;
  while (r.pos < r.len && shift < 64) {
    uint8_t b = r.d[r.pos++];
    v |= (uint64_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) return v;
    shift += 7;
  }
  r.ok = false;
  return 0;
}

static int64_t tc_zigzag(TC& r) {
  uint64_t u = tc_varint(r);
  return (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
}

static void tc_skip(TC& r, int type);

static void tc_skip_struct(TC& r) {
  while (r.ok) {
    if (r.pos >= r.len) { r.ok = false; return; }
    uint8_t fh = r.d[r.pos++];
    if (fh == 0) return;  // STOP
    int type = fh & 0x0F;
    if ((fh >> 4) == 0) tc_zigzag(r);  // long-form field id
    tc_skip(r, type);
  }
}

static void tc_skip(TC& r, int type) {
  switch (type) {
    case 1: case 2: return;                    // bool true/false
    case 3: r.pos += 1; return;                // byte
    case 4: case 5: case 6: tc_varint(r); return;  // i16/i32/i64
    case 7: r.pos += 8; return;                // double
    case 8: {                                  // binary
      uint64_t n = tc_varint(r);
      r.pos += (int64_t)n;
      return;
    }
    case 9: case 10: {                         // list/set
      if (r.pos >= r.len) { r.ok = false; return; }
      uint8_t h = r.d[r.pos++];
      int64_t n = h >> 4;
      int et = h & 0x0F;
      if (n == 15) n = (int64_t)tc_varint(r);
      for (int64_t i = 0; i < n && r.ok; i++) tc_skip(r, et);
      return;
    }
    case 11: {                                 // map
      uint64_t n = tc_varint(r);
      if (n == 0) return;
      if (r.pos >= r.len) { r.ok = false; return; }
      uint8_t kv = r.d[r.pos++];
      for (uint64_t i = 0; i < n && r.ok; i++) {
        tc_skip(r, kv >> 4);
        tc_skip(r, kv & 0x0F);
      }
      return;
    }
    case 12: tc_skip_struct(r); return;        // struct
    default: r.ok = false; return;
  }
}

struct Page {
  int64_t ptype = -1, uncomp = 0, comp = 0;
  int64_t nvals = 0, enc = -1, nnulls = 0;
  int64_t dl_len = 0, rl_len = 0, v2_comp = 1;
};

// parse one sub-struct whose interesting fields are all varint/bool,
// dispatching by field id through `slot` (ids 1..8 -> pointers, null
// to skip)
static void tc_parse_flat_struct(TC& r, int64_t** slot, int n_slots) {
  int64_t fid = 0;  // field ids are delta-encoded per struct
  while (r.ok) {
    if (r.pos >= r.len) { r.ok = false; return; }
    uint8_t fh = r.d[r.pos++];
    if (fh == 0) return;
    int type = fh & 0x0F;
    int delta = fh >> 4;
    if (delta == 0) fid = tc_zigzag(r); else fid += delta;
    int64_t* dst = (fid >= 1 && fid <= n_slots) ? slot[fid - 1] : nullptr;
    if (dst && (type >= 4 && type <= 6)) {
      *dst = tc_zigzag(r);
    } else if (dst && (type == 1 || type == 2)) {
      *dst = (type == 1) ? 1 : 0;
    } else {
      tc_skip(r, type);
    }
  }
}

static bool parse_page_header(TC& r, Page& p) {
  int64_t fid = 0;
  while (r.ok) {
    if (r.pos >= r.len) return false;
    uint8_t fh = r.d[r.pos++];
    if (fh == 0) break;  // STOP
    int type = fh & 0x0F;
    int delta = fh >> 4;
    if (delta == 0) fid = tc_zigzag(r); else fid += delta;
    if (fid == 1 && type >= 4 && type <= 6) {
      p.ptype = tc_zigzag(r);
    } else if (fid == 2 && type >= 4 && type <= 6) {
      p.uncomp = tc_zigzag(r);
    } else if (fid == 3 && type >= 4 && type <= 6) {
      p.comp = tc_zigzag(r);
    } else if (fid == 5 && type == 12) {       // DataPageHeader
      int64_t* slots[4] = {&p.nvals, &p.enc, nullptr, nullptr};
      tc_parse_flat_struct(r, slots, 4);
    } else if (fid == 7 && type == 12) {       // DictionaryPageHeader
      int64_t* slots[2] = {&p.nvals, &p.enc};
      tc_parse_flat_struct(r, slots, 2);
    } else if (fid == 8 && type == 12) {       // DataPageHeaderV2
      int64_t* slots[7] = {&p.nvals, &p.nnulls, nullptr, &p.enc,
                           &p.dl_len, &p.rl_len, &p.v2_comp};
      tc_parse_flat_struct(r, slots, 7);
    } else {
      tc_skip(r, type);
    }
  }
  return r.ok;
}

}  // namespace pq

extern "C" {

// tab: [max_pages][10] int64 — per page:
//   0 ptype, 1 payload_off, 2 comp_len, 3 uncomp_len, 4 nvals,
//   5 enc, 6 nnulls, 7 dl_len, 8 rl_len, 9 v2_values_compressed
// Returns page count, or -1 malformed / truncated.
int64_t pq_scan_pages(const uint8_t* blob, int64_t len,
                      int64_t expect_values, int64_t max_pages,
                      int64_t* tab) {
  pq::TC r{blob, len, 0, true};
  int64_t npages = 0, consumed = 0;
  while (consumed < expect_values && npages < max_pages) {
    pq::Page p;
    if (r.pos >= r.len) return -1;
    if (!pq::parse_page_header(r, p) || !r.ok) return -1;
    if (r.pos + p.comp > len) return -1;
    int64_t* row = tab + npages * 10;
    row[0] = p.ptype;
    row[1] = r.pos;
    row[2] = p.comp;
    row[3] = p.uncomp;
    row[4] = p.nvals;
    row[5] = p.enc;
    row[6] = p.nnulls;
    row[7] = p.dl_len;
    row[8] = p.rl_len;
    row[9] = p.v2_comp;
    r.pos += p.comp;
    if (p.ptype == 0 || p.ptype == 3)  // DATA_PAGE / DATA_PAGE_V2
      consumed += p.nvals;
    npages++;
  }
  return consumed >= expect_values ? npages : -1;
}

// Decode a flat fixed-width column chunk scanned by pq_scan_pages.
// codec: 0 none, 1 snappy. out_validity: one byte per value (1 =
// present); page_kind: 0 dict/skip, 1 plain, 2 dict-index;
// totals[5]: {values_done, n_present, plain_bytes, idx_count,
// dict_bytes}. Returns 0, or negative error (-2 malformed, -3
// unsupported encoding, -4 capacity).
int64_t pq_decode_flat(const uint8_t* blob, int64_t len,
                       const int64_t* tab, int64_t n_pages,
                       int32_t codec, int32_t max_def, int32_t def_bw,
                       int32_t byte_width,
                       uint8_t* out_validity, int64_t validity_cap,
                       uint8_t* out_plain, int64_t plain_cap,
                       int64_t* out_idx, int64_t idx_cap,
                       uint8_t* out_dict, int64_t dict_cap,
                       int64_t* page_kind, int64_t* page_npresent,
                       int64_t* totals) {
  std::vector<uint8_t> scratch;
  std::vector<int64_t> lvl;
  int64_t vpos = 0, ppos = 0, ipos = 0, dbytes = 0, npresent_all = 0;
  for (int64_t pi = 0; pi < n_pages; pi++) {
    const int64_t* row = tab + pi * 10;
    int64_t ptype = row[0], off = row[1], comp = row[2],
            uncomp = row[3], nvals = row[4], enc = row[5],
            dl_len = row[7], rl_len = row[8], v2c = row[9];
    page_kind[pi] = 0;
    page_npresent[pi] = 0;
    if (off + comp > len) return -2;
    if (ptype == 2) {                         // DICTIONARY_PAGE
      if (enc != 0 && enc != 2) return -3;    // PLAIN[_DICTIONARY]
      if (uncomp > dict_cap) return -4;
      if (codec == 0) {
        if (comp > dict_cap) return -4;
        std::memcpy(out_dict, blob + off, comp);
        dbytes = comp;
      } else {
        int64_t n = snappy_decompress(blob + off, comp, out_dict,
                                      dict_cap);
        if (n < 0) return -2;
        dbytes = n;
      }
      continue;
    }
    if (ptype != 0 && ptype != 3) continue;   // index pages etc.
    const uint8_t* body;
    int64_t body_len;
    const uint8_t* levels = nullptr;
    int64_t levels_len = 0;
    if (ptype == 3) {                         // V2: levels uncompressed
      if (rl_len > 0) return -3;              // flat only
      levels = blob + off;
      levels_len = dl_len;
      const uint8_t* vsrc = blob + off + dl_len + rl_len;
      int64_t vlen = comp - dl_len - rl_len;
      if (vlen < 0) return -2;
      if (codec != 0 && v2c) {
        scratch.resize(uncomp - dl_len - rl_len + 8);
        int64_t n = snappy_decompress(vsrc, vlen, scratch.data(),
                                      (int64_t)scratch.size());
        if (n < 0) return -2;
        body = scratch.data();
        body_len = n;
      } else {
        body = vsrc;
        body_len = vlen;
      }
    } else {                                  // V1: whole payload
      if (codec == 0) {
        body = blob + off;
        body_len = comp;
      } else {
        scratch.resize(uncomp + 8);
        int64_t n = snappy_decompress(blob + off, comp, scratch.data(),
                                      (int64_t)scratch.size());
        if (n < 0) return -2;
        body = scratch.data();
        body_len = n;
      }
      if (max_def > 0) {
        if (body_len < 4) return -2;
        int64_t ll = (int64_t)body[0] | ((int64_t)body[1] << 8) |
                     ((int64_t)body[2] << 16) | ((int64_t)body[3] << 24);
        if (4 + ll > body_len) return -2;
        levels = body + 4;
        levels_len = ll;
        body += 4 + ll;
        body_len -= 4 + ll;
      }
    }
    // definition levels -> validity bytes
    int64_t n_present = nvals;
    if (vpos + nvals > validity_cap) return -4;
    if (max_def > 0 && levels_len > 0) {
      lvl.resize(nvals);
      int64_t used = rle_decode(levels, levels_len, 0, nvals, def_bw,
                                lvl.data());
      if (used < 0) return -2;
      n_present = 0;
      for (int64_t i = 0; i < nvals; i++) {
        uint8_t v = lvl[i] == max_def;
        out_validity[vpos + i] = v;
        n_present += v;
      }
    } else {
      std::memset(out_validity + vpos, 1, nvals);
    }
    vpos += nvals;
    npresent_all += n_present;
    // values
    if (enc == 0) {                           // PLAIN fixed width
      int64_t nb = n_present * (int64_t)byte_width;
      if (nb > body_len || ppos + nb > plain_cap) return -2;
      std::memcpy(out_plain + ppos, body, nb);
      ppos += nb;
      page_kind[pi] = 1;
    } else if (enc == 2 || enc == 8) {        // [PLAIN_/RLE_]DICTIONARY
      if (body_len < 1) return -2;
      int32_t bw = body[0];
      if (ipos + n_present > idx_cap) return -4;
      if (n_present > 0) {
        int64_t used = rle_decode(body + 1, body_len - 1, 0, n_present,
                                  bw, out_idx + ipos);
        if (used < 0) return -2;
      }
      ipos += n_present;
      page_kind[pi] = 2;
    } else {
      return -3;
    }
    page_npresent[pi] = n_present;
  }
  totals[0] = vpos;
  totals[1] = npresent_all;
  totals[2] = ppos;
  totals[3] = ipos;
  totals[4] = dbytes;
  return 0;
}

}  // extern "C"
