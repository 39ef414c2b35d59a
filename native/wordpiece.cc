// Fast WordPiece tokenizer (bert-base-uncased compatible) for batch caption
// encoding on the host data path.
//
// The reference delegates tokenization to HuggingFace's Rust/C++ tokenizers
// inside its pip dependencies; this is the framework's native equivalent,
// exposed through a C ABI and bound from Python via ctypes
// (candidate_reranking_cir_tpu/models/native_tokenizer.py).
//
// Pipeline parity with models/tokenizer.py (the Python reference
// implementation, itself tested against the HF algorithm):
//   clean -> whitespace split -> lowercase -> strip combining accents ->
//   punctuation split -> greedy longest-match WordPiece with "##" pieces.
// Unicode handling: UTF-8 aware; lowercase + accent stripping cover the
// Latin-1 supplement and Latin Extended-A ranges (plenty for the CIRR /
// Fashion-IQ English captions); other code points pass through unchanged,
// general punctuation (U+2000-206F, U+3000-303F) splits. CJK code points
// are isolated as single-character tokens like BERT's basic tokenizer.
//
// Build: make -C native   (produces libwordpiece.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> table;
  int32_t pad_id = 0, unk_id = 100, cls_id = 101, sep_id = 102;
  int32_t enc_id = -1, dec_id = -1;
  int32_t max_chars_per_word = 100;
};

// ---- UTF-8 helpers ---------------------------------------------------------

inline int utf8_len(unsigned char c) {
  if (c < 0x80) return 1;
  if ((c >> 5) == 0x6) return 2;
  if ((c >> 4) == 0xe) return 3;
  if ((c >> 3) == 0x1e) return 4;
  return 1;  // invalid byte: treat as single
}

inline uint32_t utf8_decode(const char* s, int len) {
  const unsigned char* u = reinterpret_cast<const unsigned char*>(s);
  switch (len) {
    case 1: return u[0];
    case 2: return ((u[0] & 0x1f) << 6) | (u[1] & 0x3f);
    case 3: return ((u[0] & 0x0f) << 12) | ((u[1] & 0x3f) << 6) | (u[2] & 0x3f);
    default:
      return ((u[0] & 0x07) << 18) | ((u[1] & 0x3f) << 12) |
             ((u[2] & 0x3f) << 6) | (u[3] & 0x3f);
  }
}

inline void utf8_append(std::string* out, uint32_t cp) {
  if (cp < 0x80) {
    out->push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out->push_back(static_cast<char>(0xc0 | (cp >> 6)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3f)));
  } else if (cp < 0x10000) {
    out->push_back(static_cast<char>(0xe0 | (cp >> 12)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3f)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3f)));
  } else {
    out->push_back(static_cast<char>(0xf0 | (cp >> 18)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3f)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3f)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3f)));
  }
}

inline bool is_whitespace_cp(uint32_t cp) {
  return cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == 0xa0 ||
         (cp >= 0x2000 && cp <= 0x200a) || cp == 0x202f || cp == 0x205f ||
         cp == 0x3000;
}

inline bool is_control_cp(uint32_t cp) {
  if (cp == '\t' || cp == '\n' || cp == '\r') return false;
  return cp < 0x20 || cp == 0x7f || (cp >= 0x80 && cp <= 0x9f) ||
         cp == 0xad /* soft hyphen is Cf */;
}

inline bool is_punct_cp(uint32_t cp) {
  if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126))
    return true;
  // general punctuation, CJK symbols, fullwidth forms (common subsets)
  return (cp >= 0x2010 && cp <= 0x2027) || (cp >= 0x2030 && cp <= 0x205e) ||
         (cp >= 0x3001 && cp <= 0x303f) || (cp >= 0xff01 && cp <= 0xff0f) ||
         (cp >= 0xff1a && cp <= 0xff20) || (cp >= 0xff3b && cp <= 0xff40) ||
         (cp >= 0xff5b && cp <= 0xff65) || cp == 0xab || cp == 0xbb ||
         cp == 0xa1 || cp == 0xbf;
}

inline bool is_cjk_cp(uint32_t cp) {
  return (cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3400 && cp <= 0x4dbf) ||
         (cp >= 0x20000 && cp <= 0x2a6df) || (cp >= 0x2a700 && cp <= 0x2b73f) ||
         (cp >= 0x2b740 && cp <= 0x2b81f) || (cp >= 0x2b820 && cp <= 0x2ceaf) ||
         (cp >= 0xf900 && cp <= 0xfaff) || (cp >= 0x2f800 && cp <= 0x2fa1f);
}

// lowercase + accent-strip, exact parity with Python's
// str.lower() + NFD + drop-Mn for U+00C0..U+017F (table generated from
// unicodedata; code points without decompositions, e.g. ø þ æ ð ß, pass
// through lowercased so unknown-word behavior matches the Python tokenizer).
// Returns 0 to drop the code point (combining marks).
inline uint32_t lower_strip_cp(uint32_t cp) {
  if (cp >= 'A' && cp <= 'Z') return cp + 32;
  if (cp >= 0x300 && cp <= 0x36f) return 0;  // combining diacritics (NFD tail)
  switch (cp) {
    case 0xc0: return 0x61;
    case 0xc1: return 0x61;
    case 0xc2: return 0x61;
    case 0xc3: return 0x61;
    case 0xc4: return 0x61;
    case 0xc5: return 0x61;
    case 0xc6: return 0xe6;
    case 0xc7: return 0x63;
    case 0xc8: return 0x65;
    case 0xc9: return 0x65;
    case 0xca: return 0x65;
    case 0xcb: return 0x65;
    case 0xcc: return 0x69;
    case 0xcd: return 0x69;
    case 0xce: return 0x69;
    case 0xcf: return 0x69;
    case 0xd0: return 0xf0;
    case 0xd1: return 0x6e;
    case 0xd2: return 0x6f;
    case 0xd3: return 0x6f;
    case 0xd4: return 0x6f;
    case 0xd5: return 0x6f;
    case 0xd6: return 0x6f;
    case 0xd7: return 0xd7;
    case 0xd8: return 0xf8;
    case 0xd9: return 0x75;
    case 0xda: return 0x75;
    case 0xdb: return 0x75;
    case 0xdc: return 0x75;
    case 0xdd: return 0x79;
    case 0xde: return 0xfe;
    case 0xdf: return 0xdf;
    case 0xe0: return 0x61;
    case 0xe1: return 0x61;
    case 0xe2: return 0x61;
    case 0xe3: return 0x61;
    case 0xe4: return 0x61;
    case 0xe5: return 0x61;
    case 0xe6: return 0xe6;
    case 0xe7: return 0x63;
    case 0xe8: return 0x65;
    case 0xe9: return 0x65;
    case 0xea: return 0x65;
    case 0xeb: return 0x65;
    case 0xec: return 0x69;
    case 0xed: return 0x69;
    case 0xee: return 0x69;
    case 0xef: return 0x69;
    case 0xf0: return 0xf0;
    case 0xf1: return 0x6e;
    case 0xf2: return 0x6f;
    case 0xf3: return 0x6f;
    case 0xf4: return 0x6f;
    case 0xf5: return 0x6f;
    case 0xf6: return 0x6f;
    case 0xf7: return 0xf7;
    case 0xf8: return 0xf8;
    case 0xf9: return 0x75;
    case 0xfa: return 0x75;
    case 0xfb: return 0x75;
    case 0xfc: return 0x75;
    case 0xfd: return 0x79;
    case 0xfe: return 0xfe;
    case 0xff: return 0x79;
    case 0x100: return 0x61;
    case 0x101: return 0x61;
    case 0x102: return 0x61;
    case 0x103: return 0x61;
    case 0x104: return 0x61;
    case 0x105: return 0x61;
    case 0x106: return 0x63;
    case 0x107: return 0x63;
    case 0x108: return 0x63;
    case 0x109: return 0x63;
    case 0x10a: return 0x63;
    case 0x10b: return 0x63;
    case 0x10c: return 0x63;
    case 0x10d: return 0x63;
    case 0x10e: return 0x64;
    case 0x10f: return 0x64;
    case 0x110: return 0x111;
    case 0x111: return 0x111;
    case 0x112: return 0x65;
    case 0x113: return 0x65;
    case 0x114: return 0x65;
    case 0x115: return 0x65;
    case 0x116: return 0x65;
    case 0x117: return 0x65;
    case 0x118: return 0x65;
    case 0x119: return 0x65;
    case 0x11a: return 0x65;
    case 0x11b: return 0x65;
    case 0x11c: return 0x67;
    case 0x11d: return 0x67;
    case 0x11e: return 0x67;
    case 0x11f: return 0x67;
    case 0x120: return 0x67;
    case 0x121: return 0x67;
    case 0x122: return 0x67;
    case 0x123: return 0x67;
    case 0x124: return 0x68;
    case 0x125: return 0x68;
    case 0x126: return 0x127;
    case 0x127: return 0x127;
    case 0x128: return 0x69;
    case 0x129: return 0x69;
    case 0x12a: return 0x69;
    case 0x12b: return 0x69;
    case 0x12c: return 0x69;
    case 0x12d: return 0x69;
    case 0x12e: return 0x69;
    case 0x12f: return 0x69;
    case 0x130: return 0x69;
    case 0x131: return 0x131;
    case 0x132: return 0x133;
    case 0x133: return 0x133;
    case 0x134: return 0x6a;
    case 0x135: return 0x6a;
    case 0x136: return 0x6b;
    case 0x137: return 0x6b;
    case 0x138: return 0x138;
    case 0x139: return 0x6c;
    case 0x13a: return 0x6c;
    case 0x13b: return 0x6c;
    case 0x13c: return 0x6c;
    case 0x13d: return 0x6c;
    case 0x13e: return 0x6c;
    case 0x13f: return 0x140;
    case 0x140: return 0x140;
    case 0x141: return 0x142;
    case 0x142: return 0x142;
    case 0x143: return 0x6e;
    case 0x144: return 0x6e;
    case 0x145: return 0x6e;
    case 0x146: return 0x6e;
    case 0x147: return 0x6e;
    case 0x148: return 0x6e;
    case 0x149: return 0x149;
    case 0x14a: return 0x14b;
    case 0x14b: return 0x14b;
    case 0x14c: return 0x6f;
    case 0x14d: return 0x6f;
    case 0x14e: return 0x6f;
    case 0x14f: return 0x6f;
    case 0x150: return 0x6f;
    case 0x151: return 0x6f;
    case 0x152: return 0x153;
    case 0x153: return 0x153;
    case 0x154: return 0x72;
    case 0x155: return 0x72;
    case 0x156: return 0x72;
    case 0x157: return 0x72;
    case 0x158: return 0x72;
    case 0x159: return 0x72;
    case 0x15a: return 0x73;
    case 0x15b: return 0x73;
    case 0x15c: return 0x73;
    case 0x15d: return 0x73;
    case 0x15e: return 0x73;
    case 0x15f: return 0x73;
    case 0x160: return 0x73;
    case 0x161: return 0x73;
    case 0x162: return 0x74;
    case 0x163: return 0x74;
    case 0x164: return 0x74;
    case 0x165: return 0x74;
    case 0x166: return 0x167;
    case 0x167: return 0x167;
    case 0x168: return 0x75;
    case 0x169: return 0x75;
    case 0x16a: return 0x75;
    case 0x16b: return 0x75;
    case 0x16c: return 0x75;
    case 0x16d: return 0x75;
    case 0x16e: return 0x75;
    case 0x16f: return 0x75;
    case 0x170: return 0x75;
    case 0x171: return 0x75;
    case 0x172: return 0x75;
    case 0x173: return 0x75;
    case 0x174: return 0x77;
    case 0x175: return 0x77;
    case 0x176: return 0x79;
    case 0x177: return 0x79;
    case 0x178: return 0x79;
    case 0x179: return 0x7a;
    case 0x17a: return 0x7a;
    case 0x17b: return 0x7a;
    case 0x17c: return 0x7a;
    case 0x17d: return 0x7a;
    case 0x17e: return 0x7a;
    case 0x17f: return 0x17f;
    default: return cp;
  }
}

struct Cp {
  uint32_t cp;
};

std::vector<std::string> basic_tokenize(const Vocab& v, const char* text) {
  std::vector<std::string> words;
  std::string current;
  auto flush = [&]() {
    if (!current.empty()) {
      words.push_back(current);
      current.clear();
    }
  };
  size_t n = std::strlen(text);
  for (size_t i = 0; i < n;) {
    int len = utf8_len(static_cast<unsigned char>(text[i]));
    if (i + len > n) len = 1;
    uint32_t cp = utf8_decode(text + i, len);
    i += len;
    if (cp == 0 || cp == 0xfffd || is_control_cp(cp)) continue;
    if (is_whitespace_cp(cp)) {
      flush();
      continue;
    }
    cp = lower_strip_cp(cp);
    if (cp == 0) continue;  // stripped combining mark
    if (is_punct_cp(cp) || is_cjk_cp(cp)) {
      flush();
      std::string one;
      utf8_append(&one, cp);
      words.push_back(one);
      continue;
    }
    utf8_append(&current, cp);
  }
  flush();
  return words;
}

void wordpiece(const Vocab& v, const std::string& word,
               std::vector<int32_t>* out) {
  if (static_cast<int32_t>(word.size()) > v.max_chars_per_word) {
    out->push_back(v.unk_id);
    return;
  }
  std::vector<int32_t> pieces;
  size_t start = 0;
  std::string candidate;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t found = -1;
    while (start < end) {
      candidate.assign(start > 0 ? "##" : "");
      candidate.append(word, start, end - start);
      auto it = v.table.find(candidate);
      if (it != v.table.end()) {
        found = it->second;
        break;
      }
      // step back one UTF-8 code point
      do {
        --end;
      } while (end > start &&
               (static_cast<unsigned char>(word[end]) & 0xc0) == 0x80);
    }
    if (found < 0) {
      out->push_back(v.unk_id);
      return;
    }
    pieces.push_back(found);
    start = end;
  }
  out->insert(out->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

void* wp_load(const char* vocab_path) {
  std::ifstream f(vocab_path);
  if (!f.good()) return nullptr;
  auto* v = new Vocab();
  std::string line;
  int32_t idx = 0;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (!line.empty()) v->table.emplace(line, idx);
    ++idx;
  }
  auto find = [&](const char* t, int32_t dflt) {
    auto it = v->table.find(t);
    return it == v->table.end() ? dflt : it->second;
  };
  v->pad_id = find("[PAD]", 0);
  v->unk_id = find("[UNK]", 100);
  v->cls_id = find("[CLS]", 101);
  v->sep_id = find("[SEP]", 102);
  // BLIP extras appended when absent (blip.py:186-191 contract)
  if (!v->table.count("[DEC]")) v->table.emplace("[DEC]", idx++);
  if (!v->table.count("[ENC]")) v->table.emplace("[ENC]", idx++);
  v->dec_id = v->table["[DEC]"];
  v->enc_id = v->table["[ENC]"];
  return v;
}

void wp_free(void* handle) { delete static_cast<Vocab*>(handle); }

int32_t wp_vocab_size(void* handle) {
  return static_cast<int32_t>(static_cast<Vocab*>(handle)->table.size());
}

int32_t wp_special_id(void* handle, const char* token) {
  auto& v = *static_cast<Vocab*>(handle);
  auto it = v.table.find(token);
  return it == v.table.end() ? -1 : it->second;
}

// Encode a batch: texts[n] -> ids[n * max_len], mask[n * max_len].
// Layout: [CLS] pieces [SEP], pad with pad_id; set_enc_token overwrites
// position 0 with [ENC] (blip_stage1.py:73).
// Returns the number of rows whose wordpiece sequence exceeded max_len - 2
// (i.e. rows that were truncated). stats (nullable, int32[2]) additionally
// receives {n_overflowed, worst_piece_count} so callers can report how large
// the static bucket must be for lossless encoding.
int32_t wp_encode_batch(void* handle, const char** texts, int32_t n,
                        int32_t max_len, int32_t set_enc_token, int32_t* ids,
                        int32_t* mask, int32_t* stats) {
  auto& v = *static_cast<Vocab*>(handle);
  std::vector<int32_t> pieces;
  int32_t n_over = 0, worst = 0;
  for (int32_t i = 0; i < n; ++i) {
    pieces.clear();
    for (const auto& w : basic_tokenize(v, texts[i])) {
      wordpiece(v, w, &pieces);
    }
    if (static_cast<int32_t>(pieces.size()) > max_len - 2) {
      ++n_over;
      worst = std::max(worst, static_cast<int32_t>(pieces.size()));
      pieces.resize(max_len - 2);
    }
    int32_t* row = ids + static_cast<int64_t>(i) * max_len;
    int32_t* mrow = mask + static_cast<int64_t>(i) * max_len;
    int32_t pos = 0;
    row[pos++] = set_enc_token ? v.enc_id : v.cls_id;
    for (int32_t p : pieces) row[pos++] = p;
    row[pos++] = v.sep_id;
    for (int32_t j = 0; j < pos; ++j) mrow[j] = 1;
    for (int32_t j = pos; j < max_len; ++j) {
      row[j] = v.pad_id;
      mrow[j] = 0;
    }
  }
  if (stats) {
    stats[0] = n_over;
    stats[1] = worst;
  }
  return n_over;
}

}  // extern "C"
