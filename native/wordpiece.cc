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

// lowercase + accent-strip for Latin-1 supplement / Latin Extended-A.
// Returns 0 to drop the code point (combining marks).
inline uint32_t lower_strip_cp(uint32_t cp) {
  if (cp >= 'A' && cp <= 'Z') return cp + 32;
  if (cp >= 0x300 && cp <= 0x36f) return 0;  // combining diacritics (NFD tail)
  if (cp >= 0xc0 && cp <= 0xff) {            // Latin-1 letters
    static const char* map =
        "aaaaaa_ceeeeiiii"   // c0-cf (c6 ae, d0 eth -> keep letter-ish)
        "dnooooo_ouuuuy_s"   // d0-df
        "aaaaaa_ceeeeiiii"   // e0-ef
        "dnooooo_ouuuuy_y";  // f0-ff
    char c = map[cp - 0xc0];
    if (c != '_') return static_cast<uint32_t>(c);
    if (cp == 0xc6 || cp == 0xe6) return 0xe6;   // ae ligature kept
    if (cp == 0xd7) return 0xd7;                 // multiplication sign (punct)
    if (cp == 0xd8 || cp == 0xf8) return 0xf8;   // o-slash kept
    if (cp == 0xde || cp == 0xfe) return 0xfe;   // thorn kept
    return cp;
  }
  if (cp >= 0x100 && cp <= 0x17f) {  // Latin Extended-A: base letter table
    static const char base[] =
        "aaaaaacccccccccc" "ddddeeeeeeeeeegg"  // 100-11f
        "gggggghhhhiiiiii" "iiiijjkkkllllll."  // 120-13f
        "lnnnnnnnnnoooooo" "oorrrrrrssssssss"  // 140-15f
        "tttttuuuuuuuuuuu" "uwwyyyzzzzzz...."; // 160-17f
    char c = base[cp - 0x100];
    if (c != '.') return static_cast<uint32_t>(c);
    return cp;
  }
  return cp;
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
void wp_encode_batch(void* handle, const char** texts, int32_t n,
                     int32_t max_len, int32_t set_enc_token, int32_t* ids,
                     int32_t* mask) {
  auto& v = *static_cast<Vocab*>(handle);
  std::vector<int32_t> pieces;
  for (int32_t i = 0; i < n; ++i) {
    pieces.clear();
    for (const auto& w : basic_tokenize(v, texts[i])) {
      wordpiece(v, w, &pieces);
    }
    if (static_cast<int32_t>(pieces.size()) > max_len - 2)
      pieces.resize(max_len - 2);
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
}

}  // extern "C"
