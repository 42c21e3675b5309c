// Native FASTA/FASTQ(.gz) parser — the data-loader role the reference fills
// with klib's kseq.h (vendored C, reference src/kseq.h:176-219). Re-designed
// rather than ported: one pass fills contiguous growable buffers (sequence
// bytes, qualities, record offsets, names) that the Python side wraps as
// NumPy arrays zero-copy, instead of kseq's per-record kstring churn.
//
// Grammar: '>' starts a FASTA record (sequence may span lines); '@' starts a
// FASTQ record (sequence lines until '+', then exactly seq_len quality
// bytes, possibly spanning lines). gzread handles both gzip and plain files.
//
// C ABI for ctypes; buffers owned by the result object, freed by
// fastx_free().

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

struct Buf {
  uint8_t* data = nullptr;
  int64_t len = 0;
  int64_t cap = 0;
  void reserve(int64_t need) {
    if (need <= cap) return;
    int64_t ncap = cap ? cap : 1 << 16;
    while (ncap < need) ncap *= 2;
    uint8_t* ndata = static_cast<uint8_t*>(realloc(data, ncap));
    if (!ndata) abort();  // allocation failure: no recovery path here
    data = ndata;
    cap = ncap;
  }
  void append(const uint8_t* p, int64_t n) {
    reserve(len + n);
    memcpy(data + len, p, n);
    len += n;
  }
  void push(uint8_t c) {
    reserve(len + 1);
    data[len++] = c;
  }
};

// Buffered gz reader with line-oriented access.
class Reader {
 public:
  explicit Reader(const char* path) : gz_(gzopen(path, "rb")) {}
  ~Reader() {
    if (gz_) gzclose(gz_);
  }
  bool ok() const { return gz_ != nullptr; }
  // true if a gzread returned a hard error (corrupt stream), as opposed to
  // EOF — callers must not treat the truncated result as a complete parse.
  bool io_error() const { return io_error_; }

  int peek() {
    if (pos_ >= avail_ && !fill()) return -1;
    return buf_[pos_];
  }
  int get() {
    if (pos_ >= avail_ && !fill()) return -1;
    return buf_[pos_++];
  }
  // append the rest of the current line (no terminator) to out; consume the
  // newline. Returns false at EOF with nothing read.
  bool read_line(Buf& out) {
    bool any = false;
    while (true) {
      if (pos_ >= avail_ && !fill()) return any;
      int64_t start = pos_;
      while (pos_ < avail_ && buf_[pos_] != '\n') ++pos_;
      int64_t n = pos_ - start;
      if (n > 0 && pos_ < avail_) {  // strip \r before \n
        if (buf_[pos_ - 1] == '\r') --n;
      }
      out.append(buf_ + start, n);
      any = any || n > 0;
      if (pos_ < avail_) {
        ++pos_;  // consume '\n'
        return true;
      }
      // buffer exhausted mid-line: handle possible trailing \r at split
      if (n > 0 && out.len > 0 && out.data[out.len - 1] == '\r') --out.len;
      any = true;
    }
  }
  void skip_line() {
    while (true) {
      if (pos_ >= avail_ && !fill()) return;
      while (pos_ < avail_ && buf_[pos_] != '\n') ++pos_;
      if (pos_ < avail_) {
        ++pos_;
        return;
      }
    }
  }

 private:
  bool fill() {
    if (!gz_) return false;
    int n = gzread(gz_, buf_, sizeof(buf_));
    if (n < 0) {  // hard error (e.g. corrupt gzip), not EOF
      io_error_ = true;
      return false;
    }
    if (n == 0) return false;
    avail_ = n;
    pos_ = 0;
    return true;
  }
  gzFile gz_;
  uint8_t buf_[1 << 16];
  int64_t pos_ = 0;
  int64_t avail_ = 0;
  bool io_error_ = false;
};

}  // namespace

extern "C" {

struct FastxResult {
  uint8_t* seq;
  uint8_t* qual;
  int64_t* offsets;  // n_records + 1
  uint8_t* qual_present;
  char* names;  // '\n'-joined
  int64_t n_records;
  int64_t names_len;
  int error;  // 0 ok, 1 open failed, 2 parse error, 3 read error (corrupt)
};

struct FastxReaderHandle;  // opaque streaming handle

static void parse_records(Reader& rd, FastxResult* res,
                          int64_t max_records) {
  Buf seq, qual, names;
  std::vector<int64_t> offsets;
  std::vector<uint8_t> qpres;
  offsets.push_back(0);

  while (max_records < 0 ||
         static_cast<int64_t>(qpres.size()) < max_records) {
    int c = rd.peek();
    if (c < 0) break;
    if (c != '>' && c != '@') {
      // tolerate blank separator lines; anything else is a parse error
      if (c == '\n' || c == '\r') {
        rd.skip_line();
        continue;
      }
      res->error = 2;
      break;
    }
    rd.get();
    // name = first word of header
    Buf header;
    rd.read_line(header);
    int64_t w = 0;
    while (w < header.len && header.data[w] != ' ' && header.data[w] != '\t')
      ++w;
    names.append(header.data, w);
    names.push('\n');
    free(header.data);

    int64_t rec_start = seq.len;
    if (c == '>') {
      while (true) {
        int p = rd.peek();
        if (p < 0 || p == '>' || p == '@') break;
        rd.read_line(seq);
      }
      int64_t n = seq.len - rec_start;
      qual.reserve(qual.len + n);
      memset(qual.data + qual.len, 0, n);
      qual.len += n;
      qpres.push_back(0);
    } else {
      while (true) {
        int p = rd.peek();
        if (p < 0 || p == '+') break;
        rd.read_line(seq);
      }
      rd.skip_line();  // the '+' line
      int64_t need = seq.len - rec_start;
      int64_t got_start = qual.len;
      while (qual.len - got_start < need) {
        int64_t before = qual.len;
        if (!rd.read_line(qual)) break;
        if (qual.len == before && rd.peek() < 0) break;
      }
      if (qual.len - got_start != need) {
        res->error = 2;
        break;
      }
      qpres.push_back(1);
    }
    offsets.push_back(seq.len);
  }
  if (rd.io_error() && res->error == 0) res->error = 3;

  res->seq = seq.data;
  res->qual = qual.data;
  res->n_records = static_cast<int64_t>(qpres.size());
  res->offsets =
      static_cast<int64_t*>(malloc(sizeof(int64_t) * offsets.size()));
  memcpy(res->offsets, offsets.data(), sizeof(int64_t) * offsets.size());
  res->qual_present = static_cast<uint8_t*>(malloc(qpres.size() ? qpres.size() : 1));
  if (!qpres.empty())
    memcpy(res->qual_present, qpres.data(), qpres.size());
  res->names = reinterpret_cast<char*>(names.data);
  res->names_len = names.len;
}

FastxResult* fastx_read(const char* path, int64_t max_records) {
  auto* res = static_cast<FastxResult*>(calloc(1, sizeof(FastxResult)));
  Reader rd(path);
  if (!rd.ok()) {
    res->error = 1;
    return res;
  }
  parse_records(rd, res, max_records);
  return res;
}

// Streaming handle: parse the file in bounded batches with constant
// memory (the whole-file load above is unusable for multi-hundred-GB
// read corpora and prevents IO/compute overlap).
FastxReaderHandle* fastx_open(const char* path) {
  auto* rd = new Reader(path);
  if (!rd->ok()) {
    delete rd;
    return nullptr;
  }
  return reinterpret_cast<FastxReaderHandle*>(rd);
}

FastxResult* fastx_read_batch(FastxReaderHandle* h, int64_t max_records) {
  auto* res = static_cast<FastxResult*>(calloc(1, sizeof(FastxResult)));
  parse_records(*reinterpret_cast<Reader*>(h), res, max_records);
  return res;
}

void fastx_close(FastxReaderHandle* h) {
  delete reinterpret_cast<Reader*>(h);
}

void fastx_free(FastxResult* res) {
  if (!res) return;
  free(res->seq);
  free(res->qual);
  free(res->offsets);
  free(res->qual_present);
  free(res->names);
  free(res);
}

}  // extern "C"
