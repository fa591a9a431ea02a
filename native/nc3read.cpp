// Native netCDF3 classic reader for the real-data ingestion hot path.
//
// The lazy E33OMA loaders (data/netcdf.py) pull whole day-files through
// data/ncio.open_nc; the pure-Python scipy backend re-parses headers and
// byte-swaps in numpy per open.  This reader mmaps the file, parses the
// classic header once, and copies/byte-swaps each variable straight into
// caller-provided numpy buffers — C ABI via ctypes (no pybind11 in the
// image).  Handles CDF-1 (32-bit offsets), CDF-2 (64-bit offsets) and
// CDF-5 (64-bit data: 64-bit sizes/counts plus the unsigned/64-bit
// types, the PnetCDF format large ModelE output ships in), fixed and
// record (unlimited-dimension) variables, including the per-record
// interleaved layout.
//
// Format reference: the NetCDF classic format specification (public).
// Behavioral contract mirrored from data/ncio._open_scipy: every
// variable fully materialized, little-endian, record dim concatenated.
//
// Build: make -C native   (g++ -O3 -shared -fPIC nc3read.cpp -o libnc3read.so)

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <unordered_map>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t NC_DIMENSION = 0x0A;
constexpr uint32_t NC_VARIABLE = 0x0B;
constexpr uint32_t NC_ATTRIBUTE = 0x0C;

struct Dim {
  std::string name;
  uint64_t len;  // 0 => record dimension
};

struct Attr {
  std::string name;
  int type;
  std::vector<uint8_t> raw;  // undecoded payload (big-endian elements)
  uint64_t n;
};

struct Var {
  std::string name;
  std::vector<int> dimids;
  std::vector<Attr> atts;
  int type;
  uint64_t vsize;   // per-record byte size for record vars (incl. padding)
  uint64_t begin;
  bool is_record;
  std::vector<uint64_t> shape;  // record dim filled with numrecs
};

struct File {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t size = 0;
  int version = 0;  // 1 or 2
  uint64_t numrecs = 0;
  uint64_t recsize = 0;  // sum of record-var vsizes
  std::vector<Dim> dims;
  std::vector<Var> vars;
  std::unordered_map<std::string, int> var_index;
  std::string error;
};

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool wide = false;  // CDF-5: every NON_NEG/NELEMS field is 64-bit
  bool ok = true;
  uint64_t u32() {
    if (p + 4 > end) { ok = false; return 0; }
    uint32_t v = (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
                 (uint32_t(p[2]) << 8) | uint32_t(p[3]);
    p += 4;
    return v;
  }
  uint64_t u64() {
    uint64_t hi = u32(), lo = u32();
    return (hi << 32) | lo;
  }
  // NON_NEG per the format spec: 32-bit in CDF-1/2, 64-bit in CDF-5
  uint64_t nonneg() { return wide ? u64() : u32(); }
  std::string name() {
    uint64_t n = nonneg();
    // compare against the remaining byte count, never p + n (a huge n
    // from a corrupt header would overflow the pointer and pass)
    if (!ok || n > uint64_t(end - p)) { ok = false; return {}; }
    std::string s(reinterpret_cast<const char*>(p), n);
    uint64_t padded = (n + 3) & ~uint64_t(3);
    if (padded > uint64_t(end - p)) { ok = false; return s; }
    p += padded;
    return s;
  }
};

int type_size(int t) {
  switch (t) {
    case 1: return 1;   // byte
    case 2: return 1;   // char
    case 3: return 2;   // short
    case 4: return 4;   // int
    case 5: return 4;   // float
    case 6: return 8;   // double
    case 7: return 1;   // ubyte  (CDF-5)
    case 8: return 2;   // ushort (CDF-5)
    case 9: return 4;   // uint   (CDF-5)
    case 10: return 8;  // int64  (CDF-5)
    case 11: return 8;  // uint64 (CDF-5)
  }
  return 0;
}

Attr read_attr(Cursor& c) {
  Attr a;
  a.name = c.name();
  a.type = int(c.u32());
  a.n = c.nonneg();
  int es = type_size(a.type);
  uint64_t avail = uint64_t(c.end - c.p);
  // overflow-safe: a corrupt n could make n*es wrap; bound n first
  if (!c.ok || es == 0 || a.n > avail / uint64_t(es)) {
    c.ok = false;
    return a;
  }
  uint64_t nbytes = a.n * es;
  uint64_t padded = (nbytes + 3) & ~uint64_t(3);
  if (padded > avail) { c.ok = false; return a; }
  a.raw.assign(c.p, c.p + nbytes);
  c.p += padded;
  return a;
}

bool parse(File* f) {
  Cursor c{f->map, f->map + f->size};
  if (f->size < 8 || memcmp(f->map, "CDF", 3) != 0) {
    f->error = "not a netCDF3 classic file";
    return false;
  }
  f->version = f->map[3];
  if (f->version != 1 && f->version != 2 && f->version != 5) {
    f->error = "unsupported CDF version";
    return false;
  }
  c.wide = (f->version == 5);
  c.p += 4;
  uint64_t streaming = c.wide ? ~uint64_t(0) : 0xFFFFFFFFu;
  uint64_t numrecs = c.nonneg();
  f->numrecs = (numrecs == streaming) ? 0 : numrecs;

  // dim_list
  uint64_t tag = c.u32(), n = c.nonneg();
  if (tag == NC_DIMENSION) {
    for (uint64_t i = 0; i < n && c.ok; i++) {
      Dim d;
      d.name = c.name();
      d.len = c.nonneg();
      f->dims.push_back(std::move(d));
    }
  } else if (tag != 0 || n != 0) {
    f->error = "bad dim_list";
    return false;
  }
  // gatt_list (skipped: the ingestion path needs only per-var atts)
  tag = c.u32(); n = c.nonneg();
  if (tag == NC_ATTRIBUTE) {
    for (uint64_t i = 0; i < n && c.ok; i++) read_attr(c);
  } else if (tag != 0 || n != 0) {
    f->error = "bad gatt_list";
    return false;
  }
  // var_list
  tag = c.u32(); n = c.nonneg();
  if (tag == NC_VARIABLE) {
    for (uint64_t i = 0; i < n && c.ok; i++) {
      Var v;
      v.name = c.name();
      uint64_t nd = c.nonneg();
      v.is_record = false;
      for (uint64_t k = 0; k < nd && c.ok; k++) {
        int id = int(c.nonneg());
        v.dimids.push_back(id);
        if (id >= 0 && size_t(id) < f->dims.size() && f->dims[id].len == 0 &&
            k == 0)
          v.is_record = true;
      }
      uint64_t atag = c.u32(), an = c.nonneg();
      if (atag == NC_ATTRIBUTE)
        for (uint64_t k = 0; k < an && c.ok; k++) v.atts.push_back(read_attr(c));
      v.type = int(c.u32());
      v.vsize = c.nonneg();
      v.begin = (f->version == 1) ? c.u32() : c.u64();
      for (size_t k = 0; k < v.dimids.size(); k++) {
        int id = v.dimids[k];
        if (id < 0 || size_t(id) >= f->dims.size()) {  // corrupt header
          f->error = "bad dimid";
          return false;
        }
        uint64_t len = f->dims[id].len;
        if (k == 0 && v.is_record) len = f->numrecs;
        v.shape.push_back(len);
      }
      f->var_index[v.name] = int(f->vars.size());
      f->vars.push_back(std::move(v));
    }
  } else if (tag != 0 || n != 0) {
    f->error = "bad var_list";
    return false;
  }
  if (!c.ok) {
    f->error = "truncated header";
    return false;
  }
  uint64_t recsize = 0;
  int nrecvars = 0;
  for (auto& v : f->vars)
    if (v.is_record) { recsize += v.vsize; nrecvars++; }
  // special case (format spec): exactly one record variable is NOT padded
  if (nrecvars == 1)
    for (auto& v : f->vars)
      if (v.is_record) {
        uint64_t per = type_size(v.type);
        for (size_t k = 1; k < v.shape.size(); k++) per *= v.shape[k];
        recsize = per;
      }
  f->recsize = recsize;
  return true;
}

void swap_copy(uint8_t* dst, const uint8_t* src, uint64_t n, int es) {
  switch (es) {
    case 1:
      memcpy(dst, src, n);
      break;
    case 2:
      for (uint64_t i = 0; i < n; i++) {
        dst[2 * i] = src[2 * i + 1];
        dst[2 * i + 1] = src[2 * i];
      }
      break;
    case 4:
      for (uint64_t i = 0; i < n; i++) {
        dst[4 * i + 0] = src[4 * i + 3];
        dst[4 * i + 1] = src[4 * i + 2];
        dst[4 * i + 2] = src[4 * i + 1];
        dst[4 * i + 3] = src[4 * i + 0];
      }
      break;
    case 8:
      for (uint64_t i = 0; i < n; i++)
        for (int b = 0; b < 8; b++) dst[8 * i + b] = src[8 * i + 7 - b];
      break;
  }
}

}  // namespace

extern "C" {

void* nc3_open(const char* path) {
  File* f = new File();
  f->fd = open(path, O_RDONLY);
  if (f->fd < 0) { delete f; return nullptr; }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 8) {
    close(f->fd);
    delete f;
    return nullptr;
  }
  f->size = size_t(st.st_size);
  f->map = static_cast<const uint8_t*>(
      mmap(nullptr, f->size, PROT_READ, MAP_PRIVATE, f->fd, 0));
  if (f->map == MAP_FAILED || !parse(f)) {
    if (f->map != MAP_FAILED) munmap(const_cast<uint8_t*>(f->map), f->size);
    close(f->fd);
    delete f;
    return nullptr;
  }
  return f;
}

void nc3_close(void* h) {
  File* f = static_cast<File*>(h);
  if (!f) return;
  munmap(const_cast<uint8_t*>(const_cast<const uint8_t*>(f->map)), f->size);
  close(f->fd);
  delete f;
}

int nc3_num_vars(void* h) { return int(static_cast<File*>(h)->vars.size()); }

const char* nc3_var_name(void* h, int i) {
  File* f = static_cast<File*>(h);
  if (i < 0 || size_t(i) >= f->vars.size()) return nullptr;
  return f->vars[i].name.c_str();
}

// ndim, type written out; shape needs room for 8; returns 0 on success
int nc3_var_info(void* h, const char* name, int* ndim, uint64_t* shape,
                 int* type) {
  File* f = static_cast<File*>(h);
  auto it = f->var_index.find(name);
  if (it == f->var_index.end()) return -1;
  const Var& v = f->vars[it->second];
  *ndim = int(v.shape.size());
  *type = v.type;
  for (size_t k = 0; k < v.shape.size() && k < 8; k++) shape[k] = v.shape[k];
  return 0;
}

// i-th dimension NAME of a variable (for NcFile.dims)
const char* nc3_var_dim_name(void* h, const char* name, int i) {
  File* f = static_cast<File*>(h);
  auto it = f->var_index.find(name);
  if (it == f->var_index.end()) return nullptr;
  const Var& v = f->vars[it->second];
  if (i < 0 || size_t(i) >= v.dimids.size()) return nullptr;
  return f->dims[v.dimids[i]].name.c_str();
}

// text attribute of a variable (units/calendar); returns length or -1
long nc3_var_attr_text(void* h, const char* var, const char* attr, char* dst,
                       long cap) {
  File* f = static_cast<File*>(h);
  auto it = f->var_index.find(var);
  if (it == f->var_index.end()) return -1;
  for (const Attr& a : f->vars[it->second].atts) {
    if (a.name == attr && a.type == 2) {
      long n = long(a.raw.size());
      if (n > cap) n = cap;
      memcpy(dst, a.raw.data(), size_t(n));
      return n;
    }
  }
  return -1;
}

// Read records [start, start+count) of a variable into dst (native-endian,
// contiguous).  For fixed vars start/count index the leading dimension.
// Returns 0 on success.
int nc3_read(void* h, const char* name, uint64_t start, uint64_t count,
             void* dst) {
  File* f = static_cast<File*>(h);
  auto it = f->var_index.find(name);
  if (it == f->var_index.end()) return -1;
  const Var& v = f->vars[it->second];
  int es = type_size(v.type);
  if (es == 0) return -2;
  uint64_t per = es;  // elements*size below the leading dim
  for (size_t k = 1; k < v.shape.size(); k++) {
    if (__builtin_mul_overflow(per, v.shape[k], &per) || per > f->size)
      return -4;  // corrupt shape: data cannot fit in the file
  }
  uint64_t lead = v.shape.empty() ? 1 : v.shape[0];
  if (v.shape.empty()) per = es;
  if (start + count < start || start + count > lead) return -3;

  uint8_t* out = static_cast<uint8_t*>(dst);
  if (v.is_record) {
    for (uint64_t r = 0; r < count; r++) {
      uint64_t off;
      if (__builtin_mul_overflow(start + r, f->recsize, &off) ||
          __builtin_add_overflow(off, v.begin, &off) ||
          off > f->size || per > f->size - off)
        return -4;
      swap_copy(out + r * per, f->map + off, per / es, es);
    }
  } else {
    uint64_t off, nbytes;
    if (__builtin_mul_overflow(start, per, &off) ||
        __builtin_add_overflow(off, v.begin, &off) ||
        __builtin_mul_overflow(count, per, &nbytes) ||
        off > f->size || nbytes > f->size - off)
      return -4;
    swap_copy(out, f->map + off, count * per / es, es);
  }
  return 0;
}

// Read records [start, start+count) of a variable, keeping only
// axis-1 indices [lev_start, lev_start+lev_count) — the level slice of
// a (time, level, lat, lon) field without touching the other levels'
// bytes.  Requires ndim >= 2.  Returns 0 on success.
int nc3_read_levels(void* h, const char* name, uint64_t start, uint64_t count,
                    uint64_t lev_start, uint64_t lev_count, void* dst) {
  File* f = static_cast<File*>(h);
  auto it = f->var_index.find(name);
  if (it == f->var_index.end()) return -1;
  const Var& v = f->vars[it->second];
  int es = type_size(v.type);
  if (es == 0 || v.shape.size() < 2) return -2;
  uint64_t inner = es;  // bytes below the level axis
  for (size_t k = 2; k < v.shape.size(); k++) {
    if (__builtin_mul_overflow(inner, v.shape[k], &inner) ||
        inner > f->size)
      return -4;
  }
  uint64_t lead = v.shape[0], nlev = v.shape[1];
  if (start + count < start || start + count > lead ||
      lev_start + lev_count < lev_start || lev_start + lev_count > nlev)
    return -3;
  uint64_t rec_stride = v.is_record ? f->recsize : nlev * inner;
  uint64_t nbytes;
  if (__builtin_mul_overflow(lev_count, inner, &nbytes) || nbytes > f->size)
    return -4;
  uint64_t lev_off;
  if (__builtin_mul_overflow(lev_start, inner, &lev_off)) return -4;
  uint8_t* out = static_cast<uint8_t*>(dst);
  for (uint64_t r = 0; r < count; r++) {
    uint64_t off;
    if (__builtin_mul_overflow(start + r, rec_stride, &off) ||
        __builtin_add_overflow(off, v.begin, &off) ||
        __builtin_add_overflow(off, lev_off, &off) ||
        off > f->size || nbytes > f->size - off)
      return -4;
    swap_copy(out + r * nbytes, f->map + off, nbytes / es, es);
  }
  return 0;
}

const char* nc3_error(void* h) {
  File* f = static_cast<File*>(h);
  return f ? f->error.c_str() : "open failed";
}

}  // extern "C"
