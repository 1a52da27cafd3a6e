// packed_dataset.cpp — native data-pipeline tier.
//
// The reference feeds training from a synchronous Python generator doing
// per-step PIL decode + resize (SURVEY.md §3.1 flags it as the known
// bottleneck). At TPU rates the host input pipeline must produce hundreds
// of fully-formed float batches per second; Python-side assembly burns GIL
// time the prefetch threads need.
//
// This library serves batches from a *pack file*: all images pre-decoded,
// pre-resized to the training resolution, stored as fixed-size uint8
// records. The file is memory-mapped (zero-copy reads, page-cache
// friendly, trivially shared across worker processes) and batch assembly
// — gather by index, uint8->float32 normalize, optional horizontal flip —
// runs on a small C++ thread pool writing straight into caller-provided
// (pinned) buffers.
//
// Layout (little-endian):
//   header:  magic 'UPK1' | u32 version | u64 n | u32 h | u32 w
//            | u32 img_c | u32 mask_c | u32 mask_is_class_id | pad to 64B
//   records: n x ( image u8[h*w*img_c] , mask u8[h*w*mask_c] )
//
// C API (ctypes-friendly): pd_open / pd_info / pd_fill_batch / pd_close.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x314B5055;  // 'UPK1'
constexpr size_t kHeaderSize = 64;

struct Header {
  uint32_t magic;
  uint32_t version;
  uint64_t n;
  uint32_t h, w, img_c, mask_c;
  uint32_t mask_is_class_id;
};

struct Pack {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  Header hdr{};
  size_t record_bytes = 0;
  size_t image_bytes = 0;
  size_t mask_bytes = 0;
};

inline const uint8_t* record_ptr(const Pack* p, int64_t idx) {
  return p->base + kHeaderSize + static_cast<size_t>(idx) * p->record_bytes;
}

// Exact uint8 -> float32 normalization table: lut[v] = (float)v / divisor,
// the correctly-rounded float division — BIT-IDENTICAL to the Python
// loader's `u8.astype(float32) / 255.0` (a pre-rounded reciprocal multiply
// is off by 1 ulp on ~38% of values).  256 floats live in L1; the lookup
// is also faster than the multiply it replaces.
struct NormLut {
  float v[256];
  explicit NormLut(float divisor) {
    for (int i = 0; i < 256; ++i) v[i] = static_cast<float>(i) / divisor;
  }
};

// Normalize + optional h-flip one sample into the output slot.
void emit_sample(const Pack* p, int64_t idx, bool flip, const NormLut& img_lut,
                 const NormLut& mask_lut, float* img_out, float* mask_out) {
  const uint8_t* img = record_ptr(p, idx);
  const uint8_t* msk = img + p->image_bytes;
  const int h = static_cast<int>(p->hdr.h);
  const int w = static_cast<int>(p->hdr.w);
  const int ic = static_cast<int>(p->hdr.img_c);
  const int mc = static_cast<int>(p->hdr.mask_c);

  if (!flip) {
    const size_t in_px = static_cast<size_t>(h) * w * ic;
    for (size_t i = 0; i < in_px; ++i) img_out[i] = img_lut.v[img[i]];
    const size_t mk_px = static_cast<size_t>(h) * w * mc;
    for (size_t i = 0; i < mk_px; ++i) mask_out[i] = mask_lut.v[msk[i]];
    return;
  }
  // horizontal flip: reverse the W axis of HWC rows
  for (int y = 0; y < h; ++y) {
    const uint8_t* irow = img + static_cast<size_t>(y) * w * ic;
    float* orow = img_out + static_cast<size_t>(y) * w * ic;
    for (int x = 0; x < w; ++x) {
      const uint8_t* src = irow + static_cast<size_t>(w - 1 - x) * ic;
      float* dst = orow + static_cast<size_t>(x) * ic;
      for (int c = 0; c < ic; ++c) dst[c] = img_lut.v[src[c]];
    }
    const uint8_t* mrow = msk + static_cast<size_t>(y) * w * mc;
    float* mout = mask_out + static_cast<size_t>(y) * w * mc;
    for (int x = 0; x < w; ++x) {
      const uint8_t* src = mrow + static_cast<size_t>(w - 1 - x) * mc;
      float* dst = mout + static_cast<size_t>(x) * mc;
      for (int c = 0; c < mc; ++c) dst[c] = mask_lut.v[src[c]];
    }
  }
}

}  // namespace

extern "C" {

// Returns an opaque handle (heap pointer) or nullptr on failure.
void* pd_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < kHeaderSize) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* p = new Pack();
  p->fd = fd;
  p->base = static_cast<const uint8_t*>(base);
  p->size = st.st_size;
  std::memcpy(&p->hdr, p->base, sizeof(Header));
  if (p->hdr.magic != kMagic || p->hdr.version != 1) {
    munmap(const_cast<uint8_t*>(p->base), p->size);
    ::close(fd);
    delete p;
    return nullptr;
  }
  p->image_bytes =
      static_cast<size_t>(p->hdr.h) * p->hdr.w * p->hdr.img_c;
  p->mask_bytes = static_cast<size_t>(p->hdr.h) * p->hdr.w * p->hdr.mask_c;
  p->record_bytes = p->image_bytes + p->mask_bytes;
  const size_t need =
      kHeaderSize + p->record_bytes * static_cast<size_t>(p->hdr.n);
  if (p->size < need) {
    munmap(const_cast<uint8_t*>(p->base), p->size);
    ::close(fd);
    delete p;
    return nullptr;
  }
  // The access pattern is random gathers; tell the kernel.
  madvise(const_cast<uint8_t*>(p->base), p->size, MADV_RANDOM);
  return p;
}

// n, h, w, img_c, mask_c, mask_is_class_id
void pd_info(void* handle, int64_t* out) {
  auto* p = static_cast<Pack*>(handle);
  out[0] = static_cast<int64_t>(p->hdr.n);
  out[1] = p->hdr.h;
  out[2] = p->hdr.w;
  out[3] = p->hdr.img_c;
  out[4] = p->hdr.mask_c;
  out[5] = p->hdr.mask_is_class_id;
}

// ABI version of this library.  v2: pd_fill_batch takes DIVISORS
// (255.0 / 1.0), normalizing via an exact division LUT; v1 took
// pre-rounded reciprocal scales (1-ulp off vs the Python loader).
// The Python wrapper refuses (and rebuilds) anything older.
int pd_abi_version() { return 2; }

// Gather `count` samples by index into dense float batches.
//   indices:   int64[count]
//   flips:     uint8[count] (0/1), may be nullptr
//   img_div:   uint8 normalization divisor for images (255.0)
//   mask_div:  divisor for masks (255.0 binary, 1.0 class-id)
//   img_out:   float32[count * h * w * img_c]
//   mask_out:  float32[count * h * w * mask_c]
// Returns 0 on success, -1 on bad args.
int pd_fill_batch(void* handle, const int64_t* indices, int64_t count,
                  const uint8_t* flips, float img_div, float mask_div,
                  float* img_out, float* mask_out, int num_threads) {
  auto* p = static_cast<Pack*>(handle);
  if (!p || count <= 0) return -1;
  const NormLut img_lut(img_div);
  const NormLut mask_lut(mask_div);
  for (int64_t i = 0; i < count; ++i) {
    if (indices[i] < 0 || indices[i] >= static_cast<int64_t>(p->hdr.n))
      return -1;
  }
  const size_t img_px = p->image_bytes;
  const size_t mask_px = p->mask_bytes;
  if (num_threads < 1) num_threads = 1;
  if (num_threads > count) num_threads = static_cast<int>(count);

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      const int64_t i = next.fetch_add(1);
      if (i >= count) break;
      const bool flip = flips != nullptr && flips[i] != 0;
      emit_sample(p, indices[i], flip, img_lut, mask_lut,
                  img_out + static_cast<size_t>(i) * img_px,
                  mask_out + static_cast<size_t>(i) * mask_px);
    }
  };
  if (num_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(num_threads);
    for (int t = 0; t < num_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return 0;
}

void pd_close(void* handle) {
  auto* p = static_cast<Pack*>(handle);
  if (!p) return;
  if (p->base) munmap(const_cast<uint8_t*>(p->base), p->size);
  if (p->fd >= 0) ::close(p->fd);
  delete p;
}

}  // extern "C"
