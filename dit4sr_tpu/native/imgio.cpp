// Native image IO: JPEG decode + bilinear resize + a threaded decode-ahead
// pipeline, exposed to Python via ctypes (dit4sr_tpu/native/imgio.py).
//
// The reference trains through torch's DataLoader worker processes
// (basicsr/data/prefetch_dataloader.py; pho_realesrgan_dataset.py does
// cv2.imread on the worker). This host has no spare cores for worker
// processes, so the TPU-native answer is a C++ decode path that (a) runs
// ~libjpeg speed with zero Python/opencv overhead and (b) releases the GIL
// for the entire decode+resize, so the Prefetcher thread (data/prefetch.py)
// genuinely overlaps with the interpreter instead of serializing on the GIL.
//
// Decode semantics match the Python path it replaces (satext.py _read_image:
// cv2.imread -> RGB float32 [0,1] -> cv2.resize INTER_LINEAR): full-res
// libjpeg decode to RGB, then half-pixel-center bilinear resample.
//
// Build: python -m dit4sr_tpu.native.build   (links -ljpeg)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <setjmp.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// libjpeg's default error handler exit()s the process; trampoline back.
struct JErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jerr_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JErr*>(cinfo->err)->jb, 1);
}
void jerr_silent(j_common_ptr, int) {}

// Full-resolution decode to tightly packed RGB8. Returns 0 on success.
int decode_rgb8(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  jerr.pub.emit_message = jerr_silent;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;  // grayscale/YCbCr -> RGB in-library
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_components != 3) {  // e.g. CMYK: caller falls back to cv2
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * *h * 3);
  const size_t stride = static_cast<size_t>(*w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Half-pixel-center bilinear resample (cv2.resize INTER_LINEAR convention):
// src_x = (dst_x + 0.5) * (src_w / dst_w) - 0.5, clamped-edge. Output is
// float32 RGB in [0,1]. Separable: one horizontal pass into a (src_h, out_w)
// scratch, then a vertical pass — O((src_h + out_h) * out_w) lerps instead
// of O(out_h * out_w) 4-tap gathers, and the scratch keeps rows hot.
void resize_bilinear(const uint8_t* src, int sw, int sh, int ow, int oh,
                     float* dst) {
  std::vector<int> x0(ow), x1(ow);
  std::vector<float> xf(ow);
  const float sx = static_cast<float>(sw) / ow;
  for (int x = 0; x < ow; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    if (fx < 0) fx = 0;
    if (fx > sw - 1) fx = static_cast<float>(sw - 1);
    x0[x] = static_cast<int>(fx);
    x1[x] = x0[x] + 1 < sw ? x0[x] + 1 : sw - 1;
    xf[x] = fx - x0[x];
  }
  std::vector<float> hpass(static_cast<size_t>(sh) * ow * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * 3;
    float* hrow = hpass.data() + static_cast<size_t>(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      const uint8_t* a = row + x0[x] * 3;
      const uint8_t* b = row + x1[x] * 3;
      const float f = xf[x];
      hrow[x * 3 + 0] = a[0] + f * (b[0] - a[0]);
      hrow[x * 3 + 1] = a[1] + f * (b[1] - a[1]);
      hrow[x * 3 + 2] = a[2] + f * (b[2] - a[2]);
    }
  }
  const float sy = static_cast<float>(sh) / oh;
  const float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > sh - 1) fy = static_cast<float>(sh - 1);
    const int y0 = static_cast<int>(fy);
    const int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    const float f = fy - y0;
    const float* r0 = hpass.data() + static_cast<size_t>(y0) * ow * 3;
    const float* r1 = hpass.data() + static_cast<size_t>(y1) * ow * 3;
    float* drow = dst + static_cast<size_t>(y) * ow * 3;
    for (int i = 0; i < ow * 3; ++i) {
      drow[i] = (r0[i] + f * (r1[i] - r0[i])) * inv255;
    }
  }
}

// EXIF orientation (1..8) from the APP1 segment, or 1 when absent or
// unparseable. cv2.imread applies non-identity orientations; this decoder
// does not, so callers must fall back to cv2 for oriented files to keep
// decode semantics identical (-4 from decode_resize_file).
int exif_orientation(const uint8_t* d, size_t n) {
  if (n < 4 || d[0] != 0xFF || d[1] != 0xD8) return 1;
  size_t i = 2;
  while (i + 4 <= n) {
    if (d[i] != 0xFF) return 1;
    const uint8_t marker = d[i + 1];
    if (marker == 0xFF) {  // fill byte: the marker starts one later
      i += 1;
      continue;
    }
    if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) ||
        marker == 0x01) {
      i += 2;
      continue;
    }
    if (marker == 0xDA || marker == 0xD9) return 1;  // image data: no APP1
    const size_t len = (static_cast<size_t>(d[i + 2]) << 8) | d[i + 3];
    if (len < 2 || i + 2 + len > n) return 1;
    if (marker == 0xE1 && len >= 16 &&
        std::memcmp(d + i + 4, "Exif\0\0", 6) == 0) {
      const uint8_t* t = d + i + 10;  // TIFF header
      const size_t tn = len - 8;
      if (tn < 8) return 1;
      bool le;
      if (t[0] == 'I' && t[1] == 'I') le = true;
      else if (t[0] == 'M' && t[1] == 'M') le = false;
      else return 1;
      auto rd16 = [&](size_t off) -> uint32_t {
        return le ? (t[off] | (t[off + 1] << 8))
                  : ((t[off] << 8) | t[off + 1]);
      };
      auto rd32 = [&](size_t off) -> uint32_t {
        return le ? (t[off] | (t[off + 1] << 8) | (t[off + 2] << 16) |
                     (static_cast<uint32_t>(t[off + 3]) << 24))
                  : ((static_cast<uint32_t>(t[off]) << 24) |
                     (t[off + 1] << 16) | (t[off + 2] << 8) | t[off + 3]);
      };
      if (rd16(2) != 42) return 1;
      const uint32_t ifd = rd32(4);
      if (ifd + 2 > tn) return 1;
      const uint32_t cnt = rd16(ifd);
      for (uint32_t k = 0; k < cnt; ++k) {
        const size_t e = ifd + 2 + 12 * k;
        if (e + 12 > tn) return 1;
        if (rd16(e) == 0x0112) {
          const uint32_t v = rd16(e + 8);
          return (v >= 1 && v <= 8) ? static_cast<int>(v) : 1;
        }
      }
      return 1;
    }
    i += 2 + len;
  }
  return 1;
}

int read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -10;
  std::fseek(f, 0, SEEK_END);
  const long n = std::ftell(f);
  if (n <= 0) {
    std::fclose(f);
    return -11;
  }
  std::fseek(f, 0, SEEK_SET);
  buf->resize(static_cast<size_t>(n));
  const size_t got = std::fread(buf->data(), 1, buf->size(), f);
  std::fclose(f);
  return got == buf->size() ? 0 : -12;
}

int decode_resize_file(const std::string& path, int oh, int ow, float* out) {
  std::vector<uint8_t> raw;
  int rc = read_file(path.c_str(), &raw);
  if (rc != 0) return rc;
  // cv2 auto-applies EXIF orientation; we don't — hand oriented files back
  if (exif_orientation(raw.data(), raw.size()) != 1) return -4;
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  rc = decode_rgb8(raw.data(), raw.size(), &rgb, &w, &h);
  if (rc != 0) return rc;
  if (w == ow && h == oh) {
    const float inv255 = 1.0f / 255.0f;
    const size_t n = static_cast<size_t>(w) * h * 3;
    for (size_t i = 0; i < n; ++i) out[i] = rgb[i] * inv255;
  } else {
    resize_bilinear(rgb.data(), w, h, ow, oh, out);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Decode-ahead pipeline: worker threads pull submitted paths, decode into
// owned buffers; results are delivered to Python strictly in submission
// order. In-flight work is bounded by `capacity` (submit blocks past it).

struct Loader {
  int oh, ow, capacity;
  std::mutex mu;
  std::condition_variable cv_submit, cv_work, cv_done;
  std::deque<std::pair<int64_t, std::string>> work;
  std::map<int64_t, std::pair<int, std::vector<float>>> done;  // seq -> (rc, px)
  int64_t next_seq = 0, next_deliver = 0;
  bool shutdown = false;
  std::vector<std::thread> threads;

  // everything submitted but not yet delivered (queued + decoding + buffered
  // results) — the quantity that holds memory
  int64_t inflight() const { return next_seq - next_deliver; }

  void worker() {
    for (;;) {
      std::pair<int64_t, std::string> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return shutdown || !work.empty(); });
        if (shutdown && work.empty()) return;
        job = std::move(work.front());
        work.pop_front();
      }
      std::vector<float> px(static_cast<size_t>(oh) * ow * 3);
      const int rc = decode_resize_file(job.second, oh, ow, px.data());
      {
        std::lock_guard<std::mutex> lk(mu);
        done.emplace(job.first, std::make_pair(rc, std::move(px)));
        cv_done.notify_all();
        cv_submit.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

// One-shot: decode `path`, resize to (oh, ow), write oh*ow*3 float32 RGB in
// [0,1] to `out`. Returns 0 on success, <0 on error (caller falls back).
int imgio_decode_file(const char* path, int oh, int ow, float* out) {
  return decode_resize_file(path, oh, ow, out);
}

// Probe JPEG dimensions without a full decode.
int imgio_probe_file(const char* path, int* w, int* h) {
  std::vector<uint8_t> raw;
  if (read_file(path, &raw) != 0) return -10;
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  jerr.pub.emit_message = jerr_silent;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, raw.data(), raw.size());
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

void* imgio_loader_create(int oh, int ow, int n_threads, int capacity) {
  Loader* L = new Loader;
  L->oh = oh;
  L->ow = ow;
  L->capacity = capacity > 0 ? capacity : 4;
  if (n_threads < 1) n_threads = 1;
  for (int i = 0; i < n_threads; ++i) {
    L->threads.emplace_back([L] { L->worker(); });
  }
  return L;
}

// Queue a decode; blocks while `capacity` items are in flight. Returns the
// item's sequence number, or -1 after shutdown.
int64_t imgio_loader_submit(void* handle, const char* path) {
  Loader* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_submit.wait(lk, [&] {
    return L->shutdown || L->inflight() < L->capacity;
  });
  if (L->shutdown) return -1;
  const int64_t seq = L->next_seq++;
  L->work.emplace_back(seq, std::string(path));
  L->cv_work.notify_one();
  return seq;
}

// Blocking wait for the next result IN SUBMISSION ORDER. Writes oh*ow*3
// floats into `out`. Returns the item's decode rc (0 ok, <0 error), or -100
// if nothing is pending.
int imgio_loader_next(void* handle, float* out) {
  Loader* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_deliver >= L->next_seq) return -100;
  const int64_t want = L->next_deliver;
  L->cv_done.wait(lk, [&] { return L->done.count(want) != 0; });
  auto it = L->done.find(want);
  const int rc = it->second.first;
  if (rc == 0) {
    std::memcpy(out, it->second.second.data(),
                it->second.second.size() * sizeof(float));
  }
  L->done.erase(it);
  L->next_deliver++;
  L->cv_submit.notify_all();
  return rc;
}

void imgio_loader_destroy(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->shutdown = true;
    L->cv_work.notify_all();
    L->cv_submit.notify_all();
  }
  for (auto& t : L->threads) t.join();
  delete L;
}

}  // extern "C"
