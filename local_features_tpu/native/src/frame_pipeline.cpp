// Native host runtime: frame ingestion pipeline.
//
// TPU-native equivalent of the reference's host-side ingestion path (the
// webcam capture loop, examples/webcam/src/camera.rs, and the staging
// upload in vulkan/tasks_detect.rs:20-48): a multi-threaded
// decode/convert/resize pipeline that turns image files or raw buffers
// into ready-to-upload float32 grayscale frames, overlapping host
// preprocessing with device compute.  Exposed to Python via a plain C ABI
// (ctypes — no pybind11 dependency).
//
// Supported sources: PGM (P5), PPM (P6), raw u8 gray, raw f32 gray, and
// — when the system libraries are present at build time (the Python
// binding probes and degrades, native/__init__.py:_build) — JPEG
// (libjpeg) and PNG (libpng).  Compressed decode on worker threads is
// the case where overlapping host work with TPU compute actually pays:
// a 640x480 JPEG costs ~2-4 ms of CPU, comparable to the per-frame
// device time at bench throughput.

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#ifdef LF_HAVE_JPEG
#include <jpeglib.h>
#endif
#ifdef LF_HAVE_PNG
#include <png.h>
#endif

extern "C" {

// ---------------------------------------------------------------------
// conversions
// ---------------------------------------------------------------------

void lf_gray_u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
  constexpr float kInv = 1.0f / 255.0f;
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * kInv;
}

// BT.601 luma, matching the common `image` crate / PIL "L" conversion.
void lf_rgb_u8_to_gray_f32(const uint8_t* src, float* dst, int64_t npx) {
  constexpr float kInv = 1.0f / 255.0f;
  for (int64_t i = 0; i < npx; ++i) {
    const float r = src[3 * i + 0];
    const float g = src[3 * i + 1];
    const float b = src[3 * i + 2];
    dst[i] = (0.299f * r + 0.587f * g + 0.114f * b) * kInv;
  }
}

// Bilinear resize (pixel-center convention, clamped borders).
void lf_resize_bilinear_f32(const float* src, int64_t h, int64_t w,
                            float* dst, int64_t oh, int64_t ow) {
  const float sy = static_cast<float>(h) / static_cast<float>(oh);
  const float sx = static_cast<float>(w) / static_cast<float>(ow);
  for (int64_t y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int64_t y0 = static_cast<int64_t>(fy);
    if (y0 > h - 2) y0 = h - 2;
    const float wy = fy - y0;
    for (int64_t x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int64_t x0 = static_cast<int64_t>(fx);
      if (x0 > w - 2) x0 = w - 2;
      const float wx = fx - x0;
      const float v00 = src[y0 * w + x0];
      const float v01 = src[y0 * w + x0 + 1];
      const float v10 = src[(y0 + 1) * w + x0];
      const float v11 = src[(y0 + 1) * w + x0 + 1];
      dst[y * ow + x] = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                        wy * ((1 - wx) * v10 + wx * v11);
    }
  }
}

// ---------------------------------------------------------------------
// file loading (PGM P5 / PPM P6 / raw)
// ---------------------------------------------------------------------

namespace {

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(size);
  const bool ok = std::fread(out->data(), 1, size, f) == (size_t)size;
  std::fclose(f);
  return ok;
}

// parse "P5\n<w> <h>\n<maxval>\n" style headers (comments supported)
bool parse_pnm_header(const std::vector<uint8_t>& buf, int* magic,
                      int64_t* w, int64_t* h, size_t* data_off) {
  size_t i = 0;
  auto skip_ws = [&]() {
    while (i < buf.size()) {
      if (buf[i] == '#') {
        while (i < buf.size() && buf[i] != '\n') ++i;
      } else if (buf[i] == ' ' || buf[i] == '\t' || buf[i] == '\n' ||
                 buf[i] == '\r') {
        ++i;
      } else {
        break;
      }
    }
  };
  auto read_int = [&](int64_t* v) -> bool {
    skip_ws();
    if (i >= buf.size() || buf[i] < '0' || buf[i] > '9') return false;
    int64_t r = 0;
    while (i < buf.size() && buf[i] >= '0' && buf[i] <= '9') {
      r = r * 10 + (buf[i] - '0');
      ++i;
    }
    *v = r;
    return true;
  };
  if (buf.size() < 2 || buf[0] != 'P') return false;
  *magic = buf[1] - '0';
  i = 2;
  int64_t maxval;
  if (!read_int(w) || !read_int(h) || !read_int(&maxval)) return false;
  if (maxval <= 0 || maxval > 255) return false;
  ++i;  // single whitespace after maxval
  *data_off = i;
  return true;
}

#ifdef LF_HAVE_JPEG

struct JpegErr {
  jpeg_error_mgr pub;
  std::jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(e->jb, 1);
}

// Decode to u8 gray (1 ch) or RGB (3 ch).  Returns false on any libjpeg
// error (routed through setjmp — libjpeg's default error path exits).
bool decode_jpeg(const std::vector<uint8_t>& buf, std::vector<uint8_t>* pix,
                 int64_t* h, int64_t* w, int* channels) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf.data(), buf.size());
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space =
      cinfo.num_components == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  *channels = cinfo.output_components;
  pix->resize((size_t)(*h) * (*w) * (*channels));
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = pix->data() +
                   (size_t)cinfo.output_scanline * (*w) * (*channels);
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool probe_jpeg(const std::vector<uint8_t>& buf, int64_t* h, int64_t* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf.data(), buf.size());
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return true;
}

#endif  // LF_HAVE_JPEG

#ifdef LF_HAVE_PNG

// Simplified libpng (>= 1.6) read API: gray sources stay gray (no
// coefficient surprises), color collapses through our own BT.601 below.
bool decode_png(const std::vector<uint8_t>& buf, std::vector<uint8_t>* pix,
                int64_t* h, int64_t* w, int* channels) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf.data(), buf.size()))
    return false;
  const bool gray = (image.format & PNG_FORMAT_FLAG_COLOR) == 0;
  image.format = gray ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
  *w = image.width;
  *h = image.height;
  *channels = gray ? 1 : 3;
  pix->resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, pix->data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

bool probe_png(const std::vector<uint8_t>& buf, int64_t* h, int64_t* w) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf.data(), buf.size()))
    return false;
  *w = image.width;
  *h = image.height;
  png_image_free(&image);
  return true;
}

#endif  // LF_HAVE_PNG

enum class Kind { kPnm5, kPnm6, kJpeg, kPng, kUnknown };

Kind sniff(const std::vector<uint8_t>& buf) {
  if (buf.size() >= 2 && buf[0] == 'P' && buf[1] == '5') return Kind::kPnm5;
  if (buf.size() >= 2 && buf[0] == 'P' && buf[1] == '6') return Kind::kPnm6;
  if (buf.size() >= 2 && buf[0] == 0xFF && buf[1] == 0xD8)
    return Kind::kJpeg;
  if (buf.size() >= 4 && buf[0] == 0x89 && buf[1] == 'P' && buf[2] == 'N' &&
      buf[3] == 'G')
    return Kind::kPng;
  return Kind::kUnknown;
}

int finish_gray(const float* gray, int64_t h, int64_t w, float* dst,
                int64_t oh, int64_t ow) {
  if (oh > 0 && ow > 0 && (oh != h || ow != w)) {
    lf_resize_bilinear_f32(gray, h, w, dst, oh, ow);
  } else {
    std::memcpy(dst, gray, sizeof(float) * h * w);
  }
  return 0;
}

}  // namespace

// Build-time decoder capabilities (the Python binding reports these).
int lf_has_jpeg(void) {
#ifdef LF_HAVE_JPEG
  return 1;
#else
  return 0;
#endif
}

int lf_has_png(void) {
#ifdef LF_HAVE_PNG
  return 1;
#else
  return 0;
#endif
}

// Load a PGM/PPM into a float32 gray buffer (resizing if oh/ow > 0).
// Returns 0 on success; fills *out_h/*out_w with the source dims.
int lf_load_pnm_gray(const char* path, float* dst, int64_t oh, int64_t ow,
                     int64_t* out_h, int64_t* out_w) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  int magic;
  int64_t w, h;
  size_t off;
  if (!parse_pnm_header(buf, &magic, &w, &h, &off)) return -2;
  *out_h = h;
  *out_w = w;
  std::vector<float> gray(h * w);
  if (magic == 5) {
    if (buf.size() < off + (size_t)(h * w)) return -3;
    lf_gray_u8_to_f32(buf.data() + off, gray.data(), h * w);
  } else if (magic == 6) {
    if (buf.size() < off + (size_t)(3 * h * w)) return -3;
    lf_rgb_u8_to_gray_f32(buf.data() + off, gray.data(), h * w);
  } else {
    return -4;
  }
  return finish_gray(gray.data(), h, w, dst, oh, ow);
}

// Dimensions of any supported image without decoding pixel data.
// Returns 0 on success, -1 unreadable, -4 unsupported format.
int lf_probe_image(const char* path, int64_t* out_h, int64_t* out_w) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  switch (sniff(buf)) {
    case Kind::kPnm5:
    case Kind::kPnm6: {
      int magic;
      size_t off;
      return parse_pnm_header(buf, &magic, out_w, out_h, &off) ? 0 : -2;
    }
#ifdef LF_HAVE_JPEG
    case Kind::kJpeg:
      return probe_jpeg(buf, out_h, out_w) ? 0 : -2;
#endif
#ifdef LF_HAVE_PNG
    case Kind::kPng:
      return probe_png(buf, out_h, out_w) ? 0 : -2;
#endif
    default:
      return -4;
  }
}

// Load ANY supported image (PGM/PPM always; JPEG/PNG when built with the
// system codecs) into a float32 gray buffer, resizing if oh/ow > 0.
// Color collapses via the same BT.601 kernel as the raw-RGB entry point.
// Returns 0 ok, -1 unreadable, -2 corrupt, -4 unsupported format.
int lf_load_image_gray(const char* path, float* dst, int64_t oh, int64_t ow,
                       int64_t* out_h, int64_t* out_w) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  const Kind kind = sniff(buf);
  if (kind == Kind::kPnm5 || kind == Kind::kPnm6)
    return lf_load_pnm_gray(path, dst, oh, ow, out_h, out_w);

  std::vector<uint8_t> pix;
  int64_t h = 0, w = 0;
  int channels = 0;
  bool ok = false;
  switch (kind) {
#ifdef LF_HAVE_JPEG
    case Kind::kJpeg:
      ok = decode_jpeg(buf, &pix, &h, &w, &channels);
      break;
#endif
#ifdef LF_HAVE_PNG
    case Kind::kPng:
      ok = decode_png(buf, &pix, &h, &w, &channels);
      break;
#endif
    default:
      return -4;
  }
  if (!ok || h <= 0 || w <= 0) return -2;
  *out_h = h;
  *out_w = w;
  std::vector<float> gray(h * w);
  if (channels == 1) {
    lf_gray_u8_to_f32(pix.data(), gray.data(), h * w);
  } else if (channels == 3) {
    lf_rgb_u8_to_gray_f32(pix.data(), gray.data(), h * w);
  } else {
    return -2;
  }
  return finish_gray(gray.data(), h, w, dst, oh, ow);
}

// ---------------------------------------------------------------------
// threaded frame pipeline (prefetching data loader)
// ---------------------------------------------------------------------

namespace {

struct Frame {
  int64_t index;
  std::vector<float> data;
  int status;
};

struct Pipeline {
  std::vector<std::string> paths;
  int64_t oh, ow;
  int64_t next_submit = 0;   // next path index to hand to a worker
  int64_t next_emit = 0;     // next frame index to emit in order
  size_t queue_cap;
  std::mutex mu;
  std::condition_variable cv_space, cv_ready;
  // completed frames waiting to be emitted in order
  std::vector<Frame> done;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
};

void worker_loop(Pipeline* p) {
  while (true) {
    int64_t idx;
    {
      std::unique_lock<std::mutex> lk(p->mu);
      p->cv_space.wait(lk, [&] {
        return p->stop ||
               (p->next_submit < (int64_t)p->paths.size() &&
                p->done.size() < p->queue_cap);
      });
      if (p->stop || p->next_submit >= (int64_t)p->paths.size()) return;
      idx = p->next_submit++;
    }
    Frame fr;
    fr.index = idx;
    fr.data.resize(p->oh * p->ow);
    int64_t sh, sw;
    fr.status = lf_load_image_gray(p->paths[idx].c_str(), fr.data.data(),
                                   p->oh, p->ow, &sh, &sw);
    {
      std::lock_guard<std::mutex> lk(p->mu);
      p->done.push_back(std::move(fr));
    }
    p->cv_ready.notify_all();
  }
}

}  // namespace

void* lf_pipeline_create(const char** paths, int64_t n_paths, int64_t oh,
                         int64_t ow, int n_threads, int64_t queue_cap) {
  auto* p = new Pipeline();
  p->paths.assign(paths, paths + n_paths);
  p->oh = oh;
  p->ow = ow;
  p->queue_cap = queue_cap > 0 ? (size_t)queue_cap : 4;
  if (n_threads < 1) n_threads = 1;
  for (int i = 0; i < n_threads; ++i) {
    p->workers.emplace_back(worker_loop, p);
  }
  return p;
}

// Blocking: writes the next frame (in submission order) into dst.
// Returns the frame's load status (0 = ok), or -100 when exhausted.
int lf_pipeline_next(void* handle, float* dst) {
  auto* p = static_cast<Pipeline*>(handle);
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->next_emit >= (int64_t)p->paths.size()) return -100;
  const int64_t want = p->next_emit;
  p->cv_ready.wait(lk, [&] {
    for (const auto& f : p->done)
      if (f.index == want) return true;
    return false;
  });
  for (size_t i = 0; i < p->done.size(); ++i) {
    if (p->done[i].index == want) {
      const int status = p->done[i].status;
      if (status == 0) {
        std::memcpy(dst, p->done[i].data.data(),
                    sizeof(float) * p->oh * p->ow);
      }
      p->done.erase(p->done.begin() + i);
      ++p->next_emit;
      p->cv_space.notify_all();
      return status;
    }
  }
  return -101;  // unreachable
}

void lf_pipeline_destroy(void* handle) {
  auto* p = static_cast<Pipeline*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_space.notify_all();
  p->cv_ready.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
