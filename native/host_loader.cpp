// Native host data-loader: threaded JPEG/PNG decode + bilinear resize +
// padded-batch placement, called from Python via ctypes
// (ursonet_tpu/data/native_loader.py).
//
// Replaces the reference's multiprocessing worker pool (reference
// net.py:1147-1163) on the host side of the input pipeline: the Python
// loop only shuffles ids and hands a list of file paths here; this code
// fills the uint8 batch tensor [N, H, W, 3] in parallel (decode at native
// resolution -> edge-aligned bilinear resize to the content window ->
// write at the pad offset, zero elsewhere), which is exactly the
// resize/pad64/square geometry of ops/image.resize_image.
//
// Build: see ursonet_tpu/data/native_loader.py (g++ -O3 -shared -fPIC
// -ljpeg -lpng -lz -lpthread).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // interleaved, c channels
};

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // grayscale jpgs expand to RGB here
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = cinfo.output_components;  // 3 after JCS_RGB
  out->data.resize(size_t(out->h) * out->w * out->c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() +
                   size_t(cinfo.output_scanline) * out->w * out->c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// PNG decode (libpng) — expands palette/gray/16-bit to 8-bit RGB or RGBA.
// ---------------------------------------------------------------------------

bool decode_png(FILE* f, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                             nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->h = png_get_image_height(png, info);
  out->w = png_get_image_width(png, info);
  out->c = png_get_channels(png, info);  // 3 or 4
  out->data.resize(size_t(out->h) * out->w * out->c);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * out->c;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// RGBA/odd channel counts -> RGB (the reference normalizes reads the same
// way, urso.py:143-151 / speed.py:149-157).
void to_rgb(Image* img) {
  if (img->c == 3) return;
  std::vector<uint8_t> rgb(size_t(img->h) * img->w * 3);
  const uint8_t* src = img->data.data();
  uint8_t* dst = rgb.data();
  size_t n = size_t(img->h) * img->w;
  if (img->c == 4) {
    for (size_t i = 0; i < n; ++i) {
      dst[3 * i] = src[4 * i];
      dst[3 * i + 1] = src[4 * i + 1];
      dst[3 * i + 2] = src[4 * i + 2];
    }
  } else if (img->c == 1) {
    for (size_t i = 0; i < n; ++i) {
      dst[3 * i] = dst[3 * i + 1] = dst[3 * i + 2] = src[i];
    }
  }
  img->data.swap(rgb);
  img->c = 3;
}

// Edge-aligned bilinear resize (same sampling as cv2.resize /
// skimage order=1: sample centers at (i+0.5)*scale-0.5), RGB u8 -> u8,
// written into a strided destination (the padded batch tensor).
void resize_into(const Image& src, uint8_t* dst, int dst_h, int dst_w,
                 int row_stride /*bytes*/, float fy, float fx) {
  std::vector<int> x0(dst_w), x1(dst_w);
  std::vector<float> wx(dst_w);
  for (int j = 0; j < dst_w; ++j) {
    float xs = (j + 0.5f) * fx - 0.5f;
    int x = int(floorf(xs));
    float t = xs - x;
    if (x < 0) { x = 0; t = 0.f; }
    if (x >= src.w - 1) { x = src.w - 1; t = 0.f; }
    x0[j] = x;
    x1[j] = x + 1 < src.w ? x + 1 : src.w - 1;
    wx[j] = t;
  }
  for (int i = 0; i < dst_h; ++i) {
    float ys = (i + 0.5f) * fy - 0.5f;
    int y = int(floorf(ys));
    float ty = ys - y;
    if (y < 0) { y = 0; ty = 0.f; }
    if (y >= src.h - 1) { y = src.h - 1; ty = 0.f; }
    int y1 = y + 1 < src.h ? y + 1 : src.h - 1;
    const uint8_t* r0 = src.data.data() + size_t(y) * src.w * 3;
    const uint8_t* r1 = src.data.data() + size_t(y1) * src.w * 3;
    uint8_t* drow = dst + size_t(i) * row_stride;
    for (int j = 0; j < dst_w; ++j) {
      const float tx = wx[j];
      const uint8_t* a = r0 + 3 * x0[j];
      const uint8_t* b = r0 + 3 * x1[j];
      const uint8_t* c = r1 + 3 * x0[j];
      const uint8_t* d = r1 + 3 * x1[j];
      for (int k = 0; k < 3; ++k) {
        float top = a[k] + (b[k] - a[k]) * tx;
        float bot = c[k] + (d[k] - c[k]) * tx;
        float v = top + (bot - top) * ty;
        drow[3 * j + k] = uint8_t(v);  // truncate: parity with reference resize
      }
    }
  }
}

}  // namespace

extern "C" {

// Fill out[n, out_h, out_w, 3] (zeroed here) with decoded images resized
// to (content_h, content_w) placed at (top, left). Returns 0 on success,
// else 1-based index of the first failing path.
int un_load_batch(const char** paths, int n, uint8_t* out, int out_h,
                  int out_w, int content_h, int content_w, int top,
                  int left, int nthreads) {
  const size_t img_bytes = size_t(out_h) * out_w * 3;
  memset(out, 0, img_bytes * n);
  std::atomic<int> next(0), failed(0);
  if (nthreads < 1) nthreads = 1;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      Image img;
      if (!decode_file(paths[i], &img)) {
        failed.store(i + 1);
        return;
      }
      to_rgb(&img);
      uint8_t* dst = out + img_bytes * i +
                     (size_t(top) * out_w + left) * 3;
      resize_into(img, dst, content_h, content_w, out_w * 3,
                  float(img.h) / content_h, float(img.w) / content_w);
    }
  };
  std::vector<std::thread> ts;
  int nt = nthreads < n ? nthreads : n;
  for (int t = 0; t < nt; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  return failed.load();
}

// Single-image decode at native resolution into caller buffer of capacity
// cap bytes; writes RGB u8 and returns 0, setting *h/*w. Returns 1 on
// decode failure, 2 if the buffer is too small.
int un_decode(const char* path, uint8_t* out, long cap, int* h, int* w) {
  Image img;
  if (!decode_file(path, &img)) return 1;
  to_rgb(&img);
  long need = long(img.h) * img.w * 3;
  if (need > cap) return 2;
  memcpy(out, img.data.data(), need);
  *h = img.h;
  *w = img.w;
  return 0;
}
}
