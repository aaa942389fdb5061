// jpegdec — native region-of-interest JPEG decoding for the patch loader.
//
// The per-item hot path (ref nuscenes.py:90-194) crops a small square patch
// (64–512 px) out of a 1600x900 camera frame, yet decoding the WHOLE frame
// costs 16.8 of the 18.6 ms/item (docs/BENCH.md "Loader"). libjpeg-turbo can
// decode just the needed window: jpeg_skip_scanlines() skips the IDCT /
// upsample / color-convert work for rows above the crop, jpeg_crop_scanline()
// restricts per-row work to the crop's iMCU columns, and aborting after the
// crop's last row skips the entropy decode of everything below it.
//
// Exactness: cropped decode must be bit-identical to full-decode-then-crop.
// Fancy (context-based) chroma upsampling reads neighboring samples, so rows
// right after a skip and columns at the crop edge can differ from a full
// decode. We therefore expand the window by MARGIN=16 px on every side
// (≥ one iMCU, vs a ±2 px context window for h2v2 fancy upsampling), decode
// the margin, and keep only the requested pixels. Bit-exactness vs the PIL
// full decode is pinned in tests/test_native_jpeg.py across 4:2:0 / 4:2:2 /
// 4:4:4 / grayscale sources.
//
// Progressive JPEGs take the same path (libjpeg buffers whole-image entropy
// state internally, so only the IDCT-side savings apply); any libjpeg error
// longjmps out and returns nonzero, and the Python caller falls back to PIL.
//
// Build: make -C native   (g++ -O3 -shared -fPIC -ljpeg)

#include <algorithm>
#include <csetjmp>
#include <cstdint>
#include <cstdio>  // jpeglib.h uses FILE without including stdio itself
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jmp;
};

void err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<ErrMgr*>(cinfo->err)->jmp, 1);
}

void emit_silent(j_common_ptr, int) {}

constexpr int kMargin = 16;  // ≥ one iMCU and ≥ the fancy-upsampling context

}  // namespace

extern "C" {

// Header-only parse. Fills (w, h); returns 0 on success.
int gdt_jpeg_dims(const uint8_t* buf, long len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  jerr.pub.emit_message = emit_silent;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *w = (int)cinfo.image_width;
  *h = (int)cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode the region [rx, rx+rw) x [ry, ry+rh) into out (rh x rw x 3, RGB u8).
// The region may extend past the image on any side; out-of-image pixels are
// zero-filled (PIL crop semantics). Returns 0 on success.
int gdt_jpeg_region(const uint8_t* buf, long len, int rx, int ry, int rw,
                    int rh, uint8_t* out) {
  std::memset(out, 0, (size_t)rw * rh * 3);
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  jerr.pub.emit_message = emit_silent;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  const int W = (int)cinfo.image_width;
  const int H = (int)cinfo.image_height;
  const int ix1 = std::max(rx, 0);
  const int iy1 = std::max(ry, 0);
  const int ix2 = std::min(rx + rw, W);
  const int iy2 = std::min(ry + rh, H);
  if (ix1 >= ix2 || iy1 >= iy2) {  // fully out of frame: all zeros
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_start_decompress(&cinfo);

  JDIMENSION xoff = (JDIMENSION)std::max(ix1 - kMargin, 0);
  JDIMENSION xw = (JDIMENSION)(std::min(ix2 + kMargin, W) - (int)xoff);
  jpeg_crop_scanline(&cinfo, &xoff, &xw);  // aligns outward to iMCU bounds

  const int skip_to = std::max(iy1 - kMargin, 0);
  if (skip_to > 0) jpeg_skip_scanlines(&cinfo, (JDIMENSION)skip_to);

  std::vector<uint8_t> row((size_t)xw * cinfo.output_components);
  JSAMPROW rp = row.data();
  while ((int)cinfo.output_scanline < iy2) {
    const int y = (int)cinfo.output_scanline;  // row produced by this read
    if (jpeg_read_scanlines(&cinfo, &rp, 1) != 1) {
      jpeg_destroy_decompress(&cinfo);
      return 3;
    }
    if (y >= iy1) {
      uint8_t* dst = out + ((size_t)(y - ry) * rw + (ix1 - rx)) * 3;
      std::memcpy(dst, row.data() + (size_t)(ix1 - (int)xoff) * 3,
                  (size_t)(ix2 - ix1) * 3);
    }
  }
  jpeg_abort_decompress(&cinfo);  // skip the entropy decode below the crop
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
