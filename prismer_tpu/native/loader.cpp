// Native data-loader worker: JPEG decode + bilinear resize.
//
// The reference leans on torchvision/PIL inside 8 torch DataLoader worker
// processes (dataset/__init__.py:36-43) — its only native IO path is
// whatever pillow links. This module gives the TPU loader a GIL-releasing
// C++ fast path: libjpeg decode straight into a caller-shaped float32
// buffer with fused bilinear resize + mean/std normalization, exposed via
// the raw CPython C API (no pybind11 in this image).
//
// Python surface (see native/__init__.py):
//   decode_jpeg_resize(bytes, out_h, out_w, mean3, std3) -> np-ready
//       float32 buffer (out_h, out_w, 3), bilinear half-pixel resize
//   decode_jpeg_shape(bytes) -> (h, w)
//   decode_png(bytes) -> (bytes, (h, w, channels)) uint8, 1 or 3 channels
//       (palette expanded to RGB, 16-bit stripped, alpha dropped) — the
//       expert-label PNG fast path for data/labels.py

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <jpeglib.h>
#include <png.h>

#include <cmath>
#include <csetjmp>
#include <cstring>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_rgb(const unsigned char* data, size_t size,
                std::vector<unsigned char>* out, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out->resize(static_cast<size_t>(*h) * (*w) * 3);
  const int stride = (*w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out->data() +
        static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// bilinear, half-pixel centers (torch/PIL 'bilinear' convention)
void resize_normalize(const unsigned char* src, int sh, int sw,
                      float* dst, int dh, int dw,
                      const float* mean, const float* std) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= sh ? sh - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= sh ? sh - 1 : y0 + 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= sw ? sw - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= sw ? sw - 1 : x0 + 1);
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(static_cast<size_t>(y0c) * sw + x0c) * 3 + c];
        float v01 = src[(static_cast<size_t>(y0c) * sw + x1c) * 3 + c];
        float v10 = src[(static_cast<size_t>(y1c) * sw + x0c) * 3 + c];
        float v11 = src[(static_cast<size_t>(y1c) * sw + x1c) * 3 + c];
        float top = v00 * (1 - wx) + v01 * wx;
        float bot = v10 * (1 - wx) + v11 * wx;
        float val = (top * (1 - wy) + bot * wy) / 255.0f;
        dst[(static_cast<size_t>(y) * dw + x) * 3 + c] =
            (val - mean[c]) / std[c];
      }
    }
  }
}

PyObject* py_decode_jpeg_resize(PyObject*, PyObject* args) {
  Py_buffer buf;
  int dh, dw;
  float mean[3], std[3];
  if (!PyArg_ParseTuple(args, "y*ii(fff)(fff)", &buf, &dh, &dw,
                        &mean[0], &mean[1], &mean[2],
                        &std[0], &std[1], &std[2])) {
    return nullptr;
  }
  std::vector<unsigned char> rgb;
  int sh = 0, sw = 0;
  bool ok;
  std::vector<float> out(static_cast<size_t>(dh) * dw * 3);
  Py_BEGIN_ALLOW_THREADS
  ok = decode_rgb(static_cast<const unsigned char*>(buf.buf), buf.len,
                  &rgb, &sh, &sw);
  if (ok) {
    resize_normalize(rgb.data(), sh, sw, out.data(), dh, dw, mean, std);
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, "libjpeg decode failed");
    return nullptr;
  }
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()),
      static_cast<Py_ssize_t>(out.size() * sizeof(float)));
  if (bytes == nullptr) return nullptr;
  PyObject* shape = Py_BuildValue("(iii)", dh, dw, 3);
  PyObject* result = PyTuple_Pack(2, bytes, shape);
  Py_DECREF(bytes);
  Py_DECREF(shape);
  return result;
}

PyObject* py_decode_jpeg_shape(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "libjpeg header parse failed");
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, static_cast<unsigned char*>(buf.buf),
               static_cast<unsigned long>(buf.len));
  jpeg_read_header(&cinfo, TRUE);
  int h = cinfo.image_height, w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  PyBuffer_Release(&buf);
  return Py_BuildValue("(ii)", h, w);
}

struct PngReadCtx {
  const unsigned char* data;
  size_t size;
  size_t off;
};

void png_read_fn(png_structp p, png_bytep out, png_size_t n) {
  auto* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(p));
  if (ctx->off + n > ctx->size) png_error(p, "unexpected end of PNG data");
  std::memcpy(out, ctx->data + ctx->off, n);
  ctx->off += n;
}

bool decode_png_buf(const unsigned char* data, size_t size,
                    std::vector<unsigned char>* out, int* h, int* w,
                    int* ch) {
  if (size < 8 || png_sig_cmp(data, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
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
  PngReadCtx ctx{data, size, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);
  png_uint_32 W = 0, H = 0;
  int bit_depth = 0, color_type = 0;
  png_get_IHDR(png, info, &W, &H, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  int channels = png_get_channels(png, info);
  if (channels != 1 && channels != 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  *h = static_cast<int>(H);
  *w = static_cast<int>(W);
  *ch = channels;
  out->resize(static_cast<size_t>(H) * W * channels);
  std::vector<png_bytep> rows(H);
  for (png_uint_32 y = 0; y < H; ++y)
    rows[y] = out->data() + static_cast<size_t>(y) * W * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

PyObject* py_decode_png(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  std::vector<unsigned char> out;
  int h = 0, w = 0, ch = 0;
  bool ok;
  Py_BEGIN_ALLOW_THREADS
  ok = decode_png_buf(static_cast<const unsigned char*>(buf.buf), buf.len,
                      &out, &h, &w, &ch);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, "libpng decode failed/unsupported");
    return nullptr;
  }
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()),
      static_cast<Py_ssize_t>(out.size()));
  if (bytes == nullptr) return nullptr;
  PyObject* shape = Py_BuildValue("(iii)", h, w, ch);
  PyObject* result = PyTuple_Pack(2, bytes, shape);
  Py_DECREF(bytes);
  Py_DECREF(shape);
  return result;
}

PyMethodDef methods[] = {
    {"decode_png", py_decode_png, METH_VARARGS,
     "decode_png(data) -> (bytes, (h, w, channels))"},
    {"decode_jpeg_resize", py_decode_jpeg_resize, METH_VARARGS,
     "decode_jpeg_resize(data, out_h, out_w, mean, std) -> (bytes, shape)"},
    {"decode_jpeg_shape", py_decode_jpeg_shape, METH_VARARGS,
     "decode_jpeg_shape(data) -> (h, w)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_native_loader",
                      "libjpeg decode + fused resize/normalize", -1,
                      methods};

}  // namespace

PyMODINIT_FUNC PyInit__native_loader() { return PyModule_Create(&module); }
