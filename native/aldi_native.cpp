// Native host data-loader core for aldi_tpu.
//
// The reference framework's host pipeline runs on torch DataLoader worker
// *processes* with cv2/PIL doing decode+augment per record (SURVEY.md
// section 3.4). This module is the TPU rebuild's native equivalent: the
// per-record hot path — file read, JPEG/PNG decode, bilinear resize,
// horizontal flip, channel swap, paste onto the fixed canvas — fused in
// C++ with the GIL released, so plain Python threads scale the pipeline
// without worker processes or pickling.
//
// Exposed function:
//   load_resize_pad(path, short_edge, max_size, canvas_h, canvas_w,
//                   bgr, flip) -> (ndarray[canvas_h, canvas_w, 3] uint8,
//                                  out_h, out_w, scale)
//
// Build: python native/setup.py build_ext --inplace  (see native/setup.py)

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0;
  std::vector<unsigned char> rgb;  // H*W*3
};

bool read_file(const char* path, std::vector<unsigned char>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t got = std::fread(out->data(), 1, n, f);
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const std::vector<unsigned char>& buf, Image* img) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf.data(), buf.size());
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->h = cinfo.output_height;
  img->w = cinfo.output_width;
  img->rgb.resize(static_cast<size_t>(img->h) * img->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = img->rgb.data() +
        static_cast<size_t>(cinfo.output_scanline) * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(const std::vector<unsigned char>& buf, Image* img) {
  png_image pi;
  std::memset(&pi, 0, sizeof(pi));
  pi.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&pi, buf.data(), buf.size()))
    return false;
  pi.format = PNG_FORMAT_RGB;
  img->h = pi.height;
  img->w = pi.width;
  img->rgb.resize(PNG_IMAGE_SIZE(pi));
  if (!png_image_finish_read(&pi, nullptr, img->rgb.data(), 0, nullptr)) {
    png_image_free(&pi);
    return false;
  }
  return true;
}

bool decode(const std::vector<unsigned char>& buf, Image* img) {
  if (buf.size() >= 8 && buf[0] == 0x89 && buf[1] == 'P') {
    return decode_png(buf, img);
  }
  if (buf.size() >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    return decode_jpeg(buf, img);
  }
  return false;
}

// Bilinear resize (PIL-compatible half-pixel sampling) fused with optional
// horizontal flip, optional RGB->BGR swap, and paste into the canvas.
void resize_flip_swap_paste(const Image& src, int out_h, int out_w,
                            bool flip, bool bgr, unsigned char* canvas,
                            int canvas_w_stride) {
  const float sy = static_cast<float>(src.h) / out_h;
  const float sx = static_cast<float>(src.w) / out_w;
  const int c0 = bgr ? 2 : 0;
  const int c2 = bgr ? 0 : 2;
  std::vector<int> x0s(out_w), x1s(out_w);
  std::vector<float> lxs(out_w);
  for (int ox = 0; ox < out_w; ++ox) {
    const int ix = flip ? (out_w - 1 - ox) : ox;
    float fx = (ix + 0.5f) * sx - 0.5f;
    fx = std::max(0.0f, std::min(fx, static_cast<float>(src.w - 1)));
    x0s[ox] = static_cast<int>(fx);
    x1s[ox] = std::min(x0s[ox] + 1, src.w - 1);
    lxs[ox] = fx - x0s[ox];
  }
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(src.h - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, src.h - 1);
    const float ly = fy - y0;
    const unsigned char* r0 = src.rgb.data() + static_cast<size_t>(y0) * src.w * 3;
    const unsigned char* r1 = src.rgb.data() + static_cast<size_t>(y1) * src.w * 3;
    unsigned char* dst = canvas + static_cast<size_t>(oy) * canvas_w_stride * 3;
    for (int ox = 0; ox < out_w; ++ox) {
      const int x0 = x0s[ox] * 3, x1 = x1s[ox] * 3;
      const float lx = lxs[ox];
      for (int ch = 0; ch < 3; ++ch) {
        const float top = r0[x0 + ch] * (1 - lx) + r0[x1 + ch] * lx;
        const float bot = r1[x0 + ch] * (1 - lx) + r1[x1 + ch] * lx;
        const float v = top * (1 - ly) + bot * ly;
        const int oc = (ch == 0) ? c0 : (ch == 2 ? c2 : 1);
        dst[ox * 3 + oc] = static_cast<unsigned char>(v + 0.5f);
      }
    }
  }
}

PyObject* load_resize_pad(PyObject*, PyObject* args) {
  const char* path;
  int short_edge, max_size, canvas_h, canvas_w, bgr, flip;
  if (!PyArg_ParseTuple(args, "siiiipp", &path, &short_edge, &max_size,
                        &canvas_h, &canvas_w, &bgr, &flip))
    return nullptr;

  npy_intp dims[3] = {canvas_h, canvas_w, 3};
  PyObject* arr = PyArray_ZEROS(3, dims, NPY_UINT8, 0);
  if (!arr) return nullptr;
  unsigned char* canvas = static_cast<unsigned char*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)));

  Image img;
  bool ok;
  int out_h = 0, out_w = 0;
  double scale = 1.0;
  Py_BEGIN_ALLOW_THREADS;
  std::vector<unsigned char> buf;
  ok = read_file(path, &buf) && decode(buf, &img);
  if (ok) {
    scale = static_cast<double>(short_edge) / std::min(img.h, img.w);
    if (std::max(img.h, img.w) * scale > max_size)
      scale = static_cast<double>(max_size) / std::max(img.h, img.w);
    out_h = std::min(static_cast<int>(img.h * scale + 0.5), canvas_h);
    out_w = std::min(static_cast<int>(img.w * scale + 0.5), canvas_w);
    resize_flip_swap_paste(img, out_h, out_w, flip, bgr, canvas, canvas_w);
  }
  Py_END_ALLOW_THREADS;

  if (!ok) {
    Py_DECREF(arr);
    PyErr_Format(PyExc_IOError, "failed to read/decode %s", path);
    return nullptr;
  }
  return Py_BuildValue("(Niid)", arr, out_h, out_w, scale);
}

PyMethodDef methods[] = {
    {"load_resize_pad", load_resize_pad, METH_VARARGS,
     "decode + resize-shortest-edge + flip + channel swap + pad to canvas"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "aldi_native",
    "native data-loader core (decode/resize/pad, GIL-free)", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_aldi_native() {
  import_array();
  return PyModule_Create(&module);
}
