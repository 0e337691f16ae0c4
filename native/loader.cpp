// robustart_tpu native data loader — C++ threaded JPEG decode + resize core.
//
// TPU-native replacement for the reference's NVIDIA DALI dependency
// (reference config `use_dali: True`, resnet50/config.yaml:38; inventory
// SURVEY.md §2.10): a pthread worker pool decodes JPEGs with libjpeg,
// bilinear-resizes (center-aligned taps, OpenCV/PIL convention) with a
// val-mode resize-shorter-side + center-crop pipeline, and fills a bounded
// ring of fixed-shape uint8 NHWC batches that the Python side hands straight
// to jax.device_put. Exposed through a plain C ABI consumed via ctypes
// (no pybind11 in this environment).
//
// Build: make -C native  (produces librobustart_loader.so)

#include <cstdio>  // jpeglib.h needs FILE declared first

#include <jpeglib.h>

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

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG byte buffer to RGB8. Returns empty vector on failure.
// min_w/min_h > 0 enable DCT-domain scaled decode (libjpeg scale_num/8,
// the DALI/turbojpeg fast path): the LARGEST downscale whose output still
// covers (min_w, min_h) is decoded directly from the coefficients —
// quadratically less IDCT + colorspace work, and the following bilinear
// resize reads far fewer pixels. Not bit-identical to full decode+resize
// (it is a different, slightly sharper low-pass); gate via Loader.dct_scale.
std::vector<uint8_t> decode_jpeg(const uint8_t* data, size_t size, int* w,
                                 int* h, int min_w = 0, int min_h = 0) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  std::vector<uint8_t> out;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return {};
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (min_w > 0 && min_h > 0) {
    unsigned m = 8;
    while (m > 1) {
      const long sw = (static_cast<long>(cinfo.image_width) * (m - 1) + 7) / 8;
      const long sh =
          (static_cast<long>(cinfo.image_height) * (m - 1) + 7) / 8;
      if (sw >= min_w && sh >= min_h) {
        --m;
      } else {
        break;
      }
    }
    cinfo.scale_num = m;
    cinfo.scale_denom = 8;
  }
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out.resize(static_cast<size_t>(*w) * (*h) * 3);
  const size_t stride = static_cast<size_t>(*w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return out;
}

// Bilinear resize RGB8 HWC, center-aligned taps: src = (i+0.5)*scale - 0.5.
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> fx(dw);
  for (int x = 0; x < dw; ++x) {
    float sx = (x + 0.5f) * scale_x - 0.5f;
    if (sx < 0) sx = 0;
    int ix = static_cast<int>(sx);
    if (ix > sw - 2) ix = sw - 2 < 0 ? 0 : sw - 2;
    x0[x] = ix;
    x1[x] = ix + 1 < sw ? ix + 1 : sw - 1;
    fx[x] = sx - ix;
  }
  for (int y = 0; y < dh; ++y) {
    float sy = (y + 0.5f) * scale_y - 0.5f;
    if (sy < 0) sy = 0;
    int iy = static_cast<int>(sy);
    if (iy > sh - 2) iy = sh - 2 < 0 ? 0 : sh - 2;
    int iy1 = iy + 1 < sh ? iy + 1 : sh - 1;
    float fy = sy - iy;
    const uint8_t* r0 = src + static_cast<size_t>(iy) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(iy1) * sw * 3;
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const int a = x0[x] * 3, b = x1[x] * 3;
      const float gx = fx[x];
      for (int c = 0; c < 3; ++c) {
        const float top = r0[a + c] * (1 - gx) + r0[b + c] * gx;
        const float bot = r1[a + c] * (1 - gx) + r1[b + c] * gx;
        float v = top * (1 - fy) + bot * fy;
        drow[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

struct Batch {
  std::vector<uint8_t> images;  // (bs, H, W, 3)
  std::vector<int32_t> labels;
  std::vector<int32_t> indices;
  int count = 0;  // valid rows
};

struct Loader {
  std::vector<std::string> paths;
  std::vector<int32_t> labels;
  int out_h, out_w, batch_size, test_resize;
  int mode;  // 0 = plain resize, 1 = resize-shorter + center crop (ONECROP)
  int dct_scale = 0;  // 1 = DCT-domain scaled decode (see decode_jpeg)
  size_t queue_cap;

  std::vector<std::thread> workers;
  std::thread assembler;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::queue<Batch> ready;
  std::atomic<size_t> next_index{0};
  std::atomic<bool> stop{false};
  bool done_producing = false;

  // per-sample staging
  std::mutex stage_mu;
  std::condition_variable stage_cv;
  std::vector<std::pair<size_t, std::vector<uint8_t>>> staged;  // (idx, img)
  std::atomic<size_t> n_staged{0};
  size_t n_total = 0;

  void decode_one(size_t idx, std::vector<uint8_t>* out) {
    FILE* f = fopen(paths[idx].c_str(), "rb");
    std::vector<uint8_t> bytes;
    if (f) {
      fseek(f, 0, SEEK_END);
      long sz = ftell(f);
      fseek(f, 0, SEEK_SET);
      bytes.resize(sz);
      if (fread(bytes.data(), 1, sz, f) != static_cast<size_t>(sz)) {
        bytes.clear();
      }
      fclose(f);
    }
    out->assign(static_cast<size_t>(out_h) * out_w * 3, 0);
    int w = 0, h = 0;
    const int min_w = dct_scale ? (mode == 1 ? test_resize : out_w) : 0;
    const int min_h = dct_scale ? (mode == 1 ? test_resize : out_h) : 0;
    std::vector<uint8_t> rgb =
        bytes.empty()
            ? std::vector<uint8_t>()
            : decode_jpeg(bytes.data(), bytes.size(), &w, &h, min_w, min_h);
    if (rgb.empty()) return;  // unreadable -> black image
    if (mode == 1) {
      // resize shorter side to test_resize, center crop out_h x out_w
      int rw, rh;
      if (w <= h) {
        rw = test_resize;
        rh = static_cast<int>(static_cast<int64_t>(test_resize) * h / w);
      } else {
        rh = test_resize;
        rw = static_cast<int>(static_cast<int64_t>(test_resize) * w / h);
      }
      std::vector<uint8_t> tmp(static_cast<size_t>(rw) * rh * 3);
      resize_bilinear(rgb.data(), h, w, tmp.data(), rh, rw);
      const int top = (rh - out_h) / 2, left = (rw - out_w) / 2;
      for (int y = 0; y < out_h; ++y) {
        memcpy(out->data() + static_cast<size_t>(y) * out_w * 3,
               tmp.data() + (static_cast<size_t>(y + top) * rw + left) * 3,
               static_cast<size_t>(out_w) * 3);
      }
    } else {
      resize_bilinear(rgb.data(), h, w, out->data(), out_h, out_w);
    }
  }

  void worker_loop() {
    while (!stop.load()) {
      size_t idx = next_index.fetch_add(1);
      if (idx >= n_total) return;
      std::vector<uint8_t> img;
      decode_one(idx, &img);
      {
        std::lock_guard<std::mutex> lk(stage_mu);
        staged.emplace_back(idx, std::move(img));
        ++n_staged;
      }
      stage_cv.notify_one();
    }
  }

  void assemble_loop() {
    const size_t img_sz = static_cast<size_t>(out_h) * out_w * 3;
    size_t consumed = 0;
    std::vector<std::pair<size_t, std::vector<uint8_t>>> pending;
    while (consumed < n_total && !stop.load()) {
      {
        std::unique_lock<std::mutex> lk(stage_mu);
        stage_cv.wait_for(lk, std::chrono::milliseconds(50), [&] {
          return !staged.empty() || stop.load();
        });
        for (auto& item : staged) pending.push_back(std::move(item));
        staged.clear();
      }
      while (pending.size() >= static_cast<size_t>(batch_size) ||
             (consumed + pending.size() == n_total && !pending.empty())) {
        Batch b;
        b.images.assign(static_cast<size_t>(batch_size) * img_sz, 0);
        b.labels.assign(batch_size, 0);
        b.indices.assign(batch_size, -1);
        const int take =
            std::min(static_cast<size_t>(batch_size), pending.size());
        for (int i = 0; i < take; ++i) {
          auto& [idx, img] = pending[i];
          memcpy(b.images.data() + static_cast<size_t>(i) * img_sz,
                 img.data(), img_sz);
          b.labels[i] = labels[idx];
          b.indices[i] = static_cast<int32_t>(idx);
        }
        b.count = take;
        pending.erase(pending.begin(), pending.begin() + take);
        consumed += take;
        {
          std::unique_lock<std::mutex> lk(mu);
          cv_push.wait(lk,
                       [&] { return ready.size() < queue_cap || stop.load(); });
          if (stop.load()) return;
          ready.push(std::move(b));
        }
        cv_pop.notify_one();
      }
    }
    {
      std::lock_guard<std::mutex> lk(mu);
      done_producing = true;
    }
    cv_pop.notify_all();
  }
};

}  // namespace

extern "C" {

void* rl_create(const char** paths, const int32_t* labels, int64_t n,
                int out_h, int out_w, int batch_size, int test_resize,
                int mode, int num_threads, int queue_cap, int dct_scale) {
  auto* loader = new Loader();
  loader->paths.reserve(n);
  for (int64_t i = 0; i < n; ++i) loader->paths.emplace_back(paths[i]);
  loader->labels.assign(labels, labels + n);
  loader->out_h = out_h;
  loader->out_w = out_w;
  loader->batch_size = batch_size;
  loader->test_resize = test_resize;
  loader->mode = mode;
  loader->queue_cap = queue_cap > 0 ? queue_cap : 4;
  loader->dct_scale = dct_scale;
  loader->n_total = static_cast<size_t>(n);
  for (int t = 0; t < num_threads; ++t) {
    loader->workers.emplace_back([loader] { loader->worker_loop(); });
  }
  loader->assembler = std::thread([loader] { loader->assemble_loop(); });
  return loader;
}

// Returns number of valid rows in the batch; 0 = end of data.
int rl_next_batch(void* handle, uint8_t* images, int32_t* labels,
                  int32_t* indices) {
  auto* loader = static_cast<Loader*>(handle);
  Batch b;
  {
    std::unique_lock<std::mutex> lk(loader->mu);
    loader->cv_pop.wait(lk, [&] {
      return !loader->ready.empty() || loader->done_producing ||
             loader->stop.load();
    });
    if (loader->ready.empty()) return 0;
    b = std::move(loader->ready.front());
    loader->ready.pop();
  }
  loader->cv_push.notify_one();
  memcpy(images, b.images.data(), b.images.size());
  memcpy(labels, b.labels.data(), b.labels.size() * sizeof(int32_t));
  memcpy(indices, b.indices.data(), b.indices.size() * sizeof(int32_t));
  return b.count;
}

void rl_destroy(void* handle) {
  auto* loader = static_cast<Loader*>(handle);
  loader->stop.store(true);
  loader->cv_push.notify_all();
  loader->cv_pop.notify_all();
  loader->stage_cv.notify_all();
  for (auto& t : loader->workers) {
    if (t.joinable()) t.join();
  }
  if (loader->assembler.joinable()) loader->assembler.join();
  delete loader;
}

}  // extern "C"
