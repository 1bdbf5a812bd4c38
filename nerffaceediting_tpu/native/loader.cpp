// Native data loader: threaded zip-backed image decoding + batch prefetch.
//
// TPU-native replacement for the reference's torch DataLoader worker
// processes (ref training/training_loop.py:177-179 + training/dataset.py):
// while jitted train steps run on the TPU, a C++ thread pool keeps the host
// input pipeline off the Python GIL — zip entry reads, PNG/JPEG decode,
// resize, (-1,1) float conversion and batch assembly all happen here.
//
// Exposed as a C ABI consumed through ctypes (native/__init__.py). Supports
// the dataset format of apps/dataset_tool.py: a zip of PNG/JPEG files plus
// dataset.json {"labels": [[fname, [25 floats]], ...]}; STORED and DEFLATE
// entries.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// Minimal zip reader (central directory; STORED + DEFLATE)

struct ZipEntry {
  std::string name;
  uint64_t offset;        // offset of local header
  uint32_t comp_size;
  uint32_t uncomp_size;
  uint16_t method;        // 0 = stored, 8 = deflate
};

struct ZipFile {
  FILE* f = nullptr;
  std::vector<ZipEntry> entries;
  std::mutex io_mutex;

  ~ZipFile() {
    if (f) fclose(f);
  }

  bool open(const char* path) {
    f = fopen(path, "rb");
    if (!f) return false;
    // find end-of-central-directory
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    long scan = std::min<long>(size, 1 << 16);
    std::vector<unsigned char> tail(scan);
    fseek(f, size - scan, SEEK_SET);
    if (fread(tail.data(), 1, scan, f) != (size_t)scan) return false;
    long eocd = -1;
    for (long i = scan - 22; i >= 0; --i) {
      if (tail[i] == 0x50 && tail[i + 1] == 0x4b && tail[i + 2] == 0x05 &&
          tail[i + 3] == 0x06) {
        eocd = i;
        break;
      }
    }
    if (eocd < 0) return false;
    auto rd16 = [&](long o) { return (uint32_t)tail[o] | ((uint32_t)tail[o + 1] << 8); };
    auto rd32 = [&](long o) {
      return (uint32_t)tail[o] | ((uint32_t)tail[o + 1] << 8) |
             ((uint32_t)tail[o + 2] << 16) | ((uint32_t)tail[o + 3] << 24);
    };
    uint32_t n_entries = rd16(eocd + 10);
    uint32_t cd_offset = rd32(eocd + 16);

    fseek(f, cd_offset, SEEK_SET);
    for (uint32_t i = 0; i < n_entries; ++i) {
      unsigned char h[46];
      if (fread(h, 1, 46, f) != 46) return false;
      if (!(h[0] == 0x50 && h[1] == 0x4b && h[2] == 0x01 && h[3] == 0x02)) return false;
      auto gr16 = [&](int o) { return (uint32_t)h[o] | ((uint32_t)h[o + 1] << 8); };
      auto gr32 = [&](int o) {
        return (uint32_t)h[o] | ((uint32_t)h[o + 1] << 8) | ((uint32_t)h[o + 2] << 16) |
               ((uint32_t)h[o + 3] << 24);
      };
      ZipEntry e;
      e.method = gr16(10);
      e.comp_size = gr32(20);
      e.uncomp_size = gr32(24);
      uint32_t name_len = gr16(28), extra_len = gr16(30), comment_len = gr16(32);
      e.offset = gr32(42);
      e.name.resize(name_len);
      if (fread(&e.name[0], 1, name_len, f) != name_len) return false;
      fseek(f, extra_len + comment_len, SEEK_CUR);
      entries.push_back(std::move(e));
    }
    return true;
  }

  bool read_entry(const ZipEntry& e, std::vector<unsigned char>& out) {
    std::vector<unsigned char> comp(e.comp_size);
    {
      std::lock_guard<std::mutex> lock(io_mutex);
      // parse local header to find data start
      unsigned char lh[30];
      fseek(f, (long)e.offset, SEEK_SET);
      if (fread(lh, 1, 30, f) != 30) return false;
      uint32_t name_len = (uint32_t)lh[26] | ((uint32_t)lh[27] << 8);
      uint32_t extra_len = (uint32_t)lh[28] | ((uint32_t)lh[29] << 8);
      fseek(f, name_len + extra_len, SEEK_CUR);
      if (fread(comp.data(), 1, e.comp_size, f) != e.comp_size) return false;
    }
    if (e.method == 0) {
      out = std::move(comp);
      return true;
    }
    if (e.method == 8) {
      out.resize(e.uncomp_size);
      z_stream zs{};
      inflateInit2(&zs, -MAX_WBITS);
      zs.next_in = comp.data();
      zs.avail_in = e.comp_size;
      zs.next_out = out.data();
      zs.avail_out = e.uncomp_size;
      int ret = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      return ret == Z_STREAM_END || ret == Z_OK;
    }
    return false;
  }
};

// ---------------------------------------------------------------------------
// Image decoding

struct Image {
  int w = 0, h = 0;
  std::vector<unsigned char> rgb;  // HWC
};

struct PngReadState {
  const unsigned char* data;
  size_t size;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t count) {
  auto* s = (PngReadState*)png_get_io_ptr(png);
  if (s->pos + count > s->size) {
    png_error(png, "read past end");
    return;
  }
  memcpy(out, s->data + s->pos, count);
  s->pos += count;
}

bool decode_png(const std::vector<unsigned char>& buf, Image& img) {
  if (buf.size() < 8 || png_sig_cmp(buf.data(), 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState state{buf.data(), buf.size(), 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_palette_to_rgb(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  img.w = png_get_image_width(png, info);
  img.h = png_get_image_height(png, info);
  img.rgb.resize((size_t)img.w * img.h * 3);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; ++y) rows[y] = img.rgb.data() + (size_t)y * img.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_jpeg(const std::vector<unsigned char>& buf, Image& img) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf.data()), buf.size());
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.rgb.resize((size_t)img.w * img.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = img.rgb.data() + (size_t)cinfo.output_scanline * img.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// bilinear resize (HWC uint8)
void resize_bilinear_u8(const Image& src, Image& dst, int res) {
  dst.w = dst.h = res;
  dst.rgb.resize((size_t)res * res * 3);
  for (int y = 0; y < res; ++y) {
    float fy = ((y + 0.5f) * src.h) / res - 0.5f;
    int y0 = std::max(0, std::min(src.h - 1, (int)fy));
    int y1 = std::min(src.h - 1, y0 + 1);
    float wy = fy - (float)y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < res; ++x) {
      float fx = ((x + 0.5f) * src.w) / res - 0.5f;
      int x0 = std::max(0, std::min(src.w - 1, (int)fx));
      int x1 = std::min(src.w - 1, x0 + 1);
      float wx = fx - (float)x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src.rgb[((size_t)y0 * src.w + x0) * 3 + c];
        float v01 = src.rgb[((size_t)y0 * src.w + x1) * 3 + c];
        float v10 = src.rgb[((size_t)y1 * src.w + x0) * 3 + c];
        float v11 = src.rgb[((size_t)y1 * src.w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst.rgb[((size_t)y * res + x) * 3 + c] = (unsigned char)(v + 0.5f);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// dataset.json parsing: {"labels": [["name", [f, f, ...]], ...]}

bool parse_labels(const std::string& json, std::vector<std::string>& names,
                  std::vector<std::vector<float>>& labels) {
  size_t pos = json.find("\"labels\"");
  if (pos == std::string::npos) return false;
  pos = json.find('[', pos);
  if (pos == std::string::npos) return false;
  ++pos;
  while (pos < json.size()) {
    while (pos < json.size() && (isspace(json[pos]) || json[pos] == ',')) ++pos;
    if (pos >= json.size() || json[pos] == ']') break;
    if (json[pos] != '[') return false;
    ++pos;
    // name string
    while (pos < json.size() && json[pos] != '"') ++pos;
    size_t start = ++pos;
    std::string name;
    while (pos < json.size() && json[pos] != '"') {
      if (json[pos] == '\\' && pos + 1 < json.size()) ++pos;
      name += json[pos++];
    }
    ++pos;
    // float array
    while (pos < json.size() && json[pos] != '[') ++pos;
    ++pos;
    std::vector<float> vals;
    while (pos < json.size() && json[pos] != ']') {
      char* end = nullptr;
      float v = strtof(json.c_str() + pos, &end);
      if (end == json.c_str() + pos) {
        ++pos;
        continue;
      }
      vals.push_back(v);
      pos = end - json.c_str();
      while (pos < json.size() && (json[pos] == ',' || isspace(json[pos]))) ++pos;
    }
    ++pos;  // ']' of floats
    while (pos < json.size() && json[pos] != ']') ++pos;
    ++pos;  // ']' of pair
    names.push_back(std::move(name));
    labels.push_back(std::move(vals));
  }
  return true;
}

// ---------------------------------------------------------------------------
// Loader: sampler + worker pool + bounded batch queue

struct Batch {
  std::vector<float> images;  // (B, 3, R, R) in (-1, 1)
  std::vector<float> labels;  // (B, label_dim)
};

struct Loader {
  ZipFile zip;
  std::vector<size_t> image_entries;       // indices into zip.entries
  std::vector<std::vector<float>> labels;  // aligned with image_entries
  int label_dim = 0;
  int resolution = 0;
  int batch_size = 0;
  int rank = 0, num_replicas = 1;
  uint64_t seed = 0;

  std::vector<std::thread> workers;
  std::queue<Batch*> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::atomic<bool> stop{false};
  size_t max_queue = 4;
  std::atomic<uint64_t> batch_counter{0};

  ~Loader() { shutdown(); }

  void shutdown() {
    stop = true;
    cv_ready.notify_all();
    cv_space.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    workers.clear();
    std::lock_guard<std::mutex> lock(mu);
    while (!ready.empty()) {
      delete ready.front();
      ready.pop();
    }
  }

  // Deterministic pseudo-random index stream sharded by rank — the infinite
  // uniform sampling role of the reference's InfiniteSampler
  // (torch_utils/misc.py:113-144; its window-shuffle is an approximation of
  // uniform sampling, which we use directly).
  size_t sample_index(uint64_t global_step) {
    uint64_t idx = global_step * (uint64_t)num_replicas + (uint64_t)rank;
    std::mt19937_64 rng(seed ^ (idx * 0x9E3779B97F4A7C15ULL + 0xD1B54A32D192ED03ULL));
    std::uniform_int_distribution<uint64_t> dist(0, image_entries.size() - 1);
    return (size_t)dist(rng);
  }

  void worker_loop() {
    while (!stop) {
      uint64_t my_batch = batch_counter.fetch_add(1);
      auto* batch = new Batch;
      batch->images.resize((size_t)batch_size * 3 * resolution * resolution);
      batch->labels.resize((size_t)batch_size * label_dim);
      for (int b = 0; b < batch_size && !stop; ++b) {
        size_t di = sample_index(my_batch * batch_size + b);
        std::vector<unsigned char> buf;
        Image img;
        bool ok = zip.read_entry(zip.entries[image_entries[di]], buf) &&
                  (decode_png(buf, img) || decode_jpeg(buf, img));
        if (!ok) {
          memset(batch->images.data() + (size_t)b * 3 * resolution * resolution, 0,
                 sizeof(float) * 3 * resolution * resolution);
          continue;
        }
        Image resized;
        const Image* use = &img;
        if (img.w != resolution || img.h != resolution) {
          resize_bilinear_u8(img, resized, resolution);
          use = &resized;
        }
        // HWC uint8 → CHW float (-1, 1)
        float* out = batch->images.data() + (size_t)b * 3 * resolution * resolution;
        for (int c = 0; c < 3; ++c)
          for (int y = 0; y < resolution; ++y)
            for (int x = 0; x < resolution; ++x)
              out[((size_t)c * resolution + y) * resolution + x] =
                  use->rgb[((size_t)y * resolution + x) * 3 + c] / 127.5f - 1.0f;
        if (label_dim)
          memcpy(batch->labels.data() + (size_t)b * label_dim, labels[di].data(),
                 sizeof(float) * label_dim);
      }
      std::unique_lock<std::mutex> lock(mu);
      cv_space.wait(lock, [&] { return ready.size() < max_queue || stop; });
      if (stop) {
        delete batch;
        return;
      }
      ready.push(batch);
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* loader_open(const char* path, int resolution, int batch_size, int num_threads,
                  uint64_t seed, int rank, int num_replicas) {
  auto* L = new Loader;
  if (!L->zip.open(path)) {
    delete L;
    return nullptr;
  }
  // collect images + labels
  std::vector<std::string> label_names;
  std::vector<std::vector<float>> label_vals;
  for (size_t i = 0; i < L->zip.entries.size(); ++i) {
    const auto& name = L->zip.entries[i].name;
    auto ends_with = [&](const char* s) {
      size_t l = strlen(s);
      return name.size() >= l &&
             strcasecmp(name.c_str() + name.size() - l, s) == 0;
    };
    if (ends_with(".png") || ends_with(".jpg") || ends_with(".jpeg"))
      L->image_entries.push_back(i);
    else if (name == "dataset.json" || ends_with("/dataset.json")) {
      std::vector<unsigned char> buf;
      if (L->zip.read_entry(L->zip.entries[i], buf))
        parse_labels(std::string(buf.begin(), buf.end()), label_names, label_vals);
    }
  }
  std::sort(L->image_entries.begin(), L->image_entries.end(),
            [&](size_t a, size_t b) { return L->zip.entries[a].name < L->zip.entries[b].name; });
  if (L->image_entries.empty()) {
    delete L;
    return nullptr;
  }
  if (!label_names.empty()) {
    L->label_dim = (int)label_vals[0].size();
    L->labels.resize(L->image_entries.size());
    for (size_t i = 0; i < L->image_entries.size(); ++i) {
      const auto& nm = L->zip.entries[L->image_entries[i]].name;
      for (size_t j = 0; j < label_names.size(); ++j)
        if (label_names[j] == nm) {
          L->labels[i] = label_vals[j];
          break;
        }
      if (L->labels[i].empty()) L->labels[i].resize(L->label_dim, 0.f);
    }
  }
  L->resolution = resolution;
  L->batch_size = batch_size;
  L->seed = seed;
  L->rank = rank;
  L->num_replicas = num_replicas;
  int n = std::max(1, num_threads);
  for (int i = 0; i < n; ++i)
    L->workers.emplace_back([L] { L->worker_loop(); });
  return L;
}

int loader_len(void* handle) {
  return (int)((Loader*)handle)->image_entries.size();
}

int loader_label_dim(void* handle) {
  return ((Loader*)handle)->label_dim;
}

int loader_next(void* handle, float* images, float* labels) {
  auto* L = (Loader*)handle;
  Batch* batch = nullptr;
  {
    std::unique_lock<std::mutex> lock(L->mu);
    L->cv_ready.wait(lock, [&] { return !L->ready.empty() || L->stop; });
    if (L->stop && L->ready.empty()) return 0;
    batch = L->ready.front();
    L->ready.pop();
    L->cv_space.notify_one();
  }
  memcpy(images, batch->images.data(), batch->images.size() * sizeof(float));
  if (labels && L->label_dim)
    memcpy(labels, batch->labels.data(), batch->labels.size() * sizeof(float));
  delete batch;
  return 1;
}

void loader_close(void* handle) {
  delete (Loader*)handle;
}

}  // extern "C"
