// sobfu_tpu native runtime: depth-frame decoding, prefetch, mesh export.
//
// TPU-native counterpart of the reference app's C++ I/O layer
// (/root/reference/src/apps/demo.cpp:177-283, which used OpenCV imread and
// pcl::io::saveVTKFile). The TPU compute path is JAX/XLA; this library keeps
// the host runtime native so disk I/O and PNG decode never sit on the Python
// hot path:
//
//   * decode_depth_png  — 16-bit grayscale PNG -> uint16 mm buffer (libpng)
//   * loader_*          — threaded ring-buffer prefetcher: worker threads
//                         decode frames ahead of the consumer, preserving
//                         frame order (the reference loaded synchronously
//                         per frame; this overlaps decode with TPU compute)
//   * write_mesh_vtk    — legacy-ASCII VTK PolyData triangle-soup writer,
//                         ~20x faster than numpy savetxt for 6M-point meshes
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this environment).
//
// Build: tools/build_native.sh  (g++ -O3 -shared -fPIC ... -lpng -lpthread)

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PNG depth decode
// ---------------------------------------------------------------------------

// Reads a 16-bit (or 8-bit) grayscale PNG into out (uint16, row-major).
// Returns 0 on success; fills *width/*height. If out is null, only probes
// the dimensions. out must hold width*height uint16s.
int decode_depth_png(const char* path, uint16_t* out, int* width, int* height) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return -1;

    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) {
        std::fclose(fp);
        return -2;
    }
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        std::fclose(fp);
        return -2;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return -3;
    }

    png_init_io(png, fp);
    png_read_info(png, info);

    png_uint_32 w = png_get_image_width(png, info);
    png_uint_32 h = png_get_image_height(png, info);
    int bit_depth = png_get_bit_depth(png, info);
    int color_type = png_get_color_type(png, info);

    *width = static_cast<int>(w);
    *height = static_cast<int>(h);
    if (!out) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return 0;
    }

    // normalise to single-channel gray
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type & PNG_COLOR_MASK_COLOR) png_set_rgb_to_gray(png, 1, -1, -1);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_strip_alpha(png);
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    if (bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    png_read_update_info(png, info);
    bit_depth = png_get_bit_depth(png, info);

    const size_t rowbytes = png_get_rowbytes(png, info);
    std::vector<uint8_t> rowbuf(rowbytes);

    for (png_uint_32 y = 0; y < h; ++y) {
        png_read_row(png, rowbuf.data(), nullptr);
        uint16_t* dst = out + static_cast<size_t>(y) * w;
        if (bit_depth == 16) {
            // PNG stores 16-bit big-endian
            for (png_uint_32 x = 0; x < w; ++x)
                dst[x] = static_cast<uint16_t>((rowbuf[2 * x] << 8) | rowbuf[2 * x + 1]);
        } else {
            for (png_uint_32 x = 0; x < w; ++x) dst[x] = rowbuf[x];
        }
    }

    png_read_end(png, nullptr);
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 0;
}

// Zero depth wherever the (8-bit, nonzero=keep) mask PNG is zero —
// reference demo.cpp:314-330.
int apply_mask_png(const char* mask_path, uint16_t* depth, int width, int height) {
    int mw = 0, mh = 0;
    std::vector<uint16_t> mask(static_cast<size_t>(width) * height);
    int rc = decode_depth_png(mask_path, mask.data(), &mw, &mh);
    if (rc != 0) return rc;
    if (mw != width || mh != height) return -4;
    const size_t n = static_cast<size_t>(width) * height;
    for (size_t i = 0; i < n; ++i)
        if (mask[i] == 0) depth[i] = 0;
    return 0;
}

// ---------------------------------------------------------------------------
// threaded prefetch loader
// ---------------------------------------------------------------------------

struct Frame {
    std::vector<uint16_t> depth;
    int width = 0, height = 0;
    int status = 0;
};

struct Loader {
    std::vector<std::string> depth_paths;
    std::vector<std::string> mask_paths;  // empty or parallel to depth_paths
    size_t capacity;
    std::vector<std::thread> workers;

    std::mutex mu;
    std::condition_variable cv_space, cv_ready;
    std::deque<std::pair<size_t, std::unique_ptr<Frame>>> ready;
    std::atomic<size_t> next_to_decode{0};
    size_t next_to_emit = 0;
    std::atomic<bool> stop{false};

    void work() {
        for (;;) {
            const size_t idx = next_to_decode.fetch_add(1);
            if (idx >= depth_paths.size() || stop.load()) return;

            auto f = std::make_unique<Frame>();
            f->status = decode_depth_png(depth_paths[idx].c_str(), nullptr,
                                         &f->width, &f->height);
            if (f->status == 0) {
                f->depth.resize(static_cast<size_t>(f->width) * f->height);
                f->status = decode_depth_png(depth_paths[idx].c_str(),
                                             f->depth.data(), &f->width,
                                             &f->height);
                if (f->status == 0 && idx < mask_paths.size() &&
                    !mask_paths[idx].empty()) {
                    f->status = apply_mask_png(mask_paths[idx].c_str(),
                                               f->depth.data(), f->width,
                                               f->height);
                }
            }

            std::unique_lock<std::mutex> lk(mu);
            cv_space.wait(lk, [&] {
                return stop.load() || ready.size() < capacity ||
                       idx < next_to_emit + capacity;
            });
            if (stop.load()) return;
            ready.emplace_back(idx, std::move(f));
            cv_ready.notify_all();
        }
    }
};

void* loader_create(const char** depth_paths, const char** mask_paths, int n,
                    int capacity, int n_threads) {
    auto* L = new Loader();
    L->depth_paths.assign(depth_paths, depth_paths + n);
    if (mask_paths)
        for (int i = 0; i < n; ++i)
            L->mask_paths.emplace_back(mask_paths[i] ? mask_paths[i] : "");
    L->capacity = capacity > 0 ? capacity : 4;
    const int nt = n_threads > 0 ? n_threads : 2;
    for (int t = 0; t < nt; ++t) L->workers.emplace_back(&Loader::work, L);
    return L;
}

// Pops the next frame IN ORDER. Returns 0 ok, <0 decode error, 1 end of
// stream. out must hold max_pixels uint16s.
int loader_next(void* handle, uint16_t* out, int max_pixels, int* width,
                int* height) {
    auto* L = static_cast<Loader*>(handle);
    std::unique_lock<std::mutex> lk(L->mu);
    if (L->next_to_emit >= L->depth_paths.size()) return 1;

    const size_t want = L->next_to_emit;
    L->cv_ready.wait(lk, [&] {
        for (auto& p : L->ready)
            if (p.first == want) return true;
        return L->stop.load();
    });
    for (auto it = L->ready.begin(); it != L->ready.end(); ++it) {
        if (it->first == want) {
            Frame* f = it->second.get();
            int rc = f->status;
            *width = f->width;
            *height = f->height;
            if (rc == 0) {
                const size_t n = f->depth.size();
                if (static_cast<int>(n) > max_pixels) rc = -5;
                else std::memcpy(out, f->depth.data(), n * sizeof(uint16_t));
            }
            L->ready.erase(it);
            L->next_to_emit++;
            L->cv_space.notify_all();
            return rc;
        }
    }
    return -6;
}

void loader_destroy(void* handle) {
    auto* L = static_cast<Loader*>(handle);
    L->stop.store(true);
    L->cv_space.notify_all();
    L->cv_ready.notify_all();
    for (auto& t : L->workers) t.join();
    delete L;
}

// ---------------------------------------------------------------------------
// VTK legacy PolyData writer (triangle soup)
// ---------------------------------------------------------------------------

// Matches the format of pcl::io::saveVTKFile as emitted by the reference
// (demo.cpp:237-246): POINTS + POLYGONS sections, ASCII.
int write_mesh_vtk(const char* path, const float* vertices, long n_vertices) {
    FILE* fp = std::fopen(path, "w");
    if (!fp) return -1;
    const long n_tri = n_vertices / 3;
    std::fprintf(fp,
                 "# vtk DataFile Version 3.0\nsobfu_tpu mesh\nASCII\n"
                 "DATASET POLYDATA\nPOINTS %ld float\n",
                 n_vertices);
    for (long i = 0; i < n_vertices; ++i)
        std::fprintf(fp, "%.6g %.6g %.6g\n", vertices[3 * i], vertices[3 * i + 1],
                     vertices[3 * i + 2]);
    std::fprintf(fp, "POLYGONS %ld %ld\n", n_tri, n_tri * 4);
    for (long t = 0; t < n_tri; ++t)
        std::fprintf(fp, "3 %ld %ld %ld\n", 3 * t, 3 * t + 1, 3 * t + 2);
    std::fclose(fp);
    return 0;
}

}  // extern "C"
