// Native batch packer for the scene-graph input pipeline.
//
// The host-side hot loop of the input pipeline — reading per-image records
// and expanding the lower-triangular relation annotation into the padded
// (N, N) directed grid — is O(B * N^2) Python work per batch in the naive
// loader.  This library does it in C++ with one thread per record.
//
// Record format "SGRC" v1 (little-endian), written by
// scene_graph_commonsense_tpu.data.native.write_sgrec:
//   int32 magic 0x43524753 ("SGRC")
//   int32 version (1)
//   int32 num_objects N_rec
//   int32 feature_size S
//   int32 num_super K
//   float32 depth[S*S]
//   int32 cats[N_rec]
//   float32 boxes[N_rec*4]          (x_min, x_max, y_min, y_max)
//   uint8 super_mh[N_rec*K]
//   int32 rel_lower[N_rec*(N_rec-1)/2]    row-major, row i has i entries
//   float32 dir_lower[N_rec*(N_rec-1)/2]  1=subject, 0=object, -1=none
//
// Exposed C ABI: sgc_pack_batch packs `batch` records into padded arrays
// (cats (B,N) int32, boxes (B,N,4) f32, rel (B,N,N) int32, valid (B,N) u8,
// super_mh (B,N,K) f32, depth (B,S,S) f32).  Records with fewer than 2 or
// more than N objects are rejected (slot left invalid), mirroring the
// dataset filter (reference dataloader.py:119).  Returns the number of
// successfully packed slots, or -1 on argument errors.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int32_t kMagic = 0x43524753;  // "SGRC"

struct PackArgs {
  int max_objects;
  int feature_size;
  int num_super;
  int32_t* cats;
  float* boxes;
  int32_t* rel;
  uint8_t* valid;
  float* super_mh;
  float* depth;
};

bool read_exact(FILE* f, void* dst, size_t bytes) {
  return fread(dst, 1, bytes, f) == bytes;
}

// Packs one record into batch slot b; returns true on success.
bool pack_one(const char* path, int b, const PackArgs& a) {
  const int n_max = a.max_objects;
  const int s = a.feature_size;
  const int k = a.num_super;

  int32_t* cats = a.cats + static_cast<size_t>(b) * n_max;
  float* boxes = a.boxes + static_cast<size_t>(b) * n_max * 4;
  int32_t* rel = a.rel + static_cast<size_t>(b) * n_max * n_max;
  uint8_t* valid = a.valid + static_cast<size_t>(b) * n_max;
  float* super_mh = a.super_mh + static_cast<size_t>(b) * n_max * k;
  float* depth = a.depth + static_cast<size_t>(b) * s * s;

  // zero-initialize the slot (padding contract of the Python loader)
  std::memset(cats, 0, sizeof(int32_t) * n_max);
  std::memset(boxes, 0, sizeof(float) * n_max * 4);
  for (int i = 0; i < n_max * n_max; ++i) rel[i] = -1;
  std::memset(valid, 0, n_max);
  std::memset(super_mh, 0, sizeof(float) * n_max * k);
  std::memset(depth, 0, sizeof(float) * s * s);

  FILE* f = fopen(path, "rb");
  if (f == nullptr) return false;

  int32_t header[5];
  bool ok = read_exact(f, header, sizeof(header)) && header[0] == kMagic &&
            header[1] == 1 && header[3] == s && header[4] == k;
  const int n = ok ? header[2] : 0;
  ok = ok && n > 1 && n <= n_max;

  std::vector<int32_t> rec_cats(ok ? n : 0);
  std::vector<float> rec_boxes(ok ? n * 4 : 0);
  std::vector<uint8_t> rec_super(ok ? n * k : 0);
  const int tri = ok ? n * (n - 1) / 2 : 0;
  std::vector<int32_t> rel_lower(tri);
  std::vector<float> dir_lower(tri);

  ok = ok && read_exact(f, depth, sizeof(float) * s * s);
  ok = ok && read_exact(f, rec_cats.data(), sizeof(int32_t) * n);
  ok = ok && read_exact(f, rec_boxes.data(), sizeof(float) * n * 4);
  ok = ok && read_exact(f, rec_super.data(), n * k);
  ok = ok && read_exact(f, rel_lower.data(), sizeof(int32_t) * tri);
  ok = ok && read_exact(f, dir_lower.data(), sizeof(float) * tri);
  fclose(f);
  if (!ok) {
    std::memset(depth, 0, sizeof(float) * s * s);
    return false;
  }

  std::memcpy(cats, rec_cats.data(), sizeof(int32_t) * n);
  std::memcpy(boxes, rec_boxes.data(), sizeof(float) * n * 4);
  for (int i = 0; i < n; ++i) {
    valid[i] = 1;
    for (int j = 0; j < k; ++j)
      super_mh[i * k + j] = static_cast<float>(rec_super[i * k + j]);
  }
  // lower-triangular annotation -> directed (N, N) grid
  // (same semantics as ops.pairs.directed_rel_from_lower)
  int idx = 0;
  for (int i = 1; i < n; ++i) {
    for (int j = 0; j < i; ++j, ++idx) {
      const float d = dir_lower[idx];
      const int32_t r = rel_lower[idx];
      if (d == 1.0f) {
        rel[i * n_max + j] = r;
      } else if (d == 0.0f) {
        rel[j * n_max + i] = r;
      }
    }
  }
  return true;
}

}  // namespace

extern "C" {

int sgc_pack_batch(const char** paths, int batch, int max_objects,
                   int feature_size, int num_super, int32_t* cats,
                   float* boxes, int32_t* rel, uint8_t* valid,
                   float* super_mh, float* depth, uint8_t* ok_flags,
                   int num_threads) {
  if (paths == nullptr || batch <= 0 || max_objects <= 1) return -1;
  PackArgs args{max_objects, feature_size, num_super, cats,
                boxes,       rel,          valid,     super_mh, depth};
  if (num_threads <= 1 || batch == 1) {
    int packed = 0;
    for (int b = 0; b < batch; ++b) {
      const bool ok = pack_one(paths[b], b, args);
      ok_flags[b] = ok ? 1 : 0;
      packed += ok ? 1 : 0;
    }
    return packed;
  }
  std::vector<std::thread> threads;
  const int workers = num_threads < batch ? num_threads : batch;
  std::vector<int> counts(workers, 0);
  for (int w = 0; w < workers; ++w) {
    threads.emplace_back([&, w]() {
      for (int b = w; b < batch; b += workers) {
        const bool ok = pack_one(paths[b], b, args);
        ok_flags[b] = ok ? 1 : 0;
        counts[w] += ok ? 1 : 0;
      }
    });
  }
  int packed = 0;
  for (int w = 0; w < workers; ++w) {
    threads[w].join();
    packed += counts[w];
  }
  return packed;
}

}  // extern "C"
