// tnml_native: native runtime components for tnml-tpu.
//
// TPU-native counterpart of the reference's C++ runtime pieces:
//  - fused IDX -> feature-map pipeline (the per-image phi table the reference
//    builds in TState, fixedL.cc:28-47, on top of the vendored IDX reader
//    mllib/mnist.h:38-101): one pass from raw bytes to the training array
//    X[B,N,d] float32, with the per-label cap (mllib/mnist.h:472-488) and the
//    reference's double-/255 rescale quirk as an explicit parameter.
//  - a file-backed environment spool (the proj_images/B%03dE%05d out-of-core
//    batching system, fixedL.cc:115-157): fixed-size binary slots with
//    positional read/write, for runs whose wing stacks exceed host RAM.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// IDX parsing
// ---------------------------------------------------------------------------

static uint32_t be32(const unsigned char* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

// Reads an IDX header; returns 0 on success. dims_out must hold >= 4 entries.
int tnml_idx_header(const char* path, int* ndim_out, long long* dims_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -errno;
  unsigned char hdr[4];
  if (std::fread(hdr, 1, 4, f) != 4 || hdr[0] != 0 || hdr[1] != 0 ||
      hdr[2] != 0x08) {
    std::fclose(f);
    return -1;  // only ubyte files (magic 0x08xx) are supported here
  }
  int nd = hdr[3];
  if (nd < 1 || nd > 4) { std::fclose(f); return -2; }
  unsigned char dim[4];
  for (int i = 0; i < nd; ++i) {
    if (std::fread(dim, 1, 4, f) != 4) { std::fclose(f); return -3; }
    dims_out[i] = (long long)be32(dim);
  }
  *ndim_out = nd;
  std::fclose(f);
  return 0;
}

// Fused loader: IDX image file + IDX label file -> X[B_kept, n_sites, d] float32
// and labels[B_kept] int32, applying the per-label cap `nt` in file order.
//
// feature: 0 = 'normal' [cos(pi/2 x), sin(pi/2 x)] (d must be 2)
//          1 = 'series' [(x/4)^0 .. (x/4)^(d-1)]
// rescale: multiplier applied to the [0,1]-normalized pixel before phi
//          (1/255 reproduces the reference's double-normalization quirk).
//
// Returns the number of kept images, or a negative errno-style code.
long long tnml_load_features(const char* img_path, const char* lbl_path,
                             long long nt, int feature, int d, double rescale,
                             float* x_out, int* labels_out,
                             long long x_capacity_floats) {
  int nd = 0;
  long long idims[4], ldims[4];
  int rc = tnml_idx_header(img_path, &nd, idims);
  if (rc != 0 || nd != 3) return -100;
  long long count = idims[0], h = idims[1], w = idims[2], n_sites = h * w;
  rc = tnml_idx_header(lbl_path, &nd, ldims);
  if (rc != 0 || nd != 1 || ldims[0] != count) return -101;

  FILE* fi = std::fopen(img_path, "rb");
  FILE* fl = std::fopen(lbl_path, "rb");
  if (!fi || !fl) {
    if (fi) std::fclose(fi);
    if (fl) std::fclose(fl);
    return -102;
  }
  std::fseek(fi, 4 + 4 * 3, SEEK_SET);
  std::fseek(fl, 4 + 4 * 1, SEEK_SET);

  std::vector<unsigned char> img((size_t)n_sites);
  std::vector<unsigned char> lbl((size_t)count);
  if (std::fread(lbl.data(), 1, (size_t)count, fl) != (size_t)count) {
    std::fclose(fi); std::fclose(fl); return -103;
  }
  std::fclose(fl);

  long long caps[256];
  std::memset(caps, 0, sizeof(caps));
  long long kept = 0;
  const double half_pi = 1.5707963267948966;
  for (long long i = 0; i < count; ++i) {
    int l = lbl[(size_t)i];
    bool keep = caps[l] < nt;
    if (keep && (kept + 1) * n_sites * d > x_capacity_floats) {
      std::fclose(fi);
      return -104;  // caller under-allocated
    }
    if (!keep) {
      std::fseek(fi, (long)n_sites, SEEK_CUR);
      continue;
    }
    if (std::fread(img.data(), 1, (size_t)n_sites, fi) != (size_t)n_sites) {
      std::fclose(fi); return -105;
    }
    caps[l]++;
    labels_out[kept] = l;
    float* row = x_out + kept * n_sites * d;
    if (feature == 0) {  // normal (d == 2)
      for (long long j = 0; j < n_sites; ++j) {
        double x = (img[(size_t)j] / 255.0) * rescale;
        row[2 * j] = (float)std::cos(half_pi * x);
        row[2 * j + 1] = (float)std::sin(half_pi * x);
      }
    } else {  // series
      for (long long j = 0; j < n_sites; ++j) {
        double x = (img[(size_t)j] / 255.0) * rescale / 4.0;
        double p = 1.0;
        for (int k = 0; k < d; ++k) {
          row[d * j + k] = (float)p;
          p *= x;
        }
      }
    }
    ++kept;
  }
  std::fclose(fi);
  return kept;
}

// ---------------------------------------------------------------------------
// Environment spool: fixed-slot binary store (the proj_images analog)
// ---------------------------------------------------------------------------

struct Spool {
  FILE* f;
  long long slot_bytes;
  long long n_slots;
};

// Opens (creating/truncating) a spool file with n_slots slots of slot_bytes.
void* tnml_spool_create(const char* path, long long n_slots,
                        long long slot_bytes) {
  FILE* f = std::fopen(path, "wb+");
  if (!f) return nullptr;
  auto* s = new Spool{f, slot_bytes, n_slots};
  return s;
}

int tnml_spool_write(void* handle, long long slot, const void* data,
                     long long nbytes) {
  auto* s = (Spool*)handle;
  if (!s || slot < 0 || slot >= s->n_slots || nbytes > s->slot_bytes) return -1;
  if (std::fseek(s->f, (long)(slot * s->slot_bytes), SEEK_SET) != 0) return -2;
  if (std::fwrite(data, 1, (size_t)nbytes, s->f) != (size_t)nbytes) return -3;
  return 0;
}

int tnml_spool_read(void* handle, long long slot, void* data,
                    long long nbytes) {
  auto* s = (Spool*)handle;
  if (!s || slot < 0 || slot >= s->n_slots || nbytes > s->slot_bytes) return -1;
  if (std::fseek(s->f, (long)(slot * s->slot_bytes), SEEK_SET) != 0) return -2;
  if (std::fread(data, 1, (size_t)nbytes, s->f) != (size_t)nbytes) return -3;
  return 0;
}

void tnml_spool_close(void* handle) {
  auto* s = (Spool*)handle;
  if (!s) return;
  std::fclose(s->f);
  delete s;
}

}  // extern "C"
