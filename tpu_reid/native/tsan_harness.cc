// ThreadSanitizer harness for the native decode pool (loader.cc).
//
// The reference has no native concurrency at all (its only parallelism is
// torch DataLoader worker *processes*, data_prepare.py:207); this repo
// ships a real C++ thread pool (mutex/condvar work queue) under the
// BatchLoader, so it gets the race-detection pass the reference never
// needed. Built by tests/test_native.py with -fsanitize=thread against
// loader.cc and run under TSAN_OPTIONS=halt_on_error=1: any data race
// fails the test.
//
// Phases:
//   1. transient pool (reid_decode_resize_batch): repeated batches,
//      including failing paths (zero-filled slots) and n_threads > n.
//   2. persistent pool: back-to-back reid_pool_run batches on one pool —
//      the job-handoff (seq bump under mutex, lock-free field reads inside
//      the job) is the code TSan must vet.
//   3. concurrent pools: several host threads, each owning a pool and
//      running batches into private buffers (the multi-loader shape:
//      gallery + query BatchLoaders can overlap).
//   4. lifecycle churn: create/destroy with zero jobs, destroy immediately
//      after a completed job, zero-length jobs.
//
// Usage: tsan_harness <jpeg1> [jpeg2 ...]

#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
int reid_decode_resize_batch(const char** paths, int n, int out_h, int out_w,
                             unsigned char* out, int n_threads);
void* reid_pool_create(int n_threads);
int reid_pool_run(void* pool, const char** paths, int n, int out_h,
                  int out_w, unsigned char* out);
void reid_pool_destroy(void* pool);
}

namespace {

constexpr int kH = 24, kW = 12;

struct Batch {
  std::vector<std::string> owned;
  std::vector<const char*> ptrs;
  std::vector<unsigned char> out;

  Batch(const std::vector<std::string>& sources, int n, bool add_bad) {
    for (int i = 0; i < n; ++i) owned.push_back(sources[i % sources.size()]);
    if (add_bad) owned.push_back("/nonexistent/bad.jpg");
    for (const auto& s : owned) ptrs.push_back(s.c_str());
    out.assign(owned.size() * kH * kW * 3, 0xAB);
  }
  int n() const { return int(ptrs.size()); }
  const char** paths() { return ptrs.data(); }
  unsigned char* buf() { return out.data(); }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: tsan_harness <jpeg...>\n");
    return 2;
  }
  std::vector<std::string> sources(argv + 1, argv + argc);

  // --- phase 1: transient pool ------------------------------------------
  for (int it = 0; it < 4; ++it) {
    Batch b(sources, 9, /*add_bad=*/it % 2 == 1);
    const int fails = reid_decode_resize_batch(
        b.paths(), b.n(), kH, kW, b.buf(), /*n_threads=*/8);
    if (fails != (it % 2)) {
      std::fprintf(stderr, "phase1: expected %d failures, got %d\n",
                   it % 2, fails);
      return 3;
    }
  }

  // --- phase 2: persistent pool, back-to-back jobs ----------------------
  {
    void* pool = reid_pool_create(6);
    for (int it = 0; it < 12; ++it) {
      Batch b(sources, 1 + it % 7, /*add_bad=*/it % 3 == 2);
      const int fails =
          reid_pool_run(pool, b.paths(), b.n(), kH, kW, b.buf());
      if (fails != (it % 3 == 2 ? 1 : 0)) {
        std::fprintf(stderr, "phase2: bad failure count %d at it %d\n",
                     fails, it);
        return 4;
      }
    }
    // zero-length job: must return without touching the workers
    if (reid_pool_run(pool, nullptr, 0, kH, kW, nullptr) != 0) return 5;
    reid_pool_destroy(pool);
  }

  // --- phase 3: concurrent pools on host threads ------------------------
  {
    std::vector<std::thread> hosts;
    for (int t = 0; t < 4; ++t) {
      hosts.emplace_back([&sources, t] {
        void* pool = reid_pool_create(3);
        for (int it = 0; it < 6; ++it) {
          Batch b(sources, 2 + (t + it) % 5, false);
          reid_pool_run(pool, b.paths(), b.n(), kH, kW, b.buf());
        }
        reid_pool_destroy(pool);
      });
    }
    for (auto& h : hosts) h.join();
  }

  // --- phase 4: lifecycle churn -----------------------------------------
  for (int it = 0; it < 8; ++it) {
    void* pool = reid_pool_create(4);
    if (it % 2 == 0) {
      Batch b(sources, 3, false);
      reid_pool_run(pool, b.paths(), b.n(), kH, kW, b.buf());
    }
    reid_pool_destroy(pool);  // idle-destroy on odd its, post-job on even
  }

  std::puts("tsan_harness: all phases OK");
  return 0;
}
