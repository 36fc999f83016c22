// Threaded, prefetching minibatch producer.
//
// Native equivalent of the reference's Julia Channel producer task
// (src/train_brain.jl:197-206; last_desperate_attempt/src/train_net.jl:118-130):
// per-epoch Fisher-Yates shuffle, batch gather, optional horizontal-flip
// augmentation — all off the Python thread, double-buffered in a ring so the
// training loop's next-batch call is a single memcpy. For datasets that
// don't fit the accelerator (unlike the bundled 1.7 MB set, which lives on
// device whole) this keeps host batch preparation off the critical path.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Batcher {
  const float* data = nullptr;  // (n, h, w, c) row-major, borrowed
  int64_t n = 0, h = 0, w = 0, c = 0;
  int64_t batch = 0;
  bool augment_flip = false;
  bool drop_remainder = false;

  // ring of prefetched batches
  static constexpr int kRing = 4;
  std::vector<float> ring[kRing];
  int64_t ring_count[kRing] = {0};  // examples in slot (short final batch)
  std::atomic<int64_t> head{0};     // produced
  std::atomic<int64_t> tail{0};     // consumed
  std::mutex mu;
  std::condition_variable cv_can_produce, cv_can_consume;
  std::atomic<bool> stop{false};

  std::mt19937_64 rng;
  std::vector<int64_t> perm;
  int64_t cursor = 0;  // position within the current epoch's permutation

  std::thread worker;

  int64_t img_elems() const { return h * w * c; }

  void reshuffle() {
    for (int64_t i = 0; i < n; ++i) perm[i] = i;
    for (int64_t i = n - 1; i > 0; --i) {
      std::uniform_int_distribution<int64_t> d(0, i);
      std::swap(perm[i], perm[d(rng)]);
    }
    cursor = 0;
  }

  void flip_horizontal(float* img) const {
    // reverse the W axis of one (h, w, c) image
    for (int64_t r = 0; r < h; ++r) {
      float* row = img + r * w * c;
      for (int64_t a = 0, b = w - 1; a < b; ++a, --b) {
        for (int64_t k = 0; k < c; ++k) std::swap(row[a * c + k], row[b * c + k]);
      }
    }
  }

  void produce_one(int slot) {
    if (cursor >= n) reshuffle();
    int64_t take = std::min(batch, n - cursor);
    if (drop_remainder && take < batch) {
      reshuffle();
      take = std::min(batch, n - cursor);
    }
    float* out = ring[slot].data();
    const int64_t e = img_elems();
    std::uniform_int_distribution<int> coin(0, 1);
    for (int64_t i = 0; i < take; ++i) {
      const int64_t src = perm[cursor + i];
      std::memcpy(out + i * e, data + src * e, sizeof(float) * e);
      if (augment_flip && coin(rng)) flip_horizontal(out + i * e);
    }
    ring_count[slot] = take;
    cursor += take;
  }

  void run() {
    while (!stop.load()) {
      int64_t head_now = head.load();
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_can_produce.wait(
            lk, [&] { return stop.load() || head_now - tail.load() < kRing; });
      }
      if (stop.load()) return;
      produce_one(static_cast<int>(head_now % kRing));
      head.store(head_now + 1);
      cv_can_consume.notify_one();
    }
  }

  int64_t next(float* out) {
    int64_t tail_now = tail.load();
    {
      std::unique_lock<std::mutex> lk(mu);
      cv_can_consume.wait(lk, [&] { return head.load() > tail_now; });
    }
    const int slot = static_cast<int>(tail_now % kRing);
    const int64_t count = ring_count[slot];
    std::memcpy(out, ring[slot].data(), sizeof(float) * count * img_elems());
    tail.store(tail_now + 1);
    cv_can_consume.notify_all();
    cv_can_produce.notify_one();
    return count;
  }
};

}  // namespace

extern "C" {

void* igdm_batcher_create(const float* data, int64_t n, int64_t h, int64_t w,
                          int64_t c, int64_t batch, uint64_t seed,
                          int augment_flip, int drop_remainder) {
  auto* b = new Batcher();
  b->data = data;
  b->n = n;
  b->h = h;
  b->w = w;
  b->c = c;
  b->batch = batch;
  b->augment_flip = augment_flip != 0;
  b->drop_remainder = drop_remainder != 0;
  b->rng.seed(seed);
  b->perm.resize(n);
  b->reshuffle();
  for (int i = 0; i < Batcher::kRing; ++i)
    b->ring[i].resize(static_cast<size_t>(batch) * b->img_elems());
  b->worker = std::thread([b] { b->run(); });
  return b;
}

// Fills `out` (batch, h, w, c); returns the number of valid examples
// (< batch only for the final short batch of an epoch).
int64_t igdm_batcher_next(void* handle, float* out) {
  return static_cast<Batcher*>(handle)->next(out);
}

void igdm_batcher_destroy(void* handle) {
  auto* b = static_cast<Batcher*>(handle);
  b->stop.store(true);
  b->cv_can_produce.notify_all();
  b->cv_can_consume.notify_all();
  if (b->worker.joinable()) b->worker.join();
  delete b;
}

}  // extern "C"
