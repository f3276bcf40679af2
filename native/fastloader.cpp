// Native batch loader: mmap-backed dataset with threaded batch assembly
// and asynchronous prefetch.
//
// Role: the host-side data pipeline.  The reference re-reads each
// minibatch from HDF5 inside every loss call through h5py
// (adorym/forward_model.py:113-119), serialized on the Python side.  Here
// the (converted) dataset is a memory-mapped raw float32 array
// [n_theta, n_pos, h, w]; worker threads gather a batch's scan-position
// rows into a ring of reusable staging buffers while the accelerator is
// busy with the previous step, so H2D transfer starts the moment the step
// returns.  Exposed to Python via a plain C ABI (ctypes — no pybind11 in
// this environment).
//
// Build: g++ -O3 -shared -fPIC -pthread -o libfastloader.so fastloader.cpp

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Request {
  int64_t slot;
  int64_t i_theta;
  std::vector<int64_t> indices;
};

class Loader {
 public:
  Loader(const char* path, int64_t n_theta, int64_t n_pos, int64_t h,
         int64_t w, int64_t n_slots, int64_t max_batch)
      : n_theta_(n_theta), n_pos_(n_pos), h_(h), w_(w),
        frame_(h * w), n_slots_(n_slots), max_batch_(max_batch),
        stop_(false) {
    fd_ = open(path, O_RDONLY);
    if (fd_ < 0) { ok_ = false; return; }
    struct stat st;
    fstat(fd_, &st);
    bytes_ = static_cast<size_t>(st.st_size);
    const size_t expect = sizeof(float) * n_theta * n_pos * frame_;
    if (bytes_ < expect) { ok_ = false; close(fd_); return; }
    base_ = static_cast<const float*>(
        mmap(nullptr, bytes_, PROT_READ, MAP_PRIVATE, fd_, 0));
    if (base_ == MAP_FAILED) { ok_ = false; close(fd_); return; }
    madvise(const_cast<float*>(base_), bytes_, MADV_WILLNEED);
    buffers_.resize(n_slots_);
    ready_.resize(n_slots_);
    for (int64_t i = 0; i < n_slots_; ++i) {
      buffers_[i].resize(max_batch_ * frame_);
      ready_[i] = true;  // free
    }
    worker_ = std::thread([this] { this->Run(); });
    ok_ = true;
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    if (worker_.joinable()) worker_.join();
    if (base_ && base_ != MAP_FAILED)
      munmap(const_cast<float*>(base_), bytes_);
    if (fd_ >= 0) close(fd_);
  }

  bool ok() const { return ok_; }

  // Enqueue an async gather of |n| rows of angle i_theta into |slot|.
  void Prefetch(int64_t slot, int64_t i_theta, const int64_t* indices,
                int64_t n) {
    Request req;
    req.slot = slot;
    req.i_theta = i_theta;
    req.indices.assign(indices, indices + n);
    {
      std::lock_guard<std::mutex> lk(mu_);
      ready_[slot] = false;
      queue_.push_back(std::move(req));
    }
    cv_.notify_one();
  }

  // Block until |slot| is filled, then copy it out.
  void Get(int64_t slot, float* out, int64_t n) {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this, slot] { return ready_[slot]; });
    std::memcpy(out, buffers_[slot].data(),
                sizeof(float) * n * frame_);
  }

  // Synchronous gather (no prefetch thread involved).
  void Gather(int64_t i_theta, const int64_t* indices, int64_t n,
              float* out) const {
    const float* theta_base = base_ + i_theta * n_pos_ * frame_;
    for (int64_t k = 0; k < n; ++k) {
      std::memcpy(out + k * frame_, theta_base + indices[k] * frame_,
                  sizeof(float) * frame_);
    }
  }

 private:
  void Run() {
    for (;;) {
      Request req;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        req = std::move(queue_.front());
        queue_.pop_front();
      }
      Gather(req.i_theta, req.indices.data(),
             static_cast<int64_t>(req.indices.size()),
             buffers_[req.slot].data());
      {
        std::lock_guard<std::mutex> lk(mu_);
        ready_[req.slot] = true;
      }
      done_cv_.notify_all();
    }
  }

  int64_t n_theta_, n_pos_, h_, w_, frame_, n_slots_, max_batch_;
  int fd_ = -1;
  size_t bytes_ = 0;
  const float* base_ = nullptr;
  bool ok_ = false;

  std::vector<std::vector<float>> buffers_;
  std::vector<bool> ready_;
  std::deque<Request> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  std::thread worker_;
  bool stop_;
};

}  // namespace

extern "C" {

void* loader_open(const char* path, int64_t n_theta, int64_t n_pos,
                  int64_t h, int64_t w, int64_t n_slots,
                  int64_t max_batch) {
  Loader* l = new Loader(path, n_theta, n_pos, h, w, n_slots, max_batch);
  if (!l->ok()) {
    delete l;
    return nullptr;
  }
  return l;
}

void loader_close(void* handle) { delete static_cast<Loader*>(handle); }

void loader_prefetch(void* handle, int64_t slot, int64_t i_theta,
                     const int64_t* indices, int64_t n) {
  static_cast<Loader*>(handle)->Prefetch(slot, i_theta, indices, n);
}

void loader_get(void* handle, int64_t slot, float* out, int64_t n) {
  static_cast<Loader*>(handle)->Get(slot, out, n);
}

void loader_gather(void* handle, int64_t i_theta, const int64_t* indices,
                   int64_t n, float* out) {
  static_cast<Loader*>(handle)->Gather(i_theta, indices, n, out);
}

}  // extern "C"
