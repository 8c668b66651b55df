// Threaded image prefetch loader: worker pool reads + decodes dataset
// frames ahead of the consumer, bounded ring buffer, in-order delivery.
//
// Native counterpart of the reference's feed loop + rpg_common workers
// (reference: examples/euroc_mono_imu.cpp:41-65 synchronous per-frame
// cv::imread; extra/rpg_common/threadsafe_queue.h:13, batch_worker.h:14).
// The reference decodes on the caller thread; here N workers keep the
// device fed — the runtime-side concurrency the TPU build keeps native.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" int svo_png_decode_gray8(const uint8_t* data, size_t size,
                                    uint8_t* out, size_t max_out,
                                    int* out_w, int* out_h);

namespace {

struct Frame {
  std::vector<uint8_t> pixels;
  int w = 0, h = 0;
  int status = -1;
};

struct Loader {
  std::vector<std::string> paths;
  size_t capacity;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_prod, cv_cons;
  std::map<size_t, Frame> ready;   // index → decoded frame
  std::atomic<size_t> next_job{0};
  size_t next_out = 0;
  bool stop = false;

  void work() {
    for (;;) {
      size_t idx = next_job.fetch_add(1);
      if (idx >= paths.size()) return;
      Frame f;
      FILE* fp = std::fopen(paths[idx].c_str(), "rb");
      if (fp) {
        std::fseek(fp, 0, SEEK_END);
        long n = std::ftell(fp);
        std::fseek(fp, 0, SEEK_SET);
        std::vector<uint8_t> buf(static_cast<size_t>(n));
        if (std::fread(buf.data(), 1, buf.size(), fp) == buf.size()) {
          f.pixels.resize(4096 * 4096);
          f.status = svo_png_decode_gray8(buf.data(), buf.size(),
                                          f.pixels.data(), f.pixels.size(),
                                          &f.w, &f.h);
          if (f.status == 0) f.pixels.resize(size_t(f.w) * f.h);
        }
        std::fclose(fp);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_prod.wait(lk, [&] {
        return stop || ready.size() < capacity || idx < next_out + capacity;
      });
      if (stop) return;
      ready.emplace(idx, std::move(f));
      cv_cons.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* svo_loader_create(const char** paths, int n_paths, int capacity,
                        int n_threads) {
  auto* ld = new Loader();
  for (int i = 0; i < n_paths; ++i) ld->paths.emplace_back(paths[i]);
  ld->capacity = size_t(capacity > 0 ? capacity : 8);
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i)
    ld->workers.emplace_back([ld] { ld->work(); });
  return ld;
}

// Blocks until frame `index` (delivered in order) is ready.
// Returns 0 on success; fills out/out_w/out_h.
int svo_loader_next(void* handle, uint8_t* out, size_t max_out, int* out_w,
                    int* out_h) {
  auto* ld = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(ld->mu);
  size_t idx = ld->next_out;
  if (idx >= ld->paths.size()) return -100;  // exhausted
  ld->cv_cons.wait(lk, [&] { return ld->ready.count(idx) || ld->stop; });
  if (ld->stop) return -101;
  Frame f = std::move(ld->ready[idx]);
  ld->ready.erase(idx);
  ld->next_out++;
  ld->cv_prod.notify_all();
  lk.unlock();
  if (f.status != 0) return f.status;
  if (size_t(f.w) * f.h > max_out) return -7;
  std::memcpy(out, f.pixels.data(), size_t(f.w) * f.h);
  *out_w = f.w;
  *out_h = f.h;
  return 0;
}

void svo_loader_destroy(void* handle) {
  auto* ld = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(ld->mu);
    ld->stop = true;
  }
  ld->cv_prod.notify_all();
  ld->cv_cons.notify_all();
  for (auto& t : ld->workers) t.join();
  delete ld;
}

}  // extern "C"
