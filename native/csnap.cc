// csnap — asynchronous compressed snapshot writer.
//
// The native IO tier of the framework: the simulation host thread hands
// field buffers to csnap_append(), which copies them into a job queue and
// returns immediately; a background worker thread deflate-compresses each
// field (zlib) and appends it to a simple chunked container file. This
// keeps disk I/O and compression entirely off the stepping path — the
// role the reference approximated with a (never actually used)
// ThreadPoolExecutor around h5py writes (reference v5.py:452, 454-470).
//
// File format "CSNP1":
//   magic: "CSNP1\n"
//   record: u32 name_len | name bytes | i32 step | f64 time | u8 dtype
//           | i32 ndim | i64 shape[ndim] | u64 raw_size | u64 comp_size
//           | comp_size bytes of zlib-deflated data
// dtype: 0 = float32, 1 = float64, 2 = int32.
//
// Exposed as a C ABI for ctypes (no pybind11 on this toolchain).

#include <zlib.h>

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Job {
  std::string name;
  int32_t step;
  double time;
  uint8_t dtype;
  std::vector<int64_t> shape;
  std::vector<unsigned char> data;  // raw bytes (copied from caller)
};

struct Writer {
  FILE* f = nullptr;
  int level = 4;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<Job> queue;
  bool closing = false;
  bool busy = false;  // a popped job is still being written
  bool error = false;  // sticky: compression or I/O failure occurred
  uint64_t written_records = 0;

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return closing || !queue.empty(); });
        if (queue.empty()) {
          if (closing) return;
          continue;
        }
        job = std::move(queue.front());
        queue.pop_front();
        busy = true;
      }
      write_record(job);
      {
        std::lock_guard<std::mutex> lk(mu);
        busy = false;
        ++written_records;
      }
      cv.notify_all();
    }
  }

  void write_record(const Job& job) {
    uLongf bound = compressBound(job.data.size());
    std::vector<unsigned char> comp(bound);
    uLongf comp_size = bound;
    int rc = compress2(comp.data(), &comp_size, job.data.data(),
                       job.data.size(), level);
    if (rc != Z_OK) {  // record the loss instead of dropping silently
      std::lock_guard<std::mutex> lk(mu);
      error = true;
      return;
    }

    uint32_t name_len = static_cast<uint32_t>(job.name.size());
    int32_t ndim = static_cast<int32_t>(job.shape.size());
    uint64_t raw_size = job.data.size();
    uint64_t csize = comp_size;
    bool ok = true;
    ok &= std::fwrite(&name_len, 4, 1, f) == 1;
    ok &= std::fwrite(job.name.data(), 1, name_len, f) == name_len;
    ok &= std::fwrite(&job.step, 4, 1, f) == 1;
    ok &= std::fwrite(&job.time, 8, 1, f) == 1;
    ok &= std::fwrite(&job.dtype, 1, 1, f) == 1;
    ok &= std::fwrite(&ndim, 4, 1, f) == 1;
    ok &= std::fwrite(job.shape.data(), 8, ndim, f) ==
          static_cast<size_t>(ndim);
    ok &= std::fwrite(&raw_size, 8, 1, f) == 1;
    ok &= std::fwrite(&csize, 8, 1, f) == 1;
    ok &= std::fwrite(comp.data(), 1, csize, f) == csize;
    ok &= std::fflush(f) == 0;
    if (!ok) {  // disk full / I/O error: surface via csnap_error()
      std::lock_guard<std::mutex> lk(mu);
      error = true;
    }
  }
};

size_t dtype_size(uint8_t dtype) {
  switch (dtype) {
    case 0: return 4;
    case 1: return 8;
    case 2: return 4;
    default: return 0;
  }
}

}  // namespace

extern "C" {

void* csnap_open(const char* path, int level) {
  FILE* f = std::fopen(path, "ab");
  if (!f) return nullptr;
  // write magic only for fresh files; determine emptiness via an explicit
  // seek-to-end (ftell right after fopen("ab") returning the size is
  // glibc-specific behavior)
  std::fseek(f, 0, SEEK_END);
  long pos = std::ftell(f);
  if (pos == 0) std::fwrite("CSNP1\n", 1, 6, f);
  Writer* w = new Writer();
  w->f = f;
  w->level = level > 0 ? level : 4;
  w->worker = std::thread([w] { w->run(); });
  return w;
}

// Enqueue one field; copies `data`, returns immediately. Returns 0 on
// success, nonzero on invalid arguments.
int csnap_append(void* handle, const char* name, int32_t step, double time,
                 const void* data, uint8_t dtype, int32_t ndim,
                 const int64_t* shape) {
  Writer* w = static_cast<Writer*>(handle);
  if (!w || !data || ndim < 0 || ndim > 8) return 1;
  size_t elems = 1;
  std::vector<int64_t> sh(shape, shape + ndim);
  for (int i = 0; i < ndim; ++i) elems *= static_cast<size_t>(shape[i]);
  size_t bytes = elems * dtype_size(dtype);
  if (bytes == 0) return 2;
  Job job;
  job.name = name;
  job.step = step;
  job.time = time;
  job.dtype = dtype;
  job.shape = std::move(sh);
  job.data.assign(static_cast<const unsigned char*>(data),
                  static_cast<const unsigned char*>(data) + bytes);
  {
    std::lock_guard<std::mutex> lk(w->mu);
    w->queue.push_back(std::move(job));
  }
  w->cv.notify_all();
  return 0;
}

// Block until every queued record has been written to disk.
void csnap_flush(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  if (!w) return;
  std::unique_lock<std::mutex> lk(w->mu);
  w->cv.wait(lk, [&] { return w->queue.empty() && !w->busy; });
}

// 1 if any record was lost to a compression or I/O failure, else 0
// (sticky; lets the Python layer raise instead of silently losing data).
int csnap_error(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  if (!w) return 1;
  std::lock_guard<std::mutex> lk(w->mu);
  return w->error ? 1 : 0;
}

// Number of records not yet written (for backpressure monitoring).
int64_t csnap_pending(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  if (!w) return -1;
  std::lock_guard<std::mutex> lk(w->mu);
  return static_cast<int64_t>(w->queue.size());
}

void csnap_close(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  if (!w) return;
  {
    std::lock_guard<std::mutex> lk(w->mu);
    w->closing = true;
  }
  w->cv.notify_all();
  w->worker.join();
  std::fclose(w->f);
  delete w;
}

}  // extern "C"
