// fastio: asynchronous double-buffered record writer for optimiser
// checkpoints and trajectory snapshots.
//
// Native-runtime counterpart of the reference's blocking rank-0 h5py
// writes (`Sphere_Grad_Descent.py:821-829`, Dedalus file handlers): the
// optimiser enqueues named binary records (numpy buffers) and a writer
// thread drains them to disk, so per-iteration checkpointing never
// stalls the device-side compute loop. Records carry a CRC32 so partial
// writes after a crash are detected on load.
//
// Container format "SMO1":
//   [8B magic "SMO1\0\0\0\1"]
//   repeated records:
//     [u32 name_len][name bytes][u64 payload_len][u32 crc32][payload]
//
// C ABI (ctypes-friendly); see spheremanopt_tpu/io/native_io.py.

#include <atomic>
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

uint32_t crc32_table[256];
std::once_flag crc_once;

void init_crc() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc32_table[i] = c;
  }
}

uint32_t crc32(const uint8_t* data, size_t n) {
  std::call_once(crc_once, init_crc);
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i) c = crc32_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

struct Record {
  std::string name;
  std::vector<uint8_t> payload;
};

struct Writer {
  FILE* fp = nullptr;
  std::thread thread;
  std::deque<Record> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<bool> stop{false};
  std::atomic<int64_t> pending{0};
  std::atomic<int64_t> written_records{0};
  std::atomic<int64_t> written_bytes{0};

  void run() {
    for (;;) {
      Record rec;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop.load() || !queue.empty(); });
        if (queue.empty()) {
          if (stop.load()) break;
          continue;
        }
        rec = std::move(queue.front());
        queue.pop_front();
      }
      uint32_t name_len = static_cast<uint32_t>(rec.name.size());
      uint64_t payload_len = rec.payload.size();
      uint32_t crc = crc32(rec.payload.data(), rec.payload.size());
      fwrite(&name_len, sizeof(name_len), 1, fp);
      fwrite(rec.name.data(), 1, name_len, fp);
      fwrite(&payload_len, sizeof(payload_len), 1, fp);
      fwrite(&crc, sizeof(crc), 1, fp);
      fwrite(rec.payload.data(), 1, payload_len, fp);
      written_records.fetch_add(1);
      written_bytes.fetch_add(static_cast<int64_t>(payload_len));
      {
        // Decrement under the mutex: a flush waiter that checked the
        // predicate just before an unlocked decrement could sleep
        // through the notify (lost wakeup) until the next enqueue.
        std::lock_guard<std::mutex> lk(mu);
        pending.fetch_sub(1);
      }
      cv.notify_all();
    }
    fflush(fp);
  }
};

}  // namespace

extern "C" {

void* fio_open(const char* path) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return nullptr;
  static const uint8_t magic[8] = {'S', 'M', 'O', '1', 0, 0, 0, 1};
  fwrite(magic, 1, 8, fp);
  auto* w = new Writer();
  w->fp = fp;
  w->thread = std::thread([w] { w->run(); });
  return w;
}

int fio_enqueue(void* handle, const char* name, const void* data,
                int64_t nbytes) {
  if (!handle || nbytes < 0) return -1;
  auto* w = static_cast<Writer*>(handle);
  Record rec;
  rec.name = name;
  rec.payload.assign(static_cast<const uint8_t*>(data),
                     static_cast<const uint8_t*>(data) + nbytes);
  {
    std::lock_guard<std::mutex> lk(w->mu);
    w->queue.push_back(std::move(rec));
    w->pending.fetch_add(1);
  }
  w->cv.notify_all();
  return 0;
}

// Block until every enqueued record reached the OS (then fflush).
int fio_flush(void* handle) {
  if (!handle) return -1;
  auto* w = static_cast<Writer*>(handle);
  std::unique_lock<std::mutex> lk(w->mu);
  w->cv.wait(lk, [&] { return w->pending.load() == 0; });
  fflush(w->fp);
  return 0;
}

int64_t fio_stats_records(void* handle) {
  return handle ? static_cast<Writer*>(handle)->written_records.load() : -1;
}

int64_t fio_stats_bytes(void* handle) {
  return handle ? static_cast<Writer*>(handle)->written_bytes.load() : -1;
}

int fio_close(void* handle) {
  if (!handle) return -1;
  auto* w = static_cast<Writer*>(handle);
  {
    std::lock_guard<std::mutex> lk(w->mu);
    w->stop.store(true);
  }
  w->cv.notify_all();
  w->thread.join();
  fclose(w->fp);
  delete w;
  return 0;
}

uint32_t fio_crc32(const void* data, int64_t nbytes) {
  return crc32(static_cast<const uint8_t*>(data),
               static_cast<size_t>(nbytes));
}

}  // extern "C"
