// Threaded bulk file reader — the native backbone of the host input
// pipeline.  Python computes per-file data offsets (npy headers) once and
// hands this library a batch of (path, offset, nbytes, dest) quadruples; the
// reads run on a thread pool with pread(2), entirely outside the GIL, and
// write directly into the preallocated batch buffer (zero-copy assembly).

#include <fcntl.h>
#include <unistd.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Read `count` blocks: paths[i] -> dest + dest_offsets[i], reading nbytes[i]
// starting at file offset offsets[i].  Returns 0 on success, else the index
// of the first failed read + 1.
int read_blocks(const char** paths, const int64_t* offsets,
                const int64_t* nbytes, char* dest,
                const int64_t* dest_offsets, int count, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > count) n_threads = count;
  std::atomic<int> next(0);
  std::atomic<int> failed(0);

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= count) break;
      int fd = open(paths[i], O_RDONLY);
      if (fd < 0) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        continue;
      }
      int64_t off = offsets[i];
      int64_t left = nbytes[i];
      char* out = dest + dest_offsets[i];
      while (left > 0) {
        ssize_t got = pread(fd, out, (size_t)left, (off_t)off);
        if (got <= 0) {
          int expected = 0;
          failed.compare_exchange_strong(expected, i + 1);
          break;
        }
        left -= got;
        off += got;
        out += got;
      }
      close(fd);
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failed.load();
}

}  // extern "C"
