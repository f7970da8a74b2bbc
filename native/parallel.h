// Tiny persistent thread pool for the native runtime.
//
// The reference apps expose an engine thread count (--threads into the
// TFLite/MNN interpreters, /root/reference/inference/tflite/
// speech_commands.cpp:61-63); this runtime's analogue is a row-partitioned
// parallel_for over the conv output grid.  Default is 1 thread (exactly
// the previous single-threaded behaviour — no pool is started until
// set_num_threads(>1)).
#ifndef TSC_PARALLEL_H_
#define TSC_PARALLEL_H_

#include <condition_variable>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace tsc {

class ThreadPool {
 public:
  static ThreadPool& instance() {
    static ThreadPool pool;
    return pool;
  }

  void set_threads(int n) {
    if (n < 1) n = 1;
    std::unique_lock<std::mutex> lk(m_);
    if (n == threads_) return;
    stop_workers(lk);
    threads_ = n;
    start_workers(lk);
  }

  int threads() const { return threads_; }

  // Run fn(begin, end) over [0, total), partitioned into contiguous
  // chunks; the calling thread executes chunk 0.  fn must not recurse
  // into parallel_for.
  void parallel_for(int total, const std::function<void(int, int)>& fn) {
    const int n = threads_;
    if (n <= 1 || total <= 1) {
      fn(0, total);
      return;
    }
    const int chunks = std::min(n, total);
    const int step = (total + chunks - 1) / chunks;
    {
      std::unique_lock<std::mutex> lk(m_);
      task_ = &fn;
      task_total_ = total;
      task_step_ = step;
      next_chunk_ = 1;  // chunk 0 runs inline below
      // every worker wakes and reports exactly once per round, whether or
      // not it claimed a chunk
      pending_ = threads_ - 1;
      ++generation_;
      cv_work_.notify_all();
    }
    fn(0, std::min(step, total));
    std::unique_lock<std::mutex> lk(m_);
    cv_done_.wait(lk, [&] { return pending_ == 0; });
    task_ = nullptr;
  }

  ~ThreadPool() {
    std::unique_lock<std::mutex> lk(m_);
    stop_workers(lk);
  }

 private:
  ThreadPool() = default;

  void start_workers(std::unique_lock<std::mutex>&) {
    shutdown_ = false;
    for (int i = 1; i < threads_; ++i) {
      workers_.emplace_back([this] { worker_loop(); });
    }
  }

  void stop_workers(std::unique_lock<std::mutex>& lk) {
    shutdown_ = true;
    ++generation_;
    cv_work_.notify_all();
    lk.unlock();
    for (auto& t : workers_) t.join();
    lk.lock();
    workers_.clear();
  }

  void worker_loop() {
    unsigned long seen = 0;
    while (true) {
      const std::function<void(int, int)>* task = nullptr;
      {
        std::unique_lock<std::mutex> lk(m_);
        cv_work_.wait(lk, [&] { return shutdown_ || generation_ != seen; });
        seen = generation_;
        if (shutdown_) return;
        task = task_;
      }
      if (!task) continue;
      while (true) {
        int chunk;
        {
          std::unique_lock<std::mutex> lk(m_);
          if (task_ != task) break;  // round already drained
          chunk = next_chunk_;
          if (chunk * task_step_ >= task_total_) break;
          ++next_chunk_;
        }
        const int begin = chunk * task_step_;
        const int end = std::min(begin + task_step_, task_total_);
        (*task)(begin, end);
      }
      {
        std::unique_lock<std::mutex> lk(m_);
        if (pending_ > 0 && --pending_ == 0) cv_done_.notify_all();
      }
    }
  }

  std::mutex m_;
  std::condition_variable cv_work_, cv_done_;
  std::vector<std::thread> workers_;
  int threads_ = 1;
  bool shutdown_ = false;
  unsigned long generation_ = 0;
  const std::function<void(int, int)>* task_ = nullptr;
  int task_total_ = 0, task_step_ = 0, next_chunk_ = 0, pending_ = 0;
};

inline void set_num_threads(int n) { ThreadPool::instance().set_threads(n); }

inline void parallel_for(int total, const std::function<void(int, int)>& fn) {
  ThreadPool::instance().parallel_for(total, fn);
}

}  // namespace tsc

#endif  // TSC_PARALLEL_H_
