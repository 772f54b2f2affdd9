// Minimal glog replacement so the reference baseline can be compiled in an
// environment without glog installed. Implements just the macros the
// reference solver uses: CHECK*, LOG, VLOG, and InitGoogleLogging.
// This is NOT reference code; it exists only to build the upstream baseline
// binary used by bench.py / golden-data generation.
#pragma once

#include <cmath>
#include <cstdlib>
#include <iostream>
#include <sstream>

// Real glog pulls in gflags transitively; some reference TUs rely on that.
#include <gflags/gflags.h>

namespace google {
inline void InitGoogleLogging(const char*) {}
inline void ShutDownCommandLineFlags() {}
}  // namespace google

// Verbosity / behavior flags referenced by mains.
inline bool FLAGS_logtostderr = false;
inline int FLAGS_minloglevel = 0;
inline int FLAGS_v = 0;
inline std::string FLAGS_log_dir = "";

namespace glog_stub {

class MessageVoidify {
 public:
  void operator&(std::ostream&) {}
};

class LogMessage {
 public:
  LogMessage(const char* file, int line, bool fatal, bool enabled = true)
      : fatal_(fatal), enabled_(enabled) {
    if (enabled_) stream_ << file << ":" << line << "] ";
  }
  ~LogMessage() {
    if (enabled_) std::cerr << stream_.str() << std::endl;
    if (fatal_) std::abort();
  }
  std::ostream& stream() { return stream_; }

 private:
  std::ostringstream stream_;
  bool fatal_;
  bool enabled_;
};

}  // namespace glog_stub

#define LOG_INFO ::glog_stub::LogMessage(__FILE__, __LINE__, false, false)
#define LOG_WARNING ::glog_stub::LogMessage(__FILE__, __LINE__, false, false)
#define LOG_ERROR ::glog_stub::LogMessage(__FILE__, __LINE__, false)
#define LOG_FATAL ::glog_stub::LogMessage(__FILE__, __LINE__, true)
#define LOG(severity) LOG_##severity.stream()

#define VLOG_IS_ON(n) (FLAGS_v >= (n))
#define VLOG(n) \
  ::glog_stub::LogMessage(__FILE__, __LINE__, false, VLOG_IS_ON(n)).stream()
#define VLOG_IF(n, cond)                                    \
  ::glog_stub::LogMessage(__FILE__, __LINE__, false,        \
                          VLOG_IS_ON(n) && (cond))          \
      .stream()
#define LOG_IF(severity, cond) \
  ::glog_stub::LogMessage(__FILE__, __LINE__, false, (cond)).stream()

#define CHECK(cond)                                                       \
  (cond) ? (void)0                                                       \
         : ::glog_stub::MessageVoidify() &                               \
               ::glog_stub::LogMessage(__FILE__, __LINE__, true).stream() \
                   << "CHECK failed: " #cond " "

#define CHECK_OP(op, a, b)                                                 \
  ((a)op(b)) ? (void)0                                                    \
             : ::glog_stub::MessageVoidify() &                            \
                   ::glog_stub::LogMessage(__FILE__, __LINE__, true)      \
                           .stream()                                      \
                       << "CHECK failed: " #a " " #op " " #b " (" << (a)  \
                       << " vs " << (b) << ") "

#define CHECK_EQ(a, b) CHECK_OP(==, a, b)
#define CHECK_NE(a, b) CHECK_OP(!=, a, b)
#define CHECK_LE(a, b) CHECK_OP(<=, a, b)
#define CHECK_LT(a, b) CHECK_OP(<, a, b)
#define CHECK_GE(a, b) CHECK_OP(>=, a, b)
#define CHECK_GT(a, b) CHECK_OP(>, a, b)

namespace glog_stub {
template <typename T>
T* CheckNotNull(const char* file, int line, T* t) {
  if (t == nullptr) {
    LogMessage(file, line, true).stream() << "CHECK_NOTNULL failed";
  }
  return t;
}
template <typename T>
const T& CheckNotNull(const char* file, int line, const T& t) {
  return t;
}
}  // namespace glog_stub

#define CHECK_NOTNULL(val) ::glog_stub::CheckNotNull(__FILE__, __LINE__, (val))

#define DLOG(severity) LOG(severity)
#define DCHECK(cond) CHECK(cond)
#define DCHECK_EQ(a, b) CHECK_EQ(a, b)
#define DCHECK_NE(a, b) CHECK_NE(a, b)
#define DCHECK_LE(a, b) CHECK_LE(a, b)
#define DCHECK_LT(a, b) CHECK_LT(a, b)
#define DCHECK_GE(a, b) CHECK_GE(a, b)
#define DCHECK_GT(a, b) CHECK_GT(a, b)

#define CHECK_NEAR(a, b, tol) CHECK_LE(std::abs((a) - (b)), (tol))
