// Minimal gflags replacement for building the reference baseline without
// gflags installed. Flags become plain globals with their default values.
#pragma once

#include <cstdint>
#include <string>

// Weak so that the same flag DEFINE'd in two translation units links (the
// real build avoids this by lazy static-archive object pulling).
#define DEFINE_bool(name, val, txt) __attribute__((weak)) bool FLAGS_##name = (val)
#define DEFINE_int32(name, val, txt) __attribute__((weak)) int32_t FLAGS_##name = (val)
#define DEFINE_uint32(name, val, txt) __attribute__((weak)) uint32_t FLAGS_##name = (val)
#define DEFINE_int64(name, val, txt) __attribute__((weak)) int64_t FLAGS_##name = (val)
#define DEFINE_double(name, val, txt) __attribute__((weak)) double FLAGS_##name = (val)
#define DEFINE_string(name, val, txt) __attribute__((weak)) std::string FLAGS_##name = (val)

#define DECLARE_bool(name) extern bool FLAGS_##name
#define DECLARE_int32(name) extern int32_t FLAGS_##name
#define DECLARE_uint32(name) extern uint32_t FLAGS_##name
#define DECLARE_int64(name) extern int64_t FLAGS_##name
#define DECLARE_double(name) extern double FLAGS_##name
#define DECLARE_string(name) extern std::string FLAGS_##name

namespace google {
inline void ParseCommandLineFlags(int*, char***, bool) {}
inline void SetUsageMessage(const std::string&) {}
}  // namespace google
