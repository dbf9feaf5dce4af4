// Minimal glog shim for building the reference without network deps.
#pragma once
#include <cassert>
#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>
namespace google {
inline void InitGoogleLogging(const char*) {}
inline void InstallFailureSignalHandler() {}
}
enum _LogSev { INFO, WARNING, ERROR, FATAL };
class _LogMsg {
 public:
  explicit _LogMsg(_LogSev s) : s_(s) {}
  ~_LogMsg() {
    std::cerr << ss_.str() << std::endl;
    if (s_ == FATAL) std::abort();
  }
  template <typename T>
  _LogMsg& operator<<(const T& v) { ss_ << v; return *this; }
 private:
  _LogSev s_;
  std::ostringstream ss_;
};
#define LOG(sev) _LogMsg(sev)
#define CHECK(x) assert(x)
#define CHECK_EQ(a, b) assert((a) == (b))
#define CHECK_GE(a, b) assert((a) >= (b))
#define CHECK_GT(a, b) assert((a) > (b))
