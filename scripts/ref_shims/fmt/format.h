// Minimal fmt shim: supports the reference's fmt::format/fmt::print calls
// with "{}"-style (and "{0}"/"{1:.4f}"-ish) placeholders via sstream.
#pragma once
#include <iostream>
#include <sstream>
#include <string>
#include <vector>
namespace fmt {
namespace detail {
inline void collect(std::vector<std::string>&) {}
template <typename T, typename... Rest>
void collect(std::vector<std::string>& out, const T& v, const Rest&... rest) {
  std::ostringstream ss;
  ss << v;
  out.push_back(ss.str());
  collect(out, rest...);
}
}  // namespace detail
template <typename... Args>
std::string format(const std::string& f, const Args&... args) {
  std::vector<std::string> vals;
  detail::collect(vals, args...);
  std::string out;
  size_t next = 0;
  for (size_t i = 0; i < f.size();) {
    if (f[i] == '{') {
      size_t j = f.find('}', i);
      if (j == std::string::npos) { out += f.substr(i); break; }
      std::string spec = f.substr(i + 1, j - i - 1);
      size_t idx = next;
      if (!spec.empty() && spec[0] >= '0' && spec[0] <= '9')
        idx = std::stoul(spec.substr(0, spec.find(':')));
      if (idx < vals.size()) out += vals[idx];
      next = idx + 1;
      i = j + 1;
    } else {
      out += f[i++];
    }
  }
  return out;
}
template <typename... Args>
void print(const std::string& f, const Args&... args) {
  std::cout << format(f, args...);
}
}  // namespace fmt
