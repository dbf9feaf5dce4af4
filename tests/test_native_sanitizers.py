"""Sanitizer runs of the threaded native CSV reader.

The reference ships asan/tsan/ubsan bazel configs as its race-detection
answer for lock-based threading (reference .bazelrc:23-96); our only
threaded native code is ``native/csv_reader.cc`` (std::thread workers
parsing disjoint spans of a shared mmap). These tests compile it with
ThreadSanitizer / AddressSanitizer+UBSan into a standalone driver binary
(sanitizer runtimes don't come up inside an uninstrumented Python via
dlopen) and push the multithreaded corpus through it: any data race,
heap overflow, or UB aborts the run with a nonzero exit.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from safer2_recommender_tpu.native import build as native_build

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(shutil.which("g++") is None,
                       reason="native toolchain unavailable"),
]

_DRIVER = r"""
#include <cstdint>
#include <cstdio>
#include <vector>
extern "C" {
int64_t frt_csv_count(const char*);
int64_t frt_csv_read(const char*, int32_t*, int32_t*, int64_t);
}
int main(int argc, char** argv) {
  for (int a = 1; a < argc; ++a) {
    int64_t n = frt_csv_count(argv[a]);
    if (n < 0) return 2;
    std::vector<int32_t> u(n ? n : 1), v(n ? n : 1);
    int64_t got = frt_csv_read(argv[a], u.data(), v.data(), n);
    if (got != n) return 3;
  }
  std::printf("ok\n");
  return 0;
}
"""


def _corpus(tmp_path):
    """Corpus that forces the threaded path (>= 2^16 rows) plus the
    edge cases from test_native_io.py."""
    paths = []
    rows = "\n".join((" " if k == 40000 else "") + f"{k % 97},{k % 31}"
                     for k in range(80000))
    big = tmp_path / "big.csv"
    big.write_text("uid,sid\n" + rows + "\n")
    paths.append(str(big))

    rng = np.random.default_rng(1)
    lines = ["uid,sid"]
    for _ in range(500):
        r = rng.random()
        if r < 0.1:
            lines.append("")
        elif r < 0.2:
            lines.append(" \t ")
        else:
            lines.append(f"{rng.integers(0, 5000)},{rng.integers(0, 5000)}")
    messy = tmp_path / "messy.csv"
    messy.write_text("\r\n".join(lines))   # no trailing newline
    paths.append(str(messy))
    return paths


def _run_sanitized(tmp_path, flags, name):
    driver = tmp_path / "driver.cc"
    driver.write_text(_DRIVER)
    exe = tmp_path / f"drv_{name}"
    cmd = ["g++", "-O1", "-g", "-std=c++17", *flags,
           str(driver), native_build._SRC, "-o", str(exe), "-lpthread"]
    res = subprocess.run(cmd, capture_output=True, timeout=300)
    if res.returncode != 0:
        pytest.skip(f"{name} unavailable: {res.stderr.decode()[:200]}")
    run = subprocess.run([str(exe), *_corpus(tmp_path)],
                         capture_output=True, timeout=300,
                         env={**os.environ,
                              f"{name.upper()}_OPTIONS": "exitcode=66"})
    err = run.stderr.decode()
    assert run.returncode == 0, (run.returncode, err[:2000])
    assert "ok" in run.stdout.decode()
    assert "SUMMARY:" not in err, err[:2000]


def test_csv_reader_tsan(tmp_path):
    _run_sanitized(tmp_path, ["-fsanitize=thread"], "tsan")


def test_csv_reader_asan_ubsan(tmp_path):
    _run_sanitized(tmp_path, ["-fsanitize=address,undefined"], "asan")


def test_csv_reader_ubsan_full_strict(tmp_path):
    # The reference's sanitizer matrix goes beyond default asan/tsan
    # (reference .bazelrc:23-96, msan/xsan configs). msan needs clang
    # (absent here); the equivalent breadth g++ offers is UBSan with
    # every non-default check enabled and recovery disabled — any
    # float-cast overflow, strict-bounds overrun, or div-by-zero in the
    # parser aborts instead of printing-and-continuing.
    _run_sanitized(
        tmp_path,
        ["-fsanitize=undefined,float-divide-by-zero,float-cast-overflow,"
         "bounds-strict", "-fno-sanitize-recover=all"],
        "ubsan")
