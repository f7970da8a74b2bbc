// Runtime-dispatched SIMD function cloning for the hot math loops.
//
// TSC_SIMD_CLONES compiles the annotated function once per listed ISA;
// the glibc ifunc resolver picks the widest one the host supports at
// load time.  ONE portable binary therefore runs baseline SSE2
// everywhere and AVX2 / AVX-512 where available — the deployment
// counterpart of the reference engines' per-arch build matrix
// (/root/reference/inference/README.md:13-38) without cross-compiling.
#pragma once

#if defined(__x86_64__) && defined(__gnu_linux__) && defined(__GNUC__) && \
    !defined(__clang__)
#define TSC_SIMD_CLONES \
  __attribute__((target_clones("avx512f", "avx2", "default")))
#else
#define TSC_SIMD_CLONES
#endif
