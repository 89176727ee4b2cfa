// Parity harness (ours): run the REFERENCE's SpmvVerifier
// (src/spmv/verifier.cc:7, SpmvSerial over the in-CSR + the
// max-relative-error tolerance from spmv_util.h:16-43) on the y-vector
// WE computed, read from a raw f32 file.  Operands match the reference
// driver: Ax = 0.2, x = 0.3, y0 = 0 (src/spmv/main.cc:28-37).
#include "spmv.h"
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <vector>

int main(int argc, char* argv[]) {
  if (argc < 6) {
    fprintf(stderr, "usage: %s <filetype> <prefix> <sym> <rev> <yfile>\n",
            argv[0]);
    return 1;
  }
  Graph g(argv[2], argv[1], atoi(argv[3]) != 0, atoi(argv[4]) != 0);
  auto m = g.V();
  auto nnz = g.E();
  std::vector<ValueT> Ax(nnz, ValueT(0.2));
  std::vector<ValueT> x(m, ValueT(0.3));
  std::vector<ValueT> y0(m, ValueT(0));
  std::vector<float> raw(m);
  std::ifstream f(argv[5], std::ios::binary);
  if (!f.read(reinterpret_cast<char*>(raw.data()), m * sizeof(float))) {
    fprintf(stderr, "short read on %s\n", argv[5]);
    return 2;
  }
  std::vector<ValueT> test_y(m);
  for (int i = 0; i < m; i++) test_y[i] = ValueT(raw[i]);
  SpmvVerifier(g, Ax.data(), x.data(), y0.data(), test_y.data());
  return 0;
}
