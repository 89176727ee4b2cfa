// Parity harness (ours): load a graph with the REFERENCE's loader and run
// the REFERENCE's SSSPVerifier (src/sssp/verifier.cc:8, serial Dijkstra,
// exact equality) on distances WE computed, read from a raw int32 file.
// Unit weights, matching the reference driver (src/sssp/main.cc:27).
#include "sssp.h"
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <vector>

int main(int argc, char* argv[]) {
  if (argc < 7) {
    fprintf(stderr,
            "usage: %s <filetype> <prefix> <sym> <rev> <source> <distfile>\n",
            argv[0]);
    return 1;
  }
  Graph g(argv[2], argv[1], atoi(argv[3]) != 0, atoi(argv[4]) != 0);
  int source = atoi(argv[5]);
  std::vector<DistT> wt(g.E(), DistT(1));
  std::vector<int32_t> raw(g.V());
  std::ifstream f(argv[6], std::ios::binary);
  if (!f.read(reinterpret_cast<char*>(raw.data()),
              g.V() * sizeof(int32_t))) {
    fprintf(stderr, "short read on %s\n", argv[6]);
    return 2;
  }
  std::vector<DistT> dist(g.V());
  for (int i = 0; i < g.V(); i++) dist[i] = DistT(raw[i]);
  SSSPVerifier(g, source, wt.data(), dist.data());
  return 0;
}
