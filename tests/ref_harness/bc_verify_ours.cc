// Parity harness (ours): run the REFERENCE's BCVerifier
// (src/bc/verifier.cc:70, serial Brandes + max-normalization, 1e-4
// tolerance) on normalized scores WE computed, read from a raw f32 file.
#include "bc.h"
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <vector>

int main(int argc, char* argv[]) {
  if (argc < 7) {
    fprintf(stderr,
            "usage: %s <filetype> <prefix> <sym> <rev> <source> <scorefile>\n",
            argv[0]);
    return 1;
  }
  Graph g(argv[2], argv[1], atoi(argv[3]) != 0, atoi(argv[4]) != 0);
  int source = atoi(argv[5]);
  std::vector<float> raw(g.V());
  std::ifstream f(argv[6], std::ios::binary);
  if (!f.read(reinterpret_cast<char*>(raw.data()),
              g.V() * sizeof(float))) {
    fprintf(stderr, "short read on %s\n", argv[6]);
    return 2;
  }
  std::vector<ScoreT> scores(g.V());
  for (int i = 0; i < g.V(); i++) scores[i] = ScoreT(raw[i]);
  BCVerifier(g, source, 1, scores.data());
  return 0;
}
