"""Rebuild .bench_cache host artifacts (graphs + hybrid layout pickle)
on CPU, and print the BFS level structure of the rmat20 bench graph
(frontier / unvisited sizes per level) to drive the bottom-up masking
design.  Run with `python -u` in the background; pure host work."""
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")
import bench


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20

log(f"generating rmat{scale} (sym, reverse)...")
g = bench.get_graph(scale, need_reverse=True)
log(f"done: m={g.m} nnz={g.nnz}")

log("warm_hybrid build...")
bench.warm_hybrid(g, scale)
log("warm_hybrid done")

log(f"generating rmat{scale}d (directed)...")
gd = bench.get_graph_directed(scale)
log(f"done: m={gd.m} nnz={gd.nnz}")

# ---- BFS level structure from the bench source --------------------------
rowptr = np.asarray(g.rowptr, np.int64)
colidx = np.asarray(g.colidx, np.int64)
deg = np.diff(rowptr)
src = int(np.argmax(deg))
log(f"BFS sim from source {src} (deg {deg[src]})")
dist = np.full(g.m, -1, np.int32)
dist[src] = 0
frontier = np.array([src], np.int64)
lvl = 0
while frontier.size:
    # frontier out-edge count (scout) and unvisited stats BEFORE the level
    scout = int(deg[frontier].sum())
    unvis = dist < 0
    n_unvis = int(unvis.sum())
    e_unvis = int(deg[unvis].sum())
    # expand
    idx = np.concatenate([np.arange(rowptr[v], rowptr[v + 1])
                          for v in frontier]) if frontier.size < 100000 \
        else None
    if idx is not None:
        nbrs = colidx[idx]
    else:
        mask = np.zeros(g.m, bool)
        mask[frontier] = True
        edge_sel = np.repeat(mask, deg)
        nbrs = colidx[edge_sel]
    new = np.unique(nbrs)
    new = new[dist[new] < 0]
    dist[new] = lvl + 1
    log(f"  level {lvl}: |F|={frontier.size} scout={scout} "
        f"unvisited={n_unvis} unvis_edges={e_unvis} -> new={new.size}")
    frontier = new
    lvl += 1
log(f"levels={lvl} visited={int((dist >= 0).sum())} of {g.m}")
