"""CC — connected components (Afforest / Shiloach-Vishkin).

Reference: src/cc/{cc.h,omp_afforest.cc,base.cu}.  Labels are
representative vertex ids; the verifier only requires label consistency
(same component <=> same label, src/cc/verifier.cc:35-60).

TPU design: the reference's lock-free union-find Link
(omp_afforest.cc:12-25) becomes edge-parallel two-sided hooking — one
scatter-min per direction into the current ROOT of each endpoint —
followed by full pointer-jumping compression; the round loop is fused in
one lax.while_loop:
    comp = comp.at[comp[dst]].min(comp[src])    # hook dst's root down
    comp = comp.at[comp[src]].min(comp[dst])    # hook src's root down
    comp = pointer_jump(comp)
Converges in O(log m) rounds of O(E) scatters.

Variants:
  'sv'       — hooking over all edges every round (Shiloach-Vishkin,
               reference base.cu).
  'afforest' — Afforest (omp_afforest.cc:37-83): `neighbor_rounds` sampling
               rounds hook only the r-th neighbor of each vertex; then the
               most frequent component is found from a 1024-vertex sample
               (verifier.cc:13-33 SampleFrequentElement) and the final
               hooking rounds skip edges internal to that component.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gardenia_tpu.ops.pointer_jump import pointer_jump


class CCResult(NamedTuple):
    comp: jax.Array        # i32[m] representative labels
    iterations: jax.Array  # i32


def _hook_edges(comp, src, dst, m):
    """Two-sided union by min label (Link, omp_afforest.cc:12-25)."""
    from gardenia_tpu.ops import rowsel
    ls, ld = rowsel.take(comp, src), rowsel.take(comp, dst)
    comp = comp.at[ld].min(ls, mode="drop")
    comp = comp.at[ls].min(ld, mode="drop")
    return comp


def _coo(g):
    src, dst = g.device_coo()
    return src, dst


def cc_sv(g, *, layout: str = "auto") -> CCResult:
    """Gather-only Shiloach-Vishkin: per round one min-select sweep
    (in+out directions for directed graphs) gives each vertex its
    minimum neighbor label; hooking scatters only m root entries (not
    2*nnz edge entries — scalar scatters are the expensive op on TPU,
    PERFORMANCE.md), then full pointer jumping.

    layout='hybrid' (PRODUCTION on TPU since round 4): the dense round
    rides the hybrid layout — panels run the XLA fused masked reduce
    -min (ops/bsr.spmv_hybrid_min_select: where(panel != 0, x, SENT)
    fused into the reduction, streaming int8 panels at HBM bandwidth)
    and only the remainder pays rowsel gathers; labels live in
    relabeled id space and map back at the end.  This replaces the
    round-3 Pallas min-select kernel, which lost 6x to ELL at RMAT-16
    (per-slot grid overhead with no MXU to ride); the XLA masked
    reduce measured ~panel-bandwidth in round 4 and works on every
    backend."""
    from gardenia_tpu.ops import I32_MIN_SELECT2, spmv_ell
    from gardenia_tpu.solvers.bfs import _resolve_layout

    if layout == "auto":
        layout = _resolve_layout(layout)
    m = g.m
    SENT = np.int32(np.iinfo(np.int32).max)

    def build():
        if layout == "hybrid":
            from gardenia_tpu.core.relabel import relabeled
            rel = relabeled(g)
            gsrc = rel.graph        # sparse rounds live in RELABELED ids
            hybs = [rel.graph.hybrid()]
            if not g.symmetric:
                hybs.append(rel.graph.hybrid(reverse=True))
            new_of_old = jnp.asarray(rel.new_of_old)
            old_of_new = jnp.asarray(rel.old_of_new)
        else:
            gsrc = g
            hybs = None
            new_of_old = old_of_new = None
            ells = [g.ell()]
            if not g.symmetric:
                ells.append(g.ell(reverse=True))

        def sweep(mats, comp):
            if layout == "hybrid":
                from gardenia_tpu.ops.bsr import spmv_hybrid_min_select
                nbr = None
                for h in mats:
                    y = spmv_hybrid_min_select(h, comp, num_rows=m,
                                               sentinel=int(SENT))
                    nbr = y if nbr is None else jnp.minimum(nbr, y)
                return nbr
            nbr = None
            for ell in mats:
                y = spmv_ell(ell, comp, semiring=I32_MIN_SELECT2,
                             num_rows=m)
                nbr = y if nbr is None else jnp.minimum(nbr, y)
            return nbr

        # ALL device buffers (ELL slabs / hybrid panels, CSR dirs,
        # degrees, relabel maps) must flow through jit ARGUMENTS: at
        # scale 20 the closed-over buffers exceed the axon remote
        # compiler's request-body limit (HTTP 413, CLAUDE.md gotcha).

        # frontier-ized rounds (round 3): after the first 1-2 rounds
        # only a few labels still move, yet every round paid the full
        # O(E) min-select sweep (~143 ms at RMAT-20).  Label-correcting
        # invariant: every potentially-improving edge has an endpoint
        # whose label changed last round — so small rounds relax ONLY
        # the changed vertices' incident edges (both directions) at
        # graduated static capacities, like bfs/sssp.
        from gardenia_tpu.core import types as _T
        from gardenia_tpu.ops import rowsel
        from gardenia_tpu.ops.frontier import (compact_mask,
                                               expand_frontier_edges)
        nnz = gsrc.nnz
        dirs = [gsrc.device_csr()]
        if not gsrc.symmetric:
            dirs.append(gsrc.device_csr(reverse=True))
        deg_all = gsrc.device_degrees()
        if not gsrc.symmetric:
            deg_all = deg_all + gsrc.device_degrees(reverse=True)
        # top tier clamped at 512K slots: beyond that the dense sweep
        # is cheaper anyway (13 gather-class ops x ~4 ns/slot vs one
        # O(E) min-select), and multi-million-slot scatter shapes under
        # lax.switch sent the axon remote compiler into 20+ minute
        # territory (twice wedging the tunnel outright)
        cap_base = _T.next_pow2(max(len(dirs) * nnz // 8, 1024))
        cap_base = min(cap_base, 1 << 19)
        tiers_cc = []
        for shift in (8, 4, 0):
            ce = max(2048, cap_base >> shift)
            if ce not in tiers_cc:
                tiers_cc.append(ce)
        # frequent-component skip (omp_afforest.cc SampleFrequentElement
        # + the final-round skip, verifier.cc:13-33): vertices already
        # carrying the giant component's label are excluded from the
        # post-round-1 frontier.  Exact for this relaxation: labels are
        # compressed after every round, so intra-component edges cannot
        # improve anything, and every CROSS-label edge has an endpoint
        # OUTSIDE the frequent component — relaxing non-frequent
        # vertices over both directions covers all candidates.  At
        # RMAT-20 this turns the O(E) confirmation sweep (round 2
        # changed ~500K labels, nearly all freshly-compressed giant
        # members) into a 2048-slot sparse round.
        sample_idx = jnp.asarray(
            np.random.default_rng(0).integers(0, m, 1024,
                                              dtype=np.int64)
            .astype(np.int32))

        # host-precomputed r-th-neighbor partners for the two sampling
        # pre-rounds (omp_afforest.cc:40-50): a dense vector READ on
        # device instead of an m-wide gather from colidx.  Round 5
        # finding (closing the VERDICT r4 'pre-rounds cost 80% not 4%'
        # contradiction): O(m) RANDOM scatters/gathers cost ~7 ns/elt —
        # comparable to a whole O(E) panel sweep at ~0.12 ns/edge — so
        # every gather/scatter shaved off the pre-rounds matters.
        rp_h = np.asarray(gsrc.rowptr, np.int64)
        ci_h = np.asarray(gsrc.colidx, np.int64)
        deg_h = np.diff(rp_h)
        vid_h = np.arange(m, dtype=np.int64)
        part_h = []
        for r in range(2):
            if nnz:
                p = np.where(deg_h > r,
                             ci_h[np.minimum(rp_h[:m] + r, nnz - 1)],
                             vid_h)
            else:
                p = vid_h
            part_h.append(jnp.asarray(p.astype(np.int32)))
        parts01 = tuple(part_h)

        def run(comp0, mats, dirs_, deg_all_, parts01_, new_of_old_,
                old_of_new_):
            # Afforest-style sampling pre-rounds fused into the sv
            # path: on the degree-RELABELED graph the first neighbor
            # is the minimum-id neighbor — the best possible min-label
            # hook.  TWO rounds are load-bearing (round 4: one round
            # cost a third full round, RMAT-20 350 vs 286 ms).
            # Round 0 exploits identity labels (comp0[x] == x): the
            # partner's label IS the partner (no gather) and the
            # second hook comp[v].min(partner) is an elementwise min
            # (no scatter) — one scatter-min + one vector min + jump.
            if nnz:
                p0, p1 = parts01_
                c = comp0.at[p0].min(comp0, mode="drop")
                comp0 = pointer_jump(jnp.minimum(c, p0))
                # round 1: general two-sided root hook on live labels
                ld = rowsel.take(comp0, p1)
                c = comp0.at[ld].min(comp0, mode="drop")
                comp0 = pointer_jump(
                    c.at[comp0].min(ld, mode="drop"))
            def _sparse_round(ce):
                def go(args):
                    comp, live = args
                    ids = compact_mask(live & (deg_all_ > 0),
                                       min(_T.next_pow2(max(m, 2)), ce),
                                       m)
                    new = comp
                    for rp, ci in dirs_:
                        src, dst, valid, _ = expand_frontier_edges(
                            rp, ci, ids, ce)
                        # TWO-SIDED relax (the reference Link,
                        # omp_afforest.cc:12-25): the frequent-
                        # component skip keeps a frequent-labeled u
                        # out of ids forever, so the edge (u, v) must
                        # improve BOTH endpoints when processed from
                        # v's side — push-only relaxation never
                        # delivered u's smaller label to v
                        lbl_s = rowsel.take(comp, src)
                        lbl_d = rowsel.take(comp, dst)
                        new = new.at[jnp.where(valid, dst, m)].min(
                            lbl_s, mode="drop")
                        new = new.at[jnp.where(valid, src, m)].min(
                            lbl_d, mode="drop")
                    hooked = comp.at[comp].min(new, mode="drop")
                    return jnp.minimum(hooked, new)
                return go

            def _dense_round(args):
                comp, _ = args
                nbr = sweep(mats, comp)
                new = jnp.minimum(comp, nbr)
                # hook each vertex's current root down to its new
                # label, and the new label's root likewise (two
                # m-sized scatters replace the reference Link's
                # per-edge CAS)
                hooked = comp.at[comp].min(new, mode="drop")
                hooked = hooked.at[jnp.minimum(nbr, m - 1)].min(
                    jnp.where(nbr < m, new, m), mode="drop")
                return jnp.minimum(hooked, comp)

            branches = [_sparse_round(ce) for ce in tiers_cc] + \
                [_dense_round]

            def cond(state):
                _, changed, _ = state
                return jnp.any(changed)

            def body(state):
                comp, changed, it = state
                # frequent-component skip: every round relaxes ALL
                # vertices not carrying the sampled frequent label
                # (NOT just last round's changed set — a skipped giant
                # vertex whose label drops must still be seen by its
                # unchanged non-giant neighbors, so those neighbors
                # stay in the frontier until fixpoint).  Every cross-
                # label edge has a non-frequent endpoint and both
                # direction lists are relaxed, so this covers every
                # improving edge; labels decrease monotonically, so
                # the loop still terminates on `changed`.
                counts = jnp.zeros((m,), jnp.int32).at[
                    rowsel.take(comp, sample_idx)].add(1, mode="drop")
                biggest = jnp.argmax(counts).astype(jnp.int32)
                live = comp != biggest
                scout = jnp.sum(jnp.where(live, deg_all_, 0))
                idx = jnp.int32(0)
                for ce in tiers_cc:
                    idx = idx + jnp.where(scout > ce, 1, 0)
                # pointer_jump ONCE after the switch: a while_loop
                # nested inside every switch branch sent the axon
                # remote compiler past 25 minutes at scale 20
                comp2 = pointer_jump(
                    jax.lax.switch(idx, branches, (comp, live)))
                return comp2, comp2 != comp, it + 1

            changed0 = jnp.ones((m,), bool)
            comp, _, it = jax.lax.while_loop(
                cond, body, (comp0, changed0, jnp.int32(0)))
            if new_of_old_ is not None:
                # back to original id space: positions via new_of_old,
                # label values via old_of_new
                comp = rowsel.take(old_of_new_,
                                   rowsel.take(comp, new_of_old_))
            return CCResult(comp, it)

        jitted = jax.jit(run)
        if layout == "hybrid":
            return lambda c0: jitted(c0, hybs, dirs, deg_all, parts01,
                                     new_of_old, old_of_new)
        return lambda c0: jitted(c0, ells, dirs, deg_all, parts01,
                                 None, None)

    run = g._dev(("cc_sv_run", layout), build)
    return run(jnp.arange(m, dtype=jnp.int32))


def cc_afforest(g, neighbor_rounds: int = 2) -> CCResult:
    m = g.m
    rowptr, colidx = g.device_csr()
    src, dst = _coo(g)

    def _run(comp0):
        comp = comp0
        vid = jnp.arange(m, dtype=jnp.int32)
        # sampling rounds: hook only the r-th neighbor of each vertex
        # (omp_afforest.cc:40-50)
        for r in range(neighbor_rounds):
            start = rowptr[:-1] + r
            has = start < rowptr[1:]
            partner = colidx[jnp.minimum(start, colidx.shape[0] - 1)]
            partner = jnp.where(has, partner, vid)
            comp = _hook_edges(comp, vid, partner, m)
            comp = pointer_jump(comp)
        # most frequent component from a fixed 1024-vertex sample
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, m, 1024, dtype=np.int64)
            .astype(np.int32))
        counts = jnp.zeros((m,), jnp.int32).at[comp[idx]].add(1)
        biggest = jnp.argmax(counts).astype(jnp.int32)

        def cond(state):
            _, changed, _ = state
            return changed

        def body(state):
            comp, _, it = state
            from gardenia_tpu.ops import rowsel
            ls0 = rowsel.take(comp, src)
            ld0 = rowsel.take(comp, dst)
            # skip edges fully inside the biggest component
            # (omp_afforest.cc:57-62)
            keep = (ls0 != biggest) | (ld0 != biggest)
            ls, ld = ls0, ld0
            new = comp.at[jnp.where(keep, ld, m)].min(ls, mode="drop")
            new = new.at[jnp.where(keep, ls, m)].min(ld, mode="drop")
            new = pointer_jump(new)
            return new, jnp.any(new != comp), it + 1

        comp, _, it = jax.lax.while_loop(
            cond, body, (comp, jnp.bool_(True), jnp.int32(0)))
        return CCResult(comp, it + neighbor_rounds)

    run = g._dev(("cc_afforest_run", neighbor_rounds),
                 lambda: jax.jit(_run))
    return run(jnp.arange(m, dtype=jnp.int32))


VARIANTS = {"sv": cc_sv, "afforest": cc_afforest}


def cc_solver(g, *, variant: str = "afforest") -> CCResult:
    """Reference entry CCSolver(g, comp) (src/cc/cc.h:30)."""
    return VARIANTS[variant](g)
