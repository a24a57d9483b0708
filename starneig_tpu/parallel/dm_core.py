"""Distributed-memory Schur solve: the fused driver over shard_map.

The reference's DM layer reruns the *same* task-insertion core with
``mpi != NULL`` — tiles carry owner ranks and StarPU-MPI moves them
implicitly (reference ``src/mpi/interface_schur.c:53-120``, window tasks
owner-executed ``src/schur/core.c:1498-1545``, distribution objects
``src/mpi/distr_matrix.c:97-163``).  The TPU-native equivalent here is the
same idea one level up: :func:`starneig_tpu.ops.schur._schur_iter` already
routes every full-extent access through an extent-op strategy; this module
provides :class:`ShardedExtent`, whose methods execute *inside*
``shard_map`` on column shards of the padded matrix with explicit ICI
collectives:

  * row-strip updates (``mul_rows``/``mul_rows_batch``) are entirely
    shard-local — each device updates the rows of its own columns;
  * column-panel updates gather the WC-wide panel with ONE ``psum``
    (ownership-masked contributions — the collective analogue of
    "windows gathered to the owner rank"), apply the window transform,
    and each shard writes back only the columns it owns;
  * diagonal-window reads (``get_block``/``get_diag_blocks``) use the
    same masked-psum gather; window math (AED, Francis, bulge trains)
    then runs replicated on every shard — replicating O(w^2) scalar work
    is cheaper on a TPU mesh than owner-computes + broadcast, and XLA
    overlaps it with the strip GEMMs.

Layout: the (NP, NP) padded matrix is column-sharded into (NP, C) blocks,
C = NP / nshards — the 1-D analogue of the reference's 2-D block-cyclic
distribution (column panels are what every hot update touches; row strips
stay local under column sharding).  The wrapper pads NP so that C divides
evenly and C >= every window width used by the driver.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from starneig_tpu.config import SchurConf
from starneig_tpu.errors import Error


@functools.lru_cache(maxsize=None)
def make_sharded_extent(axis: str, nshards: int):
    """Build a ShardedExtent class for a mesh axis (static, hashable).

    Memoized: ``ext`` is a static jit argument of the fused driver, so a
    fresh class per call would miss the jit cache and recompile the whole
    shard_map program on every DM solve.
    """

    class ShardedExtent:
        """Extent ops on (rows, C) column shards inside shard_map."""

        nsh = nshards
        ax = axis

        # -- ownership-masked column-panel gather/scatter ----------------
        #
        # Shard d owns global columns [d*C, (d+1)*C).  For a w-wide panel
        # at dynamic column j0, the local overlap is read/written through
        # a w-wide local window at clamped offset lo; the blend index
        # arithmetic below maps panel position p <-> local position q
        # exactly, including windows straddling two shards (C >= w is
        # guaranteed by the wrapper's padding).

        @staticmethod
        def _panel_contrib(S, i0, j0, h, w):
            """This shard's owned columns of the (h, w) panel, zeros
            elsewhere (sum over shards = the full panel)."""
            C = S.shape[1]
            d = lax.axis_index(axis)
            lo_un = j0 - d * C
            lo = jnp.clip(lo_un, 0, C - w)
            off = lo_un - lo
            Lw = lax.dynamic_slice(S, (i0, lo), (h, w))
            p = jnp.arange(w)
            q = p + off
            valid = (q >= 0) & (q < w)
            qc = jnp.clip(q, 0, w - 1)
            return jnp.where(valid[None, :], Lw[:, qc], 0.0)

        @staticmethod
        def _panel_write(S, panel, i0, j0, h, w):
            """Write back the columns of ``panel`` this shard owns."""
            C = S.shape[1]
            d = lax.axis_index(axis)
            lo_un = j0 - d * C
            lo = jnp.clip(lo_un, 0, C - w)
            off = lo_un - lo
            Lw = lax.dynamic_slice(S, (i0, lo), (h, w))
            q = jnp.arange(w)
            p = q - off
            valid = (p >= 0) & (p < w)
            pc = jnp.clip(p, 0, w - 1)
            newLw = jnp.where(valid[None, :], panel[:, pc], Lw)
            return lax.dynamic_update_slice(S, newLw, (i0, lo))

        # -- extent ops (same signatures as DenseExtent) -----------------

        @staticmethod
        def mul_rows(S, i0, h, Qw):
            # rows are unsharded under column sharding: fully local
            rows = lax.dynamic_slice(S, (i0, i0 * 0), (h, S.shape[1]))
            return lax.dynamic_update_slice(S, Qw.T @ rows, (i0, i0 * 0))

        @staticmethod
        def mul_cols(S, j0, w, Qw):
            E = ShardedExtent
            panel = lax.psum(
                E._panel_contrib(S, 0 * j0, j0, S.shape[0], w), axis)
            return E._panel_write(S, panel @ Qw, 0 * j0, j0, S.shape[0], w)

        @staticmethod
        def get_block(S, i0, j0, h, w):
            return lax.psum(
                ShardedExtent._panel_contrib(S, i0, j0, h, w), axis)

        @staticmethod
        def set_block(S, M, i0, j0):
            return ShardedExtent._panel_write(
                S, M, i0, j0, M.shape[0], M.shape[1])

        # -- batched variants over disjoint diagonal windows -------------

        @staticmethod
        def get_diag_blocks(S, ws, w):
            contribs = jax.vmap(
                lambda s: ShardedExtent._panel_contrib(S, s, s, w, w))(ws)
            return lax.psum(contribs, axis)

        @staticmethod
        def set_diag_blocks(S, Ms, ws):
            w = Ms.shape[1]

            def body(g, S):
                return ShardedExtent._panel_write(S, Ms[g], ws[g], ws[g],
                                                  w, w)

            return lax.fori_loop(0, ws.shape[0], body, S)

        @staticmethod
        def mul_rows_batch(S, ws, w, Qws):
            C = S.shape[1]
            R = jax.vmap(
                lambda s: lax.dynamic_slice(S, (s, s * 0), (w, C)))(ws)
            R = jnp.einsum("gij,gjn->gin", jnp.swapaxes(Qws, 1, 2), R)

            def body(g, S):
                return lax.dynamic_update_slice(S, R[g], (ws[g], ws[g] * 0))

            return lax.fori_loop(0, ws.shape[0], body, S)

        @staticmethod
        def mul_cols_batch(S, ws, w, Qws):
            E = ShardedExtent
            n0 = S.shape[0]
            panels = lax.psum(jax.vmap(
                lambda s: E._panel_contrib(S, 0 * s, s, n0, w))(ws), axis)
            panels = jnp.einsum("gnj,gjk->gnk", panels, Qws)

            def body(g, S):
                return E._panel_write(S, panels[g], 0 * ws[g], ws[g], n0, w)

            return lax.fori_loop(0, ws.shape[0], body, S)

        @staticmethod
        def zero_negligible(Spad, P, n, ihi, thresh):
            """Sharded negligible-subdiagonal zeroing.

            Diagonal/subdiagonal entries live on the shard owning their
            column; gather them with one psum, decide (replicated), write
            back shard-locally.  Returns (Spad, sub) with sub (n,)
            replicated — matching DenseExtent's contract.
            """
            NPr, C = Spad.shape
            d = lax.axis_index(axis)
            c = jnp.arange(C)
            j = d * C + c                    # global column of local col c
            inner = (j >= P) & (j < P + n)
            rsafe = jnp.clip(j, 0, NPr - 1)
            r1safe = jnp.clip(j + 1, 0, NPr - 1)
            dv = jnp.where(inner, Spad[rsafe, c], 0.0)
            sv = jnp.where(inner & (j + 1 < P + n), Spad[r1safe, c], 0.0)
            pos = jnp.clip(j - P, 0, n - 1)
            dvec = lax.psum(
                jnp.zeros((n,), Spad.dtype).at[pos].add(dv), axis)
            svec = lax.psum(
                jnp.zeros((n,), Spad.dtype).at[pos].add(sv), axis)

            ulp = jnp.finfo(Spad.dtype).eps
            tst = jnp.abs(dvec[:-1]) + jnp.abs(dvec[1:])
            idx = jnp.arange(n - 1)
            sub = svec[:-1]
            neg = (jnp.abs(sub) <= jnp.maximum(ulp * tst, thresh)) \
                & (idx + 1 < ihi)
            newsub = jnp.where(neg, 0.0, sub)
            full = jnp.concatenate([newsub, jnp.zeros((1,), Spad.dtype)])

            write = inner & (j + 1 < P + n)
            vals = jnp.where(write, full[pos], Spad[r1safe, c])
            Spad = Spad.at[r1safe, c].set(vals)
            return Spad, full

    ShardedExtent.__name__ = f"ShardedExtent_{axis}_{nshards}"
    return ShardedExtent


def schur_dm(H, Q=None, mesh: Optional[Mesh] = None,
             conf: Optional[SchurConf] = None):
    """Distributed Hessenberg -> Schur: the fused driver inside shard_map.

    The full multishift-QR iteration (AED rounds + wavefront sweeps) runs
    as one SPMD program over ``mesh``: each device holds a column shard of
    the padded matrix; collectives appear exactly where the extent ops
    demand them (see module docstring).  Mirrors
    ``starneig_SEP_DM_Schur`` (reference mpi/interface_schur.c) by running
    the identical driver core with a sharded extent strategy.

    Returns (S, Q, eig_real, eig_imag, info); S and Q come back with the
    mesh's column sharding (callers may keep computing distributed).
    """
    from starneig_tpu.ops.schur import (
        _schur_iter, _resolve_threshold, standardize_blocks)
    from starneig_tpu.ops.eigvals import extract_eigenvalues

    if mesh is None:
        devs = jax.devices()
        mesh = Mesh(np.array(devs), ("d",))
    axname = mesh.axis_names[0]
    nd = int(np.prod(mesh.devices.shape))

    H = jnp.asarray(H)
    n = H.shape[0]
    dtype = H.dtype
    Q = jnp.eye(n, dtype=dtype) if Q is None else jnp.asarray(Q)
    conf = (conf or SchurConf()).resolve(n, workers=nd)

    if n <= min(conf.small_limit, 300) or nd == 1:
        from starneig_tpu.ops.schur import schur as schur_sm
        return schur_sm(H, Q, conf=conf)

    # geometry as in the single-chip driver ...
    WA = min(max(32, conf.aed_window_size + 2), n)
    NS = max(2, min(conf.aed_shift_count // 2 * 2, 2 * (WA // 2)))
    B = max(2, min(conf.shifts_per_window // 2, NS // 2, max(2, n // 12)))
    WC = 6 * B + 4
    TMAX = max(1, (NS // 2 + B - 1) // B)
    P = max(3 * B + 4, WC + 2, WA) + 2 + WC
    # ... with padding grown so shards divide evenly and each shard is at
    # least one window wide (the panel blend needs C >= w)
    wmax = max(WA, WC)
    NP = n + 2 * P
    NP = ((NP + nd - 1) // nd) * nd
    while NP // nd < wmax:
        NP += nd
    P = (NP - n) // 2  # left pad (right pad NP - n - P >= P - 1)

    thresh = _resolve_threshold(H, conf, dtype)
    eyeW = jnp.eye(WA, dtype=dtype)
    eyeWC = jnp.eye(WC, dtype=dtype)

    Spad = jnp.zeros((NP, NP), dtype)
    Spad = lax.dynamic_update_slice(Spad, H, (P, P))
    Qpad = jnp.zeros((n, NP), dtype)
    Qpad = lax.dynamic_update_slice(Qpad, Q, (0, P))

    colsh = NamedSharding(mesh, PSpec(None, axname))
    Spad = jax.device_put(Spad, colsh)
    Qpad = jax.device_put(Qpad, colsh)

    ext = make_sharded_extent(axname, nd)
    body = functools.partial(
        _schur_iter, P=P, WA=WA, NS=NS, B=B, TMAX=TMAX,
        nibble=conf.aed_nibble, itmax=conf.iteration_limit, ext=ext, n=n)
    fused = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(PSpec(None, axname), PSpec(None, axname),
                  PSpec(), PSpec(), PSpec()),
        out_specs=(PSpec(None, axname), PSpec(None, axname), PSpec())),
        donate_argnums=(0, 1))

    Spad, Qpad, state = fused(Spad, Qpad, thresh, eyeW, eyeWC)
    st = np.asarray(state)
    # a loop exit on the global round cap with ihi > 0 is also a
    # non-converged (non-Schur) output, not just the fail flag
    info = Error.DID_NOT_CONVERGE if (int(st[3]) or int(st[0]) > 0) \
        else Error.SUCCESS

    @jax.jit
    def finish(Spad, Qpad):
        S = lax.dynamic_slice(Spad, (P, P), (n, n))
        Qf = lax.dynamic_slice(Qpad, (0, P), (n, n))
        return standardize_blocks(S, Qf)

    S, Qf = finish(Spad, Qpad)
    er, ei = extract_eigenvalues(S)
    return S, Qf, er, ei, info


def schur_dm_lowered(n: int, mesh: Mesh, dtype=jnp.float64):
    """Return the lowered (pre-compile) shard_map Schur program for an
    (n, n) problem — used by tests to assert collective structure and
    per-shard operand shapes without running the full solve."""
    from starneig_tpu.ops.schur import _schur_iter

    axname = mesh.axis_names[0]
    nd = int(np.prod(mesh.devices.shape))
    conf = SchurConf().resolve(n, workers=nd)
    WA = min(max(32, conf.aed_window_size + 2), n)
    NS = max(2, min(conf.aed_shift_count // 2 * 2, 2 * (WA // 2)))
    B = max(2, min(conf.shifts_per_window // 2, NS // 2, max(2, n // 12)))
    WC = 6 * B + 4
    TMAX = max(1, (NS // 2 + B - 1) // B)
    P = max(3 * B + 4, WC + 2, WA) + 2 + WC
    wmax = max(WA, WC)
    NP = ((n + 2 * P + nd - 1) // nd) * nd
    while NP // nd < wmax:
        NP += nd
    P = (NP - n) // 2

    ext = make_sharded_extent(axname, nd)
    body = functools.partial(
        _schur_iter, P=P, WA=WA, NS=NS, B=B, TMAX=TMAX,
        nibble=conf.aed_nibble, itmax=conf.iteration_limit, ext=ext, n=n)
    sm = jax.shard_map(
        body, mesh=mesh,
        in_specs=(PSpec(None, axname), PSpec(None, axname),
                  PSpec(), PSpec(), PSpec()),
        out_specs=(PSpec(None, axname), PSpec(None, axname), PSpec()))
    args = (jax.ShapeDtypeStruct((NP, NP), dtype),
            jax.ShapeDtypeStruct((n, NP), dtype),
            jax.ShapeDtypeStruct((), dtype),
            jax.ShapeDtypeStruct((WA, WA), dtype),
            jax.ShapeDtypeStruct((WC, WC), dtype))
    return jax.jit(sm).lower(*args), NP, nd
