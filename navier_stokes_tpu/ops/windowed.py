"""Windowed matrix-free operator application: the TPU-native SpMV.

THE hot kernel of the framework (GMRES tangent solves are ~200 operator
applications per Newton step, SURVEY §3.3).  Irregular gathers/scatters cost
~7 ns/element on TPU, so the flat ``x[cell_dofs]`` + ``segment_sum`` form is
two orders of magnitude off the HBM roofline.  This module replaces BOTH with
dense, tileable primitives:

  1. DoFs are renumbered to minimal bandwidth (fem/dofs.renumber_bandwidth,
     reverse Cuthill-McKee) so block b OWNS the contiguous scalar ranges
     [b*OW, (b+1)*OW) and every cell's dofs span O(sqrt(n)) positions.
  2. Block b's WINDOW is the (2h+1)-block neighborhood around its owned
     range (h = measured halo reach in blocks): window extraction from the
     global vector is (2h+1) aligned reshapes — no gather.
  3. Within a Pallas kernel, per-local-dof one-hot masks turn the remaining
     window-local gather/scatter into small MXU matmuls:
         gather:   x_loc = onehot_l @ x_window^T
         scatter:  y_window += y_l^T @ onehot_l
     Every (cell, row) contribution lands exactly once: a row's window
     position is inside the OWNED slice [h*OW, (h+1)*OW) iff this block owns
     it, and cells are listed in every block whose owned range they touch.

Cells shared by several blocks are duplicated (few %); padded slots carry the
sentinel position W so all their one-hot rows are empty.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["WindowedLayout", "build_windowed_layout", "windowed_matvec", "build_windows"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class WindowedLayout:
    cell_ids: jax.Array  # [nb, Bmax] int32 original cell index (pad: 0)
    # window-local positions [nb, k_pad, Bmax] (cells on lanes) split into
    # 128-row / in-row parts for two-level one-hot selection
    # (sentinel: hi = W//128, lo = 128)
    loc_v_hi: jax.Array
    loc_v_lo: jax.Array
    loc_p_hi: jax.Array
    loc_p_lo: jax.Array
    nb: int = field(metadata=dict(static=True))
    Bmax: int = field(metadata=dict(static=True))
    OWv: int = field(metadata=dict(static=True))
    OWp: int = field(metadata=dict(static=True))
    hv: int = field(metadata=dict(static=True))  # halo blocks each side (v)
    hp: int = field(metadata=dict(static=True))
    k_v: int = field(metadata=dict(static=True))  # true scalar dofs/cell (v)
    k_p: int = field(metadata=dict(static=True))
    dim: int = field(metadata=dict(static=True))
    n_vs: int = field(metadata=dict(static=True))
    n_ps: int = field(metadata=dict(static=True))
    dup_factor: float = field(metadata=dict(static=True))

    @property
    def n_u(self) -> int:
        return self.dim * self.n_vs


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_windowed_layout(
    cell_vdofs: np.ndarray,
    cell_pdofs: np.ndarray,
    n_vs: int,
    n_ps: int,
    dim: int,
    block_info: dict | None = None,
    target_ow: int = 1024,
) -> WindowedLayout:
    """Host-side layout construction.

    Requires blocked-renumbered dof maps (fem/dofs.renumber_blocked), whose
    ``block_info`` dict {"nb", "OWv", "OWp"} should be passed through; the
    legacy path derives nb from target_ow (works for any low-bandwidth
    numbering, with larger halos).
    """
    if block_info is not None:
        nb, OWv, OWp = block_info["nb"], block_info["OWv"], block_info["OWp"]
        assert nb * OWv == n_vs and nb * OWp == n_ps, "block_info mismatch"
    else:
        nb = max(1, int(round(n_vs / target_ow)))
        OWv = _round_up(-(-n_vs // nb), 128)
        OWp = _round_up(-(-n_ps // nb), 128)
    return _build(cell_vdofs, cell_pdofs, n_vs, n_ps, dim, nb, OWv, OWp)


def _build(cell_vdofs, cell_pdofs, n_vs, n_ps, dim, nb, OWv, OWp) -> WindowedLayout:
    nc, nb_v = cell_vdofs.shape
    nb_p = cell_pdofs.shape[1]

    # blocks touched by each cell (via owned v-dofs and p-dofs)
    bv = cell_vdofs.astype(np.int64) // OWv  # [nc, nb_v]
    bp = cell_pdofs.astype(np.int64) // OWp
    pairs = np.unique(
        np.concatenate(
            [
                np.stack([np.repeat(np.arange(nc), nb_v), bv.ravel()], axis=1),
                np.stack([np.repeat(np.arange(nc), nb_p), bp.ravel()], axis=1),
            ]
        ),
        axis=0,
    )  # [(cell, block)] sorted by cell; need grouped by block
    order = np.argsort(pairs[:, 1], kind="stable")
    cells_sorted = pairs[order, 0]
    blocks_sorted = pairs[order, 1]
    counts = np.bincount(blocks_sorted, minlength=nb)
    # 128-multiple so in-kernel cell-chunk slices sit on lane boundaries
    Bmax = _round_up(int(counts.max()), 128)

    cell_ids = np.zeros((nb, Bmax), dtype=np.int64)
    valid = np.zeros((nb, Bmax), dtype=bool)
    starts = np.concatenate([[0], np.cumsum(counts[:-1])])
    within = np.arange(len(cells_sorted)) - starts[blocks_sorted]
    cell_ids[blocks_sorted, within] = cells_sorted
    valid[blocks_sorted, within] = True

    # halo width (in whole blocks) needed per space, from the ACTUAL reach of
    # the listed cells beyond their block's owned range
    def halo_and_loc(cell_space_dofs, OW, max_halo=6):
        dofs_b = cell_space_dofs[cell_ids].astype(np.int64)  # [nb, Bmax, k]
        owned_lo = (np.arange(nb) * OW)[:, None, None]
        reach_lo = np.where(valid[:, :, None], owned_lo - dofs_b, 0).max()
        reach_hi = np.where(valid[:, :, None], dofs_b - (owned_lo + OW) + 1, 0).max()
        h = int(max(0, -(-max(reach_lo, reach_hi) // OW)))
        if h > max_halo:
            raise ValueError(
                f"halo {h} blocks exceeds limit (OW={OW}); ordering not local enough"
            )
        W = (2 * h + 1) * OW
        loc = dofs_b - (owned_lo - h * OW)
        loc[~valid] = W  # sentinel: matches no window position
        assert loc[valid].min() >= 0 and loc[valid].max() < W
        return h, loc

    hv, loc_v = halo_and_loc(cell_vdofs, OWv)
    hp, loc_p = halo_and_loc(cell_pdofs, OWp)

    def split_hilo(loc, W):
        # pad trailing dof axis to 8 lanes; sentinel rows match nothing
        k = loc.shape[2]
        kp = _round_up(k, 8)
        out = np.full((nb, Bmax, kp), W, dtype=np.int64)
        out[:, :, :k] = loc
        hi = np.where(out >= W, W // 128, out // 128)
        lo = np.where(out >= W, 128, out % 128)
        return hi.astype(np.int32), lo.astype(np.int32)

    lv_hi, lv_lo = split_hilo(loc_v, (2 * hv + 1) * OWv)
    lp_hi, lp_lo = split_hilo(loc_p, (2 * hp + 1) * OWp)

    return WindowedLayout(
        cell_ids=jnp.asarray(cell_ids, dtype=jnp.int32),
        loc_v_hi=jnp.asarray(lv_hi.transpose(0, 2, 1)),
        loc_v_lo=jnp.asarray(lv_lo.transpose(0, 2, 1)),
        loc_p_hi=jnp.asarray(lp_hi.transpose(0, 2, 1)),
        loc_p_lo=jnp.asarray(lp_lo.transpose(0, 2, 1)),
        nb=nb,
        Bmax=Bmax,
        OWv=OWv,
        OWp=OWp,
        hv=hv,
        hp=hp,
        k_v=nb_v,
        k_p=nb_p,
        dim=dim,
        n_vs=n_vs,
        n_ps=n_ps,
        dup_factor=float(len(cells_sorted)) / max(nc, 1),
    )


# ---------------------------------------------------------------------------
# device side
# ---------------------------------------------------------------------------


def build_windows(x_space: jax.Array, nb: int, OW: int, h: int = 1) -> jax.Array:
    """[nb, (2h+1)*OW/128, 128] sliding windows — aligned reshapes, no gather."""
    n_pad = nb * OW
    xp = jnp.zeros(n_pad, dtype=x_space.dtype).at[: x_space.shape[0]].set(x_space)
    r = xp.reshape(nb, OW)
    z = jnp.zeros((1, OW), dtype=x_space.dtype)
    shifts = []
    for s in range(-h, h + 1):
        if s < 0:
            shifted = jnp.concatenate([jnp.tile(z, (-s, 1)), r[:s]], axis=0)
        elif s > 0:
            shifted = jnp.concatenate([r[s:], jnp.tile(z, (s, 1))], axis=0)
        else:
            shifted = r
        shifts.append(shifted)
    W = (2 * h + 1) * OW
    return jnp.concatenate(shifts, axis=1).reshape(nb, W // 128, 128)


def _split_spaces(x: jax.Array, lay: WindowedLayout):
    comps = [x[c * lay.n_vs : (c + 1) * lay.n_vs] for c in range(lay.dim)]
    p = x[lay.n_u : lay.n_u + lay.n_ps]
    return comps, p


def windowed_matvec(
    lay: WindowedLayout, A_blk: jax.Array, x: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """y = A x via the windowed Pallas kernel (no Dirichlet handling here).

    A_blk: [nb, Bmax, nl, nl] cell matrices in block order (duplicated cells
    included — e.g. ``cell_mat[lay.cell_ids]``).
    """
    if jax.default_backend() == "cpu" and not interpret:
        # the Pallas TPU kernel has no CPU lowering; use the same-math
        # reference (tests compare kernel-vs-reference separately)
        return windowed_matvec_reference(lay, A_blk, x)
    comps, p = _split_spaces(x, lay)
    xw = [build_windows(c, lay.nb, lay.OWv, lay.hv) for c in comps] + [
        build_windows(p, lay.nb, lay.OWp, lay.hp)
    ]
    # cells-on-lanes: A_t[b, j, i, c] = A_blk[b, c, i, j], row dim padded to 8
    nb, Bmax, nl = A_blk.shape[0], A_blk.shape[1], A_blk.shape[2]
    nli = _round_up(nl, 8)
    A_t = jnp.zeros((nb, nl, nli, Bmax), dtype=A_blk.dtype)
    A_t = A_t.at[:, :, :nl, :].set(A_blk.transpose(0, 3, 2, 1))
    outs = _pallas_matvec(lay, A_t, xw, interpret)
    ys = [o.reshape(lay.nb * lay.OWv)[: lay.n_vs] for o in outs[: lay.dim]]
    yp = outs[-1].reshape(lay.nb * lay.OWp)[: lay.n_ps]
    return jnp.concatenate(ys + [yp])


def _loc_from_hilo(hi, lo, W, k):
    """Absolute window positions from (hi, lo); input [nb, kp, Bmax]."""
    loc = hi.astype(jnp.int64) * 128 + lo.astype(jnp.int64)
    return jnp.minimum(loc, W).transpose(0, 2, 1)[:, :, :k]


def windowed_matvec_reference(lay: WindowedLayout, A_blk: jax.Array, x: jax.Array) -> jax.Array:
    """Pure-jnp same-math reference (CPU tests; uses real gathers)."""
    comps, p = _split_spaces(x, lay)
    WV, WP = (2 * lay.hv + 1) * lay.OWv, (2 * lay.hp + 1) * lay.OWp
    xw_v = [
        build_windows(c, lay.nb, lay.OWv, lay.hv).reshape(lay.nb, WV) for c in comps
    ]
    xw_p = build_windows(p, lay.nb, lay.OWp, lay.hp).reshape(lay.nb, WP)
    xw_v = [jnp.concatenate([w, jnp.zeros((lay.nb, 1), w.dtype)], axis=1) for w in xw_v]
    xw_p = jnp.concatenate([xw_p, jnp.zeros((lay.nb, 1), xw_p.dtype)], axis=1)

    lv = _loc_from_hilo(lay.loc_v_hi, lay.loc_v_lo, WV, lay.k_v)
    lp = _loc_from_hilo(lay.loc_p_hi, lay.loc_p_lo, WP, lay.k_p)
    xloc = jnp.concatenate(
        [jnp.take_along_axis(w[:, None, :].repeat(lay.Bmax, 1), lv, axis=2) for w in xw_v]
        + [jnp.take_along_axis(xw_p[:, None, :].repeat(lay.Bmax, 1), lp, axis=2)],
        axis=2,
    )  # [nb, Bmax, nl]
    yl = jnp.einsum("nbij,nbj->nbi", A_blk, xloc)

    def scatter_space(loc, vals, OW, h, n):
        # vals [nb, Bmax, k]; keep owned rows only
        owned = (loc >= h * OW) & (loc < (h + 1) * OW)
        gidx = jnp.arange(lay.nb)[:, None, None] * OW + (loc - h * OW)
        gidx = jnp.where(owned, gidx, lay.nb * OW)
        out = jnp.zeros(lay.nb * OW + 1, dtype=vals.dtype)
        out = out.at[gidx.reshape(-1)].add(vals.reshape(-1))
        return out[: lay.nb * OW][:n]

    nb_v = lay.k_v
    ys = [
        scatter_space(lv, yl[:, :, c * nb_v : (c + 1) * nb_v], lay.OWv, lay.hv, lay.n_vs)
        for c in range(lay.dim)
    ]
    yp = scatter_space(lp, yl[:, :, lay.dim * nb_v :], lay.OWp, lay.hp, lay.n_ps)
    return jnp.concatenate(ys + [yp])


def _pallas_matvec(lay: WindowedLayout, A_t, xw, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dim, nb, Bmax = lay.dim, lay.nb, lay.Bmax
    nb_v, nb_p = lay.k_v, lay.k_p
    kvp = lay.loc_v_hi.shape[1]
    kpp = lay.loc_p_hi.shape[1]
    nl = dim * nb_v + nb_p
    nli = A_t.shape[2]
    WV, WP = (2 * lay.hv + 1) * lay.OWv, (2 * lay.hp + 1) * lay.OWp
    RV, RP = _round_up(WV // 128, 8), _round_up(WP // 128, 8)
    dtype = A_t.dtype

    # cells are processed in lane-chunks of Bc via a second grid dimension so
    # VMEM holds only [nl, nli, Bc] of A at a time (3D cells are 34x34);
    # per-block window accumulators live in scratch across the chunk steps
    # (the TPU grid is sequential, innermost dimension fastest).
    Bc = 256
    while Bmax % Bc:
        Bc //= 2
    nchunks = Bmax // Bc

    xw = [
        jnp.zeros((lay.nb, R_, 128), w.dtype).at[:, : w.shape[1], :].set(w)
        if w.shape[1] != R_
        else w
        for w, R_ in zip(xw, [RV] * dim + [RP])
    ]

    def sel_dot(a, b, dims, split_arg=0):
        """f32-faithful selection matmul in 3 bf16 passes (Mosaic has no
        HIGH precision): split the VALUE operand into bf16-exact terms; the
        one-hot operand is 0/1 and thus bf16-exact, so each DEFAULT-precision
        pass is lossless and the sum reconstructs the f32 product."""
        v = a if split_arg == 0 else b
        t1 = v.astype(jnp.bfloat16).astype(dtype)
        r = v - t1
        t2 = r.astype(jnp.bfloat16).astype(dtype)
        t3 = r - t2
        out = None
        for t in (t1, t2, t3):
            ops_ = (t, b) if split_arg == 0 else (a, t)
            d = jax.lax.dot_general(*ops_, dims, preferred_element_type=dtype)
            out = d if out is None else out + d
        return out

    def kernel(lvh_ref, lvl_ref, lph_ref, lpl_ref, A_ref, *rest):
        x_refs = rest[: dim + 1]
        y_refs = rest[dim + 1 : 2 * (dim + 1)]
        acc_refs = rest[2 * (dim + 1) :]
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _zero():
            for r in acc_refs:
                r[:] = jnp.zeros_like(r)

        def hilo(h_ref, l_ref, l, R):
            hi = h_ref[0, l : l + 1, :]  # [1, Bc]
            lo = l_ref[0, l : l + 1, :]
            ioh = jax.lax.broadcasted_iota(jnp.int32, (R, Bc), 0)
            iol = jax.lax.broadcasted_iota(jnp.int32, (128, Bc), 0)
            return (hi == ioh).astype(dtype), (lo == iol).astype(dtype)

        # gather + local row accumulation: yl[i, cell] = sum_j A[j,i,cell] x_j
        yl = jnp.zeros((nli, Bc), dtype=dtype)
        for l in range(nb_v):
            ohh, ohl = hilo(lvh_ref, lvl_ref, l, RV)
            for comp in range(dim):
                M = sel_dot(
                    x_refs[comp][0], ohh, (((0,), (0,)), ((), ()))
                )  # [128, Bc]
                xv = (M * ohl).sum(axis=0, keepdims=True)  # [1, Bc]
                yl = yl + A_ref[0, comp * nb_v + l] * xv
        for l in range(nb_p):
            ohh, ohl = hilo(lph_ref, lpl_ref, l, RP)
            M = sel_dot(x_refs[dim][0], ohh, (((0,), (0,)), ((), ())))
            xv = (M * ohl).sum(axis=0, keepdims=True)
            yl = yl + A_ref[0, dim * nb_v + l] * xv

        # scatter owned rows into the window accumulators
        for l in range(nb_v):
            ohh, ohl = hilo(lvh_ref, lvl_ref, l, RV)
            for comp in range(dim):
                yrow = yl[comp * nb_v + l : comp * nb_v + l + 1, :]  # [1, Bc]
                acc_refs[comp][:] += sel_dot(
                    ohh, ohl * yrow, (((1,), (1,)), ((), ())), split_arg=1
                )
        for l in range(nb_p):
            ohh, ohl = hilo(lph_ref, lpl_ref, l, RP)
            yrow = yl[dim * nb_v + l : dim * nb_v + l + 1, :]
            acc_refs[dim][:] += sel_dot(
                ohh, ohl * yrow, (((1,), (1,)), ((), ())), split_arg=1
            )

        @pl.when(c == nchunks - 1)
        def _emit():
            ov, op_ = lay.OWv // 128, lay.OWp // 128
            for comp in range(dim):
                y_refs[comp][0] = acc_refs[comp][lay.hv * ov : (lay.hv + 1) * ov, :]
            y_refs[dim][0] = acc_refs[dim][lay.hp * op_ : (lay.hp + 1) * op_, :]

    in_specs = [
        pl.BlockSpec((1, kvp, Bc), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kvp, Bc), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kpp, Bc), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kpp, Bc), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nl, nli, Bc), lambda b, c: (b, 0, 0, c), memory_space=pltpu.VMEM),
    ]
    for _ in range(dim):
        in_specs.append(
            pl.BlockSpec((1, RV, 128), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM)
        )
    in_specs.append(
        pl.BlockSpec((1, RP, 128), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM)
    )

    ov, op_ = lay.OWv // 128, lay.OWp // 128
    out_specs = [
        pl.BlockSpec((1, ov, 128), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(dim)
    ] + [pl.BlockSpec((1, op_, 128), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((nb, ov, 128), dtype) for _ in range(dim)] + [
        jax.ShapeDtypeStruct((nb, op_, 128), dtype)
    ]
    scratch_shapes = [pltpu.VMEM((RV, 128), dtype) for _ in range(dim)] + [
        pltpu.VMEM((RP, 128), dtype)
    ]

    return pl.pallas_call(
        kernel,
        grid=(nb, nchunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(lay.loc_v_hi, lay.loc_v_lo, lay.loc_p_hi, lay.loc_p_lo, A_t, *xw)
