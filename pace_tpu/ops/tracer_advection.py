"""Sub-cycled multi-tracer 2-D transport (flux-form, mass-consistent).

TPU-native analog of ``pyFV3.stencils.tracer_2d_1l.TracerAdvection``
(reference role per SURVEY.md §2.3: multi-tracer sub-cycled 2D transport with
flux/courant halo updates; savepoint stage name ``Tracer2D1L``; on-disk usage
reference driver/examples/notebooks/functions.py:33).

All tracers are carried in ONE stacked array ``(S, nq, K, Y, X)`` so the PPM
operators and halo gathers run once over the whole tracer block — on TPU this
keeps tensors large and avoids per-tracer dispatch (the reference loops
fvtp2d over tracers one at a time).

The sub-cycle count is either static (config ``n_split_tracer``) or derived
from the GLOBAL max courant number each step (``dynamic=True`` — the
reference tracer_2d_1l behavior, the DEFAULT since round 4): n =
floor(max|c|) + 1, evaluated as a traced scalar inside one compiled program
(a bounded ``lax.switch`` over static-length scans — no recompile; under a
sharded mesh the max is a global all-reduce so every device runs the same
count). The dynamic path guarantees CFL-safe tracer transport when a storm
pushes the winds past the static assumption.
"""

from __future__ import annotations

import jax.numpy as jnp

from .fvtp2d import fvtp2d_best as fvtp2d
from .stencil_utils import bcast_k, x_iface_diff, y_iface_diff

#: static bound on the runtime-derived sub-cycle count (dynamic=True):
#: the count selects a ``lax.switch`` branch, so it can vary at runtime
#: without a while-loop (see the workaround note in advect_tracers) and
#: without recompiles; the compile cost is one subcycle-body instance per
#: branch. floor(max courant)+1 > 4 would mean a per-substep courant > 3
#: — far beyond the transport scheme's stability envelope.
MAX_DYNAMIC_SUBCYCLES = 4


def advect_tracers(
    q,
    dp1,
    crx,
    cry,
    xfx,
    yfx,
    mfx,
    mfy,
    halo,
    grid,
    hord: int = 8,
    n_split: int = 1,
    dynamic: bool = False,
):
    """Advance tracers through the accumulated dynamics mass fluxes.

    Parameters
    ----------
    q:
        tracers ``(S, nq, K, Y, X)`` (mixing ratios w.r.t. dry air mass dp1).
    dp1:
        pressure thickness ``(S, K, Y, X)`` BEFORE the mass-flux update.
    crx, cry:
        time-integrated courant numbers at x/y interfaces.
    xfx, yfx:
        time-integrated area fluxes [m^2].
    mfx, mfy:
        time-integrated mass fluxes [Pa m^2] through the faces.
    halo:
        HaloExchanger (for the per-subcycle tracer ghost refills).
    grid:
        GridData.
    hord:
        PPM variant for tracers (reference namelist hord_tr; monotone 8 default).
    n_split:
        static sub-cycle count (``dynamic=False``), or the MINIMUM count
        when ``dynamic=True``.
    dynamic:
        derive the sub-cycle count from the global max courant number
        (reference tracer_2d_1l: n = floor(max|c|) + 1), bounded by
        MAX_DYNAMIC_SUBCYCLES (static switch dispatch — see below).

    Returns
    -------
    (q_new, dp2): updated tracers and the final pressure thickness.
    """
    import jax

    from ._dispatch import use_pallas

    if dynamic:
        # global CFL: max |courant| over every interior face of the whole
        # cube (an all-reduce when S is sharded; every device gets the same
        # n). The max is taken over the COMPUTE domain only — crx/cry are
        # halo-padded, and the corner ghost zones (which no stencil ever
        # reads; cube corners are handled specially) hold unassembled junk
        # that would otherwise inflate the count to its bound every step
        # (measured: interior max|c| 0.067 vs corner-zone junk 282 on the
        # C48 baroclinic init). The reference likewise maxes over the local
        # compute domain + an MPI allreduce (tracer_2d_1l).
        # The count is bounded by MAX_DYNAMIC_SUBCYCLES so the loop can be
        # a STATIC scan (see below); a per-substep courant beyond that
        # bound is far outside the scheme's stability envelope anyway.
        h = grid.n_halo
        # the interior slice assumes halo-padded operands; h == 0 would make
        # [h:-h] an empty slice and jnp.max raise on a zero-size array
        sl = slice(h, -h) if h else slice(None)
        c_max = jnp.maximum(
            jnp.max(jnp.abs(crx[..., sl, sl])),
            jnp.max(jnp.abs(cry[..., sl, sl])),
        )
        n_dyn = jnp.clip(
            jnp.maximum(jnp.floor(c_max).astype(jnp.int32) + 1, n_split),
            1,
            MAX_DYNAMIC_SUBCYCLES,
        )
        frac = 1.0 / n_dyn.astype(crx.dtype)
    else:
        n_dyn = None
        frac = 1.0 / float(n_split)
    crx = crx * frac
    cry = cry * frac
    xfx = xfx * frac
    yfx = yfx * frac
    mfx = mfx * frac
    mfy = mfy * frac
    rarea = grid.rarea

    # the batched branch is exercised on CPU too (interpret-mode kernel) by
    # monkeypatching _dispatch.use_pallas in tests — the callers' wiring
    # (5-D halo update, dp broadcasts, 5-D interface sync) is then covered
    # without TPU hardware
    use_batched = use_pallas("fvtp2d") and q.ndim == 5
    interpret = jax.default_backend() != "tpu"

    def one_subcycle(q, dp1):
        dp2 = dp1 + (x_iface_diff(mfx) + y_iface_diff(mfy)) * bcast_k(rarea, dp1)

        if use_batched:
            # Whole tracer block through ONE kernel: the grid iterates the
            # tracer axis innermost, so the shared wind/mass-flux blocks'
            # DMAs are elided between tracers — the winds are read from HBM
            # once per k-block instead of once per tracer. Only qx/qy/fx/fy
            # materialize in HBM (the PPM intermediates stay in VMEM); the
            # XLA-batched variant materialized ~6 block-sized temporaries
            # and overflowed HBM at C192 npz=79. Peak-HBM note: vs the
            # lax.map path this holds ~4 extra tracer-block-sized arrays
            # (qx_all/qy_all/fx/fy) — at C192 npz=79 nq=9 f32 that is
            # ~2.6 GB extra, fine on a 16 GB chip; for much larger nq use
            # PACE_TPU_DISABLE_PALLAS=fvtp2d to fall back to per-tracer.
            from .folds import CornerPatch
            from .fvtp2d_pallas import fvtp2d_tracer_pallas

            # one fold + corner pack: the y-fold tracer block (0.67 GB at
            # C192 nq=9) is reconstructed inside the kernel's VMEM instead
            # of being written to and re-read from HBM
            qx_all, qp = halo.update_scalar_fold_patch(q, stagger="center")
            fx, fy = fvtp2d_tracer_pallas(
                qx_all, CornerPatch(qp), crx, cry, xfx, yfx, grid.area,
                mfx, mfy, hord, interpret=interpret,
            )
            # make cross-tile-edge fluxes single-valued (exact conservation)
            fx, fy = halo.sync_vector_interfaces(fx, fy, kind="cgrid")
            q = (
                q * dp1[:, None]
                + (x_iface_diff(fx) + y_iface_diff(fy))
                * bcast_k(rarea, q)
            ) / dp2[:, None]
        else:

            def one_tracer(q1):
                # per-tracer transport: the PPM operator's ~6 field-sized
                # intermediates exist for ONE tracer at a time (see the
                # batched-path comment above for why not to stack under XLA)
                qx1 = halo.update_scalar(q1, stagger="center", fold="x")
                qy1 = halo.update_scalar(q1, stagger="center", fold="y")
                fl = fvtp2d(
                    qx1, qy1, crx, cry, xfx, yfx, grid.area, hord,
                    mfx=mfx, mfy=mfy,
                )
                # single-valued cross-tile-edge fluxes (exact conservation)
                fx, fy = halo.sync_vector_interfaces(fl.fx, fl.fy, kind="cgrid")
                return (
                    q1 * dp1
                    + (x_iface_diff(fx) + y_iface_diff(fy)) * bcast_k(rarea, q1)
                ) / dp2

            q_m = jnp.moveaxis(q, 1, 0)  # (nq, S, K, Y, X) for lax.map
            q = jnp.moveaxis(jax.lax.map(one_tracer, q_m), 0, 1)
        return q, dp2

    if n_dyn is None:
        for _ in range(n_split):
            q, dp1 = one_subcycle(q, dp1)
    else:
        # CFL-adaptive iterations with STATIC loop structure (reference
        # tracer_2d_1l's runtime n_split): a lax.switch over per-count
        # branches, each a static-length scan of the shared body — runtime
        # cost is EXACTLY n_dyn sub-cycles, compile cost is
        # MAX_DYNAMIC_SUBCYCLES instances of the one body, no recompiles.
        # Two alternatives were measured and rejected: (1) the traced-
        # trip-count fori_loop (lowered to a while-loop) combined with the
        # Pallas kernel bodies faults the TPU runtime inside the full
        # dycore program at C128+ ("TPU device error"; minimized repros of
        # the while+kernel nesting alone pass at C192 npz=79, so the
        # trigger needs the full program — pinned as a runtime bug, see
        # docs/dycore.md); (2) a scan-of-cond over the bounded range
        # measured +0.44 s/step at C192 from the pass-through iterations'
        # carry copies.
        def run_k(k):
            def f(c):
                (qq, dd), _ = jax.lax.scan(
                    lambda cc, _x: (one_subcycle(*cc), None),
                    c, None, length=k,
                )
                return (qq, dd)

            return f

        q, dp1 = jax.lax.switch(
            n_dyn - 1,
            [run_k(k) for k in range(1, MAX_DYNAMIC_SUBCYCLES + 1)],
            (q, dp1),
        )
    return q, dp1
