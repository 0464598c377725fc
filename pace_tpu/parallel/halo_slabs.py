"""TPU-fast halo exchange: ghost regions as batched rotated-slab copies.

The gather-table formulation in :mod:`pace_tpu.parallel.halo` is fully general
but lowers to arbitrary-index scatters, which TPUs execute near-serially
(~200x slower than the surrounding compute). This module compiles the SAME
exchange into dense ops: every ghost region of every shard is a rigidly
rotated rectangle of exactly one source shard, so an update becomes, per
region:

    src   = q[perm]                      # leading-axis permutation (cheap)
    slab  = select_by_class( rot90(src[.., src_rect], k) , ... )
    q     = q.at[.., dst_rect].set(slab) # static-slice dynamic-update-slice

All slab geometry (permutation, rotation, source rectangle, vector component
mapping and signs) is DERIVED at build time from the pointwise resolution and
asserted to reproduce it exactly — the tables remain the correctness oracle.

Under jit this is a handful of fused dense ops per region. Under a sharded S
axis GSPMD lowers the leading-axis permutation to strip ALL-GATHERS (measured:
90 per scalar exchange at 8 devices) whose bytes scale with the device count —
so when a multi-device mesh is active (parallel.mesh.set_shard_mesh) every
public method dispatches to the shard_map + ppermute executor
(halo_shardmap.py), which moves only neighbor slabs over ICI as
collective-permutes. The region ops here remain the single source of the
exchange geometry for both paths.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .halo import _STAGGER_OFFSETS, _VECTOR_KINDS, HaloExchanger


def _halo_scope(fn):
    """Tag every exchange's ops with the "HaloExchange" named scope so
    driver/stage_profile.py can attribute their device time (the analog of
    the reference's collect_communication halo timing, driver.py:413-417)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.named_scope("HaloExchange"):
            return fn(*args, **kwargs)

    return wrapper

#: ghost-strip application strategy: "pallas" runs the single-pass Pallas
#: kernel (halo_pallas.py; TPU backend only — elsewhere it falls back to
#: concat); "concat" rebuilds the array as one concatenation tree; "dus"
#: applies eight in-place strip updates. All are table-oracle-exact; pallas
#: is ~2x faster on TPU with ~6x less HBM traffic (override with
#: PACE_TPU_HALO_ASSEMBLY).
ASSEMBLY = __import__("os").environ.get("PACE_TPU_HALO_ASSEMBLY", "pallas")

_CORNER_NAMES = ("SW", "SE", "NW", "NE")

_TOKEN_COUNTER = __import__("itertools").count()


@dataclasses.dataclass(frozen=True)
class _Class:
    rot_k: int  # jnp.rot90 count applied to the source rect
    src_rect: Tuple[int, int, int, int]  # (r0, r1, c0, c1) in source array
    src_comp: str  # "u"/"v" for vectors, "q" for scalars
    sign: float


class _SplitNeeded(Exception):
    """A ghost region is not one rigid single-source copy for every shard
    (it straddles an internal sub-shard boundary on the source side, or its
    rotation varies) — the builder splits it and retries."""


@dataclasses.dataclass(frozen=True)
class _RegionOp:
    dst_rect: Tuple[int, int, int, int]
    perm: np.ndarray  # (S,) source shard per destination shard
    klass_of_shard: np.ndarray  # (S,) index into classes
    classes: Tuple[_Class, ...]
    name: str = ""  # ghost-region name (W/E/S/N/SW/SE/NW/NE)


def _fit_transform(jj, ii, sj, si):
    """Fit src = R @ dst + b over a rectangle of destination indices; returns
    (rot_k, src_rect) such that rot90(src[src_rect], rot_k) aligns with the
    destination rectangle, verified exactly."""
    r0, r1 = int(sj.min()), int(sj.max()) + 1
    c0, c1 = int(si.min()), int(si.max()) + 1
    dst_shape = jj.shape
    for k in range(4):
        # index grid of the source rect, rotated like the data would be
        grid_j, grid_i = np.meshgrid(
            np.arange(r0, r1), np.arange(c0, c1), indexing="ij"
        )
        gj = np.rot90(grid_j, k)
        gi = np.rot90(grid_i, k)
        if gj.shape != dst_shape:
            continue
        if np.array_equal(gj, sj) and np.array_equal(gi, si):
            return k, (r0, r1, c0, c1)
    raise AssertionError("ghost region is not a rigid rotated rectangle")


class SlabHalo:
    """Slab-compiled halo exchange bound to one HaloExchanger decomposition."""

    def __init__(self, halo: HaloExchanger):
        self.halo = halo
        self._scalar_ops: Dict = {}
        self._vector_ops: Dict = {}
        self._sync_ops: Dict = {}
        self._shardmap_cache: Dict = {}

    def _shardmap(self):
        """The shard_map/ppermute executor when a multi-device mesh is
        active (parallel.mesh.set_shard_mesh) and the shard count divides
        over it; None otherwise (single-device dense path)."""
        from .mesh import SHARD_AXIS, get_shard_mesh

        mesh = get_shard_mesh()
        if mesh is None:
            return None
        n_dev = int(mesh.shape.get(SHARD_AXIS, 1))
        if n_dev <= 1 or self.halo.n_shards % n_dev:
            return None
        key = id(mesh)
        sm = self._shardmap_cache.get(key)
        if sm is None:
            from .halo_shardmap import ShardMapHalo

            sm = ShardMapHalo(self, mesh)
            self._shardmap_cache[key] = sm
        return sm

    # ------------------------------------------------------------------
    # geometry
    # ------------------------------------------------------------------
    def _ghost_regions(self, stagger: str):
        from .halo import interface_extents

        h = self.halo.n_halo
        ey, ex = interface_extents(stagger)
        ny = self.halo.nsy + ey
        nx = self.halo.nsx + ex
        yt = ny + 2 * h
        xt = nx + 2 * h
        return {
            "W": ((h, h + ny), (0, h)),
            "E": ((h, h + ny), (h + nx, xt)),
            "S": ((0, h), (h, h + nx)),
            "N": ((h + ny, yt), (h, h + nx)),
            "SW": ((0, h), (0, h)),
            "SE": ((0, h), (h + nx, xt)),
            "NW": ((h + ny, yt), (0, h)),
            "NE": ((h + ny, yt), (h + nx, xt)),
        }

    def _resolve_region(self, stagger: str, fold: str, rect, s: int):
        """Pointwise resolution of one region of one shard (oracle data)."""
        halo = self.halo
        h = halo.n_halo
        oy, ox = _STAGGER_OFFSETS[stagger]
        (r0, r1), (c0, c1) = rect
        jj, ii = np.meshgrid(np.arange(r0, r1), np.arange(c0, c1), indexing="ij")
        t, py, px = halo._shard_info(s)
        gy = py * halo.nsy + (jj - h) + oy
        gx = px * halo.nsx + (ii - h) + ox
        t2, gy2, gx2, A, valid = halo.topology.resolve_points(
            np.full(jj.shape, t), gy, gx, halo.n_tile, corner_fold=fold
        )
        assert valid.all()
        s2, sj, si, fy, fx = halo._locate_source(t2, gy2, gx2)
        if not (s2 == s2.flat[0]).all():
            # Mixed source shards. For interface staggers whose points lie
            # exactly ON an internal sub-shard boundary, the copies are shared
            # (sync/exchange invariant) and the region can be re-homed into
            # the majority shard. Otherwise the region genuinely straddles
            # source shards and must be SPLIT into smaller rigid copies.
            if stagger == "center" or not (t2 == t2.flat[0]).all():
                raise _SplitNeeded(rect)
            vals, counts = np.unique(s2, return_counts=True)
            s_major = int(vals[np.argmax(counts)])
            _t, py, px = halo._shard_info(s_major)
            jl = np.floor(gy2).astype(np.int64) - py * halo.nsy
            il = np.floor(gx2).astype(np.int64) - px * halo.nsx
            sj = jl + halo.n_halo
            si = il + halo.n_halo
            ny, nx = (
                halo.nsy + 2 * halo.n_halo + 1,
                halo.nsx + 2 * halo.n_halo + 1,
            )
            ok = (
                (sj >= 0).all() and (sj < ny).all()
                and (si >= 0).all() and (si < nx).all()
                and (jl >= 0).all() and (jl <= halo.nsy).all()
                and (il >= 0).all() and (il <= halo.nsx).all()
            )
            if not ok:
                raise _SplitNeeded(rect)
            s2 = np.full_like(s2, s_major)
        return jj, ii, int(s2.flat[0]), sj, si, A

    # ------------------------------------------------------------------
    # op construction
    # ------------------------------------------------------------------
    def _region_ops_split(self, name, rect, build_one) -> List[_RegionOp]:
        """Build the op for ``rect``; on _SplitNeeded bisect (rows first,
        then columns) and recurse — straddling regions become a few smaller
        rigid copies (they are at most halo-width sized, so this stays tiny)."""
        try:
            return [build_one(name, rect)]
        except (_SplitNeeded, AssertionError):
            (r0, r1), (c0, c1) = rect
            if r1 - r0 > 1:
                mid = (r0 + r1) // 2
                halves = [((r0, mid), (c0, c1)), ((mid, r1), (c0, c1))]
            elif c1 - c0 > 1:
                mid = (c0 + c1) // 2
                halves = [((r0, r1), (c0, mid)), ((r0, r1), (mid, c1))]
            else:
                raise
            out = []
            for h in halves:
                out.extend(self._region_ops_split(name, h, build_one))
            return out

    def _build_scalar_ops(self, stagger: str, fold: str) -> List[_RegionOp]:
        halo = self.halo

        def build_one(name, rect):
            perm = np.zeros(halo.n_shards, dtype=np.int32)
            klass = np.zeros(halo.n_shards, dtype=np.int32)
            classes: List[_Class] = []
            for s in range(halo.n_shards):
                jj, ii, s2, sj, si, _A = self._resolve_region(
                    stagger, fold, rect, s
                )
                rot_k, src_rect = _fit_transform(jj, ii, sj, si)
                c = _Class(rot_k, src_rect, "q", 1.0)
                if c not in classes:
                    classes.append(c)
                perm[s] = s2
                klass[s] = classes.index(c)
            (r0, r1), (c0, c1) = rect
            return _RegionOp((r0, r1, c0, c1), perm, klass, tuple(classes), name)

        ops = []
        for name, rect in self._ghost_regions(stagger).items():
            ops.extend(self._region_ops_split(name, rect, build_one))
        return ops

    def _build_vector_ops(self, kind: str, fold: str):
        """Ops for (u, v): per destination component a list of region ops whose
        classes carry the source component and sign."""
        halo = self.halo
        loc_u, dir_u, loc_v, dir_v = _VECTOR_KINDS[kind]
        out = {}
        for comp, (loc, direction) in (("u", (loc_u, dir_u)), ("v", (loc_v, dir_v))):
            d = np.asarray(direction)

            def build_one(name, rect):
                perm = np.zeros(halo.n_shards, dtype=np.int32)
                klass = np.zeros(halo.n_shards, dtype=np.int32)
                classes: List[_Class] = []
                for s in range(halo.n_shards):
                    jj, ii, s2, sj, si, A = self._resolve_region(loc, fold, rect, s)
                    a0 = A.reshape(-1, 2, 2)[0]
                    if not np.allclose(A, a0):
                        raise _SplitNeeded(rect)  # rotation varies in region
                    img = a0 @ d
                    if abs(img[1]) > 0.5:
                        src_comp, sign = "u", float(np.sign(img[1]))
                    else:
                        src_comp, sign = "v", float(np.sign(img[0]))
                    rot_k, src_rect = _fit_transform(jj, ii, sj, si)
                    c = _Class(rot_k, src_rect, src_comp, sign)
                    if c not in classes:
                        classes.append(c)
                    perm[s] = s2
                    klass[s] = classes.index(c)
                (r0, r1), (c0, c1) = rect
                return _RegionOp((r0, r1, c0, c1), perm, klass, tuple(classes), name)

            ops = []
            for name, rect in self._ghost_regions(loc).items():
                ops.extend(self._region_ops_split(name, rect, build_one))
            out[comp] = ops
        return out

    # ------------------------------------------------------------------
    # application
    # ------------------------------------------------------------------
    @staticmethod
    def _compute_slab(op: _RegionOp, srcs: Dict[str, jnp.ndarray]):
        slab = None
        for cid, c in enumerate(op.classes):
            src_all = srcs[c.src_comp]
            sr0, sr1, sc0, sc1 = c.src_rect
            # slice first, then permute the leading shard axis: the gather
            # then reads only the slab, not a permuted copy of the full field
            cand = src_all[..., sr0:sr1, sc0:sc1][op.perm]
            if c.rot_k:
                cand = jnp.rot90(cand, k=c.rot_k, axes=(-2, -1))
            if c.sign != 1.0:
                cand = cand * c.sign
            if slab is None:
                slab = cand
            else:
                mask = (op.klass_of_shard == cid).reshape(
                    (-1,) + (1,) * (cand.ndim - 1)
                )
                slab = jnp.where(mask, cand, slab)
        return slab

    @classmethod
    def _apply_op(cls, q, op: _RegionOp, srcs: Dict[str, jnp.ndarray]):
        r0, r1, c0, c1 = op.dst_rect
        return q.at[..., r0:r1, c0:c1].set(cls._compute_slab(op, srcs))

    @classmethod
    def _assemble_dus(cls, q, ops: List[_RegionOp], srcs: Dict[str, jnp.ndarray]):
        """Apply region ops as in-place strip updates (dynamic-update-slices
        with static indices). XLA updates the buffer in place when the input
        is dead afterwards; unlike the concat tree this keeps the interior
        bytes untouched and never shifts the array's lane alignment."""
        out = q
        for op in ops:
            out = cls._apply_op(out, op, srcs)
        return out

    @classmethod
    def _assemble(cls, q, ops: List[_RegionOp], srcs: Dict[str, jnp.ndarray]):
        # the concat tree needs exactly the 8 whole regions; split regions
        # (sub-shard straddles) use the strip-update path
        if ASSEMBLY == "dus" or len(ops) != 8:
            return cls._assemble_dus(q, ops, srcs)
        return cls._assemble_concat(q, ops, srcs)

    @classmethod
    def _assemble_concat(cls, q, ops: List[_RegionOp], srcs: Dict[str, jnp.ndarray]):
        """Build the updated array in ONE concatenation tree instead of eight
        sequential dynamic-update-slices (each of which costs a full-array
        copy pass on TPU): rows = [SW S SE; W interior E; NW N NE]."""
        by_name = {op.name: cls._compute_slab(op, srcs) for op in ops}
        # interior rect from the W/E op rows and S/N op cols
        w = next(op for op in ops if op.name == "W")
        s_ = next(op for op in ops if op.name == "S")
        r0, r1 = w.dst_rect[0], w.dst_rect[1]
        c0, c1 = s_.dst_rect[2], s_.dst_rect[3]
        mid = jnp.concatenate(
            [by_name["W"], q[..., r0:r1, c0:c1], by_name["E"]], axis=-1
        )
        top = jnp.concatenate(
            [by_name["SW"], by_name["S"], by_name["SE"]], axis=-1
        )
        bot = jnp.concatenate(
            [by_name["NW"], by_name["N"], by_name["NE"]], axis=-1
        )
        return jnp.concatenate([top, mid, bot], axis=-2)

    @property
    def _token(self) -> str:
        t = getattr(self, "_token_", None)
        if t is None:
            t = f"slabhalo{next(_TOKEN_COUNTER)}"
            object.__setattr__(self, "_token_", t)
        return t

    @staticmethod
    def _use_pallas() -> bool:
        import jax

        return ASSEMBLY == "pallas" and jax.default_backend() == "tpu"

    @staticmethod
    def _rekey_ops(ops, old: str, new: str):
        """Region ops with source-component references renamed old -> new
        (for running several same-shaped fields as separate kernel inputs)."""
        out = []
        for op in ops:
            classes = tuple(
                dataclasses.replace(c, src_comp=new)
                if c.src_comp == old
                else c
                for c in op.classes
            )
            out.append(dataclasses.replace(op, classes=classes))
        return out

    @_halo_scope
    def update_scalar(self, q, stagger: str = "center", fold: str = "x"):
        sm = self._shardmap()
        if sm is not None:
            return sm.update_scalar(q, stagger=stagger, fold=fold)
        ops = self._scalar_ops_for(stagger, fold)
        if self._use_pallas():
            from .halo_pallas import exchange_pallas

            return exchange_pallas(
                {"q": q},
                [("q", op) for op in ops],
                (self._token, "scalar", stagger, fold, q.ndim),
            )["q"]
        return self._assemble(q, ops, {"q": q})

    @_halo_scope
    def update_scalars(self, qs, stagger: str = "center", fold: str = "x"):
        """Update several same-shaped scalar fields in ONE exchange pass.

        Pallas path: each field is its own kernel input/output (no stacking
        copies). XLA path: the fields are stacked on a new axis so the
        per-region gather/rot/select/update-slice chain runs once."""
        qs = list(qs)
        if len(qs) == 1:
            return [self.update_scalar(qs[0], stagger=stagger, fold=fold)]
        sm = self._shardmap()
        if sm is not None:
            return sm.update_scalars(qs, stagger=stagger, fold=fold)
        if self._use_pallas():
            # one kernel call PER FIELD: measured at C192 (npz=79 f32), the
            # many-field single call runs ~1.6x slower per field-pass than
            # per-field calls — big multi-array blocks force block_k=1-2 and
            # multiply the per-grid-step fixed cost of the strip copies
            return [
                self.update_scalar(q, stagger=stagger, fold=fold) for q in qs
            ]
        stacked = jnp.stack(qs, axis=1)  # (S, nf, ...)
        out = self.update_scalar(stacked, stagger=stagger, fold=fold)
        return [out[:, i] for i in range(len(qs))]

    @_halo_scope
    def update_vector(self, u, v, kind: str = "dgrid", fold: str = "x"):
        sm = self._shardmap()
        if sm is not None:
            return sm.update_vector(u, v, kind=kind, fold=fold)
        key = (kind, fold)
        if key not in self._vector_ops:
            self._vector_ops[key] = self._build_vector_ops(kind, fold)
        ops = self._vector_ops[key]
        if self._use_pallas():
            from .halo_pallas import exchange_pallas

            out = exchange_pallas(
                {"u": u, "v": v},
                [("u", op) for op in ops["u"]] + [("v", op) for op in ops["v"]],
                (self._token, "vector", kind, fold, u.ndim),
            )
            return out["u"], out["v"]
        srcs = {"u": u, "v": v}
        u_new = self._assemble(u, ops["u"], srcs)
        v_new = self._assemble(v, ops["v"], srcs)
        return u_new, v_new

    # ------------------------------------------------------------------
    # both-folds updates: x and y folds differ ONLY in the four corner
    # ghost regions, so the y-fold result is the x-fold result with four
    # tiny (h x h) corner patches re-applied — almost free compared to a
    # second full assembly.
    # ------------------------------------------------------------------
    def _patch_corners(self, base, ops: List[_RegionOp], srcs):
        out = base
        for op in ops:
            if op.name in _CORNER_NAMES:
                out = self._apply_op(out, op, srcs)
        return out

    def _scalar_ops_for(self, stagger: str, fold: str):
        key = (stagger, fold)
        if key not in self._scalar_ops:
            self._scalar_ops[key] = self._build_scalar_ops(stagger, fold)
        return self._scalar_ops[key]

    @_halo_scope
    def update_scalar_folds(self, q, stagger: str = "center"):
        sm = self._shardmap()
        if sm is not None:
            return sm.update_scalar_folds(q, stagger=stagger)
        """(q_xfold, q_yfold). Pallas path: ONE kernel pass reads q once and
        writes both fold results (they differ only in the corner ghost
        regions). XLA path: two independent assemblies — measured on TPU,
        deriving the y fold from the x fold by corner patches costs MORE than
        a second assembly (the patches force a full copy of the still-live x
        result)."""
        if self._use_pallas():
            from .halo_pallas import exchange_pallas_multi

            ops_x = self._scalar_ops_for(stagger, "x")
            ops_y = self._scalar_ops_for(stagger, "y")
            out = exchange_pallas_multi(
                {"q": q},
                [("qx", "q"), ("qy", "q")],
                [("qx", op) for op in ops_x] + [("qy", op) for op in ops_y],
                (self._token, "scalar_folds", stagger, q.ndim),
            )
            return out["qx"], out["qy"]
        qx = self.update_scalar(q, stagger=stagger, fold="x")
        qy = self.update_scalar(q, stagger=stagger, fold="y")
        return qx, qy

    @_halo_scope
    def update_scalars_folds(self, qs, stagger: str = "center"):
        sm = self._shardmap()
        if sm is not None:
            return sm.update_scalars_folds(qs, stagger=stagger)
        """[(qi_xfold, qi_yfold)] for several same-shaped fields, batched."""
        qs = list(qs)
        if len(qs) == 1:
            return [self.update_scalar_folds(qs[0], stagger=stagger)]
        if self._use_pallas():
            # per-field kernel calls (see update_scalars: measured ~1.6x
            # faster per field-pass than one many-field call)
            return [self.update_scalar_folds(q, stagger=stagger) for q in qs]
        stacked = jnp.stack(qs, axis=1)
        ox, oy = self.update_scalar_folds(stacked, stagger=stagger)
        return [(ox[:, i], oy[:, i]) for i in range(len(qs))]

    def start_update_scalars_folds(self, qs, stagger: str = "center"):
        """Async both-folds exchange (reference
        ``start_halo_update(...).wait()``, docs/util/communication.rst):
        on a device mesh the collectives are issued HERE and only the local
        slab assembly runs at ``.wait()`` — interior compute placed between
        the two is dataflow-independent of the ppermutes and overlaps with
        them on ICI. Single-device: nothing is in flight (the exchange is
        on-chip data movement); the handle simply defers the exchange."""
        sm = self._shardmap()
        if sm is not None:
            return sm.start_update_scalars_folds(qs, stagger=stagger)
        from .halo_shardmap import AsyncHaloUpdate

        return AsyncHaloUpdate(
            lambda: self.update_scalars_folds(qs, stagger=stagger)
        )

    @_halo_scope
    def update_vector_folds(self, u, v, kind: str = "dgrid"):
        sm = self._shardmap()
        if sm is not None:
            return sm.update_vector_folds(u, v, kind=kind)
        """((u_x, v_x), (u_y, v_y)); Pallas path reads (u, v) once and writes
        all four fold results in one kernel pass."""
        for fold in ("x", "y"):
            key = (kind, fold)
            if key not in self._vector_ops:
                self._vector_ops[key] = self._build_vector_ops(kind, fold)
        # two per-fold calls (pallas and XLA alike): measured at C192 the
        # 2-in/4-out single kernel runs at ~0.33 ms per field-pass vs ~0.24
        # for the per-fold 2-in/2-out calls
        u_x, v_x = self.update_vector(u, v, kind=kind, fold="x")
        u_y, v_y = self.update_vector(u, v, kind=kind, fold="y")
        return (u_x, v_x), (u_y, v_y)

    # ------------------------------------------------------------------
    # fold + corner-patch updates: the x and y folds differ ONLY in the
    # four corner ghost regions, so Pallas-kernel consumers can take the
    # full x-fold plus a tiny (2h, 2h) pack of the y-fold's corner values
    # ([[SW, SE], [NW, NE]]) and synthesize the y-fold in VMEM
    # (ops.folds.apply_corner_patch) — the second full-size array is never
    # materialized in HBM. This is the "one fold + corner patches" design
    # (the reference instead mutates corners in place per sweep via
    # copy_corners, which a functional program cannot).
    # ------------------------------------------------------------------
    def _patch_ops(self, stagger: str, fold: str):
        """The fold's corner-region ops with dst rects remapped into the
        (2h, 2h) patch plane: low rows/cols keep their offsets, high
        rows/cols shift down by (ny, nx)."""
        from .halo import interface_extents

        h = self.halo.n_halo
        ey, ex = interface_extents(stagger)
        ny = self.halo.nsy + ey
        nx = self.halo.nsx + ex
        ops = []
        for op in self._scalar_ops_for(stagger, fold):
            if op.name not in _CORNER_NAMES:
                continue
            r0, r1, c0, c1 = op.dst_rect
            pr0 = r0 if r0 < h else r0 - ny
            pc0 = c0 if c0 < h else c0 - nx
            ops.append(
                dataclasses.replace(
                    op,
                    dst_rect=(pr0, pr0 + (r1 - r0), pc0, pc0 + (c1 - c0)),
                )
            )
        return ops

    def _patch_from_full(self, qy, stagger: str):
        """Extract the (…, 2h, 2h) corner pack from a full fold result —
        the non-kernel fallback (XLA single-chip and sharded-mesh paths)."""
        h = self.halo.n_halo
        lo_r, hi_r = qy[..., :h, :], qy[..., -h:, :]
        return jnp.concatenate(
            [
                jnp.concatenate([lo_r[..., :h], lo_r[..., -h:]], axis=-1),
                jnp.concatenate([hi_r[..., :h], hi_r[..., -h:]], axis=-1),
            ],
            axis=-2,
        )

    @_halo_scope
    def update_scalar_fold_patch(self, q, stagger: str = "center"):
        """(q_xfold, y_corner_patch). The patch is the y-fold's four corner
        ghost regions packed [[SW, SE], [NW, NE]] into (…, 2h, 2h);
        apply_corner_patch(q_xfold, patch) == update_scalar(q, fold="y")
        exactly (asserted by test_halo_folds)."""
        sm = self._shardmap()
        if sm is None and self._use_pallas():
            from .halo_pallas import exchange_pallas_multi

            h = self.halo.n_halo
            ops_x = self._scalar_ops_for(stagger, "x")
            ops_p = self._patch_ops(stagger, "y")
            out = exchange_pallas_multi(
                {"q": q},
                [("qx", "q"), ("qp", None, (2 * h, 2 * h))],
                [("qx", op) for op in ops_x] + [("qp", op) for op in ops_p],
                (self._token, "scalar_fold_patch", stagger, q.ndim),
            )
            return out["qx"], out["qp"]
        if sm is not None:
            qx, qy = sm.update_scalar_folds(q, stagger=stagger)
        else:
            qx = self.update_scalar(q, stagger=stagger, fold="x")
            qy = self.update_scalar(q, stagger=stagger, fold="y")
        return qx, self._patch_from_full(qy, stagger)

    @_halo_scope
    def update_scalars_fold_patches(self, qs, stagger: str = "center"):
        """[(qi_xfold, yi_patch)] for several same-shaped fields."""
        return [self.update_scalar_fold_patch(q, stagger=stagger) for q in qs]

    def start_update_scalars_fold_patches(self, qs, stagger: str = "center"):
        """Async variant (see start_update_scalars_folds)."""
        sm = self._shardmap()
        if sm is not None:
            from .halo_shardmap import AsyncHaloUpdate

            hdl = sm.start_update_scalars_folds(qs, stagger=stagger)
            return AsyncHaloUpdate(
                lambda: [
                    (qx, self._patch_from_full(qy, stagger))
                    for qx, qy in hdl.wait()
                ]
            )
        from .halo_shardmap import AsyncHaloUpdate

        return AsyncHaloUpdate(
            lambda: self.update_scalars_fold_patches(qs, stagger=stagger)
        )

    @_halo_scope
    def update_vector_fold_pair(
        self, u, v, kind: str = "dgrid", fold_u: str = "y", fold_v: str = "x"
    ):
        """(u in fold_u, v in fold_v) — ONLY the fold each component's
        consumer reads. The D-grid u is y-swept and v x-swept (acoustics.py
        header), and c_sw's A-grid consumers read va_x/ua_y only — the
        both-folds variant materializes (and the kernel writes) two arrays
        nothing consumes. One kernel pass, half the output traffic of
        update_vector_folds."""
        sm = self._shardmap()
        if sm is not None:
            (u_x, v_x), (u_y, v_y) = sm.update_vector_folds(u, v, kind=kind)
            return (u_y if fold_u == "y" else u_x,
                    v_x if fold_v == "x" else v_y)
        for fold in ("x", "y"):
            key = (kind, fold)
            if key not in self._vector_ops:
                self._vector_ops[key] = self._build_vector_ops(kind, fold)
        ops_u = self._vector_ops[(kind, fold_u)]["u"]
        ops_v = self._vector_ops[(kind, fold_v)]["v"]
        if self._use_pallas():
            from .halo_pallas import exchange_pallas_multi

            out = exchange_pallas_multi(
                {"u": u, "v": v},
                [("uf", "u"), ("vf", "v")],
                [("uf", op) for op in ops_u] + [("vf", op) for op in ops_v],
                (self._token, "vector_pair", kind, fold_u, fold_v, u.ndim),
            )
            return out["uf"], out["vf"]
        srcs = {"u": u, "v": v}
        return self._assemble(u, ops_u, srcs), self._assemble(v, ops_v, srcs)

    # ------------------------------------------------------------------
    # interface sync (thin-line slab ops derived from the sync tables)
    # ------------------------------------------------------------------
    def _build_sync_ops(self, kind: str):
        """One thin-line region op per (component, tile edge). Shards that are
        not at that tile edge — or that OWN the edge — get the identity class
        (a no-op copy of their own line)."""
        from .topology import EDGE_E, EDGE_N, EDGE_S, EDGE_W

        halo = self.halo
        h = halo.n_halo
        n = halo.n_tile
        S = halo.n_shards
        ly, lx = halo.partitioner.layout
        loc_u, dir_u, loc_v, dir_v = _VECTOR_KINDS[kind]
        ops = {"u": [], "v": []}
        for comp, (loc, direction) in (("u", (loc_u, dir_u)), ("v", (loc_v, dir_v))):
            oy, ox = _STAGGER_OFFSETS[loc]
            if ox == 0.0 and oy != 0.0:  # x-interface lines on W/E edges
                edges = [
                    (EDGE_W, (h, h + halo.nsy), (h, h + 1), lambda px: px == 0),
                    (
                        EDGE_E,
                        (h, h + halo.nsy),
                        (h + halo.nsx, h + halo.nsx + 1),
                        lambda px: px == lx - 1,
                    ),
                ]
                border_of = "x"
            elif oy == 0.0 and ox != 0.0:  # y-interface lines on S/N edges
                edges = [
                    (EDGE_S, (h, h + 1), (h, h + halo.nsx), lambda py: py == 0),
                    (
                        EDGE_N,
                        (h + halo.nsy, h + halo.nsy + 1),
                        (h, h + halo.nsx),
                        lambda py: py == ly - 1,
                    ),
                ]
                border_of = "y"
            else:
                continue
            d = np.asarray(direction)
            for e, (r0, r1), (c0, c1), is_border in edges:

                def build_one(name, rect, _e=e, _is_border=is_border,
                              _comp=comp, _oy=oy, _ox=ox, _d=d,
                              _border_of=border_of):
                    (rr0, rr1), (cc0, cc1) = rect
                    flat = (rr0, rr1, cc0, cc1)
                    identity = _Class(0, flat, _comp, 1.0)
                    classes = [identity]
                    perm = np.arange(S, dtype=np.int32)
                    klass = np.zeros(S, dtype=np.int32)
                    for s in range(S):
                        t, py, px = halo._shard_info(s)
                        if not _is_border(px if _border_of == "x" else py):
                            continue
                        rel = halo.topology.adjacency.get((t, _e))
                        if rel is None:
                            continue
                        if (t, _e) <= (rel.neighbor_tile, rel.neighbor_edge):
                            continue  # owner keeps its values
                        A, b = halo.topology.edge_affine(t, _e, n)
                        jj, ii = np.meshgrid(
                            np.arange(rr0, rr1), np.arange(cc0, cc1),
                            indexing="ij",
                        )
                        gy = py * halo.nsy + (jj - h) + _oy
                        gx = px * halo.nsx + (ii - h) + _ox
                        gy2 = A[0, 0] * gy + A[0, 1] * gx + b[0]
                        gx2 = A[1, 0] * gy + A[1, 1] * gx + b[1]
                        t2 = np.full(jj.shape, rel.neighbor_tile)
                        s2, sj, si, _fy, _fx = halo._locate_source(t2, gy2, gx2)
                        if not (s2 == s2.flat[0]).all():
                            # rotated neighbor edge subdivided differently
                            # (non-square layout) — bisect and retry
                            raise _SplitNeeded(rect)
                        rot_k, src_rect = _fit_transform(jj, ii, sj, si)
                        img = A @ _d
                        if abs(img[1]) > 0.5:
                            src_comp, sign = "u", float(np.sign(img[1]))
                        else:
                            src_comp, sign = "v", float(np.sign(img[0]))
                        c = _Class(rot_k, src_rect, src_comp, sign)
                        if c not in classes:
                            classes.append(c)
                        perm[s] = int(s2.flat[0])
                        klass[s] = classes.index(c)
                    return _RegionOp(
                        flat, perm, klass, tuple(classes), name=name
                    )

                ops[comp].extend(
                    self._region_ops_split(
                        f"sync-{comp}", ((r0, r1), (c0, c1)), build_one
                    )
                )
        return ops

    def sync_vector_interfaces(self, u, v, kind: str = "dgrid"):
        sm = self._shardmap()
        if sm is not None:
            return sm.sync_vector_interfaces(u, v, kind=kind)
        if kind not in self._sync_ops:
            self._sync_ops[kind] = self._build_sync_ops(kind)
        ops = self._sync_ops[kind]
        if self._use_pallas():
            from .halo_pallas import exchange_pallas

            out = exchange_pallas(
                {"u": u, "v": v},
                [("u", op) for op in ops["u"]] + [("v", op) for op in ops["v"]],
                (self._token, "sync", kind, u.ndim),
            )
            return out["u"], out["v"]
        u_new, v_new = u, v
        for op in ops["u"]:
            u_new = self._apply_op(u_new, op, {"u": u, "v": v})
        for op in ops["v"]:
            v_new = self._apply_op(v_new, op, {"u": u, "v": v})
        return u_new, v_new
