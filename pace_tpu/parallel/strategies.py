"""Halo-exchange strategies: the reference Comm-backend zoo, TPU-native.

The reference swaps its MPI communicator for fakes purely from config
(reference driver/pace/driver/comm.py:14-184: MPICommConfig, NullCommConfig —
"test whether the code crashes ... when correctness of the answer is not
important", WriterCommConfig/ReaderCommConfig record/replay — and
ndsl.comm.{null_comm,local_comm,caching_comm}). In this framework the
communicator is a pure halo-exchange function, so each backend becomes a
strategy object with the same three-method interface as the real exchanger
(update_scalar / update_vector / sync_vector_interfaces):

- :class:`ConstantFillHalo` — NullComm analog: ghosts filled with a constant.
- :class:`RecordingHalo` — CachingCommWriter analog: wraps the real exchanger
  and records every ghost-region result host-side (requires eager execution,
  e.g. ``with jax.disable_jit()``), then ``save()``s them to an .npz.
- :class:`ReplayHalo` — CachingCommReader analog: re-applies a recorded
  sequence without performing any exchange (serial debugging of a previously
  recorded run).
- :class:`NanCheckingHalo` — debug wrapper that raises on NaNs entering any
  exchange (the analog of the reference's PACE_DACE_DEBUG post-kernel NaN
  checker, doc_primer_orchestration.md:48-57); eager-mode only.

The LocalComm analog is the real exchanger itself: all shards already live in
one process as a stacked axis.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np


class _FoldsDefaultsMixin:
    """Default both-folds methods delegating to the per-fold primitives, so
    every halo strategy exposes the same surface as HaloExchanger."""

    def update_scalar_folds(self, q, stagger: str = "center"):
        return (
            self.update_scalar(q, stagger=stagger, fold="x"),
            self.update_scalar(q, stagger=stagger, fold="y"),
        )

    def update_scalars_folds(self, qs, stagger: str = "center"):
        xs = self.update_scalars(qs, stagger=stagger, fold="x")
        ys = self.update_scalars(qs, stagger=stagger, fold="y")
        return list(zip(xs, ys))

    def update_vector_folds(self, u, v, kind: str = "dgrid"):
        return (
            self.update_vector(u, v, kind=kind, fold="x"),
            self.update_vector(u, v, kind=kind, fold="y"),
        )

    def start_update_scalars_folds(self, qs, stagger: str = "center"):
        """Async API surface parity (reference start_halo_update): strategy
        backends have no collectives in flight — the handle defers the
        whole exchange to .wait()."""
        from .halo_shardmap import AsyncHaloUpdate

        return AsyncHaloUpdate(
            lambda: self.update_scalars_folds(qs, stagger=stagger)
        )

    def _patch_of(self, qy, n_halo=None):
        h = n_halo if n_halo is not None else getattr(
            getattr(self, "halo", None), "n_halo", 3
        )
        lo_r, hi_r = qy[..., :h, :], qy[..., -h:, :]
        return jnp.concatenate(
            [
                jnp.concatenate([lo_r[..., :h], lo_r[..., -h:]], axis=-1),
                jnp.concatenate([hi_r[..., :h], hi_r[..., -h:]], axis=-1),
            ],
            axis=-2,
        )

    def update_scalar_fold_patch(self, q, stagger: str = "center"):
        """(x-fold, y-corner pack) — see SlabHalo.update_scalar_fold_patch;
        strategy backends derive the pack from the full y-fold."""
        qx, qy = self.update_scalar_folds(q, stagger=stagger)
        return qx, self._patch_of(qy)

    def update_scalars_fold_patches(self, qs, stagger: str = "center"):
        return [
            self.update_scalar_fold_patch(q, stagger=stagger) for q in qs
        ]

    def start_update_scalars_fold_patches(self, qs, stagger: str = "center"):
        from .halo_shardmap import AsyncHaloUpdate

        return AsyncHaloUpdate(
            lambda: self.update_scalars_fold_patches(qs, stagger=stagger)
        )

    def update_vector_fold_pair(
        self, u, v, kind: str = "dgrid", fold_u: str = "y", fold_v: str = "x"
    ):
        u_f, _ = self.update_vector(u, v, kind=kind, fold=fold_u)
        _, v_f = self.update_vector(u, v, kind=kind, fold=fold_v)
        return u_f, v_f


class ConstantFillHalo(_FoldsDefaultsMixin):
    """Fill every ghost region with a constant (reference NullComm,
    driver/pace/driver/comm.py:94-106). The interior is untouched; vector
    sync lines are left at their computed values (identity)."""

    def __init__(self, real_halo, fill_value: float = 0.0):
        self._real = real_halo
        self.fill = float(fill_value)
        # geometry passthrough (consumers read these for shapes/masks)
        self.n_halo = real_halo.n_halo
        self.n_tile = real_halo.n_tile
        self.n_shards = real_halo.n_shards
        self.nsy = real_halo.nsy
        self.nsx = real_halo.nsx
        self.partitioner = real_halo.partitioner

    def _fill(self, q, stagger: str):
        h = self.n_halo
        fill = jnp.asarray(self.fill, dtype=q.dtype)
        ny = q.shape[-2]
        nx = q.shape[-1]
        out = q
        out = out.at[..., :h, :].set(fill)
        out = out.at[..., ny - h :, :].set(fill)
        out = out.at[..., :, :h].set(fill)
        out = out.at[..., :, nx - h :].set(fill)
        return out

    def update_scalar(self, q, stagger: str = "center", fold: str = "x"):
        return self._fill(q, stagger)

    def update_scalars(self, qs, stagger: str = "center", fold: str = "x"):
        return [self._fill(q, stagger) for q in qs]

    def update_vector(self, u, v, kind: str = "dgrid", fold: str = "x"):
        return self._fill(u, kind), self._fill(v, kind)

    def sync_vector_interfaces(self, u, v, kind: str = "dgrid"):
        return u, v


class RecordingHalo(_FoldsDefaultsMixin):
    """Perform real exchanges and record every result host-side.

    Only usable in eager mode (concrete arrays); under jit the values are
    tracers and recording raises. ``save(path)`` writes an npz replayable by
    :class:`ReplayHalo`."""

    def __init__(self, real_halo):
        self._real = real_halo
        self.records: List[np.ndarray] = []
        self._ops: List[str] = []
        for attr in ("n_halo", "n_tile", "n_shards", "nsy", "nsx", "partitioner"):
            setattr(self, attr, getattr(real_halo, attr))

    def _record(self, tag: str, *arrays):
        for a in arrays:
            if not hasattr(a, "addressable_data") and hasattr(a, "aval"):
                raise RuntimeError(
                    "RecordingHalo requires eager execution — wrap the run in "
                    "jax.disable_jit() (reference analog: CachingCommWriter "
                    "records a real run for serial replay)"
                )
            self.records.append(np.asarray(a))
            self._ops.append(tag)

    def update_scalar(self, q, stagger: str = "center", fold: str = "x"):
        out = self._real.update_scalar(q, stagger=stagger, fold=fold)
        self._record(f"scalar:{stagger}:{fold}", out)
        return out

    def update_scalars(self, qs, stagger: str = "center", fold: str = "x"):
        return [
            self.update_scalar(q, stagger=stagger, fold=fold) for q in qs
        ]

    def update_vector(self, u, v, kind: str = "dgrid", fold: str = "x"):
        uo, vo = self._real.update_vector(u, v, kind=kind, fold=fold)
        self._record(f"vector:{kind}:{fold}", uo, vo)
        return uo, vo

    def sync_vector_interfaces(self, u, v, kind: str = "dgrid"):
        uo, vo = self._real.sync_vector_interfaces(u, v, kind=kind)
        self._record(f"sync:{kind}", uo, vo)
        return uo, vo

    def save(self, path: str) -> None:
        np.savez(
            path,
            ops=np.array(self._ops),
            **{f"r{i}": r for i, r in enumerate(self.records)},
        )


class ReplayHalo(_FoldsDefaultsMixin):
    """Replay a recorded exchange sequence (reference CachingCommReader +
    serial_debugging notebook workflow). Raises if the call sequence diverges
    from the recording."""

    def __init__(self, path_or_recording, real_halo=None):
        if isinstance(path_or_recording, RecordingHalo):
            self._ops = list(path_or_recording._ops)
            self._records = list(path_or_recording.records)
            real_halo = real_halo or path_or_recording._real
        else:
            data = np.load(path_or_recording)
            self._ops = [str(x) for x in data["ops"]]
            self._records = [data[f"r{i}"] for i in range(len(self._ops))]
        self._i = 0
        if real_halo is not None:
            for attr in (
                "n_halo", "n_tile", "n_shards", "nsy", "nsx", "partitioner"
            ):
                setattr(self, attr, getattr(real_halo, attr))

    def _next(self, tag: str):
        if self._i >= len(self._ops):
            raise RuntimeError("replay exhausted: more exchanges than recorded")
        if self._ops[self._i] != tag:
            raise RuntimeError(
                f"replay divergence at call {self._i}: recorded "
                f"{self._ops[self._i]!r}, requested {tag!r}"
            )
        out = self._records[self._i]
        self._i += 1
        return jnp.asarray(out)

    def update_scalar(self, q, stagger: str = "center", fold: str = "x"):
        return self._next(f"scalar:{stagger}:{fold}")

    def update_scalars(self, qs, stagger: str = "center", fold: str = "x"):
        return [
            self.update_scalar(q, stagger=stagger, fold=fold) for q in qs
        ]

    def update_vector(self, u, v, kind: str = "dgrid", fold: str = "x"):
        tag = f"vector:{kind}:{fold}"
        u_out = self._next(tag)
        v_out = self._next(tag)
        return u_out, v_out

    def sync_vector_interfaces(self, u, v, kind: str = "dgrid"):
        tag = f"sync:{kind}"
        return self._next(tag), self._next(tag)


class NanCheckingHalo(_FoldsDefaultsMixin):
    """Raise on NaN entering any halo exchange (eager-mode numerical
    sanitizer; reference PACE_DACE_DEBUG NaN-checker analog)."""

    def __init__(self, real_halo, name: Optional[str] = None):
        self._real = real_halo
        self.name = name or "halo"
        self.calls = 0
        for attr in ("n_halo", "n_tile", "n_shards", "nsy", "nsx", "partitioner"):
            setattr(self, attr, getattr(real_halo, attr))

    def _check(self, tag, *arrays):
        self.calls += 1
        h = self.n_halo
        for a in arrays:
            if hasattr(a, "aval") and not hasattr(a, "addressable_data"):
                return  # traced: no-op under jit
            interior = np.asarray(a)[..., h:-h, h:-h]
            if np.isnan(interior).any():
                raise FloatingPointError(
                    f"NaN in interior entering {self.name} exchange #{self.calls}"
                    f" ({tag})"
                )

    def update_scalar(self, q, stagger: str = "center", fold: str = "x"):
        self._check(f"scalar:{stagger}:{fold}", q)
        return self._real.update_scalar(q, stagger=stagger, fold=fold)

    def update_scalars(self, qs, stagger: str = "center", fold: str = "x"):
        for q in qs:
            self._check(f"scalars:{stagger}:{fold}", q)
        return self._real.update_scalars(qs, stagger=stagger, fold=fold)

    def update_vector(self, u, v, kind: str = "dgrid", fold: str = "x"):
        self._check(f"vector:{kind}:{fold}", u, v)
        return self._real.update_vector(u, v, kind=kind, fold=fold)

    def sync_vector_interfaces(self, u, v, kind: str = "dgrid"):
        self._check(f"sync:{kind}", u, v)
        return self._real.sync_vector_interfaces(u, v, kind=kind)
