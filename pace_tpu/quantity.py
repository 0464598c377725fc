"""Quantity: a dims/units/halo-aware array container, registered as a JAX pytree.

TPU-native analog of ``ndsl.quantity.Quantity`` (reference API documented at
docs/util/state.rst and docs/util/communication.rst: ``.data`` includes the halo,
``.view`` indexes the compute domain, ``.metadata`` carries dims/units/origin/extent).

Design difference from the reference: there is no backend zoo (``.np`` dispatching
numpy vs cupy) — the array is always a jax array (or numpy array pre-device-put), and
all compute functions in :mod:`pace_tpu.ops` take and return *raw arrays*; Quantity is
the user-facing container used by state objects, diagnostics, restart I/O and halo
metadata. Being a pytree, whole state dataclasses of Quantities pass through
``jax.jit`` / ``shard_map`` unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import constants


@dataclasses.dataclass(frozen=True)
class QuantityMetadata:
    dims: Tuple[str, ...]
    units: str
    origin: Tuple[int, ...]
    extent: Tuple[int, ...]
    dtype: Any

    @property
    def dim_lengths(self) -> Mapping[str, int]:
        return dict(zip(self.dims, self.extent))


@jax.tree_util.register_pytree_node_class
class Quantity:
    """A named, unit-tagged array with an explicit compute domain.

    Parameters
    ----------
    data:
        array including any halo/ghost region.
    dims:
        names for each axis (e.g. ``("tile", "z", "y", "x")``).
    units:
        physical units string (e.g. ``"m/s"``).
    origin:
        index of the first compute-domain point along each axis.
    extent:
        number of compute-domain points along each axis.
    """

    def __init__(
        self,
        data,
        dims: Sequence[str],
        units: str,
        origin: Sequence[int] | None = None,
        extent: Sequence[int] | None = None,
    ):
        dims = tuple(dims)
        if origin is None:
            origin = (0,) * len(dims)
        origin = tuple(int(o) for o in origin)
        if extent is None:
            extent = tuple(int(s - o) for s, o in zip(data.shape, origin))
        extent = tuple(int(e) for e in extent)
        if len(dims) != data.ndim:
            raise ValueError(
                f"dims {dims} does not match array of rank {data.ndim}"
            )
        if len(origin) != data.ndim or len(extent) != data.ndim:
            raise ValueError("origin/extent must have one entry per dimension")
        self._data = data
        self._dims = dims
        self._units = units
        self._origin = origin
        self._extent = extent

    # -- pytree protocol ------------------------------------------------
    def tree_flatten(self):
        aux = (self._dims, self._units, self._origin, self._extent)
        return (self._data,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (data,) = children
        dims, units, origin, extent = aux
        obj = cls.__new__(cls)
        obj._data = data
        obj._dims = dims
        obj._units = units
        obj._origin = origin
        obj._extent = extent
        return obj

    # -- reference-parity accessors --------------------------------------
    @property
    def data(self):
        """Full array including halo."""
        return self._data

    @property
    def dims(self) -> Tuple[str, ...]:
        return self._dims

    @property
    def units(self) -> str:
        return self._units

    @property
    def origin(self) -> Tuple[int, ...]:
        return self._origin

    @property
    def extent(self) -> Tuple[int, ...]:
        return self._extent

    @property
    def shape(self):
        return self._data.shape

    @property
    def dtype(self):
        return self._data.dtype

    @property
    def np(self):
        """Backend module (always jnp; kept for reference-API familiarity)."""
        return jnp

    @property
    def metadata(self) -> QuantityMetadata:
        return QuantityMetadata(
            dims=self._dims,
            units=self._units,
            origin=self._origin,
            extent=self._extent,
            dtype=self._data.dtype,
        )

    @property
    def view(self):
        """The compute domain (no halo) as an array slice."""
        slices = tuple(
            slice(o, o + e) for o, e in zip(self._origin, self._extent)
        )
        return self._data[slices]

    def with_data(self, data) -> "Quantity":
        """Same metadata, new array (functional update)."""
        if data.shape != self._data.shape:
            raise ValueError(
                f"shape mismatch: {data.shape} vs {self._data.shape}"
            )
        return Quantity(
            data, self._dims, self._units, self._origin, self._extent
        )

    def with_view(self, interior) -> "Quantity":
        """Functionally replace the compute domain, keeping the halo."""
        slices = tuple(
            slice(o, o + e) for o, e in zip(self._origin, self._extent)
        )
        return self.with_data(self._data.at[slices].set(interior))

    def transpose(self, target_dims: Sequence[str]) -> "Quantity":
        perm = tuple(self._dims.index(d) for d in target_dims)
        return Quantity(
            jnp.transpose(self._data, perm),
            tuple(self._dims[p] for p in perm),
            self._units,
            tuple(self._origin[p] for p in perm),
            tuple(self._extent[p] for p in perm),
        )

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self._data)

    def __repr__(self):
        return (
            f"Quantity(dims={self._dims}, units={self._units!r}, "
            f"origin={self._origin}, extent={self._extent}, "
            f"shape={tuple(self._data.shape)}, dtype={self._data.dtype})"
        )


def zeros(
    dims: Sequence[str],
    units: str,
    *,
    sizes: Mapping[str, int],
    n_halo: int = constants.N_HALO_DEFAULT,
    dtype=None,
) -> Quantity:
    """Allocate a zeroed Quantity with halos on horizontal dims.

    ``sizes`` maps dim name -> compute extent (non-interface size); interface
    dims automatically get +1. Horizontal dims get ``n_halo`` ghost cells per
    side; tile/z dims get none.
    """
    from . import dtypes

    if dtype is None:
        dtype = dtypes.Float
    shape = []
    origin = []
    extent = []
    for d in dims:
        base = d.replace("_interface", "")
        n = sizes[base] + (1 if d.endswith("_interface") else 0)
        halo = n_halo if base in ("x", "y") else 0
        shape.append(n + 2 * halo)
        origin.append(halo)
        extent.append(n)
    return Quantity(
        jnp.zeros(tuple(shape), dtype=dtype), dims, units, origin, extent
    )


@dataclasses.dataclass(frozen=True)
class SubtileGridSizer:
    """Per-shard shape calculator (reference ``ndsl.initialization.SubtileGridSizer``,
    used via ``QuantityFactory`` at driver/pace/driver/driver.py:744-760).

    Computes dim-name -> length maps for one subtile shard given the global
    cube size and rank layout. ``nx``/``ny``/``nz`` are the *per-shard*
    compute extents; interface dims get +1, horizontal dims carry ``n_halo``
    ghost points per side.
    """

    nx: int
    ny: int
    nz: int
    n_halo: int = constants.N_HALO_DEFAULT

    @classmethod
    def from_tile_params(
        cls,
        nx_tile: int,
        ny_tile: int,
        nz: int,
        n_halo: int = constants.N_HALO_DEFAULT,
        layout: Tuple[int, int] = (1, 1),
    ) -> "SubtileGridSizer":
        if nx_tile % layout[1] or ny_tile % layout[0]:
            raise ValueError(
                f"tile size ({ny_tile}, {nx_tile}) not divisible by layout {layout}"
            )
        return cls(
            nx=nx_tile // layout[1], ny=ny_tile // layout[0], nz=nz, n_halo=n_halo
        )

    @property
    def sizes(self) -> Mapping[str, int]:
        return {"x": self.nx, "y": self.ny, "z": self.nz, "tile": 6}

    def get_extent(self, dims: Sequence[str]) -> Tuple[int, ...]:
        out = []
        for d in dims:
            base = d.replace("_interface", "")
            out.append(self.sizes[base] + (1 if d.endswith("_interface") else 0))
        return tuple(out)

    def get_origin(self, dims: Sequence[str]) -> Tuple[int, ...]:
        return tuple(
            self.n_halo if d.replace("_interface", "") in ("x", "y") else 0
            for d in dims
        )

    def get_shape(self, dims: Sequence[str]) -> Tuple[int, ...]:
        return tuple(
            e + 2 * o for e, o in zip(self.get_extent(dims), self.get_origin(dims))
        )


@dataclasses.dataclass(frozen=True)
class QuantityFactory:
    """Allocate Quantities by dim names (reference ``ndsl.QuantityFactory``,
    driver/pace/driver/driver.py:28-29,744-760). No backend zoo: arrays are
    always jax arrays on the default device."""

    sizer: SubtileGridSizer

    @classmethod
    def from_backend(cls, sizer: SubtileGridSizer, backend: str = "jax"):
        """Reference-signature constructor; ``backend`` is accepted for API
        parity and ignored (jax is the only backend)."""
        return cls(sizer)

    def _make(self, fill, dims, units, dtype):
        from . import dtypes

        if dtype is None:
            dtype = dtypes.Float
        data = jnp.full(self.sizer.get_shape(dims), fill, dtype=dtype)
        return Quantity(
            data, dims, units, self.sizer.get_origin(dims), self.sizer.get_extent(dims)
        )

    def zeros(self, dims: Sequence[str], units: str, dtype=None) -> Quantity:
        return self._make(0, dims, units, dtype)

    def ones(self, dims: Sequence[str], units: str, dtype=None) -> Quantity:
        return self._make(1, dims, units, dtype)

    def empty(self, dims: Sequence[str], units: str, dtype=None) -> Quantity:
        # XLA has no uninitialized alloc; zeros is the deterministic choice
        return self._make(0, dims, units, dtype)

    def from_array(self, data, dims: Sequence[str], units: str) -> Quantity:
        """Wrap an existing halo-inclusive array (shape must match the sizer)."""
        expect = self.sizer.get_shape(dims)
        if tuple(data.shape) != expect:
            raise ValueError(f"array shape {data.shape} != sizer shape {expect}")
        return Quantity(
            jnp.asarray(data),
            dims,
            units,
            self.sizer.get_origin(dims),
            self.sizer.get_extent(dims),
        )
