"""Stencil-layer facade: the NDSL ``ndsl.dsl`` API surface in JAX terms.

Reference analog (SURVEY.md §2.2 "DSL stencil layer"): ``StencilFactory.
from_origin_domain(func, origin, domain) -> FrozenStencil``, ``GridIndexing``
(+ ``.from_sizer_and_communicator``), ``StencilConfig``, ``CompilationConfig``
and the ``RunMode`` enum (reference driver/pace/driver/driver.py:24-25,
433-456, 575-585; usage in driver/examples/notebooks/stencil_definition.ipynb
and stencil_signatures.py:15-41).

There is no stencil *compiler* here — XLA is the backend — so a "stencil" is
any jnp function of array windows. What this layer preserves from the
reference is the part users actually program against:

- ``GridIndexing``: per-shard compute-domain/halo geometry with tile-edge
  flags and origin/domain helpers — the single source of truth for "where is
  the compute domain inside the padded array".
- ``FrozenStencil``: a function bound to an (origin, domain) window and
  jitted once; calling it slices the window out of each input, applies the
  function, and writes the result back into the padded output array. Because
  origin/domain are static, repeated calls hit one compiled executable (the
  reference's stencil-caching behavior).
- ``StencilConfig``/``CompilationConfig``/``RunMode``: accepted for config
  parity; the only meaningful knobs on TPU are ``validate_args`` (shape/dtype
  checks on every call) and ``compare_to_numpy`` (run the same function on
  numpy inputs and assert allclose — the reference's pair-debug-style
  per-stencil check).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import constants


class RunMode(enum.Enum):
    """Reference RunMode enum (driver.py:433-456). With a persistent XLA
    compilation cache, Build = trace+compile without executing, BuildAndRun =
    normal jit, Run = require a cache hit (best-effort: identical to
    BuildAndRun, since XLA loads from cache transparently)."""

    Build = 0
    BuildAndRun = 1
    Run = 2


@dataclasses.dataclass(frozen=True)
class CompilationConfig:
    """Reference CompilationConfig (driver.py:575-585). ``backend`` is kept
    for yaml compatibility; the only backend is XLA."""

    backend: str = "xla"
    rebuild: bool = False
    validate_args: bool = True
    format_source: bool = False
    device_sync: bool = False
    run_mode: RunMode = RunMode.BuildAndRun
    use_minimal_caching: bool = False


@dataclasses.dataclass(frozen=True)
class StencilConfig:
    compilation_config: CompilationConfig = CompilationConfig()
    compare_to_numpy: bool = False


@dataclasses.dataclass(frozen=True)
class GridIndexing:
    """Per-shard compute-domain geometry (reference GridIndexing,
    driver.py:755-757 and stencil_definition.ipynb cell 3).

    ``domain`` is the (nz, ny, nx) compute extent; ``n_halo`` the ghost
    width; the four edge flags say whether this shard touches its tile's
    boundary (always True at layout (1,1))."""

    domain: Tuple[int, int, int]
    n_halo: int = constants.N_HALO_DEFAULT
    south_edge: bool = True
    north_edge: bool = True
    west_edge: bool = True
    east_edge: bool = True

    @classmethod
    def from_sizer(cls, sizer, shard_y: int = 0, shard_x: int = 0,
                   layout: Tuple[int, int] = (1, 1)) -> "GridIndexing":
        """Reference ``from_sizer_and_communicator`` analog: derive the
        domain from a SubtileGridSizer and the shard's position in the
        layout (the communicator's role collapses to (shard_y, shard_x))."""
        return cls(
            domain=(sizer.nz, sizer.ny, sizer.nx),
            n_halo=sizer.n_halo,
            south_edge=shard_y == 0,
            north_edge=shard_y == layout[0] - 1,
            west_edge=shard_x == 0,
            east_edge=shard_x == layout[1] - 1,
        )

    @classmethod
    def from_halo(cls, halo, shard: int, nz: int) -> "GridIndexing":
        """Per-shard geometry from the model's OWN decomposition (a
        ``parallel.halo.HaloExchanger``) — the single source of truth the
        driver exposes as ``Driver.grid_indexing(shard)`` so user stencils
        (FrozenStencil origin/domain windows) index the exact padded arrays
        the model allocates."""
        _tile, py, px = halo._shard_info(shard)
        ly, lx = halo.partitioner.layout
        return cls(
            domain=(nz, halo.nsy, halo.nsx),
            n_halo=halo.n_halo,
            south_edge=py == 0,
            north_edge=py == ly - 1,
            west_edge=px == 0,
            east_edge=px == lx - 1,
        )

    @property
    def origin_compute(self) -> Tuple[int, int, int]:
        return (0, self.n_halo, self.n_halo)

    @property
    def domain_compute(self) -> Tuple[int, int, int]:
        return self.domain

    def origin_full(self) -> Tuple[int, int, int]:
        return (0, 0, 0)

    def domain_full(self, add: Tuple[int, int, int] = (0, 0, 0)):
        nz, ny, nx = self.domain
        return (
            nz + add[0],
            ny + 2 * self.n_halo + add[1],
            nx + 2 * self.n_halo + add[2],
        )

    def get_origin_domain(self, dims: Sequence[str],
                          halos: Tuple[int, int] = (0, 0)):
        """(origin, domain) for fields named by dims, with optional extra
        halo rows/cols included in the window."""
        nz, ny, nx = self.domain
        origin = []
        domain = []
        for d in dims:
            if d.startswith("z"):
                origin.append(0)
                domain.append(nz + (1 if "interface" in d else 0))
            elif d.startswith("y"):
                origin.append(self.n_halo - halos[0])
                domain.append(ny + 2 * halos[0] + (1 if "interface" in d else 0))
            elif d.startswith("x"):
                origin.append(self.n_halo - halos[1])
                domain.append(nx + 2 * halos[1] + (1 if "interface" in d else 0))
            else:  # stacked-shard or tracer axes pass through whole
                origin.append(0)
                domain.append(-1)
        return tuple(origin), tuple(domain)


class FrozenStencil:
    """A function bound to a static (origin, domain) window and jitted once.

    ``func(*windows) -> window | tuple`` sees only the window; the call
    slices each input at (origin, domain) on its trailing ``len(origin)``
    axes, applies ``func`` and writes results back into copies of the
    corresponding outputs. Output selection: the first ``n_outputs`` args.
    """

    def __init__(self, func: Callable, origin: Tuple[int, ...],
                 domain: Tuple[int, ...], n_outputs: int = 1,
                 config: Optional[StencilConfig] = None):
        self.func = func
        self.origin = tuple(int(o) for o in origin)
        self.domain = tuple(int(d) for d in domain)
        self.n_outputs = n_outputs
        self.config = config or StencilConfig()
        self._jitted = jax.jit(self._call_impl)
        self._shapes: Optional[Tuple] = None

    def _window(self, arr):
        nd = len(self.origin)
        sl = [slice(None)] * (arr.ndim - nd)
        for o, d in zip(self.origin, self.domain):
            sl.append(slice(o, None) if d == -1 else slice(o, o + d))
        return tuple(sl)

    def _call_impl(self, *args):
        wins = [a[self._window(a)] for a in args]
        res = self.func(*wins)
        if not isinstance(res, tuple):
            res = (res,)
        outs = []
        for i in range(self.n_outputs):
            outs.append(args[i].at[self._window(args[i])].set(res[i]))
        return outs[0] if self.n_outputs == 1 else tuple(outs)

    def __call__(self, *args):
        cc = self.config.compilation_config
        if cc.validate_args:
            shapes = tuple((a.shape, str(jnp.asarray(a).dtype)) for a in args)
            if self._shapes is None:
                self._shapes = shapes
            elif shapes != self._shapes:
                raise TypeError(
                    f"FrozenStencil called with {shapes}, built for "
                    f"{self._shapes} (reference validate_args behavior)"
                )
        if cc.run_mode is RunMode.Build:
            self._jitted.lower(*args).compile()
            return args[0] if self.n_outputs == 1 else args[: self.n_outputs]
        out = self._jitted(*args)
        if self.config.compare_to_numpy:
            self._compare_to_numpy(args, out)
        if cc.device_sync:
            jax.block_until_ready(out)
        return out

    def _compare_to_numpy(self, args, out):
        wins = [np.asarray(a)[self._window(np.asarray(a))] for a in args]
        res = self.func(*wins)
        if not isinstance(res, tuple):
            res = (res,)
        outs = out if isinstance(out, tuple) else (out,)
        for i, r in enumerate(res[: self.n_outputs]):
            got = np.asarray(outs[i])[self._window(np.asarray(outs[i]))]
            np.testing.assert_allclose(got, np.asarray(r), rtol=1e-5, atol=1e-6)


class StencilFactory:
    """Reference StencilFactory (driver.py:24; notebook cell 4)."""

    def __init__(self, config: Optional[StencilConfig] = None,
                 grid_indexing: Optional[GridIndexing] = None):
        self.config = config or StencilConfig()
        self.grid_indexing = grid_indexing

    def from_origin_domain(self, func: Callable, origin, domain,
                           n_outputs: int = 1) -> FrozenStencil:
        return FrozenStencil(func, origin, domain, n_outputs, self.config)

    def from_dims_halo(self, func: Callable, compute_dims: Sequence[str],
                       compute_halos: Tuple[int, int] = (0, 0),
                       n_outputs: int = 1) -> FrozenStencil:
        if self.grid_indexing is None:
            raise ValueError("from_dims_halo requires grid_indexing")
        origin, domain = self.grid_indexing.get_origin_domain(
            compute_dims, compute_halos
        )
        return FrozenStencil(func, origin, domain, n_outputs, self.config)
