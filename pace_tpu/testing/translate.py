"""Translate-test framework: run one module from serialized savepoint data.

TPU-native analog of the reference's older module-level savepoint design
(``ndsl.stencils.testing.{TranslateGrid, dataset_to_dict, parallel_translate}``
and ``pyFV3.testing.TranslateFVDynamics`` — SURVEY.md §2.2/§2.3; reference
usage at tests/savepoint/translate/translate_driver.py:11-84 and
docs/testing.rst item 1). The workflow it reproduces:

1. load a savepoint dataset (one netCDF per savepoint, variables stored
   Fortran-style: compute domain + optional halo, k-major, per-rank slabs),
2. map Fortran serialization names to framework state fields
   (``FORTRAN_NAME_MAP``), re-embedding each slab into the full padded
   (S, [K,] Y, X) stacked array at the right origin,
3. run one module (the full dycore step by default),
4. compare outputs against the savepoint's "-Out" data with per-variable
   max-error thresholds and near-zero ignores (reference
   ``TranslateDriver.max_error = 3e-5``), optionally through the selective-
   validation masks of :mod:`pace_tpu.testing.validation`.

No Serialbox: like the reference's own converted data
(test_checkpoints.py:110), savepoints are plain netCDF — read through
``pace_tpu.utils.netcdf3`` (classic) or h5py (netCDF4/HDF5).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

#: Fortran serialization name -> DycoreState field (reference
#: pyFV3.testing.TranslateFVDynamics input mapping; the serialized names are
#: the savepoint variable names of fv3gfs-fortran's serialization statements)
FORTRAN_NAME_MAP: Dict[str, str] = {
    "u": "u",
    "v": "v",
    "w": "w",
    "delz": "delz",
    "pt": "pt",
    "delp": "delp",
    "ps": "ps",
    "pe": "pe",
    "pk": "pk",
    "peln": "peln",
    "pkz": "pkz",
    "phis": "phis",
    "q_con": "q_con",
    "omga": "omga",
    "ua": "ua",
    "va": "va",
    "uc": "uc",
    "vc": "vc",
    "mfxd": "mfxd",
    "mfyd": "mfyd",
    "cxd": "cxd",
    "cyd": "cyd",
    "diss_estd": "diss_estd",
}

#: tracer serialization names (order = DycoreState.q block order)
TRACER_FORTRAN_NAMES = (
    "qvapor",
    "qliquid",
    "qice",
    "qrain",
    "qsnow",
    "qgraupel",
    "qo3mr",
    "qsgs_tke",
    "qcld",
)

#: interface staggering of serialized fields: (y_extra, x_extra)
_STAGGER: Dict[str, tuple] = {
    "u": (1, 0),
    "v": (0, 1),
    "uc": (0, 1),
    "vc": (1, 0),
    "mfxd": (0, 1),
    "mfyd": (1, 0),
}
#: fields on K+1 interfaces
_KIFACE = {"pe", "peln", "pk"}
#: 2-D (no K axis) fields
_FLAT2D = {"ps", "phis"}


def dataset_to_dict(path: str) -> Dict[str, np.ndarray]:
    """Read every variable of a savepoint file into {name: ndarray}.

    Reference ``ndsl.stencils.testing.dataset_to_dict``. Accepts classic
    netCDF-3 (via pace_tpu.utils.netcdf3) or netCDF-4/HDF5 (via h5py).
    """
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if magic[:3] == b"CDF":
        from ..utils import netcdf3

        nc = netcdf3.read(path)
        return {name: np.asarray(v.data) for name, v in nc.variables.items()}
    import h5py

    out: Dict[str, np.ndarray] = {}
    with h5py.File(path, "r") as f:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name.split("/")[-1]] = obj[...]

        f.visititems(visit)
    return out


@dataclasses.dataclass
class TranslateFVDynamics:
    """Map savepoint arrays <-> DycoreState for a full-dycore translate test.

    Reference ``pyFV3.testing.TranslateFVDynamics`` (entry API per
    SURVEY.md §2.3: ``collect_input_data``, ``state_from_inputs``,
    ``outputs_from_state``, ``prepare_data``).

    ``mt``: MetricTerms for the target grid (supplies shapes + halo width).
    ``data_halo``: halo cells included in the serialized slabs (the
    serialized compute domain is re-embedded into the padded arrays at
    origin ``n_halo - data_halo``).
    """

    mt: object
    data_halo: int = 0
    dtype: object = None

    # -- loading ---------------------------------------------------------
    def collect_input_data(self, path_or_ds) -> Dict[str, np.ndarray]:
        """Savepoint file path (or pre-read dict) -> raw named slabs."""
        if isinstance(path_or_ds, (str, os.PathLike)):
            return dataset_to_dict(str(path_or_ds))
        return dict(path_or_ds)

    def _embed(self, name: str, arr: np.ndarray) -> np.ndarray:
        """Re-embed a serialized slab into the full padded stacked array."""
        halo = self.mt.halo
        h = halo.n_halo
        ys, xs = _STAGGER.get(name, (0, 0))
        Y = halo.nsy + 2 * h + ys
        X = halo.nsx + 2 * h + xs
        S = halo.n_shards
        arr = np.asarray(arr)
        if name in _FLAT2D:
            lead = (S,)
        elif name in _KIFACE:
            lead = (S, self.mt.spec.npz + 1)
        else:
            lead = (S, self.mt.spec.npz)
        full = np.zeros(lead + (Y, X), dtype=arr.dtype)
        dh = self.data_halo
        y0 = h - dh
        x0 = h - dh
        ny, nx = arr.shape[-2:]
        full[..., y0 : y0 + ny, x0 : x0 + nx] = arr
        return full

    def state_from_inputs(self, inputs: Dict[str, np.ndarray]):
        """Named slabs -> DycoreState (missing fields stay zero)."""
        from ..models.fv3.state import DycoreState

        halo = self.mt.halo
        dtype = self.dtype or jnp.float32
        st = DycoreState.init_zeros(
            {
                "S": halo.n_shards,
                "K": self.mt.spec.npz,
                "Y": halo.nsy + 2 * halo.n_halo,
                "X": halo.nsx + 2 * halo.n_halo,
            },
            dtype=dtype,
        )
        updates = {}
        for fname, sname in FORTRAN_NAME_MAP.items():
            if fname in inputs:
                updates[sname] = jnp.asarray(
                    self._embed(fname, inputs[fname]), dtype=dtype
                )
        tr = [
            jnp.asarray(self._embed("q", inputs[t]), dtype=dtype)
            if t in inputs
            else st.q[:, i]
            for i, t in enumerate(TRACER_FORTRAN_NAMES)
        ]
        updates["q"] = jnp.stack(tr, axis=1)
        return dataclasses.replace(st, **updates)

    # -- saving / comparing ---------------------------------------------
    def outputs_from_state(self, state) -> Dict[str, np.ndarray]:
        """DycoreState -> named compute-domain slabs (inverse of _embed)."""
        halo = self.mt.halo
        h = halo.n_halo
        out: Dict[str, np.ndarray] = {}
        for fname, sname in FORTRAN_NAME_MAP.items():
            arr = getattr(state, sname)
            if arr is None:
                continue
            ys, xs = _STAGGER.get(fname, (0, 0))
            out[fname] = np.asarray(
                arr[..., h : h + halo.nsy + ys, h : h + halo.nsx + xs]
            )
        for i, t in enumerate(TRACER_FORTRAN_NAMES):
            out[t] = np.asarray(
                state.q[:, i, :, h : h + halo.nsy, h : h + halo.nsx]
            )
        return out

    def compare(
        self,
        got: Dict[str, np.ndarray],
        ref: Dict[str, np.ndarray],
        max_error: float = 3e-5,
        ignore_near_zero: Optional[Dict[str, float]] = None,
        names: Optional[Sequence[str]] = None,
    ) -> List[str]:
        """Relative-max-error comparison (reference TranslateDriver
        ``max_error=3e-5``; near-zero ignores per docs/testing.rst item 1).
        Returns a list of failure strings (empty = pass)."""
        ignore_near_zero = ignore_near_zero or {}
        failures = []
        for name in names if names is not None else sorted(ref):
            if name not in got:
                failures.append(f"{name}: missing from outputs")
                continue
            a, b = np.asarray(got[name]), np.asarray(ref[name])
            if a.shape != b.shape:
                failures.append(f"{name}: shape {a.shape} != {b.shape}")
                continue
            denom = np.maximum(np.abs(b), 1e-30)
            rel = np.abs(a - b) / denom
            eps = ignore_near_zero.get(name)
            if eps is not None:
                rel = np.where(
                    (np.abs(a) < eps) & (np.abs(b) < eps), 0.0, rel
                )
            bad = np.nanmax(rel) if rel.size else 0.0
            if bad > max_error:
                failures.append(
                    f"{name}: max rel error {bad:.3e} > {max_error:.1e}"
                )
        return failures


def translate_driver(
    config_path: str,
    savepoint_in,
    savepoint_out,
    max_error: float = 3e-5,
    data_halo: int = 0,
) -> List[str]:
    """Run the WHOLE driver step from serialized inputs and compare outputs.

    Reference ``tests/savepoint/translate/translate_driver.py:19-84``
    (TranslateDriver: state from savepoint -> Driver.step_all -> compare).
    Returns failure strings (empty = pass).
    """
    from ..driver.config import DriverConfig
    from ..driver.driver import Driver

    cfg = DriverConfig.from_yaml(config_path)
    drv = Driver(cfg)
    tr = TranslateFVDynamics(drv.metric_terms, data_halo=data_halo)
    inputs = tr.collect_input_data(savepoint_in)
    drv.state = tr.state_from_inputs(inputs)
    drv.step_all()
    ref = tr.collect_input_data(savepoint_out)
    got = tr.outputs_from_state(drv.state)
    return tr.compare(got, ref, max_error=max_error, names=sorted(ref))
