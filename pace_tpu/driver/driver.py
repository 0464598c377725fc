"""Driver: builds grid, state, dycore (and physics), runs the timestep loop.

TPU-native analog of the reference ``Driver`` (driver/pace/driver/driver.py:
386-766: __init__ builds communicator/factories/grid/state/dycore/physics/
diagnostics; step_all runs the orchestrated mainloop with per-step callbacks
for diagnostics, safety checks, perf collection and intermediate restarts;
cleanup writes final outputs). Here the whole timestep is ONE jitted XLA
program (the DaCe-orchestration analog, SURVEY.md §2.5) and the per-step
Python callbacks run between device steps.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ..models.fv3.dycore import DynamicalCore
from ..utils.logging import get_logger
from .config import DriverConfig
from .performance import Timer
from .restart import (
    has_surface_restart, load_surface_restart, save_restart,
    save_surface_restart,
)
from .safety_checks import SafetyChecker

logger = get_logger()


class Driver:
    def __init__(self, config: DriverConfig):
        self.config = config
        if config.precision == 64:
            # the PACE_FLOAT_PRECISION=64 analog (reference docs/overview.rst:
            # 15); without x64 jnp.float64 silently degrades to float32.
            # NOTE: jax_enable_x64 is process-global and stays on — mixing
            # precision-64 and precision-32 drivers in one process keeps the
            # f32 driver correct (its arrays are created float32 explicitly)
            # but changes weak-type promotion, hence the log line.
            import jax

            if not jax.config.jax_enable_x64:
                logger.info("precision=64: enabling jax_enable_x64 (process-global)")
                jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64 if config.precision == 64 else jnp.float32

        logger.info("generating grid (C%d, nz=%d)", config.nx_tile, config.nz)
        self.metric_terms = config.grid_config.get_metric_terms(
            config.nx_tile, config.nz, config.layout
        )
        from ..grid.grid_data import GridData

        self.grid_data = GridData.from_metric_terms(self.metric_terms, dtype=dtype)
        self.halo = self.metric_terms.halo

        # pluggable halo-exchange backend (reference CreatesCommSelector,
        # driver/pace/driver/comm.py): null/write/read strategies wrap the
        # real exchanger; write/read require eager execution
        self._eager = False
        comm = config.comm_config
        if comm.type == "null":
            from ..parallel.strategies import ConstantFillHalo

            self.halo = ConstantFillHalo(self.halo, comm.fill_value)
        elif comm.type == "write":
            from ..parallel.strategies import RecordingHalo

            self.halo = RecordingHalo(self.halo)
            self._eager = True
        elif comm.type == "read":
            from ..parallel.strategies import ReplayHalo

            self.halo = ReplayHalo(comm.path, self.metric_terms.halo)
            self._eager = True
        elif comm.type != "exchange":
            raise ValueError(f"unknown comm type {comm.type!r}")

        # --- device mesh (the mpirun -n N analog; reference README.md:80-84,
        # comm built inside Driver.__init__ driver.py:418-430). The mesh is
        # built BEFORE state init so initial state is sharded on creation,
        # and the halo layer routes exchanges through shard_map + ppermute
        # while any step traces (see _mesh_ctx).
        self._mesh = None
        if config.mesh_config.enabled:
            import jax as _jax

            from ..parallel import mesh as M

            if config.mesh_config.distributed:
                M.initialize_distributed()
            n_dev = config.mesh_config.n_devices or len(_jax.devices())
            ly, lx = config.layout
            n_shards = 6 * ly * lx
            if n_shards % n_dev:
                raise ValueError(
                    f"mesh_config: {n_dev} devices do not divide the "
                    f"{n_shards} shards of layout {config.layout}; choose a "
                    "layout with 6*ly*lx divisible by the device count "
                    "(reference analog: ranks = 6*lx*ly, driver.py:98)"
                )
            if config.pair_debug:
                raise ValueError(
                    "pair_debug runs eager per-stage checkpointers and is a "
                    "single-device debugging tool; disable mesh_config.enabled"
                )
            self._mesh = M.cube_mesh(n=n_dev)
            logger.info(
                "device mesh: %d devices, %d shards (%d per device)",
                n_dev, n_shards, n_shards // n_dev,
            )
            self.grid_data = M.replicate(self.grid_data, self._mesh)

        logger.info("initializing state (%s)", config.initialization.type)
        self.state = config.initialization.get_dycore_state(
            self.metric_terms, dtype
        )
        if self._mesh is not None:
            from ..parallel import mesh as M

            self.state = M.shard_state(self.state, self._mesh)

        checkpointer = None
        if config.debug_checks:
            from ..testing.sanitizer import make_sanitizer

            checkpointer = make_sanitizer()
            logger.info("debug_checks: per-stage sanitizer active (eager)")
        # donate the input state's buffers to the step (halves peak HBM in
        # the step-in-place mainloop). pair_debug keeps two live states that
        # alias the same initial buffers, so donation is disabled there.
        self.dycore = DynamicalCore(
            self.grid_data, self.halo, config.dycore_config, config.dt_atmos,
            checkpointer=checkpointer,
            donate=not config.pair_debug,
        )
        # pair_debug: run a second identical model and cross-check it at
        # EVERY checkpointer stage (reference pair_debug compares split-comm
        # replicas per stencil call, driver.py:83-87,403-409; here the
        # replica shares a process and a divergence is localized to the
        # first differing stage/variable/hit — C_SW, D_SW, Tracer2D1L,
        # Remapping, FVDynamics In/Out). Both replicas run eagerly (stage
        # checkpointers disable jit, like the reference's no-DaCe limit).
        self.dycore_pair = None
        self._pair_cmp = None
        if config.pair_debug:
            from ..testing.checkpointer import (
                PairStageComparator, SnapshotCheckpointer,
            )

            pair_snap = SnapshotCheckpointer()
            self._pair_cmp = PairStageComparator(pair_snap)
            # rebuild the primary with the recording checkpointer
            self.dycore = DynamicalCore(
                self.grid_data, self.halo, config.dycore_config,
                config.dt_atmos, checkpointer=pair_snap, donate=False,
            )
            self.dycore_pair = DynamicalCore(
                self.grid_data, self.halo, config.dycore_config,
                config.dt_atmos, checkpointer=self._pair_cmp,
            )
            self.state_pair = self.state

        self.physics = None
        run_physics = (
            config.physics_config.schemes
            and not config.dycore_only
            and not config.disable_step_physics
        )
        # dry convective adjustment runs even dycore_only (reference
        # driver.py:165: do_dry_convective_adjustment or not dycore_only)
        if run_physics or config.dycore_config.fv_sg_adj > 0:
            from ..models.shield.microphysics import MicrophysicsConfig
            from ..models.shield.pbl import PBLConfig
            from ..models.shield.physics import Physics
            from ..models.shield.radiation import GrayRadiationConfig
            from ..models.shield.sas import (
                DeepConvectionConfig, ShallowConvectionConfig,
            )
            from ..models.shield.band_radiation import BandRadiationConfig
            from ..models.shield.held_suarez import HeldSuarezConfig
            from ..models.shield.surface import SurfaceConfig
            from ..utils.registry import from_dict

            pc = config.physics_config
            # the sat-adjustment family lives in dycore_config (shared with
            # the dycore's SatAdjust3d stage, reference
            # baroclinic_c12.yaml:60-75); explicit physics_config.microphysics
            # keys override it
            shared = {
                k: getattr(config.dycore_config, k)
                for k in (
                    "tau_l2v", "tau_v2l", "tau_i2s", "tau_g2v", "ql_gen",
                    "ql_mlt", "qs_mlt", "qi_lim", "dw_ocean", "dw_land",
                    "icloud_f", "do_qa",
                )
            }
            self.physics = Physics(
                self.grid_data,
                pc.schemes if run_physics else (),
                config.dt_atmos,
                fv_sg_adj=config.dycore_config.fv_sg_adj,
                config=from_dict(
                    MicrophysicsConfig, {**shared, **(pc.microphysics or {})}
                ),
                pbl_config=from_dict(PBLConfig, pc.pbl or {}),
                radiation_config=from_dict(
                    GrayRadiationConfig, pc.radiation or {}
                ),
                sas_config=from_dict(
                    ShallowConvectionConfig, pc.shallow_convection or {}
                ),
                deep_config=from_dict(
                    DeepConvectionConfig, pc.deep_convection or {}
                ),
                surface_config=from_dict(SurfaceConfig, pc.surface or {}),
                held_suarez_config=from_dict(
                    HeldSuarezConfig, pc.held_suarez or {}
                ),
                band_radiation_config=from_dict(
                    BandRadiationConfig, pc.band_radiation or {}
                ),
                halo=self.halo,
            )
            self._maybe_load_surface()
            # eager surface init so step-0 diagnostics (output_initial_state)
            # can read precipitation/tskin/... before the first physics call
            if (self.physics._surface is not None
                    and self.physics.surface_state is None):
                self.physics.surface_state = self.physics._surface.init(
                    self.state.ps.shape, self.state.ps.dtype
                )
            if self._mesh is not None and self.physics.surface_state is not None:
                from ..parallel import mesh as M

                self.physics.surface_state = M.shard_state(
                    self.physics.surface_state, self._mesh
                )

        self.diagnostics = config.diagnostics_config.diagnostics_factory(
            self.metric_terms, self.metric_terms.spec.n_halo
        )
        self.diagnostics.store_grid(self.metric_terms)

        self.performance = config.performance_config.build()
        self.timer = Timer()

        self.safety_checker = SafetyChecker()
        for chk in config.safety_checks:
            self.safety_checker.register_variable(
                chk.variable,
                chk.minimum_value,
                chk.maximum_value,
                chk.compute_domain_only,
            )

        # restart runs resume the simulation clock (reference restart.yaml
        # carries start_time_seconds; the diurnal solar forcing and output
        # timestamps must continue, not reset to t=0)
        self.time_seconds = 0.0
        init = config.initialization
        if init.type in ("restart", "fortran_restart"):
            icfg = init.config or {}
            self.time_seconds = float(icfg.get("start_time_seconds", 0.0))
            if not self.time_seconds:
                from .restart import restart_time

                try:
                    self.time_seconds = restart_time(
                        icfg.get("path", "RESTART")
                    )
                except (OSError, KeyError):
                    pass
        self._step_count = 0

    def grid_indexing(self, shard: int = 0):
        """Per-shard compute-domain geometry derived from the model's OWN
        decomposition (reference GridIndexing.from_sizer_and_communicator,
        driver.py:755-757) — the dsl-layer window users need to write
        FrozenStencil origin/domain slices against this driver's padded
        state arrays."""
        from ..dsl import GridIndexing

        return GridIndexing.from_halo(
            self.halo, shard, self.config.nz
        )

    def _mesh_ctx(self):
        """Active-mesh scope: while a step traces inside it, the halo layer
        compiles its exchanges as shard_map + ppermute over the driver's
        device mesh (parallel/halo_slabs._shardmap)."""
        import contextlib

        if self._mesh is None:
            return contextlib.nullcontext()
        from ..parallel.mesh import shard_mesh

        return shard_mesh(self._mesh)

    # ------------------------------------------------------------------
    def step_all(self):
        import time as _time

        import contextlib

        import jax

        n = self.config.n_timesteps
        logger.info("running %d steps of dt=%s s", n, self.config.dt_atmos)
        profiler = self.config.performance_config.build_profiler()
        if profiler is not None:
            profiler.enable()
        if self.config.performance_config.profile_dir:
            jax.profiler.start_trace(self.config.performance_config.profile_dir)
        ctx = jax.disable_jit() if self._eager else contextlib.nullcontext()
        with ctx, self._mesh_ctx():
            if self.config.diagnostics_config.output_initial_state:
                self.diagnostics.store(
                    self.time_seconds, self.state, self._physics_extras()
                )
            for _ in range(n):
                t0 = _time.perf_counter()
                if self._pair_cmp is not None:
                    # fresh stage recording for this step's comparison
                    self._pair_cmp.begin_step()
                with self.timer.clock("mainloop"):
                    self.state = self.dycore.step_dynamics(self.state)
                    if self.physics is not None:
                        self.state = self.physics(
                            self.state, self.time_seconds
                        )
                # block so per-step timings are honest
                self.state.u.block_until_ready()
                if self.dycore_pair is not None:
                    # the replica's stage checkpointer raises at the FIRST
                    # diverging stage/variable; the end-of-step full-state
                    # equality check still runs as the outer net
                    self.state_pair = self.dycore_pair.step_dynamics(
                        self.state_pair
                    )
                    self._check_pair()
                self.performance.record_step(_time.perf_counter() - t0)
                self.time_seconds += self.config.dt_atmos
                self._step_count += 1
                # stage profiling starts its own jax.profiler trace — only
                # one profiler session may run at a time, so when profile_dir
                # holds a whole-run trace open, defer it to after stop_trace
                if (
                    self._step_count == 1
                    and not self.config.performance_config.profile_dir
                ):
                    self._collect_stage_times()
                self._end_of_step_actions()
        if self.config.performance_config.profile_dir:
            jax.profiler.stop_trace()
            self._collect_stage_times()
        if profiler is not None:
            profiler.disable()
            prof_path = f"{self.config.performance_config.experiment_name}.prof"
            profiler.dump_stats(prof_path)
            logger.info("cProfile written to %s", prof_path)
        if self.config.comm_config.type == "write":
            self.halo.save(self.config.comm_config.path)
            logger.info(
                "halo recording written to %s", self.config.comm_config.path
            )

    def _collect_stage_times(self):
        """Attribute one step's device time to the reference stage timers
        (collect_stage_times; see stage_profile.py)."""
        if not self.config.performance_config.collect_stage_times or self._eager:
            return
        import jax
        import jax.numpy as jnp

        from .stage_profile import STAGES, profile_stage_times

        # the profiled extra step donates its input buffers (the step is
        # compiled with donation) — hand it a copy so self.state stays live
        state = jax.tree_util.tree_map(
            lambda a: jnp.copy(a) if hasattr(a, "dtype") else a, self.state
        )

        # collect_communication (reference driver.py:413-417: halo exchanges
        # timed with the timestep timer) splits halo device time out of its
        # enclosing stage — the HaloExchange scope must be matched FIRST
        # since it nests inside DynCore/TracerAdvection
        stages = (
            ("HaloExchange",) + STAGES
            if self.config.performance_config.collect_communication
            else STAGES
        )
        with self._mesh_ctx():
            stage_times = profile_stage_times(
                self.dycore._step, state, self.dycore.grid, stages=stages
            )
            if self.physics is not None:
                phys_stages = ("Radiation", "Surface", "PBL", "DeepConvection",
                               "ShallowConvection", "Microphysics")
                t = jnp.asarray(self.time_seconds, dtype=jnp.float32)
                stage_times.update(profile_stage_times(
                    self.physics._call, self.state, self.physics.surface_state,
                    t, stages=phys_stages,
                ))
        self.performance.stage_device_seconds = stage_times

    def _check_pair(self):
        import numpy as np

        for name in ("u", "v", "delp", "pt"):
            a = np.asarray(getattr(self.state, name))
            b = np.asarray(getattr(self.state_pair, name))
            if not np.array_equal(a, b):
                raise RuntimeError(
                    f"pair_debug: replica divergence in {name!r} at step "
                    f"{self._step_count}"
                )

    def _end_of_step_actions(self):
        """Reference _end_of_step_actions analog (driver.py:593-625)."""
        cfg = self.config
        if self._step_count % cfg.diagnostics_config.output_frequency == 0:
            self.diagnostics.store(
                self.time_seconds, self.state, self._physics_extras()
            )
            # ongoing perf summary at every output step (reference rank-0
            # ongoing summaries, driver.py:600-609) — a crash mid-run still
            # leaves usable timings on disk
            if cfg.performance_config.collect_performance:
                self.performance.write_json(
                    f"{cfg.performance_config.experiment_name}_perf.json",
                    cfg.dt_atmos,
                )
        self.safety_checker.check_state(
            self.state, n_halo=self.metric_terms.spec.n_halo
        )
        if (
            cfg.restart_config.save_intermediate_restart
            and self._step_count in cfg.restart_config.intermediate_restart
        ):
            path = os.path.join(
                cfg.restart_config.path, f"step_{self._step_count}"
            )
            save_restart(path, self.state, self.time_seconds)
            self._save_surface(path)
            cfg.write_for_restart(path, self.time_seconds)

    def _physics_extras(self):
        """Physics/surface diagnostics (precipitation rate, skin temperature,
        snow/ice/soil state) for yaml `diagnostics_config.names` — fields not
        living on the DycoreState. Mixed-surface fields come mask-aware from
        the scheme (the inactive scheme's state is NaN-filled)."""
        phys = self.physics
        if phys is None or phys.surface_state is None:
            return None
        sfc = phys.surface_state
        extras = {"precipitation": sfc.precip}
        if phys._surface is not None:
            extras.update(phys._surface.diagnostics(sfc))
        return extras

    def _save_surface(self, path):
        if self.physics is not None and self.physics.surface_state is not None:
            save_surface_restart(path, self.physics.surface_state)

    def _maybe_load_surface(self):
        """Restore the interactive-surface state on restart initialization
        (bit-exact coupled resume)."""
        init = self.config.initialization
        if init.type not in ("restart", "fortran_restart"):
            return
        if self.physics is None or self.physics._surface is None:
            return
        path = (init.config or {}).get("path", "RESTART")
        if not has_surface_restart(path):
            return
        _, make_init, _, _ = self.physics._surface
        template = make_init(self.state.ps.shape, self.state.ps.dtype)
        self.physics.surface_state = load_surface_restart(path, template)

    def cleanup(self):
        """Reference cleanup analog (driver.py:688-713)."""
        cfg = self.config
        if cfg.restart_config.save_restart:
            os.makedirs(cfg.restart_config.path, exist_ok=True)
            save_restart(cfg.restart_config.path, self.state, self.time_seconds)
            self._save_surface(cfg.restart_config.path)
            cfg.write_for_restart(cfg.restart_config.path, self.time_seconds)
        self.diagnostics.cleanup()
        if cfg.performance_config.collect_performance:
            report = self.performance.report(cfg.dt_atmos)
            logger.info(
                "mainloop mean %.3f s/step, SYPD=%s",
                report["mainloop_mean_seconds"],
                report["SYPD"],
            )
            self.performance.write_json(
                f"{cfg.performance_config.experiment_name}_perf.json",
                cfg.dt_atmos,
            )
