"""Gradient equivalence of the fused-forward custom_vjp rollout.

`timesteppers/fused_grad.make_fused_grad_rollout` runs the forward pass on
the fused Pallas lean kernel (interpret mode here) and backpropagates with
per-segment XLA recompute (`utils/scan_dce.lean_chain`). Its gradients must
match `jax.grad` through the plain XLA remat rollout
(`timesteppers/autodiff.make_rollout_fn`) to tight tolerance — both in the
params argument and in the initial state.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import terrarium_tpu as tt
from terrarium_tpu.timesteppers.autodiff import make_rollout_fn
from terrarium_tpu.timesteppers.fused_grad import make_fused_grad_rollout

CELLS, NZ, DT = 48, 10, 300.0


def _grid(nf=np.float64):
    return tt.ColumnGrid.of(cells=CELLS, spacing=tt.ExponentialSpacing(N=NZ),
                            nf=nf)


def _model_fn(grid):
    def model_fn(log_ksat):
        props = tt.ConstantSoilHydraulics(
            sat_hydraulic_cond=jnp.exp(log_ksat),
            swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
            unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
        soil = tt.SoilEnergyWaterCarbon(hydrology=tt.SoilHydrology(
            vertical_flow=tt.RichardsEq(), hydraulic_properties=props))
        return tt.SoilModel(grid=grid, soil=soil)
    return model_fn


def _sim(model):
    return tt.initialize(
        model, tt.ForwardEuler(),
        initializers={
            "temperature": -1.0,
            "saturation_water_ice": lambda x, z: np.minimum(1.0,
                                                            0.6 - 0.04 * z)},
        boundary_conditions=tt.PrescribedSurfaceTemperature(4.0))


def _objective(out):
    return (jnp.mean(out.temperature)
            + jnp.mean(out.saturation_water_ice))


X0 = float(np.log(1e-5))


def _xla_value_grad(grid, steps):
    model_fn = _model_fn(grid)

    def loss(log_ksat):
        model = model_fn(log_ksat)
        sim = _sim(model)
        roll = make_rollout_fn(sim.model, sim.timestepper, sim.ctx, (),
                               steps=steps, remat=True, lean=True)
        return _objective(roll(sim.state, DT))

    return jax.jit(jax.value_and_grad(loss))(X0)


def _fused_value_grad(grid, steps, inner, **kw):
    model_fn = _model_fn(grid)

    def loss(log_ksat):
        sim = _sim(model_fn(X0))  # init doesn't depend on the param
        roll = make_fused_grad_rollout(
            model_fn, sim.timestepper, sim.ctx, (), steps=steps, dt=DT,
            inner_steps=inner, block_cells=CELLS, interpret=True, **kw)
        return _objective(roll(sim.state, log_ksat))

    return jax.jit(jax.value_and_grad(loss))(X0)


def test_fused_grad_matches_xla_grad():
    grid = _grid()
    v_x, g_x = _xla_value_grad(grid, steps=12)
    v_f, g_f = _fused_value_grad(grid, steps=12, inner=4)
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-10)
    np.testing.assert_allclose(float(g_f), float(g_x), rtol=1e-9)
    assert abs(float(g_f)) > 0.0  # a real gradient, not a silent zero


def test_fused_grad_bwd_chunk_identical():
    """`bwd_chunk` (checkpointed within-segment recompute) changes memory
    scheduling only — gradients identical to the whole-segment vjp."""
    grid = _grid()
    v_a, g_a = _fused_value_grad(grid, steps=12, inner=6)
    v_b, g_b = _fused_value_grad(grid, steps=12, inner=6, bwd_chunk=2)
    np.testing.assert_allclose(float(v_b), float(v_a), rtol=1e-12)
    np.testing.assert_allclose(float(g_b), float(g_a), rtol=1e-12)
    v_c, g_c = _fused_value_grad(grid, steps=12, inner=6, bwd_remat=True)
    np.testing.assert_allclose(float(v_c), float(v_a), rtol=1e-12)
    np.testing.assert_allclose(float(g_c), float(g_a), rtol=1e-12)


def test_fused_grad_pallas_bwd_matches_xla_bwd():
    """The fused segment-VJP kernel (`ops/fused_vjp`, bwd="pallas") — the
    whole backward sweep in one Pallas kernel with VMEM-checkpointed
    carries — must reproduce the XLA-vjp backward's gradients."""
    grid = _grid()
    v_x, g_x = _fused_value_grad(grid, steps=12, inner=4)
    v_p, g_p = _fused_value_grad(grid, steps=12, inner=4, bwd="pallas")
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-12)
    np.testing.assert_allclose(float(g_p), float(g_x), rtol=1e-10)


def test_fused_grad_pallas_bwd_state_grad():
    grid = _grid()
    model_fn = _model_fn(grid)
    sim = _sim(model_fn(X0))
    steps, inner = 8, 4

    def loss(u0, bwd):
        st = sim.state.update(internal_energy=u0)
        roll = make_fused_grad_rollout(
            model_fn, sim.timestepper, sim.ctx, (), steps=steps, dt=DT,
            inner_steps=inner, block_cells=CELLS, interpret=True, bwd=bwd)
        return _objective(roll(st, X0))

    u0 = sim.state.prognostic["internal_energy"]
    g_x = jax.jit(jax.grad(lambda u: loss(u, "xla")))(u0)
    g_p = jax.jit(jax.grad(lambda u: loss(u, "pallas")))(u0)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-8, atol=1e-18)


def test_fused_grad_wrt_initial_state():
    """d(loss)/d(initial prognostics) through the custom_vjp chain matches
    the XLA rollout's state gradient."""
    grid = _grid()
    model_fn = _model_fn(grid)
    sim = _sim(model_fn(X0))
    steps, inner = 8, 4

    def loss_xla(u0):
        st = sim.state.update(internal_energy=u0)
        roll = make_rollout_fn(sim.model, sim.timestepper, sim.ctx, (),
                               steps=steps, remat=True, lean=True)
        return _objective(roll(st, DT))

    def loss_fused(u0):
        st = sim.state.update(internal_energy=u0)
        roll = make_fused_grad_rollout(
            model_fn, sim.timestepper, sim.ctx, (), steps=steps, dt=DT,
            inner_steps=inner, block_cells=CELLS, interpret=True)
        return _objective(roll(st, X0))

    u0 = sim.state.prognostic["internal_energy"]
    g_x = jax.jit(jax.grad(loss_xla))(u0)
    g_f = jax.jit(jax.grad(loss_fused))(u0)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               rtol=1e-8, atol=1e-18)


def test_fused_grad_finite_difference():
    grid = _grid()
    steps, inner, h = 8, 4, 0.02
    _, g_ad = _fused_value_grad(grid, steps=steps, inner=inner)
    model_fn = _model_fn(grid)

    def loss(log_ksat):
        sim = _sim(model_fn(X0))
        roll = make_fused_grad_rollout(
            model_fn, sim.timestepper, sim.ctx, (), steps=steps, dt=DT,
            inner_steps=inner, block_cells=CELLS, interpret=True)
        return _objective(roll(sim.state, log_ksat))

    jl = jax.jit(loss)
    g_fd = (float(jl(X0 + h)) - float(jl(X0 - h))) / (2 * h)
    np.testing.assert_allclose(float(g_ad), g_fd, rtol=5e-4)


def test_fused_grad_rejects_bad_config():
    grid = _grid()
    model_fn = _model_fn(grid)
    sim = _sim(model_fn(X0))
    with pytest.raises(ValueError, match="multiple"):
        make_fused_grad_rollout(model_fn, sim.timestepper, sim.ctx, (),
                                steps=10, dt=DT, inner_steps=4)
    with pytest.raises(ValueError, match="multiple"):
        make_fused_grad_rollout(model_fn, sim.timestepper, sim.ctx, (),
                                steps=12, dt=DT, inner_steps=6, bwd_chunk=4)
    ts = tt.TimeSeriesInputSource(
        times=np.array([0.0, 3600.0]),
        series={"surface_temperature": np.zeros((2, CELLS), np.float32)})
    with pytest.raises(ValueError, match="static"):
        make_fused_grad_rollout(model_fn, sim.timestepper, sim.ctx, (ts,),
                                steps=12, dt=DT, inner_steps=4)


def test_fused_grad_implicit_stepper():
    """The custom_vjp fused rollout composes with ImplicitEuler: gradients
    flow through the in-kernel linearized backward-Euler assembles and
    tridiagonal solves, matching the plain XLA grad of the same rollout."""
    grid = _grid()
    model_fn = _model_fn(grid)
    ts = tt.ImplicitEuler(dt=1800.0)
    sim = tt.initialize(
        model_fn(X0), ts,
        initializers={
            "temperature": -1.0,
            "saturation_water_ice": lambda x, z: np.minimum(1.0,
                                                            0.6 - 0.04 * z)},
        boundary_conditions=tt.PrescribedSurfaceTemperature(4.0))
    steps, inner = 8, 4

    def loss_xla(x):
        model = model_fn(x)
        roll = make_rollout_fn(model, ts, sim.ctx, (), steps=steps,
                               remat=True, lean=True)
        return _objective(roll(sim.state, 1800.0))

    def loss_fused(x, bwd):
        roll = make_fused_grad_rollout(
            model_fn, ts, sim.ctx, (), steps=steps, dt=1800.0,
            inner_steps=inner, block_cells=CELLS, interpret=True, bwd=bwd)
        return _objective(roll(sim.state, x))

    v_x, g_x = jax.jit(jax.value_and_grad(loss_xla))(X0)
    for bwd in ("xla", "pallas"):
        v_f, g_f = jax.jit(jax.value_and_grad(
            lambda x: loss_fused(x, bwd)))(X0)
        np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-10)
        np.testing.assert_allclose(float(g_f), float(g_x), rtol=1e-8,
                                   err_msg=bwd)


def test_fused_grad_heun_stepper():
    """...and with Heun (two-stage predictor/corrector in-kernel)."""
    grid = _grid()
    model_fn = _model_fn(grid)
    ts = tt.Heun(dt=DT)
    sim = tt.initialize(
        model_fn(X0), ts,
        initializers={
            "temperature": -1.0,
            "saturation_water_ice": lambda x, z: np.minimum(1.0,
                                                            0.6 - 0.04 * z)},
        boundary_conditions=tt.PrescribedSurfaceTemperature(4.0))
    steps, inner = 8, 4

    def loss_xla(x):
        model = model_fn(x)
        roll = make_rollout_fn(model, ts, sim.ctx, (), steps=steps,
                               remat=True, lean=True)
        return _objective(roll(sim.state, DT))

    def loss_fused(x):
        roll = make_fused_grad_rollout(
            model_fn, ts, sim.ctx, (), steps=steps, dt=DT,
            inner_steps=inner, block_cells=CELLS, interpret=True,
            bwd="pallas")
        return _objective(roll(sim.state, x))

    v_x, g_x = jax.jit(jax.value_and_grad(loss_xla))(X0)
    v_f, g_f = jax.jit(jax.value_and_grad(loss_fused))(X0)
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-10)
    np.testing.assert_allclose(float(g_f), float(g_x), rtol=1e-8)


def test_fused_grad_coupled_land_model_xy_rank2():
    """The fused gradient rollout handles the FULL coupled LandModel
    (SEB + surface hydrology + PALADYN vegetation + Richards soil) with
    the XY-rank-2 kernel layout — differentiating a mixed
    temperature/carbon objective wrt the mineral conductivity through
    both backward modes, at machine precision vs the XLA remat rollout."""
    cells, nz = 32, 8
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=nz),
                            nf=np.float64)

    def model_fn(k_mineral):
        tp = tt.SoilThermalProperties(
            conductivities=tt.SoilThermalConductivities(mineral=k_mineral))
        soil = tt.SoilEnergyWaterCarbon(
            strat=tt.HomogeneousStratigraphy(
                texture=tt.SoilTexture.preset("loam")),
            energy=tt.SoilEnergyBalance(thermal_properties=tp),
            hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq()))
        return tt.LandModel(grid=grid,
                            vegetation=tt.VegetationCarbon.consistent_units(),
                            soil=soil)

    static = tt.FieldInputSource(fields={
        "surface_longwave_down": 330.0, "rainfall": 4.0e-8,
        "windspeed": 3.0, "surface_shortwave_down": 300.0,
        "air_temperature": 10.0, "specific_humidity": 0.006})
    sim = tt.initialize(
        model_fn(3.8), tt.ForwardEuler(dt=600.0),
        initializers={"temperature": 8.0, "saturation_water_ice": 0.6,
                      "carbon_vegetation": 2.0,
                      "vegetation_area_fraction": 0.5},
        input_sources=(static,))

    def objective(out):
        return (jnp.mean(out.temperature)
                + jnp.mean(out.prognostic["carbon_vegetation"]))

    def loss_xla(k):
        roll = make_rollout_fn(model_fn(k), sim.timestepper, sim.ctx,
                               sim.input_sources, steps=8, remat=True,
                               lean=True)
        return objective(roll(sim.state, 600.0))

    def loss_f(k, bwd):
        roll = make_fused_grad_rollout(
            model_fn, sim.timestepper, sim.ctx, sim.input_sources, steps=8,
            dt=600.0, inner_steps=4, block_cells=32, xy_rank2=True,
            interpret=True, bwd=bwd)
        return objective(roll(sim.state, k))

    v_x, g_x = jax.jit(jax.value_and_grad(loss_xla))(3.8)
    for bwd in ("xla", "pallas"):
        v_f, g_f = jax.jit(jax.value_and_grad(
            lambda k: loss_f(k, bwd)))(3.8)
        np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-12,
                                   err_msg=bwd)
        np.testing.assert_allclose(float(g_f), float(g_x), rtol=1e-10,
                                   err_msg=bwd)
