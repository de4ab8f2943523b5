"""Track water and energy budgets during a simulation.

The standing budget diagnostic (`diagnostics/budget.py`) — the framework
analogue of the reference's ad-hoc `Integral` conservation checks
(`test/soil/soil_hydrology_tests.jl:93-123`) — as a `Simulation.run`
callback: per-column inventories, itemized boundary/ET/pool exchange
rates, and closure residuals. Run: python examples/budget_tracking.py
"""
import jax

jax.config.update("jax_enable_x64", True)  # the closure asserts need f64

# dev machines: force CPU if no real accelerator is wanted
# jax.config.update("jax_platforms", "cpu")

import numpy as np

import terrarium_tpu as tt

grid = tt.ColumnGrid.of(cells=32, spacing=tt.ExponentialSpacing(N=12),
                        nf=np.float64)
props = tt.ConstantSoilHydraulics(
    swrc=tt.VanGenuchten(alpha=2.0, n=2.0),
    unsat_hydraulic_cond=tt.UnsatKVanGenuchten())
soil = tt.SoilEnergyWaterCarbon(
    hydrology=tt.SoilHydrology(vertical_flow=tt.RichardsEq(),
                               hydraulic_properties=props))
model = tt.SoilModel(grid=grid, soil=soil)

# a diurnal surface temperature plus a constant infiltration-like water flux
bcs = tt.merge_boundary_conditions(
    tt.PrescribedSurfaceTemperature(
        lambda t: 8.0 + 6.0 * jax.numpy.sin(2 * jax.numpy.pi * t / 86400.0)),
    {"saturation_water_ice": {"top": tt.Flux(-2.0e-8)}})  # positive-down water

sim = tt.initialize(
    model, tt.ForwardEuler(dt=300.0),
    initializers={"temperature": 4.0,
                  "saturation_water_ice": lambda x, z: np.minimum(
                      1.0, 0.55 - 0.03 * z)},
    boundary_conditions=bcs)

# rule="left" is EXACT for ForwardEuler at one-step callback spacing;
# "trapezoid" (default) suits coarse sampling of smooth runs
tracker = tt.BudgetTracker.start(sim, rule="left")
sim.run(steps=288, dt=300.0, callbacks=[tracker], callback_interval=1)

report = tracker.report(sim)
for name, rep in report.items():
    print(f"{name:7s} delta={rep['delta_inventory']:+.6e} "
          f"integrated={rep['integrated_rates']:+.6e} "
          f"residual={rep['residual']:+.3e} "
          f"(rel {rep['relative_residual']:.2e})")
assert report["water"]["relative_residual"] < 1e-9
assert report["energy"]["relative_residual"] < 1e-9
print("budgets closed (left-rule exactness, f64)")
