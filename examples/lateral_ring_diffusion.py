"""Physical lateral heat diffusion on the masked global N72 grid.

Beyond-reference capability (the reference defers lateral coupling,
`README.md:123`): `ColumnRingGrid.neighbor_maps()` gives every packed land
cell its real (E, W, N, S) neighbors — ring wraps, coasts and polar caps
handled symmetrically — and `lateral_diffusion_forcing_ring` attaches a
conservative 5-point Laplacian to any prognostic through the generic
forcing hooks, with no model changes. Under `jax.shard_map` the same
operator exchanges a fixed-width halo with one `lax.ppermute` per side.

Run:  python examples/lateral_ring_diffusion.py
"""
import jax

jax.config.update("jax_platforms", "cpu")  # example runs anywhere

import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.parallel.halo import lateral_diffusion_forcing_ring

mask, _, _ = tt.load_land_mask(
    "/root/reference/inputs/era5-land_land_sea_mask_N72.nc")
ring = tt.full_gaussian_grid(72)
grid = tt.ColumnRingGrid.create(ring, mask,
                                spacing=tt.ExponentialSpacing(N=10),
                                nf=np.float32, pad_multiple=8)
model = tt.SoilModel(grid=grid)

# zonally banded initial temperature + a strong point anomaly
lat = np.asarray(grid.cell_lats)
T0 = (20.0 * np.cos(np.deg2rad(lat)))[None, :] * np.ones((grid.nz, 1))
hot = grid.n_land // 3
T0[:, hot] += 30.0

# ~100 km cells, kappa_lat = 5e5 m^2/s (stability: 4 c dt / dx^2 ~ 0.07)
lateral = lateral_diffusion_forcing_ring(5.0e5, 1.0e5, grid,
                                         variable="internal_energy")
sim = tt.initialize(
    model, tt.ForwardEuler(dt=900.0),
    initializers={"temperature": T0, "saturation_water_ice": 0.5},
    forcings={"internal_energy": lateral},
)

E0 = float((np.asarray(sim.state.prognostic["internal_energy"])
            * np.asarray(grid.dz)).sum())
sim.run(period=5 * 86400.0, dt=900.0)
U = np.asarray(sim.state.prognostic["internal_energy"])
E1 = float((U * np.asarray(grid.dz)).sum())
T = np.asarray(sim.state.temperature)

nbr = grid.neighbor_maps()
print(f"N72 land cells: {grid.n_land}; lateral links: "
      f"{int((nbr[:grid.n_land] != np.arange(grid.n_land)[:, None]).sum())}")
print(f"energy conservation: |dE|/E = {abs(E1 - E0) / abs(E0):.2e}")
print(f"hot-spot surface T: {T[-1, hot]:.2f} C "
      f"(neighbors now {np.mean(T[-1, nbr[hot]]):.2f} C)")
assert abs(E1 - E0) < 1e-6 * abs(E0)
assert np.all(np.isfinite(T))
print("OK — lateral diffusion on the real mask, conservative by construction")
