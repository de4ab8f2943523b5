"""Hand-derived pin of ONE fully-composed LandModel ForwardEuler step
(VERDICT r4 item 8, the composed case): every coupled chain — soil heat
conduction, Richards flow with flow-direction-min face conductivities, the
saturation/pressure closure, bare-ground ET, direct surface runoff, the
two-call four-sweep SEB with implicit skin temperature, and the
ground-heat-flux / -infiltration flux-BC coupling — evaluated independently
with plain ``math`` f64 arithmetic from the cited reference formulas, then
compared against the framework's single step at rtol 1e-10.

Configuration chosen so every piece is hand-computable and no clamp is
active: Nz=3 uniform dz=0.25, loam texture with constant porosity 0.49
(organic = 0), VanGenuchten(alpha=2, n=2) => psi_m = -(1/2)sqrt(sat^-2 -1),
UnsatKLinear K = Ksat*sat (liq=1), T > 0 everywhere (free-water closure in
the thawed branch U = T*C), moderate saturations (profile adjustment is the
identity; verified by the closed-form sweeps being zero).

Reference call order pinned (`land_model.jl:79-96`, `forward_euler.jl:19-31`):
update inputs -> aux (atmosphere -> soil hydraulics -> surface hydrology
[interception -> ET -> runoff] -> SEB aux + SEB flux sweep) -> tendencies
(surface hydrology -> soil [Richards + ET sink + pool drainage; energy])
-> explicit update with Flux BCs (`abstract_timestepper.jl:65-141`) ->
closure (hydrology then energy, `soil_coupled.jl:99-107`) -> tick.
"""
import math

import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt
from test_parity_pins import (C_A, C_H, EPS, L_LG, RHO_A, SIGMA, TREF,
                              humidity_vpd)

# --- configuration constants -------------------------------------------
DZ, NZ = 0.25, 3
POR = 0.49           # ConstantSoilPorosity.mineral, organic fraction = 0
KSAT = 1.0e-6
ALPHA_VG, N_VG = 2.0, 2.0
ALPHA_SURF, EPS_SURF = 0.3, 0.97      # ConstantAlbedo (`albedo.jl:21-45`)
KAPPA_S = 2.0                         # ImplicitSkinTemperature
TAU_R = 3600.0                        # DirectSurfaceRunoff
DT = 600.0
# constituent tables (`soil_thermal_properties.jl:14-48`)
K_W, K_A, K_M = 0.57, 0.025, 3.8
C_W, C_AIR, C_M = 4.2e6, 0.00125e6, 2.0e6

# initial state (k=0 bottom), inputs
T0 = [4.0, 6.0, 8.0]
SAT0 = [0.9, 0.6, 0.5]
POOL0 = 1.0e-4
TS0 = 9.0
SW, LW, TA, QA, PA, V, RAIN = 300.0, 330.0, 10.0, 6.0e-3, 101325.0, 3.0, 4.0e-8

ZC = [-(NZ - k - 0.5) * DZ for k in range(NZ)]   # centers, bottom-up
ZF = [-(NZ - f) * DZ for f in range(NZ + 1)]     # faces


def psi_m(sat):
    """VG inverse SWRC at liq=1: Se = theta/por = sat; m = 1 - 1/n = 0.5
    (`soil_hydraulic_closures.jl:102-129`, FreezeCurves VG)."""
    return -(1.0 / ALPHA_VG) * (sat ** (-1.0 / 0.5) - 1.0) ** (1.0 / N_VG)


def volumetrics(sat):
    """liq=1, organic=0: water/air/mineral fractions (`soil_volume.jl:11-67`)."""
    return POR * sat, POR * (1.0 - sat), 1.0 - POR


def heat_capacity(sat):
    tw, ta_, tm = volumetrics(sat)
    return tw * C_W + ta_ * C_AIR + tm * C_M


def conductivity(sat):
    """InverseQuadratic mix (sum theta_i sqrt(k_i))^2
    (`soil_thermal_properties.jl:110-123`)."""
    tw, ta_, tm = volumetrics(sat)
    return (tw * math.sqrt(K_W) + ta_ * math.sqrt(K_A)
            + tm * math.sqrt(K_M)) ** 2


def expected_step():
    """The full hand-derived step; returns the post-step values."""
    # closure-consistent start: U = T*C (thawed), psi = psi_m + z (psi_h = 0
    # because the water table sits at the bottom face: sat[0] < 1,
    # `soil_hydrology.jl:170-175`; z_ref = surface = 0)
    U0 = [T0[k] * heat_capacity(SAT0[k]) for k in range(NZ)]
    psi0 = [psi_m(SAT0[k]) + ZC[k] for k in range(NZ)]

    # ---- update_state: auxiliaries -----------------------------------
    # soil hydraulics: center K (UnsatKLinear, liq=1:
    # `soil_hydraulic_properties.jl:166-181`), face K = neighbor-min with
    # the top-face quirk (faces Nz-1 and Nz both take the top-center K,
    # `soil_hydrology.jl:145-163`)
    Kc = [KSAT * s for s in SAT0]
    K_face = [Kc[0], min(Kc[0], Kc[1]), Kc[2], Kc[2]]

    # surface hydrology (bare ground; aux order interception -> ET ->
    # runoff, `surface_hydrology.jl:36-49`)
    ra = 1.0 / (C_H * V)                                   # `aerodynamics.jl`
    E = humidity_vpd(TS0, QA, PA) / ra                     # beta = 1
    drainage = max(POOL0, 0.0) / TAU_R                     # S > 0 branch
    infil = min(drainage, K_face[3])                       # sat_top < 1
    runoff = RAIN + drainage - infil                       # :27-117

    # SEB: LandModel calls the fused sweep TWICE (compute_auxiliary +
    # compute_surface_energy_fluxes, `land_model.jl:79-88`), each =
    # fluxes -> Ts update -> fluxes (`surface_energy_balance.jl:95-110`);
    # H_l uses the ET scheme's (fixed) humidity flux E
    Tg = T0[-1]
    H_l = L_LG * RHO_A * E

    def G_of(Ts):
        SW_up = ALPHA_SURF * SW
        LW_up = EPS_SURF * SIGMA * (Ts + TREF) ** 4 + (1 - EPS_SURF) * LW
        R_net = SW_up - SW + LW_up - LW
        H_s = RHO_A * C_A * (Ts - TA) / ra
        return R_net - H_s - H_l                           # reference form

    c = DZ / (2.0 * KAPPA_S)
    Ts1 = Tg - G_of(TS0) * c     # sweep 1 (inside compute_auxiliary)
    Ts2 = Tg - G_of(Ts1) * c     # sweep 2 (compute_surface_energy_fluxes)
    G_final = G_of(Ts2)          # aux fluxes recomputed at Ts2

    # ---- tendencies ---------------------------------------------------
    # heat: q = -kappa_f dT/dz, kappa_f = arithmetic face mean, zero-
    # gradient ghosts => boundary q = 0 (`soil_energy.jl:112-149`)
    kap = [conductivity(s) for s in SAT0]
    kf = [kap[0], 0.5 * (kap[0] + kap[1]), 0.5 * (kap[1] + kap[2]), kap[2]]
    qh = [0.0,
          -kf[1] * (T0[1] - T0[0]) / DZ,
          -kf[2] * (T0[2] - T0[1]) / DZ,
          0.0]
    dU = [-(qh[k + 1] - qh[k]) / DZ for k in range(NZ)]

    # Richards: q = -K_eff dpsi/dz; K_eff = min of FACE-array neighbors in
    # the flow direction (`soil_hydrology_rre.jl:120-131`: grad < 0 ->
    # min(K[f-1], K[f]), else min(K[f], K[f+1])); boundary grads 0
    grad = [0.0,
            (psi0[1] - psi0[0]) / DZ,
            (psi0[2] - psi0[1]) / DZ,
            0.0]
    qw = [0.0, 0.0, 0.0, 0.0]
    for f in (1, 2):
        K_eff = min(K_face[f - 1], K_face[f]) if grad[f] < 0.0 \
            else min(K_face[f], K_face[f + 1])
        qw[f] = -K_eff * grad[f]
    dth = [-(qw[k + 1] - qw[k]) / DZ for k in range(NZ)]
    dth[-1] += -E / DZ           # ET sink, top layer (`evapotranspiration_base.jl:9-15`)
    dsat = [d / POR for d in dth]  # porosity rescale (`soil_hydrology.jl:222-237`)
    dpool = min(drainage, POOL0)   # parity sign (`soil_hydrology.jl:274-283`)

    # ---- explicit update + Flux BCs (`abstract_timestepper.jl:65-141`,
    # `land_model.jl:46-66`: ghf on U top; -infiltration on sat top) -----
    U1 = [U0[k] + dU[k] * DT for k in range(NZ)]
    U1[-1] += -G_final / DZ * DT          # tend[top] -= q_top/dz, q = +G
    sat1 = [SAT0[k] + dsat[k] * DT for k in range(NZ)]
    sat1[-1] += infil / DZ * DT           # -(-infil)/dz
    pool1 = POOL0 + dpool * DT

    # ---- closure (hydrology then energy, `soil_coupled.jl:99-107`) ----
    # profile adjustment: identity at these saturations (both closed-form
    # sweep carries are zero); water table = bottom face (sat[0] < 1)
    wt = ZF[0]
    psi1 = [psi_m(sat1[k]) + ZC[k] for k in range(NZ)]
    # energy closure at the NEW saturations (U >= 0 -> thawed: liq = 1,
    # T = U / C(sat1), `soil_energy_closures.jl:131-159`)
    T1 = [U1[k] / heat_capacity(sat1[k]) for k in range(NZ)]

    return dict(U=U1, sat=sat1, pool=pool1, skin=Ts2, T=T1, psi=psi1,
                wt=wt, infil=infil, runoff=runoff, E=E, G=G_final)


def test_land_model_composed_single_step():
    grid = tt.ColumnGrid.of(cells=2, spacing=tt.UniformSpacing(dz=DZ, N=NZ),
                            nf=np.float64)
    soil = tt.SoilEnergyWaterCarbon(
        strat=tt.HomogeneousStratigraphy(
            texture=tt.SoilTexture.preset("loam")),
        hydrology=tt.SoilHydrology(
            vertical_flow=tt.RichardsEq(),
            hydraulic_properties=tt.ConstantSoilHydraulics(
                sat_hydraulic_cond=KSAT,
                swrc=tt.VanGenuchten(alpha=ALPHA_VG, n=N_VG),
                unsat_hydraulic_cond=tt.UnsatKLinear())))
    model = tt.LandModel(grid=grid, vegetation=None, soil=soil)
    static = tt.FieldInputSource(fields={
        "surface_shortwave_down": SW, "surface_longwave_down": LW,
        "air_temperature": TA, "specific_humidity": QA, "air_pressure": PA,
        "windspeed": V, "rainfall": RAIN})
    sim = tt.initialize(model, tt.ForwardEuler(dt=DT),
                        initializers={"temperature": 5.0,
                                      "saturation_water_ice": 0.5},
                        input_sources=(static,))

    # overwrite with the closure-CONSISTENT hand state (initialization runs
    # an extra SEB sweep, so prognostics + closure vars are set directly)
    col = lambda v: jnp.asarray(np.array(v)[:, None] * np.ones((1, 2)))
    xy = lambda v: jnp.full((2,), v, np.float64)
    U0 = [T0[k] * heat_capacity(SAT0[k]) for k in range(NZ)]
    psi0 = [psi_m(SAT0[k]) + ZC[k] for k in range(NZ)]
    s0 = sim.state.update(
        internal_energy=col(U0), temperature=col(T0),
        liquid_water_fraction=jnp.ones((NZ, 2)),
        saturation_water_ice=col(SAT0), pressure_head=col(psi0),
        water_table=xy(ZF[0]), surface_excess_water=xy(POOL0),
        skin_temperature=xy(TS0), ground_temperature=xy(T0[-1]))

    out = sim.step_fn(s0, DT)
    exp = expected_step()

    get = lambda name: np.asarray(out[name])[..., 0]
    np.testing.assert_allclose(get("internal_energy"), exp["U"], rtol=1e-10)
    np.testing.assert_allclose(get("saturation_water_ice"), exp["sat"],
                               rtol=1e-10)
    np.testing.assert_allclose(get("surface_excess_water"), exp["pool"],
                               rtol=1e-10)
    np.testing.assert_allclose(get("skin_temperature"), exp["skin"],
                               rtol=1e-10)
    np.testing.assert_allclose(get("temperature"), exp["T"], rtol=1e-10)
    np.testing.assert_allclose(get("pressure_head"), exp["psi"], rtol=1e-10)
    np.testing.assert_allclose(get("water_table"), exp["wt"], rtol=1e-10)
    np.testing.assert_allclose(get("infiltration"), exp["infil"], rtol=1e-10)
    np.testing.assert_allclose(get("surface_runoff"), exp["runoff"],
                               rtol=1e-10)
    np.testing.assert_allclose(get("ground_heat_flux"), exp["G"], rtol=1e-10)
    np.testing.assert_allclose(get("evaporation_ground"), exp["E"],
                               rtol=1e-10)
    assert float(out.clock.time) == DT
