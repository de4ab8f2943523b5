"""Hand-derived reference-parity value pins (VERDICT r2 item 2).

Julia cannot run in this environment, so reference fidelity is pinned with
values computed INDEPENDENTLY here — every expectation below is transcribed
by hand from the cited Julia formulas using plain ``math`` arithmetic (f64),
never by calling the package. The framework's process hooks must reproduce
them to rtol <= 1e-12 at >= 3 state points per chain.

Chains pinned (reference files):
* SEB fused flux sweep + implicit skin temperature
  (`surface_energy_balance.jl:64-110`, `skin_temperature.jl:62-80`,
  `radiative_fluxes.jl:85-100,199-209`, `turbulent_fluxes.jl:85-150`,
  `physical_constants.jl:9-97`, `physics_utils.jl:54-73`)
* PALADYN canopy interception (`canopy_interception.jl:40-221`)
* PALADYN canopy evapotranspiration (`canopy_evapotranspiration.jl:51-177`)
* LUE photosynthesis + Medlyn stomatal conductance
  (`photosynthesis.jl:253-330`, `stomatal_conductance.jl:48-86`,
  `physics_utils.jl:16-29`)
* Direct surface runoff (`direct_surface_runoff.jl:27-117`)
"""
import math

import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt
from terrarium_tpu.processes.base import Context

# -- constants, transcribed from `physical_constants.jl:9-53` ---------------
SIGMA = 5.6704e-8
RHO_A = 1.293
C_A = 1005.7
L_LG = 2.257e6
EPS = 0.622
TREF = 273.15
C_H = 1.2e-3  # constant drag (`aerodynamics.jl:6-18`)


def esat(T):
    """August-Roche-Magnus (`physics_utils.jl:54-73`)."""
    if T <= 0.0:
        return 611.0 * math.exp(22.46 * T / (T + 272.62))
    return 611.0 * math.exp(17.62 * T / (T + 243.12))


def humidity_vpd(T, q, p):
    """Specific-humidity deficit over a surface at T
    (`physical_constants.jl:83-97`, `prescribed_atmosphere.jl:163-180`)."""
    e_air = q * p / (EPS + (1.0 - EPS) * q)
    vpd = max(esat(T) - e_air, 0.1)
    return EPS * vpd / p


# ---------------------------------------------------------------------------
# 1. Surface energy balance (bare ground, implicit skin temperature)
# ---------------------------------------------------------------------------
def _seb_expected(Ts0, Tg, Ta, q, p, V, SW, LW, dz1, alpha=0.3, eps_s=0.97,
                  kappa_s=2.0):
    """Two-pass fused SEB sweep (`surface_energy_balance.jl:95-110`):
    fluxes at Ts0 -> Ts update -> fluxes at Ts1."""
    ra = 1.0 / (C_H * max(V, 1e-6))

    def fluxes(Ts):
        SW_up = alpha * SW  # `radiative_fluxes.jl:85`
        LW_up = eps_s * SIGMA * (Ts + TREF) ** 4 + (1 - eps_s) * LW  # :97
        R_net = SW_up - SW + LW_up - LW  # :199-209, positive up
        H_s = RHO_A * C_A * (Ts - Ta) / ra  # `turbulent_fluxes.jl:85-101`
        H_l = L_LG * RHO_A * humidity_vpd(Ts, q, p) / ra  # :112-127
        G = R_net - H_s - H_l  # `skin_temperature.jl:76-80`
        return SW_up, LW_up, R_net, H_s, H_l, G

    G1 = fluxes(Ts0)[-1]
    Ts1 = Tg - G1 * dz1 / (2.0 * kappa_s)  # `skin_temperature.jl:62-68`
    return (Ts1,) + fluxes(Ts1)


def test_seb_implicit_skin_pins():
    pts = [  # (Ts0, Tg, Ta, q, p, V, SW, LW)
        (8.0, 6.0, 12.0, 4.0e-3, 101325.0, 3.0, 600.0, 320.0),
        (-5.0, -8.0, -2.0, 1.5e-3, 98000.0, 7.0, 150.0, 250.0),
        (25.0, 22.0, 20.0, 1.0e-2, 95000.0, 1.0, 900.0, 400.0),
    ]
    grid = tt.ColumnGrid.of(cells=3, spacing=tt.ExponentialSpacing(N=5),
                            nf=np.float64)
    model = tt.SurfaceEnergyModel(grid=grid)
    sim = tt.initialize(model, tt.ForwardEuler())
    dz1 = float(grid.vertical.dz[-1])

    arr = np.array(pts).T
    state = sim.state.update(
        skin_temperature=jnp.asarray(arr[0]),
        ground_temperature=jnp.asarray(arr[1]),
        air_temperature=jnp.asarray(arr[2]),
        specific_humidity=jnp.asarray(arr[3]),
        air_pressure=jnp.asarray(arr[4]),
        windspeed=jnp.asarray(arr[5]),
        surface_shortwave_down=jnp.asarray(arr[6]),
        surface_longwave_down=jnp.asarray(arr[7]))
    out = model.compute_auxiliary(state, sim.ctx)

    expect = np.array([_seb_expected(*p, dz1=dz1) for p in pts]).T
    np.testing.assert_allclose(np.asarray(out.skin_temperature), expect[0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.surface_shortwave_up), expect[1], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.surface_longwave_up), expect[2], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.surface_net_radiation), expect[3], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.sensible_heat_flux), expect[4], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.latent_heat_flux), expect[5], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.ground_heat_flux), expect[6], rtol=1e-12)


# ---------------------------------------------------------------------------
# 2. PALADYN canopy interception
# ---------------------------------------------------------------------------
def test_canopy_interception_pins():
    """`canopy_interception.jl:79-146`: I = a*P*(1-e^{-k(LAI+SAI)}),
    R = max(w,0)/tau, f = w/(w_max*(LAI+SAI)), P_gnd = P - I + R."""
    alpha_int, k_ext, w_max_p, tau = 0.2, 0.5, 2.0e-4, 86400.0
    pts = [  # (rain [m/s], LAI, SAI, w_can [m])
        (2.0e-7, 4.0, 1.0, 3.0e-4),
        (5.0e-8, 0.5, 0.1, 1.0e-5),
        (1.0e-6, 8.0, 2.0, 0.0),
    ]
    expect = []
    for rain, LAI, SAI, w in pts:
        I = alpha_int * rain * (1.0 - math.exp(-k_ext * (LAI + SAI)))
        R = max(w, 0.0) / tau
        f = w / (w_max_p * (LAI + SAI))  # all points keep f in [0, 1]
        expect.append((I, R, f, rain - I + R))
    expect = np.array(expect).T

    grid = tt.ColumnGrid.of(cells=3, spacing=tt.ExponentialSpacing(N=5),
                            nf=np.float64)
    model = tt.LandModel(grid=grid, vegetation=tt.VegetationCarbon())
    sim = tt.initialize(model, tt.ForwardEuler())
    arr = np.array(pts).T
    state = sim.state.update(
        rainfall=jnp.asarray(arr[0]), leaf_area_index=jnp.asarray(arr[1]),
        SAI=jnp.asarray(arr[2]), canopy_water=jnp.asarray(arr[3]))
    canopy = model.surface_hydrology.canopy_interception
    out = canopy.compute_auxiliary(state, grid, model.atmosphere, sim.ctx)
    np.testing.assert_allclose(np.asarray(out.canopy_water_interception), expect[0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.canopy_water_removal), expect[1], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.saturation_canopy_water), expect[2], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.rainfall_ground), expect[3], rtol=1e-12)


# ---------------------------------------------------------------------------
# 3. PALADYN canopy evapotranspiration
# ---------------------------------------------------------------------------
def test_canopy_evapotranspiration_pins():
    """`canopy_evapotranspiration.jl:51-177`: E_trp = dq_s/(ra + 1/gw),
    E_gnd = beta*dq_g/(ra + re), E_can = f_can*dq_s/ra,
    re = (1-e^{-LAI-SAI})/(C_can*V)."""
    C_can, beta = 0.006, 0.65
    pts = [  # (Ts, Tg, Ta, q, p, V, LAI, SAI, gw, f_can)
        (15.0, 12.0, 18.0, 6.0e-3, 101325.0, 2.5, 4.0, 1.0, 8.0e-3, 0.3),
        (2.0, 1.0, 5.0, 3.0e-3, 99000.0, 6.0, 1.0, 0.2, 2.0e-3, 0.05),
        (28.0, 25.0, 24.0, 1.2e-2, 96000.0, 0.8, 6.0, 1.5, 1.5e-2, 0.9),
    ]
    expect = []
    for Ts, Tg, Ta, q, p, V, LAI, SAI, gw, f_can in pts:
        ra = 1.0 / (C_H * max(V, 1e-6))
        re = (1.0 - math.exp(-LAI - SAI)) / (C_can * V)
        dq_s = humidity_vpd(Ts, q, p)
        dq_g = humidity_vpd(Tg, q, p)
        E_trp = dq_s / (ra + 1.0 / gw)
        E_gnd = beta * dq_g / (ra + re)
        E_can = f_can * dq_s / ra
        expect.append((E_trp, E_gnd, E_can))
    expect = np.array(expect).T

    grid = tt.ColumnGrid.of(cells=3, spacing=tt.ExponentialSpacing(N=5),
                            nf=np.float64)
    evtr = tt.PALADYNCanopyEvapotranspiration(
        ground_resistance=tt.ConstantEvaporationResistanceFactor(beta))
    sh = tt.SurfaceHydrology(evapotranspiration=evtr)
    model = tt.LandModel(grid=grid, vegetation=tt.VegetationCarbon(),
                         surface_hydrology=sh)
    sim = tt.initialize(model, tt.ForwardEuler())
    arr = np.array(pts).T
    state = sim.state.update(
        skin_temperature=jnp.asarray(arr[0]), ground_temperature=jnp.asarray(arr[1]),
        air_temperature=jnp.asarray(arr[2]), specific_humidity=jnp.asarray(arr[3]),
        air_pressure=jnp.asarray(arr[4]), windspeed=jnp.asarray(arr[5]),
        leaf_area_index=jnp.asarray(arr[6]), SAI=jnp.asarray(arr[7]),
        canopy_water_conductance=jnp.asarray(arr[8]),
        saturation_canopy_water=jnp.asarray(arr[9]))
    canopy = sh.canopy_interception
    out = evtr.compute_auxiliary(state, grid, canopy, model.constants,
                                 model.atmosphere, None, model.vegetation,
                                 sim.ctx)
    np.testing.assert_allclose(np.asarray(out.transpiration), expect[0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.evaporation_ground), expect[1], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.evaporation_canopy), expect[2], rtol=1e-12)


# ---------------------------------------------------------------------------
# 4. LUE photosynthesis + Medlyn stomatal conductance
# ---------------------------------------------------------------------------
def _photo_expected(T_air, swdown, pres, co2, LAI, lam_c, beta):
    """`photosynthesis.jl:253-330` with needleleaf defaults
    (`photosynthesis.jl:18-65`); `physics_utils.jl:16-29` partial pressures."""
    tau25, Kc25, Ko25 = 2600.0, 30.0, 3.0e4
    q10_tau, q10_Kc, q10_Ko = 0.57, 2.1, 1.2
    alpha_leaf, alpha_a, alpha_C3 = 0.17, 0.5, 0.08
    cq, k_ext = 4.6e-6, 0.5
    T_CO2_hi, T_CO2_lo = 42.0, -4.0
    T_ph_hi, T_ph_lo = 30.0, 15.0
    theta_r, C_mass = 0.7, 12.0

    if not (swdown > 0.0 and T_air > -3.0 and LAI > 0.0):
        return 0.0, 0.0, 0.0

    pres_O2 = 0.209 * pres
    pres_a = co2 * 1.0e-6 * pres
    tau = tau25 * q10_tau ** ((T_air - 25.0) * 0.1)
    Kc = Kc25 * q10_Kc ** ((T_air - 25.0) * 0.1)
    Ko = Ko25 * q10_Ko ** ((T_air - 25.0) * 0.1)
    g_star = pres_O2 / (2.0 * tau)
    PAR = 0.5 * swdown * (1.0 - alpha_leaf) * cq
    APAR = alpha_a * PAR * (1.0 - math.exp(-k_ext * LAI))
    pres_i = lam_c * pres_a
    # double sigmoid T stress (`photosynthesis.jl:155-186`)
    k1 = 2.0 * math.log(1.0 / 0.99 - 1.0) / (T_CO2_lo - T_ph_lo)
    k2 = 0.5 * (T_CO2_lo + T_ph_lo)
    k3 = math.log(0.99 / 0.01) / (T_CO2_hi - T_ph_hi)
    if T_CO2_lo < T_air < T_CO2_hi:
        T_stress = (1.0 / (1.0 + math.exp(k1 * (k2 - T_air)))
                    * (1.0 - 0.01 * math.exp(k3 * (T_air - T_ph_hi))))
    else:
        T_stress = 0.0
    c1 = alpha_C3 * T_stress * C_mass * (pres_i - g_star) / (pres_i + 2.0 * g_star)
    c2 = (pres_i - g_star) / (pres_i + Kc * (1.0 + pres_O2 / Ko))
    Vc_max = c1 * PAR * (pres_i + Kc * (1.0 + pres_O2 / Ko)) / (pres_i - g_star)
    Rd = alpha_C3 * Vc_max * beta
    JE, JC = c1 * APAR, c2 * Vc_max
    Ag = (JE + JC - math.sqrt((JE + JC) ** 2 - 4.0 * theta_r * JE * JC)) \
        / (2.0 * theta_r) * beta
    An = Ag - Rd
    return Rd, An, An * 1.0e-3  # GPP quirk (`photosynthesis.jl:351-354`)


def test_photosynthesis_pins():
    pts = [  # (T_air, swdown, pres, co2_ppm, LAI, lam_c, beta)
        (20.0, 600.0, 101325.0, 380.0, 4.0, 0.8, 0.9),
        (5.0, 200.0, 98000.0, 420.0, 1.5, 0.7, 0.5),
        (35.0, 900.0, 95000.0, 380.0, 6.0, 0.85, 1.0),
        (-5.0, 500.0, 101325.0, 380.0, 4.0, 0.8, 1.0),   # cold gate
        (20.0, 600.0, 101325.0, 380.0, 0.0, 0.8, 1.0),   # no leaves
    ]
    photo = tt.LUEPhotosynthesis()
    c = tt.PhysicalConstants()
    for p in pts:
        Rd, An, GPP = photo.compute(c, *[jnp.float64(v) for v in p])
        eRd, eAn, eGPP = _photo_expected(*p)
        np.testing.assert_allclose(float(Rd), eRd, rtol=1e-12, atol=1e-300)
        np.testing.assert_allclose(float(An), eAn, rtol=1e-12, atol=1e-300)
        np.testing.assert_allclose(float(GPP), eGPP, rtol=1e-12, atol=1e-300)


def test_medlyn_stomatal_pins():
    """`stomatal_conductance.jl:48-86`: gw = g0 + 1.6(1+g1/sqrt(vpd))An/co2*1e6,
    g0 = g_min/1000*(1-e^{-k LAI})*beta; lambda_c = 1 - 1/(1+g1/sqrt(vpd*1e-3))."""
    g1, g_min, k_ext = 2.3, 0.5, 0.5
    sc = tt.MedlynStomatalConductance()
    photo = tt.LUEPhotosynthesis()
    pts = [  # (vpd [Pa], An, co2_ppm, LAI, beta)
        (800.0, 2.0e-4, 380.0, 4.0, 0.9),
        (150.0, 5.0e-5, 420.0, 1.0, 0.4),
        (2500.0, 8.0e-4, 380.0, 7.0, 1.0),
    ]
    for vpd, An, co2, LAI, beta in pts:
        g0 = g_min / 1000.0 * (1.0 - math.exp(-k_ext * LAI)) * beta
        e_gw = g0 + 1.6 * (1.0 + g1 / math.sqrt(vpd)) * An / co2 * 1.0e6
        e_lc = 1.0 - 1.0 / (1.0 + g1 / math.sqrt(vpd * 1.0e-3))
        np.testing.assert_allclose(
            float(sc.gw_can(photo, jnp.float64(vpd), jnp.float64(An),
                            jnp.float64(co2), jnp.float64(LAI),
                            jnp.float64(beta))), e_gw, rtol=1e-12)
        np.testing.assert_allclose(float(sc.lambda_c(jnp.float64(vpd))),
                                   e_lc, rtol=1e-12)


# ---------------------------------------------------------------------------
# 5. Direct surface runoff
# ---------------------------------------------------------------------------
def test_direct_surface_runoff_pins():
    """`direct_surface_runoff.jl:27-117`: with excess water S>0 the influx is
    the drainage S/tau, else the ground rain; infiltration = min(influx, K) *
    (sat_top < 1); runoff = rain + drainage - infiltration."""
    tau = 3600.0
    pts = [  # (rain, S, K_top, sat_top)
        (2.0e-7, 5.0e-3, 1.0e-6, 0.8),   # excess pool drives infiltration
        (5.0e-7, 0.0, 1.0e-7, 0.6),      # rain-routed, K-limited
        (3.0e-7, 1.0e-3, 1.0e-6, 1.0),   # saturated top: no infiltration
    ]
    expect = []
    for rain, S, K, sat in pts:
        drainage = (max(S, 0.0) / tau) if S > 0.0 else 0.0
        influx = drainage if S > 0.0 else rain
        infil = min(influx, K) * (1.0 if sat < 1.0 else 0.0)
        expect.append((infil, rain + drainage - infil))
    expect = np.array(expect).T

    grid = tt.ColumnGrid.of(cells=3, spacing=tt.ExponentialSpacing(N=5),
                            nf=np.float64)
    soil = tt.SoilEnergyWaterCarbon(hydrology=tt.SoilHydrology(
        vertical_flow=tt.RichardsEq()))
    model = tt.LandModel(grid=grid, soil=soil)
    sim = tt.initialize(model, tt.ForwardEuler(),
                        initializers={"temperature": 1.0,
                                      "saturation_water_ice": 0.5})
    arr = np.array(pts).T
    K_face = np.broadcast_to(arr[2], (grid.nz + 1, 3)).copy()
    sat = np.broadcast_to(arr[3], (grid.nz, 3)).copy()
    state = sim.state.update(
        rainfall_ground=jnp.asarray(arr[0]),
        surface_excess_water=jnp.asarray(arr[1]),
        hydraulic_conductivity=jnp.asarray(K_face),
        saturation_water_ice=jnp.asarray(sat))
    runoff = model.surface_hydrology.surface_runoff
    out = runoff.compute_auxiliary(state, grid,
                                   model.surface_hydrology.canopy_interception,
                                   soil, sim.ctx)
    np.testing.assert_allclose(np.asarray(out.infiltration), expect[0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.surface_runoff), expect[1], rtol=1e-12)
