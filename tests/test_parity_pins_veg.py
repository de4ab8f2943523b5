"""Hand-derived parity pins for the vegetation-carbon chains + snow DDM
(VERDICT r3 item 8 — the chains test_parity_pins.py left unpinned).

Every expectation is transcribed independently from the cited reference
formulas with plain ``math`` f64 arithmetic; the process hooks must
reproduce them to rtol <= 1e-12 at >= 3 state points per chain.

Chains pinned:
* PALADYN autotrophic respiration (`autotrophic_respiration.jl:89-126`,
  incl. the 7 degC soil gate and Rg = 0.25(GPP - Rm))
* PALADYN carbon dynamics (`carbon_dynamics.jl:64-138`: LAI_b, the
  three-branch lambda_NPP ramp, litterfall, dC/dt)
* PALADYN vegetation dynamics (`vegetation_dynamics.jl:80-110`,
  incl. nu < nu_seed)
* Phenology stub (`phenology.jl:16-119`: phen = 1, LAI = LAI_b)
* Static exponential root distribution + field-capacity-limited PAW
  (`root_distribution.jl:40-63`, `plant_available_water.jl:34-62`)
* Degree-day snowpack (extension, processes/snow.py — no reference
  counterpart; pinned against the documented Kavetski & Kuczera form)
"""
import math

import jax.numpy as jnp
import numpy as np

import terrarium_tpu as tt


def _veg_sim(cells=3):
    grid = tt.ColumnGrid.of(cells=cells, spacing=tt.ExponentialSpacing(N=5),
                            nf=np.float64)
    model = tt.LandModel(grid=grid, vegetation=tt.VegetationCarbon())
    return tt.initialize(model, tt.ForwardEuler()), model, grid


def f_temp(T):
    """`autotrophic_respiration.jl:52`."""
    return math.exp(308.56 * (1.0 / 56.02 - 1.0 / (46.02 + T)))


def test_autotrophic_respiration_pins():
    """`autotrophic_respiration.jl:89-126, 150-170`: Rm = R_leaf + R_stem +
    R_root with the T_soil > 7 gate; Rg = 0.25(GPP - Rm); NPP = GPP - Ra."""
    SLA, awl, aws, cn_sap, cn_root, resp10 = 10.0, 2.0, 10.0, 330.0, 29.0, 0.066
    pts = [  # (T_air, T_soil, Rd [g/m2/s], phen, C_veg, GPP)
        (15.0, 10.0, 0.4, 1.0, 2.0, 5.0e-8),
        (5.0, 5.0, 0.1, 0.7, 0.5, 1.0e-8),   # soil gate OFF (T_soil <= 7)
        (25.0, 12.0, 1.2, 1.0, 6.0, 2.0e-7),
    ]
    expect = []
    for Ta, Tg, Rd, phen, C, GPP in pts:
        f_soil = f_temp(Tg) if Tg > 7.0 else 0.0
        R_leaf = Rd / 1000.0
        R_stem = resp10 * f_temp(Ta) * (awl * ((2.0 / SLA) + awl)) \
            / (C * aws * cn_sap)
        R_root = resp10 * f_soil * phen * (2.0 / SLA) / (SLA * C * cn_root)
        Rm = R_leaf + R_stem + R_root
        Rg = 0.25 * (GPP - Rm)
        Ra = Rm + Rg
        expect.append((Ra, GPP - Ra))
    expect = np.array(expect).T

    sim, model, grid = _veg_sim()
    arr = np.array(pts).T
    state = sim.state.update(
        air_temperature=jnp.asarray(arr[0]),
        ground_temperature=jnp.asarray(arr[1]),
        daily_leaf_respiration=jnp.asarray(arr[2]),
        phenology_factor=jnp.asarray(arr[3]),
        carbon_vegetation=jnp.asarray(arr[4]),
        gross_primary_production=jnp.asarray(arr[5]))
    veg = model.vegetation
    out = veg.autotrophic_respiration.compute_auxiliary(
        state, grid, veg.carbon_dynamics, model.atmosphere, sim.ctx)
    np.testing.assert_allclose(np.asarray(out.autotrophic_respiration),
                               expect[0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.net_primary_production),
                               expect[1], rtol=1e-12)


def test_carbon_dynamics_pins():
    """`carbon_dynamics.jl:64-138`: LAI_b = C/(2/SLA + awl); lambda_NPP ramp
    with all three branches; litterfall (gL/SLA + gR/SLA + gS*awl)*LAI_b;
    dC/dt = (1 - lambda)NPP - litterfall."""
    SLA, awl = 10.0, 2.0
    gL, gR, gS = 0.3, 0.3, 0.05
    LAI_min, LAI_max = 1.0, 6.0
    pts = [  # (C_veg, NPP) — LAI_b below / inside / above the ramp
        (1.1, 3.0e-8),    # LAI_b = 0.5  -> lambda = 0
        (6.6, 5.0e-8),    # LAI_b = 3.0  -> lambda = 0.4
        (15.4, 8.0e-8),   # LAI_b = 7.0  -> lambda = 1
    ]
    expect = []
    for C, NPP in pts:
        LAI_b = C / ((2.0 / SLA) + awl)
        if LAI_b < LAI_min:
            lam = 0.0
        elif LAI_b <= LAI_max:
            lam = (LAI_b - LAI_min) / (LAI_max - LAI_min)
        else:
            lam = 1.0
        lit = (gL / SLA + gR / SLA + gS * awl) * LAI_b
        expect.append((LAI_b, (1.0 - lam) * NPP - lit))
    expect = np.array(expect).T

    sim, model, grid = _veg_sim()
    arr = np.array(pts).T
    state = sim.state.update(carbon_vegetation=jnp.asarray(arr[0]),
                             net_primary_production=jnp.asarray(arr[1]))
    cd = model.vegetation.carbon_dynamics
    state = cd.compute_auxiliary(state, grid, sim.ctx)
    np.testing.assert_allclose(np.asarray(state.balanced_leaf_area_index),
                               expect[0], rtol=1e-12)
    out = cd.compute_tendencies(state, grid, sim.ctx)
    np.testing.assert_allclose(np.asarray(out.tendencies["carbon_vegetation"]),
                               expect[1], rtol=1e-12)


def test_vegetation_dynamics_pins():
    """`vegetation_dynamics.jl:80-110`: dnu/dt = (lambda NPP/C)nu*(1 - nu)
    - gamma_v nu*, nu* = max(nu, nu_seed)."""
    nu_seed, gamma_v = 0.001, 0.002
    LAI_min, LAI_max = 1.0, 6.0
    pts = [  # (C_veg, NPP, nu)
        (6.6, 5.0e-8, 0.5),
        (6.6, 5.0e-8, 0.0005),   # nu < nu_seed -> seeded growth
        (2.2, -2.0e-8, 0.9),     # LAI_b = 1.0 -> lambda = 0
    ]
    expect = []
    for C, NPP, nu in pts:
        LAI_b = C / 2.2
        lam = min(max((LAI_b - LAI_min) / (LAI_max - LAI_min), 0.0), 1.0)
        nu_star = max(nu, nu_seed)
        expect.append((lam * NPP / C) * nu_star * (1.0 - nu)
                      - gamma_v * nu_star)
    expect = np.array(expect)

    sim, model, grid = _veg_sim()
    arr = np.array(pts).T
    state = sim.state.update(
        carbon_vegetation=jnp.asarray(arr[0]),
        net_primary_production=jnp.asarray(arr[1]),
        vegetation_area_fraction=jnp.asarray(arr[2]))
    cd = model.vegetation.carbon_dynamics
    state = cd.compute_auxiliary(state, grid, sim.ctx)  # LAI_b
    out = model.vegetation.vegetation_dynamics.compute_tendencies(
        state, grid, cd, sim.ctx)
    np.testing.assert_allclose(
        np.asarray(out.tendencies["vegetation_area_fraction"]), expect,
        rtol=1e-12)


def test_phenology_pins():
    """`phenology.jl:16-119`: evergreen stub — phen = 1, f_deciduous = 0,
    LAI = (f*phen + (1 - f))*LAI_b = LAI_b."""
    sim, model, grid = _veg_sim()
    LAI_b = jnp.asarray([0.5, 3.0, 7.0])
    state = sim.state.update(balanced_leaf_area_index=LAI_b)
    out = model.vegetation.phenology.compute_auxiliary(state, grid, sim.ctx)
    np.testing.assert_allclose(np.asarray(out.phenology_factor), 1.0)
    np.testing.assert_allclose(np.asarray(out.leaf_area_index),
                               np.asarray(LAI_b), rtol=1e-15)


def test_root_distribution_paw_pins():
    """`root_distribution.jl:40-63`: r_k ~ 0.5(a e^{a z} + b e^{b z})*dz_k,
    normalized; `plant_available_water.jl:34-62`: W = clip((theta_w - wp)/
    (fc - wp), 0, 1), beta = sum_k W_k r_k."""
    a, b = 7.0, 2.0
    N, dz = 4, 0.25
    # z centers, k=0 bottom (positive-up convention)
    zc = [-(N - k - 0.5) * dz for k in range(N)]
    dens = [0.5 * (a * math.exp(a * z) + b * math.exp(b * z)) for z in zc]
    R = [d * dz for d in dens]
    tot = sum(R)
    R = [r / tot for r in R]

    fc, wp, por = 0.25, 0.05, 0.49
    sats = [0.1, 0.3, 0.5, 0.8]  # per layer, bottom->top
    theta = [s * por for s in sats]
    W = [min(max((t - wp) / (fc - wp), 0.0), 1.0) for t in theta]
    beta = sum(w * r for w, r in zip(W, R))

    grid = tt.ColumnGrid.of(cells=2, spacing=tt.UniformSpacing(dz=dz, N=N),
                            nf=np.float64)
    props = tt.ConstantSoilHydraulics(field_capacity_value=fc,
                                      wilting_point_value=wp)
    soil = tt.SoilEnergyWaterCarbon(
        hydrology=tt.SoilHydrology(hydraulic_properties=props))
    model = tt.LandModel(grid=grid, vegetation=tt.VegetationCarbon(),
                         soil=soil)
    sim = tt.initialize(model, tt.ForwardEuler(),
                        initializers={"temperature": 5.0})
    np.testing.assert_allclose(
        np.asarray(sim.state.root_fraction[:, 0]), np.array(R), rtol=1e-12)

    sat_col = np.array(sats)[:, None] * np.ones((1, 2))
    state = sim.state.update(
        saturation_water_ice=jnp.asarray(sat_col),
        liquid_water_fraction=jnp.ones((N, 2)))
    out = model.vegetation.plant_available_water.compute_auxiliary(
        state, grid, model.soil, sim.ctx)
    np.testing.assert_allclose(np.asarray(out.plant_available_water[:, 0]),
                               np.array(W), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.soil_moisture_limiting_factor),
                               beta, rtol=1e-12)


def test_snow_ddm_pins():
    """Degree-day snowpack extension (processes/snow.py): cover =
    swe/(swe + swe_half); melt = k_dd*max(Ta - T_melt, 0) gated SWE > 0;
    dSWE/dt = snowfall - melt."""
    k_dd = 5.0e-3 / 86400.0
    swe_half = 0.01
    pts = [  # (swe, Ta, snowfall)
        (0.05, 3.0, 0.0),
        (0.0, 5.0, 2.0e-8),    # no snow -> no melt
        (0.002, -4.0, 1.0e-7), # below melt threshold
    ]
    expect = []
    for swe, Ta, sf in pts:
        cover = max(swe, 0.0) / (max(swe, 0.0) + swe_half)
        melt = k_dd * max(Ta - 0.0, 0.0) if swe > 0.0 else 0.0
        expect.append((cover, melt, sf - melt))
    expect = np.array(expect).T

    grid = tt.ColumnGrid.of(cells=3, spacing=tt.ExponentialSpacing(N=5),
                            nf=np.float64)
    model = tt.LandModel(grid=grid, snow=tt.Snowpack())
    sim = tt.initialize(model, tt.ForwardEuler())
    arr = np.array(pts).T
    state = sim.state.update(snow_water_equivalent=jnp.asarray(arr[0]),
                             air_temperature=jnp.asarray(arr[1]),
                             snowfall=jnp.asarray(arr[2]))
    snow = model.snow
    state = snow.compute_auxiliary(state, grid, model.atmosphere, sim.ctx)
    np.testing.assert_allclose(np.asarray(state.snow_cover_fraction),
                               expect[0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(state.snow_melt), expect[1],
                               rtol=1e-12)
    out = snow.compute_tendencies(state, grid, model.atmosphere, sim.ctx)
    np.testing.assert_allclose(
        np.asarray(out.tendencies["snow_water_equivalent"]), expect[2],
        rtol=1e-12)
