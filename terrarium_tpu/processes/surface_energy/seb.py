"""Surface energy balance: albedo, radiative + turbulent fluxes, skin
temperature, ground heat flux.

TPU-native equivalent of reference `src/processes/surface_energy/`
(`surface_energy_balance.jl`, `skin_temperature.jl`, `radiative_fluxes.jl`,
`turbulent_fluxes.jl`, `albedo.jl`). The reference's fused XY kernel
(compute fluxes -> update skin temperature -> recompute fluxes,
`surface_energy_balance.jl:95-110`) becomes one vectorised function over
``(cells,)`` arrays; XLA fuses it into a single VPU pass.

Sign conventions (reference): all fluxes positive **upward**;
R_net = SW_up - SW_down + LW_up - LW_down; G = R_net - H_s - H_l.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp

from ..base import Context
from ...constants import PhysicalConstants, stefan_boltzmann
from ...variables import XY, auxiliary, input as input_var, prognostic

__all__ = [
    "PrescribedAlbedo",
    "ConstantAlbedo",
    "PrescribedRadiativeFluxes",
    "DiagnosedRadiativeFluxes",
    "PrescribedTurbulentFluxes",
    "DiagnosedTurbulentFluxes",
    "PrescribedSkinTemperature",
    "ImplicitSkinTemperature",
    "SurfaceEnergyBalance",
]


# ---------------------------------------------------------------------------
# Albedo
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class PrescribedAlbedo:
    """Albedo/emissivity from input fields (reference `albedo.jl:1-13`)."""

    def variables(self):
        return (
            input_var("albedo", XY(), domain=(0.0, 1.0), desc="Surface albedo"),
            input_var("emissivity", XY(), domain=(0.0, 1.0), desc="Surface emissivity"),
        )

    def albedo(self, state):
        return state.inputs["albedo"]

    def emissivity(self, state):
        return state.inputs["emissivity"]


@dataclasses.dataclass(frozen=True)
class ConstantAlbedo:
    """Constant albedo = 0.3, emissivity = 0.97 (reference `albedo.jl:21-45`)."""

    albedo_value: float = 0.3
    emissivity_value: float = 0.97

    def variables(self):
        return ()

    def albedo(self, state):
        return self.albedo_value

    def emissivity(self, state):
        return self.emissivity_value


# ---------------------------------------------------------------------------
# Radiative fluxes
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class PrescribedRadiativeFluxes:
    """Upwelling SW/LW from inputs (reference `radiative_fluxes.jl:1-60`)."""

    def variables(self):
        return (
            input_var("surface_shortwave_up", XY(), units="W/m^2",
                      desc="Outgoing (upwelling) shortwave radiation"),
            input_var("surface_longwave_up", XY(), units="W/m^2",
                      desc="Outgoing (upwelling) longwave radiation"),
            auxiliary("surface_net_radiation", XY(), units="W/m^2",
                      desc="Net (positive up) radiation"),
        )

    def upwelling(self, state, seb, constants, atmos, Ts):
        return state.inputs["surface_shortwave_up"], state.inputs["surface_longwave_up"]


@dataclasses.dataclass(frozen=True)
class DiagnosedRadiativeFluxes:
    """SW_up = alpha*SW_down; LW_up = eps*sigma*T^4 + (1-eps)*LW_down
    (reference `radiative_fluxes.jl:70-105`)."""

    def variables(self):
        return (
            auxiliary("surface_shortwave_up", XY(), units="W/m^2",
                      desc="Outgoing (upwelling) shortwave radiation"),
            auxiliary("surface_longwave_up", XY(), units="W/m^2",
                      desc="Outgoing (upwelling) longwave radiation"),
            auxiliary("surface_net_radiation", XY(), units="W/m^2",
                      desc="Net radiation budget"),
        )

    def upwelling(self, state, seb, constants, atmos, Ts):
        SW_down = atmos.shortwave_down(state)
        LW_down = atmos.longwave_down(state)
        alpha = seb.albedo.albedo(state)
        eps = seb.albedo.emissivity(state)
        SW_up = alpha * SW_down
        T = constants.celsius_to_kelvin(Ts)
        LW_up = stefan_boltzmann(constants, T, eps) + (1.0 - eps) * LW_down
        return SW_up, LW_up


def net_radiation(SW_up, SW_down, LW_up, LW_down):
    """R_net = SW_up - SW_down + LW_up - LW_down, positive up
    (reference `radiative_fluxes.jl:199-209`)."""
    return SW_up - SW_down + LW_up - LW_down


# ---------------------------------------------------------------------------
# Turbulent fluxes
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class PrescribedTurbulentFluxes:
    """Sensible/latent heat fluxes from inputs (reference `turbulent_fluxes.jl:1-21`)."""

    def variables(self):
        return (
            input_var("sensible_heat_flux", XY(), units="W/m^2",
                      desc="Sensible heat flux at the surface"),
            input_var("latent_heat_flux", XY(), units="W/m^2",
                      desc="Latent heat flux at the surface"),
        )

    def sensible(self, state, seb, constants, atmos, Ts):
        return state.inputs["sensible_heat_flux"]

    def latent(self, state, seb, constants, atmos, Ts, evtr=None):
        return state.inputs["latent_heat_flux"]


@dataclasses.dataclass(frozen=True)
class DiagnosedTurbulentFluxes:
    """H_s = c_a rho_a (Ts - Ta)/r_a; H_l = L rho_a Q_h with Q_h = dq/r_a
    (bare) or the ET scheme's surface humidity flux
    (reference `turbulent_fluxes.jl:30-182`)."""

    def variables(self):
        return (
            auxiliary("sensible_heat_flux", XY(), units="W/m^2",
                      desc="Sensible heat flux at the surface"),
            auxiliary("latent_heat_flux", XY(), units="W/m^2",
                      desc="Latent heat flux at the surface"),
        )

    def sensible(self, state, seb, constants, atmos, Ts):
        r_a = atmos.aerodynamic_resistance(state, constants)
        Ta = atmos.air_temperature(state)
        Q_T = (Ts - Ta) / r_a
        return constants.c_a * constants.rho_a * Q_T

    def latent(self, state, seb, constants, atmos, Ts, evtr=None):
        if evtr is not None:
            Q_h = evtr.surface_humidity_flux(state)
        else:
            r_a = atmos.aerodynamic_resistance(state, constants)
            dq = atmos.humidity_vpd(state, constants, Ts)
            Q_h = dq / r_a
        return constants.L_lg * constants.rho_a * Q_h


# ---------------------------------------------------------------------------
# Skin temperature
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class PrescribedSkinTemperature:
    """Skin temperature as an input field (reference `skin_temperature.jl:10-41`)."""

    kappa_s: float = 2.0

    def variables(self):
        return (
            auxiliary("ground_heat_flux", XY(), units="W/m^2", desc="Ground heat flux"),
            input_var("skin_temperature", XY(), units="degC",
                      desc="Longwave emission temperature of the land surface"),
        )

    prognostic_skin = False

    def skin_temperature(self, state):
        return state.inputs["skin_temperature"] if "skin_temperature" in state.inputs \
            else state.skin_temperature


@dataclasses.dataclass(frozen=True)
class ImplicitSkinTemperature:
    """Implicit skin temperature Ts = Tg - G dz1/(2 kappa_s) satisfying the
    half-cell flux balance (reference `skin_temperature.jl:44-110`)."""

    kappa_s: float = 2.0
    # bound on |Ts - Tg| [K]: the explicit fixed-point skin update can
    # oscillate divergently under strong coupling (e.g. Monin-Obukhov drag at
    # low resistance); the reference has no such guard and NaNs in those
    # states. 50 K is far beyond any physical half-cell contrast.
    max_delta: float = 50.0

    prognostic_skin = True

    def variables(self):
        return (
            prognostic("skin_temperature", XY(), units="degC",
                       desc="Longwave emission temperature of the land surface"),
            auxiliary("ground_heat_flux", XY(), units="W/m^2", desc="Ground heat flux"),
            input_var("ground_temperature", XY(), units="degC",
                      desc="Temperature of the uppermost ground or soil cell"),
        )

    def skin_temperature(self, state):
        return state.skin_temperature

    def compute_skin_temperature(self, state, grid):
        """Ts = Tg - G*dz1/(2 kappa_s) (reference `skin_temperature.jl:62-68`),
        with the offset bounded by ``max_delta`` (see field docstring)."""
        dz1 = jnp.reshape(grid.dz[-1:], ())
        G = state.ground_heat_flux
        Tg = state.ground_temperature
        delta = jnp.clip(-G * dz1 / (2.0 * self.kappa_s),
                         -self.max_delta, self.max_delta)
        return Tg + delta


# ---------------------------------------------------------------------------
# Surface energy balance container
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class SurfaceEnergyBalance:
    """Coupled SEB (reference `surface_energy_balance.jl:9-44`). The fused
    flux update computes SW/LW up, R_net, H_s, H_l and the ground heat flux;
    with :class:`ImplicitSkinTemperature` it then updates Ts from G and
    recomputes all fluxes (one fixed-point sweep,
    `surface_energy_balance.jl:95-110`).

    ``ground_flux_form`` selects the G residual:

    * ``"reference"`` (default): G = R_net - H_s - H_l, exactly the
      reference (`skin_temperature.jl:76-80`). NOTE with every flux positive
      *up* this makes turbulent losses ADD energy to the ground — a
      wrong-signed feedback that is negligible under the reference's weak
      constant drag but diverges under realistic (e.g. Monin-Obukhov) drag.
    * ``"consistent"``: G = R_net + H_s + H_l (all positive up), the
      energy-conserving skin balance -R_net = H_s + H_l + G_down. Use this
      for production configurations.
    """

    skin_temperature: Any = ImplicitSkinTemperature()
    radiative_fluxes: Any = DiagnosedRadiativeFluxes()
    turbulent_fluxes: Any = DiagnosedTurbulentFluxes()
    albedo: Any = ConstantAlbedo()
    ground_flux_form: str = "reference"

    @staticmethod
    def consistent(**kw) -> "SurfaceEnergyBalance":
        return SurfaceEnergyBalance(ground_flux_form="consistent", **kw)

    def variables(self):
        return (tuple(self.albedo.variables())
                + tuple(self.skin_temperature.variables())
                + tuple(self.radiative_fluxes.variables())
                + tuple(self.turbulent_fluxes.variables()))

    def _fluxes(self, state, grid, constants, atmos, evtr):
        Ts = self.skin_temperature.skin_temperature(state)
        SW_up, LW_up = self.radiative_fluxes.upwelling(state, self, constants,
                                                       atmos, Ts)
        SW_down = atmos.shortwave_down(state)
        LW_down = atmos.longwave_down(state)
        R_net = net_radiation(SW_up, SW_down, LW_up, LW_down)
        H_s = self.turbulent_fluxes.sensible(state, self, constants, atmos, Ts)
        H_l = self.turbulent_fluxes.latent(state, self, constants, atmos, Ts, evtr)
        if self.ground_flux_form == "consistent":
            G = R_net + H_s + H_l  # energy-conserving (see class docstring)
        else:
            G = R_net - H_s - H_l  # reference `skin_temperature.jl:76-80`
        updates = dict(surface_net_radiation=R_net, ground_heat_flux=G)
        if isinstance(self.radiative_fluxes, DiagnosedRadiativeFluxes):
            updates.update(surface_shortwave_up=SW_up, surface_longwave_up=LW_up)
        if isinstance(self.turbulent_fluxes, DiagnosedTurbulentFluxes):
            updates.update(sensible_heat_flux=H_s, latent_heat_flux=H_l)
        return state.update({k: jnp.broadcast_to(v, state.ground_heat_flux.shape)
                             .astype(state.ground_heat_flux.dtype)
                             for k, v in updates.items()})

    def compute_surface_energy_fluxes(self, state, grid, constants, atmos,
                                      evtr=None):
        """The fused SEB update (see class docstring)."""
        state = self._fluxes(state, grid, constants, atmos, evtr)
        if isinstance(self.skin_temperature, ImplicitSkinTemperature):
            Ts = self.skin_temperature.compute_skin_temperature(state, grid)
            state = state.update(skin_temperature=Ts)
            state = self._fluxes(state, grid, constants, atmos, evtr)
        return state

    def compute_auxiliary(self, state, grid, constants, atmos, evtr=None,
                          ctx: Optional[Context] = None):
        return self.compute_surface_energy_fluxes(state, grid, constants, atmos, evtr)

    def compute_tendencies(self, state, grid, ctx: Context = None):
        return state  # skin temperature is updated diagnostically, no tendency

    def initialize(self, state, grid, ctx: Context = None):
        return state
