"""Scalar mass products + injected-mass rescaling.

Parity: reference ``presets/workflows/analysis/scalar_products.py:28-135``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

from ....image.arithmetics import weight

EPSILON = 1e-12

__all__ = [
    "RescaledMassProducts",
    "compute_rescaled_mass_products",
    "analysis_scalar_products",
    "requires_rescaled_modes",
]

_RESCALED_MODES = {
    "rescaled_mass",
    "rescaled_saturation_g",
    "rescaled_concentration_aq",
}


@dataclass
class RescaledMassProducts:
    rescaled_result: Any
    mass_scaling_factor: float
    detected_mass_total: float
    exact_mass_total: float


def requires_rescaled_modes(modes) -> bool:
    return bool(set(modes or []) & _RESCALED_MODES)


def _apply_expert_knowledge_constraints(products: dict, adapter) -> dict:
    if adapter is None:
        return products
    constrained = dict(products)
    mode_map = {
        "concentration_aq": "concentration_aq",
        "saturation_g": "saturation_g",
        "rescaled_concentration_aq": "concentration_aq",
        "rescaled_saturation_g": "saturation_g",
    }
    for key, mode in mode_map.items():
        if key in constrained and constrained[key] is not None:
            constrained[key] = adapter.apply(constrained[key], mode)
    return constrained


def compute_rescaled_mass_products(
    *,
    mass_analysis_result,
    geometry,
    injection_protocol,
    co2_mass_analysis,
    date=None,
    epsilon: float = EPSILON,
) -> RescaledMassProducts:
    """Rescale the detected total mass onto the injected mass
    (reference scalar_products.py:63-88)."""
    detected = float(geometry.integrate(mass_analysis_result.mass))
    exact = float(injection_protocol.injected_mass(date=date))
    factor = exact / detected if abs(detected) > epsilon else 1.0
    rescaled_mass = weight(mass_analysis_result.mass, factor)
    rescaled_result = co2_mass_analysis.inverse_mass_analysis(rescaled_mass)
    return RescaledMassProducts(
        rescaled_result=rescaled_result,
        mass_scaling_factor=factor,
        detected_mass_total=detected,
        exact_mass_total=exact,
    )


def analysis_scalar_products(
    *,
    mass_analysis_result,
    requested_modes=None,
    geometry=None,
    injection_protocol=None,
    co2_mass_analysis=None,
    date=None,
    expert_knowledge_adapter=None,
):
    """All base products + rescaled products when requested."""
    products = {
        "concentration_aq": mass_analysis_result.concentration_aq,
        "saturation_g": mass_analysis_result.saturation_g,
        "mass_total": mass_analysis_result.mass,
        "mass": mass_analysis_result.mass,
        "mass_g": mass_analysis_result.mass_g,
        "mass_aq": mass_analysis_result.mass_aq,
    }
    products = _apply_expert_knowledge_constraints(
        products, expert_knowledge_adapter
    )
    requested = set(requested_modes or [])
    if not requires_rescaled_modes(requested):
        return products, None
    if geometry is None or injection_protocol is None or co2_mass_analysis is None:
        raise ValueError(
            "Rescaled modes requested but missing geometry/injection_protocol/"
            "co2_mass_analysis."
        )
    rescaled = compute_rescaled_mass_products(
        mass_analysis_result=mass_analysis_result,
        geometry=geometry,
        injection_protocol=injection_protocol,
        co2_mass_analysis=co2_mass_analysis,
        date=date,
    )
    products["rescaled_mass"] = rescaled.rescaled_result.mass
    products["rescaled_saturation_g"] = rescaled.rescaled_result.saturation_g
    products["rescaled_concentration_aq"] = (
        rescaled.rescaled_result.concentration_aq
    )
    products = _apply_expert_knowledge_constraints(
        products, expert_knowledge_adapter
    )
    return products, rescaled
