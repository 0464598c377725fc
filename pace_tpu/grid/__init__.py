from .eta import HybridPressureCoefficients, analytic_hybrid, get_coefficients
from .generation import GridSpec, MetricTerms
from .gnomonic import (
    chart_to_sphere,
    great_circle_distance_lon_lat,
    great_circle_distance_xyz,
    lon_lat_to_xyz,
    schmidt_transform,
    spherical_quad_area,
    spherical_triangle_area,
    xyz_to_lon_lat,
)

__all__ = [
    "GridSpec",
    "MetricTerms",
    "HybridPressureCoefficients",
    "analytic_hybrid",
    "get_coefficients",
    "chart_to_sphere",
    "great_circle_distance_lon_lat",
    "great_circle_distance_xyz",
    "lon_lat_to_xyz",
    "schmidt_transform",
    "spherical_quad_area",
    "spherical_triangle_area",
    "xyz_to_lon_lat",
]
